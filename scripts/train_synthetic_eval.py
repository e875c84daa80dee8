"""Accuracy evidence: train on a synthetic duplo-like dataset to
convergence, then report mAP and write demo images with drawn boxes.

The reference never finished quantitative evaluation (README TODO
"eval code rewrite still pending"); its proof was eyeballing drawn boxes
(``main.lua:183-216``). This script provides the full loop the reference
intended: dataset -> train -> mAP -> rendered detections.

Usage:
  python scripts/train_synthetic_eval.py --scale tiny --steps 400 \
      --out /tmp/acc_tiny [--platform cpu]
  python scripts/train_synthetic_eval.py --scale duplo --steps 1500 \
      --out /tmp/acc_duplo          # full vgg_small at 800x450, TPU

Outputs in --out: dataset/, result.json ({"mAP": ...}), demo images
(detections drawn green over ground truth drawn gray), loss curve CSV.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CLASS_COLORS = [
    (220, 40, 40), (40, 220, 40), (60, 60, 230),
    (230, 230, 40), (230, 40, 230), (40, 230, 230),
]
CLASS_NAMES = ["Red", "Green", "Blue", "Yellow", "Magenta", "Cyan"]


def make_dataset(out_dir: str, n_images: int, img_w: int, img_h: int,
                 n_classes: int, box_lo: int, box_hi: int, seed: int = 0,
                 max_boxes: int = 3):
    """Duplo-like scenes: 1..max_boxes solid colored rectangles (color =
    class) on a dark noisy background; CSV rows in the reference importer's
    schema (create-duplo-traindata.lua:7-46)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    rows = []
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n_images):
        img = rng.integers(18, 42, size=(img_h, img_w, 3)).astype(np.uint8)
        placed = []
        for _ in range(int(rng.integers(1, max_boxes + 1))):
            ci = int(rng.integers(0, n_classes))
            bw = int(rng.integers(box_lo, box_hi))
            bh = int(rng.integers(box_lo, box_hi))
            for _try in range(20):
                x0 = int(rng.integers(0, img_w - bw))
                y0 = int(rng.integers(0, img_h - bh))
                cand = (x0, y0, x0 + bw, y0 + bh)
                if all(
                    cand[2] <= p[0] or cand[0] >= p[2]
                    or cand[3] <= p[1] or cand[1] >= p[3]
                    for p in placed
                ):
                    break
            else:
                continue
            placed.append(cand)
            col = np.asarray(CLASS_COLORS[ci], np.uint8)
            img[y0:y0 + bh, x0:x0 + bw] = col + rng.integers(
                -12, 13, size=(bh, bw, 3)
            ).astype(np.int16).clip(-int(col.min()), 255 - int(col.max())).astype(np.uint8)
            rows.append(
                f'"img{i:04d}.png", {x0}, {y0}, {x0 + bw}, {y0 + bh}, '
                f'"{CLASS_NAMES[ci]}", {ci}, "M", 0'
            )
        Image.fromarray(img).save(os.path.join(out_dir, f"img{i:04d}.png"))
    csv = os.path.join(out_dir, "boxes.csv")
    with open(csv, "w") as f:
        f.write("\n".join(rows))
    return csv


def tiny_cfg(n_classes: int):
    from frcnn_tpu.config import (
        AnchorNetSpec, AugmentationConfig, ClassLayerSpec, Config, LayerSpec,
        ModelConfig, StaticShapeConfig,
    )

    model = ModelConfig(
        name="tiny",
        layers=(
            LayerSpec(filters=8, conv_steps=1),
            LayerSpec(filters=16, dropout=0.4, conv_steps=1),
            LayerSpec(filters=24, dropout=0.4, conv_steps=1),
            LayerSpec(filters=32, dropout=0.4, conv_steps=1),
        ),
        anchor_nets=(
            AnchorNetSpec(kW=3, n=32, input=3),
            AnchorNetSpec(kW=3, n=32, input=4),
            AnchorNetSpec(kW=5, n=32, input=4),
            AnchorNetSpec(kW=7, n=32, input=4),
        ),
        # class head proportionally sized like the reference's 1024/512
        # (vgg_small.lua:19-22); 0.5 dropout starves a head this small
        class_layers=(
            ClassLayerSpec(n=128, dropout=0.25, batch_norm=True),
            ClassLayerSpec(n=64, dropout=0.25),
        ),
    )
    return Config(
        class_count=n_classes,
        target_smaller_side=128,
        scales=(16, 32, 64, 96),
        max_pixel_size=192,
        augmentation=AugmentationConfig(hflip=0.5, vflip=0.5),
        batch_size=64,
        model=model,
        shapes=StaticShapeConfig(
            image_hw=(128, 160), images_per_step=4, max_gt=4,
            max_positives=32, max_negatives=16, max_nearby=32,
            max_proposals=128, max_detections=32,
        ),
        compute_dtype="float32",
        learning_rate=2e-3,
    )


def duplo_scale_cfg(n_classes: int):
    from frcnn_tpu.config import duplo_config

    cfg = duplo_config(class_count=n_classes, learning_rate=1e-4)
    # scenes are generated at exactly 800x450; uint8 wire cuts the
    # host->device image bytes 4x (the remote-TPU tunnel is
    # transfer-bound at this scale) and is bit-exact here (no resize)
    return cfg.replace(
        shapes=dataclasses.replace(cfg.shapes, image_hw=(450, 800)),
        uint8_wire=True,
    )


SCALES = {
    # (img_w, img_h, box_lo, box_hi, n_classes, cfg builder)
    "tiny": (200, 160, 48, 80, 3, tiny_cfg),
    "duplo": (800, 450, 48, 220, 6, duplo_scale_cfg),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=list(SCALES), default="tiny")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--images", type=int, default=60)
    ap.add_argument("--out", required=True)
    ap.add_argument("--platform", default=None, help="'cpu' to force CPU")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-count", type=int, default=24)
    ap.add_argument("--demo-count", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=16,
                    help="train steps per device program (run_chunk); on "
                    "the remote TPU per-step dispatch latency dominates, "
                    "chunking amortizes it")
    ap.add_argument("--snapshot-every", type=int, default=160,
                    help="steps between partial snapshots (resume support)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/frcnn_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from frcnn_tpu.data.importers import create_duplo_manifest
    from frcnn_tpu.data.pipeline import BatchIterator, PrefetchingIterator
    from frcnn_tpu.detect.detector import Detector
    from frcnn_tpu.detect.evaluation import evaluate_map
    from frcnn_tpu.ops.color import yuv2rgb
    from frcnn_tpu.train.trainer import Trainer
    from frcnn_tpu.utils.drawing import draw_rectangle, save_image

    img_w, img_h, box_lo, box_hi, n_classes, cfg_fn = SCALES[args.scale]
    os.makedirs(args.out, exist_ok=True)
    data_dir = os.path.join(args.out, "dataset")
    csv = make_dataset(data_dir, args.images, img_w, img_h, n_classes,
                       box_lo, box_hi, seed=args.seed)
    manifest_path = os.path.join(data_dir, "manifest.json")
    create_duplo_manifest(f"synthetic-{args.scale}", csv, None, manifest_path,
                          validation_size=0.25, seed=args.seed)

    cfg = cfg_fn(n_classes)
    cfg = cfg.replace(examples_base_path=data_dir, seed=args.seed)

    it = BatchIterator(cfg, manifest_path, seed=args.seed)
    pre = PrefetchingIterator(it, depth=max(2, args.chunk + 2))
    tr = Trainer(cfg, metrics_path=os.path.join(args.out, "metrics.jsonl"))

    # resume from a partial snapshot if one exists (a tunnel flap mid-run
    # then only loses progress since the last --snapshot-every boundary)
    partial = os.path.join(args.out, "partial.ckpt")
    if os.path.exists(partial):
        tr.restore_snapshot(partial)
        print(f"resumed from {partial} at step {tr.step}", flush=True)

    t0 = time.time()
    last_snap = tr.step
    while tr.step < args.steps:
        k = min(args.chunk, args.steps - tr.step)
        if k == args.chunk and k > 1:
            metrics = tr.run_chunk(
                [pre.next_training_batch() for _ in range(k)])
        else:
            # ragged tail: per-step dispatch — run_chunk would compile a
            # fresh (bucket, k) program (minutes on the remote service)
            # for the last few steps of the run
            metrics = [tr.run_step(pre.next_training_batch())
                       for _ in range(k)]
        m = metrics[-1]
        if tr.step % 25 < k or tr.step == k:
            print(
                f"{tr.step}: loss {m['loss']:.4f} pcls {m['pcls']:.4f} "
                f"preg {m['preg']:.4f} dcls {m['dcls']:.4f} "
                f"dreg {m['dreg']:.4f} skip {m['skipped']:.0f} "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )
        if tr.step - last_snap >= args.snapshot_every:
            tr.save_snapshot(partial)
            last_snap = tr.step
    pre.close()
    # the reference's "loss" series is pcls + preg (objective.lua:216);
    # rebuilt from stats so it survives a resume
    losses = [p + r for p, r in zip(tr.stats.pcls, tr.stats.preg)]
    tr.save_snapshot(os.path.join(args.out, "final.ckpt"))

    # mAP on the validation split
    det = Detector(cfg, tr.params, tr.batch_stats, gen=tr.gen,
                   pnet=tr.pnet, cnet=tr.cnet)
    eval_it = BatchIterator(cfg, manifest_path, seed=args.seed + 1)
    result = evaluate_map(cfg, det, eval_it, max_images=args.eval_count)
    result["scale"] = args.scale
    result["steps"] = args.steps
    result["final_loss_mean_last25"] = float(np.mean(losses[-25:]))
    result["first_loss_mean_25"] = float(np.mean(losses[:25]))
    with open(os.path.join(args.out, "result.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "per_class"}))

    # demo images: detections green, ground truth gray (main.lua:183-216)
    demo_it = BatchIterator(cfg, manifest_path, seed=args.seed + 2)
    for i in range(args.demo_count):
        imgs, hws, rois = demo_it.padded_validation_batch(1)
        if imgs.shape[0] == 0:
            break
        out = det.detect(imgs, hws)
        h, w = int(hws[0][0]), int(hws[0][1])
        img = np.asarray(imgs[0][:h, :w]).copy()
        if img.dtype == np.uint8:      # uint8 wire: already RGB
            img = img.astype(np.float32) / 255.0
        elif cfg.color_space == "yuv":
            img = yuv2rgb(img)
        for roi in rois[0]:
            draw_rectangle(img, roi["rect"], (0.45, 0.45, 0.45))
        valid = np.asarray(out.valid[0])
        boxes = np.asarray(out.boxes[0])
        for b in boxes[valid]:
            draw_rectangle(img, b, (0.0, 1.0, 0.0))
        save_image(img, os.path.join(args.out, f"demo{i + 1}.jpg"))
    print(f"wrote {args.out}/result.json and demo images")


if __name__ == "__main__":
    main()
