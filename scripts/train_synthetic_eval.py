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


def _skip_if_generated(out_dir: str, meta: dict):
    """Generation is deterministic in its arguments; return the existing
    CSV path when a COMPLETED generation with identical arguments is on
    disk. Post-restart queue relaunches call the maker unconditionally and
    the chip sits idle during the PIL work (960 photo images is ~10 min of
    the 1-core box), so resumed runs must not pay it twice. The marker is
    written only after the last file, so a generation interrupted mid-way
    is redone."""
    marker = os.path.join(out_dir, "gen_meta.json")
    csv = os.path.join(out_dir, "boxes.csv")
    if os.path.exists(marker) and os.path.exists(csv):
        try:
            with open(marker) as f:
                if json.load(f) != meta:
                    return None
            # the marker + CSV can outlive deleted images (box wipe /
            # manual cleanup); spot-check the LAST image named in the CSV
            # so a gutted dataset regenerates instead of silently
            # shrinking via the corrupt-file skip path (ADVICE-r4)
            with open(csv) as f:
                last = [ln for ln in f if ln.strip()][-1]
            img_name = last.split(",", 1)[0].strip().strip('"')
            if os.path.exists(os.path.join(out_dir, img_name)):
                return csv
        except (ValueError, OSError, IndexError):
            pass
    return None


def _mark_generated(out_dir: str, meta: dict) -> None:
    with open(os.path.join(out_dir, "gen_meta.json"), "w") as f:
        json.dump(meta, f)


def make_dataset(out_dir: str, n_images: int, img_w: int, img_h: int,
                 n_classes: int, box_lo: int, box_hi: int, seed: int = 0,
                 max_boxes: int = 3):
    """Duplo-like scenes: 1..max_boxes solid colored rectangles (color =
    class) on a dark noisy background; CSV rows in the reference importer's
    schema (create-duplo-traindata.lua:7-46)."""
    from PIL import Image

    meta = dict(kind="duplo", n_images=n_images, img_w=img_w, img_h=img_h,
                n_classes=n_classes, box_lo=box_lo, box_hi=box_hi,
                seed=seed, max_boxes=max_boxes)
    done = _skip_if_generated(out_dir, meta)
    if done:
        return done
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
    _mark_generated(out_dir, meta)
    return csv


def _bundled_photos():
    """Real photographs shipped inside installed packages (this box has no
    network egress, so these are the only true camera images available).
    Returns a list of RGB uint8 arrays; empty if none are installed."""
    import glob
    from PIL import Image

    candidates = []
    try:
        import matplotlib

        candidates += glob.glob(
            os.path.join(matplotlib.get_data_path(), "sample_data", "*.jpg"))
    except ImportError:
        pass
    try:
        import sklearn.datasets

        candidates += glob.glob(os.path.join(
            os.path.dirname(sklearn.datasets.__file__), "images", "*.jpg"))
    except ImportError:
        pass
    try:
        import pygame

        pg = os.path.dirname(pygame.__file__)
        candidates += glob.glob(
            os.path.join(pg, "docs", "generated", "_images", "*.jpg"))
        candidates += glob.glob(os.path.join(pg, "examples", "data", "*.jpg"))
    except ImportError:
        pass
    photos = []
    for p in sorted(candidates):
        try:
            im = Image.open(p).convert("RGB")
        except Exception:
            continue
        if im.width >= 200 and im.height >= 150:   # skip tiny icons
            photos.append(np.asarray(im))
    return photos


def _draw_brick(img, rng, x0, y0, bw, bh, color):
    """Composite one shaded toy-brick onto ``img`` in place: drop shadow,
    directional-gradient body, lighter top face, studs, sensor noise."""
    h, w = img.shape[:2]
    # drop shadow (down-right, multiplied into whatever is already there)
    sx0, sy0 = min(x0 + 6, w), min(y0 + 7, h)
    sx1, sy1 = min(x0 + bw + 9, w), min(y0 + bh + 10, h)
    if sx1 > sx0 and sy1 > sy0:
        sh = img[sy0:sy1, sx0:sx1].astype(np.float32)
        img[sy0:sy1, sx0:sx1] = (sh * 0.62).astype(np.uint8)
    body = np.broadcast_to(
        np.asarray(color, np.float32), (bh, bw, 3)).copy()
    # directional illumination gradient
    yy, xx = np.mgrid[0:bh, 0:bw].astype(np.float32)
    ang = rng.uniform(0, 2 * np.pi)
    g = (np.cos(ang) * xx / max(bw, 1) + np.sin(ang) * yy / max(bh, 1))
    g = (g - g.min()) / max(g.max() - g.min(), 1e-6)
    body *= (0.62 + 0.43 * g)[:, :, None]
    # lighter top face strip (fakes the 3D top plane)
    top_h = max(2, int(bh * rng.uniform(0.12, 0.22)))
    body[:top_h] = np.minimum(body[:top_h] * 1.45 + 18, 255)
    # studs on the top face
    n_studs = max(1, bw // 44)
    r = max(2, int(min(bw, bh) * 0.10))
    cy = top_h // 2
    for k in range(n_studs):
        cx = int((k + 0.5) * bw / n_studs)
        y_lo, y_hi = max(cy - r, 0), min(cy + r, bh)
        x_lo, x_hi = max(cx - r, 0), min(cx + r, bw)
        if y_hi > y_lo and x_hi > x_lo:
            dy = np.arange(y_lo, y_hi)[:, None] - cy
            dx = np.arange(x_lo, x_hi)[None, :] - cx
            disk = (dy * dy + dx * dx) <= r * r
            patch = body[y_lo:y_hi, x_lo:x_hi]
            patch[disk] = np.minimum(patch[disk] * 1.25 + 25, 255)
    # darker 1px rim
    body[0], body[-1] = body[0] * 0.55, body[-1] * 0.55
    body[:, 0], body[:, -1] = body[:, 0] * 0.55, body[:, -1] * 0.55
    body += rng.normal(0, 6, body.shape)
    img[y0:y0 + bh, x0:x0 + bw] = body.clip(0, 255).astype(np.uint8)


def make_photo_dataset(out_dir: str, n_images: int, img_w: int, img_h: int,
                       n_classes: int, box_lo: int, box_hi: int,
                       seed: int = 0, max_boxes: int = 4,
                       n_corrupt: int = 2, mixed_orientation: bool = False):
    """Photo-composited scenes: shaded toy bricks (color = class, gradient
    illumination, top face + studs, drop shadows, partial occlusion) pasted
    over crops of REAL photographs bundled in installed packages, then
    degraded like a camera pipeline (blur, sensor noise, JPEG re-encode at
    random quality). This is the closest a zero-egress box gets to the
    reference's real camera images (``create-duplo-traindata.lua``):
    cluttered textured backgrounds, compression artifacts, and a couple of
    deliberately corrupt files to exercise the decode-skip path."""
    from PIL import Image, ImageFilter

    meta = dict(kind="photo", n_images=n_images, img_w=img_w, img_h=img_h,
                n_classes=n_classes, box_lo=box_lo, box_hi=box_hi,
                seed=seed, max_boxes=max_boxes, n_corrupt=n_corrupt,
                mixed_orientation=mixed_orientation)
    done = _skip_if_generated(out_dir, meta)
    if done:
        return done
    backgrounds = _bundled_photos()
    rng = np.random.default_rng(seed)
    rows = []
    os.makedirs(out_dir, exist_ok=True)
    base_wh = (img_w, img_h)
    for i in range(n_images):
        if mixed_orientation:
            # portrait/landscape mix, like ImageNet DET photos — exercises
            # the dual compile buckets (config.py::imagenet_config)
            img_w, img_h = base_wh if rng.random() < 0.5 else base_wh[::-1]
        if backgrounds:
            bg = backgrounds[int(rng.integers(0, len(backgrounds)))]
            bh0, bw0 = bg.shape[:2]
            # random crop with the target aspect, then resize
            frac = rng.uniform(0.5, 1.0)
            cw = max(int(bw0 * frac), 64)
            ch = max(min(int(cw * img_h / img_w), bh0), 48)
            cw = min(int(ch * img_w / img_h), bw0)
            cx = int(rng.integers(0, bw0 - cw + 1))
            cy = int(rng.integers(0, bh0 - ch + 1))
            crop = Image.fromarray(bg[cy:cy + ch, cx:cx + cw])
            img = np.asarray(
                crop.resize((img_w, img_h), Image.BILINEAR), np.float32)
            if rng.random() < 0.5:
                img = img[:, ::-1]
            img *= rng.uniform(0.55, 1.05)        # global illumination
            img += rng.normal(0, 10, 3)           # color cast
            img = img.clip(0, 255).astype(np.uint8)
        else:       # no packages with photos installed: textured fallback
            base = rng.integers(30, 120, size=(img_h // 8, img_w // 8, 3))
            img = np.asarray(Image.fromarray(base.astype(np.uint8)).resize(
                (img_w, img_h), Image.BILINEAR))
        placed = []
        for _ in range(int(rng.integers(1, max_boxes + 1))):
            ci = int(rng.integers(0, n_classes))
            bw = int(rng.integers(box_lo, box_hi))
            bh = int(rng.integers(box_lo, box_hi))
            for _try in range(20):
                x0 = int(rng.integers(0, img_w - bw))
                y0 = int(rng.integers(0, img_h - bh))
                cand = (x0, y0, x0 + bw, y0 + bh)
                # partial occlusion allowed: reject only IoU >= 0.25
                ok = True
                for p in placed:
                    ix = max(0, min(cand[2], p[2]) - max(cand[0], p[0]))
                    iy = max(0, min(cand[3], p[3]) - max(cand[1], p[1]))
                    inter = ix * iy
                    union = bw * bh + (p[2] - p[0]) * (p[3] - p[1]) - inter
                    if inter / union >= 0.25:
                        ok = False
                        break
                if ok:
                    break
            else:
                continue
            placed.append(cand)
            _draw_brick(img, rng, x0, y0, bw, bh, CLASS_COLORS[ci])
            rows.append(
                f'"img{i:04d}.jpg", {x0}, {y0}, {x0 + bw}, {y0 + bh}, '
                f'"{CLASS_NAMES[ci]}", {ci}, "M", 0'
            )
        # camera-pipeline degradation
        pim = Image.fromarray(img)
        blur = rng.uniform(0.0, 1.0)
        if blur > 0.25:
            pim = pim.filter(ImageFilter.GaussianBlur(blur))
        img = np.asarray(pim, np.float32)
        img += rng.normal(0, rng.uniform(1.0, 5.0), img.shape)
        Image.fromarray(img.clip(0, 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"img{i:04d}.jpg"),
            quality=int(rng.integers(55, 95)),
        )
    # corrupt a few files that stay referenced in the CSV — the pipeline
    # must skip-and-log them (BatchIterator pcall analog)
    for i in range(min(n_corrupt, n_images)):
        with open(os.path.join(out_dir, f"img{i:04d}.jpg"), "wb") as f:
            f.write(b"\xff\xd8\xffnot-actually-a-jpeg")
    csv = os.path.join(out_dir, "boxes.csv")
    with open(csv, "w") as f:
        f.write("\n".join(rows))
    _mark_generated(out_dir, meta)
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


def imagenet_scale_cfg(n_classes: int):
    """The reference imagenet experiment's envelope (``config/imagenet.lua``):
    vgg_large, 480 px smaller side, dual (480x1000)+(1000x480) compile
    buckets, thresholds 0.6/0.25 — with the class count set by the
    synthetic dataset (class count is dataset-driven everywhere; the
    envelope/buckets/scales/model are what this scale exercises)."""
    from frcnn_tpu.config import imagenet_config

    return imagenet_config(
        class_count=n_classes, learning_rate=1e-4, uint8_wire=True
    )


def _make_imagenet_dataset(out_dir, n_images, img_w, img_h, n_classes,
                           box_lo, box_hi, seed=0):
    return make_photo_dataset(out_dir, n_images, img_w, img_h, n_classes,
                              box_lo, box_hi, seed=seed,
                              mixed_orientation=True)


def imagenet_smoke_cfg(n_classes: int):
    """CPU-smokeable shrink of :func:`imagenet_scale_cfg`: the same model
    family (vgg_large), dual-bucket machinery, and 0.6/0.25 thresholds,
    with the envelope reduced 3x so the full wiring (mixed-orientation
    photo dataset -> portrait/landscape bucket routing -> vgg_large train
    -> evaluate) runs in minutes on one CPU core before the real-envelope
    TPU run relies on it."""
    from frcnn_tpu.config import imagenet_config

    cfg = imagenet_config(
        class_count=n_classes, learning_rate=1e-4, uint8_wire=True,
        target_smaller_side=160, max_pixel_size=320,
        scales=(24, 48, 96, 192),
    )
    return cfg.replace(shapes=dataclasses.replace(
        cfg.shapes, image_hw=(160, 320), portrait_hw=(320, 160),
        images_per_step=2))


SCALES = {
    # (img_w, img_h, box_lo, box_hi, n_classes, cfg builder, scene maker)
    "tiny": (200, 160, 48, 80, 3, tiny_cfg, make_dataset),
    "duplo": (800, 450, 48, 220, 6, duplo_scale_cfg, make_dataset),
    # real-photo backgrounds + shaded bricks + JPEG degradation, at the
    # full duplo scale (see make_photo_dataset)
    "photo": (800, 450, 48, 220, 6, duplo_scale_cfg, make_photo_dataset),
    # vgg_large at the imagenet envelope, portrait+landscape mixed (dual
    # compile buckets), photo backgrounds
    "imagenet": (1000, 480, 60, 380, 6, imagenet_scale_cfg,
                 _make_imagenet_dataset),
    # 3x-shrunk imagenet: same dual-bucket + vgg_large wiring, CPU-sized
    "imagenet_smoke": (320, 160, 24, 100, 3, imagenet_smoke_cfg,
                       _make_imagenet_dataset),
}


def scale_spec(name):
    """(img_w, img_h, box_lo, box_hi, n_classes, cfg_fn, maker)."""
    return SCALES[name]


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
    ap.add_argument("--named-snapshot-every", type=int, default=0,
                    help="if >0, keep a step-named copy of the snapshot "
                    "every N steps (accuracy-curve checkpoints)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from frcnn_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from frcnn_tpu.data.importers import create_duplo_manifest
    from frcnn_tpu.data.pipeline import BatchIterator, PrefetchingIterator
    from frcnn_tpu.detect.detector import Detector
    from frcnn_tpu.detect.evaluation import evaluate_map
    from frcnn_tpu.ops.color import yuv2rgb
    from frcnn_tpu.train.trainer import Trainer
    from frcnn_tpu.utils.drawing import draw_rectangle, save_image

    img_w, img_h, box_lo, box_hi, n_classes, cfg_fn, maker = SCALES[args.scale]
    os.makedirs(args.out, exist_ok=True)
    data_dir = os.path.join(args.out, "dataset")
    csv = maker(data_dir, args.images, img_w, img_h, n_classes,
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
    start_step = tr.step

    t0 = time.time()
    last_snap = tr.step
    # Per-bucket chunk queues: with dual compile buckets (imagenet scale)
    # consecutive batches alternate orientation, so chunking on the raw
    # stream would flush to per-step dispatch almost always. Grouping by
    # bucket keeps every full chunk homogeneous (one (bucket, k) program
    # each) at the cost of reordering steps across buckets — the training
    # stream is i.i.d. shuffled, so the trajectory remains a valid draw.
    queues: dict = {}
    while tr.step < args.steps:
        b = pre.next_training_batch()
        q = queues.setdefault(tuple(b.image.shape[1:3]), [])
        q.append(b)
        full = len(q) >= args.chunk
        tail = args.steps - tr.step < 2 * args.chunk
        if not (full or tail):
            continue
        k = min(len(q), args.steps - tr.step)
        if full and k == args.chunk and args.chunk > 1:
            metrics = tr.run_chunk(q[:k])
        else:
            # ragged tail: per-step dispatch — run_chunk would compile a
            # fresh (bucket, k) program (minutes on the remote service)
            # for every distinct length
            metrics = [tr.run_step(x) for x in q[:k]]
        del q[:k]
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
        if (args.named_snapshot_every
                and tr.step % args.named_snapshot_every < k):
            named = os.path.join(
                args.out,
                f"step_{tr.step - tr.step % args.named_snapshot_every:06d}"
                ".ckpt")
            if not os.path.exists(named):
                tr.save_snapshot(named)
    pre.close()
    # the reference's "loss" series is pcls + preg (objective.lua:216);
    # rebuilt from stats so it survives a resume
    losses = [p + r for p, r in zip(tr.stats.pcls, tr.stats.preg)]
    # final.ckpt means "the requested schedule completed". A finalize-only
    # invocation (--steps <= the restored step, zero training performed)
    # must NOT mint one: a later relaunch with an extended deadline would
    # then train partial.ckpt further while best_ckpt keeps picking the
    # stale final (ADVICE-r4).
    if args.steps >= start_step:
        tr.save_snapshot(os.path.join(args.out, "final.ckpt"))
    else:
        print(f"finalize-only run (step {tr.step} > requested {args.steps}); "
              "not writing final.ckpt", flush=True)

    # mAP on the validation split
    det = Detector(cfg, tr.params, tr.batch_stats, gen=tr.gen,
                   pnet=tr.pnet, cnet=tr.cnet)
    eval_it = BatchIterator(cfg, manifest_path, seed=args.seed + 1)
    result = evaluate_map(cfg, det, eval_it, max_images=args.eval_count)
    result["scale"] = args.scale
    # record the step actually reached: a resume invoked with --steps <=
    # the snapshot's step performs zero training and just finalizes
    # (eval + demos) at the checkpoint — "steps" must reflect the ckpt
    result["steps"] = tr.step
    result["requested_steps"] = args.steps
    # a restored ckpt can lack stats -> losses == [] -> np.mean([]) is NaN,
    # which json.dump emits as non-strict bare NaN (ADVICE-r4); write null
    result["final_loss_mean_last25"] = (
        float(np.mean(losses[-25:])) if losses else None)
    result["first_loss_mean_25"] = (
        float(np.mean(losses[:25])) if losses else None)
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
