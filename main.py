"""CLI driver — the ``main.lua`` equivalent.

Same three config axes as the reference (``main.lua:18-47``): run-level
flags here, experiment config via ``--cfg`` (preset name or JSON file),
model via ``--model`` (preset name). Subcommands cover the reference's
entry points plus dataset import:

  train            ``graph_training`` (main.lua:103-153)
  demo             ``evaluation_demo`` (main.lua:183-216)
  evaluate         mAP on the validation split (the reference's README TODO)
  import-duplo     create-duplo-traindata.lua
  import-imagenet  create-imagenet-traindata.lua
  import-t7        convert a reference training-data .t7 to a manifest

Examples:
  python main.py train --cfg duplo --train duplo_manifest.json --name dup
  python main.py demo --cfg duplo --train duplo_manifest.json \
      --restore dup_004000.ckpt --out demo_out/
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

logging.basicConfig(level=logging.INFO, format="[%(asctime)s] %(message)s")
log = logging.getLogger("frcnn_tpu.main")


def build_config(args):
    from frcnn_tpu.config import CONFIGS, Config, vgg_large_model, vgg_small_model

    if args.cfg in CONFIGS:
        cfg = CONFIGS[args.cfg]()
    elif os.path.exists(args.cfg):
        with open(args.cfg) as f:
            cfg = Config.from_json(f.read())
    else:
        raise SystemExit(f"unknown config {args.cfg!r}")

    overrides = {}
    if args.model:
        models = {"vgg_small": vgg_small_model, "vgg_large": vgg_large_model}
        if args.model not in models:
            raise SystemExit(f"unknown model {args.model!r}")
        overrides["model"] = models[args.model]()
    if args.lr is not None:
        overrides["learning_rate"] = args.lr
    if args.rms_decay is not None:
        overrides["rms_decay"] = args.rms_decay
    if args.opti is not None:
        overrides["optimizer"] = args.opti
    if args.seed:
        overrides["seed"] = args.seed
    if args.snapshot is not None:
        overrides["snapshot_interval"] = args.snapshot
    if args.plot is not None:
        overrides["plot_interval"] = args.plot
    return cfg.replace(**overrides) if overrides else cfg


def _require_file(path: str, what: str):
    if path and not os.path.exists(path):
        raise SystemExit(f"{what} not found: {path!r}")


def cmd_train(args):
    """50,000-step training loop with loss printing, periodic plots and
    snapshots, restart-safe (``graph_training``)."""
    from frcnn_tpu.data.pipeline import BatchIterator
    from frcnn_tpu.train.trainer import Trainer
    from frcnn_tpu.utils.plotting import plot_training_progress

    _require_file(args.train, "training manifest")
    _require_file(args.restore, "checkpoint")
    cfg = build_config(args)
    log.info("config: %s classes=%d scales=%s", args.cfg, cfg.class_count, cfg.scales)

    it = BatchIterator(cfg, args.train, seed=cfg.seed)
    m = it.manifest
    log.info(
        "Training data loaded. Dataset: '%s'; Total files: %d; classes: %d; "
        "Background: %d",
        m.get("dataset_name"), len(m["ground_truth"]), len(m["class_names"]),
        len(m.get("background_files", [])),
    )

    trainer = Trainer(cfg, metrics_path=f"{args.name}_metrics.jsonl")
    if args.restore:
        trainer.restore_snapshot(args.restore)
        log.info("restored %s at step %d", args.restore, trainer.step)

    source = it
    if getattr(args, "prefetch", 0):
        from frcnn_tpu.data.pipeline import PrefetchingIterator

        source = PrefetchingIterator(it, depth=args.prefetch)

    steps = args.steps or cfg.total_steps
    chunk = max(1, getattr(args, "chunk", 1))
    t_report = time.perf_counter()
    pending = None  # bucket-switch carry (dual-bucket configs)
    while trainer.step < steps:
        k = min(chunk, steps - trainer.step)
        batches = [pending] if pending is not None else []
        pending = None
        while len(batches) < k:
            b = source.next_training_batch()
            # all batches of one device dispatch share a compile bucket;
            # a bucket switch (portrait image) flushes the current chunk
            if batches and b.image.shape[1:3] != batches[0].image.shape[1:3]:
                pending = b
                break
            batches.append(b)
        # full chunks run as one device program; partial chunks (bucket
        # switch, ragged tail) degrade to per-step dispatch — run_chunk
        # compiles one program per (bucket, length) and each new XLA
        # program costs minutes on a remote compile service, so only the
        # (bucket, chunk) and per-step (bucket,) programs may exist
        if chunk > 1 and len(batches) == chunk:
            chunk_metrics = trainer.run_chunk(batches)
        else:
            chunk_metrics = [trainer.run_step(b) for b in batches]
        base = trainer.step - len(chunk_metrics)
        for j, metrics in enumerate(chunk_metrics):
            i = base + j + 1
            log.info(
                "%d: loss: %f  prop: cls %.4f reg %.4f; det: cls %.4f reg %.4f "
                "(examples: %d)",
                i, metrics["loss"], metrics["pcls"], metrics["preg"],
                metrics["dcls"], metrics["dreg"], int(metrics["cls_count"]),
            )
            if metrics.get("skipped"):
                log.warning("step %d: non-finite update — skipped", i)
            if cfg.plot_interval and i % cfg.plot_interval == 0:
                plot_training_progress(args.name, trainer.stats)
        # snapshots happen at chunk boundaries (mid-chunk parameter states
        # never exist on the host) and are named with the true step
        if cfg.snapshot_interval and (
            trainer.step // cfg.snapshot_interval > base // cfg.snapshot_interval
        ):
            path = f"{args.name}_{trainer.step:06d}.ckpt"
            options = {
                k2: v for k2, v in vars(args).items()
                if isinstance(v, (str, int, float, bool, type(None)))
            }
            trainer.save_snapshot(path, options=options)
            log.info("snapshot %s (%.1fs since last report)",
                     path, time.perf_counter() - t_report)
            t_report = time.perf_counter()


def _make_detector(cfg, restore, serving: str = "reference"):
    """``serving='fast'`` applies the measured-best stack (Pallas kernels
    + host-packed s2d input + int8 backbone with dynamic scales); the
    default is the plain bf16 reference path. Parity of the fast modes:
    docs/accuracy/quant_parity_tiny2500.json."""
    _require_file(restore, "checkpoint")
    import jax

    from frcnn_tpu.detect.detector import Detector
    from frcnn_tpu.models.factory import init_params
    from frcnn_tpu.utils.serialization import load_checkpoint

    params, stats = init_params(cfg, jax.random.PRNGKey(cfg.seed or 0))
    if restore:
        ckpt = load_checkpoint(restore)
        params = ckpt["params"]
        stats = ckpt["batch_stats"]
    if serving == "fast":
        from frcnn_tpu.config import serving_config

        fast = serving_config(cfg)
        if jax.default_backend() == "cpu":
            # Mosaic kernels need hardware; interpret mode keeps the path
            # usable (slowly) on the CPU backend
            fast = fast.replace(pallas_mode="interpret")
        return Detector(fast, params, stats, quantized=True)
    return Detector(cfg, params, stats)


def cmd_demo(args):
    """Detect on 50 random validation images, draw boxes, save JPGs
    (``evaluation_demo``; it draws the stage-1 proposal box, main.lua:209)."""
    import numpy as np

    from frcnn_tpu.data.pipeline import BatchIterator
    from frcnn_tpu.ops.color import yuv2rgb
    from frcnn_tpu.utils.drawing import GREEN, draw_rectangle, save_image

    _require_file(args.train, "training manifest")
    cfg = build_config(args)
    it = BatchIterator(cfg, args.train, seed=cfg.seed)
    det = _make_detector(cfg, args.restore, serving=args.serving)
    os.makedirs(args.out, exist_ok=True)

    n = args.count
    for i in range(n):
        imgs, hws, rois = it.padded_validation_batch(1)
        if imgs.shape[0] == 0:
            log.warning("validation set empty/unreadable — stopping demo")
            break
        out = det.detect(imgs, hws)
        h, w = int(hws[0][0]), int(hws[0][1])
        img = np.asarray(imgs[0][:h, :w]).copy()
        if img.dtype == np.uint8:      # uint8 wire: already RGB
            img = img.astype(np.float32) / 255.0
        elif cfg.color_space == "yuv":
            img = yuv2rgb(img)
        valid = np.asarray(out.valid[0])
        boxes = np.asarray(out.proposal_boxes[0])
        for b in boxes[valid]:
            draw_rectangle(img, b, GREEN)
        path = os.path.join(args.out, f"output{i + 1}.jpg")
        save_image(img, path)
        log.info("%s: %d detections", path, int(valid.sum()))


def cmd_evaluate(args):
    from frcnn_tpu.data.pipeline import BatchIterator
    from frcnn_tpu.detect.evaluation import evaluate_map

    _require_file(args.train, "training manifest")
    cfg = build_config(args)
    it = BatchIterator(cfg, args.train, seed=cfg.seed)
    det = _make_detector(cfg, args.restore, serving=args.serving)
    result = evaluate_map(cfg, det, it, max_images=args.count)
    print(json.dumps(result, indent=2))


def cmd_import_duplo(args):
    from frcnn_tpu.data.importers import create_duplo_manifest

    _require_file(args.csv, "CSV file")
    m = create_duplo_manifest(
        args.name or "duplo", args.csv, args.background, args.out,
        validation_size=args.val_size, seed=args.seed or 0,
    )
    log.info(
        "Total images: %d; classes: %d; train: %d; val: %d; background: %d",
        len(m["ground_truth"]), len(m["class_names"]),
        len(m["training_set"]), len(m["validation_set"]),
        len(m["background_files"]),
    )


def cmd_import_t7(args):
    """Convert a reference training-data .t7 file to a JSON manifest."""
    from frcnn_tpu.data.importers import create_manifest_from_t7

    _require_file(args.t7, "t7 file")
    m = create_manifest_from_t7(args.t7, args.out)
    log.info(
        "Converted '%s': images: %d; classes: %d; train: %d; val: %d; "
        "background: %d", m["dataset_name"],
        len(m["ground_truth"]), len(m["class_names"]),
        len(m["training_set"]), len(m["validation_set"]),
        len(m["background_files"]),
    )


def cmd_import_t7_model(args):
    """Convert a reference network snapshot (the flat weight vector written
    by ``utilities.lua:126-134``) into one of our checkpoints."""
    import jax

    from frcnn_tpu.data.t7_model import load_reference_model
    from frcnn_tpu.models.factory import init_params
    from frcnn_tpu.utils.serialization import save_checkpoint

    _require_file(args.t7, "t7 model snapshot")
    cfg = build_config(args)
    template, batch_stats = init_params(cfg, jax.random.PRNGKey(cfg.seed))
    params, meta = load_reference_model(args.t7, cfg, template,
                                        order=args.order)
    save_checkpoint(args.out, params=params, batch_stats=batch_stats,
                    step=0, options={"imported_from": args.t7,
                                     "order": meta["order"]})
    log.info(
        "Imported '%s' (order=%s, diagnosis=%s) -> %s. NOTE: the reference "
        "format carries no BatchNorm running stats (torch parameters() "
        "excludes them; its own restore resets them too) — cnet batch "
        "stats are freshly initialized; fine-tune or run training batches "
        "to re-estimate.",
        args.t7, meta["order"], meta["order_diagnosis"], args.out,
    )


def cmd_export_t7_model(args):
    """Export one of our checkpoints as a reference-loadable .t7 snapshot
    (flat weight vector, ``load_model`` in ``main.lua:80-101`` format)."""
    from frcnn_tpu.data.t7_model import save_reference_model
    from frcnn_tpu.utils.serialization import load_checkpoint

    _require_file(args.restore, "checkpoint")
    cfg = build_config(args)
    ckpt = load_checkpoint(args.restore)
    save_reference_model(args.out, ckpt["params"], cfg, order=args.order)
    log.info("Exported %s -> %s (order=%s)", args.restore, args.out,
             args.order)


def cmd_import_imagenet(args):
    from frcnn_tpu.data.importers import create_imagenet_manifest

    if not os.path.isdir(args.base_dir):
        raise SystemExit(f"ILSVRC base dir not found: {args.base_dir!r}")
    m = create_imagenet_manifest(
        args.name or "ILSVRC2015_DET", args.base_dir,
        "Annotations/DET/train", "Annotations/DET/val",
        "Data/DET/train", "Data/DET/val",
        background_dirs=[
            f"Data/DET/train/ILSVRC2013_train_extra{i}" for i in range(11)
        ],
        output_path=args.out,
    )
    log.info(
        "Total images: %d; classes: %d; train: %d; val: %d; background: %d",
        len(m["ground_truth"]), len(m["class_names"]),
        len(m["training_set"]), len(m["validation_set"]),
        len(m["background_files"]),
    )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp, train_required=True):
        sp.add_argument("--cfg", default="duplo", help="config preset or JSON file")
        sp.add_argument("--model", default=None, help="vgg_small | vgg_large")
        sp.add_argument("--name", default="experiment", help="snapshot prefix")
        sp.add_argument("--train", required=train_required,
                        help="training manifest JSON")
        sp.add_argument("--restore", default="", help="checkpoint to load")
        sp.add_argument("--snapshot", type=int, default=None,
                        help="snapshot interval (default 1000)")
        sp.add_argument("--plot", type=int, default=None,
                        help="plot interval (default 100)")
        sp.add_argument("--lr", type=float, default=None)
        sp.add_argument("--rms_decay", type=float, default=None)
        sp.add_argument("--opti", default=None, help="rmsprop | sgd | nag")
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--threads", type=int, default=0,
                        help="native loader threads (0 = cpu count)")
        sp.add_argument("--prefetch", type=int, default=2,
                        help="batches prefetched ahead (0 = synchronous)")

    sp = sub.add_parser("train", help="joint RPN+classifier training")
    common(sp)
    sp.add_argument("--steps", type=int, default=None,
                    help="override total steps (default 50000)")
    sp.add_argument("--chunk", type=int, default=1,
                    help="train steps per device dispatch (amortizes "
                    "per-step round-trip latency on remote devices; "
                    "identical trajectory to --chunk 1)")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("demo", help="draw detections on validation images")
    common(sp)
    sp.add_argument("--out", default="demo_out")
    sp.add_argument("--count", type=int, default=50)
    sp.add_argument("--serving", default="reference",
                    choices=["reference", "fast"],
                    help="fast = Pallas kernels + s2d layout + int8 backbone")
    sp.set_defaults(fn=cmd_demo)

    sp = sub.add_parser("evaluate", help="mAP on the validation split")
    common(sp)
    sp.add_argument("--count", type=int, default=200)
    sp.add_argument("--serving", default="reference",
                    choices=["reference", "fast"],
                    help="fast = Pallas kernels + s2d layout + int8 backbone")
    sp.set_defaults(fn=cmd_evaluate)

    sp = sub.add_parser("import-duplo", help="CSV -> manifest")
    sp.add_argument("--csv", required=True)
    sp.add_argument("--background", default=None)
    sp.add_argument("--out", required=True)
    sp.add_argument("--name", default="duplo")
    sp.add_argument("--val-size", type=float, default=0.2)
    sp.add_argument("--seed", type=int, default=0)
    sp.set_defaults(fn=cmd_import_duplo)

    sp = sub.add_parser(
        "import-t7", help="reference training-data .t7 -> manifest"
    )
    sp.add_argument("--t7", required=True)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_import_t7)

    sp = sub.add_parser(
        "import-t7-model",
        help="reference network snapshot (flat weights) -> our checkpoint",
    )
    common(sp, train_required=False)
    sp.add_argument("--t7", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--order", default="auto",
                    choices=["auto", "nngraph", "blocks_first", "interleaved"],
                    help="pnet gModule parameter order (see data/t7_model.py; "
                    "'nngraph' is the order derived from gModule's topsort, "
                    "'auto' verifies it by PReLU-slope plausibility)")
    sp.set_defaults(fn=cmd_import_t7_model)

    sp = sub.add_parser(
        "export-t7-model",
        help="our checkpoint -> reference-loadable .t7 snapshot",
    )
    common(sp, train_required=False)
    sp.add_argument("--out", required=True)
    sp.add_argument("--order", default="nngraph",
                    choices=["nngraph", "blocks_first", "interleaved"])
    sp.set_defaults(fn=cmd_export_t7_model)

    sp = sub.add_parser("import-imagenet", help="ILSVRC2015 DET XML -> manifest")
    sp.add_argument("--base-dir", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--name", default="ILSVRC2015_DET")
    sp.set_defaults(fn=cmd_import_imagenet)

    p.add_argument(
        "--platform", default=os.environ.get("FRCNN_TPU_PLATFORM", ""),
        help="pin the jax platform (e.g. 'cpu', 'tpu'); also via "
             "FRCNN_TPU_PLATFORM. Overrides environment-forced backends.",
    )
    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    args.fn(args)


if __name__ == "__main__":
    main()
