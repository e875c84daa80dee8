"""Serving-mode accuracy parity: evaluate one trained checkpoint under
every serving configuration and compare mAP + per-image agreement.

The production headline mode is int8 weights + static activation scales +
the fused space-to-depth frontend — this script is the evidence that the
fast path detects what the bf16 reference path detects (the reference has
a single fp32 path, ``Detector.lua``; every fast mode here is a
TPU-native addition and must be accuracy-neutral to count).

Usage (after scripts/train_synthetic_eval.py wrote --out DIR):
  python scripts/eval_quant_parity.py --run /tmp/acc_parity \
      --scale tiny [--platform cpu] [--eval-count 24]

Writes RUN/quant_parity.json with one entry per mode.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True,
                    help="output dir of train_synthetic_eval.py")
    ap.add_argument("--scale", default="tiny")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--eval-count", type=int, default=24)
    ap.add_argument("--calib-count", type=int, default=8)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from frcnn_tpu.data.pipeline import BatchIterator
    from frcnn_tpu.detect.detector import Detector
    from frcnn_tpu.detect.evaluation import evaluate_map
    from frcnn_tpu.ops.normalization import normalize_image
    from frcnn_tpu.utils.serialization import load_checkpoint
    from scripts.train_synthetic_eval import SCALES

    img_w, img_h, box_lo, box_hi, n_classes, cfg_fn, _maker = SCALES[args.scale]
    data_dir = os.path.join(args.run, "dataset")
    manifest = os.path.join(data_dir, "manifest.json")
    cfg = cfg_fn(n_classes).replace(examples_base_path=data_dir)

    ckpt = load_checkpoint(os.path.join(args.run, "final.ckpt"))
    params, stats = ckpt["params"], ckpt["batch_stats"]

    # calibration batch for static int8 activation scales: NORMALIZED
    # validation images (the detect fn normalizes before the backbone)
    cal_it = BatchIterator(cfg, manifest, seed=123)
    cal_imgs, cal_hws, _ = cal_it.padded_validation_batch(args.calib_count)
    nc = cfg.normalization
    calib = jax.vmap(
        lambda im, hw: normalize_image(
            im, hw[0], hw[1], method=nc.method, width=nc.width,
            centering=nc.centering, scaling=nc.scaling,
        )
    )(jnp.asarray(cal_imgs), jnp.asarray(cal_hws))

    on_cpu = jax.default_backend() == "cpu"
    modes = {
        "bf16": dict(cfg=cfg, kw={}),
        "int8_dynamic": dict(cfg=cfg, kw=dict(quantized=True)),
        "int8_static": dict(cfg=cfg, kw=dict(quantized=True,
                                             quant_calibration=calib)),
        "int8_static_s2d": dict(
            cfg=cfg.replace(
                pallas_mode="interpret" if on_cpu else "on",
                input_layout="s2d",
            ),
            kw=dict(quantized=True, quant_calibration=calib),
        ),
    }

    results = {}
    for name, spec in modes.items():
        det = Detector(spec["cfg"], params, stats, **spec["kw"])
        it = BatchIterator(cfg, manifest, seed=7)
        r = evaluate_map(cfg, det, it, max_images=args.eval_count)
        results[name] = {
            "mAP": r["mAP"],
            "num_detections": r["num_detections"],
            "num_gt": r["num_gt"],
        }
        print(f"{name:16s} mAP={r['mAP']:.4f} "
              f"det={r['num_detections']}/{r['num_gt']}", flush=True)

    base = results["bf16"]["mAP"]
    for name, r in results.items():
        r["mAP_delta_vs_bf16"] = r["mAP"] - base
    out = os.path.join(args.run, "quant_parity.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
