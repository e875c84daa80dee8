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
    ap.add_argument("--modes", default=None,
                    help="comma list; default = the four headline modes. "
                    "Extra bisection modes: bf16_pallas, bf16_pallas_s2d, "
                    "int8_static_pallas (isolate pallas kernels / s2d "
                    "frontend / quantization from each other)")
    ap.add_argument("--ckpt", default="final.ckpt",
                    help="checkpoint filename inside --run (a named "
                    "step_NNNNNN.ckpt snapshot, partial.ckpt, or the "
                    "default final.ckpt)")
    ap.add_argument("--out", default="quant_parity.json",
                    help="output filename inside --run")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from frcnn_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

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

    ckpt = load_checkpoint(os.path.join(args.run, args.ckpt))
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
    pl_mode = "interpret" if on_cpu else "on"
    pcfg = cfg.replace(pallas_mode=pl_mode)
    scfg = pcfg.replace(input_layout="s2d")
    # The headline serving mode (int8_static_s2d) bundles THREE independent
    # changes vs bf16: pallas kernels (NMS + ROI pool), the s2d block0
    # frontend, and int8 weights/static act scales. The extra modes below
    # flip one axis at a time so an accuracy delta can be attributed.
    modes = {
        "bf16": dict(cfg=cfg, kw={}),
        "bf16_pallas": dict(cfg=pcfg, kw={}),
        "bf16_pallas_s2d": dict(cfg=scfg, kw={}),
        "int8_dynamic": dict(cfg=cfg, kw=dict(quantized=True)),
        "int8_static": dict(cfg=cfg, kw=dict(quantized=True,
                                             quant_calibration=calib)),
        "int8_static_pallas": dict(cfg=pcfg, kw=dict(
            quantized=True, quant_calibration=calib)),
        "int8_static_s2d": dict(cfg=scfg, kw=dict(
            quantized=True, quant_calibration=calib)),
        # the shipped serving default (round 5): + s8-pooled chain with
        # the s8-emitting block0 kernel — exact reorder of the quantize,
        # so any delta vs int8_static_s2d is fm-rounding noise
        "int8_static_s2d_s8p": dict(cfg=scfg.replace(quant_pool_s8=True),
                                    kw=dict(quantized=True,
                                            quant_calibration=calib)),
    }
    default_modes = ["bf16", "int8_dynamic", "int8_static", "int8_static_s2d"]
    selected = (args.modes.split(",") if args.modes else default_modes)

    results = {}
    for name in selected:
        spec = modes[name]
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

    if "bf16" in results:
        base = results["bf16"]["mAP"]
        for name, r in results.items():
            r["mAP_delta_vs_bf16"] = r["mAP"] - base
    results["_ckpt"] = args.ckpt
    if isinstance(ckpt, dict) and "step" in ckpt:
        results["_step"] = int(ckpt["step"])
    out = os.path.join(args.run, args.out)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
