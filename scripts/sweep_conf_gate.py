"""Sensitivity sweep of the final confidence gate (``Detector.lua:115``
hardcodes ``exp(confidence) > 0.2``).

Round-2 accuracy analysis attributed the duplo-scale recall ceiling
(17/40 detections) to this gate but never measured it. This script runs
the detector ONCE with the gate lowered to ``--floor`` (one compile — the
remote XLA service takes minutes per program) and re-scores the collected
detections at each candidate threshold in numpy.

Post-hoc filtering is exact for every t >= floor: greedy per-class NMS
keeps a box iff no higher-scored kept box overlaps it, and raising the
gate only removes boxes below t, whose suppressors (always >= score) also
survive — so {kept at gate t} == {kept at gate floor, score > t}. The one
approximation: the fixed max_detections output cap can truncate the
floor-gate candidate list where a higher gate would not; keep D generous.

Usage (after scripts/train_synthetic_eval.py wrote --out DIR):
  python scripts/sweep_conf_gate.py --run /tmp/acc_photo --scale photo \
      [--eval-count 240] [--ckpt final.ckpt]

Writes RUN/gate_sweep.json: per-threshold mAP / recall / detections.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THRESHOLDS = (0.02, 0.05, 0.1, 0.15, 0.2, 0.3, 0.4, 0.5, 0.7)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True)
    ap.add_argument("--scale", default="photo")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--eval-count", type=int, default=240)
    ap.add_argument("--ckpt", default="final.ckpt")
    ap.add_argument("--floor", type=float, default=0.02)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from frcnn_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from frcnn_tpu.data.pipeline import BatchIterator
    from frcnn_tpu.detect.detector import Detector
    from frcnn_tpu.detect.evaluation import (
        collect_detections,
        compute_map,
        matched_recall,
    )
    from frcnn_tpu.utils.serialization import load_checkpoint
    from scripts.train_synthetic_eval import SCALES

    _w, _h, _lo, _hi, n_classes, cfg_fn, _maker = SCALES[args.scale]
    data_dir = os.path.join(args.run, "dataset")
    manifest = os.path.join(data_dir, "manifest.json")
    cfg = cfg_fn(n_classes).replace(
        examples_base_path=data_dir, detect_confidence=args.floor
    )

    ckpt = load_checkpoint(os.path.join(args.run, args.ckpt))
    det = Detector(cfg, ckpt["params"], ckpt["batch_stats"])
    it = BatchIterator(cfg, manifest, seed=7)
    detections, gts, n_img = collect_detections(
        det, it, max_images=args.eval_count
    )
    print(f"collected {len(detections)} detections over {n_img} images "
          f"({len(gts)} gt) at gate {args.floor}", flush=True)

    rows = []
    for t in THRESHOLDS:
        if t < args.floor:
            continue
        sub = [d for d in detections if d["score"] > t]
        m = compute_map(sub, gts, cfg.class_count)
        rows.append({
            "threshold": t,
            "mAP": m["mAP"],
            "recall": matched_recall(sub, gts),
            "num_detections": len(sub),
        })
        print(f"gate>{t:<5} mAP={rows[-1]['mAP']:.4f} "
              f"recall={rows[-1]['recall']:.4f} det={len(sub)}", flush=True)

    out = os.path.join(args.run, "gate_sweep.json")
    with open(out, "w") as f:
        json.dump({"ckpt": args.ckpt, "num_images": n_img,
                   "num_gt": len(gts), "sweep": rows}, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
