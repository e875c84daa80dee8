"""Attribute end-to-end recall loss to stage 1 (fg gate / proposal NMS /
caps) vs stage 2 (classifier + confidence gate).

Round-3 finding (VERDICT Weak #3): on the photo set the conf-gate sweep was
FLAT at recall 0.226 for every gate <= 0.15 — so ~77% of GT was lost
UPSTREAM of the final gate, and nothing measured where. This script, per
stage-1 fg threshold (``Detector.lua:54`` hardcodes P(fg) > 0.95):

  - runs ONE detector pass with the final gate floored (0.02) collecting
    final detections AND the full stage-1 NMS survivor set
    (``DetectionResult.proposals``),
  - reports ``proposal_recall`` (GT covered by any survivor at IoU 0.5,
    class-agnostic) vs ``detection_recall``/mAP at reference gates
    (re-scored host-side, exact for gates >= floor — see
    scripts/sweep_conf_gate.py for the argument),
  - and the survivor-count distribution (is the D = max_detections cap
    saturating?).

Usage (after scripts/train_synthetic_eval.py wrote --out DIR):
  python scripts/recall_attribution.py --run runs/acc_photo --scale photo \
      [--eval-count 240] [--ckpt final.ckpt] [--fg 0.5,0.8,0.9,0.95]

Writes RUN/recall_attribution.json. Each fg value is a distinct compiled
program (the gate is baked into the jitted detect); the compile cache
makes re-runs cheap.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CONF_GATES = (0.05, 0.1, 0.2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True)
    ap.add_argument("--scale", default="photo")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--eval-count", type=int, default=240)
    ap.add_argument("--ckpt", default="final.ckpt")
    ap.add_argument("--floor", type=float, default=0.02)
    ap.add_argument("--fg", default="0.5,0.8,0.9,0.95",
                    help="comma list of stage-1 P(fg) gates to compare "
                    "(0.95 = reference parity)")
    ap.add_argument("--out", default="recall_attribution.json")
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
        proposal_coverage,
    )
    from frcnn_tpu.utils.serialization import load_checkpoint
    from scripts.train_synthetic_eval import SCALES

    _w, _h, _lo, _hi, n_classes, cfg_fn, _maker = SCALES[args.scale]
    data_dir = os.path.join(args.run, "dataset")
    manifest = os.path.join(data_dir, "manifest.json")
    base_cfg = cfg_fn(n_classes).replace(
        examples_base_path=data_dir, detect_confidence=args.floor
    )
    ckpt = load_checkpoint(os.path.join(args.run, args.ckpt))

    rows = []
    for fg in (float(t) for t in args.fg.split(",")):
        cfg = base_cfg.replace(detect_fg_threshold=fg)
        det = Detector(cfg, ckpt["params"], ckpt["batch_stats"])
        it = BatchIterator(cfg, manifest, seed=7)
        detections, gts, n_img, proposals = collect_detections(
            det, it, max_images=args.eval_count, with_proposals=True
        )
        cov = proposal_coverage(proposals, gts)
        counts = np.array([len(v) for v in proposals.values()])
        row = {
            "fg_threshold": fg,
            "num_images": n_img,
            "num_gt": len(gts),
            "proposal_recall": cov["proposal_recall"],
            "gt_covered_by_proposals": cov["num_covered"],
            "proposals_per_image": {
                "mean": float(counts.mean()) if len(counts) else 0.0,
                "max": int(counts.max()) if len(counts) else 0,
                "cap": int(cfg.shapes.max_detections),
                "at_cap": int((counts >= cfg.shapes.max_detections).sum()),
            },
            "by_conf_gate": {},
        }
        for t in CONF_GATES:
            if t < args.floor:
                continue
            sub = [d for d in detections if d["score"] > t]
            m = compute_map(sub, gts, cfg.class_count)
            row["by_conf_gate"][str(t)] = {
                "mAP": m["mAP"],
                "detection_recall": matched_recall(sub, gts),
                "num_detections": len(sub),
            }
        rows.append(row)
        ref = row["by_conf_gate"].get("0.2", {})
        print(
            f"fg>{fg:<5} proposal_recall={row['proposal_recall']:.4f} "
            f"(covered {cov['num_covered']}/{len(gts)}; "
            f"mean {row['proposals_per_image']['mean']:.1f} props/img, "
            f"{row['proposals_per_image']['at_cap']} imgs at cap) | "
            f"@conf0.2 recall={ref.get('detection_recall', float('nan')):.4f} "
            f"mAP={ref.get('mAP', float('nan')):.4f}",
            flush=True,
        )

    out = os.path.join(args.run, args.out)
    with open(out, "w") as f:
        json.dump({"ckpt": args.ckpt, "floor": args.floor, "rows": rows},
                  f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
