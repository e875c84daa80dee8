"""Detection quality analyzer: confusion matrix, IoU stats, recall/FP.

Complements `main.py evaluate` (mAP) with the diagnostic view: WHICH
classes confuse, how tight the localization is, and whether errors are
recall-, precision-, or classification-bound. The reference had no
evaluation tooling at all (README TODO, `/root/reference/README.md:11-13`).

Usage:
  python scripts/analyze_detections.py --ckpt /path/final.ckpt \
      --manifest /path/manifest.json --count 30 [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _iou(a, b):
    iw = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    ih = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = iw * ih
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--count", type=int, default=30)
    ap.add_argument("--split", choices=["validation", "training"],
                    default="validation")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--iou", type=float, default=0.5)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from frcnn_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from frcnn_tpu.config import Config
    from frcnn_tpu.data.pipeline import BatchIterator
    from frcnn_tpu.detect.detector import Detector
    from frcnn_tpu.utils.serialization import load_checkpoint

    ck = load_checkpoint(args.ckpt)
    cfg = Config.from_json(ck["config_json"])
    det = Detector(cfg, ck["params"], ck["batch_stats"])
    it = BatchIterator(cfg, args.manifest, seed=1234)
    if args.split == "training":
        it.validation = it.training  # reuse the padded-batch machinery

    C = cfg.class_count
    conf = np.zeros((C, C + 1), np.int64)  # gt x (pred | missed)
    ious, fp, n_det, n_gt = [], 0, 0, 0
    done = 0
    while done < args.count:
        imgs, hws, rois = it.padded_validation_batch(
            min(8, args.count - done)
        )
        if imgs.shape[0] == 0:
            break
        out = det.detect(imgs, hws)
        valid = np.asarray(out.valid)
        boxes = np.asarray(out.boxes)
        cls = np.asarray(out.classes)
        for b in range(imgs.shape[0]):
            dets = [(boxes[b, k], int(cls[b, k]))
                    for k in np.nonzero(valid[b])[0]]
            n_det += len(dets)
            matched = set()
            for r in rois[b]:
                n_gt += 1
                best, bc, bi = 0.0, C, -1
                # one-to-one matching: a detection already claimed by a
                # previous GT cannot match again (same rule as
                # evaluation.py::compute_map) — double-counting inflated
                # recall and deflated FPs
                for di, (bx, c) in enumerate(dets):
                    if di in matched:
                        continue
                    v = _iou(bx, r["rect"])
                    if v > best:
                        best, bc, bi = v, c, di
                if best >= args.iou and bi >= 0:
                    conf[r["class_index"], bc] += 1
                    matched.add(bi)
                    ious.append(best)
                else:
                    conf[r["class_index"], C] += 1
            fp += sum(1 for di in range(len(dets)) if di not in matched)
        done += imgs.shape[0]

    matched_n = int(conf[:, :C].sum())
    correct = int(np.trace(conf[:, :C]))
    print(f"images: {done}  gt: {n_gt}  detections: {n_det}")
    print(f"recall@IoU{args.iou}: {matched_n}/{n_gt}"
          f"  class-correct among matched: {correct}/{matched_n}"
          f"  unmatched detections (FP): {fp}")
    if ious:
        print(f"matched IoU: mean {np.mean(ious):.3f}  "
              f"p10 {np.percentile(ious, 10):.3f}  "
              f"p90 {np.percentile(ious, 90):.3f}")
    print("confusion (rows gt class; last col = missed):")
    print(conf)
    print(json.dumps({
        "recall": matched_n / max(n_gt, 1),
        "class_acc_matched": correct / max(matched_n, 1),
        "false_positives": fp,
        "mean_matched_iou": float(np.mean(ious)) if ious else 0.0,
    }))


if __name__ == "__main__":
    main()
