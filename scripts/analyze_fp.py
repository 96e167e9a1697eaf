"""Classify an evaluation run's false positives by failure mode.

VERDICT r4 item 3: the aniso v3 run has 42 detections at confidence > 0.8
that are counted FP — "calibration matures with training" was an unexamined
hypothesis. This script joins each detection CSV written by
MRCNN_EVALUATION (m3d/train/mrcnn.py:497) against the dataset's GT boxes
and buckets every FP:

  duplicate     IoU >= match_iou with a GT instance that a higher-scoring
                detection already claimed (greedy matching, same rule as
                the evaluator)
  localization  best GT IoU in [0.1, match_iou) — fired on a real object
                but the box is off
  merged        covers the union of >= 2 GT boxes (>=0.25 overlap-fraction
                with each) — one detection spanning touching objects
  background    best GT IoU < 0.1 and no merged pattern — fired on nothing
  border        (orthogonal tag) box touches a volume face

Usage:
  python scripts/analyze_fp.py --eval_dir runs/aniso3/eval \
      --data_dir data/aniso256 --min_score 0.8 [--match_iou 0.5]
"""

from __future__ import annotations

import argparse
import csv
import json
import os

import numpy as np


def box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """IoU between [N,6] and [M,6] boxes (y1,x1,z1,y2,x2,z2, exclusive)."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    lo = np.maximum(a[:, None, :3], b[None, :, :3])
    hi = np.minimum(a[:, None, 3:], b[None, :, 3:])
    inter = np.prod(np.clip(hi - lo, 0, None), axis=-1)
    va = np.prod(a[:, 3:] - a[:, :3], axis=-1)
    vb = np.prod(b[:, 3:] - b[:, :3], axis=-1)
    return inter / np.maximum(va[:, None] + vb[None, :] - inter, 1e-9)


def overlap_fraction(det: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Fraction of each GT box's volume covered by each detection: [N,M]."""
    if len(det) == 0 or len(gt) == 0:
        return np.zeros((len(det), len(gt)))
    lo = np.maximum(det[:, None, :3], gt[None, :, :3])
    hi = np.minimum(det[:, None, 3:], gt[None, :, 3:])
    inter = np.prod(np.clip(hi - lo, 0, None), axis=-1)
    vg = np.prod(gt[:, 3:] - gt[:, :3], axis=-1)
    return inter / np.maximum(vg[None, :], 1e-9)


def load_gt_boxes(data_dir: str, name: str) -> np.ndarray:
    rows = []
    with open(os.path.join(data_dir, "csvs", f"{name}.csv")) as f:
        for r in csv.DictReader(f):
            rows.append([float(r[k])
                         for k in ("y1", "x1", "z1", "y2", "x2", "z2")])
    return np.asarray(rows, dtype=np.float64)


def analyze_volume(det_csv: str, gt: np.ndarray, shape, min_score: float,
                   match_iou: float):
    dets = []
    with open(det_csv) as f:
        for r in csv.DictReader(f):
            dets.append((float(r["score"]),
                         [float(r[k])
                          for k in ("y1", "x1", "z1", "y2", "x2", "z2")]))
    dets.sort(key=lambda t: -t[0])
    boxes = np.asarray([b for _, b in dets], dtype=np.float64)
    scores = np.asarray([s for s, _ in dets])
    iou = box_iou(boxes, gt)
    cover = overlap_fraction(boxes, gt)

    matched_gt: set[int] = set()
    out = []
    for i in range(len(boxes)):
        best = float(iou[i].max()) if gt.size else 0.0
        j = int(iou[i].argmax()) if gt.size else -1
        is_tp = best >= match_iou and j not in matched_gt
        if is_tp:
            matched_gt.add(j)
        if is_tp or scores[i] < min_score:
            continue
        merged_n = int((cover[i] >= 0.25).sum()) if gt.size else 0
        if best >= match_iou:
            mode = "duplicate"
        elif merged_n >= 2:
            mode = "merged"
        elif best >= 0.1:
            mode = "localization"
        else:
            mode = "background"
        b = boxes[i]
        border = bool((b[:3] <= 1).any()
                      or b[3] >= shape[0] - 1 or b[4] >= shape[1] - 1
                      or b[5] >= shape[2] - 1)
        out.append({"score": float(scores[i]), "mode": mode,
                    "best_gt_iou": round(best, 3), "merged_gt": merged_n,
                    "border": border,
                    "box": [int(v) for v in b]})
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval_dir", required=True)
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--split", default="test")
    ap.add_argument("--min_score", type=float, default=0.8)
    ap.add_argument("--match_iou", type=float, default=0.5)
    ap.add_argument("--shape", type=int, nargs=3, default=(256, 256, 12),
                    help="volume shape (Y X Z)")
    args = ap.parse_args()

    with open(os.path.join(args.data_dir, "datasets",
                           f"{args.split}.csv")) as f:
        names = [r["names"] for r in csv.DictReader(f)]

    all_fp, per_volume = [], {}
    for image_id, name in enumerate(names):
        det_csv = os.path.join(args.eval_dir, f"{image_id:06d}.csv")
        if not os.path.exists(det_csv):
            continue
        gt = load_gt_boxes(args.data_dir, name)
        fps = analyze_volume(det_csv, gt, args.shape, args.min_score,
                             args.match_iou)
        per_volume[name] = fps
        all_fp.extend(fps)

    modes: dict[str, int] = {}
    border_n = 0
    for fp in all_fp:
        modes[fp["mode"]] = modes.get(fp["mode"], 0) + 1
        border_n += int(fp["border"])
    summary = {
        "min_score": args.min_score,
        "n_high_conf_fp": len(all_fp),
        "by_mode": modes,
        "n_border": border_n,
        "iou_of_background_fps": sorted(
            fp["best_gt_iou"] for fp in all_fp
            if fp["mode"] == "background"),
        "per_volume": per_volume,
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
