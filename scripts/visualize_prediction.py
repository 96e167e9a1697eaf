"""Prediction-quality visualization (CLI twin of prediction.ipynb).

Given a raw volume, a GT instance-label volume, and a predicted label volume
(the TIFF that ``MRCNN_EVALUATION`` writes per image), this computes the
reference notebook's analysis: pixelwise Dice/precision/recall, instance F1
via greedy IoU matching, the slice-wise Dice profile along z with the top-K
best/worst slices, and a composite overlay mosaic (GT in blue, prediction in
red, gray anatomy underneath).

Usage:
  python scripts/visualize_prediction.py --image vol_image.tiff \
      --gt vol_seg.tiff --pred results/vol.tiff \
      [--iou-thr 0.5] [--top-k 5] [--out overlays/]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from m3d.utils.tiffio import imread_volume  # noqa: E402


def dice(tp, fp, fn):
    d = 2 * tp + fp + fn
    return 2 * tp / d if d else 1.0


def precision(tp, fp):
    return tp / (tp + fp) if (tp + fp) else 1.0


def recall(tp, fn):
    return tp / (tp + fn) if (tp + fn) else 1.0


def match_instances(gt_lbl: np.ndarray, pred_lbl: np.ndarray,
                    iou_thr: float):
    """Greedy IoU matching of instance labels; returns (tp, fp, fn)."""
    gt_ids = [int(g) for g in np.unique(gt_lbl) if g != 0]
    pr_ids = [int(p) for p in np.unique(pred_lbl) if p != 0]
    pairs = []
    for gid in gt_ids:
        gm = gt_lbl == gid
        gsum = int(gm.sum())
        touching = np.unique(pred_lbl[gm])
        for pid in (int(p) for p in touching if p != 0):
            pm = pred_lbl == pid
            inter = int(np.logical_and(gm, pm).sum())
            union = gsum + int(pm.sum()) - inter
            if inter:
                pairs.append((inter / union, gid, pid))
    tp = 0
    used_gt: set[int] = set()
    used_pr: set[int] = set()
    for iou, gid, pid in sorted(pairs, reverse=True):
        if iou < iou_thr or gid in used_gt or pid in used_pr:
            continue
        used_gt.add(gid)
        used_pr.add(pid)
        tp += 1
    return tp, len(pr_ids) - tp, len(gt_ids) - tp


def slice_dice_profile(gt_bin: np.ndarray, pred_bin: np.ndarray):
    prof = np.full(gt_bin.shape[0], np.nan)
    for z in range(gt_bin.shape[0]):
        g, p = gt_bin[z], pred_bin[z]
        if not (g.any() or p.any()):
            continue
        tp = int(np.logical_and(g, p).sum())
        fp = int(np.logical_and(~g, p).sum())
        fn = int(np.logical_and(g, ~p).sum())
        prof[z] = dice(tp, fp, fn)
    return prof


def render_overlay(gray: np.ndarray, gt_bin: np.ndarray,
                   pred_bin: np.ndarray) -> np.ndarray:
    """Gray slice + GT (blue) + prediction (red), alpha 0.5 -> RGB [H,W,3]."""
    base = np.dstack([gray] * 3)
    overlay = base.copy()
    overlay[..., 2][gt_bin] = 1.0
    overlay[..., 0][pred_bin] = 1.0
    return np.clip(0.5 * base + 0.5 * overlay, 0, 1)


def save_mosaic(path, image, gt_bin, pred_bin, best, worst, prof):
    tiles = [render_overlay(image[z], gt_bin[z], pred_bin[z])
             for z in list(best) + list(worst)]
    if not tiles:
        return
    h, w, _ = tiles[0].shape
    cols = max(len(best), len(worst), 1)
    mosaic = np.zeros((2 * h, cols * w, 3), np.float32)
    for i, tile in enumerate(tiles):
        r, c = divmod(i, cols)
        mosaic[r * h:(r + 1) * h, c * w:(c + 1) * w] = tile
    from PIL import Image

    Image.fromarray((mosaic * 255).astype(np.uint8)).save(path)


def save_profile_plot(path, prof, best, worst):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # noqa: BLE001 — plotting is optional
        return
    plt.figure(figsize=(8, 4))
    plt.plot(np.arange(prof.size), prof)
    plt.scatter(best, prof[best], marker="o", label="best")
    plt.scatter(worst, prof[worst], marker="x", label="worst")
    plt.xlabel("z slice")
    plt.ylabel("Dice")
    plt.title("Slice-wise Dice profile")
    plt.legend()
    plt.tight_layout()
    plt.savefig(path, dpi=120)
    plt.close()


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--image", required=True)
    ap.add_argument("--gt", required=True)
    ap.add_argument("--pred", required=True)
    ap.add_argument("--iou-thr", type=float, default=0.5)
    ap.add_argument("--top-k", type=int, default=5)
    ap.add_argument("--out", default=None,
                    help="output dir for overlay PNG + profile plot + JSON")
    args = ap.parse_args()

    image = imread_volume(args.image).astype(np.float32)
    nz = image > 0
    if nz.any():
        lo, hi = image[nz].min(), image[nz].max()
        image = (image - lo) / (hi - lo + 1e-6)
    gt = imread_volume(args.gt)
    pred = imread_volume(args.pred)
    assert gt.shape == pred.shape == image.shape, (
        f"shape mismatch: image {image.shape}, gt {gt.shape}, "
        f"pred {pred.shape}"
    )

    gt_bin, pred_bin = gt > 0, pred > 0
    tp = int(np.logical_and(gt_bin, pred_bin).sum())
    fp = int(np.logical_and(~gt_bin, pred_bin).sum())
    fn = int(np.logical_and(gt_bin, ~pred_bin).sum())
    tpi, fpi, fni = match_instances(gt, pred, args.iou_thr)

    prof = slice_dice_profile(gt_bin, pred_bin)
    valid = np.where(~np.isnan(prof))[0]
    k = min(args.top_k, valid.size)
    order = valid[np.argsort(prof[valid])]
    worst, best = order[:k], order[::-1][:k]

    report = {
        "pixel": {"dice": dice(tp, fp, fn), "precision": precision(tp, fp),
                  "recall": recall(tp, fn)},
        "instance": {"f1": dice(tpi, fpi, fni),
                     "precision": precision(tpi, fpi),
                     "recall": recall(tpi, fni),
                     "tp": tpi, "fp": fpi, "fn": fni},
        "best_slices": [[int(z), float(prof[z])] for z in best],
        "worst_slices": [[int(z), float(prof[z])] for z in worst],
    }
    print(json.dumps(report, indent=2))

    if args.out:
        os.makedirs(args.out, exist_ok=True)
        base = os.path.splitext(os.path.basename(args.pred))[0]
        save_mosaic(os.path.join(args.out, base + "_mosaic.png"),
                    image, gt_bin, pred_bin, best, worst, prof)
        save_profile_plot(os.path.join(args.out, base + "_dice_profile.png"),
                          prof, best, worst)
        with open(os.path.join(args.out, base + "_report.json"), "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
