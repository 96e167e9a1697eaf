"""Patch-dataset builder for large microscopy stacks (CLI).

The reference does this in prepocess.ipynb: pair up raw + semantic-mask
volumes (HeLa TIFF/MRC stacks), split source volumes into train/test, cut
them into overlapping (Z, Y, X) patches with a sliding window, derive
per-patch instance masks by connected components, and emit the on-disk
dataset layout that ToyDataset/the generators consume:

  {split}/images/{tag}_image.tiff        raw patch (multi-page TIFF)
  {split}/seg/{tag}_seg.tiff             semantic patch
  {split}/masks/{tag}_seg.pickle         bz2 pickle, (Z,Y,X,N) instance masks
  {split}/classes_and_boxes/{tag}_image.dat   "cls z0 y0 x0 z1 y1 x1" lines
  datasets/{train,test}.csv              manifest (names/images/segs/cabs/masks)

Usage:
  python scripts/preprocess_patches.py --images DIR --masks DIR --out DIR \
      [--patch 12 256 256] [--stride 6 256 256] [--test-ratio 0.2] \
      [--max-instances 20] [--seed 42]

Accepts .tif/.tiff and .mrc sources (m3d.utils.mrcio is a dependency-free
MRC2014 reader).
"""

from __future__ import annotations

import argparse
import bz2
import csv
import os
import pickle
import random
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from m3d.utils.tiffio import imread_volume, imwrite_volume  # noqa: E402


def read_any(path: str) -> np.ndarray:
    if path.lower().endswith(".mrc"):
        from m3d.utils.mrcio import read_mrc

        return read_mrc(path)
    return imread_volume(path)


def iter_patches(shape, patch, stride):
    """Yield (z0, y0, x0) origins of full patches over a (Z, Y, X) volume."""
    for z0 in range(0, max(shape[0] - patch[0] + 1, 1), stride[0]):
        for y0 in range(0, max(shape[1] - patch[1] + 1, 1), stride[1]):
            for x0 in range(0, max(shape[2] - patch[2] + 1, 1), stride[2]):
                if (z0 + patch[0] <= shape[0] and y0 + patch[1] <= shape[1]
                        and x0 + patch[2] <= shape[2]):
                    yield z0, y0, x0


def instance_masks(seg_patch: np.ndarray, max_instances: int) -> np.ndarray:
    """Semantic (0=bg) -> (Z, Y, X, N) binary instance masks by 6-connected
    components."""
    from scipy import ndimage

    labeled, n = ndimage.label(seg_patch > 0)
    n = min(n, max_instances)
    if n == 0:
        return np.zeros(seg_patch.shape + (0,), np.uint8)
    masks = np.zeros(seg_patch.shape + (n,), np.uint8)
    for k in range(n):
        masks[..., k] = labeled == (k + 1)
    return masks


def boxes_from_instances(masks: np.ndarray) -> list[str]:
    """(Z,Y,X,N) -> 'cls z0 y0 x0 z1 y1 x1' lines (exclusive upper)."""
    lines = []
    for k in range(masks.shape[-1]):
        zz, yy, xx = np.nonzero(masks[..., k])
        if zz.size == 0:
            continue
        z0, z1 = int(zz.min()), int(zz.max()) + 1
        y0, y1 = int(yy.min()), int(yy.max()) + 1
        x0, x1 = int(xx.min()), int(xx.max()) + 1
        if z1 > z0 and y1 > y0 and x1 > x0:
            lines.append(f"1 {z0} {y0} {x0} {z1} {y1} {x1}")
    return lines


def process_split(pairs, split, out_root, patch, stride, max_instances):
    dirs = {
        name: os.path.join(out_root, split, name)
        for name in ("images", "seg", "masks", "classes_and_boxes")
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    rows = []
    for img_path, msk_path in pairs:
        base = os.path.splitext(os.path.basename(img_path))[0]
        img_vol = read_any(img_path)
        msk_vol = read_any(msk_path)
        assert img_vol.shape == msk_vol.shape, (
            f"{base}: image {img_vol.shape} != mask {msk_vol.shape}"
        )
        for idx, (z0, y0, x0) in enumerate(
                iter_patches(img_vol.shape, patch, stride)):
            tag = f"{base}_p{idx:04d}"
            sl = (slice(z0, z0 + patch[0]), slice(y0, y0 + patch[1]),
                  slice(x0, x0 + patch[2]))
            ipatch, spatch = img_vol[sl], msk_vol[sl]

            img_file = os.path.join(dirs["images"], f"{tag}_image.tiff")
            seg_file = os.path.join(dirs["seg"], f"{tag}_seg.tiff")
            imwrite_volume(img_file, ipatch)
            imwrite_volume(seg_file, spatch.astype(np.uint16))

            inst = instance_masks(spatch, max_instances)
            mask_file = os.path.join(dirs["masks"], f"{tag}_seg.pickle")
            # masks stored (Z, Y, X, N) z-stacks, the on-disk convention the
            # synthetic generator writes and ToyDataset.load_data expects
            # (it transposes to (Y, X, Z, N) on load, m3d/data/datasets.py;
            # reference core/data_generators.py:1672-1714).
            with bz2.BZ2File(mask_file, "wb") as fh:
                pickle.dump(inst.astype(np.float32), fh, protocol=4)

            cab_file = os.path.join(dirs["classes_and_boxes"],
                                    f"{tag}_image.dat")
            with open(cab_file, "w") as fh:
                fh.write("\n".join(boxes_from_instances(inst)))

            rows.append({
                "names": tag,
                "images": img_file,
                "segs": seg_file,
                "cabs": cab_file,
                "masks": mask_file,
            })
        print(f"[{split}] {base}: {idx + 1} patches", flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--images", required=True)
    ap.add_argument("--masks", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--patch", nargs=3, type=int, default=[12, 256, 256],
                    metavar=("Z", "Y", "X"))
    ap.add_argument("--stride", nargs=3, type=int, default=[6, 256, 256],
                    metavar=("Z", "Y", "X"))
    ap.add_argument("--test-ratio", type=float, default=0.2)
    ap.add_argument("--max-instances", type=int, default=20)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    exts = (".tif", ".tiff", ".mrc")
    imgs = sorted(
        os.path.join(args.images, f) for f in os.listdir(args.images)
        if f.lower().endswith(exts)
    )
    msks = sorted(
        os.path.join(args.masks, f) for f in os.listdir(args.masks)
        if f.lower().endswith(exts)
    )
    assert len(imgs) == len(msks) > 0, (
        f"paired sources required: {len(imgs)} images vs {len(msks)} masks"
    )
    pairs = list(zip(imgs, msks))
    random.Random(args.seed).shuffle(pairs)
    cut = int(len(pairs) * (1 - args.test_ratio))
    splits = {"train": pairs[:cut], "test": pairs[cut:] or pairs[-1:]}

    csv_dir = os.path.join(args.out, "datasets")
    os.makedirs(csv_dir, exist_ok=True)
    for split, split_pairs in splits.items():
        rows = process_split(split_pairs, split, args.out,
                             tuple(args.patch), tuple(args.stride),
                             args.max_instances)
        with open(os.path.join(csv_dir, f"{split}.csv"), "w", newline="") as f:
            w = csv.DictWriter(
                f, fieldnames=["names", "images", "segs", "cabs", "masks"])
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {split}.csv ({len(rows)} patches)")


if __name__ == "__main__":
    main()
