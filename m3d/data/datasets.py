"""Dataset registry and loaders.

Parity with the reference data layer (core/data_generators.py:1403-2023):

- ``Dataset``: class/image registry with prepare/subset/filter_positive.
- ``ToyDataset``: raw volumes from ``datasets/{train,test}.csv`` manifests
  (fuzzy column matching), TIFF images loaded with the reference's
  (Z,Y,X)->(Y,X,Z) transpose convention, percentile-clip + z-score +
  tanh(x*0.5) normalization, boxes from ``.dat`` with the reference's column
  reorder [2,3,1,5,6,4], masks from bz2 pickles.
- ``ToyHeadDataset``: pre-generated head-target artifacts (npz) with
  bit-packed mask decoding (np.unpackbits, reference:
  core/data_generators.py:1908-1921).
"""

from __future__ import annotations

import bz2
import os
import pickle

import numpy as np
import pandas as pd


def normalize_volume(image: np.ndarray) -> np.ndarray:
    """Percentile clip [1,99] -> z-score -> tanh(x*0.5), float32 [...,1].

    Reference: core/data_generators.py:1603-1630 (ToyDataset.load_image).
    """
    image = image.astype(np.float32)
    p1, p99 = np.percentile(image, [1, 99])
    image = np.clip(image, p1, p99)
    mean, std = image.mean(), image.std()
    image = (image - mean) / std if std > 0 else image - mean
    image = np.tanh(image * 0.5)
    return image[..., np.newaxis].astype(np.float32, copy=False)


def _pick_column(columns, *candidates, required=True):
    cols = {c.lower(): c for c in columns}
    for cand in candidates:
        k = cand.lower()
        if k in cols:
            return cols[k]
        for lc, orig in cols.items():
            if k in lc:
                return orig
    if required:
        raise KeyError(f"none of columns {candidates} found in {list(columns)}")
    return None


class Dataset:
    """Image/class registry (reference: core/data_generators.py:1403-1556)."""

    def __init__(self):
        self.image_info: list[dict] = []
        self.class_info: list[dict] = [
            {"source": "", "id": 0, "name": "BG"}
        ]

    def add_class(self, source, class_id, class_name):
        for info in self.class_info:
            if info["source"] == source and info["id"] == class_id:
                return
        self.class_info.append(
            {"source": source, "id": class_id, "name": class_name}
        )

    def add_image(self, source, image_id, path, **kwargs):
        info = {"id": image_id, "source": source, "path": path}
        info.update(kwargs)
        self.image_info.append(info)

    def prepare(self):
        self.num_classes = len(self.class_info)
        self.class_ids = np.arange(self.num_classes)
        self.class_names = [c["name"] for c in self.class_info]
        self.num_images = len(self.image_info)
        self.image_ids = np.arange(self.num_images)

    def subset(self, ids):
        """Shallow-copy view over a subset of image ids."""
        import copy

        view = copy.copy(self)
        view.image_info = [self.image_info[i] for i in ids]
        view.prepare()
        return view

    def filter_positive(self, min_boxes: int = 1, verbose: bool = False):
        """Drop images with fewer than min_boxes valid GT boxes, reading only
        the cheap box files (reference: core/data_generators.py:1431-1473)."""
        keep = []
        for i in range(len(self.image_info)):
            try:
                boxes, class_ids, _ = self.load_data(i, masks_needed=False)
                if boxes.shape[0] >= min_boxes:
                    keep.append(i)
            except Exception as e:  # noqa: BLE001 — skip unreadable samples
                if verbose:
                    print(f"[Dataset.filter_positive] skipping {i}: {e}")
        if verbose:
            print(f"[Dataset.filter_positive] kept {len(keep)}/{len(self.image_info)}")
        return self.subset(keep)

    # To be provided by subclasses
    def load_image(self, image_id):
        raise NotImplementedError

    def load_data(self, image_id, masks_needed=True):
        raise NotImplementedError


class ToyDataset(Dataset):
    """Raw-volume dataset from datasets/{train,test}.csv manifests."""

    def load_dataset(self, data_dir, is_train=True, class_names=("neuron",)):
        for idx, name in enumerate(class_names):
            self.add_class("dataset", idx + 1, name)
        split = "train" if is_train else "test"
        csv_path = os.path.join(data_dir, "datasets", f"{split}.csv")
        td = pd.read_csv(csv_path, sep=None, engine="python")

        col_images = _pick_column(td.columns, "images", "image", "img", "path")
        col_segs = _pick_column(td.columns, "segs", "seg", "labels", required=False)
        col_cabs = _pick_column(td.columns, "cabs", "cab", "boxes")
        col_masks = _pick_column(td.columns, "masks", "mask")

        for i in range(len(td)):
            self.add_image(
                "dataset",
                image_id=i,
                path=td.at[i, col_images],
                seg_path=td.at[i, col_segs] if col_segs else None,
                cab_path=td.at[i, col_cabs],
                m_path=td.at[i, col_masks],
            )

    def load_image(self, image_id):
        from m3d.utils.tiffio import imread_volume

        info = self.image_info[image_id]
        image = imread_volume(info["path"])
        # Reference convention: file treated as (Z, Y, X) -> (Y, X, Z)
        # (core/data_generators.py:1609-1610).
        image = np.transpose(image, (1, 2, 0))
        return normalize_volume(image)

    def load_data(self, image_id, masks_needed=True):
        """Returns (boxes [N,6] int32 px, class_ids [N] int32, masks [H,W,D,N])."""
        info = self.image_info[image_id]
        cabs = np.loadtxt(info["cab_path"], ndmin=2, dtype=np.int32)
        if cabs.size:
            # Column reorder matching the loader's axis convention
            # (reference: core/data_generators.py:1648).
            boxes = cabs[:, [2, 3, 1, 5, 6, 4]]
            class_ids = cabs[:, 0]
            # The synthetic generator writes shape classes 1..3 while most
            # configs declare a single foreground class (NUM_CLASSES=2). The
            # reference feeds the raw ids into a 2-class head — an
            # out-of-bounds gather (latent bug: generate_data.py:88 vs
            # configs NUM_CLASSES=2). We fold extra ids into the last
            # registered class instead.
            nc = getattr(self, "num_classes", 0)
            if nc:
                class_ids = np.clip(class_ids, 0, nc - 1)
            valid = (
                (boxes[:, 3] > boxes[:, 0])
                & (boxes[:, 4] > boxes[:, 1])
                & (boxes[:, 5] > boxes[:, 2])
                & (boxes[:, :3] >= 0).all(axis=1)
            )
            boxes, class_ids = boxes[valid], class_ids[valid]
        else:
            boxes = np.zeros((0, 6), np.int32)
            class_ids = np.zeros((0,), np.int32)

        if not masks_needed:
            return boxes, class_ids, None

        if boxes.shape[0] == 0:
            img = self.load_image(image_id)
            masks = np.zeros((*img.shape[:3], 0), np.float32)
            return boxes, class_ids, masks

        with bz2.BZ2File(info["m_path"], "rb") as f:
            m = pickle.load(f)
        masks = np.transpose(m, (1, 2, 0, 3)).astype(np.float32, copy=False)

        if masks.shape[-1] != boxes.shape[0]:
            n = min(masks.shape[-1], boxes.shape[0])
            masks, boxes, class_ids = masks[..., :n], boxes[:n], class_ids[:n]
        return boxes, class_ids, masks


class ToyHeadDataset(Dataset):
    """Pre-generated head-target artifacts written by target generation.

    CSV columns: rois / rois_aligned / mask_aligned / target_class_ids /
    target_bbox / target_mask paths (reference: core/data_generators.py:1781-1866).
    """

    def load_dataset(self, data_dir, is_train=True, class_names=("neuron",)):
        for idx, name in enumerate(class_names):
            self.add_class("dataset", idx + 1, name)
        split = "train" if is_train else "test"
        csv_path = os.path.join(data_dir, "datasets", f"{split}.csv")
        td = pd.read_csv(csv_path, sep=None, engine="python")

        cols = {
            "rois": _pick_column(td.columns, "rois"),
            "ra": _pick_column(td.columns, "rois_aligned", "ra"),
            "ma": _pick_column(td.columns, "mask_aligned", "ma"),
            "tci": _pick_column(td.columns, "target_class_ids", "tci"),
            "tb": _pick_column(td.columns, "target_bbox", "tb"),
            "tm": _pick_column(td.columns, "target_mask", "tm"),
        }
        for i in range(len(td)):
            self.add_image(
                "dataset", image_id=i, path=td.at[i, cols["rois"]],
                **{k: td.at[i, c] for k, c in cols.items()},
            )

    @staticmethod
    def _load_array(path):
        if str(path).endswith(".npz"):
            with np.load(path, allow_pickle=True) as z:
                key = list(z.keys())[0]
                arr = z[key]
        else:
            arr = np.load(path, allow_pickle=True)
        return arr

    @staticmethod
    def _unpack_mask(arr, shape):
        """Decode bit-packed masks (reference: core/data_generators.py:1908-1921)."""
        if arr.dtype == np.uint8 and arr.ndim == 1:
            total = int(np.prod(shape))
            bits = np.unpackbits(arr, count=total)
            return bits.reshape(shape).astype(np.float32)
        return arr.astype(np.float32)

    def load_data(self, image_id, masks_needed=True):
        """Returns dict of the six target arrays for one image."""
        info = self.image_info[image_id]
        rois = self._load_array(info["rois"]).astype(np.float32)
        ra = self._load_array(info["ra"]).astype(np.float32)
        ma = self._load_array(info["ma"]).astype(np.float32)
        tci = self._load_array(info["tci"]).astype(np.int32)
        tb = self._load_array(info["tb"]).astype(np.float32)
        tm_raw = self._load_array(info["tm"])
        # Mask shape is stored alongside packed bits as "<name>_shape" or
        # inferable from tci length.
        if tm_raw.dtype == np.uint8 and tm_raw.ndim == 1:
            shape_path = str(info["tm"])
            with np.load(shape_path, allow_pickle=True) as z:
                if "shape" in z:
                    tm = self._unpack_mask(z["mask"], tuple(z["shape"]))
                else:
                    raise ValueError(f"packed mask without shape: {shape_path}")
        else:
            tm = tm_raw.astype(np.float32)
        return {
            "rois": rois, "rois_aligned": ra, "mask_aligned": ma,
            "target_class_ids": tci, "target_bbox": tb, "target_mask": tm,
        }

    def filter_by_positive_count(self, min_positive: int = 1):
        keep = []
        for i in range(len(self.image_info)):
            try:
                tci = self._load_array(self.image_info[i]["tci"])
                if int((np.asarray(tci) > 0).sum()) >= min_positive:
                    keep.append(i)
            except Exception:  # noqa: BLE001
                continue
        return self.subset(keep)
