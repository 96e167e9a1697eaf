"""Batch generators: host-side numpy pipelines feeding the device.

Parity with the reference generators (core/data_generators.py:180-1341):
- ``RPNGenerator``: training batches [image, rpn_match, rpn_bbox] with GT
  jitter + ATSS target assignment; targeting/e2e batches with padded GT.
- ``MrcnnGenerator``: full-training batches and inference inputs.
- ``HeadGenerator``: pre-generated target artifacts with weak-positive
  filtering by mask coverage and pos/neg balanced sampling.

TPU design: every batch has a FIXED shape (GT padded to MAX_GT_INSTANCES,
targets to TRAIN_ROIS_PER_IMAGE, one compiled graph per shape bucket).
``prefetch_to_device`` overlaps host loading with device compute.
"""

from __future__ import annotations

import numpy as np

from m3d.anchors import normalized_pyramid_anchors
from m3d.data.augment import apply_minimal_augs_3d, jitter_boxes_3d
from m3d.data.rpn_targets import build_rpn_targets
from m3d.image_meta import compose_image_meta


def pad_to(arr, n, axis=0):
    """Zero-pad (or truncate) arr along axis to length n."""
    arr = np.asarray(arr)
    cur = arr.shape[axis]
    if cur == n:
        return arr
    if cur > n:
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(0, n)
        return arr[tuple(sl)]
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, n - cur)
    return np.pad(arr, pad)


def nearest_resize_3d(vol, out_shape):
    """Nearest-neighbor spatial resize of [..., H, W, D, C]-style blocks.

    Used to adapt pre-generated aligned features to config pool sizes
    (reference: core/data_generators.py:385-423).
    """
    vol = np.asarray(vol)
    h, w, d = vol.shape[-4:-1]
    oh, ow, od = out_shape
    iy = np.minimum((np.arange(oh) * h / oh).astype(int), h - 1)
    ix = np.minimum((np.arange(ow) * w / ow).astype(int), w - 1)
    iz = np.minimum((np.arange(od) * d / od).astype(int), d - 1)
    return vol[..., iy[:, None, None], ix[None, :, None], iz[None, None, :], :]


class RPNGenerator:
    """Iterable over RPN batches.

    mode="training":  (inputs dict with image/rpn_match/rpn_bbox)
    mode="targeting": single-sample dicts with image/meta/gt (normalized boxes)
    mode="e2e":       batched dicts with padded GT
    """

    def __init__(self, dataset, config, mode: str | None = None, shuffle=True,
                 seed: int = 0, telemetry=None, augment=None):
        self.dataset = dataset
        self.config = config
        self.mode = mode or config.MODE
        self.shuffle = shuffle
        self.telemetry = telemetry
        # augment: None = mode/config default; True/False = hard override.
        # Validation generators pass augment=False so val batches match the
        # reference's load_image_gt(augment=False) (core/models.py:5823-5831).
        self.augment = augment
        self.seed = seed
        self.rng = np.random.RandomState(seed)
        self.batch_size = 1 if self.mode == "targeting" else config.BATCH_SIZE
        voxel = float(getattr(config, "VOXEL_Z_OVER_Y", 1.0))
        self.anchors = normalized_pyramid_anchors(config, voxel_z_over_y=voxel)
        self._order = np.arange(len(dataset.image_info))

    def reset(self, seed: int | None = None):
        """Restore the generator's rng + iteration order to its initial state.

        Validation loops call this each epoch so the exact same batches (and
        the same host-side random draws, e.g. RPN anchor subsampling in
        build_rpn_targets) are evaluated every epoch — the reference achieves
        this by re-creating its val generator per fit call with augment=False
        (core/models.py:5823-5831).
        """
        self.rng = np.random.RandomState(self.seed if seed is None else seed)
        self._order = np.arange(len(self.dataset.image_info))
        return self

    def __len__(self):
        return max(1, len(self.dataset.image_info) // self.batch_size)

    def load_image_gt(self, image_id, augment=None):
        """Returns (image [H,W,D,1], boxes_px [N,6] float, class_ids, masks)."""
        cfg = self.config
        image = self.dataset.load_image(image_id)
        boxes, class_ids, masks = self.dataset.load_data(image_id)
        boxes = boxes.astype(np.float32)
        if self.augment is not None:
            do_aug = self.augment
        else:
            do_aug = cfg.AUGMENT if augment is None else augment
        if do_aug and self.mode == "training":
            image, boxes, masks = apply_minimal_augs_3d(
                image, boxes, masks, cfg, rng=self.rng
            )
        return image, boxes, class_ids, masks

    def _sample_training(self, image_id):
        cfg = self.config
        image, boxes, class_ids, _ = self.load_image_gt(image_id)
        H, W, D = image.shape[:3]
        target_boxes = boxes
        if getattr(cfg, "RPN_AUGMENT_GT", False) and boxes.size:
            target_boxes = jitter_boxes_3d(
                boxes,
                count=int(cfg.RPN_GT_JITTER_PER_BOX),
                scale_sigma=float(cfg.RPN_GT_JITTER_SCALE_SIGMA),
                trans=tuple(cfg.RPN_GT_JITTER_TRANS),
                img_shape=(H, W, D),
                iou_thr=float(cfg.RPN_GT_JITTER_IOU_THR),
                rng=self.rng,
            )
        rpn_match, rpn_bbox = build_rpn_targets(
            self.anchors, class_ids, target_boxes, cfg, rng=self.rng,
            telemetry=self.telemetry,
        )
        return image, rpn_match, rpn_bbox

    def _sample_gt(self, image_id, augment=False):
        """GT sample with normalized boxes, padded to MAX_GT_INSTANCES."""
        cfg = self.config
        image, boxes, class_ids, masks = self.load_image_gt(
            image_id, augment=augment
        )
        H, W, D = image.shape[:3]
        scale = np.array([H, W, D, H, W, D], np.float32)
        boxes_norm = np.clip(boxes / scale, 0.0, 1.0) if boxes.size else boxes.reshape(0, 6)
        G = int(cfg.MAX_GT_INSTANCES)
        meta = compose_image_meta(
            image_id, (H, W, D, 1), (H, W, D, 1), (0, 0, 0, H, W, D), 1.0,
            [1] * int(cfg.NUM_CLASSES),
        )
        if masks is None:
            masks = np.zeros((H, W, D, 0), np.float32)
        if getattr(cfg, "USE_MINI_MASK", False):
            # Store each instance's mask cropped to its GT box and resized
            # to MINI_MASK_SHAPE (reference core/config.py:28-29,
            # core/utils.py minimize_mask): ~H*W*D/prod(mini) less host
            # memory per batch; detection_targets crops from mini-masks in
            # GT-relative coordinates (use_mini_mask=True).
            from m3d.utils.minimask import minimize_mask

            masks = minimize_mask(
                boxes.astype(np.int32), masks,
                tuple(int(v) for v in cfg.MINI_MASK_SHAPE))
        return {
            "image": image.astype(np.float32),
            "image_meta": meta,
            "gt_class_ids": pad_to(class_ids.astype(np.int32), G),
            "gt_boxes": pad_to(boxes_norm.astype(np.float32), G),
            "gt_masks": pad_to(masks.astype(np.float32), G, axis=3),
        }

    def __iter__(self):
        if len(self._order) < self.batch_size:
            raise ValueError(
                f"dataset has {len(self._order)} images < batch_size "
                f"{self.batch_size}: no batch can ever be formed"
            )
        while True:
            if self.shuffle:
                self.rng.shuffle(self._order)
            for start in range(0, len(self._order) - self.batch_size + 1,
                               self.batch_size):
                ids = self._order[start:start + self.batch_size]
                yield self.get_batch(ids)

    def get_batch(self, ids):
        if self.mode == "training":
            samples = [self._sample_training(i) for i in ids]
            return {
                "image": np.stack([s[0] for s in samples]),
                "rpn_match": np.stack([s[1] for s in samples]),
                "rpn_bbox": np.stack([s[2] for s in samples]),
            }
        # targeting / e2e: padded GT batches
        samples = [self._sample_gt(i, augment=(self.mode != "targeting"))
                   for i in ids]
        return {
            k: np.stack([s[k] for s in samples]) for k in samples[0]
        }


class MrcnnGenerator(RPNGenerator):
    """Full Mask R-CNN batches (reference: core/data_generators.py:1091-1341)."""

    def get_batch(self, ids):
        if self.mode == "training":
            gt = {
                k: np.stack([s[k] for s in
                             [self._sample_gt(i, augment=self.config.AUGMENT)
                              for i in ids]])
                for k in ("image", "image_meta", "gt_class_ids", "gt_boxes",
                          "gt_masks")
            }
            # plus RPN targets computed from the (un-jittered) GT
            matches, bboxes = [], []
            for b in range(len(ids)):
                H, W, D = gt["image"][b].shape[:3]
                scale = np.array([H, W, D, H, W, D], np.float32)
                boxes_px = gt["gt_boxes"][b] * scale
                m, bb = build_rpn_targets(
                    self.anchors, gt["gt_class_ids"][b], boxes_px,
                    self.config, rng=self.rng,
                )
                matches.append(m)
                bboxes.append(bb)
            gt["rpn_match"] = np.stack(matches)
            gt["rpn_bbox"] = np.stack(bboxes)
            return gt
        return super().get_batch(ids)

    def get_input_prediction(self, image_id):
        """Single normalized inference input (reference:
        core/data_generators.py:1220-1283).

        Variable image sizes: the volume is zero-padded UP to its compile
        bucket (XY multiple of 64, z multiple of 8) and anchors come from a
        per-bucket cache — one compiled graph per bucket instead of the
        reference's offline re-patching (anchor cache parity:
        core/models.py:3478-3528). The true extent rides in the meta window
        so evaluation can crop back.
        """
        from m3d.anchors import AnchorCache, bucket_image_shape

        if not hasattr(self, "_anchor_cache"):
            self._anchor_cache = AnchorCache(
                self.config,
                voxel_z_over_y=float(
                    getattr(self.config, "VOXEL_Z_OVER_Y", 1.0)),
            )
        image = self.dataset.load_image(image_id)
        H, W, D = image.shape[:3]
        PH, PW, PD = bucket_image_shape((H, W, D))
        if (PH, PW, PD) != (H, W, D):
            image = np.pad(
                image, [(0, PH - H), (0, PW - W), (0, PD - D), (0, 0)])
        meta = compose_image_meta(
            image_id, (H, W, D, 1), (PH, PW, PD, 1), (0, 0, 0, H, W, D), 1.0,
            [1] * int(self.config.NUM_CLASSES),
        )
        return {
            "image": image[None].astype(np.float32),
            "image_meta": meta[None],
            "anchors": self._anchor_cache.get((PH, PW, PD)),
        }


class HeadGenerator:
    """Batches of pre-generated head targets (reference:
    core/data_generators.py:180-683).

    Applies weak-positive filtering (positives whose 28^3 target mask covers
    < HEAD_MIN_POSITIVE_COVERAGE of the crop are demoted to ignore) and
    pos/neg balanced sampling to TRAIN_ROIS_PER_IMAGE.
    """

    def __init__(self, dataset, config, shuffle=True, seed: int = 0):
        self.dataset = dataset
        self.config = config
        self.shuffle = shuffle
        self.seed = seed
        self.rng = np.random.RandomState(seed)
        self.batch_size = config.BATCH_SIZE
        self._order = np.arange(len(dataset.image_info))

    def reset(self, seed: int | None = None):
        """Restore rng + order so val passes draw identical ROI samples
        every epoch (see RPNGenerator.reset)."""
        self.rng = np.random.RandomState(self.seed if seed is None else seed)
        self._order = np.arange(len(self.dataset.image_info))
        return self

    def __len__(self):
        return max(1, len(self.dataset.image_info) // self.batch_size)

    def _sample(self, image_id):
        cfg = self.config
        data = self.dataset.load_data(image_id)
        T = int(cfg.TRAIN_ROIS_PER_IMAGE)
        P = int(cfg.POOL_SIZE)
        MP = int(cfg.MASK_POOL_SIZE)

        ra, ma = data["rois_aligned"], data["mask_aligned"]
        tci = data["target_class_ids"].reshape(-1)
        tb, tm = data["target_bbox"], data["target_mask"]
        rois = data["rois"]

        n = min(len(tci), ra.shape[0], ma.shape[0], 200 * 10)  # sanity cap
        ra, ma, tci, tb, tm, rois = (a[:n] for a in (ra, ma, tci, tb, tm, rois))

        # Adapt feature crops to the configured pool sizes.
        if ra.shape[1:4] != (P, P, P):
            ra = nearest_resize_3d(ra, (P, P, P))
        if ma.shape[1:4] != (MP, MP, MP):
            ma = nearest_resize_3d(ma, (MP, MP, MP))

        # Weak-positive filtering by mask coverage
        # (reference: core/data_generators.py:506-551).
        min_cov = float(getattr(cfg, "HEAD_MIN_POSITIVE_COVERAGE", 0.06))
        pos = tci > 0
        if pos.any() and tm.size:
            cov = tm.reshape(tm.shape[0], -1).mean(axis=1)
            weak = pos & (cov < min_cov)
            tci = np.where(weak, 0, tci)
            pos = tci > 0

        # Balanced sampling to T slots, positives first.
        pos_idx = np.where(pos)[0]
        neg_idx = np.where(~pos)[0]
        if getattr(cfg, "HEAD_SHUFFLE_ROIS", False):
            self.rng.shuffle(pos_idx)
            self.rng.shuffle(neg_idx)
        if getattr(cfg, "HEAD_BALANCE_POS", False):
            cap = max(1, int(round(T * float(cfg.HEAD_POS_FRAC))))
            pos_idx = pos_idx[:cap]
        pos_idx = pos_idx[:T]
        neg_idx = neg_idx[: T - len(pos_idx)]
        sel = np.concatenate([pos_idx, neg_idx]).astype(int)

        out = {
            "rois": pad_to(rois[sel], T),
            "rois_aligned": pad_to(ra[sel], T).astype(np.float32),
            "mask_aligned": pad_to(ma[sel], T).astype(np.float32),
            "target_class_ids": pad_to(tci[sel], T).astype(np.int32),
            "target_bbox": pad_to(tb[sel], T).astype(np.float32),
            "target_mask": pad_to(tm[sel], T).astype(np.float32),
        }
        return out

    def __iter__(self):
        if len(self._order) < self.batch_size:
            raise ValueError(
                f"head-target dataset has {len(self._order)} images < "
                f"batch_size {self.batch_size}: no batch can ever be formed "
                "(was target generation run, and did it keep any images?)"
            )
        while True:
            if self.shuffle:
                self.rng.shuffle(self._order)
            for start in range(0, len(self._order) - self.batch_size + 1,
                               self.batch_size):
                ids = self._order[start:start + self.batch_size]
                samples = [self._sample(i) for i in ids]
                yield {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def prefetch_to_device(iterator, size: int = 2):
    """Double-buffered host->device prefetch (replaces keras fit_generator
    workers; reference runs workers=1 everywhere, core/models.py:3469-3471)."""
    import collections

    import jax

    queue = collections.deque()

    def enqueue(n):
        for _ in range(n):
            try:
                batch = next(iterator)
            except StopIteration:
                return
            queue.append(jax.device_put(batch))

    enqueue(size)
    while queue:
        yield queue.popleft()
        enqueue(1)
