"""RPN training / evaluation / head-target generation drivers.

Replaces the reference RPN orchestrator class (core/models.py:3097-3806):

- ``RPNTrainer.train``: jitted+donated train step over mesh data parallelism;
  loss = 1.0 * rpn_class + 1.5 * rpn_bbox (the reference's hardcoded weight
  override, core/models.py:3363-3377); callbacks = per-epoch rpn_evaluation,
  Best/Latest checkpoints (maximize summed detection score,
  core/models.py:2031-2033), Telemetry JSONL, ReduceLROnPlateau,
  EarlyStopping.
- ``RPNTrainer.head_target_generation``: runs the targeting graph per image
  and saves npz artifacts — rois fp32 / rois_aligned fp16 / masks bit-packed
  via np.packbits — plus train/test CSV manifests
  (core/models.py:3530-3796).
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from m3d.anchors import normalized_pyramid_anchors
from m3d.data.datasets import ToyDataset
from m3d.data.generators import RPNGenerator
from m3d.models import losses as L
from m3d.models.detection_targets import detection_targets_batch
from m3d.models.mask_rcnn import MaskRCNN, init_params
from m3d.ops.roialign3d import pyramid_roi_align
from m3d.parallel.mesh import make_mesh, shard_batch
from m3d.train.checkpoints import BestAndLatest, load_params, restore_by_name
from m3d.train.optim import (EarlyStopping, ReduceLROnPlateau,
                             build_optimizer, get_learning_rate,
                             set_learning_rate)
from m3d.train.telemetry import Telemetry


class RPNTrainer:
    def __init__(self, config, mode: str | None = None):
        self.config = config
        self.mode = mode or config.MODE
        h, w = int(config.IMAGE_SHAPE[0]), int(config.IMAGE_SHAPE[1])
        if h % 64 or w % 64:
            raise ValueError("IMAGE_SHAPE height & width must be multiples of 64")
        self.model = MaskRCNN.from_config(config, mode="training")
        self.anchors = normalized_pyramid_anchors(
            config, voxel_z_over_y=float(getattr(config, "VOXEL_Z_OVER_Y", 1.0))
        )
        self.telemetry = Telemetry(config)
        self.mesh = make_mesh(config)

    # ------------------------------------------------------------------
    def prepare_datasets(self):
        cfg = self.config
        train = ToyDataset()
        train.load_dataset(cfg.DATA_DIR, is_train=True,
                           class_names=tuple(cfg.CLASS_NAMES))
        train.prepare()
        train = train.filter_positive()
        test = ToyDataset()
        test.load_dataset(cfg.DATA_DIR, is_train=False,
                          class_names=tuple(cfg.CLASS_NAMES))
        test.prepare()
        test = test.filter_positive()
        return train, test

    def init_variables(self, key=None):
        key = key if key is not None else jax.random.PRNGKey(
            int(getattr(self.config, "SEED", 0))
        )
        variables = init_params(
            self.model, key,
            channels=int(self.config.IMAGE_CHANNEL_COUNT),
        )
        weights = getattr(self.config, "RPN_WEIGHTS", None)
        if weights:
            source, _ = load_params(weights)
            merged, stats = restore_by_name(variables, source)
            print(f"[RPNTrainer] restored {weights}: {stats}")
            variables = merged
        return variables

    # ------------------------------------------------------------------
    def make_train_step(self, tx):
        model, cfg = self.model, self.config
        lw = cfg.LOSS_WEIGHTS
        # Reference hardcodes {class: 1.0, bbox: 1.5} in RPN.compile
        # (core/models.py:3363-3377) regardless of LOSS_WEIGHTS.
        w_class = float(lw.get("rpn_class_loss_override", 1.0))
        w_bbox = float(lw.get("rpn_bbox_loss_override", 1.5))
        train_bn = bool(getattr(cfg, "TRAIN_BN", False))

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_step(params, opt_state, batch_stats, batch):
            def loss_fn(p, bs):
                variables = {"params": p, "batch_stats": bs}
                if train_bn:
                    out, mut = model.apply(
                        variables, batch["image"],
                        method=MaskRCNN.forward_rpn_train,
                        mutable=["batch_stats"],
                    )
                    new_bs = mut["batch_stats"]
                else:
                    out = model.apply(variables, batch["image"],
                                      method=MaskRCNN.forward_rpn_train)
                    new_bs = bs
                lc, mc = L.rpn_class_loss(batch["rpn_match"],
                                          out["rpn_class_logits"])
                lb, mb = L.rpn_bbox_loss(batch["rpn_bbox"],
                                         batch["rpn_match"], out["rpn_bbox"])
                loss = w_class * lc + w_bbox * lb
                return loss, ({**mc, **mb, "loss": loss}, new_bs)

            (loss, (metrics, batch_stats_out)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch_stats)
            updates, opt_state = tx.update(grads, opt_state, params)
            import optax

            params = optax.apply_updates(params, updates)
            return params, opt_state, batch_stats_out, metrics

        return train_step

    def make_proposal_fn(self, variables):
        # Eval clone with BN in inference mode (running stats): a
        # train_bn=True model would demand mutable batch_stats in apply.
        model = self.model.clone(train_bn=False)
        anchors = self.anchors
        # Pass variables as a jit argument — closing over them would embed
        # the weights as HLO constants (fatal through remote compile).
        variables = jax.device_put(variables)

        @jax.jit
        def predict(v, image):
            out = model.apply(v, image, anchors,
                              method=MaskRCNN.forward_rpn)
            return out["proposals"][0], out["proposals_valid"][0]

        return lambda image: predict(variables, image)

    # ------------------------------------------------------------------
    def train(self, steps_per_epoch: int | None = None, eval_images: int = 8):
        cfg = self.config
        train_ds, test_ds = self.prepare_datasets()
        if getattr(cfg, "AUTO_TUNE_RPN", False):
            from m3d.train.autotune import autotune_rpn

            patch = autotune_rpn(train_ds, cfg)
            # AUTO_TUNE_APPLY: apply the recommendation in-process and
            # rebuild anchors (+ the model, whose RPN head width depends on
            # the ratio count) instead of just printing it — the
            # reference's AutoTune only prints a copy-paste JSON
            # (core/models.py:2923-2935).
            if patch and getattr(cfg, "AUTO_TUNE_APPLY", False):
                for k, v in patch.items():
                    setattr(cfg, k, v)
                self.model = MaskRCNN.from_config(cfg, mode="training")
                self.anchors = normalized_pyramid_anchors(
                    cfg,
                    voxel_z_over_y=float(getattr(cfg, "VOXEL_Z_OVER_Y", 1.0)),
                )
                print(f"[AutoTuneRPN] applied patch; anchors rebuilt "
                      f"({self.anchors.shape[0]} anchors)")
        gen = RPNGenerator(train_ds, cfg, mode="training",
                           seed=int(getattr(cfg, "SEED", 0)),
                           telemetry=self.telemetry)
        variables = self.init_variables()
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        tx = build_optimizer(cfg, params)
        opt_state = tx.init(params)
        train_step = self.make_train_step(tx)

        save_dir = cfg.WEIGHT_DIR or os.path.join(cfg.OUTPUT_DIR, "weights")
        ckpt = BestAndLatest(save_dir, mode="max")
        reduce_lr = ReduceLROnPlateau(mode="max")
        early = EarlyStopping(patience=15, mode="max")

        steps = steps_per_epoch or len(gen)
        from m3d.data.generators import prefetch_to_device

        it = prefetch_to_device(
            (shard_batch(self.mesh, b) for b in iter(gen)),
            size=int(getattr(cfg, "PREFETCH_BUFFERS", 2)),
        )
        from m3d.train.profiling import EpochProfiler

        profiler = EpochProfiler(cfg)
        history = []
        lr = get_learning_rate(opt_state)
        for epoch in range(int(cfg.FROM_EPOCH), int(cfg.EPOCHS)):
            t0 = time.time()
            profiler.maybe_start(epoch)
            agg: dict[str, list] = {}
            for _ in range(steps):
                batch = next(it)
                params, opt_state, batch_stats, metrics = train_step(
                    params, opt_state, batch_stats, batch
                )
                for k, v in jax.device_get(metrics).items():
                    agg.setdefault(k, []).append(float(v))
            profiler.maybe_stop(epoch)
            epoch_metrics = {k: float(np.mean(v)) for k, v in agg.items()}

            # Eval: proposal quality on the test subset; telemetry gets the
            # proposal/GT geometry (reference core/utils.py:1700-1763).
            variables = {"params": params, "batch_stats": batch_stats}
            predict = self.make_proposal_fn(variables)
            from m3d.utils.metrics import rpn_evaluation

            eval_metrics = rpn_evaluation(predict, test_ds, cfg,
                                          max_images=eval_images,
                                          telemetry=self.telemetry)
            epoch_metrics.update(eval_metrics)

            score = eval_metrics["detection_score"]
            ckpt.update(epoch, variables, score,
                        metadata={"kind": "rpn", "epoch": epoch})
            new_lr = reduce_lr.update(score, lr)
            if new_lr != lr:
                lr = new_lr
                opt_state = set_learning_rate(opt_state, lr)
            epoch_metrics["lr"] = lr
            self.telemetry.snapshot_and_reset(epoch, save_dir,
                                              extra=epoch_metrics)
            dt = time.time() - t0
            print(f"[RPN][epoch {epoch}] loss={epoch_metrics.get('loss'):.4f} "
                  f"det_score={score:.1f} lr={lr:.2e} ({dt:.1f}s)")
            history.append(epoch_metrics)
            if early.update(score):
                print("[RPN] early stopping")
                break
        return {"params": params, "batch_stats": batch_stats}, history

    # ------------------------------------------------------------------
    def head_target_generation(self, variables=None, max_images=None,
                               inject_gt: bool = False):
        """Generate + save head-training targets (core/models.py:3530-3796).

        ``inject_gt=True`` prepends the GT boxes to the RPN proposals before
        target sampling, guaranteeing positive targets regardless of RPN
        quality. Not in the reference (which always targets with a converged
        RPN); used by the smoke tests to validate the head-target pipeline
        without a long RPN training run.
        """
        cfg = self.config
        if variables is None:
            variables = self.init_variables()

        # Targeting is a predict pass: BN in inference mode.
        model, anchors = self.model.clone(train_bn=False), self.anchors
        mask_shape = tuple(int(v) for v in cfg.MASK_SHAPE)

        variables = jax.device_put(variables)

        @jax.jit
        def targeting_step(v, key, image, image_meta, gt_class_ids, gt_boxes,
                           gt_masks):
            out = model.apply(v, image, anchors,
                              method=MaskRCNN.forward_rpn)
            proposals = out["proposals"]
            if inject_gt:
                # GT rows first (padding rows are all-zero and get trimmed by
                # detection_targets); tail proposals drop to keep the shape.
                proposals = jnp.concatenate(
                    [gt_boxes, proposals], axis=1
                )[:, :proposals.shape[1]]
            targets = detection_targets_batch(
                key, proposals, gt_class_ids, gt_boxes, gt_masks,
                jnp.asarray(cfg.BBOX_STD_DEV, jnp.float32),
                int(cfg.TRAIN_ROIS_PER_IMAGE), float(cfg.ROI_POSITIVE_RATIO),
                float(cfg.RPN_POSITIVE_IOU), float(cfg.RPN_NEGATIVE_IOU),
                mask_shape, use_mini_mask=bool(cfg.USE_MINI_MASK),
            )
            feats = out["feature_maps"][:4]
            rois_aligned = pyramid_roi_align(
                targets["rois"], image_meta, list(feats), int(cfg.POOL_SIZE)
            )
            mask_aligned = pyramid_roi_align(
                targets["rois"], image_meta, list(feats),
                int(cfg.MASK_POOL_SIZE)
            )
            return targets, rois_aligned, mask_aligned

        out_dir = cfg.DATA_DIR if cfg.MODE == "targeting" else cfg.OUTPUT_DIR
        out_root = os.path.join(out_dir, "head_targets")
        manifests = {}
        key = jax.random.PRNGKey(int(getattr(cfg, "SEED", 0)))

        for split, is_train in (("train", True), ("test", False)):
            ds = ToyDataset()
            ds.load_dataset(cfg.DATA_DIR, is_train=is_train,
                            class_names=tuple(cfg.CLASS_NAMES))
            ds.prepare()
            ds = ds.filter_positive()
            gen = RPNGenerator(ds, cfg, mode="targeting", shuffle=False)

            rows = []
            n = len(ds.image_info)
            # TARGET_RATIO: target only the leading fraction of each split
            # (reference _run_split, core/models.py:3638-3641).
            ratio = float(getattr(cfg, "TARGET_RATIO", 1.0))
            if ratio < 1.0:
                total = n
                n = max(1, int(round(ratio * n)))
                print(f"[targeting] {split}: targeting {n}/{total} images "
                      f"(TARGET_RATIO={ratio}); {total - n} skipped")
            if max_images:
                n = min(n, max_images)
            split_dir = os.path.join(out_root, split)
            os.makedirs(split_dir, exist_ok=True)

            for image_id in range(n):
                batch = gen.get_batch([image_id])
                key, sub = jax.random.split(key)
                targets, ra, ma = targeting_step(
                    variables, sub, batch["image"], batch["image_meta"],
                    batch["gt_class_ids"], batch["gt_boxes"],
                    batch["gt_masks"],
                )
                tci = np.asarray(targets["class_ids"][0])
                n_pos = int((tci > 0).sum())
                if n_pos < int(cfg.MIN_POSITIVE_TARGETS):
                    print(f"[targeting][{split}#{image_id}] skipped "
                          f"({n_pos} positives)")
                    continue
                name = str(image_id).zfill(6)
                paths = _save_target_npz(
                    split_dir, name,
                    rois=np.asarray(targets["rois"][0], np.float32),
                    rois_aligned=np.asarray(ra[0], np.float16),
                    mask_aligned=np.asarray(ma[0], np.float16),
                    target_class_ids=tci.astype(np.int32),
                    target_bbox=np.asarray(targets["deltas"][0], np.float32),
                    target_mask=np.asarray(targets["masks"][0]),
                )
                rows.append(paths)

            import csv

            man_dir = os.path.join(out_root, "datasets")
            os.makedirs(man_dir, exist_ok=True)
            man_path = os.path.join(man_dir, f"{split}.csv")
            with open(man_path, "w", newline="") as f:
                wr = csv.writer(f)
                wr.writerow(["rois", "rois_aligned", "mask_aligned",
                             "target_class_ids", "target_bbox", "target_mask"])
                for r in rows:
                    wr.writerow([r[k] for k in
                                 ("rois", "rois_aligned", "mask_aligned",
                                  "target_class_ids", "target_bbox",
                                  "target_mask")])
            manifests[split] = man_path
            print(f"[targeting] {split}: {len(rows)} images -> {man_path}")
        return out_root, manifests


def _save_target_npz(split_dir, name, **arrays):
    """Write one image's artifacts; masks bit-packed like the reference
    (np.packbits + shape sidecar, core/models.py:3585-3595)."""
    paths = {}
    for key, arr in arrays.items():
        path = os.path.join(split_dir, f"{name}_{key}.npz")
        if key == "target_mask":
            packed = np.packbits((arr > 0.5).astype(np.uint8))
            np.savez_compressed(path, mask=packed,
                                shape=np.asarray(arr.shape))
        else:
            # Uncompressed: the fp16 aligned features are ~90MB/image of
            # high-entropy floats — zlib shrinks them <10% but costs ~60s
            # per image on a small host (it dominated the whole targeting
            # stage). np.load reads both containers transparently.
            np.savez(path, arr=arr)
        paths[key] = path
    return paths
