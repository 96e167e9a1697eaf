"""HEAD training drivers: head-only (pre-generated targets) and end-to-end.

Replaces the reference HEAD orchestrator (core/models.py:3878-4872):

- head-only (MODE "training"): trains classifier+mask heads on pre-aligned
  features from TARGET_GENERATION via HeadGenerator, with the 10-batch
  target-quality preflight that raises on degenerate targets
  (core/models.py:4730-4821).
- e2e (MODE "training_head_e2e"): full frozen backbone+FPN+RPN with LIVE
  proposal sampling (DetectionTargetLayer in-graph) feeding trainable heads
  (core/models.py:4234-4402). Freezing is an optimizer mask over param paths
  (everything except mrcnn_* frozen — the reference's prefix rule,
  core/models.py:4626-4701) — gradients for frozen subtrees are zeroed by
  optax, and XLA dead-code-eliminates their backward pass entirely.
- losses weighted by LOSS_WEIGHTS (core/models.py:4438-4495).
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from m3d.anchors import normalized_pyramid_anchors
from m3d.data.datasets import ToyDataset, ToyHeadDataset
from m3d.data.generators import HeadGenerator, RPNGenerator
from m3d.models import losses as L
from m3d.models.detection_targets import detection_targets_batch
from m3d.models.mask_rcnn import MaskRCNN, init_params
from m3d.ops.roialign3d import pyramid_roi_align
from m3d.parallel.mesh import make_mesh, shard_batch
from m3d.train.checkpoints import (BestAndLatest, load_params,
                                   restore_by_name)
from m3d.train.optim import (EarlyStopping, ReduceLROnPlateau,
                             apply_constraints, build_optimizer,
                             get_learning_rate, set_learning_rate)
from m3d.train.telemetry import Telemetry

HEAD_PREFIXES = ("mrcnn_",)


def _is_frozen_for_e2e(path: str) -> bool:
    """Freeze everything except the mrcnn_* heads (reference freezes
    res*/bn*/fpn_/rpn_ prefixes and asserts >=10M frozen params)."""
    return not any(seg.startswith("mrcnn_") for seg in path.split("/"))


def head_losses(config, outputs, batch, active_class_ids):
    lw = config.LOSS_WEIGHTS
    lc, mc = L.mrcnn_class_loss(
        batch["target_class_ids"], outputs["mrcnn_class_logits"],
        active_class_ids,
    )
    lb, mb = L.mrcnn_bbox_loss(
        batch["target_bbox"], batch["target_class_ids"],
        outputs["mrcnn_bbox"],
    )
    lm, mm = L.mrcnn_mask_loss(
        batch["target_mask"], batch["target_class_ids"],
        outputs["mrcnn_masks"],
    )
    loss = (
        float(lw.get("mrcnn_class_loss", 1.0)) * lc
        + float(lw.get("mrcnn_bbox_loss", 1.0)) * lb
        + float(lw.get("mrcnn_mask_loss", 1.0)) * lm
    )
    metrics = {**mc, **mb, **mm, "loss": loss}
    return loss, metrics


class HeadTrainer:
    def __init__(self, config, mode: str | None = None):
        self.config = config
        self.mode = mode or config.MODE
        self.model = MaskRCNN.from_config(config, mode="training")
        self.telemetry = Telemetry(config)
        self.mesh = make_mesh(config)
        self.anchors = normalized_pyramid_anchors(
            config, voxel_z_over_y=float(getattr(config, "VOXEL_Z_OVER_Y", 1.0))
        )

    # ------------------------------------------------------------------
    def init_variables(self, key=None, require_rpn=False):
        cfg = self.config
        key = key if key is not None else jax.random.PRNGKey(
            int(getattr(cfg, "SEED", 0)))
        variables = init_params(self.model, key,
                                channels=int(cfg.IMAGE_CHANNEL_COUNT))
        rpn_weights = getattr(cfg, "RPN_WEIGHTS", None)
        if require_rpn and not rpn_weights:
            raise ValueError(
                "RPN_WEIGHTS is required for e2e head training "
                "(reference: core/models.py:4572-4576)"
            )
        for path in (rpn_weights, getattr(cfg, "HEAD_WEIGHTS", None)):
            if path:
                source, _ = load_params(path)
                variables, stats = restore_by_name(variables, source)
                print(f"[HeadTrainer] restored {path}: {stats}")
        if int(cfg.FROM_EPOCH) > 0:
            best = os.path.join(cfg.WEIGHT_DIR or "", "best.msgpack")
            if os.path.exists(best):
                source, _ = load_params(best)
                variables, stats = restore_by_name(variables, source)
                print(f"[HeadTrainer] resumed from {best}: {stats}")
        return variables

    # ------------------------------------------------------------------
    # Head-only mode
    # ------------------------------------------------------------------
    def preflight_targets(self, gen, num_batches: int = 10):
        """Raise on degenerate target quality (core/models.py:4730-4821)."""
        it = iter(gen)
        pos_fracs, mask_covs = [], []
        for _ in range(num_batches):
            batch = next(it)
            tci = batch["target_class_ids"]
            pos = tci > 0
            pos_fracs.append(float(pos.mean()))
            if pos.any():
                mask_covs.append(float(batch["target_mask"][pos].mean()))
        if np.sum(pos_fracs) == 0:
            raise RuntimeError(
                "[preflight] no positive ROIs in sampled batches — target "
                "generation produced degenerate data"
            )
        if mask_covs and float(np.mean(mask_covs)) < 1e-4:
            raise RuntimeError(
                "[preflight] positive target masks are empty — mask cropping "
                "is broken in the target artifacts"
            )
        print(f"[preflight] pos_frac={np.mean(pos_fracs):.3f} "
              f"mask_cov={np.mean(mask_covs) if mask_covs else 0:.3f}")

    def make_head_only_step(self, tx):
        model, cfg = self.model, self.config
        nc = int(cfg.NUM_CLASSES)
        train_bn = bool(getattr(cfg, "TRAIN_BN", False))

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_step(params, opt_state, batch_stats, batch):
            active = jnp.ones((batch["rois_aligned"].shape[0], nc), jnp.float32)

            def loss_fn(p, bs):
                variables = {"params": p, "batch_stats": bs}
                if train_bn:
                    out, mut = model.apply(
                        variables, batch["rois_aligned"],
                        batch["mask_aligned"],
                        method=MaskRCNN.forward_heads,
                        mutable=["batch_stats"],
                    )
                    new_bs = mut["batch_stats"]
                else:
                    out = model.apply(
                        variables, batch["rois_aligned"],
                        batch["mask_aligned"],
                        method=MaskRCNN.forward_heads,
                    )
                    new_bs = bs
                loss, metrics = head_losses(cfg, out, batch, active)
                return loss, (metrics, new_bs)

            (loss, (metrics, batch_stats_out)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch_stats)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = apply_constraints(optax.apply_updates(params, updates))
            return params, opt_state, batch_stats_out, metrics

        return train_step

    def train_head_only(self, steps_per_epoch=None, val_steps: int = 4):
        cfg = self.config
        train_ds = ToyHeadDataset()
        train_ds.load_dataset(cfg.DATA_DIR, is_train=True)
        train_ds.prepare()
        test_ds = ToyHeadDataset()
        test_ds.load_dataset(cfg.DATA_DIR, is_train=False)
        test_ds.prepare()

        gen = HeadGenerator(train_ds, cfg, seed=int(getattr(cfg, "SEED", 0)))
        if len(test_ds.image_info) >= int(cfg.BATCH_SIZE):
            val_gen = HeadGenerator(test_ds, cfg, shuffle=False)
        else:  # split can't fill one batch: gate on train loss
            print(f"[HEAD] test split has {len(test_ds.image_info)} images "
                  f"< BATCH_SIZE {cfg.BATCH_SIZE}; gating on train loss")
            val_gen = None
        self.preflight_targets(gen, num_batches=min(10, len(gen)))

        variables = self.init_variables()
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        tx = build_optimizer(cfg, params)
        opt_state = tx.init(params)
        step_fn = self.make_head_only_step(tx)
        return self._train_loop(gen, val_gen, params, opt_state, batch_stats,
                                step_fn, self._make_head_eval())

    def _make_head_eval(self):
        # Eval clone: BN uses running stats regardless of TRAIN_BN.
        model, cfg = self.model.clone(train_bn=False), self.config
        nc = int(cfg.NUM_CLASSES)

        @jax.jit
        def eval_step(params, batch_stats, batch):
            active = jnp.ones((batch["rois_aligned"].shape[0], nc), jnp.float32)
            out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["rois_aligned"], batch["mask_aligned"],
                method=MaskRCNN.forward_heads,
            )
            _, metrics = head_losses(cfg, out, batch, active)
            return metrics

        return eval_step

    # ------------------------------------------------------------------
    # E2E mode
    # ------------------------------------------------------------------
    def make_e2e_step(self, tx):
        model, cfg = self.model, self.config
        anchors = self.anchors
        nc = int(cfg.NUM_CLASSES)
        mask_shape = tuple(int(v) for v in cfg.MASK_SHAPE)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch_stats, batch, key):
            def loss_fn(p):
                rpn_out = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    batch["image"], anchors, method=MaskRCNN.forward_rpn,
                )
                proposals = jax.lax.stop_gradient(rpn_out["proposals"])
                targets = detection_targets_batch(
                    key, proposals, batch["gt_class_ids"], batch["gt_boxes"],
                    batch["gt_masks"],
                    jnp.asarray(cfg.BBOX_STD_DEV, jnp.float32),
                    int(cfg.TRAIN_ROIS_PER_IMAGE),
                    float(cfg.ROI_POSITIVE_RATIO),
                    float(cfg.RPN_POSITIVE_IOU), float(cfg.RPN_NEGATIVE_IOU),
                    mask_shape, use_mini_mask=bool(cfg.USE_MINI_MASK),
                )
                # The trunk (backbone/FPN/RPN) is ALWAYS frozen in e2e mode
                # (_is_frozen_for_e2e; reference core/models.py:4626-4701
                # sets those layers untrainable). Stopping gradients at the
                # feature maps yields identical head updates while skipping
                # the entire trunk backward pass (~2x the forward cost at
                # 128^3 — measured 425 -> ~190 ms/step on v5e).
                feats = jax.lax.stop_gradient(
                    tuple(rpn_out["feature_maps"][:4]))
                ra = pyramid_roi_align(targets["rois"], batch["image_meta"],
                                       list(feats), int(cfg.POOL_SIZE))
                ma = pyramid_roi_align(targets["rois"], batch["image_meta"],
                                       list(feats), int(cfg.MASK_POOL_SIZE))
                out = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    ra, ma, method=MaskRCNN.forward_heads,
                )
                head_batch = {
                    "target_class_ids": targets["class_ids"],
                    "target_bbox": targets["deltas"],
                    "target_mask": targets["masks"],
                }
                active = jnp.ones((proposals.shape[0], nc), jnp.float32)
                loss, metrics = head_losses(cfg, out, head_batch, active)
                metrics["pos_count"] = jnp.mean(
                    targets["pos_count"].astype(jnp.float32))
                return loss, metrics

            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = apply_constraints(optax.apply_updates(params, updates),
                                       frozen_predicate=_is_frozen_for_e2e)
            # batch_stats pass through unchanged (trunk frozen, TRAIN_BN
            # rejected in train_e2e) — uniform step signature for _train_loop.
            return params, opt_state, batch_stats, metrics

        return train_step

    def make_e2e_eval_step(self):
        """Validation forward for e2e mode: same live-proposal loss as
        ``make_e2e_step`` but gradient-free, BN in running-stats mode, and
        with a FIXED target-sampling key — the per-epoch val loss compares
        the same ROI draws across epochs (the reference validates e2e with
        ``fit_generator(validation_data=...)``, core/models.py:4609-4622).
        """
        cfg = self.config
        model = self.model.clone(train_bn=False)
        anchors = self.anchors
        nc = int(cfg.NUM_CLASSES)
        mask_shape = tuple(int(v) for v in cfg.MASK_SHAPE)
        val_key = jax.random.PRNGKey(int(getattr(cfg, "SEED", 0)) + 99)

        @jax.jit
        def eval_step(params, batch_stats, batch):
            variables = {"params": params, "batch_stats": batch_stats}
            rpn_out = model.apply(variables, batch["image"], anchors,
                                  method=MaskRCNN.forward_rpn)
            targets = detection_targets_batch(
                val_key, rpn_out["proposals"], batch["gt_class_ids"],
                batch["gt_boxes"], batch["gt_masks"],
                jnp.asarray(cfg.BBOX_STD_DEV, jnp.float32),
                int(cfg.TRAIN_ROIS_PER_IMAGE),
                float(cfg.ROI_POSITIVE_RATIO),
                float(cfg.RPN_POSITIVE_IOU), float(cfg.RPN_NEGATIVE_IOU),
                mask_shape, use_mini_mask=bool(cfg.USE_MINI_MASK),
            )
            feats = rpn_out["feature_maps"][:4]
            ra = pyramid_roi_align(targets["rois"], batch["image_meta"],
                                   list(feats), int(cfg.POOL_SIZE))
            ma = pyramid_roi_align(targets["rois"], batch["image_meta"],
                                   list(feats), int(cfg.MASK_POOL_SIZE))
            out = model.apply(variables, ra, ma,
                              method=MaskRCNN.forward_heads)
            head_batch = {
                "target_class_ids": targets["class_ids"],
                "target_bbox": targets["deltas"],
                "target_mask": targets["masks"],
            }
            active = jnp.ones((batch["image"].shape[0], nc), jnp.float32)
            _, metrics = head_losses(cfg, out, head_batch, active)
            return metrics

        return eval_step

    def train_e2e(self, steps_per_epoch=None, val_steps: int = 2):
        cfg = self.config
        if bool(getattr(cfg, "TRAIN_BN", False)):
            raise ValueError(
                "TRAIN_BN=true is not supported in e2e head training: the "
                "trunk is frozen and the reference explicitly kills BN "
                "updates for frozen layers (core/models.py:4666-4668). Use "
                "TRAIN_BN with RPN_TRAINING / HEAD_TRAINING (MODE training) "
                "/ MRCNN_TRAINING instead."
            )
        train_ds = ToyDataset()
        train_ds.load_dataset(cfg.DATA_DIR, is_train=True,
                              class_names=tuple(cfg.CLASS_NAMES))
        train_ds.prepare()
        train_ds = train_ds.filter_positive()

        gen = RPNGenerator(train_ds, cfg, mode="e2e",
                           seed=int(getattr(cfg, "SEED", 0)))
        # Held-out validation: the reference fits e2e with the TEST split as
        # validation_data (core/models.py:4538-4547, 4614-4615); best.msgpack
        # is gated on val loss via _train_loop.
        val_ds = ToyDataset()
        val_ds.load_dataset(cfg.DATA_DIR, is_train=False,
                            class_names=tuple(cfg.CLASS_NAMES))
        val_ds.prepare()
        val_ds = val_ds.filter_positive()
        if len(val_ds.image_info) >= int(cfg.BATCH_SIZE):
            val_gen = RPNGenerator(val_ds, cfg, mode="e2e", shuffle=False,
                                   augment=False)
            eval_fn = self.make_e2e_eval_step()
        else:  # split can't fill one batch: fall back to train-loss gating
            if len(val_ds.image_info):
                print(f"[HEAD] test split has {len(val_ds.image_info)} images"
                      f" < BATCH_SIZE {cfg.BATCH_SIZE}; gating on train loss")
            val_gen, eval_fn = None, None
        variables = self.init_variables(require_rpn=True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        tx = build_optimizer(cfg, params,
                             freeze_predicate=_is_frozen_for_e2e)
        opt_state = tx.init(params)
        step_fn = self.make_e2e_step(tx)

        key = jax.random.PRNGKey(int(getattr(cfg, "SEED", 0)) + 1)

        def stepper(params, opt_state, batch_stats, batch):
            nonlocal key
            key, sub = jax.random.split(key)
            return step_fn(params, opt_state, batch_stats, batch, sub)

        return self._train_loop(gen, val_gen, params, opt_state, batch_stats,
                                stepper, eval_fn,
                                steps_per_epoch=steps_per_epoch,
                                val_steps=val_steps)

    # ------------------------------------------------------------------
    def _train_loop(self, gen, val_gen, params, opt_state, batch_stats,
                    step_fn, eval_fn, steps_per_epoch=None, val_steps=4):
        cfg = self.config
        save_dir = cfg.WEIGHT_DIR or os.path.join(cfg.OUTPUT_DIR, "weights")
        ckpt = BestAndLatest(save_dir, mode="min",
                             head_prefixes=HEAD_PREFIXES)
        reduce_lr = ReduceLROnPlateau(mode="min")
        early = EarlyStopping(patience=15, mode="min")
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
                params, opt_state, batch_stats, metrics = step_fn(
                    params, opt_state, batch_stats, batch)
                for k, v in jax.device_get(metrics).items():
                    agg.setdefault(k, []).append(float(v))
            profiler.maybe_stop(epoch)
            epoch_metrics = {k: float(np.mean(v)) for k, v in agg.items()}

            if val_gen is not None and eval_fn is not None:
                vit = iter(val_gen.reset() if hasattr(val_gen, "reset")
                           else val_gen)
                vals: dict[str, list] = {}
                for _ in range(min(val_steps, len(val_gen))):
                    vb = shard_batch(self.mesh, next(vit))
                    for k, v in jax.device_get(
                            eval_fn(params, batch_stats, vb)).items():
                        vals.setdefault(f"val_{k}", []).append(float(v))
                epoch_metrics.update(
                    {k: float(np.mean(v)) for k, v in vals.items()})

            gate = epoch_metrics.get("val_loss", epoch_metrics["loss"])
            variables = {"params": params, "batch_stats": batch_stats}
            ckpt.update(epoch, variables, gate,
                        metadata={"kind": "head", "epoch": epoch})
            new_lr = reduce_lr.update(gate, lr)
            if new_lr != lr:
                lr = new_lr
                opt_state = set_learning_rate(opt_state, lr)
            epoch_metrics["lr"] = lr
            self.telemetry.snapshot_and_reset(epoch, save_dir,
                                              extra=epoch_metrics)
            print(f"[HEAD][epoch {epoch}] loss={epoch_metrics['loss']:.4f} "
                  f"gate={gate:.4f} dice={epoch_metrics.get('mask_dice', 0):.3f} "
                  f"lr={lr:.2e} ({time.time() - t0:.1f}s)")
            history.append(epoch_metrics)
            if early.update(gate):
                print("[HEAD] early stopping")
                break
        return {"params": params, "batch_stats": batch_stats}, history
