"""Full Mask R-CNN training and evaluation drivers.

Replaces the reference MaskRCNN orchestrator (core/models.py:4898-7453):

- ``MrcnnTrainer.train``: joint RPN + head training on the full graph with
  LEARNING_LAYERS freeze selection ("rpn" | "head" | "all",
  core/models.py:5808-5873). The reference's 80/20 train/val split slices the
  two sides backwards (core/models.py:5815 gives 20/80); we implement the
  documented 80/20 and note the deviation.
- ``MrcnnTrainer.evaluate``: per-image inference -> confidence/size/NMS
  filter cascade -> mask unmolding -> pixelwise + instance-Dice + detection
  metrics -> TIFF/CSV/overlay artifacts -> global summary with confidence
  histogram and threshold recommendation (core/models.py:6338-7196).
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from m3d.anchors import normalized_pyramid_anchors
from m3d.data.datasets import ToyDataset
from m3d.data.generators import MrcnnGenerator
from m3d.data.rpn_targets import overlaps_3d_numpy
from m3d.models import losses as L
from m3d.models.detection_targets import detection_targets_batch
from m3d.models.mask_rcnn import MaskRCNN, init_params
from m3d.ops.roialign3d import pyramid_roi_align
from m3d.parallel.mesh import make_mesh, shard_batch
from m3d.train.checkpoints import (BestAndLatest, autoconfigure_heads,
                                   load_params, restore_by_name)
from m3d.train.head import head_losses
from m3d.train.optim import (EarlyStopping, ReduceLROnPlateau,
                             apply_constraints, build_optimizer,
                             get_learning_rate, set_learning_rate)
from m3d.train.telemetry import Telemetry
from m3d.utils.metrics import compute_overlaps_masks
from m3d.utils.unmold import postprocess_detections


def _freeze_predicate(learning_layers: str):
    ll = str(learning_layers).lower()
    if ll == "all":
        return None
    if ll == "head":  # train heads only
        return lambda p: not any(s.startswith("mrcnn_") for s in p.split("/"))
    if ll == "rpn":  # train backbone+FPN+RPN only
        return lambda p: any(s.startswith("mrcnn_") for s in p.split("/"))
    raise ValueError(f"LEARNING_LAYERS must be rpn|head|all, got {ll}")


class MrcnnTrainer:
    def __init__(self, config):
        self.config = config
        # Adapt head hyperparameters to whatever widths the checkpoints were
        # trained with (reference H5 introspection, core/models.py:5496-5502).
        autoconfigure_heads(config, [
            getattr(config, "HEAD_WEIGHTS", None),
            getattr(config, "MASK_WEIGHTS", None),
        ])
        # "auto" applies the last evaluation's recommended threshold
        # (reference recommendation machinery, core/models.py:7144-7164).
        from m3d.config import resolve_auto_confidence

        resolve_auto_confidence(config)
        self.telemetry = Telemetry(config)
        self.mesh = make_mesh(config)
        self.anchors = normalized_pyramid_anchors(
            config, voxel_z_over_y=float(getattr(config, "VOXEL_Z_OVER_Y", 1.0))
        )

    def _model(self, mode):
        return MaskRCNN.from_config(self.config, mode=mode)

    def init_variables(self, model, key=None):
        cfg = self.config
        key = key if key is not None else jax.random.PRNGKey(
            int(getattr(cfg, "SEED", 0)))
        variables = init_params(model, key,
                                channels=int(cfg.IMAGE_CHANNEL_COUNT))
        for path in (getattr(cfg, "RPN_WEIGHTS", None),
                     getattr(cfg, "HEAD_WEIGHTS", None),
                     getattr(cfg, "MASK_WEIGHTS", None)):
            if path:
                source, _ = load_params(path)
                variables, stats = restore_by_name(variables, source)
                print(f"[MrcnnTrainer] restored {path}: {stats}")
        return variables

    # ------------------------------------------------------------------
    def make_train_step(self, model, tx):
        cfg = self.config
        anchors = self.anchors
        nc = int(cfg.NUM_CLASSES)
        mask_shape = tuple(int(v) for v in cfg.MASK_SHAPE)
        lw = cfg.LOSS_WEIGHTS

        train_bn = bool(getattr(cfg, "TRAIN_BN", False))
        frozen = _freeze_predicate(cfg.LEARNING_LAYERS)

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_step(params, opt_state, batch_stats, batch, key):
            def loss_fn(p, bs):
                if train_bn:
                    rpn_out, mut = model.apply(
                        {"params": p, "batch_stats": bs},
                        batch["image"], anchors, method=MaskRCNN.forward_rpn,
                        mutable=["batch_stats"],
                    )
                    bs = {**bs, **mut["batch_stats"]}
                else:
                    rpn_out = model.apply(
                        {"params": p, "batch_stats": bs},
                        batch["image"], anchors, method=MaskRCNN.forward_rpn,
                    )
                lrc, mrc = L.rpn_class_loss(batch["rpn_match"],
                                            rpn_out["rpn_class_logits"])
                lrb, mrb = L.rpn_bbox_loss(batch["rpn_bbox"],
                                           batch["rpn_match"],
                                           rpn_out["rpn_bbox"])
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
                feats = rpn_out["feature_maps"][:4]
                ra = pyramid_roi_align(targets["rois"], batch["image_meta"],
                                       list(feats), int(cfg.POOL_SIZE))
                ma = pyramid_roi_align(targets["rois"], batch["image_meta"],
                                       list(feats), int(cfg.MASK_POOL_SIZE))
                if train_bn:
                    out, mut = model.apply(
                        {"params": p, "batch_stats": bs},
                        ra, ma, method=MaskRCNN.forward_heads,
                        mutable=["batch_stats"],
                    )
                    bs = {**bs, **mut["batch_stats"]}
                else:
                    out = model.apply(
                        {"params": p, "batch_stats": bs},
                        ra, ma, method=MaskRCNN.forward_heads,
                    )
                head_batch = {
                    "target_class_ids": targets["class_ids"],
                    "target_bbox": targets["deltas"],
                    "target_mask": targets["masks"],
                }
                active = jnp.ones((proposals.shape[0], nc), jnp.float32)
                head_loss, metrics = head_losses(cfg, out, head_batch, active)
                loss = (
                    float(lw.get("rpn_class_loss", 1.0)) * lrc
                    + float(lw.get("rpn_bbox_loss", 1.0)) * lrb
                    + head_loss
                )
                metrics.update(mrc)
                metrics.update(mrb)
                metrics["loss"] = loss
                return loss, (metrics, bs)

            (loss, (metrics, batch_stats_out)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch_stats)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = apply_constraints(optax.apply_updates(params, updates),
                                       frozen_predicate=frozen)
            return params, opt_state, batch_stats_out, metrics

        return train_step

    def make_eval_step(self, model):
        """Gradient-free full-graph loss on a held-out batch: same RPN + head
        losses as ``make_train_step`` but BN in running-stats mode and a FIXED
        target-sampling key so per-epoch val losses compare identical ROI
        draws (the reference fits with ``validation_data`` and gates best.h5
        on val metrics, core/models.py:5808-5873, 2035-2049).
        """
        cfg = self.config
        model = model.clone(train_bn=False)
        anchors = self.anchors
        nc = int(cfg.NUM_CLASSES)
        mask_shape = tuple(int(v) for v in cfg.MASK_SHAPE)
        lw = cfg.LOSS_WEIGHTS
        val_key = jax.random.PRNGKey(int(getattr(cfg, "SEED", 0)) + 99)

        @jax.jit
        def eval_step(params, batch_stats, batch):
            variables = {"params": params, "batch_stats": batch_stats}
            rpn_out = model.apply(variables, batch["image"], anchors,
                                  method=MaskRCNN.forward_rpn)
            lrc, mrc = L.rpn_class_loss(batch["rpn_match"],
                                        rpn_out["rpn_class_logits"])
            lrb, mrb = L.rpn_bbox_loss(batch["rpn_bbox"], batch["rpn_match"],
                                       rpn_out["rpn_bbox"])
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
            head_loss, metrics = head_losses(cfg, out, head_batch, active)
            loss = (float(lw.get("rpn_class_loss", 1.0)) * lrc
                    + float(lw.get("rpn_bbox_loss", 1.0)) * lrb
                    + head_loss)
            metrics.update(mrc)
            metrics.update(mrb)
            metrics["loss"] = loss
            return metrics

        return eval_step

    def train(self, steps_per_epoch=None, val_steps: int = 4):
        cfg = self.config
        model = self._model("training")
        full = ToyDataset()
        full.load_dataset(cfg.DATA_DIR, is_train=True,
                          class_names=tuple(cfg.CLASS_NAMES))
        full.prepare()
        full = full.filter_positive()

        # 80/20 split (documented intent; the reference's slicing is inverted
        # at core/models.py:5815 — deliberate fix).
        rng = np.random.RandomState(int(getattr(cfg, "SEED", 0)))
        ids = rng.permutation(len(full.image_info))
        split = max(1, int(0.2 * len(ids)))
        train_ds = full.subset(ids[split:])
        val_ds = full.subset(ids[:split])
        print(f"[MrcnnTrainer] split train={len(train_ds.image_info)} "
              f"val={len(val_ds.image_info)}")

        gen = MrcnnGenerator(train_ds, cfg, mode="training",
                             seed=int(getattr(cfg, "SEED", 0)),
                             telemetry=self.telemetry)
        # Validation: augment=False and a reset() per epoch so the exact same
        # batches and RPN-target draws are scored every epoch (reference val
        # generator uses load_image_gt augment=False, core/models.py:5823-5831).
        # If the 20% split can't fill one batch the generator could never
        # yield — fall back to train-loss gating like head.py's empty-split
        # branch.
        has_val = len(val_ds.image_info) >= int(cfg.BATCH_SIZE)
        val_gen = (MrcnnGenerator(val_ds, cfg, mode="training", shuffle=False,
                                  augment=False,
                                  seed=int(getattr(cfg, "SEED", 0)) + 41)
                   if has_val else None)
        if not has_val:
            print(f"[MrcnnTrainer] val split has {len(val_ds.image_info)} "
                  f"images < BATCH_SIZE {cfg.BATCH_SIZE}; gating on train loss")
        eval_fn = self.make_eval_step(model)
        variables = self.init_variables(model)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        tx = build_optimizer(
            cfg, params,
            freeze_predicate=_freeze_predicate(cfg.LEARNING_LAYERS),
        )
        opt_state = tx.init(params)
        step_fn = self.make_train_step(model, tx)

        save_dir = cfg.WEIGHT_DIR or os.path.join(cfg.OUTPUT_DIR, "weights")
        ckpt = BestAndLatest(save_dir, mode="min")
        reduce_lr = ReduceLROnPlateau(mode="min")
        early = EarlyStopping(patience=15, mode="min")
        key = jax.random.PRNGKey(int(getattr(cfg, "SEED", 0)) + 7)

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
                key, sub = jax.random.split(key)
                params, opt_state, batch_stats, metrics = step_fn(
                    params, opt_state, batch_stats, batch, sub)
                for k, v in jax.device_get(metrics).items():
                    agg.setdefault(k, []).append(float(v))
            profiler.maybe_stop(epoch)
            epoch_metrics = {k: float(np.mean(v)) for k, v in agg.items()}

            # Held-out validation pass; best.msgpack / LR plateau / early
            # stopping all gate on val loss (reference core/models.py:2035-2049).
            if val_gen is not None:
                vit = iter(val_gen.reset())
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
                        metadata={"kind": "mrcnn", "epoch": epoch})
            new_lr = reduce_lr.update(gate, lr)
            if new_lr != lr:
                lr = new_lr
                opt_state = set_learning_rate(opt_state, lr)
            epoch_metrics["lr"] = lr
            self.telemetry.snapshot_and_reset(epoch, save_dir,
                                              extra=epoch_metrics)
            print(f"[MRCNN][epoch {epoch}] loss={epoch_metrics['loss']:.4f} "
                  f"gate={gate:.4f} lr={lr:.2e} ({time.time() - t0:.1f}s)")
            history.append(epoch_metrics)
            if early.update(gate):
                break
        return variables, history

    # ------------------------------------------------------------------
    # Evaluation (inference + metrics + artifacts)
    # ------------------------------------------------------------------
    def evaluate(self, variables=None, max_images=None, write_artifacts=True):
        cfg = self.config
        model = self._model("inference")
        if variables is None:
            variables = self.init_variables(model)

        test_ds = ToyDataset()
        test_ds.load_dataset(cfg.DATA_DIR, is_train=False,
                             class_names=tuple(cfg.CLASS_NAMES))
        test_ds.prepare()
        gen = MrcnnGenerator(test_ds, cfg, mode="inference", shuffle=False)

        # variables as a jit argument (remote-compile constant-size limit).
        # anchors are an argument too: variable image sizes mean per-bucket
        # anchor sets — jit recompiles once per bucket shape and caches
        # (the per-bucket compiled graphs of reference _anchor_cache,
        # core/models.py:3478-3481).
        variables_dev = jax.device_put(variables)

        # Valid-count-adaptive per-ROI stages: chunks of the padded proposal /
        # detection axes are skipped when they hold only padding — measured
        # free even on dense scenes, ~14 ms per skipped mask chunk at the
        # 128³ bench shape (m3d/models/inference.py).
        from m3d.models.inference import adaptive_inference, chunks_from_config

        cls_chunk, mask_chunk = chunks_from_config(cfg, model)

        @jax.jit
        def infer_v(v, image, image_meta, anchors):
            return adaptive_inference(
                model, v, image, image_meta, anchors,
                classifier_chunk=cls_chunk, mask_chunk=mask_chunk)

        def infer(image, image_meta, anchors):
            return infer_v(variables_dev, image, image_meta, anchors)

        out_dir = cfg.OUTPUT_DIR
        os.makedirs(out_dir, exist_ok=True)
        overlay_dir = os.path.join(out_dir, "overlays")
        if write_artifacts:
            os.makedirs(overlay_dir, exist_ok=True)

        n = len(test_ds.image_info)
        if max_images:
            n = min(n, max_images)

        per_image = []
        all_scores = []
        for image_id in range(n):
            try:
                inputs = gen.get_input_prediction(image_id)
                out = jax.device_get(
                    infer(inputs["image"], inputs["image_meta"],
                          inputs["anchors"]))
                res = self._evaluate_one(test_ds, image_id, out, out_dir,
                                         overlay_dir, write_artifacts,
                                         image_meta=inputs["image_meta"][0])
                per_image.append(res)
                all_scores.extend(res["scores"])
            except Exception as e:  # noqa: BLE001 — per-image skip (parity)
                import traceback

                print(f"[evaluate][{image_id}] failed: {e}")
                traceback.print_exc()

        summary = self._summarize(per_image, all_scores, out_dir)
        return summary, per_image

    def _evaluate_one(self, dataset, image_id, out, out_dir, overlay_dir,
                      write_artifacts, image_meta=None):
        cfg = self.config
        if image_meta is not None:
            meta = np.asarray(image_meta)
            # Canonical layout (m3d/image_meta.py): original_shape at 1:5,
            # padded shape at 5:9. Unmold at the padded (bucket) shape,
            # then crop back to the original window.
            H, W, D = (int(v) for v in meta[1:4])
            PH, PW, PD = (int(v) for v in meta[5:8])
        else:
            H, W, D = (int(v) for v in cfg.IMAGE_SHAPE[:3])
            PH, PW, PD = H, W, D

        # Unmold at the bucket shape, crop to the true window, then the
        # reference's confidence -> volume -> host-NMS cascade
        # (core/models.py:6911-6991) — shared with serving
        # (m3d/utils/unmold.py postprocess_detections).
        boxes_px, class_ids, scores, masks = postprocess_detections(
            out["detections"][0], out["mrcnn_masks"][0], (PH, PW, PD),
            original_shape=(H, W, D),
            min_confidence=float(cfg.DETECTION_MIN_CONFIDENCE),
            min_roi_size=float(cfg.MIN_ROI_SIZE),
            nms_threshold=float(cfg.DETECTION_NMS_THRESHOLD),
            max_instances=int(cfg.DETECTION_MAX_INSTANCES),
        )

        # GT
        gt_boxes, gt_class_ids, gt_masks = dataset.load_data(image_id)

        # Metrics: pixelwise, instance dice, detection counts
        # (core/models.py:6644-6721).
        pred_union = masks.any(axis=-1) if masks.shape[-1] else np.zeros(
            (H, W, D), bool)
        gt_union = (gt_masks > 0.5).any(axis=-1) if gt_masks is not None and \
            gt_masks.shape[-1] else np.zeros((H, W, D), bool)
        tp = float(np.logical_and(pred_union, gt_union).sum())
        fp = float(np.logical_and(pred_union, ~gt_union).sum())
        fn = float(np.logical_and(~pred_union, gt_union).sum())
        precision = tp / max(tp + fp, 1.0)
        recall = tp / max(tp + fn, 1.0)
        f1 = 2 * precision * recall / max(precision + recall, 1e-7)
        pixel_iou = tp / max(tp + fp + fn, 1.0)

        # Instance dice via greedy IoU matching
        inst_dice = []
        det_tp = det_fp = 0
        if masks.shape[-1] and gt_masks is not None and gt_masks.shape[-1]:
            ov = compute_overlaps_masks(masks, gt_masks)
            matched_gt = set()
            for i in np.argsort(-scores):
                j = int(np.argmax(ov[i]))
                if ov[i, j] >= float(cfg.EVAL_DET_IOU) and j not in matched_gt:
                    matched_gt.add(j)
                    det_tp += 1
                    inter = float(np.logical_and(
                        masks[..., i], gt_masks[..., j] > 0.5).sum())
                    s = float(masks[..., i].sum()) + float(
                        (gt_masks[..., j] > 0.5).sum())
                    inst_dice.append(2 * inter / max(s, 1.0))
                else:
                    det_fp += 1
        det_fn = (gt_masks.shape[-1] if gt_masks is not None else 0) - det_tp

        name = str(image_id).zfill(6)
        if write_artifacts:
            # Label volume TIFF + boxes CSV + overlay PNG
            # (core/models.py:6313-6336, 7071-7087).
            from m3d.utils.tiffio import imwrite_volume

            from m3d.utils.unmold import instances_to_label_volume

            label_vol = instances_to_label_volume(masks, scores)
            imwrite_volume(os.path.join(out_dir, f"{name}.tiff"),
                           np.transpose(label_vol, (2, 0, 1)))
            import csv

            with open(os.path.join(out_dir, f"{name}.csv"), "w",
                      newline="") as f:
                wr = csv.writer(f)
                wr.writerow(["class", "score",
                             "y1", "x1", "z1", "y2", "x2", "z2"])
                for c, s, b in zip(class_ids, scores, boxes_px):
                    wr.writerow([int(c), float(s), *map(int, b)])
            self._write_overlay(dataset, image_id, masks, gt_masks,
                                os.path.join(overlay_dir,
                                             f"{name}_masks_overlay.png"))

        return {
            "image_id": image_id,
            "n_detections": int(masks.shape[-1]),
            "n_gt": int(gt_masks.shape[-1]) if gt_masks is not None else 0,
            "pixel_precision": precision,
            "pixel_recall": recall,
            "pixel_f1": f1,
            "pixel_iou": pixel_iou,
            "instance_dice": float(np.mean(inst_dice)) if inst_dice else 0.0,
            "det_tp": det_tp, "det_fp": det_fp, "det_fn": det_fn,
            "scores": [float(s) for s in scores],
        }

    @staticmethod
    def _write_overlay(dataset, image_id, masks, gt_masks, path):
        """Mid-slice GT/prediction overlay PNG (core/models.py:6351-6642)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return
        image = dataset.load_image(image_id)[..., 0]
        z = image.shape[2] // 2
        fig, axes = plt.subplots(1, 3, figsize=(12, 4))
        axes[0].imshow(image[:, :, z], cmap="gray")
        axes[0].set_title("image")
        axes[1].imshow(
            (gt_masks[..., :].any(-1)[:, :, z]
             if gt_masks is not None and gt_masks.shape[-1] else
             np.zeros(image.shape[:2])), cmap="viridis")
        axes[1].set_title("GT")
        axes[2].imshow(
            (masks.any(-1)[:, :, z] if masks.shape[-1] else
             np.zeros(image.shape[:2])), cmap="viridis")
        axes[2].set_title("prediction")
        for ax in axes:
            ax.axis("off")
        fig.savefig(path, dpi=80, bbox_inches="tight")
        plt.close(fig)

    def _summarize(self, per_image, all_scores, out_dir):
        """Global summary + confidence histogram + threshold recommendation
        (core/models.py:7144-7196)."""
        if not per_image:
            return {}
        keys = ("pixel_precision", "pixel_recall", "pixel_f1", "pixel_iou",
                "instance_dice")
        summary = {k: float(np.mean([r[k] for r in per_image])) for k in keys}
        summary["det_tp"] = int(sum(r["det_tp"] for r in per_image))
        summary["det_fp"] = int(sum(r["det_fp"] for r in per_image))
        summary["det_fn"] = int(sum(r["det_fn"] for r in per_image))
        tp, fp, fn = summary["det_tp"], summary["det_fp"], summary["det_fn"]
        summary["det_precision"] = tp / max(tp + fp, 1)
        summary["det_recall"] = tp / max(tp + fn, 1)

        if all_scores:
            hist, edges = np.histogram(all_scores, bins=10, range=(0, 1))
            summary["confidence_hist"] = {
                f"{edges[i]:.1f}-{edges[i+1]:.1f}": int(hist[i])
                for i in range(10)
            }
            # Recommend the largest threshold keeping >= 80% of detections.
            scores = np.sort(all_scores)
            idx = max(0, int(0.2 * len(scores)) - 1)
            summary["recommended_confidence"] = float(scores[idx])

        with open(os.path.join(out_dir, "evaluation_summary.json"), "w") as f:
            json.dump(summary, f, indent=2)
        print("[evaluate] summary:", json.dumps(
            {k: v for k, v in summary.items() if not isinstance(v, dict)},
            indent=None))
        return summary
