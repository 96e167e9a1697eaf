"""Assembled 3D Mask R-CNN (flax module + pure forward functions).

The reference builds three Keras graphs (RPN, HEAD, MaskRCNN classes —
core/models.py:3097-7453) out of shared pieces. Here ONE flax module owns all
parameters (name-keyed compatibly across uses, enabling the reference's
"partial load by name across model variants" workflow via orbax subtree
restore), and thin pure functions compose its methods into the different
task forwards:

  - ``forward_rpn``        -> RPN training outputs (logits/deltas/proposals)
  - ``forward_targeting``  -> proposals + sampled targets + aligned features
  - ``forward_heads``      -> classifier/mask outputs on given ROIs
  - ``__call__``           -> full inference (detections + masks)

Anchors are an input (like the reference MaskRCNN build, core/models.py:5510)
so variable image sizes re-use one compiled graph per shape bucket.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from m3d.models.backbone import ResNet3D
from m3d.models.detection import refine_detections_batch
from m3d.models.fpn import FPN3D
from m3d.models.heads import ClassifierHead, MaskHead
from m3d.models.proposal import generate_proposals
from m3d.models.rpn_head import RPNHead
from m3d.ops.roialign3d import (pyramid_roi_align, pyramid_roi_align_auto,
                                pyramid_roi_align_compact,
                                pyramid_roi_align_flat)

Dtype = Any


def init_params(model: "MaskRCNN", key, num_classes: int | None = None,
                channels: int = 1):
    """Initialize parameters cheaply on a minimal volume.

    Parameter shapes are independent of the spatial extent (convs + BN), so we
    trace the smallest stride-compatible volume (64x64x8) instead of executing
    the full-size graph — init at 128^3 costs minutes on a remote-compile TPU.
    """
    import numpy as np

    image = np.zeros((1, 64, 64, 8, channels), np.float32)
    small = model.clone(
        pre_nms_limit=64,
        post_nms_rois=min(model.post_nms_rois, 64),
        detection_max_instances=min(model.detection_max_instances, 8),
        image_depth=8,
    )
    # init_forward touches every parameterized submodule but skips the
    # proposal/NMS/detection graph — init compiles in seconds, not minutes.
    return small.init(key, image, method=MaskRCNN.init_forward)


class MaskRCNN(nn.Module):
    # Architecture
    backbone: str = "resnet50"
    top_down_pyramid_size: int = 256
    num_classes: int = 2
    pool_size: int = 7
    mask_pool_size: int = 14
    fc_layers_size: int = 1024
    head_conv_channel: int = 256
    num_ratios: int = 5
    anchor_stride: int = 1
    backbone_strides: tuple = ((4, 4, 1), (8, 8, 1), (16, 16, 1),
                               (32, 32, 1), (64, 64, 1))
    p6_stride: tuple = (2, 2, 1)
    image_depth: int = 12
    # Proposal / detection hyperparameters (static per-build)
    rpn_bbox_std_dev: tuple = (0.1, 0.1, 0.1, 0.2, 0.2, 0.2)
    bbox_std_dev: tuple = (0.1, 0.1, 0.1, 0.2, 0.2, 0.2)
    rpn_nms_threshold: float = 0.9
    pre_nms_limit: int = 10000
    post_nms_rois: int = 1500
    detection_min_confidence: float = 0.2
    detection_nms_threshold: float = 0.45
    detection_max_instances: int = 50
    detection_nms_xy_only: bool = False
    # Cap on score-sorted proposals entering the classifier stage
    # (reference HEAD_MAX_ROIS / limit_rois, core/models.py:1254-1270 —
    # proposals are already descending-score, so "first N" == "top N").
    # 0/None disables the cap.
    head_max_rois: int = 0
    train_bn: bool = False
    dtype: Dtype = jnp.bfloat16

    @classmethod
    def from_config(cls, config, mode: str = "inference", **overrides):
        """Build from a reference-schema Config (m3d.config.Config)."""
        scales = list(config.RPN_ANCHOR_SCALES)
        strides = config.BACKBONE_STRIDES
        n_levels = len(strides)
        assert len(scales) <= n_levels, (
            "the RPN head is shared across levels with anchors_per_location ="
            " len(RPN_ANCHOR_RATIOS); more scales than FPN levels would"
            " misalign the flattened RPN outputs with the anchor pyramid"
            " (latent in the reference too: core/models.py:3244-3263)"
        )
        p6_stride = tuple(
            max(1, strides[4][i] // strides[3][i]) for i in range(3)
        )
        post_nms = (
            config.POST_NMS_ROIS_TRAINING
            if mode in ("training", "targeting")
            else config.POST_NMS_ROIS_INFERENCE
        )
        kw = dict(
            backbone=config.BACKBONE,
            top_down_pyramid_size=int(config.TOP_DOWN_PYRAMID_SIZE),
            num_classes=int(config.NUM_CLASSES),
            pool_size=int(config.POOL_SIZE),
            mask_pool_size=int(config.MASK_POOL_SIZE),
            fc_layers_size=int(config.FPN_CLASSIF_FC_LAYERS_SIZE),
            head_conv_channel=int(config.HEAD_CONV_CHANNEL),
            num_ratios=len(config.RPN_ANCHOR_RATIOS),
            anchor_stride=int(config.RPN_ANCHOR_STRIDE),
            backbone_strides=tuple(
                tuple(int(v) for v in s) for s in strides
            ),
            p6_stride=p6_stride,
            image_depth=int(config.IMAGE_DEPTH),
            rpn_bbox_std_dev=tuple(float(v) for v in config.RPN_BBOX_STD_DEV),
            bbox_std_dev=tuple(float(v) for v in config.BBOX_STD_DEV),
            rpn_nms_threshold=float(config.RPN_NMS_THRESHOLD),
            pre_nms_limit=int(config.PRE_NMS_LIMIT),
            post_nms_rois=int(post_nms),
            detection_min_confidence=float(config.DETECTION_MIN_CONFIDENCE),
            detection_nms_threshold=float(config.DETECTION_NMS_THRESHOLD),
            detection_max_instances=int(config.DETECTION_MAX_INSTANCES),
            detection_nms_xy_only=bool(
                getattr(config, "DETECTION_NMS_XY_ONLY", False)
            ),
            head_max_rois=int(getattr(config, "HEAD_MAX_ROIS", 0) or 0),
            # Inference always uses BN running stats (Keras learning-phase-0
            # semantics at predict time, regardless of TRAIN_BN).
            train_bn=bool(config.TRAIN_BN) and mode != "inference",
            dtype=jnp.bfloat16
            if str(getattr(config, "COMPUTE_DTYPE", "bfloat16")) == "bfloat16"
            else jnp.float32,
        )
        kw.update(overrides)
        return cls(**kw)

    def setup(self):
        s = self.backbone_strides
        up = tuple(
            tuple(s[i + 1][a] // s[i][a] for a in range(3))
            for i in (2, 1, 0)  # P5->P4, P4->P3, P3->P2
        )
        self.resnet = ResNet3D(self.backbone, self.train_bn, self.dtype,
                               level_strides=s)
        self.fpn = FPN3D(self.top_down_pyramid_size, self.p6_stride,
                         self.dtype, upsample_factors=up)
        self.rpn = RPNHead(self.num_ratios, self.anchor_stride, self.dtype)
        self.classifier = ClassifierHead(
            self.pool_size, self.num_classes, self.fc_layers_size,
            self.train_bn, self.dtype,
        )
        self.mask_head = MaskHead(
            self.num_classes, self.head_conv_channel, self.train_bn, self.dtype
        )

    # ------------------------------------------------------------------
    # Composable stages
    # ------------------------------------------------------------------
    def extract_features(self, image):
        """image [B,H,W,D,C] -> (P2, P3, P4, P5, P6)."""
        _, c2, c3, c4, c5 = self.resnet(image)
        return self.fpn(c2, c3, c4, c5)

    def rpn_forward(self, feature_maps):
        """Apply the shared RPN head to P2..P6; concat along anchors."""
        outs = [self.rpn(p) for p in feature_maps]
        logits = jnp.concatenate([o[0] for o in outs], axis=1)
        probs = jnp.concatenate([o[1] for o in outs], axis=1)
        deltas = jnp.concatenate([o[2] for o in outs], axis=1)
        return logits, probs, deltas

    def propose(self, rpn_probs, rpn_deltas, anchors):
        return generate_proposals(
            rpn_probs, rpn_deltas, anchors,
            jnp.asarray(self.rpn_bbox_std_dev, jnp.float32),
            proposal_count=self.post_nms_rois,
            nms_threshold=self.rpn_nms_threshold,
            pre_nms_limit=self.pre_nms_limit,
            image_depth=self.image_depth,
        )

    def classify_rois(self, rois, image_meta, mrcnn_feature_maps):
        # Inference-only method. On TPU the classifier's pool-cube FC is
        # fused INTO the ROIAlign (kron slab-DMA kernel, r5: 26.8 ms vs
        # 36.5 ms for gather + materialize + matmul at the 128^3 B=4
        # workload); elsewhere the auto dispatch picks gather/Pallas
        # ROIAlign and the head applies conv1 itself. Training paths call
        # pyramid_roi_align (XLA, with gradients) directly — see
        # m3d/train/{head,mrcnn}.py.
        from m3d.ops.roialign3d import (fused_classifier_ok,
                                        pyramid_roi_align_fc)

        if fused_classifier_ok(self.pool_size, list(mrcnn_feature_maps)):
            cp = self.classifier.variables["params"]["mrcnn_class_conv1"]
            fc = pyramid_roi_align_fc(
                rois, image_meta, list(mrcnn_feature_maps), self.pool_size,
                cp["kernel"], kernel="kron", r_batch=16)
            fc = fc + cp["bias"]
            return self.classifier(fc, from_fc=True)
        aligned = pyramid_roi_align_auto(
            rois, image_meta, list(mrcnn_feature_maps), self.pool_size
        )
        return self.classifier(aligned)

    def classify_rois_flat(self, boxes_flat, batch_idx, image_meta,
                           mrcnn_feature_maps):
        """Classifier stage over a FLAT ROI list ([N, 6] boxes + [N] source
        image indices): gather-path ROIAlign (cost ∝ rows computed) + FC
        head. The adaptive inference path chunks this call on the
        valid-first compacted flat proposal axis so classifier cost tracks
        the TOTAL live proposal count across the batch
        (m3d/models/inference.py compacted_classifier_stage).
        Returns ([N, num_classes] logits, probs, [N, num_classes, 6]).

        Stays on the XLA gather: at the adaptive path's chunk size
        (~125 ROIs under lax.cond) the pooled tensor fuses instead of
        materializing, and routing chunks through the kron fused kernel
        was measured SLOWER end-to-end (bench.py adaptive 31.8 vs 32.7
        vol/s, r5) — 16 per-chunk pallas launches pay DMA pipeline
        spin-up that one monolithic launch amortizes. The kron kernel
        wins only at full width (classify_rois)."""
        aligned = pyramid_roi_align_flat(
            boxes_flat, batch_idx, image_meta, list(mrcnn_feature_maps),
            self.pool_size
        )
        logits, probs, deltas = self.classifier(aligned[None])
        return logits[0], probs[0], deltas[0]

    def mask_align_compact(self, boxes_flat, batch_idx, total, image_meta,
                           mrcnn_feature_maps):
        """Mask-stage ROIAlign over a compacted flat ROI list ([N, 6] boxes
        + [N] source-image indices, live rows first, gated on ``total``) —
        the adaptive inference path (m3d/models/inference.py) sorts the
        detection slots valid-first across the batch so both ROIAlign and
        the (much more expensive) mask-head convolutions only compute rows
        that exist. Returns [N, m, m, m, C]."""
        return pyramid_roi_align_compact(
            boxes_flat, batch_idx, total, image_meta,
            list(mrcnn_feature_maps), self.mask_pool_size
        )

    def apply_mask_head(self, aligned):
        """Mask-head convolutions on pre-aligned features [B, T, m, m, m, C]
        (split from mask_rois so the adaptive path can chunk-gate them)."""
        return self.mask_head(aligned)

    def mask_rois(self, rois, image_meta, mrcnn_feature_maps):
        aligned = pyramid_roi_align_auto(
            rois, image_meta, list(mrcnn_feature_maps), self.mask_pool_size
        )
        return self.mask_head(aligned)

    # ------------------------------------------------------------------
    # Task forwards
    # ------------------------------------------------------------------
    def forward_rpn_train(self, image):
        """RPN forward without proposal generation — the training step needs
        only logits/deltas (the reference graph computes ProposalLayer every
        step anyway; skipping it saves the NMS per step)."""
        feats = self.extract_features(image)
        logits, probs, deltas = self.rpn_forward(feats)
        return {"rpn_class_logits": logits, "rpn_probs": probs,
                "rpn_bbox": deltas}

    def forward_rpn(self, image, anchors):
        """RPN training/eval forward (reference RPN.build training branch,
        core/models.py:3162-3330). Returns dict of RPN outputs + proposals."""
        feats = self.extract_features(image)
        logits, probs, deltas = self.rpn_forward(feats)
        proposals, valid = self.propose(probs, deltas, anchors)
        return {
            "rpn_class_logits": logits,
            "rpn_probs": probs,
            "rpn_bbox": deltas,
            "proposals": proposals,
            "proposals_valid": valid,
            "feature_maps": feats,
        }

    def forward_heads(self, rois_aligned, mask_aligned):
        """Head-only forward on pre-aligned features (reference HEAD
        _build_head_only_model, core/models.py:4044-4115)."""
        logits, probs, bbox = self.classifier(rois_aligned)
        masks = self.mask_head(mask_aligned)
        return {
            "mrcnn_class_logits": logits,
            "mrcnn_probs": probs,
            "mrcnn_bbox": bbox,
            "mrcnn_masks": masks,
        }

    def init_forward(self, image):
        """Cheap parameter-initialization pass: touches every submodule
        (backbone, FPN, RPN head, classifier, mask head) without tracing the
        proposal/NMS/detection machinery. Parameter shapes are identical to
        the full forward — used by ``init_params`` so initialization costs a
        small conv compile instead of the full inference graph (which on a
        1-core CPU host or through the remote-compile tunnel costs minutes).
        """
        feats = self.extract_features(image)
        logits, probs, deltas = self.rpn_forward(feats)
        b = image.shape[0]
        c = feats[0].shape[-1]
        p, m = self.pool_size, self.mask_pool_size
        ra = jnp.zeros((b, 1, p, p, p, c), self.dtype)
        ma = jnp.zeros((b, 1, m, m, m, c), self.dtype)
        cls_out = self.classifier(ra)
        mask_out = self.mask_head(ma)
        return logits, cls_out, mask_out

    def __call__(self, image, image_meta, anchors):
        """Full inference (reference MaskRCNN.build inference branch,
        core/models.py:5695-5740)."""
        feats = self.extract_features(image)
        logits, probs, deltas = self.rpn_forward(feats)
        proposals, prop_valid = self.propose(probs, deltas, anchors)
        # HEAD_MAX_ROIS: bound classifier cost by keeping only the top-scored
        # proposals (reference limit_rois, core/models.py:1254-1270).
        cap = int(self.head_max_rois or 0)
        if cap and cap < proposals.shape[1]:
            proposals = proposals[:, :cap]
            prop_valid = prop_valid[:, :cap]

        mrcnn_feats = feats[:4]  # P2..P5
        cls_logits, cls_probs, cls_bbox = self.classify_rois(
            proposals, image_meta, mrcnn_feats
        )
        detections, det_valid = refine_detections_batch(
            proposals, cls_probs, cls_bbox, image_meta,
            jnp.asarray(self.bbox_std_dev, jnp.float32),
            self.detection_min_confidence,
            self.detection_nms_threshold,
            self.detection_max_instances,
            nms_xy_only=self.detection_nms_xy_only,
        )
        masks = self.mask_rois(detections[..., :6], image_meta, mrcnn_feats)
        return {
            "detections": detections,
            "detections_valid": det_valid,
            "mrcnn_masks": masks,
            "mrcnn_probs": cls_probs,
            "mrcnn_bbox": cls_bbox,
            "proposals": proposals,
            "proposals_valid": prop_valid,
        }
