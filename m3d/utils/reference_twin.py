"""Pure-numpy twin of the reference inference graph — the golden-parity
instrument.

The reference implementation (TF1-graph Keras 2.3.1 + cp36 binary custom ops)
cannot execute in this container, so BASELINE.md's ">= 0.99 mask IoU vs
reference" bar is discharged by construction: this module re-derives the
reference's inference graph in plain numpy, line-for-line against the
reference sources —

  - ResNet 3D backbone:         core/models.py:157-273 (stem + bottlenecks)
  - FPN:                        core/models.py:3190-3214
  - RPN head convs:             core/models.py:512-584
  - ProposalLayer:              core/models.py:369-504
  - PyramidROIAlign:            core/models.py:597-688
  - CropAndResize3D (trilinear): core/custom_op/custom_op.py:28-65
    (TF crop_and_resize sampling semantics generalized to 3-D)
  - fpn_classifier_graph:       core/models.py:1121-1189
  - refine_detections_graph:    core/models.py:1415-1529
  - build_fpn_mask_graph:       core/models.py:1191-1238
  - greedy NMS:                 core/utils.py:505-578

and ``tests/test_golden_parity.py`` asserts m3d's full jitted inference
matches this twin numerically (detections to ~1e-4, mask IoU >= 0.99) on a
fixed-weight fixture. The twin shares NO code with m3d's jax implementation —
every op here is an independent numpy derivation (loops over kernel offsets,
explicit trilinear interpolation, sequential greedy NMS), so agreement is
evidence of semantic parity rather than shared bugs.

Weight layout: flax param trees (Conv kernel [kh,kw,kd,Cin,Cout], Dense
[Cin,Cout], BatchNorm scale/bias + batch_stats mean/var). Weight-layout
translation to/from the reference's Keras H5 files is tested separately
(tests/test_h5_interop.py).
"""

from __future__ import annotations

import numpy as np

BN_EPS = 1e-5  # flax nn.BatchNorm default; Keras BatchNorm uses 1e-3 but the
# reference's BatchNorm subclass inherits keras defaults — the fixture test
# drives both sides with the SAME stats, so eps only needs to match m3d.
LOG_SCALE_LIMIT = float(np.log(1000.0 / 16.0))


# ---------------------------------------------------------------------------
# numpy NN primitives
# ---------------------------------------------------------------------------
def conv3d_np(x, kernel, bias=None, padding="SAME", dilation=1,
              strides=(1, 1, 1)):
    """Direct 3-D convolution. x: [N,H,W,D,Ci], kernel [kh,kw,kd,Ci,Co].
    Loops over the kernel offsets; each offset is one vectorized
    multiply-add (fine at fixture sizes). ``padding`` is "SAME", "VALID",
    or an explicit [(lo,hi)]*3 list (the reference stem pads 3 voxels
    explicitly before its 7^3 stride-(2,2,1) conv, core/models.py:241-244).
    Strided output = stride-1 VALID output subsampled (identical sampling
    positions)."""
    kh, kw, kd, ci, co = kernel.shape
    n, h, w, d, _ = x.shape
    dil = int(dilation)
    sy, sx, sz = (int(s) for s in strides)
    if padding == "SAME" and (sy, sx, sz) == (1, 1, 1):
        pads = [(dil * (kh - 1) // 2,) * 2, (dil * (kw - 1) // 2,) * 2,
                (dil * (kd - 1) // 2,) * 2]
    elif padding == "SAME":
        # TF/XLA SAME-with-stride: total pad so out = ceil(in/stride).
        def same_pad(size, k, s):
            out = -(-size // s)
            total = max((out - 1) * s + dil * (k - 1) + 1 - size, 0)
            return (total // 2, total - total // 2)

        pads = [same_pad(h, kh, sy), same_pad(w, kw, sx), same_pad(d, kd, sz)]
    elif padding == "VALID":
        pads = [(0, 0)] * 3
    else:  # explicit [(lo,hi)]*3
        pads = [tuple(p) for p in padding]
    xp = np.pad(x, ((0, 0), *pads, (0, 0)))
    oh = (xp.shape[1] - dil * (kh - 1) - 1) // sy + 1
    ow = (xp.shape[2] - dil * (kw - 1) - 1) // sx + 1
    od = (xp.shape[3] - dil * (kd - 1) - 1) // sz + 1
    out = np.zeros((n, oh, ow, od, co), np.float32)
    for i in range(kh):
        for j in range(kw):
            for k in range(kd):
                sl = xp[:, i * dil:i * dil + (oh - 1) * sy + 1:sy,
                        j * dil:j * dil + (ow - 1) * sx + 1:sx,
                        k * dil:k * dil + (od - 1) * sz + 1:sz, :]
                out += sl @ kernel[i, j, k]
    if bias is not None:
        out += bias
    return out


def maxpool3d_np(x, window=(3, 3, 3), strides=(2, 2, 1), padding="SAME"):
    """Max pooling with TF SAME padding (reference stem MaxPooling3D 3^3
    stride (2,2,1), core/models.py:246)."""
    n, h, w, d, c = x.shape
    ky, kx, kz = window
    sy, sx, sz = strides
    if padding == "SAME":
        def same_pad(size, k, s):
            out = -(-size // s)
            total = max((out - 1) * s + k - size, 0)
            return (total // 2, total - total // 2)

        pads = [same_pad(h, ky, sy), same_pad(w, kx, sx), same_pad(d, kz, sz)]
    else:
        pads = [(0, 0)] * 3
    xp = np.pad(x, ((0, 0), *pads, (0, 0)),
                constant_values=-np.inf)
    oh = (xp.shape[1] - ky) // sy + 1
    ow = (xp.shape[2] - kx) // sx + 1
    od = (xp.shape[3] - kz) // sz + 1
    out = np.full((n, oh, ow, od, c), -np.inf, np.float32)
    for i in range(ky):
        for j in range(kx):
            for k in range(kz):
                sl = xp[:, i:i + (oh - 1) * sy + 1:sy,
                        j:j + (ow - 1) * sx + 1:sx,
                        k:k + (od - 1) * sz + 1:sz, :]
                out = np.maximum(out, sl)
    return out


def conv3d_transpose_np(x, kernel, bias=None):
    """2x2x2 stride-2 transpose conv (the mask head's deconv,
    core/models.py:1229-1233). Kernel [2,2,2,Cin,Cout]; with stride == kernel
    size there is no overlap: each input voxel expands into a 2^3 block.

    Kernel layout note: ``lax.conv_transpose`` (flax nn.ConvTranspose,
    transpose_kernel=False) indexes the kernel spatially FLIPPED relative to
    the plain scatter formulation — out[2i+di] += x[i] * K[1-di, 1-dj, 1-dk]
    (verified numerically against flax). The Keras Conv3DTranspose -> flax
    weight mapping is handled by m3d/utils/h5_import.py and tested in
    tests/test_h5_interop.py; here we mirror the flax-parameterized math."""
    kh, kw, kd, ci, co = kernel.shape
    assert (kh, kw, kd) == (2, 2, 2)
    n, h, w, d, _ = x.shape
    out = np.zeros((n, 2 * h, 2 * w, 2 * d, co), np.float32)
    for i in range(2):
        for j in range(2):
            for k in range(2):
                out[:, i::2, j::2, k::2, :] = x @ kernel[1 - i, 1 - j, 1 - k]
    if bias is not None:
        out += bias
    return out


def bn_np(x, p, s):
    """Inference BatchNorm with running stats (BatchNorm(training=False),
    core/models.py frozen-BN discipline)."""
    return (x - s["mean"]) / np.sqrt(s["var"] + BN_EPS) * p["scale"] + p["bias"]


def softmax_np(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def sigmoid_np(x):
    return 1.0 / (1.0 + np.exp(-x))


def relu_np(x):
    return np.maximum(x, 0.0)


# ---------------------------------------------------------------------------
# Box math (core/utils.py:201-226, 412-464)
# ---------------------------------------------------------------------------
def apply_deltas_np(boxes, deltas, clip_log_scale=True):
    h = boxes[:, 3] - boxes[:, 0]
    w = boxes[:, 4] - boxes[:, 1]
    d = boxes[:, 5] - boxes[:, 2]
    cy = boxes[:, 0] + 0.5 * h
    cx = boxes[:, 1] + 0.5 * w
    cz = boxes[:, 2] + 0.5 * d
    dh, dw, dd = deltas[:, 3], deltas[:, 4], deltas[:, 5]
    if clip_log_scale:
        dh = np.clip(dh, -LOG_SCALE_LIMIT, LOG_SCALE_LIMIT)
        dw = np.clip(dw, -LOG_SCALE_LIMIT, LOG_SCALE_LIMIT)
        dd = np.clip(dd, -LOG_SCALE_LIMIT, LOG_SCALE_LIMIT)
    cy = cy + deltas[:, 0] * h
    cx = cx + deltas[:, 1] * w
    cz = cz + deltas[:, 2] * d
    h = h * np.exp(dh)
    w = w * np.exp(dw)
    d = d * np.exp(dd)
    y1, x1, z1 = cy - 0.5 * h, cx - 0.5 * w, cz - 0.5 * d
    return np.stack([y1, x1, z1, y1 + h, x1 + w, z1 + d], axis=1)


def nms_greedy_np(boxes, scores, iou_threshold, max_output):
    """Sequential greedy NMS (core/utils.py:505-578): keep descending-score
    boxes whose IoU with every kept box is <= threshold."""
    vols = ((boxes[:, 3] - boxes[:, 0]) * (boxes[:, 4] - boxes[:, 1])
            * (boxes[:, 5] - boxes[:, 2]))
    order = np.argsort(-scores, kind="stable")
    keep = []
    while order.size and len(keep) < max_output:
        i = order[0]
        keep.append(int(i))
        rest = order[1:]
        yy1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        xx1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        zz1 = np.maximum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        xx2 = np.minimum(boxes[i, 4], boxes[rest, 4])
        zz2 = np.minimum(boxes[i, 5], boxes[rest, 5])
        inter = (np.maximum(yy2 - yy1, 0) * np.maximum(xx2 - xx1, 0)
                 * np.maximum(zz2 - zz1, 0))
        iou = inter / np.maximum(vols[i] + vols[rest] - inter, 1e-10)
        order = rest[iou <= iou_threshold]
    return np.asarray(keep, np.int32)


# ---------------------------------------------------------------------------
# CropAndResize3D (custom_op semantics = TF crop_and_resize generalized)
# ---------------------------------------------------------------------------
def crop_and_resize_3d_np(feature, boxes, crop_size):
    """feature: [H,W,D,C] (single image); boxes [N,6] normalized. Trilinear,
    zero extrapolation. Sampling grid: pos_i = b1*(S-1) + i*(b2-b1)*(S-1)/(p-1)
    for p > 1, center sample for p == 1."""
    H, W, D, C = feature.shape
    py, px, pz = crop_size
    n = boxes.shape[0]
    out = np.zeros((n, py, px, pz, C), np.float32)

    def axis_pos(lo, hi, size, p):
        if p > 1:
            i = np.arange(p, dtype=np.float32)
            return lo * (size - 1) + i * (hi - lo) * (size - 1) / (p - 1)
        return np.array([0.5 * (lo + hi) * (size - 1)], np.float32)

    for b in range(n):
        y1, x1, z1, y2, x2, z2 = boxes[b]
        ys = axis_pos(y1, y2, H, py)
        xs = axis_pos(x1, x2, W, px)
        zs = axis_pos(z1, z2, D, pz)
        # per-axis corner indices / weights / in-bounds masks
        def corners(pos, size):
            ib = (pos >= 0.0) & (pos <= size - 1.0)
            pc = np.clip(pos, 0.0, size - 1.0)
            i0 = np.floor(pc).astype(np.int64)
            w1 = pc - i0
            i1 = np.minimum(i0 + 1, size - 1)
            return i0, i1, w1, ib

        y0, y1i, wy, iby = corners(ys, H)
        x0, x1i, wx, ibx = corners(xs, W)
        z0, z1i, wz, ibz = corners(zs, D)
        for iy in range(py):
            for ix in range(px):
                for iz in range(pz):
                    if not (iby[iy] and ibx[ix] and ibz[iz]):
                        continue  # zero extrapolation
                    acc = np.zeros((C,), np.float32)
                    for (yi, wy_) in ((y0[iy], 1 - wy[iy]), (y1i[iy], wy[iy])):
                        for (xi, wx_) in ((x0[ix], 1 - wx[ix]),
                                          (x1i[ix], wx[ix])):
                            for (zi, wz_) in ((z0[iz], 1 - wz[iz]),
                                              (z1i[iz], wz[iz])):
                                acc += (wy_ * wx_ * wz_) * feature[yi, xi, zi]
                    out[b, iy, ix, iz] = acc
    return out


# ---------------------------------------------------------------------------
# PyramidROIAlign (core/models.py:597-688)
# ---------------------------------------------------------------------------
def pyramid_roi_align_np(boxes, image_shape, feature_maps, pool_size):
    """boxes: [N,6] normalized (one image); feature_maps: list of 4
    [H_l,W_l,D_l,C] arrays (P2..P5); image_shape: (H,W,D)."""
    H, W, D = (float(v) for v in image_shape[:3])
    eps = 1e-6
    b = boxes.astype(np.float32).copy()
    b = np.clip(b, 0.0, 1.0)
    b[:, 3] = np.maximum(b[:, 3], b[:, 0] + eps)
    b[:, 4] = np.maximum(b[:, 4], b[:, 1] + eps)
    min_dz = 1.0 / max(D, 1.0)
    b[:, 5] = np.maximum(b[:, 5], b[:, 2] + min_dz)

    hroi = b[:, 3] - b[:, 0]
    wroi = b[:, 4] - b[:, 1]
    droi = b[:, 5] - b[:, 2]
    image_volume = H * W * D
    roi_volume = np.maximum(hroi * wroi * droi, 1e-12)
    lvl = np.log2(np.cbrt(roi_volume) / (224.0 / np.cbrt(image_volume)))
    lvl = np.minimum(5, np.maximum(2, 4 + np.round(lvl).astype(np.int32)))

    p3 = (pool_size,) * 3
    C = feature_maps[0].shape[-1]
    out = np.zeros((b.shape[0], *p3, C), np.float32)
    for level in range(2, 6):
        ix = np.where(lvl == level)[0]
        if ix.size:
            out[ix] = crop_and_resize_3d_np(feature_maps[level - 2], b[ix], p3)
    return out


# ---------------------------------------------------------------------------
# Backbone + FPN (core/models.py:157-273, 3190-3214)
# ---------------------------------------------------------------------------
def flatten_by_layer(tree):
    """Flatten a nested flax tree to {layer_name: {leaf: np.ndarray}} keyed
    by the penultimate path component — the reference layer name
    (res2a_branch2a, bn_conv1, fpn_p2, ...), which is unique by construction
    in m3d's trunks regardless of flax's auto-generated intermediate module
    names (Bottleneck_0/...)."""
    out: dict = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + [k])
        else:
            out.setdefault(path[-2], {})[path[-1]] = np.asarray(node)

    walk({k: v for k, v in tree.items()}, [])
    return out


def bottleneck_np(x, P, S, stage, block, strides=(1, 1, 1),
                  conv_shortcut=False):
    """ResNet bottleneck (identity_block core/models.py:157-189 /
    conv_block :192-232): 1^3 strided conv -> BN relu -> 3^3 conv -> BN relu
    -> 1^3 conv -> BN, plus (projected) shortcut, relu(sum)."""
    cn = f"res{stage}{block}_branch"
    bn = f"bn{stage}{block}_branch"
    y = conv3d_np(x, P[cn + "2a"]["kernel"], P[cn + "2a"]["bias"],
                  "VALID", strides=strides)
    y = relu_np(bn_np(y, P[bn + "2a"], S[bn + "2a"]))
    y = conv3d_np(y, P[cn + "2b"]["kernel"], P[cn + "2b"]["bias"], "SAME")
    y = relu_np(bn_np(y, P[bn + "2b"], S[bn + "2b"]))
    y = conv3d_np(y, P[cn + "2c"]["kernel"], P[cn + "2c"]["bias"], "VALID")
    y = bn_np(y, P[bn + "2c"], S[bn + "2c"])
    if conv_shortcut:
        sc = conv3d_np(x, P[cn + "1"]["kernel"], P[cn + "1"]["bias"],
                       "VALID", strides=strides)
        sc = bn_np(sc, P[bn + "1"], S[bn + "1"])
    else:
        sc = x
    return relu_np(y + sc)


def _stage_strides_np(level_strides):
    """Per-stage strides from cumulative per-level BACKBONE_STRIDES —
    independent numpy re-derivation of the trunk's stride discipline
    (reference hardcodes z-stride 1, core/models.py:241-273; m3d generalizes
    to per-axis factors so z-strided configs genuinely stride)."""
    s = [tuple(int(v) for v in lv) for lv in level_strides[:4]]
    z0 = s[0][2]
    stem_z = 2 if z0 >= 2 else 1
    stem, pool = (2, 2, stem_z), (2, 2, z0 // stem_z)
    stages = [tuple(s[i][a] // s[i - 1][a] for a in range(3))
              for i in (1, 2, 3)]
    return stem, pool, stages


def resnet_graph_np(image, P, S, architecture="resnet50",
                    level_strides=((4, 4, 1), (8, 8, 1), (16, 16, 1),
                                   (32, 32, 1), (64, 64, 1))):
    """resnet_graph (core/models.py:235-273): pad-3 7^3 strided stem conv,
    BN relu, 3^3 maxpool, four bottleneck stages. Returns (C2, C3, C4, C5).
    P/S: flatten_by_layer views of the trunk params / batch_stats."""
    stem_s, pool_s, (s3, s4, s5) = _stage_strides_np(level_strides)
    x = conv3d_np(image.astype(np.float32), P["conv1"]["kernel"],
                  P["conv1"]["bias"], [(3, 3)] * 3, strides=stem_s)
    x = relu_np(bn_np(x, P["bn_conv1"], S["bn_conv1"]))
    x = maxpool3d_np(x, (3, 3, 3), pool_s, "SAME")

    def stage(x, stage_id, n_identity, first_strides):
        x = bottleneck_np(x, P, S, stage_id, "a", first_strides,
                          conv_shortcut=True)
        for i in range(n_identity):
            x = bottleneck_np(x, P, S, stage_id, chr(98 + i))
        return x

    c2 = x = stage(x, 2, 2, (1, 1, 1))
    c3 = x = stage(x, 3, 3, s3)
    n4 = {"resnet50": 5, "resnet101": 22}[architecture]
    c4 = x = stage(x, 4, n4, s4)
    c5 = stage(x, 5, 2, s5)
    return c2, c3, c4, c5


def _upsample_np(x, factors, ref_shape):
    for axis, f in zip((1, 2, 3), factors):
        if f > 1:
            x = np.repeat(x, f, axis=axis)
    return x[:, : ref_shape[1], : ref_shape[2], : ref_shape[3], :]


def fpn_np(c2, c3, c4, c5, P, level_strides):
    """FPN (core/models.py:3190-3214): P5 = 1^3 conv of C5; top-down nearest
    upsampling + 1^3 lateral convs; 3^3 smoothing convs; P6 = strided
    subsample of P5 (MaxPooling3D pool (1,1,1) stride ratio). Returns
    [P2..P6]."""
    s = [tuple(int(v) for v in lv) for lv in level_strides]
    ups = [tuple(s[i + 1][a] // s[i][a] for a in range(3)) for i in (2, 1, 0)]
    f54, f43, f32 = ups
    c1 = lambda x, n: conv3d_np(x, P[n]["kernel"], P[n]["bias"], "VALID")  # noqa: E731
    c3_ = lambda x, n: conv3d_np(x, P[n]["kernel"], P[n]["bias"], "SAME")  # noqa: E731

    p5 = c1(c5, "fpn_c5p5")
    p4 = _upsample_np(p5, f54, c4.shape) + c1(c4, "fpn_c4p4")
    p3 = _upsample_np(p4, f43, c3.shape) + c1(c3, "fpn_c3p3")
    p2 = _upsample_np(p3, f32, c2.shape) + c1(c2, "fpn_c2p2")

    p2 = c3_(p2, "fpn_p2")
    p3 = c3_(p3, "fpn_p3")
    p4 = c3_(p4, "fpn_p4")
    p5 = c3_(p5, "fpn_p5")
    sy, sx, sz = (s[4][a] // s[3][a] for a in range(3))
    p6 = p5[:, ::sy, ::sx, ::sz, :]
    return [p2, p3, p4, p5, p6]


def twin_backbone_fpn(image, params, batch_stats, cfg):
    """Raw image -> FPN feature maps [P2..P6], the pre-feature half of the
    reference inference graph (resnet_graph + inline FPN,
    core/models.py:157-273, 3190-3214). params/batch_stats: the full m3d
    variables trees (the trunk lives under params['resnet'] / ['fpn'])."""
    P = flatten_by_layer(params["resnet"])
    S = flatten_by_layer(batch_stats.get("resnet", {}))
    lvl = [tuple(int(v) for v in s) for s in cfg.BACKBONE_STRIDES]
    c2, c3, c4, c5 = resnet_graph_np(
        image, P, S, architecture=str(cfg.BACKBONE), level_strides=lvl)
    PF = flatten_by_layer(params["fpn"])
    return fpn_np(c2, c3, c4, c5, PF, lvl)


# ---------------------------------------------------------------------------
# Graph stages
# ---------------------------------------------------------------------------
def rpn_head_np(feature_maps, rpn_params):
    """Shared RPN head over P2..P6 (core/models.py:512-584): 3^3 conv 512
    relu -> 1^3 conv 256 relu -> class/bbox 1^3 convs; flatten cell-major,
    anchor-minor; concat levels."""
    p = rpn_params
    logits_all, deltas_all = [], []
    for fm in feature_maps:
        x = relu_np(conv3d_np(fm, p["rpn_conv_shared1"]["kernel"],
                              p["rpn_conv_shared1"]["bias"], "SAME"))
        x = relu_np(conv3d_np(x, p["rpn_conv_shared2"]["kernel"],
                              p["rpn_conv_shared2"]["bias"], "SAME"))
        cls = conv3d_np(x, p["rpn_class_raw"]["kernel"],
                        p["rpn_class_raw"]["bias"], "SAME")
        bbx = conv3d_np(x, p["rpn_bbox_pred"]["kernel"],
                        p["rpn_bbox_pred"]["bias"], "SAME")
        n = fm.shape[0]
        logits_all.append(cls.reshape(n, -1, 2))
        deltas_all.append(bbx.reshape(n, -1, 6))
    logits = np.concatenate(logits_all, axis=1)
    probs = softmax_np(logits)
    deltas = np.concatenate(deltas_all, axis=1)
    return logits, probs, deltas


def proposal_layer_np(rpn_probs, rpn_deltas, anchors, rpn_bbox_std_dev,
                      proposal_count, nms_threshold, pre_nms_limit,
                      image_depth):
    """ProposalLayer (core/models.py:369-504), single image."""
    scores = rpn_probs[:, 1].astype(np.float32)
    deltas = rpn_deltas.astype(np.float32) * np.asarray(rpn_bbox_std_dev,
                                                        np.float32)
    deltas = np.clip(deltas, -3.0, 3.0)

    k = min(pre_nms_limit, anchors.shape[0])
    top = np.argsort(-scores, kind="stable")[:k]
    scores_k = scores[top]
    boxes = apply_deltas_np(anchors[top], deltas[top], clip_log_scale=False)
    boxes = np.clip(boxes, 0.0, 1.0)
    eps = 1e-6
    min_dz = max(1.0 / max(float(image_depth), 1.0), 1e-4)
    boxes[:, 3] = np.maximum(boxes[:, 3], boxes[:, 0] + eps)
    boxes[:, 4] = np.maximum(boxes[:, 4], boxes[:, 1] + eps)
    boxes[:, 5] = np.maximum(boxes[:, 5], boxes[:, 2] + min_dz)

    keep = nms_greedy_np(boxes, scores_k, nms_threshold, proposal_count)
    props = boxes[keep]
    pad = proposal_count - props.shape[0]
    if pad > 0:
        props = np.concatenate([props, np.zeros((pad, 6), np.float32)])
    return props


def classifier_head_np(pooled, params, stats, num_classes):
    """fpn_classifier_graph (core/models.py:1121-1189): pool^3 VALID conv ->
    BN -> relu -> 1^3 conv -> BN -> relu -> logits dense (clip +-10, softmax)
    + bbox dense reshaped [N, C, 6]. pooled: [N,p,p,p,C]."""
    x = conv3d_np(pooled, params["mrcnn_class_conv1"]["kernel"],
                  params["mrcnn_class_conv1"]["bias"], "VALID")
    x = relu_np(bn_np(x, params["mrcnn_class_bn1"], stats["mrcnn_class_bn1"]))
    x = conv3d_np(x, params["mrcnn_class_conv2"]["kernel"],
                  params["mrcnn_class_conv2"]["bias"], "SAME")
    x = relu_np(bn_np(x, params["mrcnn_class_bn2"], stats["mrcnn_class_bn2"]))
    shared = x.reshape(x.shape[0], -1)

    logits = shared @ params["mrcnn_class_logits"]["kernel"] + \
        params["mrcnn_class_logits"]["bias"]
    logits = np.clip(logits, -10.0, 10.0)
    probs = softmax_np(logits)
    bbox = shared @ params["mrcnn_bbox_fc"]["kernel"] + \
        params["mrcnn_bbox_fc"]["bias"]
    return logits, probs, bbox.reshape(-1, num_classes, 6)


def mask_head_np(pooled, params, stats):
    """build_fpn_mask_graph (core/models.py:1191-1238): 4x 3^3 conv-BN-relu
    with a dilated residual (conv3b dilation 2, additive), 2x deconv relu,
    1^3 sigmoid conv. pooled: [N,m,m,m,C] -> [N,2m,2m,2m,num_classes]."""
    def cbr(x, name, dilation=1):
        x = conv3d_np(x, params[name]["kernel"], params[name]["bias"],
                      "SAME", dilation=dilation)
        bn = name.replace("conv", "bn")
        return relu_np(bn_np(x, params[bn], stats[bn]))

    x = cbr(pooled, "mrcnn_mask_conv1")
    x = cbr(x, "mrcnn_mask_conv2")
    res = cbr(x, "mrcnn_mask_conv3")
    dil = cbr(res, "mrcnn_mask_conv3b", dilation=2)
    x = res + dil
    x = cbr(x, "mrcnn_mask_conv4")
    x = relu_np(conv3d_transpose_np(x, params["mrcnn_mask_deconv"]["kernel"],
                                    params["mrcnn_mask_deconv"]["bias"]))
    x = conv3d_np(x, params["mrcnn_mask"]["kernel"],
                  params["mrcnn_mask"]["bias"], "SAME")
    return sigmoid_np(x)


def refine_detections_np(rois, probs, deltas, image_shape, bbox_std_dev,
                         min_confidence, nms_threshold, max_instances,
                         nms_xy_only=True):
    """refine_detections_graph (core/models.py:1415-1529), single image.
    Binary product semantics: fg prob = column 1, class_id = 1 for every
    detection. ``nms_xy_only=True`` replicates the reference's 2-D footprint
    NMS (tf.image.non_max_suppression on (x,y) only, core/models.py:1496-1501).
    """
    H, W, D = (float(v) for v in image_shape[:3])
    fg = probs[:, 1].astype(np.float32)

    keep = fg >= float(min_confidence)
    # zero-padded proposal rows never survive the pixel min-size filter, but
    # filter them here too so score sorting below is over real rows only
    keep &= np.abs(rois).sum(axis=1) > 0
    idx = np.where(keep)[0]
    if idx.size == 0:
        return (np.zeros((max_instances, 8), np.float32),
                np.zeros((max_instances,), bool))

    rois_sel = rois[idx]
    scores_sel = fg[idx]
    deltas_sel = deltas[idx, 1, :] * np.asarray(bbox_std_dev, np.float32)

    scale = np.array([H, W, D, H, W, D], np.float32)
    rois_px = rois_sel * scale
    boxes_px = apply_deltas_np(rois_px, deltas_sel, clip_log_scale=True)
    boxes_px = np.stack([
        np.clip(boxes_px[:, 0], 0, H), np.clip(boxes_px[:, 1], 0, W),
        np.clip(boxes_px[:, 2], 0, D), np.clip(boxes_px[:, 3], 0, H),
        np.clip(boxes_px[:, 4], 0, W), np.clip(boxes_px[:, 5], 0, D),
    ], axis=1)

    hh = boxes_px[:, 3] - boxes_px[:, 0]
    ww = boxes_px[:, 4] - boxes_px[:, 1]
    zz = boxes_px[:, 5] - boxes_px[:, 2]
    ok = (hh >= 1.0) & (ww >= 1.0) & (zz >= 0.5)
    boxes_px = boxes_px[ok]
    scores_sel = scores_sel[ok]
    if boxes_px.shape[0] == 0:
        return (np.zeros((max_instances, 8), np.float32),
                np.zeros((max_instances,), bool))

    if nms_xy_only:
        nms_boxes = boxes_px.copy()
        nms_boxes[:, 2] = 0.0
        nms_boxes[:, 5] = 1.0
    else:
        nms_boxes = boxes_px
    sel = nms_greedy_np(nms_boxes, scores_sel, nms_threshold, max_instances)

    final_b = boxes_px[sel]
    final_s = scores_sel[sel]
    order = np.argsort(-final_s, kind="stable")
    final_b, final_s = final_b[order], final_s[order]

    final_norm = final_b / scale
    k = final_b.shape[0]
    det = np.zeros((max_instances, 8), np.float32)
    det[:k, :6] = final_norm
    det[:k, 6] = 1.0
    det[:k, 7] = final_s
    valid = np.zeros((max_instances,), bool)
    valid[:k] = True
    return det, valid


# ---------------------------------------------------------------------------
# Full post-backbone twin
# ---------------------------------------------------------------------------
def twin_inference(feature_maps, params, batch_stats, anchors, image_meta,
                   cfg, nms_xy_only=True):
    """Run the reference inference cascade (core/models.py:5695-5740) in
    numpy from backbone feature maps onward.

    Args:
      feature_maps: list of 5 numpy arrays [B,H_l,W_l,D_l,C] (P2..P6).
      params / batch_stats: flax trees with 'rpn', 'classifier', 'mask_head'.
      anchors: [A, 6] normalized.
      image_meta: [B, META] canonical layout (m3d/image_meta.py).
      cfg: m3d Config.

    Returns dict with proposals [B,P,6], detections [B,M,8],
    detections_valid [B,M], masks [B,M,2m,2m,2m,C].
    """
    meta = np.asarray(image_meta, np.float32)
    image_shapes = meta[:, 5:8]  # padded (bucket) shape, see image_meta.py

    rpn_p = params["rpn"]
    _, rpn_probs, rpn_deltas = rpn_head_np(feature_maps, rpn_p)

    B = feature_maps[0].shape[0]
    P = int(cfg.POST_NMS_ROIS_INFERENCE)
    M = int(cfg.DETECTION_MAX_INSTANCES)
    pool = int(cfg.POOL_SIZE)
    mpool = int(cfg.MASK_POOL_SIZE)
    nc = int(cfg.NUM_CLASSES)

    proposals = np.zeros((B, P, 6), np.float32)
    detections = np.zeros((B, M, 8), np.float32)
    det_valid = np.zeros((B, M), bool)
    masks = np.zeros((B, M, 2 * mpool, 2 * mpool, 2 * mpool, nc), np.float32)

    cls_p = params["classifier"]
    cls_s = batch_stats.get("classifier", {})
    msk_p = params["mask_head"]
    msk_s = batch_stats.get("mask_head", {})

    for i in range(B):
        feats_i = [fm[i] for fm in feature_maps]
        proposals[i] = proposal_layer_np(
            rpn_probs[i], rpn_deltas[i], np.asarray(anchors, np.float32),
            cfg.RPN_BBOX_STD_DEV, P, float(cfg.RPN_NMS_THRESHOLD),
            int(cfg.PRE_NMS_LIMIT), int(cfg.IMAGE_DEPTH))

        pooled = pyramid_roi_align_np(proposals[i], image_shapes[i],
                                      feats_i[:4], pool)
        _, probs, bbox = classifier_head_np(pooled, cls_p, cls_s, nc)

        detections[i], det_valid[i] = refine_detections_np(
            proposals[i], probs, bbox, image_shapes[i],
            cfg.BBOX_STD_DEV, float(cfg.DETECTION_MIN_CONFIDENCE),
            float(cfg.DETECTION_NMS_THRESHOLD), M, nms_xy_only=nms_xy_only)

        n_live = int(det_valid[i].sum())
        if n_live:
            mp = pyramid_roi_align_np(detections[i, :n_live, :6],
                                      image_shapes[i], feats_i[:4], mpool)
            masks[i, :n_live] = mask_head_np(mp, msk_p, msk_s)

    return {"proposals": proposals, "detections": detections,
            "detections_valid": det_valid, "masks": masks}
