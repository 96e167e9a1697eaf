"""Hunt the classifier stage's ~11 ms pooled-tensor materialization.

README stage table (r03): roialign+classifier = 37.7 ms at 128^3 B=4 =
gather 24.4 + pooled-tensor materialization ~11 + FC ~2. The gather output
([2000, 7^3, 256] bf16, ~350 MB) is only consumed by the pool-cube FC
matmul (conv3d_fc), yet the handoff costs ~6x its HBM byte time. This probe
times the handoff variants in-context to find where the 11 ms actually goes:

  V0 gather->sum        fused-reduction floor for the gather itself
  V1 gather->classifier the shipped classify_rois_flat path
  V2 gather->fc         gather + conv3d_fc(conv1 kernel) only (no BN/heads)
  V3 gather3d->fc       gather emitting [N, p^3, C] directly (no 5-D
                        intermediate; dot on the 3-D layout)
  V4 stored->fc         conv3d_fc on a pre-materialized pooled tensor
                        (FC cost when the operand is already in HBM)
  V5 gather->fc.bf16w   V2 with the FC kernel pre-cast to bf16 outside the
                        chain (is the per-iteration f32->bf16 kernel cast
                        being charged to the stage?)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_classify_variants.py

Measured (r05 code, 128^3 B=4, 2000 ROIs, TOP_DOWN 256, FC 512):

  V0 gather->sum          24.39 ms   <- the gather itself is the floor
  V1 gather->classifier   35.48 ms   (shipped path)
  V2 gather->fc           35.23 ms   -> BN/logits/bbox beyond FC: ~0.3 ms
  V3 gather3d->fc         49.98 ms   -> 3-D-layout gather is WORSE
  V4 stored->fc            1.09 ms   -> the FC matmul is ~1 ms
  V5 gather->fc.bf16w     35.41 ms   -> kernel cast is free

Reading: the ~11 ms "materialization penalty" is entirely the XLA gather's
written-output form (35.2 - 24.4 - 1.1 ~= 9.7 ms): when the gather feeds a
matmul its output must materialize and the gather loses its fused-reduction
codegen. The FC itself is speed-of-light (1 ms). Both recoveries must come
from the gather: either a written-gather at HBM-bandwidth cost (the slab-DMA
pallas kernel's floor is 11.8 ms, but its per-ROI separable-interp chain
drags it to 48.2 — see pallas_roialign.py) or batching that interp chain
across ROIs.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from m3d.anchors import normalized_pyramid_anchors  # noqa: E402
from m3d.config import Config  # noqa: E402
from m3d.image_meta import default_meta  # noqa: E402
from m3d.models.mask_rcnn import MaskRCNN, init_params  # noqa: E402
from m3d.ops.conv3d import conv3d_fc  # noqa: E402
from m3d.ops import roialign3d as ra  # noqa: E402


def tsum(t):
    leaves = jax.tree_util.tree_leaves(t)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


def chain_time(name, step, x0, *consts, n_lo=3, n_hi=12):
    def scan_fn(n):
        return jax.jit(lambda x, *cs: lax.scan(
            lambda c, _: ((jnp.tanh(tsum(step(c, x, *cs))) * 1e-6).astype(
                jnp.float32), None),
            jnp.float32(0.0), None, length=n)[0])

    times = {}
    for n in (n_lo, n_hi):
        f = scan_fn(n)
        float(f(x0, *consts))
        ts = []
        for i in range(1, 4):
            xi = jax.tree_util.tree_map(
                lambda a: a + jnp.asarray(i * 1e-6, a.dtype), x0)
            float(tsum(xi))
            t0 = time.perf_counter()
            float(f(xi, *consts))
            ts.append(time.perf_counter() - t0)
        times[n] = min(ts)
    dt = max((times[n_hi] - times[n_lo]) / (n_hi - n_lo), 1e-9)
    print(f"[{name}] {dt*1e3:.2f} ms", flush=True)
    return dt


def gather_flat_3d(boxes, batch_idx, image_meta, feature_maps, p):
    """pyramid_roi_align_flat but emitting [N, p^3, C]: same 8-corner row
    gather with the output accumulated directly in the dot-ready layout."""
    boxes, levels = ra._sanitize_flat_rois(
        boxes, batch_idx, image_meta, len(feature_maps))
    c = feature_maps[0].shape[-1]
    bsz = feature_maps[0].shape[0]
    level_dims, level_offsets, flat_parts = [], [], []
    offset = 0
    for fm in feature_maps:
        _, hl, wl, dl, _ = fm.shape
        level_dims.append((hl, wl, dl))
        level_offsets.append(offset)
        offset += hl * wl * dl
        flat_parts.append(fm.reshape(bsz, hl * wl * dl, c))
    flat = jnp.concatenate(flat_parts, axis=1).reshape(bsz * offset, c)

    dims_lut = jnp.asarray(level_dims, jnp.int32)
    off_lut = jnp.asarray(level_offsets, jnp.int32)
    roi_dims = dims_lut[levels]
    hy = roi_dims[:, 0].astype(jnp.float32)
    wx = roi_dims[:, 1].astype(jnp.float32)
    dz = roi_dims[:, 2].astype(jnp.float32)
    base = jnp.asarray(batch_idx, jnp.int32) * offset + off_lut[levels]

    pos = (ra._axis_positions(boxes[:, 0], boxes[:, 3], hy, p),
           ra._axis_positions(boxes[:, 1], boxes[:, 4], wx, p),
           ra._axis_positions(boxes[:, 2], boxes[:, 5], dz, p))
    dims = (hy, wx, dz)
    strides = (roi_dims[:, 1] * roi_dims[:, 2], roi_dims[:, 2],
               jnp.ones_like(roi_dims[:, 2]))
    corners = [ra._corner(po, jnp.asarray(size, jnp.float32)[..., None])
               for po, size in zip(pos, dims)]
    (y0, y1c, wy, my), (x0, x1c, wxw, mx), (z0, z1c, wz, mz) = corners
    sy, sx, sz = (jnp.asarray(s, jnp.int32) for s in strides)

    def b3(s):
        return s[:, None, None, None] if s.ndim == 1 else s

    n = boxes.shape[0]
    out = jnp.zeros((n, p * p * p, c), flat.dtype)
    for cy, wyc in ((y0, 1.0 - wy), (y1c, wy)):
        for cx, wxc in ((x0, 1.0 - wxw), (x1c, wxw)):
            for cz, wzc in ((z0, 1.0 - wz), (z1c, wz)):
                fi = (base[:, None, None, None]
                      + cy[:, :, None, None] * b3(sy)
                      + cx[:, None, :, None] * b3(sx)
                      + cz[:, None, None, :] * b3(sz))
                vals = flat[fi.reshape(-1)].reshape(n, p * p * p, c)
                w = (wyc[:, :, None, None] * wxc[:, None, :, None]
                     * wzc[:, None, None, :]).reshape(n, p * p * p, 1)
                out = out + vals * w.astype(flat.dtype)
    m = (my[:, :, None, None] & mx[:, None, :, None]
         & mz[:, None, None, :]).reshape(n, p * p * p, 1)
    return jnp.where(m, out, 0)


def main():
    batch = 4
    p = 7
    cfg = Config(
        IMAGE_SIZE=128, IMAGE_DEPTH=128,
        BACKBONE_STRIDES=[(4, 4, 4), (8, 8, 8), (16, 16, 16), (32, 32, 32),
                          (64, 64, 64)],
        RPN_ANCHOR_SCALES=(16, 24, 32, 48, 64),
        RPN_ANCHOR_RATIOS=[0.5, 1.0, 2.0],
        PRE_NMS_LIMIT=6000, POST_NMS_ROIS_INFERENCE=500,
        DETECTION_MAX_INSTANCES=50,
        FPN_CLASSIF_FC_LAYERS_SIZE=512,
    )
    model = MaskRCNN.from_config(cfg, mode="inference")
    normalized_pyramid_anchors(cfg)
    meta = np.tile(default_meta(cfg)[None], (batch, 1))
    image = jnp.asarray(
        np.random.RandomState(0).randn(batch, 128, 128, 128, 1), jnp.float32)
    variables = jax.device_put(init_params(model, jax.random.PRNGKey(0)))

    feats = jax.jit(lambda v, img: model.apply(
        v, img, method=MaskRCNN.extract_features))(variables, image)
    fl = jax.device_put([np.asarray(f) for f in feats[:4]])
    print("feature dtypes:", [str(f.dtype) for f in fl], flush=True)

    n_total = batch * 500
    rng = np.random.RandomState(1)
    lo = rng.uniform(0, 0.6, (n_total, 3)).astype(np.float32)
    ext = rng.uniform(0.05, 0.35, (n_total, 3)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([lo, np.minimum(lo + ext, 1.0)], -1))
    bidx = jnp.asarray(np.repeat(np.arange(batch, dtype=np.int32), 500))

    k1 = variables["params"]["classifier"]["mrcnn_class_conv1"][
        "kernel"]  # [7,7,7,C,F]
    k1_bf = jax.device_put(k1.astype(jnp.bfloat16))
    k1_flat_bf = jax.device_put(
        np.asarray(k1, np.float32).reshape(-1, k1.shape[-1]).astype(
            jnp.bfloat16))

    chain_time(
        "V0 gather->sum (fused floor)",
        lambda c, b, f: ra.pyramid_roi_align_flat(
            b + c * 1e-3, bidx, meta, list(f), p),
        boxes, fl)
    chain_time(
        "V1 gather->classifier (shipped)",
        lambda c, b, v, f: model.apply(
            v, b + c * 1e-3, bidx, meta, list(f),
            method=MaskRCNN.classify_rois_flat),
        boxes, variables, fl)
    chain_time(
        "V2 gather->conv3d_fc",
        lambda c, b, v, f: conv3d_fc(
            ra.pyramid_roi_align_flat(b + c * 1e-3, bidx, meta, list(f), p),
            v["params"]["classifier"]["mrcnn_class_conv1"]["kernel"].astype(
                jnp.bfloat16)),
        boxes, variables, fl)
    chain_time(
        "V3 gather3d->dot",
        lambda c, b, f, k: jnp.dot(
            gather_flat_3d(b + c * 1e-3, bidx, meta, list(f), p).reshape(
                n_total, -1),
            k, preferred_element_type=jnp.float32),
        boxes, fl, k1_flat_bf)

    pooled = jax.jit(lambda b, f: ra.pyramid_roi_align_flat(
        b, bidx, meta, list(f), p))(boxes, fl)
    pooled = jax.device_put(np.asarray(pooled))
    print("pooled:", pooled.shape, pooled.dtype, flush=True)
    chain_time(
        "V4 stored->conv3d_fc",
        lambda c, pk: conv3d_fc(pk[0] + c * jnp.asarray(1e-3, pk[0].dtype),
                                pk[1]),
        (pooled, k1_bf))
    chain_time(
        "V5 gather->fc (bf16 W const)",
        lambda c, b, f, k: conv3d_fc(
            ra.pyramid_roi_align_flat(b + c * 1e-3, bidx, meta, list(f), p),
            k),
        boxes, fl, k1_bf)


if __name__ == "__main__":
    main()
