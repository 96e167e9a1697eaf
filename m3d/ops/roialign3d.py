"""3D crop-and-resize (ROIAlign) — XLA-native gather/interpolate.

Replaces the reference's compiled C++/CUDA ``CropAndResize3D`` custom op
(reference: core/custom_op/custom_op.py:28-65), which generalizes
``tf.image.crop_and_resize`` to 5-D ``[B, H, W, D, C]`` with methods
``trilinear`` / ``nearest``. Sampling semantics follow TF crop_and_resize:

  for crop size p > 1:   pos_i = b1 * (S - 1) + i * (b2 - b1) * (S - 1) / (p - 1)
  for crop size p == 1:  pos   = 0.5 * (b1 + b2) * (S - 1)

with out-of-range positions producing the extrapolation value 0. Boxes are in
normalized [0,1] coordinates (divide-by-S convention; the (S-1) factor above
is internal to the sampling grid, mirroring TF).

Gradients w.r.t. the image come free via JAX autodiff (gather -> scatter-add),
replacing ``CropAndResize3DGradImage``. Gradients w.r.t. boxes are stopped, as
the reference stops them at every ROIAlign call site (core/models.py:660-661).

``pyramid_roi_align`` fuses the FPN level routing (reference:
core/models.py:597-687 PyramidROIAlign): instead of the reference's dynamic
``tf.where`` partition into per-level crops, all levels are flattened into one
indexable buffer and each ROI gathers from its level via index arithmetic —
fixed shapes, no redundant crops, no re-sort.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np

from m3d.image_meta import parse_image_meta


def _axis_positions(lo, hi, size, crop: int):
    """Sample positions along one axis. lo/hi: [N] normalized; size: [N] or scalar.

    Returns [N, crop] float positions in source-pixel space.
    """
    size = jnp.asarray(size, jnp.float32)
    span = (size - 1.0)
    if crop > 1:
        frac = jnp.arange(crop, dtype=jnp.float32) / (crop - 1)  # [crop]
        pos = lo[:, None] * span[..., None] + (
            (hi - lo)[:, None] * span[..., None]
        ) * frac[None, :]
    else:
        pos = (0.5 * (lo + hi) * span)[:, None]
    return pos


def _corner(pos, size):
    """Floor corner index, interpolation weight, and in-bounds mask."""
    in_bounds = jnp.logical_and(pos >= 0.0, pos <= size - 1.0)
    pos_c = jnp.clip(pos, 0.0, size - 1.0)
    i0 = jnp.floor(pos_c)
    w1 = pos_c - i0
    i0 = i0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, jnp.asarray(size, jnp.int32) - 1)
    return i0, i1, w1, in_bounds


def _gather_interp(flat_values, base_flat_idx, dims, strides, positions,
                   method: str):
    """Shared trilinear/nearest gather from a flat [T, C] buffer.

    flat_values: [T, C] flattened source voxels (possibly multi-image/level).
    base_flat_idx: [N] int32 offset of each ROI's source volume within T.
    dims: tuple of three [N]-or-scalar source extents (H, W, D).
    strides: tuple of three [N]-or-scalar flat strides for (y, x, z).
    positions: tuple of three [N, p] float position grids.
    Returns [N, py, px, pz, C].
    """
    (py, px, pz) = (p.shape[1] for p in positions)
    n = positions[0].shape[0]
    c = flat_values.shape[-1]

    if method == "nearest":
        idxs = []
        masks = []
        for pos, size in zip(positions, dims):
            in_b = jnp.logical_and(pos >= 0.0, pos <= jnp.asarray(size, jnp.float32)[..., None] - 1.0)
            i = jnp.clip(jnp.round(pos), 0, jnp.asarray(size, jnp.float32)[..., None] - 1.0)
            idxs.append(i.astype(jnp.int32))
            masks.append(in_b)
        iy, ix, iz = idxs
        sy, sx, sz = (jnp.asarray(s, jnp.int32) for s in strides)
        flat = (
            base_flat_idx[:, None, None, None]
            + iy[:, :, None, None] * _bcast(sy)
            + ix[:, None, :, None] * _bcast(sx)
            + iz[:, None, None, :] * _bcast(sz)
        )
        out = flat_values[flat.reshape(-1)].reshape(n, py, px, pz, c)
        m = (
            masks[0][:, :, None, None]
            & masks[1][:, None, :, None]
            & masks[2][:, None, None, :]
        )
        return jnp.where(m[..., None], out, 0.0)

    # Trilinear via 8 per-corner ROW gathers from the flat [T, C] buffer.
    # NOTE: this exact form matters on TPU — plain row indexing lowers to
    # the fast vectorized gather (~226M rows/s on v5e); a "smarter"
    # lax.gather with slice_sizes=(2, C) to pair the z corners lowers to a
    # serialized slice loop 150x slower (measured 3.6s vs 24ms for 2000
    # ROIs x 7^3 x 256ch).
    corners = [_corner(pos, jnp.asarray(size, jnp.float32)[..., None])
               for pos, size in zip(positions, dims)]
    (y0, y1c, wy, my), (x0, x1c, wx, mx), (z0, z1c, wz, mz) = corners
    sy, sx, sz = (jnp.asarray(s, jnp.int32) for s in strides)

    in_bounds = (
        my[:, :, None, None] & mx[:, None, :, None] & mz[:, None, None, :]
    )

    out = jnp.zeros((n, py, px, pz, c), flat_values.dtype)
    for cy, wyc in ((y0, 1.0 - wy), (y1c, wy)):
        for cx, wxc in ((x0, 1.0 - wx), (x1c, wx)):
            for cz, wzc in ((z0, 1.0 - wz), (z1c, wz)):
                flat = (
                    base_flat_idx[:, None, None, None]
                    + cy[:, :, None, None] * _bcast(sy)
                    + cx[:, None, :, None] * _bcast(sx)
                    + cz[:, None, None, :] * _bcast(sz)
                )
                vals = flat_values[flat.reshape(-1)].reshape(n, py, px, pz, c)
                w = (
                    wyc[:, :, None, None]
                    * wxc[:, None, :, None]
                    * wzc[:, None, None, :]
                )
                out = out + vals * w[..., None].astype(flat_values.dtype)
    return jnp.where(in_bounds[..., None], out, 0.0)


def _bcast(stride):
    """Broadcast a scalar-or-[N] stride against [N, p, p, p] index grids."""
    s = jnp.asarray(stride, jnp.int32)
    return s[:, None, None, None] if s.ndim == 1 else s


def _gather_interp_zpair(flat_values, base_flat_idx, dims, strides,
                         positions):
    """Trilinear gather with z-corner pairing: 4 row gathers instead of 8.

    MEASURED SLOWER — kept as a documented negative result, NOT dispatched.
    Hypothesis was that the TPU row gather is row-COUNT bound (~226M rows/s
    at C=256), so pairing the two adjacent z corners into ONE [2C] row via
    a parity-doubled buffer (flat row f -> paired row ``f//2 + (f%2)*E``)
    would halve the rows and the time. v5e measurement at the classifier
    workload (2000x7^3x256, scripts/bench_classify_probe.py): 64.0 ms vs
    24.4 ms for the plain 8-corner row gather — 2.6x WORSE. The 512-lane
    rows do not gather at the per-row rate of 256-lane rows, and the
    doubled buffer adds an HBM copy. Same family as the slice-gather
    failure documented in _gather_interp: this backend's gather is fastest
    on plain C-row indexing, full stop.

    Requires strides[2] == 1 (callers flatten z minor). Out-of-level reads
    at z0 == size-1 get zero interpolation weight (frac == 0 there) and the
    buffer carries a 2-row zero tail, so the overrun never contributes and
    never reads out of bounds.
    """
    (py, px, pz) = (p.shape[1] for p in positions)
    n = positions[0].shape[0]
    c = flat_values.shape[-1]
    t = flat_values.shape[0]

    corners = [_corner(pos, jnp.asarray(size, jnp.float32)[..., None])
               for pos, size in zip(positions, dims)]
    (y0, y1c, wy, my), (x0, x1c, wx, mx), (z0, _, wz, mz) = corners
    sy, sx, _ = (jnp.asarray(s, jnp.int32) for s in strides)

    in_bounds = (
        my[:, :, None, None] & mx[:, None, :, None] & mz[:, None, None, :]
    )

    # Parity-doubled pairing: rows [0, E) pair flat rows (2k, 2k+1); rows
    # [E, 2E) pair (2k+1, 2k+2). Two-row zero tail absorbs the z0==size-1
    # overrun of the last voxel.
    tp = t + 2 - (t % 2)
    flat_p = jnp.pad(flat_values, ((0, tp - t), (0, 0)))
    e = tp // 2
    even = flat_p.reshape(e, 2 * c)
    odd = jnp.pad(flat_values[1:], ((0, tp - t + 1), (0, 0))).reshape(
        e, 2 * c)
    paired = jnp.concatenate([even, odd], axis=0)      # [2E, 2C]

    wz0 = (1.0 - wz)[:, None, None, :]                  # [N,1,1,pz]
    wz1 = wz[:, None, None, :]

    out = jnp.zeros((n, py, px, pz, c), flat_values.dtype)
    for cy, wyc in ((y0, 1.0 - wy), (y1c, wy)):
        for cx, wxc in ((x0, 1.0 - wx), (x1c, wx)):
            f = (
                base_flat_idx[:, None, None, None]
                + cy[:, :, None, None] * _bcast(sy)
                + cx[:, None, :, None] * _bcast(sx)
                + z0[:, None, None, :]
            )                                           # [N,py,px,pz]
            row = (f // 2) + (f % 2) * e
            vals = paired[row.reshape(-1)].reshape(n, py, px, pz, 2, c)
            wcol = wyc[:, :, None] * wxc[:, None, :]    # [N,py,px]
            zmix = (vals[..., 0, :] * wz0[..., None].astype(vals.dtype)
                    + vals[..., 1, :] * wz1[..., None].astype(vals.dtype))
            out = out + zmix * wcol[..., None, None].astype(vals.dtype)
    return jnp.where(in_bounds[..., None], out, 0.0)


@functools.partial(jax.jit, static_argnames=("crop_size", "method"))
def crop_and_resize_3d(features, boxes, box_indices, crop_size,
                       method: str = "trilinear"):
    """Crop N boxes from a batch of volumes and resize to ``crop_size``.

    Args:
      features: [B, H, W, D, C].
      boxes: [N, 6] normalized (y1,x1,z1,y2,x2,z2).
      box_indices: [N] int32 batch index per box.
      crop_size: static (py, px, pz).
      method: "trilinear" | "nearest".

    Returns: [N, py, px, pz, C] in features' dtype.
    """
    b, h, w, d, c = features.shape
    py, px, pz = (int(s) for s in crop_size)
    boxes = jax.lax.stop_gradient(jnp.asarray(boxes, jnp.float32))

    pos_y = _axis_positions(boxes[:, 0], boxes[:, 3], float(h), py)
    pos_x = _axis_positions(boxes[:, 1], boxes[:, 4], float(w), px)
    pos_z = _axis_positions(boxes[:, 2], boxes[:, 5], float(d), pz)

    flat = features.reshape(b * h * w * d, c)
    base = box_indices.astype(jnp.int32) * (h * w * d)
    return _gather_interp(
        flat, base,
        dims=(float(h), float(w), float(d)),
        strides=(w * d, d, 1),
        positions=(pos_y, pos_x, pos_z),
        method=method,
    )


def compute_roi_levels(boxes, image_shape, num_levels: int = 4):
    """FPN level per ROI: k = clamp(4 + round(log2(cbrt(vol_norm) * cbrt(HWD)/224)), 2, 5).

    boxes normalized; image_shape (H, W, D) in pixels.
    Reference: core/models.py:637-649.
    Returns [N] int32 in [0, num_levels) (0 == P2).
    """
    h = boxes[..., 3] - boxes[..., 0]
    w = boxes[..., 4] - boxes[..., 1]
    d = boxes[..., 5] - boxes[..., 2]
    vol = jnp.maximum(h * w * d, 1e-12)
    image_volume = (
        jnp.asarray(image_shape[0], jnp.float32)
        * jnp.asarray(image_shape[1], jnp.float32)
        * jnp.asarray(image_shape[2], jnp.float32)
    )
    lvl = jnp.log2(jnp.cbrt(vol) / (224.0 / jnp.cbrt(image_volume)))
    lvl = 4 + jnp.round(lvl).astype(jnp.int32)
    lvl = jnp.clip(lvl, 2, 2 + num_levels - 1)
    return lvl - 2


def _axis_slab_weights(pos, dim, slab: int, align: int = 1, origin_dim=None):
    """Per-axis slab origin + interpolation weight matrix.

    pos: [N, p] absolute sample positions in level coordinates.
    dim: [N] level extent along this axis.
    Returns (origin [N] int32, W [N, p, slab] float32) such that
    ``out_i = sum_s W[i, s] * F[origin + s]`` reproduces clamped linear
    interpolation with zero extrapolation. Exact when the sample span fits in
    the slab (span <= slab-1 cells; FPN level routing keeps typical ROIs at
    ~10-20 cells); longer spans clamp to the slab edge (approximation).
    """
    dim = jnp.asarray(dim, jnp.float32)[:, None]  # [N,1]
    # origin_dim: extent usable for slab placement (the padded extent when
    # the buffer is padded); interpolation validity still uses `dim`.
    odim = dim[:, 0] if origin_dim is None else jnp.asarray(
        origin_dim, jnp.float32)
    valid = jnp.logical_and(pos >= 0.0, pos <= dim - 1.0)
    pos_c = jnp.clip(pos, 0.0, dim - 1.0)
    origin = jnp.clip(jnp.floor(jnp.min(pos_c, axis=1)), 0.0,
                      jnp.maximum(odim - slab, 0.0))  # [N]
    if align > 1:
        # TPU sublane tiling: dynamic slices on the second-to-last axis must
        # start at a tile boundary; round down (slab is enlarged to cover).
        origin = jnp.floor(origin / align) * align
        max_o = jnp.floor(jnp.maximum(odim - slab, 0.0) / align) * align
        origin = jnp.minimum(origin, max_o)
    rel = jnp.clip(pos_c - origin[:, None], 0.0, slab - 1.0)
    i0 = jnp.floor(rel)
    frac = rel - i0
    max_col = jnp.minimum(float(slab - 1), dim - 1.0 - origin[:, None])
    i1 = jnp.minimum(i0 + 1.0, max_col)

    cols = jnp.arange(slab, dtype=jnp.float32)  # [S]
    w0 = (cols[None, None, :] == i0[..., None]) * (1.0 - frac)[..., None]
    w1 = (cols[None, None, :] == i1[..., None]) * frac[..., None]
    w = (w0 + w1) * valid[..., None].astype(jnp.float32)
    return origin.astype(jnp.int32), w


def slab_sizes(feature_maps, cap_yx: int = 32, cap_z: int = 64):
    """Per-axis slab extents from the actual level dims.

    A slab must cover an ROI's sample span on each axis to be exact. FPN
    level routing bounds spans at ~20 cells for boxes at their proper level,
    and boxes CLAMPED to the extreme levels can span at most that level's
    full extent — so ``min(cap, max_dim_over_levels)`` is exact for every
    realistic config (z-stride-1 pyramids keep z extent = IMAGE_DEPTH at all
    levels, hence the larger z cap). Returns static ints (sy, sx, sz).
    """
    max_h = max(fm.shape[1] for fm in feature_maps)
    max_w = max(fm.shape[2] for fm in feature_maps)
    max_d = max(fm.shape[3] for fm in feature_maps)
    return (min(cap_yx, max_h), min(cap_yx, max_w), min(cap_z, max_d))


def _slab_interp(flat_values, base_flat_idx, dims, strides, positions,
                 slab, chunk: int = 128):
    """Slab-gather + separable-matmul interpolation.

    Instead of 8 scattered corner gathers per sample point, each ROI reads
    ONE [Sy,Sx,Sz,C] slab as Sy*Sx contiguous z-runs (fast on TPU) and three
    tiny [p,S] weight matmuls contract it to [p,p,p,C] on the MXU.
    ``slab``: int (same for all axes) or (sy, sx, sz).
    """
    n = positions[0].shape[0]
    c = flat_values.shape[-1]
    p_sizes = tuple(p.shape[1] for p in positions)
    if isinstance(slab, int):
        slab = (slab,) * 3
    s_y, s_x, s_z = (int(v) for v in slab)

    hy, wx, dz = (jnp.asarray(d, jnp.float32) for d in dims)
    sy, sx, _ = (jnp.asarray(s, jnp.int32) for s in strides)

    oy, wy = _axis_slab_weights(positions[0], hy, s_y)
    ox, wxm = _axis_slab_weights(positions[1], wx, s_x)
    oz, wz = _axis_slab_weights(positions[2], dz, s_z)

    # Flat start (in elements) of each (y, x) z-run of the slab.
    iy = jnp.minimum(oy[:, None] + jnp.arange(s_y, dtype=jnp.int32),
                     jnp.asarray(hy, jnp.int32)[:, None] - 1)  # [N,Sy]
    ix = jnp.minimum(ox[:, None] + jnp.arange(s_x, dtype=jnp.int32),
                     jnp.asarray(wx, jnp.int32)[:, None] - 1)  # [N,Sx]
    starts = (
        base_flat_idx[:, None, None]
        + iy[:, :, None] * (sy[:, None, None] if sy.ndim else sy)
        + ix[:, None, :] * (sx[:, None, None] if sx.ndim else sx)
        + oz[:, None, None]
    ) * c  # [N, S, S] element offsets into flat_values.reshape(-1)
    flat1 = flat_values.reshape(-1)
    max_start = flat1.shape[0] - s_z * c
    starts = jnp.clip(starts, 0, max_start)

    # Pad N to a chunk multiple and scan chunks.
    n_pad = (-n) % chunk
    def pad(x):
        return jnp.concatenate(
            [x, jnp.zeros((n_pad,) + x.shape[1:], x.dtype)], 0) if n_pad else x
    starts_p, wy_p, wx_p, wz_p = map(pad, (starts, wy, wxm, wz))
    num_chunks = (n + n_pad) // chunk

    def do_chunk(args):
        st, a, bmat, cmat = args  # [chunk,Sy,Sx], [chunk,p,S*] x3
        take = jax.vmap(jax.vmap(jax.vmap(
            lambda s: jax.lax.dynamic_slice(flat1, (s,), (s_z * c,)))))
        slab_v = take(st).reshape(chunk, s_y, s_x, s_z, c)
        slab_f = slab_v.astype(jnp.float32)
        t1 = jnp.einsum("nps,nsxzc->npxzc", a, slab_f)
        t2 = jnp.einsum("nqx,npxzc->npqzc", bmat, t1)
        return jnp.einsum("nrz,npqzc->npqrc", cmat, t2)

    out = jax.lax.map(
        do_chunk,
        (starts_p.reshape(num_chunks, chunk, s_y, s_x),
         wy_p.reshape(num_chunks, chunk, *wy.shape[1:]),
         wx_p.reshape(num_chunks, chunk, *wxm.shape[1:]),
         wz_p.reshape(num_chunks, chunk, *wz.shape[1:])),
    )
    out = out.reshape(num_chunks * chunk, *p_sizes, c)[:n]
    return out.astype(flat_values.dtype)


@functools.partial(
    jax.jit, static_argnames=("pool_size", "slab", "interpret")
)
def pyramid_roi_align_pallas(boxes, image_meta, feature_maps, pool_size,
                             slab=None, interpret: bool = False):
    """Pallas-kernel pyramid ROIAlign (inference hot path).

    Same semantics as pyramid_roi_align(method="trilinear"); one strided DMA
    per ROI instead of XLA's serialized z-run gather. See
    m3d/ops/pallas_roialign.py. Feature gradients are NOT defined here — use
    the XLA path for training.
    """
    from m3d.ops.pallas_roialign import pallas_pyramid_roi_align

    # Mosaic (Jan-2026 libtpu) rejects the kernels' lane-collapsing
    # reshapes when the channel chunk is a partial lane tile — ck must be a
    # full 128. Narrower pyramids take the XLA gather path.
    if feature_maps[0].shape[-1] % 128 != 0:
        return pyramid_roi_align(boxes, image_meta, feature_maps, pool_size)

    if isinstance(pool_size, int):
        pool_size = (pool_size,) * 3
    p = int(pool_size[0])

    meta = parse_image_meta(image_meta)
    image_shape = meta["image_shape"]
    boxes = jax.lax.stop_gradient(jnp.asarray(boxes, jnp.float32))
    bsz, n = boxes.shape[:2]
    num_levels = len(feature_maps)

    # Same box sanitation as the XLA path.
    d_img = jnp.maximum(image_shape[:, 2:3], 1.0)
    y1 = jnp.clip(boxes[..., 0], 0.0, 1.0)
    x1 = jnp.clip(boxes[..., 1], 0.0, 1.0)
    z1 = jnp.clip(boxes[..., 2], 0.0, 1.0)
    y2 = jnp.maximum(jnp.clip(boxes[..., 3], 0.0, 1.0), y1 + 1e-6)
    x2 = jnp.maximum(jnp.clip(boxes[..., 4], 0.0, 1.0), x1 + 1e-6)
    z2 = jnp.maximum(jnp.clip(boxes[..., 5], 0.0, 1.0), z1 + 1.0 / d_img)
    boxes = jnp.stack([y1, x1, z1, y2, x2, z2], axis=-1)

    levels = compute_roi_levels(
        boxes,
        (image_shape[:, 0:1], image_shape[:, 1:2], image_shape[:, 2:3]),
        num_levels,
    )

    # --- VMEM-resident fast path ------------------------------------------
    # When one image's pyramid (per 128-channel chunk) fits in VMEM, the
    # kernel keeps the whole pyramid on-chip per (chunk, image) stripe and
    # contracts each ROI against the FULL level with dense separable weight
    # matrices: no per-ROI DMA, no slab origins/tiers, exact for any ROI
    # extent, ~10x less overhead than the slab-DMA path. (128^3 isotropic
    # and 256x256x12 anisotropic configs both fit; bigger pyramids fall
    # through to the slab-DMA path below.)
    c_feat = feature_maps[0].shape[-1]
    ck = min(c_feat, 128)
    itemsize = jnp.dtype(feature_maps[0].dtype).itemsize
    vm_bytes = sum(
        int(np.prod(fm.shape[1:4])) * ck * itemsize for fm in feature_maps
    )
    if vm_bytes <= 12 * 1024 * 1024 and slab is None:
        from m3d.ops.pallas_roialign import pallas_pyramid_roi_align_vmem

        # DMA slices must be whole sublane tiles: 2-byte dtypes pack two
        # depth rows per sublane, so pad odd/1-deep levels (weights are
        # zero beyond the true extent, so padding never leaks).
        d_req = {1: 4, 2: 2}.get(itemsize, 1)
        fms = [
            jnp.pad(fm, [(0, 0)] * 3 + [(0, (-fm.shape[3]) % d_req), (0, 0)])
            if fm.shape[3] % d_req else fm
            for fm in feature_maps
        ]
        dims = jnp.asarray([fm.shape[1:4] for fm in feature_maps], jnp.int32)
        # R-batching: stage-1 contracts R ROIs per grid step in one MXU
        # call; its [R*p, Wmax*Dmax*ck] intermediate must coexist with the
        # resident pyramid in VMEM.
        wd_max = (max(fm.shape[2] for fm in fms)
                  * max(fm.shape[3] for fm in fms))
        for r_batch in (_VMEM_R_CAP, 8, 4, 2, 1):
            if r_batch > _VMEM_R_CAP:
                continue
            t1_bytes = r_batch * p * wd_max * ck * itemsize
            if vm_bytes + 2 * t1_bytes <= 24 * 1024 * 1024:
                break
        n_pad = (-n) % r_batch
        if n_pad:
            boxes = jnp.concatenate(
                [boxes, jnp.zeros((bsz, n_pad, 6), boxes.dtype)], axis=1)
            levels = jnp.concatenate(
                [levels, jnp.zeros((bsz, n_pad), levels.dtype)], axis=1)
        n_tot = n + n_pad
        boxes_f = boxes.reshape(bsz * n_tot, 6)
        levels_f = levels.reshape(bsz * n_tot)
        rd = dims[levels_f]
        hy = rd[:, 0].astype(jnp.float32)
        wx_d = rd[:, 1].astype(jnp.float32)
        dz = rd[:, 2].astype(jnp.float32)
        pos_y = _axis_positions(boxes_f[:, 0], boxes_f[:, 3], hy, p)
        pos_x = _axis_positions(boxes_f[:, 1], boxes_f[:, 4], wx_d, p)
        pos_z = _axis_positions(boxes_f[:, 2], boxes_f[:, 5], dz, p)
        h_max = max(fm.shape[1] for fm in fms)
        w_max = max(fm.shape[2] for fm in fms)
        d_max = max(fm.shape[3] for fm in fms)
        # origin pinned to 0 (origin_dim == slab) -> dense full-extent
        # weights, zero beyond each ROI's level extent.
        _, wy = _axis_slab_weights(pos_y, hy, h_max,
                                   origin_dim=jnp.full_like(hy, h_max))
        _, wx = _axis_slab_weights(pos_x, wx_d, w_max,
                                   origin_dim=jnp.full_like(wx_d, w_max))
        _, wz = _axis_slab_weights(pos_z, dz, d_max,
                                   origin_dim=jnp.full_like(dz, d_max))
        out = pallas_pyramid_roi_align_vmem(
            levels_f, wy, wx, wz, fms, p, n_tot,
            r_batch=r_batch, interpret=interpret,
        )
        out = out.reshape(bsz, n_tot, p, p, p, -1)[:, :n]
        # Features' dtype (bf16 on TPU) — the heads cast to their compute
        # dtype anyway; an f32 round-trip here would double HBM traffic.
        return jnp.where(jnp.isfinite(out), out, jnp.zeros((), out.dtype))

    # Per-axis slab extents from the actual level dims (exact coverage).
    if slab is None:
        slab = slab_sizes(feature_maps)
    elif isinstance(slab, int):
        slab = (slab,) * 3
    s_y, s_x, slab_z = (int(v) for v in slab)
    # z slabs must start at sublane-tile boundaries (8); when the slab can't
    # cover the deepest level outright, enlarge it so 8-aligned origins
    # still cover any in-slab span.
    z_align = 8
    max_d = max(fm.shape[3] for fm in feature_maps)
    if slab_z < max_d:
        slab_z += z_align
    slab_z = slab_z + (-slab_z) % z_align

    # --- Span-routed slab tiers -------------------------------------------
    # The final tier (s_y, s_x, slab_z) covers any ROI exactly but moves a
    # full slab per ROI — 10-30x more voxels than a typical ROI's sample
    # span needs. Most ROIs sit at their proper FPN level spanning ~4-16
    # cells, so they are routed to geometrically smaller slab tiers (8x/64x
    # less DMA). ROIs are sorted by tier; each tier runs the kernel over a
    # contiguous (offset, count) range of the sorted list (inactive steps
    # skip DMA+compute), and results are recombined by tier mask + unsort.
    tiers = []
    for ty, tx, tz in ((8, 8, 16), (16, 16, 24)):
        if ty < s_y or tx < s_x or tz < slab_z:
            tiers.append((min(ty, s_y), min(tx, s_x), min(tz, slab_z)))
    tiers.append((s_y, s_x, slab_z))

    # Pad every level to >= the largest slab size per axis (weights use
    # unpadded dims, so padding never leaks into outputs).
    dims = jnp.asarray([fm.shape[1:4] for fm in feature_maps], jnp.int32)
    padded = []
    for fm in feature_maps:
        _, hl, wl, dl, _ = fm.shape
        dz_pad = max(0, slab_z - dl) + (-max(dl, slab_z)) % z_align
        pads = [(0, 0), (0, max(0, s_y - hl)), (0, max(0, s_x - wl)),
                (0, dz_pad), (0, 0)]
        padded.append(jnp.pad(fm, pads) if any(pe for _, pe in pads) else fm)
    padded_dims = jnp.asarray([fm.shape[1:4] for fm in padded], jnp.int32)

    boxes_f = boxes.reshape(bsz * n, 6)
    levels_f = levels.reshape(bsz * n)
    batch_f = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), n)
    roi_dims = dims[levels_f]

    def axis_pos(bf, lf):
        rd = dims[lf]
        hy = rd[:, 0].astype(jnp.float32)
        wx_d = rd[:, 1].astype(jnp.float32)
        dz = rd[:, 2].astype(jnp.float32)
        return (
            _axis_positions(bf[:, 0], bf[:, 3], hy, p),
            _axis_positions(bf[:, 1], bf[:, 4], wx_d, p),
            _axis_positions(bf[:, 2], bf[:, 5], dz, p),
        ), (hy, wx_d, dz)

    (pos_y, pos_x, pos_z), (hy, wx_d, dz) = axis_pos(boxes_f, levels_f)

    def cells_needed(pos, dim):
        pc = jnp.clip(pos, 0.0, dim[:, None] - 1.0)
        return (jnp.floor(jnp.max(pc, 1)) - jnp.floor(jnp.min(pc, 1))
                ).astype(jnp.int32) + 2

    need_y = cells_needed(pos_y, hy)
    need_x = cells_needed(pos_x, wx_d)
    # z origins are rounded down to 8-aligned starts: up to 7 cells slack.
    need_z = cells_needed(pos_z, dz) + (z_align - 1)

    tier_id = jnp.full((bsz * n,), len(tiers) - 1, jnp.int32)
    for t in range(len(tiers) - 2, -1, -1):
        ty, tx, tz = tiers[t]
        fits = (need_y <= ty) & (need_x <= tx) & (need_z <= tz)
        tier_id = jnp.where(fits, t, tier_id)

    order = jnp.argsort(tier_id, stable=True)
    inv_order = jnp.argsort(order, stable=True)
    tier_sorted = tier_id[order]
    boxes_s = boxes_f[order]
    levels_s = levels_f[order]
    batch_s = batch_f[order]
    counts = jnp.asarray(
        [jnp.sum(tier_id == t) for t in range(len(tiers))], jnp.int32)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])

    (pos_ys, pos_xs, pos_zs), (hys, wxs, dzs) = axis_pos(boxes_s, levels_s)
    roi_pdims = padded_dims[levels_s]

    outs = []
    itemsize = jnp.dtype(feature_maps[0].dtype).itemsize
    for t, (ty, tx, tz) in enumerate(tiers):
        oy, wy = _axis_slab_weights(pos_ys, hys, ty,
                                    origin_dim=roi_pdims[:, 0])
        ox, wx = _axis_slab_weights(pos_xs, wxs, tx,
                                    origin_dim=roi_pdims[:, 1])
        oz, wz = _axis_slab_weights(pos_zs, dzs, tz, align=z_align,
                                    origin_dim=roi_pdims[:, 2])
        origins = jnp.stack([oy, ox, oz], axis=1)
        # ROIs per grid step: as many slabs as fit a ~12MB double buffer.
        slab_bytes = ty * tx * tz * min(c_feat, 128) * itemsize
        r_b = max(1, min(8, (12 * 1024 * 1024) // (2 * slab_bytes)))
        outs.append(pallas_pyramid_roi_align(
            levels_s, batch_s, origins, wy, wx, wz, padded, p,
            slab=(ty, tx, tz), interpret=interpret,
            bounds=jnp.stack([offsets[t], counts[t]]), r_batch=r_b,
        ))

    sel = tier_sorted[:, None, None, None, None]
    out = outs[-1]
    for t in range(len(tiers) - 2, -1, -1):
        out = jnp.where(sel == t, outs[t], out)
    out = out[inv_order].reshape(bsz, n, p, p, p, -1)
    return jnp.where(jnp.isfinite(out), out, jnp.zeros((), out.dtype))


@functools.partial(jax.jit, static_argnames=(
    "pool_size", "interpret", "r_batch", "group", "mode", "fc_slab_cap",
    "kernel"))
def pyramid_roi_align_fc(boxes, image_meta, feature_maps, pool_size,
                         fc_kernel, interpret: bool = False,
                         r_batch: int = 8, group: int = 128,
                         mode: str = "full", fc_slab_cap=(16, 16, 24),
                         kernel: str = "separable"):
    """Pyramid ROIAlign fused with the pool-cube FC conv: [B, N, F] f32.

    Semantically identical to
    ``conv3d_fc(pyramid_roi_align(...), fc_kernel)`` (the classifier head's
    first layer, reference core/models.py:5697-5709) but the pooled
    [B, N, p^3, C] tensor never touches HBM. ROIs whose sample span fits a
    (16, 16, 24) level slab (100% of the classifier workload at 128^3: all
    ROIs route to P2 with spans <= 13 cells) run in the fused pallas
    kernel; the rest fall back to the tiered slab kernel + XLA contraction
    and are combined by mask. Inference-only (no gradients); bias not
    applied.

    STATUS — correct but NOT dispatched. v5e measurements at the 128^3 B=4
    classifier workload (scripts/bench_roialign_fc.py): unfused
    gather+conv3d_fc in one jit = 36.6 ms (of which ~11 ms is
    materializing the pooled tensor); this fused path's best = 40.1 ms
    (r_batch=8, (12,12,24) slab cap, z-leading ring). Iteration history:
    48.2 ms first working version (r_batch=4); 52.2 ms with middle-dim
    dot_general instead of explicit transposes (Mosaic's implicit
    relayouts are slower); 40.1 ms after the z-leading ring made the FC
    reads contiguous, dropping the in-kernel FC from ~11 ms to ~2 ms
    (mode=nofc 41.9 vs full 44.2 on the same config). The isolation sweep
    pins the slab-DMA + grid floor at 11.8 ms — the remaining gap is
    entirely the per-ROI separable chain (~26 ms: three small-K MXU
    matmuls with VMEM transposes between). The final idea was also tried
    and measured NEGATIVE: a block-diagonal R-batched stage-1 (one
    [r_b*p, r_b*Sy] x [r_b*Sy, Sx*SZ*ck] matmul per step with
    host-precomputed zero off-diagonal weights) gives 42.3 ms on the best
    config vs 40.1 per-ROI — the r_b-fold FLOP inflation of the block
    structure costs more than the per-matmul overhead it amortizes. The
    kernel family is exhausted on this backend; the unfused gather+FC
    path remains the production dispatch.
    """
    from m3d.ops.pallas_roialign import (pallas_pyramid_roi_align,
                                         pallas_pyramid_roi_align_fc)

    p = int(pool_size) if isinstance(pool_size, int) else int(pool_size[0])
    f_out = fc_kernel.shape[-1]

    meta = parse_image_meta(image_meta)
    image_shape = meta["image_shape"]
    boxes = jax.lax.stop_gradient(jnp.asarray(boxes, jnp.float32))
    bsz, n = boxes.shape[:2]
    num_levels = len(feature_maps)

    d_img = jnp.maximum(image_shape[:, 2:3], 1.0)
    y1 = jnp.clip(boxes[..., 0], 0.0, 1.0)
    x1 = jnp.clip(boxes[..., 1], 0.0, 1.0)
    z1 = jnp.clip(boxes[..., 2], 0.0, 1.0)
    y2 = jnp.maximum(jnp.clip(boxes[..., 3], 0.0, 1.0), y1 + 1e-6)
    x2 = jnp.maximum(jnp.clip(boxes[..., 4], 0.0, 1.0), x1 + 1e-6)
    z2 = jnp.maximum(jnp.clip(boxes[..., 5], 0.0, 1.0), z1 + 1.0 / d_img)
    boxes = jnp.stack([y1, x1, z1, y2, x2, z2], axis=-1)

    levels = compute_roi_levels(
        boxes,
        (image_shape[:, 0:1], image_shape[:, 1:2], image_shape[:, 2:3]),
        num_levels,
    )

    boxes_f = boxes.reshape(bsz * n, 6)
    levels_f = levels.reshape(bsz * n)
    batch_f = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), n)
    out = _roi_align_fc_flat_core(
        boxes_f, levels_f, batch_f, feature_maps, p, fc_kernel, f_out,
        interpret, r_batch, group, mode, fc_slab_cap, kernel)
    return out.reshape(bsz, n, f_out)


@functools.partial(jax.jit, static_argnames=(
    "pool_size", "interpret", "r_batch", "group", "mode", "fc_slab_cap",
    "kernel"))
def pyramid_roi_align_fc_flat(boxes, batch_idx, image_meta, feature_maps,
                              pool_size, fc_kernel,
                              interpret: bool = False,
                              r_batch: int = 16, group: int = 128,
                              mode: str = "full",
                              fc_slab_cap=(16, 16, 24),
                              kernel: str = "kron"):
    """Fused ROIAlign+FC over a FLAT ROI list ([N, 6] + [N] image indices)
    — the layout the adaptive/monolithic classifier stages use
    (MaskRCNN.classify_rois_flat). Returns [N, F] f32; bias not applied.
    Measured r5 (128^3 B=4, 2000 ROIs): kron r_batch=16 = 26.8 ms vs
    36.5 ms for gather + conv3d_fc (scripts/bench_roialign_fc.py)."""
    if isinstance(pool_size, (tuple, list)):
        assert len(set(pool_size)) == 1, pool_size
        pool_size = pool_size[0]
    p = int(pool_size)
    batch_idx = jnp.asarray(batch_idx, jnp.int32)
    boxes_f, levels_f = _sanitize_flat_rois(
        boxes, batch_idx, image_meta, len(feature_maps))
    return _roi_align_fc_flat_core(
        boxes_f, levels_f, batch_idx, feature_maps, p, fc_kernel,
        fc_kernel.shape[-1], interpret, r_batch, group, mode, fc_slab_cap,
        kernel)


def _roi_align_fc_flat_core(boxes_f, levels_f, batch_f, feature_maps, p,
                            fc_kernel, f_out, interpret, r_batch, group,
                            mode, fc_slab_cap, kernel):
    """Shared fused-ROIAlign+FC body over flat sanitized ROIs: fused-kernel
    tier + slab-kernel fallback, combined by fit mask. Returns [N, F]."""
    from m3d.ops.pallas_roialign import (pallas_pyramid_roi_align,
                                         pallas_pyramid_roi_align_fc)

    n_flat = boxes_f.shape[0]

    # Slab geometry (mirrors pyramid_roi_align_pallas).
    s_y, s_x, slab_z = slab_sizes(feature_maps)
    z_align = 8
    max_d = max(fm.shape[3] for fm in feature_maps)
    if slab_z < max_d:
        slab_z += z_align
    slab_z = slab_z + (-slab_z) % z_align
    fc_slab = (min(fc_slab_cap[0], s_y), min(fc_slab_cap[1], s_x),
               min(fc_slab_cap[2], slab_z))

    dims = jnp.asarray([fm.shape[1:4] for fm in feature_maps], jnp.int32)
    padded = []
    for fm in feature_maps:
        _, hl, wl, dl, _ = fm.shape
        dz_pad = max(0, slab_z - dl) + (-max(dl, slab_z)) % z_align
        pads = [(0, 0), (0, max(0, s_y - hl)), (0, max(0, s_x - wl)),
                (0, dz_pad), (0, 0)]
        padded.append(jnp.pad(fm, pads) if any(pe for _, pe in pads) else fm)
    padded_dims = jnp.asarray([fm.shape[1:4] for fm in padded], jnp.int32)

    def axis_pos(bf, lf):
        rd = dims[lf]
        hy = rd[:, 0].astype(jnp.float32)
        wx_d = rd[:, 1].astype(jnp.float32)
        dz = rd[:, 2].astype(jnp.float32)
        return (
            _axis_positions(bf[:, 0], bf[:, 3], hy, p),
            _axis_positions(bf[:, 1], bf[:, 4], wx_d, p),
            _axis_positions(bf[:, 2], bf[:, 5], dz, p),
        ), (hy, wx_d, dz)

    (pos_y, pos_x, pos_z), (hy, wx_d, dz) = axis_pos(boxes_f, levels_f)

    def cells_needed(pos, dim):
        pc = jnp.clip(pos, 0.0, dim[:, None] - 1.0)
        return (jnp.floor(jnp.max(pc, 1)) - jnp.floor(jnp.min(pc, 1))
                ).astype(jnp.int32) + 2

    fits = ((cells_needed(pos_y, hy) <= fc_slab[0])
            & (cells_needed(pos_x, wx_d) <= fc_slab[1])
            & (cells_needed(pos_z, dz) + (z_align - 1) <= fc_slab[2]))

    # fits-first stable sort; [0, n_fit) runs fused, the rest falls back.
    order = jnp.argsort(jnp.logical_not(fits), stable=True)
    inv_order = jnp.argsort(order, stable=True)
    n_fit = jnp.sum(fits).astype(jnp.int32)
    boxes_s = boxes_f[order]
    levels_s = levels_f[order]
    batch_s = batch_f[order]

    (pos_ys, pos_xs, pos_zs), (hys, wxs, dzs) = axis_pos(boxes_s, levels_s)
    roi_pdims = padded_dims[levels_s]

    def tier_weights(ty, tx, tz):
        oy, wy = _axis_slab_weights(pos_ys, hys, ty,
                                    origin_dim=roi_pdims[:, 0])
        ox, wx = _axis_slab_weights(pos_xs, wxs, tx,
                                    origin_dim=roi_pdims[:, 1])
        oz, wz = _axis_slab_weights(pos_zs, dzs, tz, align=z_align,
                                    origin_dim=roi_pdims[:, 2])
        return jnp.stack([oy, ox, oz], axis=1), wy, wx, wz

    origins, wy, wx, wz = tier_weights(*fc_slab)
    if kernel == "kron":
        from m3d.ops.pallas_roialign import pallas_pyramid_roi_align_fc_kron

        out_fc = pallas_pyramid_roi_align_fc_kron(
            levels_s, batch_s, origins, wy, wx, wz, padded,
            fc_kernel.astype(padded[0].dtype), p, slab=fc_slab,
            bounds=jnp.stack([jnp.int32(0), n_fit]), interpret=interpret,
            r_batch=r_batch, group=group,
        )                                               # [bsz*n, F] f32
    else:
        out_fc = pallas_pyramid_roi_align_fc(
            levels_s, batch_s, origins, wy, wx, wz, padded,
            fc_kernel.astype(padded[0].dtype), p, slab=fc_slab,
            bounds=jnp.stack([jnp.int32(0), n_fit]), interpret=interpret,
            r_batch=r_batch, group=group, mode=mode,
        )                                               # [bsz*n, F] f32

    # Fallback: exact-coverage slab kernel + XLA contraction for the rest.
    from m3d.ops.conv3d import conv3d_fc

    itemsize = jnp.dtype(padded[0].dtype).itemsize
    slab_bytes = s_y * s_x * slab_z * min(
        feature_maps[0].shape[-1], 128) * itemsize
    r_b = max(1, min(8, (12 * 1024 * 1024) // (2 * slab_bytes)))
    origins2, wy2, wx2, wz2 = tier_weights(s_y, s_x, slab_z)
    pooled = pallas_pyramid_roi_align(
        levels_s, batch_s, origins2, wy2, wx2, wz2, padded, p,
        slab=(s_y, s_x, slab_z), interpret=interpret,
        bounds=jnp.stack([n_fit, jnp.int32(n_flat) - n_fit]), r_batch=r_b,
    )                                                   # [bsz*n, p,p,p, C]
    out_fb = conv3d_fc(
        pooled, fc_kernel.astype(pooled.dtype),
        preferred_element_type=jnp.float32,
    ).reshape(n_flat, f_out)

    idx = jnp.arange(n_flat, dtype=jnp.int32)
    out = jnp.where((idx < n_fit)[:, None], out_fc, out_fb)
    out = out[inv_order]
    return jnp.where(jnp.isfinite(out), out, 0.0)


# ROIs per grid step in the VMEM-resident pallas kernel (see
# m3d/ops/pallas_roialign.py). v5e measurement (scripts/bench_roialign_vmem
# .py, 128^3 B=4 bench config): R=8 cuts the classifier-stage vmem time
# 60.9 -> 45.4 ms (amortizing the per-step grid overhead) but still loses
# to the 24.6 ms XLA row-gather the auto-dispatch already picks there; at
# the mask stage (50 ROIs, 14^3) the VMEM budget forces R back down and
# R=8 measures 15.7 ms vs 14.5 ms at R=1. No production workload wins, so
# the cap stays 1; the kernel itself supports R>1 (validated on-chip).
_VMEM_R_CAP = 1


def fused_classifier_ok(pool_size, feature_maps) -> bool:
    """True when the fused kron ROIAlign+FC kernel can serve the classifier
    stage: TPU backend, portable mode off, cubic pool, 128-lane channels.
    (Measured r5: 26.8 ms vs 36.5 ms gather+conv3d_fc at the 128^3 B=4
    classifier workload — scripts/bench_roialign_fc.py.)"""
    return (jax.default_backend() == "tpu" and not _PORTABLE_ONLY
            and isinstance(pool_size, int)
            and feature_maps[0].shape[-1] % 128 == 0)


def pyramid_roi_align_auto(boxes, image_meta, feature_maps, pool_size,
                           method: str = "trilinear"):
    """Backend/workload dispatch (all shapes static at trace time).

    Two fast formulations, with opposite scaling (v5e measurements at
    C=256):
      - XLA 8-corner row gather: ~226M gathered rows/s -> cost scales with
        N_rois * pool^3 * 8. Wins for many ROIs with small pools (the
        classifier stage: 2000 x 7^3 -> ~24ms). Differentiable.
      - Pallas VMEM-resident kernel: ~10-15us per (ROI, 128-channel chunk)
        -> cost scales with N_rois * ceil(C/128), independent of pool
        size, but needs one image's pyramid chunk to fit VMEM. Wins for
        few ROIs with big pools (the mask stage: 200 x 14^3 -> ~5ms vs
        ~19ms gather). Inference-only (no gradients).
    """
    # The pallas entry points only take a scalar (cubic) pool size and full
    # 128-lane channel chunks; tuple pool sizes / narrow pyramids stay on
    # the gather path.
    if (method == "trilinear" and jax.default_backend() == "tpu"
            and not _PORTABLE_ONLY
            and isinstance(pool_size, int)
            and feature_maps[0].shape[-1] % 128 == 0):
        bsz, n = boxes.shape[:2]
        p3 = pool_size ** 3
        c = feature_maps[0].shape[-1]
        ck = min(c, 128)
        itemsize = jnp.dtype(feature_maps[0].dtype).itemsize
        vm_bytes = sum(
            int(np.prod(fm.shape[1:4])) * ck * itemsize
            for fm in feature_maps
        )
        cost_gather = bsz * n * p3 * 8 / 226e6
        cost_vmem = bsz * n * (c // ck) * 12e-6
        if vm_bytes <= 12 * 1024 * 1024 and cost_vmem < cost_gather:
            return pyramid_roi_align_pallas(boxes, image_meta, feature_maps,
                                            pool_size)
    return pyramid_roi_align(boxes, image_meta, feature_maps, pool_size,
                             method=method)


@functools.partial(jax.jit, static_argnames=("pool_size", "method", "slab"))
def pyramid_roi_align(boxes, image_meta, feature_maps, pool_size,
                      method: str = "trilinear", slab=None):
    """ROIAlign over an FPN pyramid with per-ROI level routing.

    Args:
      boxes: [B, N, 6] normalized ROIs (possibly zero-padded).
      image_meta: [B, META] (for image_shape; reference reads D for the z
        minimum and the level formula, core/models.py:627-649).
      feature_maps: list of 4 arrays [B, H_l, W_l, D_l, C] (P2..P5).
      pool_size: static (p, p, p) or int.

    Returns: [B, N, p, p, p, C].
    """
    if isinstance(pool_size, int):
        pool_size = (pool_size,) * 3
    pool_size = tuple(int(s) for s in pool_size)

    meta = parse_image_meta(image_meta)
    image_shape = meta["image_shape"]  # [B, 4]
    boxes = jax.lax.stop_gradient(jnp.asarray(boxes, jnp.float32))

    bsz = boxes.shape[0]
    num_levels = len(feature_maps)
    c = feature_maps[0].shape[-1]

    # Sanitize boxes: clip to [0,1], enforce min extents (z min = 1/D).
    d_img = jnp.maximum(image_shape[:, 2:3], 1.0)  # [B,1]
    y1 = jnp.clip(boxes[..., 0], 0.0, 1.0)
    x1 = jnp.clip(boxes[..., 1], 0.0, 1.0)
    z1 = jnp.clip(boxes[..., 2], 0.0, 1.0)
    y2 = jnp.maximum(jnp.clip(boxes[..., 3], 0.0, 1.0), y1 + 1e-6)
    x2 = jnp.maximum(jnp.clip(boxes[..., 4], 0.0, 1.0), x1 + 1e-6)
    z2 = jnp.maximum(jnp.clip(boxes[..., 5], 0.0, 1.0), z1 + 1.0 / d_img)
    boxes = jnp.stack([y1, x1, z1, y2, x2, z2], axis=-1)

    # Per-ROI level (vectorized over batch via broadcasting of image shape).
    levels = compute_roi_levels(
        boxes,
        (image_shape[:, 0:1], image_shape[:, 1:2], image_shape[:, 2:3]),
        num_levels,
    )  # [B, N]

    # Flatten the pyramid into one [B, T, C] buffer; per-level dim/offset LUTs.
    level_dims = []
    level_offsets = []
    offset = 0
    flat_parts = []
    for fm in feature_maps:
        _, hl, wl, dl, _ = fm.shape
        level_dims.append((hl, wl, dl))
        level_offsets.append(offset)
        offset += hl * wl * dl
        flat_parts.append(fm.reshape(bsz, hl * wl * dl, c))
    total = offset
    flat = jnp.concatenate(flat_parts, axis=1).reshape(bsz * total, c)

    dims_lut = jnp.asarray(level_dims, jnp.int32)          # [L, 3]
    off_lut = jnp.asarray(level_offsets, jnp.int32)        # [L]

    n = boxes.shape[1]
    boxes_f = boxes.reshape(bsz * n, 6)
    levels_f = levels.reshape(bsz * n)
    batch_f = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), n)

    roi_dims = dims_lut[levels_f]                          # [BN, 3]
    hy = roi_dims[:, 0].astype(jnp.float32)
    wx = roi_dims[:, 1].astype(jnp.float32)
    dz = roi_dims[:, 2].astype(jnp.float32)
    base = batch_f * total + off_lut[levels_f]

    pos_y = _axis_positions(boxes_f[:, 0], boxes_f[:, 3], hy, pool_size[0])
    pos_x = _axis_positions(boxes_f[:, 1], boxes_f[:, 4], wx, pool_size[1])
    pos_z = _axis_positions(boxes_f[:, 2], boxes_f[:, 5], dz, pool_size[2])

    if method == "trilinear" and slab is not None:
        # Explicit slab request: the slab-matmul formulation (kept for
        # benchmarking; the z-pair gather below beats it on TPU).
        out = _slab_interp(
            flat, base,
            dims=(hy, wx, dz),
            strides=(roi_dims[:, 1] * roi_dims[:, 2], roi_dims[:, 2],
                     jnp.ones_like(roi_dims[:, 2])),
            positions=(pos_y, pos_x, pos_z),
            slab=slab,
        )
    else:
        out = _gather_interp(
            flat, base,
            dims=(hy, wx, dz),
            strides=(roi_dims[:, 1] * roi_dims[:, 2], roi_dims[:, 2],
                     jnp.ones_like(roi_dims[:, 2])),
            positions=(pos_y, pos_x, pos_z),
            method=method,
        )
    out = out.reshape(bsz, n, *pool_size, c)
    # NaN scrub (reference: core/models.py:683).
    return jnp.where(jnp.isfinite(out), out, 0.0)


_PORTABLE_ONLY = False


@contextlib.contextmanager
def portable_lowering():
    """Force the portable XLA gather formulation (no Pallas) for anything
    traced inside. Used by multi-platform serving exports (m3d/serve.py):
    a pallas_call baked at trace time on a TPU host has no cpu lowering, so
    jax.export with platforms=("cpu","tpu") would fail."""
    global _PORTABLE_ONLY
    prev = _PORTABLE_ONLY
    _PORTABLE_ONLY = True
    try:
        yield
    finally:
        _PORTABLE_ONLY = prev


def _sanitize_flat_rois(boxes, batch_idx, image_meta, num_levels):
    """Shared prep for the flat-ROI-list entries: stop-gradient + the same
    box sanitation as pyramid_roi_align (per-ROI source-image dims from
    image_meta) + pyramid level routing. Returns (boxes, levels)."""
    meta = parse_image_meta(image_meta)
    image_shape = meta["image_shape"]                    # [B, >=3]
    boxes = jax.lax.stop_gradient(jnp.asarray(boxes, jnp.float32))
    batch_idx = jnp.asarray(batch_idx, jnp.int32)
    shp = image_shape[batch_idx]                         # [N, >=3]
    d_img = jnp.maximum(shp[:, 2], 1.0)
    y1 = jnp.clip(boxes[:, 0], 0.0, 1.0)
    x1 = jnp.clip(boxes[:, 1], 0.0, 1.0)
    z1 = jnp.clip(boxes[:, 2], 0.0, 1.0)
    y2 = jnp.maximum(jnp.clip(boxes[:, 3], 0.0, 1.0), y1 + 1e-6)
    x2 = jnp.maximum(jnp.clip(boxes[:, 4], 0.0, 1.0), x1 + 1e-6)
    z2 = jnp.maximum(jnp.clip(boxes[:, 5], 0.0, 1.0), z1 + 1.0 / d_img)
    boxes = jnp.stack([y1, x1, z1, y2, x2, z2], axis=-1)
    levels = compute_roi_levels(
        boxes, (shp[:, 0], shp[:, 1], shp[:, 2]), num_levels)  # [N]
    return boxes, levels


def pyramid_roi_align_flat(boxes, batch_idx, image_meta, feature_maps,
                           pool_size, method: str = "trilinear"):
    """Pyramid ROIAlign over a FLAT ROI list via the XLA gather path.

    Computes every row of ``boxes`` ([N, 6], with [N] int32 source-image
    indices) — no batch/slot structure and no validity gating; callers that
    want gating either chunk this call under ``lax.cond``
    (m3d/models/inference.py compacted classifier stage) or use
    ``pyramid_roi_align_compact`` (Pallas kernel skips dead rows).
    Differentiable w.r.t. feature_maps like pyramid_roi_align; boxes are
    stop_gradient-ed (reference core/models.py:660-661).

    Returns [N, p, p, p, C] float32 (NaN-scrubbed, core/models.py:683).
    """
    if isinstance(pool_size, (tuple, list)):
        assert len(set(pool_size)) == 1, pool_size
        pool_size = pool_size[0]
    p = int(pool_size)
    batch_idx = jnp.asarray(batch_idx, jnp.int32)
    boxes, levels = _sanitize_flat_rois(
        boxes, batch_idx, image_meta, len(feature_maps))
    return _gather_flat_sanitized(boxes, levels, batch_idx, feature_maps, p,
                                  method)


def _gather_flat_sanitized(boxes, levels, batch_idx, feature_maps, p: int,
                           method: str):
    """Gather-path body shared by pyramid_roi_align_flat and the compact
    entry's fallback: boxes/levels already sanitized/routed."""
    c = feature_maps[0].shape[-1]
    level_dims = []
    level_offsets = []
    offset = 0
    flat_parts = []
    bsz = feature_maps[0].shape[0]
    for fm in feature_maps:
        _, hl, wl, dl, _ = fm.shape
        level_dims.append((hl, wl, dl))
        level_offsets.append(offset)
        offset += hl * wl * dl
        flat_parts.append(fm.reshape(bsz, hl * wl * dl, c))
    total_cells = offset
    flat = jnp.concatenate(flat_parts, axis=1).reshape(bsz * total_cells, c)

    dims_lut = jnp.asarray(level_dims, jnp.int32)
    off_lut = jnp.asarray(level_offsets, jnp.int32)
    roi_dims = dims_lut[levels]
    hy = roi_dims[:, 0].astype(jnp.float32)
    wx = roi_dims[:, 1].astype(jnp.float32)
    dz = roi_dims[:, 2].astype(jnp.float32)
    base = batch_idx * total_cells + off_lut[levels]

    pos_y = _axis_positions(boxes[:, 0], boxes[:, 3], hy, p)
    pos_x = _axis_positions(boxes[:, 1], boxes[:, 4], wx, p)
    pos_z = _axis_positions(boxes[:, 2], boxes[:, 5], dz, p)
    out = _gather_interp(
        flat, base,
        dims=(hy, wx, dz),
        strides=(roi_dims[:, 1] * roi_dims[:, 2], roi_dims[:, 2],
                 jnp.ones_like(roi_dims[:, 2])),
        positions=(pos_y, pos_x, pos_z),
        method=method,
    )
    return jnp.where(jnp.isfinite(out), out, 0.0)


def pyramid_roi_align_compact(boxes, batch_idx, total, image_meta,
                              feature_maps, pool_size,
                              method: str = "trilinear",
                              interpret: bool = False):
    """Pyramid ROIAlign over a COMPACTED flat ROI list (inference).

    The adaptive mask stage (m3d/models/inference.py) sorts the padded
    detection slots valid-first across the flattened batch x slot axis
    (image-major within the live block — a stable sort of the per-image
    front-compacted validity masks) and runs per-ROI compute only on the
    first ``total`` rows. This entry aligns exactly those rows: on TPU the
    compact Pallas VMEM kernel skips every row at or beyond ``total`` (cost
    is O(total), not O(N)) and writes the pooled features already
    compacted; rows at index >= total return zeros.

    Args:
      boxes: [N, 6] normalized ROIs, image-grouped, live rows first.
      batch_idx: [N] int32 source image per ROI.
      total: [] int32 count of live leading rows (traced value).
      image_meta: [B, META]; feature_maps: 4 x [B, H_l, W_l, D_l, C].
      pool_size: static int (or (p, p, p)).
      interpret: force the Pallas path in interpret mode (tests).

    Returns [N, p, p, p, C] in the features' dtype (Pallas path) or f32
    (gather fallback). Not differentiable (stop_gradient on boxes; the
    reference stops ROIAlign box gradients too, core/models.py:660-661).
    """
    if isinstance(pool_size, (tuple, list)):
        assert len(set(pool_size)) == 1, pool_size
        pool_size = pool_size[0]
    p = int(pool_size)

    batch_idx = jnp.asarray(batch_idx, jnp.int32)
    n = boxes.shape[0]
    c = feature_maps[0].shape[-1]
    sanitized, levels = _sanitize_flat_rois(
        boxes, batch_idx, image_meta, len(feature_maps))

    row_live = jnp.arange(n, dtype=jnp.int32) < jnp.asarray(total, jnp.int32)
    mask5 = row_live[:, None, None, None, None]

    ck = min(c, 128)
    itemsize = jnp.dtype(feature_maps[0].dtype).itemsize
    vm_bytes = sum(
        int(np.prod(fm.shape[1:4])) * ck * itemsize for fm in feature_maps
    )
    use_pallas = (
        method == "trilinear" and c % 128 == 0
        and vm_bytes <= 12 * 1024 * 1024
        and (interpret or jax.default_backend() == "tpu")
        and not _PORTABLE_ONLY
    )
    if use_pallas:
        from m3d.ops.pallas_roialign import (
            pallas_pyramid_roi_align_vmem_compact)

        # Same prep as the VMEM branch of pyramid_roi_align_pallas: pad
        # depths to whole sublane tiles, dense full-extent weights.
        d_req = {1: 4, 2: 2}.get(itemsize, 1)
        fms = [
            jnp.pad(fm, [(0, 0)] * 3 + [(0, (-fm.shape[3]) % d_req), (0, 0)])
            if fm.shape[3] % d_req else fm
            for fm in feature_maps
        ]
        dims = jnp.asarray([fm.shape[1:4] for fm in feature_maps], jnp.int32)
        rd = dims[levels]
        hy = rd[:, 0].astype(jnp.float32)
        wx_d = rd[:, 1].astype(jnp.float32)
        dz = rd[:, 2].astype(jnp.float32)
        pos_y = _axis_positions(sanitized[:, 0], sanitized[:, 3], hy, p)
        pos_x = _axis_positions(sanitized[:, 1], sanitized[:, 4], wx_d, p)
        pos_z = _axis_positions(sanitized[:, 2], sanitized[:, 5], dz, p)
        h_max = max(fm.shape[1] for fm in fms)
        w_max = max(fm.shape[2] for fm in fms)
        d_max = max(fm.shape[3] for fm in fms)
        _, wy = _axis_slab_weights(pos_y, hy, h_max,
                                   origin_dim=jnp.full_like(hy, h_max))
        _, wx = _axis_slab_weights(pos_x, wx_d, w_max,
                                   origin_dim=jnp.full_like(wx_d, w_max))
        _, wz = _axis_slab_weights(pos_z, dz, d_max,
                                   origin_dim=jnp.full_like(dz, d_max))
        out = pallas_pyramid_roi_align_vmem_compact(
            levels, batch_idx, total, wy, wx, wz, fms, p,
            interpret=interpret)
        # Skipped rows hold stale VMEM garbage — mask, plus the NaN scrub.
        return jnp.where(
            jnp.logical_and(jnp.isfinite(out), mask5),
            out, jnp.zeros((), out.dtype))

    # XLA gather fallback (CPU / non-trilinear / narrow channels / pyramids
    # too big for VMEM residency): computes every row, masks the dead ones.
    out = _gather_flat_sanitized(
        sanitized, levels, batch_idx, feature_maps, p, method)
    return jnp.where(mask5, out, 0.0)
