"""Pallas TPU kernel for pyramid ROIAlign-3D.

Replaces the XLA slab-gather path for the inference hot loop. The XLA
formulation (m3d/ops/roialign3d.py:_slab_interp) gathers each ROI's slab as
S*S separate z-runs — XLA lowers that to ~128k serialized small copies
(~300 ms for 500 ROIs). This kernel issues ONE strided DMA per (ROI,
channel-chunk) — the TPU DMA engine handles 4-D strided regions natively —
and contracts the slab with three tiny [p, S] weight matrices on the MXU:

    slab[S,S,SZ,Ck] --Wz--> [p,S,S,Ck] --Wy--> [p,p,S,Ck] --Wx--> [p,p,p,Ck]

VMEM discipline (16 MB budget):
  - channels are processed in 128-lane chunks (grid dim 1), bounding the
    slab block;
  - every intermediate keeps the channel chunk as the LAST (lane) dim — a
    small trailing dim would be padded to 128 lanes (18x blow-up);
  - the MXU consumes the slab in its native dtype (bf16) with f32
    accumulation — no upcast copy of the slab.

z origins must be 8-aligned (sublane tiling) — the caller rounds down and
the z-slab is enlarged by 8 to compensate. Feature levels are pre-padded to
>= the slab extents.

Per-ROI routing scalars (level id, batch id, slab origin) ride the
scalar-prefetch channel so the DMA source is chosen with jax.lax.switch.

Gradients: training uses the XLA path outright (the reference stops box
gradients at ROIAlign anyway, core/models.py:660-661); this kernel serves
inference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(meta_ref,            # scalar-prefetch: [Npad, 5] int32
            bounds_ref,          # scalar-prefetch: [2] int32 (offset, count)
            wy_ref, wx_ref, wz_ref,   # [R, p, S]/[R, p, SZ] f32 blocks
            f2_ref, f3_ref, f4_ref, f5_ref,  # [B, H, W, D, C] (HBM)
            out_ref,             # [R, p, p, p, Ck] (VMEM)
            slab2_ref,           # scratch [2, R, Sy, Sx, SZ, Ck] dbl buffer
            sems):               # DMA semaphores [2, R]
    i = pl.program_id(0)
    j = pl.program_id(1)
    nc = pl.num_programs(1)
    g = i * nc + j

    # Each flat step g = (i, j) handles R consecutive ROIs x one channel
    # chunk; only ROIs in the active range [off, off+cnt) DMA and compute —
    # tier routing (see pyramid_roi_align_pallas) gives each kernel call a
    # contiguous slice of the span-sorted ROI list, so unused capacity
    # costs only grid bookkeeping. Batching R ROIs per step amortizes the
    # per-step block pipeline (weight fetches + out write + grid overhead),
    # the dominant cost once slabs are span-sized.
    off = bounds_ref[0]
    cnt = bounds_ref[1]

    r_b = slab2_ref.shape[1]
    sy = slab2_ref.shape[2]
    sx = slab2_ref.shape[3]
    sz = slab2_ref.shape[4]
    ck = slab2_ref.shape[5]

    # Step-space active range (a step is active if any of its R ROIs is).
    step_lo = off // r_b
    step_hi = (off + cnt + r_b - 1) // r_b
    g_lo = step_lo * nc
    g_hi = step_hi * nc
    active = jnp.logical_and(g >= g_lo,
                             jnp.logical_and(g < g_hi, cnt > 0))

    def roi_active(roi):
        return jnp.logical_and(roi >= off, roi < off + cnt)

    def start_dmas(gg, slot):
        """Kick the R slab DMAs for flat grid step gg into buffer `slot`."""
        ii = gg // nc
        jj = gg - ii * nc
        oc = pl.multiple_of(jj * ck, 128)
        for r in range(r_b):
            roi = ii * r_b + r

            @pl.when(roi_active(roi))
            def _(roi=roi, r=r):
                level = meta_ref[roi, 0]
                b = meta_ref[roi, 1]
                oy = meta_ref[roi, 2]
                ox = meta_ref[roi, 3]
                # Caller 8-aligns z origins (sublane tiling); tell Mosaic.
                oz = pl.multiple_of(meta_ref[roi, 4], 8)
                for lv, feat_ref in enumerate(
                        (f2_ref, f3_ref, f4_ref, f5_ref)):
                    @pl.when(level == lv)
                    def _(feat_ref=feat_ref):
                        pltpu.make_async_copy(
                            feat_ref.at[b, pl.ds(oy, sy), pl.ds(ox, sx),
                                        pl.ds(oz, sz), pl.ds(oc, ck)],
                            slab2_ref.at[slot, r],
                            sems.at[slot, r],
                        ).start()

    slot = jax.lax.rem(g, 2)
    next_slot = jax.lax.rem(g + 1, 2)

    # Warm-up: the first active step starts its own DMAs.
    @pl.when(jnp.logical_and(g == g_lo, cnt > 0))
    def _():
        start_dmas(g, slot)

    # Prefetch the next step's slabs while this step computes. Strictly
    # g+1 > g_lo: step g_lo's own DMAs come from the warm-up branch above —
    # starting them from the (inactive) predecessor as well would increment
    # the semaphores twice for a single wait.
    @pl.when(jnp.logical_and(g + 1 > g_lo, g + 1 < g_hi))
    def _():
        start_dmas(g + 1, next_slot)

    @pl.when(active)
    def _():
        p = out_ref.shape[1]

        def contract_front(w, t, compute_dtype, out_dtype=None):
            """dot(w[p, K], t[K, M]): native-dtype MXU feed, f32
            accumulation, result downcast to the slab dtype (bf16) —
            intermediates at f32 blow the VMEM stack."""
            r = jax.lax.dot_general(
                w.astype(t.dtype), t,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return r.astype(out_dtype or compute_dtype)

        for r in range(r_b):
            roi = i * r_b + r

            @pl.when(roi_active(roi))
            def _(roi=roi, r=r):
                # Wait for this ROI's slab.
                pltpu.make_async_copy(
                    f2_ref.at[0, pl.ds(0, sy), pl.ds(0, sx), pl.ds(0, sz),
                              pl.ds(0, ck)],
                    slab2_ref.at[slot, r],
                    sems.at[slot, r],
                ).wait()

                slab = slab2_ref[slot, r]                  # [Sy, Sx, SZ, Ck]
                cd = slab.dtype
                wy = wy_ref[r]                             # [p, S]
                wx = wx_ref[r]
                wz = wz_ref[r]

                # y first — the slab's leading axis needs NO transpose;
                # each later transpose runs on a tensor already shrunk.
                t1 = contract_front(wy, slab.reshape(sy, sx * sz * ck), cd)
                # x: [y, Sx, SZ*Ck] -> [Sx, y*SZ*Ck] -> [p(x), ...]
                t1 = jnp.transpose(t1.reshape(p, sx, sz * ck),
                                   (1, 0, 2)).reshape(sx, p * sz * ck)
                t2 = contract_front(wx, t1, cd)            # [q(x), y*SZ*Ck]
                # z: [x, y, SZ, Ck] -> [SZ, x*y*Ck] -> [p(z), ...]
                t2 = jnp.transpose(t2.reshape(p, p, sz, ck),
                                   (2, 0, 1, 3)).reshape(sz, p * p * ck)
                t3 = contract_front(wz, t2, cd, jnp.float32)
                # [z, x, y, Ck] -> [y, x, z, Ck] == (p, q, r, Ck)
                out = jnp.transpose(t3.reshape(p, p, p, ck), (2, 1, 0, 3))
                out_ref[r] = out.astype(out_ref.dtype)


def _kernel_vmem(meta_ref,           # scalar-prefetch: [N, 5] int32
                 wy_ref, wx_ref, wz_ref,   # [R, p, Smax] f32 blocks
                 f2_ref, f3_ref, f4_ref, f5_ref,  # [B, H, W, D, C] (HBM)
                 out_ref,            # [R, p, p, p, Ck] (VMEM)
                 s2, s3, s4, s5,     # VMEM scratch: one level x chunk x image
                 sems):              # DMA semaphores [4]
    """VMEM-resident variant: grid (c_chunks, B, n_steps), R ROIs per step.

    At the start of each (chunk, image) stripe the four pyramid levels of
    that image's channel chunk are copied into VMEM once; every ROI then
    contracts the FULL level with dense separable weight matrices on the
    MXU — no per-ROI DMA, no slab origins, exact for any ROI extent. Only
    usable when the per-image per-chunk pyramid fits VMEM (the dispatcher
    checks).

    R-batching: the expensive stage-1 contraction (over the full level
    extent) runs ONCE per step per level as a single [R*p, H] x [H, W*D*Ck]
    matmul — every ROI against every level, with the ROI's true level
    selected by mask at the end. The extra levels cost ~12% FLOPs (the
    finest level dominates 8:1) and buy MXU-shaped matmuls plus Rx fewer
    grid steps; stages 2-3 run on already-contracted [p, ...] tensors.
    Per-ROI weight rows beyond a level's true extent are zero, so the
    cross-level contractions never leak padding.
    """
    j = pl.program_id(0)
    b = pl.program_id(1)
    i = pl.program_id(2)
    n_steps = pl.num_programs(2)
    ck = out_ref.shape[4]
    r_b = out_ref.shape[0]
    p = out_ref.shape[1]

    srefs = (s2, s3, s4, s5)
    frefs = (f2_ref, f3_ref, f4_ref, f5_ref)

    @pl.when(i == 0)
    def _():
        oc = pl.multiple_of(j * ck, 128)
        for lv in range(4):
            h, w, d = frefs[lv].shape[1:4]
            pltpu.make_async_copy(
                frefs[lv].at[b, pl.ds(0, h), pl.ds(0, w), pl.ds(0, d),
                             pl.ds(oc, ck)],
                srefs[lv],
                sems.at[lv],
            ).start()
        for lv in range(4):
            h, w, d = frefs[lv].shape[1:4]
            pltpu.make_async_copy(
                frefs[lv].at[b, pl.ds(0, h), pl.ds(0, w), pl.ds(0, d),
                             pl.ds(0, ck)],
                srefs[lv],
                sems.at[lv],
            ).wait()

    base = (b * n_steps + i) * r_b

    def contract_front(w, t, out_dtype):
        r = jax.lax.dot_general(
            w.astype(t.dtype), t,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return r.astype(out_dtype)

    acc = jnp.zeros((r_b, p, p, p, ck), jnp.float32)
    for lv in range(4):
        sref = srefs[lv]
        h, w, d = sref.shape[0], sref.shape[1], sref.shape[2]
        slab = sref[...]                           # [H, W, D, Ck]
        cd = slab.dtype
        wy = wy_ref[:, :, :h].reshape(r_b * p, h)  # [R*p, H]
        # Stage 1, batched over ROIs: one MXU call for the full-extent axis.
        t1 = contract_front(wy, slab.reshape(h, w * d * ck), cd)
        t1 = t1.reshape(r_b, p, w, d * ck)
        outs = []
        for r in range(r_b):
            wx = wx_ref[r, :, :w]
            wz = wz_ref[r, :, :d]
            t1r = jnp.transpose(t1[r], (1, 0, 2)).reshape(w, p * d * ck)
            t2 = contract_front(wx, t1r, cd)       # [p(x), p(y)*D*Ck]
            t2 = jnp.transpose(t2.reshape(p, p, d, ck), (2, 0, 1, 3)
                               ).reshape(d, p * p * ck)
            t3 = contract_front(wz, t2, jnp.float32)   # [p(z), x*y*Ck]
            # Level-select as a per-ROI SMEM-scalar multiply: Mosaic can't
            # broadcast-reshape a [R] vector to [R,1,1,1,1] (rejected
            # tpu.reshape at R>1), but scalar * array is native.
            sel = (meta_ref[base + r, 0] == lv).astype(jnp.float32)
            outs.append(
                jnp.transpose(t3.reshape(p, p, p, ck), (2, 1, 0, 3)) * sel)
        acc = acc + jnp.stack(outs)                # [R, p, p, p, ck]
    out_ref[...] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("pool_size", "n_per_image", "r_batch", "interpret"),
)
def pallas_pyramid_roi_align_vmem(levels, wy, wx, wz, feature_maps,
                                  pool_size: int, n_per_image: int,
                                  r_batch: int = 1,
                                  interpret: bool = False):
    """VMEM-resident pyramid ROIAlign.

    levels: [N] int32 (N = B * n_per_image, image-major ROI order);
    wy/wx/wz: [N, p, Smax] dense full-extent weights (Smax >= the largest
    level extent on that axis; rows beyond a level's extent must be zero);
    feature_maps: 4 arrays [B, H_l, W_l, D_l, C];
    r_batch: ROIs per grid step (must divide n_per_image) — batches the
    full-extent stage-1 contraction into one MXU call per level.
    Returns [N, p, p, p, C] in the features' dtype.
    """
    n = levels.shape[0]
    p = int(pool_size)
    c = feature_maps[0].shape[-1]
    bsz = feature_maps[0].shape[0]
    assert n == bsz * n_per_image
    r_b = int(r_batch)
    assert n_per_image % r_b == 0, (n_per_image, r_b)
    ck = min(c, 128)
    assert c % ck == 0
    c_chunks = c // ck

    meta = levels[:, None].astype(jnp.int32)

    n_steps = int(n_per_image) // r_b
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c_chunks, bsz, n_steps),
        in_specs=[
            pl.BlockSpec((r_b, p, wy.shape[2]),
                         lambda j, b, i, meta: (b * n_steps + i, 0, 0)),
            pl.BlockSpec((r_b, p, wx.shape[2]),
                         lambda j, b, i, meta: (b * n_steps + i, 0, 0)),
            pl.BlockSpec((r_b, p, wz.shape[2]),
                         lambda j, b, i, meta: (b * n_steps + i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (r_b, p, p, p, ck),
            lambda j, b, i, meta: (b * n_steps + i, 0, 0, 0, j),
        ),
        scratch_shapes=[
            pltpu.VMEM(tuple(fm.shape[1:4]) + (ck,), feature_maps[0].dtype)
            for fm in feature_maps
        ] + [pltpu.SemaphoreType.DMA((4,))],
    )
    return pl.pallas_call(
        _kernel_vmem,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, p, p, p, c),
                                       feature_maps[0].dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(meta, wy, wx, wz, *feature_maps)


@functools.partial(
    jax.jit,
    static_argnames=("pool_size", "slab", "interpret", "r_batch", "ck"),
)
def pallas_pyramid_roi_align(levels, batch_idx, origins, wy, wx, wz,
                             feature_maps, pool_size: int,
                             slab=(16, 16, 24), interpret: bool = False,
                             bounds=None, r_batch: int = 1, ck=None):
    """Low-level entry: all routing/weights precomputed by the caller.

    levels/batch_idx: [N] int32; origins: [N, 3] int32 (into PADDED levels,
    z 8-aligned); wy: [N, p, sy], wx: [N, p, sx], wz: [N, p, sz] float32;
    slab = (sy, sx, sz) static slab extents (sz a multiple of 8);
    feature_maps: 4 arrays [B, H_l, W_l, D_l, C] with H >= sy, W >= sx,
    D >= sz (multiple of 8), and C a multiple of 128 (or < 128);
    bounds: optional [2] int32 (offset, count) — only ROIs in
    [offset, offset+count) are processed (rows outside get garbage output);
    default = all N;
    r_batch: ROIs per grid step (amortizes block-pipeline overhead);
    ck: channel-chunk width (default min(C, 128); 256 halves the grid for
    small slabs at 2x the slab scratch).
    Returns [N, p, p, p, C] in the features' dtype.
    """
    n = levels.shape[0]
    p = int(pool_size)
    c = feature_maps[0].shape[-1]
    s_y, s_x, s_z = (int(v) for v in slab)
    r_b = int(r_batch)
    ck = min(c, 128) if ck is None else int(ck)
    assert c % ck == 0, f"channel count {c} must be a multiple of {ck}"
    c_chunks = c // ck

    meta = jnp.concatenate(
        [levels[:, None], batch_idx[:, None], origins], axis=1
    ).astype(jnp.int32)
    if bounds is None:
        bounds = jnp.asarray([0, n], jnp.int32)
    bounds = jnp.asarray(bounds, jnp.int32)

    # Pad the ROI axis to a multiple of r_batch (padded rows are never
    # active: bounds.count <= n).
    n_pad = (-n) % r_b
    if n_pad:
        meta = jnp.concatenate(
            [meta, jnp.zeros((n_pad, meta.shape[1]), meta.dtype)], 0)
        wy = jnp.concatenate(
            [wy, jnp.zeros((n_pad,) + wy.shape[1:], wy.dtype)], 0)
        wx = jnp.concatenate(
            [wx, jnp.zeros((n_pad,) + wx.shape[1:], wx.dtype)], 0)
        wz = jnp.concatenate(
            [wz, jnp.zeros((n_pad,) + wz.shape[1:], wz.dtype)], 0)
    n_tot = n + n_pad
    n_steps = n_tot // r_b

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps, c_chunks),
        in_specs=[
            pl.BlockSpec((r_b, p, s_y), lambda i, j, meta, bnd: (i, 0, 0)),
            pl.BlockSpec((r_b, p, s_x), lambda i, j, meta, bnd: (i, 0, 0)),
            pl.BlockSpec((r_b, p, s_z), lambda i, j, meta, bnd: (i, 0, 0)),
            # Feature levels stay in HBM; the kernel DMAs slabs on demand.
            # (ANY lets the compiler pull small levels into VMEM, blowing
            # the 16MB budget.)
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (r_b, p, p, p, ck), lambda i, j, meta, bnd: (i, 0, 0, 0, j)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, r_b, s_y, s_x, s_z, ck), feature_maps[0].dtype),
            pltpu.SemaphoreType.DMA((2, r_b)),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tot, p, p, p, c),
                                       feature_maps[0].dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(meta, bounds, wy, wx, wz, *feature_maps)
    return out[:n] if n_pad else out
