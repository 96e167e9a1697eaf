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


def _kernel(meta_ref,            # scalar-prefetch: [N, 5] int32
            wy_ref, wx_ref, wz_ref,   # [1, p, S]/[1, p, SZ] f32 blocks
            f2_ref, f3_ref, f4_ref, f5_ref,  # [B, H, W, D, C] (HBM)
            out_ref,             # [1, p, p, p, Ck] (VMEM)
            slab2_ref,           # scratch [2, Sy, Sx, SZ, Ck] double buffer
            sems):               # DMA semaphores [2]
    i = pl.program_id(0)
    j = pl.program_id(1)
    nc = pl.num_programs(1)
    g = i * nc + j
    n_total = pl.num_programs(0) * nc

    sy = slab2_ref.shape[1]
    sx = slab2_ref.shape[2]
    sz = slab2_ref.shape[3]
    ck = slab2_ref.shape[4]

    def start_dma(gg, slot):
        """Kick the slab DMA for flat grid step gg into buffer `slot`."""
        ii = gg // nc
        jj = gg - ii * nc
        level = meta_ref[ii, 0]
        b = meta_ref[ii, 1]
        oy = meta_ref[ii, 2]
        ox = meta_ref[ii, 3]
        # The caller 8-aligns z origins (sublane tiling); tell Mosaic.
        oz = pl.multiple_of(meta_ref[ii, 4], 8)
        oc = pl.multiple_of(jj * ck, 128)
        for lv, feat_ref in enumerate((f2_ref, f3_ref, f4_ref, f5_ref)):
            @pl.when(level == lv)
            def _(feat_ref=feat_ref):
                pltpu.make_async_copy(
                    feat_ref.at[b, pl.ds(oy, sy), pl.ds(ox, sx),
                                pl.ds(oz, sz), pl.ds(oc, ck)],
                    slab2_ref.at[slot],
                    sems.at[slot],
                ).start()

    slot = jax.lax.rem(g, 2)
    next_slot = jax.lax.rem(g + 1, 2)

    # Warm-up: the first step starts its own DMA.
    @pl.when(g == 0)
    def _():
        start_dma(0, 0)

    # Prefetch the next step's slab while this step computes.
    @pl.when(g + 1 < n_total)
    def _():
        start_dma(g + 1, next_slot)

    # Wait for this step's slab.
    pltpu.make_async_copy(
        f2_ref.at[0, pl.ds(0, sy), pl.ds(0, sx), pl.ds(0, sz), pl.ds(0, ck)],
        slab2_ref.at[slot],
        sems.at[slot],
    ).wait()

    p = out_ref.shape[1]
    slab = slab2_ref[slot]                            # [Sy, Sx, SZ, Ck]
    wy = wy_ref[0]                                    # [p, S]
    wx = wx_ref[0]                                    # [p, S]
    wz = wz_ref[0]                                    # [p, SZ]

    compute_dtype = slab.dtype

    def contract_front(w, t, out_dtype=None):
        """dot(w[p, K], t[K, M]): native-dtype MXU feed, f32 accumulation,
        result downcast to the slab dtype (bf16) — intermediates at f32 blow
        the 16MB VMEM stack."""
        r = jax.lax.dot_general(
            w.astype(t.dtype), t,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return r.astype(out_dtype or compute_dtype)

    # y first — the slab's leading axis needs NO transpose; each later
    # transpose then runs on a tensor already shrunk by 16/p.
    t1 = contract_front(wy, slab.reshape(sy, sx * sz * ck))  # [p(y), Sx*SZ*Ck]
    # x: [y, Sx, SZ*Ck] -> [Sx, y*SZ*Ck] -> [p(x), ...]
    t1 = jnp.transpose(t1.reshape(p, sx, sz * ck), (1, 0, 2)).reshape(
        sx, p * sz * ck)
    t2 = contract_front(wx, t1)                        # [q(x), y*SZ*Ck]
    # z: [x, y, SZ, Ck] -> [SZ, x*y*Ck] -> [p(z), ...]
    t2 = jnp.transpose(t2.reshape(p, p, sz, ck), (2, 0, 1, 3)).reshape(
        sz, p * p * ck)
    t3 = contract_front(wz, t2, jnp.float32)           # [r(z), x*y*Ck]
    # [z, x, y, Ck] -> [y, x, z, Ck] == (p, q, r, Ck)
    out = jnp.transpose(t3.reshape(p, p, p, ck), (2, 1, 0, 3))
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("pool_size", "slab", "interpret")
)
def pallas_pyramid_roi_align(levels, batch_idx, origins, wy, wx, wz,
                             feature_maps, pool_size: int,
                             slab=(16, 16, 24), interpret: bool = False):
    """Low-level entry: all routing/weights precomputed by the caller.

    levels/batch_idx: [N] int32; origins: [N, 3] int32 (into PADDED levels,
    z 8-aligned); wy: [N, p, sy], wx: [N, p, sx], wz: [N, p, sz] float32;
    slab = (sy, sx, sz) static slab extents (sz a multiple of 8);
    feature_maps: 4 arrays [B, H_l, W_l, D_l, C] with H >= sy, W >= sx,
    D >= sz (multiple of 8), and C a multiple of 128 (or < 128).
    Returns [N, p, p, p, C] float32.
    """
    n = levels.shape[0]
    p = int(pool_size)
    c = feature_maps[0].shape[-1]
    s_y, s_x, s_z = (int(v) for v in slab)
    ck = min(c, 128)
    assert c % ck == 0, f"channel count {c} must be a multiple of {ck}"
    c_chunks = c // ck

    meta = jnp.concatenate(
        [levels[:, None], batch_idx[:, None], origins], axis=1
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, c_chunks),
        in_specs=[
            pl.BlockSpec((1, p, s_y), lambda i, j, meta: (i, 0, 0)),
            pl.BlockSpec((1, p, s_x), lambda i, j, meta: (i, 0, 0)),
            pl.BlockSpec((1, p, s_z), lambda i, j, meta: (i, 0, 0)),
            # Feature levels stay in HBM; the kernel DMAs slabs on demand.
            # (ANY lets the compiler pull small levels into VMEM, blowing
            # the 16MB budget.)
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, p, p, p, ck), lambda i, j, meta: (i, 0, 0, 0, j)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, s_y, s_x, s_z, ck), feature_maps[0].dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, p, p, p, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(meta, wy, wx, wz, *feature_maps)
