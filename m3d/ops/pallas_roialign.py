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


def _kernel(lvl_ref, bat_ref, oy_ref, ox_ref, oz_ref,
            # ^ scalar-prefetch: [Npad] int32 each. 1-D on purpose: a 2-D
            # [Npad, 5] meta row pads to 128 SMEM lanes (512 B/ROI) and
            # blows the 1 MB SMEM budget at Npad >= ~2000.
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
                level = lvl_ref[roi]
                b = bat_ref[roi]
                oy = oy_ref[roi]
                ox = ox_ref[roi]
                # Caller 8-aligns z origins (sublane tiling); tell Mosaic.
                oz = pl.multiple_of(oz_ref[roi], 8)
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


def _kernel_vmem(lvl_ref,            # scalar-prefetch: [N] int32 levels
                 # (1-D: a 2-D [N, 1] row pads to 128 SMEM lanes and blows
                 # the 1 MB SMEM budget at N >= ~2000)
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
            sel = (lvl_ref[base + r] == lv).astype(jnp.float32)
            outs.append(
                jnp.transpose(t3.reshape(p, p, p, ck), (2, 1, 0, 3)) * sel)
        acc = acc + jnp.stack(outs)                # [R, p, p, p, ck]
    out_ref[...] = acc.astype(out_ref.dtype)


def _kernel_slab_fc(lvl_ref, bat_ref, oy_ref, ox_ref, oz_ref,
                    # ^ scalar-prefetch: [Npad] int32 each. A 2-D [Npad, 5]
                    # meta row pads to 128 SMEM lanes (512 B/ROI) and blows
                    # the 1 MB SMEM budget at Npad >= 2048; five 1-D arrays
                    # stay at 4 B/ROI each.
                    bounds_ref,      # scalar-prefetch: [2] int32 (off, cnt)
                    wy_ref, wx_ref, wz_ref,  # [r_b, p, S*] f32 blocks
                    f2_ref, f3_ref, f4_ref, f5_ref,  # [B,H,W,D,C] (HBM)
                    wfc_ref,         # [c_chunks, p, p*p*ck, F] bf16 (HBM)
                    out_ref,         # [G, F] f32 block (one ROI group)
                    ring_ref,        # scratch [p, G, p*p*ck] bf16
                    tile_ref,        # scratch [p, r_b, p*p*ck] bf16
                    # ^ z-leading: the FC contraction reads ring_ref[z] as
                    # a contiguous [G, p*p*ck] matrix (a [G, p, ...] ring
                    # needs a strided middle-dim slice per z — measured
                    # ~11 ms of FC overhead at the classifier workload)
                    slab2_ref,       # scratch [2, r_b, Sy, Sx, SZ, ck]
                    wfc_buf,         # scratch [p, p*p*ck, F_TILE] bf16
                    sems,            # DMA semaphores [2, r_b]
                    wsem,            # DMA semaphore for the W tile
                    mode="full"):    # static: full | nofc | dmaonly
    """Slab-DMA ROIAlign fused with the pool-cube FC conv.

    The classifier stage's pooled tensor ([N, p^3, C], ~350 MB at the bench
    workload) exists only to feed a full-extent VALID conv — one matmul.
    Materializing it in HBM costs ~11 ms (measured: the XLA gather path is
    24.4 ms when its output is consumed by a fused reduction but 35.3 ms
    when it must be written). This kernel never materializes it: per-ROI
    slabs are DMA'd to VMEM, contracted with the separable interpolation
    weights on the MXU, parked in a G-ROI VMEM ring, and every full ring is
    contracted with the FC kernel ([G, p^2*ck] x [p^2*ck, F] per z-plane —
    MXU-shaped) straight into the [G, F] output block.

    Grid: (groups, c_chunks, steps_per_group); r_b ROIs per step,
    G = r_b * steps_per_group ROIs per output block. The output block is
    revisited by all (c, s) steps of its group consecutively, so f32
    accumulation over channel chunks happens in-place in VMEM.

    wfc layout: [c, z, (x*p + y)*ck + c_in, f] — matches the separable
    contraction's t3 ([p(z), p(x)*p(y)*ck]) so the ring write needs no
    transpose (see pyramid_roi_align_fc for the host-side permutation).
    """
    g = pl.program_id(0)
    c = pl.program_id(1)
    s = pl.program_id(2)
    n_c = pl.num_programs(1)
    spg = pl.num_programs(2)

    off = bounds_ref[0]
    cnt = bounds_ref[1]

    r_b = slab2_ref.shape[1]
    sy = slab2_ref.shape[2]
    sx = slab2_ref.shape[3]
    sz = slab2_ref.shape[4]
    ck = slab2_ref.shape[5]
    p = ring_ref.shape[0]
    f_tile = wfc_buf.shape[2]
    f_total = out_ref.shape[1]

    # Flat step index across the whole grid (for slab double-buffering).
    gg = (g * n_c + c) * spg + s

    def roi_active(roi):
        return jnp.logical_and(roi >= off, roi < off + cnt)

    def start_dmas(ggn, slot):
        """Kick the r_b slab DMAs for flat step ggn into buffer `slot`."""
        gn = ggn // (n_c * spg)
        rem = ggn - gn * (n_c * spg)
        cn = rem // spg
        sn = rem - cn * spg
        oc = pl.multiple_of(cn * ck, 128)
        for r in range(r_b):
            roi = (gn * spg + sn) * r_b + r

            @pl.when(roi_active(roi))
            def _(roi=roi, r=r):
                level = lvl_ref[roi]
                b = bat_ref[roi]
                oy = oy_ref[roi]
                ox = ox_ref[roi]
                oz = pl.multiple_of(oz_ref[roi], 8)
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

    n_steps_total = pl.num_programs(0) * n_c * spg
    slot = jax.lax.rem(gg, 2)
    next_slot = jax.lax.rem(gg + 1, 2)

    @pl.when(gg == 0)
    def _():
        start_dmas(gg, slot)

    @pl.when(gg + 1 < n_steps_total)
    def _():
        start_dmas(gg + 1, next_slot)

    # First step of a group: zero the output accumulator block.
    @pl.when(jnp.logical_and(c == 0, s == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # First step of a (group, chunk) stripe: start the FC weight DMA for
    # f-tile 0 (later tiles are fetched synchronously at FC time — the
    # first is the only one whose latency isn't hidden by slab compute).
    @pl.when(s == 0)
    def _():
        pltpu.make_async_copy(
            wfc_ref.at[c, pl.ds(0, p), pl.ds(0, ring_ref.shape[2]),
                       pl.ds(0, f_tile)],
            wfc_buf, wsem,
        ).start()

    def contract_front(w, t, out_dtype):
        r = jax.lax.dot_general(
            w.astype(t.dtype), t,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return r.astype(out_dtype)

    # Separable interpolation for this step's r_b ROIs -> a static-indexed
    # step tile, then ONE aligned 8-wide ring store. Mosaic requires
    # dynamic sublane store bases to be provably 8-aligned, so per-ROI
    # dynamic ring writes (base s*r_b + r) don't compile; the tile is
    # indexed by the python-constant r and the ring store base s*r_b is
    # hinted as a multiple of r_b (callers keep r_b == 8). The DMA wait
    # must be guarded like the DMA start: inactive/padded ROIs never
    # started a copy, and waiting on their semaphore deadlocks the core.
    for r in range(r_b):
        roi = (g * spg + s) * r_b + r

        @pl.when(roi_active(roi))
        def _(roi=roi, r=r):
            pltpu.make_async_copy(
                f2_ref.at[0, pl.ds(0, sy), pl.ds(0, sx), pl.ds(0, sz),
                          pl.ds(0, ck)],
                slab2_ref.at[slot, r],
                sems.at[slot, r],
            ).wait()
            if mode == "dmaonly":
                # Consume the slab cheaply so the DMA isn't dead-code.
                probe = jnp.sum(slab2_ref[slot, r, 0, 0].astype(
                    jnp.float32)) * 0.0
                tile_ref[:, r, :] = (
                    jnp.zeros((p, ring_ref.shape[2]), jnp.float32)
                    + probe).astype(tile_ref.dtype)
                return
            slab = slab2_ref[slot, r]                  # [Sy, Sx, SZ, ck]
            cd = slab.dtype
            # Explicit transpose + leading-dim matmul per stage. Measured
            # alternatives at the classifier workload (2000x7^3x256):
            # contracting middle dims via dot_general compiles but Mosaic's
            # implicit relayouts are SLOWER (52.2 vs 48.2 ms end-to-end).
            # The per-ROI separable chain costs ~6 us/ROI-chunk and
            # dominates this kernel (DMA+grid floor is 11.8 ms).
            t1 = contract_front(wy_ref[r],
                                slab.reshape(sy, sx * sz * ck), cd)
            t1 = jnp.transpose(t1.reshape(p, sx, sz * ck),
                               (1, 0, 2)).reshape(sx, p * sz * ck)
            t2 = contract_front(wx_ref[r], t1, cd)     # [p(x), p(y)*SZ*ck]
            t2 = jnp.transpose(t2.reshape(p, p, sz, ck),
                               (2, 0, 1, 3)).reshape(sz, p * p * ck)
            t3 = contract_front(wz_ref[r], t2, cd)     # [p(z), x*y*ck]
            tile_ref[:, r, :] = t3

        @pl.when(jnp.logical_not(roi_active(roi)))
        def _(r=r):
            # Stale tile garbage must not reach the FC contraction.
            tile_ref[:, r, :] = jnp.zeros(
                (p, ring_ref.shape[2]), ring_ref.dtype)

    base = pl.multiple_of(s * r_b, 8)
    ring_ref[:, pl.ds(base, r_b), :] = tile_ref[...]

    # Ring full: contract with the FC kernel into the output block.
    if mode != "full":
        @pl.when(s == spg - 1)
        def _():
            pltpu.make_async_copy(
                wfc_ref.at[0, pl.ds(0, p), pl.ds(0, ring_ref.shape[2]),
                           pl.ds(0, f_tile)],
                wfc_buf, wsem,
            ).wait()
            out_ref[:, :f_tile] += jnp.sum(
                ring_ref[:, :, :f_tile].astype(jnp.float32), axis=0)
        return

    @pl.when(s == spg - 1)
    def _():
        pltpu.make_async_copy(
            wfc_ref.at[0, pl.ds(0, p), pl.ds(0, ring_ref.shape[2]),
                       pl.ds(0, f_tile)],
            wfc_buf, wsem,
        ).wait()
        n_ft = f_total // f_tile
        for ft in range(n_ft):
            acc = jnp.zeros((ring_ref.shape[1], f_tile), jnp.float32)
            for z in range(p):
                acc = acc + jax.lax.dot_general(
                    ring_ref[z], wfc_buf[z],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            out_ref[:, ft * f_tile:(ft + 1) * f_tile] += acc
            if ft + 1 < n_ft:
                cp = pltpu.make_async_copy(
                    wfc_ref.at[c, pl.ds(0, p), pl.ds(0, ring_ref.shape[2]),
                               pl.ds((ft + 1) * f_tile, f_tile)],
                    wfc_buf, wsem,
                )
                cp.start()
                cp.wait()


def _kernel_slab_fc_kron(lvl_ref, bat_ref, oy_ref, ox_ref, oz_ref,
                         bounds_ref,   # scalar-prefetch: [2] int32
                         wyx_ref,      # [r_b, p*p, Sy*Sx] f32 block
                         wz_ref,       # [r_b, p, SZ] f32 block
                         f2_ref, f3_ref, f4_ref, f5_ref,  # HBM
                         wfc_ref,      # [c_chunks, p, p*p*ck, F] bf16 HBM
                         out_ref,      # [G, F] f32 block
                         ring_ref,     # scratch [p, G, p*p*ck]
                         tile_ref,     # scratch [p, r_b, p*p*ck]
                         slab2_ref,    # scratch [2, r_b, Sy, Sx, SZ, ck]
                         wfc_buf,      # scratch [p, p*p*ck, F_TILE]
                         sems, wsem):
    """Slab-DMA ROIAlign + FC with the y,x axes contracted in ONE
    Kronecker-weight matmul per ROI.

    The separable chain in _kernel_slab_fc spends most of its time in
    Mosaic relayouts: two transposes per ROI move ~3.5 MB through the VPU
    against microseconds of MXU work (bench_classify_variants.py header,
    r05). Here the host precomputes W2[n, p^2, Sy*Sx] = Wx (x) Wy, so the
    in-kernel chain is:

        tA = W2 @ slab[Sy*Sx, SZ*ck]          (one MXU call, y+x at once)
        t3 = Wz @ transpose(tA)[SZ, p^2*ck]   (small relayout: p^2*SZ*ck)

    — 8x more MACs in stage A than the separable form (49x256 vs 7x16 +
    7x16 rows), but MACs are MXU-cheap while relayout bytes are not: the
    only transpose left is p^2*SZ*ck (~300 KB) instead of ~3.5 MB.
    Ring layout and the FC tail are identical to _kernel_slab_fc.
    """
    g = pl.program_id(0)
    c = pl.program_id(1)
    s = pl.program_id(2)
    n_c = pl.num_programs(1)
    spg = pl.num_programs(2)

    off = bounds_ref[0]
    cnt = bounds_ref[1]

    r_b = slab2_ref.shape[1]
    sy = slab2_ref.shape[2]
    sx = slab2_ref.shape[3]
    sz = slab2_ref.shape[4]
    ck = slab2_ref.shape[5]
    p = ring_ref.shape[0]
    f_tile = wfc_buf.shape[2]
    f_total = out_ref.shape[1]

    gg = (g * n_c + c) * spg + s

    def roi_active(roi):
        return jnp.logical_and(roi >= off, roi < off + cnt)

    def start_dmas(ggn, slot):
        gn = ggn // (n_c * spg)
        rem = ggn - gn * (n_c * spg)
        cn = rem // spg
        sn = rem - cn * spg
        oc = pl.multiple_of(cn * ck, 128)
        for r in range(r_b):
            roi = (gn * spg + sn) * r_b + r

            @pl.when(roi_active(roi))
            def _(roi=roi, r=r):
                level = lvl_ref[roi]
                b = bat_ref[roi]
                oy = oy_ref[roi]
                ox = ox_ref[roi]
                oz = pl.multiple_of(oz_ref[roi], 8)
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

    n_steps_total = pl.num_programs(0) * n_c * spg
    slot = jax.lax.rem(gg, 2)
    next_slot = jax.lax.rem(gg + 1, 2)

    @pl.when(gg == 0)
    def _():
        start_dmas(gg, slot)

    @pl.when(gg + 1 < n_steps_total)
    def _():
        start_dmas(gg + 1, next_slot)

    @pl.when(jnp.logical_and(c == 0, s == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(s == 0)
    def _():
        pltpu.make_async_copy(
            wfc_ref.at[c, pl.ds(0, p), pl.ds(0, ring_ref.shape[2]),
                       pl.ds(0, f_tile)],
            wfc_buf, wsem,
        ).start()

    for r in range(r_b):
        roi = (g * spg + s) * r_b + r

        @pl.when(roi_active(roi))
        def _(roi=roi, r=r):
            pltpu.make_async_copy(
                f2_ref.at[0, pl.ds(0, sy), pl.ds(0, sx), pl.ds(0, sz),
                          pl.ds(0, ck)],
                slab2_ref.at[slot, r],
                sems.at[slot, r],
            ).wait()
            slab = slab2_ref[slot, r]                  # [Sy, Sx, SZ, ck]
            cd = slab.dtype
            # Stage A: y+x in one call. Rows of W2 are (x*p + y) pairs,
            # columns are (y*Sx + x) slab positions — the result's row
            # order matches the ring's (x*p + y)*ck column layout.
            tA = jax.lax.dot_general(
                wyx_ref[r].astype(cd),
                slab.reshape(sy * sx, sz * ck),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cd)                               # [p*p, SZ*ck]
            tB = jnp.transpose(tA.reshape(p * p, sz, ck),
                               (1, 0, 2)).reshape(sz, p * p * ck)
            t3 = jax.lax.dot_general(
                wz_ref[r].astype(cd), tB,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                          # [p, p*p*ck] f32
            tile_ref[:, r, :] = t3.astype(tile_ref.dtype)

        @pl.when(jnp.logical_not(roi_active(roi)))
        def _(r=r):
            tile_ref[:, r, :] = jnp.zeros(
                (p, ring_ref.shape[2]), ring_ref.dtype)

    base = pl.multiple_of(s * r_b, 8)
    ring_ref[:, pl.ds(base, r_b), :] = tile_ref[...]

    @pl.when(s == spg - 1)
    def _():
        pltpu.make_async_copy(
            wfc_ref.at[0, pl.ds(0, p), pl.ds(0, ring_ref.shape[2]),
                       pl.ds(0, f_tile)],
            wfc_buf, wsem,
        ).wait()
        n_ft = f_total // f_tile
        for ft in range(n_ft):
            acc = jnp.zeros((ring_ref.shape[1], f_tile), jnp.float32)
            for z in range(p):
                acc = acc + jax.lax.dot_general(
                    ring_ref[z], wfc_buf[z],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            out_ref[:, ft * f_tile:(ft + 1) * f_tile] += acc
            if ft + 1 < n_ft:
                cp = pltpu.make_async_copy(
                    wfc_ref.at[c, pl.ds(0, p), pl.ds(0, ring_ref.shape[2]),
                               pl.ds((ft + 1) * f_tile, f_tile)],
                    wfc_buf, wsem,
                )
                cp.start()
                cp.wait()


@functools.partial(
    jax.jit,
    static_argnames=("pool_size", "slab", "group", "r_batch", "f_tile",
                     "interpret"),
)
def pallas_pyramid_roi_align_fc_kron(levels, batch_idx, origins, wy, wx,
                                     wz, feature_maps, wfc, pool_size: int,
                                     slab=(16, 16, 24), group: int = 128,
                                     r_batch: int = 8, f_tile: int = 256,
                                     bounds=None, interpret: bool = False):
    """pallas_pyramid_roi_align_fc with the Kronecker y+x interpolation
    (_kernel_slab_fc_kron). Same inputs/outputs; W2 is built here."""
    n = levels.shape[0]
    p = int(pool_size)
    c = feature_maps[0].shape[-1]
    s_y, s_x, s_z = (int(v) for v in slab)
    r_b = int(r_batch)
    grp = int(group)
    assert grp % r_b == 0
    assert r_b % 8 == 0, r_b
    ck = min(c, 128)
    assert c % ck == 0
    c_chunks = c // ck
    f = wfc.shape[-1]
    ftl = min(int(f_tile), f)
    assert f % ftl == 0

    wfc_p = jnp.transpose(wfc, (2, 1, 0, 3, 4))
    wfc_p = wfc_p.reshape(p, p * p, c_chunks, ck, f)
    wfc_p = jnp.transpose(wfc_p, (2, 0, 1, 3, 4)).reshape(
        c_chunks, p, p * p * ck, f).astype(feature_maps[0].dtype)

    # W2[n, (x*p + y), (y_s*Sx + x_s)] = wx[n, x, x_s] * wy[n, y, y_s]
    wyx = (wx[:, :, None, None, :] * wy[:, None, :, :, None]).reshape(
        n, p * p, s_y * s_x)

    meta = jnp.concatenate(
        [levels[:, None], batch_idx[:, None], origins], axis=1
    ).astype(jnp.int32)
    if bounds is None:
        bounds = jnp.asarray([0, n], jnp.int32)
    bounds = jnp.asarray(bounds, jnp.int32)

    n_pad = (-n) % grp
    if n_pad:
        meta = jnp.concatenate(
            [meta, jnp.zeros((n_pad, meta.shape[1]), meta.dtype)], 0)
        wyx = jnp.concatenate(
            [wyx, jnp.zeros((n_pad,) + wyx.shape[1:], wyx.dtype)], 0)
        wz = jnp.concatenate(
            [wz, jnp.zeros((n_pad,) + wz.shape[1:], wz.dtype)], 0)
    n_tot = n + n_pad
    n_groups = n_tot // grp
    spg = grp // r_b

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_groups, c_chunks, spg),
        in_specs=[
            pl.BlockSpec((r_b, p * p, s_y * s_x),
                         lambda g, c, s, *pf: (g * spg + s, 0, 0)),
            pl.BlockSpec((r_b, p, s_z),
                         lambda g, c, s, *pf: (g * spg + s, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),   # wfc
        ],
        out_specs=pl.BlockSpec(
            (grp, f), lambda g, c, s, *pf: (g, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((p, grp, p * p * ck), feature_maps[0].dtype),
            pltpu.VMEM((p, r_b, p * p * ck), feature_maps[0].dtype),
            pltpu.VMEM((2, r_b, s_y, s_x, s_z, ck), feature_maps[0].dtype),
            pltpu.VMEM((p, p * p * ck, ftl), feature_maps[0].dtype),
            pltpu.SemaphoreType.DMA((2, r_b)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        _kernel_slab_fc_kron,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tot, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(meta[:, 0], meta[:, 1], meta[:, 2], meta[:, 3], meta[:, 4],
      bounds, wyx, wz, *feature_maps, wfc_p)
    return out[:n] if n_pad else out


@functools.partial(
    jax.jit,
    static_argnames=("pool_size", "slab", "group", "r_batch", "f_tile",
                     "interpret", "mode"),
)
def pallas_pyramid_roi_align_fc(levels, batch_idx, origins, wy, wx, wz,
                                feature_maps, wfc, pool_size: int,
                                slab=(16, 16, 24), group: int = 128,
                                r_batch: int = 8, f_tile: int = 256,
                                bounds=None, interpret: bool = False,
                                mode: str = "full"):
    """Fused slab-DMA ROIAlign + pool-cube FC contraction.

    Inputs as pallas_pyramid_roi_align, plus wfc: [p, p, p, C, F] — the
    FC conv kernel (ZConv layout [ky, kx, kz, Cin, F]). Returns [N, F]
    float32 == crop_and_resize(pool p) followed by the full-extent VALID
    conv, without materializing the pooled tensor. Inference-only.
    """
    n = levels.shape[0]
    p = int(pool_size)
    c = feature_maps[0].shape[-1]
    s_y, s_x, s_z = (int(v) for v in slab)
    r_b = int(r_batch)
    grp = int(group)
    assert grp % r_b == 0
    # The kernel's ring store needs an 8-aligned sublane base (= s * r_b).
    assert r_b % 8 == 0, r_b
    ck = min(c, 128)
    assert c % ck == 0
    c_chunks = c // ck
    f = wfc.shape[-1]
    ftl = min(int(f_tile), f)
    assert f % ftl == 0

    # Host-side W permutation to the kernel's t3 layout:
    # [ky,kx,kz,C,F] -> [c_chunk, kz, (kx*p + ky)*ck + c_in, F].
    wfc_p = jnp.transpose(wfc, (2, 1, 0, 3, 4))          # [kz,kx,ky,C,F]
    wfc_p = wfc_p.reshape(p, p * p, c_chunks, ck, f)
    wfc_p = jnp.transpose(wfc_p, (2, 0, 1, 3, 4)).reshape(
        c_chunks, p, p * p * ck, f).astype(feature_maps[0].dtype)

    meta = jnp.concatenate(
        [levels[:, None], batch_idx[:, None], origins], axis=1
    ).astype(jnp.int32)
    if bounds is None:
        bounds = jnp.asarray([0, n], jnp.int32)
    bounds = jnp.asarray(bounds, jnp.int32)

    n_pad = (-n) % grp
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
    n_groups = n_tot // grp
    spg = grp // r_b

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_groups, c_chunks, spg),
        in_specs=[
            pl.BlockSpec((r_b, p, s_y),
                         lambda g, c, s, *pf: (g * spg + s, 0, 0)),
            pl.BlockSpec((r_b, p, s_x),
                         lambda g, c, s, *pf: (g * spg + s, 0, 0)),
            pl.BlockSpec((r_b, p, s_z),
                         lambda g, c, s, *pf: (g * spg + s, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),   # wfc
        ],
        out_specs=pl.BlockSpec(
            (grp, f), lambda g, c, s, *pf: (g, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((p, grp, p * p * ck), feature_maps[0].dtype),
            pltpu.VMEM((p, r_b, p * p * ck), feature_maps[0].dtype),
            pltpu.VMEM((2, r_b, s_y, s_x, s_z, ck), feature_maps[0].dtype),
            pltpu.VMEM((p, p * p * ck, ftl), feature_maps[0].dtype),
            pltpu.SemaphoreType.DMA((2, r_b)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_slab_fc, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tot, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(meta[:, 0], meta[:, 1], meta[:, 2], meta[:, 3], meta[:, 4],
      bounds, wy, wx, wz, *feature_maps, wfc_p)
    return out[:n] if n_pad else out


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

    meta = levels.astype(jnp.int32)

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
        num_scalar_prefetch=6,
        grid=(n_steps, c_chunks),
        in_specs=[
            pl.BlockSpec((r_b, p, s_y), lambda i, j, *pf: (i, 0, 0)),
            pl.BlockSpec((r_b, p, s_x), lambda i, j, *pf: (i, 0, 0)),
            pl.BlockSpec((r_b, p, s_z), lambda i, j, *pf: (i, 0, 0)),
            # Feature levels stay in HBM; the kernel DMAs slabs on demand.
            # (ANY lets the compiler pull small levels into VMEM, blowing
            # the 16MB budget.)
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (r_b, p, p, p, ck), lambda i, j, *pf: (i, 0, 0, 0, j)
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
    )(meta[:, 0], meta[:, 1], meta[:, 2], meta[:, 3], meta[:, 4],
      bounds, wy, wx, wz, *feature_maps)
    return out[:n] if n_pad else out


def _kernel_vmem_compact(lvl_ref, bat_ref, bnd_ref,
                         # ^ scalar-prefetch: [N] int32 levels, [N] int32
                         # source-image index per ROI, [1] int32 total
                         wy_ref, wx_ref, wz_ref,   # [1, p, Smax] f32 blocks
                         f2_ref, f3_ref, f4_ref, f5_ref,  # [B,H,W,D,C] (HBM)
                         out_ref,            # [1, p, p, p, Ck] (VMEM)
                         s2, s3, s4, s5,     # VMEM scratch: one level x chunk
                         sems):              # DMA semaphores [4]
    """VMEM-resident ROIAlign over a COMPACTED flat ROI list.

    Same separable full-extent contraction as _kernel_vmem, but the grid is
    (c_chunks, N) over a flat ROI list whose rows are grouped by source
    image (image-major) with the live rows first: bat_ref names each ROI's
    image and only rows < bnd_ref[0] compute (a skipped step costs grid
    bookkeeping only — rows at or beyond the bound hold stale VMEM garbage,
    which the host wrapper masks to zero). The pyramid chunk of an image is
    (re)loaded into VMEM whenever bat_ref changes between consecutive steps,
    so the stripe DMA cost is O(images present), not O(N).

    One ROI per step: r_batch == 1 is the measured-best configuration for
    the resident kernel (see _VMEM_R_CAP in m3d/ops/roialign3d.py), and a
    wider step could straddle an image boundary in the compacted list.
    """
    j = pl.program_id(0)
    i = pl.program_id(1)
    ck = out_ref.shape[4]
    p = out_ref.shape[1]
    total = bnd_ref[0]
    active = i < total

    srefs = (s2, s3, s4, s5)
    frefs = (f2_ref, f3_ref, f4_ref, f5_ref)

    b = bat_ref[i]
    # Valid rows are contiguous from 0, so i-1 is in-bounds and valid
    # whenever `active` holds for i > 0.
    prev_b = bat_ref[jnp.maximum(i - 1, 0)]
    need_load = jnp.logical_and(active,
                                jnp.logical_or(i == 0, prev_b != b))

    @pl.when(need_load)
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

    def contract_front(w, t, out_dtype):
        r = jax.lax.dot_general(
            w.astype(t.dtype), t,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return r.astype(out_dtype)

    @pl.when(active)
    def _():
        acc = jnp.zeros((p, p, p, ck), jnp.float32)
        for lv in range(4):
            sref = srefs[lv]
            h, w, d = sref.shape[0], sref.shape[1], sref.shape[2]
            slab = sref[...]                       # [H, W, D, Ck]
            cd = slab.dtype
            t1 = contract_front(wy_ref[0, :, :h],
                                slab.reshape(h, w * d * ck), cd)
            t1 = jnp.transpose(t1.reshape(p, w, d * ck),
                               (1, 0, 2)).reshape(w, p * d * ck)
            t2 = contract_front(wx_ref[0, :, :w], t1, cd)
            t2 = jnp.transpose(t2.reshape(p, p, d, ck),
                               (2, 0, 1, 3)).reshape(d, p * p * ck)
            t3 = contract_front(wz_ref[0, :, :d], t2, jnp.float32)
            # Level-select as an SMEM-scalar multiply (see _kernel_vmem).
            sel = (lvl_ref[i] == lv).astype(jnp.float32)
            acc = acc + jnp.transpose(
                t3.reshape(p, p, p, ck), (2, 1, 0, 3)) * sel
        out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("pool_size", "interpret"),
)
def pallas_pyramid_roi_align_vmem_compact(levels, batch_idx, total, wy, wx,
                                          wz, feature_maps, pool_size: int,
                                          interpret: bool = False):
    """VMEM-resident pyramid ROIAlign over a compacted flat ROI list.

    levels/batch_idx: [N] int32, rows grouped by source image (image-major)
    with the live rows first; total: [] int32 — rows at index >= total are
    NOT computed and contain garbage (the caller masks them);
    wy/wx/wz: [N, p, Smax] dense full-extent weights as in
    pallas_pyramid_roi_align_vmem. Returns [N, p, p, p, C].
    """
    n = levels.shape[0]
    p = int(pool_size)
    c = feature_maps[0].shape[-1]
    ck = min(c, 128)
    assert c % ck == 0
    c_chunks = c // ck

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(c_chunks, n),
        in_specs=[
            pl.BlockSpec((1, p, wy.shape[2]), lambda j, i, *pf: (i, 0, 0)),
            pl.BlockSpec((1, p, wx.shape[2]), lambda j, i, *pf: (i, 0, 0)),
            pl.BlockSpec((1, p, wz.shape[2]), lambda j, i, *pf: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, p, p, p, ck), lambda j, i, *pf: (i, 0, 0, 0, j),
        ),
        scratch_shapes=[
            pltpu.VMEM(tuple(fm.shape[1:4]) + (ck,), feature_maps[0].dtype)
            for fm in feature_maps
        ] + [pltpu.SemaphoreType.DMA((4,))],
    )
    return pl.pallas_call(
        _kernel_vmem_compact,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, p, p, p, c),
                                       feature_maps[0].dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(levels.astype(jnp.int32), batch_idx.astype(jnp.int32),
      jnp.asarray(total, jnp.int32).reshape(1), wy, wx, wz, *feature_maps)
