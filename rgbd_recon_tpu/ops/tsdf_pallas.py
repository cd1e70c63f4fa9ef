"""Pallas TPU kernel for brick-sparse TSDF fusion.

The XLA formulation (ops/tsdf_fast.integrate_sparse) is correct but pays an
HBM round-trip for the [B3, win, C] interpolation intermediate of every
brick x sensor (~200 GB/frame at 256^3 — measured as ~70% of its runtime;
ALU precision made no difference). This kernel runs the identical math with
everything VMEM-resident: per occupied brick, DMA the brick's warp-table
slice and each sensor's image window into VMEM, do the hat/one-hot matmuls
and the TSDF/color update on-chip, and write one 16^3 block out.

Structure: grid (MB, K, CH) — occupied brick x sensor x voxel-chunk, chunk
innermost so each sensor window is DMA'd once per brick. Fusion state
(weighted TSDF + color accumulators) lives in VMEM scratch persisting
across grid steps: reset at k==0, finalized into the output block at
k==K-1. Chunking bounds the [chunk, 5*WX] matmul intermediates so the
whole working set fits VMEM (Mosaic's stack allocator does not overlap
unrolled-loop buffers).

TPU DMA slices must be tile-aligned in the last two dims ((8, 128) for
f32), so arbitrary per-brick window origins are handled by layout:

  x: the image is pre-expanded into OVERLAPPING x-blocks of width WX=128
     (the lane-tile size — partial-lane DMA slices are rejected) at stride
     64 ([K, NXB, 6, H, 128]); a brick picks block xb — an untiled leading
     index. Footprints wider than 64 px clamp at the window edge, same
     deviation class as the XLA path's fixed window.
  y: origins quantize down to multiples of 8 with window WY=48.

Matmuls run single-pass bf16 with exactness tricks: NEAREST depth uses
exact one-hot weights + a hi/lo split of the depth channel (error ~2^-16);
the silhouette gate compares at SIL_PL=0.998 instead of 0.9999 (bf16 hat
weights carry ~2e-3 rounding; the only misclassified voxels are those whose
non-silhouette taps have <0.2% interpolation weight — the same knife edge
the reference's exact ==1.0 comparison sits on).

Outputs are block-major ([NB+1, ...]; +1 = trash block for invalid slots),
assembled into the dense volume by one transpose outside.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tsdf import TsdfConfig
from .tsdf_fast import (
    BRICK, IntegrationTables, occupied_list, pack_frames,
)

B3 = BRICK**3
CH = 2             # voxel chunks per brick (VMEM bound)
HB = B3 // CH
SIL_PL = 0.998     # bf16-tolerant silhouette gate (see module docstring)
WY = 48            # y window (rows), origins 8-aligned
WX = 128           # x window (cols) — one overlapping block (128-lane tile)
XSTRIDE = 64       # x-block stride

# channel-PAIRED window layout (tsdf_persist/tsdf_dense fast path): two
# image channels share each 128-lane tile as 64-px halves — the x window
# guarantee only ever used 64 of the 128 lanes — so the per-sensor
# sampling matmuls shrink from 7 output lane tiles to 4 (1 depth pair +
# 3 linear pairs) and the x reductions run over 64 lanes instead of 128.
# Windows stay f32: bf16 planes would force (16, 128) tiling and 16-
# aligned y origins, halving the usable y half-extent (a stacked-K=128
# bf16 variant was measured SLOWER: MXU time scales with K x N-tiles, so
# 128 x 4 tiles lost to 48 x (1 + 3)).
WX2 = 64           # pairs x window (cols) — half a lane tile per channel
XSTRIDE2 = 16      # pairs x-block stride


def pack_pairs(packed: jnp.ndarray) -> jnp.ndarray:
    """pack_frames output [K, H, W, 6] -> channel planes f32[K, 8, H, W]
    ordered (d_hi, d_lo, 1-sil, qual, r, g, b, 0). The NEAREST-depth hi/lo
    split (8-bit chunks, both bf16-exact — error ~2^-16) moves here, once
    per frame, instead of per window in-kernel.

    The silhouette plane is stored FLIPPED (1 - sil): the gate compares
    against SIL_PL ~ 1, where bf16 resolution is only 2^-8 — in the
    flipped basis the gate margin (1 - SIL_PL = 2e-3) sits near zero,
    where bf16 is relatively exact, so the whole linear sampling stage can
    run bf16 (fuse_chunk_v2) without moving the gate."""
    d = packed[..., 0]
    d_hi = jnp.floor(d * 256.0) * (1.0 / 256.0)
    return jnp.stack(
        [d_hi, d - d_hi, 1.0 - packed[..., 2], packed[..., 1],
         packed[..., 3], packed[..., 4], packed[..., 5], jnp.zeros_like(d)],
        axis=1,
    )


def expand_xblocks_pairs(ch8: jnp.ndarray, dtype=None,
                         wx: int = WX2, xstride: int = XSTRIDE2) -> jnp.ndarray:
    """[K, 8, H, W] channel planes -> overlapping channel-paired x-blocks
    f32[K, NXB2, 4, Hp, 2*wx] (stride ``xstride``): block j, group g holds
    channels (2g, 2g+1) in lane halves [x | wx + x], x = j*xstride ..
    j*xstride + wx - 1. Defaults reproduce the historical 64-px/stride-16
    layout. wx=32 pairs exist for interpret-mode A/Bs only — on chip the
    half-tile x window ships channel-QUADDED (expand_xblocks_quads),
    whose DMA slices span full 128-lane tiles.

    H pads up to a multiple of 8 (edge mode ≙ GL CLAMP_TO_EDGE) so window
    DMAs near the bottom edge stay in-bounds; W pads to the stride so
    right-edge footprints keep a full block.

    ``dtype=jnp.bfloat16`` halves the window DMA bytes and VMEM; it is
    BITWISE-identical for the persistent kernels, which cast every window
    plane to bf16 at the sampling matmul anyway (d_hi/d_lo are bf16-exact
    by construction — the whole point of the pair split)."""
    k, c8, h, w = ch8.shape
    if dtype is not None:
        ch8 = ch8.astype(dtype)
    hp = -(-h // 8) * 8
    wp = max(-(-w // xstride) * xstride, wx)
    ch8 = jnp.pad(ch8, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)),
                  mode="edge")
    nxb = (wp - wx) // xstride + 1
    blocks = []
    for j in range(nxb):
        sl = ch8[..., j * xstride : j * xstride + wx]      # [K, 8, Hp, wx]
        blocks.append(
            sl.reshape(k, 4, 2, hp, wx)
            .transpose(0, 1, 3, 2, 4)
            .reshape(k, 4, hp, 2 * wx)
        )
    return jnp.stack(blocks, axis=1)


def expand_xblocks_quads(ch8: jnp.ndarray, dtype=None,
                         wx: int = 32, xstride: int = 8) -> jnp.ndarray:
    """[K, 8, H, W] channel planes -> overlapping channel-QUADDED x-blocks
    [K, NXB, 2, Hp, 4*wx]: block j, plane p holds channels 4p .. 4p+3 in
    lane QUARTERS [x | wx + x | 2*wx + x | 3*wx + x], x = j*xstride ..
    j*xstride + wx - 1.

    This is what makes the half-tile x window (wx=32) chip-legal: window
    DMA slices must span full 128-lane tiles, and 4 x 32-px quarters fill
    one. Plane 0 = (d_hi | d_lo | 1-sil | qual), plane 1 = (r | g | b | 0)
    (pack_pairs channel order). The kernel runs ONE nearest-weight matmul
    on plane 0 (depth quarters; the sil/qual quarters of that product are
    unused) and ONE linear-weight matmul on both planes concatenated —
    384 output lanes per sensor instead of the pairs layout's 512 — and
    the window DMA bytes and x-stage heights halve.

    Padding and dtype semantics as expand_xblocks_pairs."""
    k, c8, h, w = ch8.shape
    if dtype is not None:
        ch8 = ch8.astype(dtype)
    hp = -(-h // 8) * 8
    wp = max(-(-w // xstride) * xstride, wx)
    ch8 = jnp.pad(ch8, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)),
                  mode="edge")
    nxb = (wp - wx) // xstride + 1
    blocks = []
    for j in range(nxb):
        sl = ch8[..., j * xstride : j * xstride + wx]      # [K, 8, Hp, wx]
        blocks.append(
            sl.reshape(k, 2, 4, hp, wx)
            .transpose(0, 1, 3, 2, 4)
            .reshape(k, 2, hp, 4 * wx)
        )
    return jnp.stack(blocks, axis=1)


def _hat2d(coords_col: jnp.ndarray, n: int) -> jnp.ndarray:
    """[M, 1] fractional coords -> [M, n] hat weights (integer iota —
    Mosaic's tpu.iota is integer-only)."""
    i = jax.lax.broadcasted_iota(
        jnp.int32, (coords_col.shape[0], n), 1
    ).astype(jnp.float32)
    return jnp.clip(1.0 - jnp.abs(coords_col - i), 0.0, 1.0)


def _onehot2d(idx_col: jnp.ndarray, n: int) -> jnp.ndarray:
    i = jax.lax.broadcasted_iota(jnp.int32, (idx_col.shape[0], n), 1)
    return (idx_col == i).astype(jnp.float32)


def kernel_tables(tables: IntegrationTables) -> jnp.ndarray:
    """Kernel-layout warp table [K, NB, 4, B3]: channel-major brick slices
    (lane-friendly VMEM layout), channel dim padded to the sublane tile so
    whole-brick DMA slices stay aligned. Pure function of the calibration —
    compute ONCE and cache (the relayout costs ~10 ms per call at 256^3)."""
    return jnp.pad(
        jnp.transpose(tables.pos_blocked, (0, 1, 3, 2)),
        ((0, 0),) * 2 + ((0, 1), (0, 0)),
    )


def win_offsets_pallas(tables: IntegrationTables, h: int, w: int) -> jnp.ndarray:
    """Per-brick per-sensor (y8, xb) window selectors i32[K, NB, 2]:
    y8 = 8-aligned row origin for a WY-row window; xb = overlapping x-block
    index (stride XSTRIDE, width WX), both centered on the footprint
    midpoint of the brick's valid projections."""
    nxb = w // XSTRIDE - 1
    pc = tables.pos_blocked  # [K, NB, B3, 3]
    u, v = pc[..., 0], pc[..., 1]
    invalid = u < 0.0
    big = jnp.float32(1e9)
    ux = jnp.clip(u * w - 0.5, 0.0, w - 1.0)
    vy = jnp.clip(v * h - 0.5, 0.0, h - 1.0)
    x_mid = (jnp.min(jnp.where(invalid, big, ux), axis=-1)
             + jnp.max(jnp.where(invalid, -big, ux), axis=-1)) * 0.5
    y_mid = (jnp.min(jnp.where(invalid, big, vy), axis=-1)
             + jnp.max(jnp.where(invalid, -big, vy), axis=-1)) * 0.5
    xb = jnp.clip(
        (jnp.floor(x_mid).astype(jnp.int32) - WX // 2 + XSTRIDE // 2) // XSTRIDE,
        0, nxb - 1,
    )
    y8 = jnp.clip(
        (jnp.floor(y_mid).astype(jnp.int32) - WY // 2) & ~7, 0, h - WY
    )
    return jnp.stack([y8, xb], axis=-1)


def _kernel(
    # scalar prefetch
    sel_ref, offs_ref,
    # inputs
    tbl_ref,      # HBM  [K, NB, 4, B3] (manual predicated DMA, padded)
    packed_ref,   # HBM  [K, NXB, 6, H, WX] (manual window DMA)
    corner_ref,   # VMEM [K, 8]
    # outputs (HBM — written once per brick by manual DMA; the BlockSpec
    # output machinery copied blocks back EVERY program because dynamic
    # index maps defeat revisit detection: ~6 us per program, half the
    # kernel time)
    vol_ref,      # HBM [NB+1, 32, 128]
    cvol_ref,     # HBM [NB+1, 4, 32, 128]
    # scratch (persist across grid steps)
    wnd_ref,      # VMEM [2, 6, WY, WX] (double-buffered sensor windows)
    tblv_ref,     # VMEM [4, B3] (current brick's warp-table slice, padded)
    vblk_ref,     # VMEM [32, 128] assembled output block
    cblk_ref,     # VMEM [4, 32, 128]
    wt_ref,       # VMEM [CH, HB]  weighted TSDF
    tw_ref,       # VMEM [CH, HB]  total weight
    tc_ref,       # VMEM [3, CH, HB]
    tcw_ref,      # VMEM [CH, HB]
    tc2_ref,      # VMEM [3, CH, HB]
    tcw2_ref,     # VMEM [CH, HB]
    sems,
    *, num_k: int, h: int, w: int, limit: float, nb_trash: int,
):
    i = pl.program_id(0)
    k = pl.program_id(1)
    n_windows = pl.num_programs(0) * num_k

    idx = i * num_k + k          # window sequence number
    slot = jax.lax.rem(idx, 2)

    def win_dma(widx, wslot):
        po = offs_ref[widx]
        return pltpu.make_async_copy(
            packed_ref.at[
                jax.lax.rem(widx, num_k), po & 0xFFFF, :,
                pl.ds(po >> 16, WY), :,
            ],
            wnd_ref.at[wslot],
            sems.at[wslot],
        )

    # ~95% of slots past the occupied count are padding; every DMA and all
    # compute are predicated on brick validity (valid bricks form a prefix
    # of the occupied list, so start/wait pairs stay consistent)
    valid_cur = sel_ref[i] != nb_trash
    j_next = jnp.minimum(jax.lax.div(idx + 1, num_k), pl.num_programs(0) - 1)
    valid_next = sel_ref[j_next] != nb_trash

    @pl.when(jnp.logical_and(idx == 0, valid_cur))
    def _bootstrap():
        win_dma(0, 0).start()

    @pl.when(valid_cur)
    def _rotate():
        tbl_dma = pltpu.make_async_copy(
            tbl_ref.at[k, sel_ref[i]], tblv_ref, sems.at[2]
        )
        tbl_dma.start()
        win_dma(idx, slot).wait()

        @pl.when(jnp.logical_and(idx + 1 < n_windows, valid_next))
        def _prefetch():
            win_dma(idx + 1, jax.lax.rem(idx + 1, 2)).start()

        tbl_dma.wait()

    @pl.when(valid_cur)
    def _compute():
      packed_off = offs_ref[idx]
      y_lo = packed_off >> 16
      xblk = packed_off & 0xFFFF

      def chunk_body(ch, _):
        # CH == 2: lane-dim table halves picked with STATIC slices per
        # branch (a dynamic lane slice forces a relayout)
        pc = jax.lax.cond(
            ch == 0,
            lambda: tblv_ref[:, :HB],
            lambda: tblv_ref[:, HB:],
        )                                         # [4(pad), HB]
        u, v, d_vox = pc[0], pc[1], pc[2]
        invalid = u < 0.0
        ux_l = jnp.clip(u * w - 0.5, 0.0, w - 1.0)
        vy_l = jnp.clip(v * h - 0.5, 0.0, h - 1.0)
        ux_n = jnp.clip(jnp.floor(u * w), 0.0, w - 1.0).astype(jnp.int32)
        vy_n = jnp.clip(jnp.floor(v * h), 0.0, h - 1.0).astype(jnp.int32)
        x_lo = xblk * XSTRIDE
        ux_l = jnp.clip(ux_l - x_lo.astype(jnp.float32), 0.0, WX - 1.0)
        vy_l = jnp.clip(vy_l - y_lo.astype(jnp.float32), 0.0, WY - 1.0)
        ux_n = jnp.clip(ux_n - x_lo, 0, WX - 1)
        vy_n = jnp.clip(vy_n - y_lo, 0, WY - 1)

        rows_l = _hat2d(vy_l[:, None], WY)        # [HB, WY]
        rows_n = _onehot2d(vy_n[:, None], WY)
        cols_l = _hat2d(ux_l[:, None], WX)        # [HB, WX]
        cols_n = _onehot2d(ux_n[:, None], WX)

        bf16 = jnp.bfloat16
        rows_l16 = rows_l.astype(bf16)
        rows_n16 = rows_n.astype(bf16)            # 0/1 — exact in bf16
        wnd = wnd_ref[slot]                       # [6, WY, WX]
        d = wnd[0]
        d_hi = jnp.floor(d * 256.0) * (1.0 / 256.0)
        d_lo = d - d_hi
        dd = jnp.concatenate([d_hi, d_lo], axis=1).astype(bf16)   # [WY, 2*WX]
        nt = jnp.dot(rows_n16, dd, preferred_element_type=jnp.float32)
        depth = jnp.sum((nt[:, :WX] + nt[:, WX:]) * cols_n, axis=1)

        qrgb = jnp.concatenate(
            [wnd[2], wnd[1], wnd[3], wnd[4], wnd[5]], axis=1
        ).astype(bf16)
        lin = jnp.dot(rows_l16, qrgb, preferred_element_type=jnp.float32)
        sil = jnp.sum(lin[:, 0 * WX:1 * WX] * cols_l, axis=1)
        qual = jnp.sum(lin[:, 1 * WX:2 * WX] * cols_l, axis=1)
        r_ = jnp.sum(lin[:, 2 * WX:3 * WX] * cols_l, axis=1)
        g_ = jnp.sum(lin[:, 3 * WX:4 * WX] * cols_l, axis=1)
        b_ = jnp.sum(lin[:, 4 * WX:5 * WX] * cols_l, axis=1)

        cv = corner_ref[k]
        depth = jnp.where(invalid, cv[0], depth)
        qual = jnp.where(invalid, cv[1], qual)
        sil = jnp.where(invalid, cv[2], sil)
        r_ = jnp.where(invalid, cv[3], r_)
        g_ = jnp.where(invalid, cv[4], g_)
        b_ = jnp.where(invalid, cv[5], b_)

        # fusion state for this chunk (reset on the first sensor)
        first = k == 0
        wt = jnp.where(first, jnp.full((HB,), limit, jnp.float32), wt_ref[ch])
        tw = jnp.where(first, 0.0, tw_ref[ch])
        tc = jnp.where(first, 0.0, tc_ref[:, ch, :])
        tcw = jnp.where(first, 0.0, tcw_ref[ch])
        tc2 = jnp.where(first, 0.0, tc2_ref[:, ch, :])
        tcw2 = jnp.where(first, 0.0, tcw2_ref[ch])

        # TSDF update (tsdf_integration.vs:33-54)
        sdist = d_vox - depth
        skip = (sil < SIL_PL) & (wt >= limit)
        in_front = sdist <= -limit
        in_band = (sdist > -limit) & (sdist < limit)
        new_tw = tw + qual
        accum = jnp.where(
            new_tw > 0.0,
            (wt * tw + qual * sdist) / jnp.where(new_tw > 0.0, new_tw, 1.0),
            wt,
        )
        wt_next = jnp.where(in_front, -limit, jnp.where(in_band, accum, wt))
        tw_next = jnp.where(in_band & (new_tw > 0.0), new_tw, tw)
        wt = jnp.where(skip, -limit, wt_next)
        tw = jnp.where(skip, tw, tw_next)

        # color blend terms (tsdf_raymarch.fs:295-320)
        dist = jnp.abs(depth - d_vox)
        q_c = jnp.where(dist < limit, qual, 0.0)
        w_c = q_c / (dist + 0.01)
        rgb = jnp.stack([r_, g_, b_])
        tc = tc + rgb * w_c[None, :]
        tcw = tcw + w_c
        w2 = 1.0 / jnp.maximum(dist, 1e-9)
        tc2 = tc2 + rgb * w2[None, :]
        tcw2 = tcw2 + w2

        wt_ref[ch] = wt
        tw_ref[ch] = tw
        tc_ref[:, ch, :] = tc
        tcw_ref[ch] = tcw
        tc2_ref[:, ch, :] = tc2
        tcw2_ref[ch] = tcw2

        @pl.when(k == num_k - 1)
        def _finalize():
            hasq = tcw > 0.0
            rgb_out = jnp.where(
                hasq[None, :],
                tc / jnp.maximum(tcw, 1e-20)[None, :],
                tc2 / jnp.maximum(tcw2, 1e-20)[None, :],
            )
            flag = jnp.where(hasq, 1.0, -1.0)
            hrows = HB // 128
            vblk_ref[pl.ds(ch * hrows, hrows), :] = wt.reshape(hrows, 128)
            cblk_ref[:, pl.ds(ch * hrows, hrows), :] = jnp.concatenate(
                [rgb_out, flag[None, :]], axis=0
            ).reshape(4, hrows, 128)

            @pl.when(ch == CH - 1)
            def _flush():
                dv = pltpu.make_async_copy(
                    vblk_ref, vol_ref.at[sel_ref[i]], sems.at[3]
                )
                dc = pltpu.make_async_copy(
                    cblk_ref, cvol_ref.at[sel_ref[i]], sems.at[4]
                )
                dv.start()
                dc.start()
                dv.wait()
                dc.wait()

        return 0

      jax.lax.fori_loop(0, CH, chunk_body, 0)


def expand_xblocks(packed_cf: jnp.ndarray) -> jnp.ndarray:
    """[K, 6, H, W] -> overlapping x-blocks [K, NXB, 6, H, WX]
    (stride XSTRIDE). 2x image memory; lets window DMA pick x via an
    untiled leading index."""
    k, c, h, w = packed_cf.shape
    nxb = w // XSTRIDE - 1
    return jnp.stack(
        [packed_cf[..., j * XSTRIDE : j * XSTRIDE + WX] for j in range(nxb)],
        axis=1,
    )


def integrate_sparse_pallas(
    frames,
    tables: IntegrationTables,
    cfg: TsdfConfig,
    mask16: jnp.ndarray,
    max_bricks: int = 1024,
    win_off: jnp.ndarray | None = None,
    tables_kernel: jnp.ndarray | None = None,
    interpret: bool = False,
):
    """Drop-in replacement for tsdf_fast.integrate_sparse (same update math,
    VMEM-fused; window placement granularity differs as documented above).
    ``win_off``: cached win_offsets_pallas. ``interpret=True`` runs the
    Pallas interpreter (CPU tests)."""
    vx, vy, vz = cfg.res
    nb = (vx // BRICK) * (vy // BRICK) * (vz // BRICK)
    assert tables.pos_blocked.shape[1] == nb
    packed = pack_frames(frames)                 # [K, H, W, 6]
    num_k, h, w, _ = packed.shape
    packed_cf = jnp.transpose(packed, (0, 3, 1, 2))   # [K, 6, H, W]
    packed_xb = expand_xblocks(packed_cf)
    corner = jnp.pad(packed[:, 0, 0, :], ((0, 0), (0, 2)))  # [K, 8]

    idx_list, valid_list = occupied_list(mask16, max_bricks)
    if win_off is None:
        win_off = win_offsets_pallas(tables, h, w)
    if tables_kernel is None:
        tables_kernel = kernel_tables(tables)
    offs3 = jnp.transpose(win_off[:, idx_list], (1, 0, 2))  # [MB, K, 2]
    # pack (y8, xb) into one i32 and flatten: SMEM prefetch arrays pad the
    # minor dimension to full lanes, so keep them 1-D
    offs = (offs3[..., 0] << 16 | offs3[..., 1]).reshape(-1)  # [MB * K]

    tables_t = tables_kernel

    # invalid entries write the trash block NB
    sel = jnp.where(valid_list, idx_list, nb).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # sel, offs
        grid=(max_bricks, num_k),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),    # tables_t (manual DMA)
            pl.BlockSpec(memory_space=pltpu.HBM),    # packed_xb (manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # corner
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 6, WY, WX), jnp.float32),
            pltpu.VMEM((4, B3), jnp.float32),
            pltpu.VMEM((32, 128), jnp.float32),
            pltpu.VMEM((4, 32, 128), jnp.float32),
            pltpu.VMEM((CH, HB), jnp.float32),       # wt
            pltpu.VMEM((CH, HB), jnp.float32),       # tw
            pltpu.VMEM((3, CH, HB), jnp.float32),    # tc
            pltpu.VMEM((CH, HB), jnp.float32),       # tcw
            pltpu.VMEM((3, CH, HB), jnp.float32),    # tc2
            pltpu.VMEM((CH, HB), jnp.float32),       # tcw2
            pltpu.SemaphoreType.DMA((5,)),
        ],
    )

    kernel = functools.partial(
        _kernel, num_k=num_k, h=h, w=w, limit=float(cfg.limit), nb_trash=nb,
    )

    vol_bm, cvol_bm = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb + 1, 32, 128), jnp.float32),
            jax.ShapeDtypeStruct((nb + 1, 4, 32, 128), jnp.float32),
        ],
        interpret=interpret,
    )(sel, offs, tables_t, packed_xb, corner)

    # assemble: unwritten blocks are garbage (outputs are DMA'd only for
    # occupied bricks) — mask to clear values, drop the trash block,
    # transpose block-major -> voxel order
    visited = jnp.zeros((nb + 1,), jnp.bool_).at[sel].set(True, mode="drop")[:nb]
    blocks = jnp.where(visited[:, None], vol_bm[:nb].reshape(nb, B3), -cfg.limit)
    cvol_bm = jnp.where(
        visited[:, None, None], cvol_bm[:nb].reshape(nb, 4, B3), 0.0
    )
    nz, ny, nx = vz // BRICK, vy // BRICK, vx // BRICK
    vol = (
        blocks.reshape(nz, ny, nx, BRICK, BRICK, BRICK)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(vz, vy, vx)
    )
    cvol = (
        cvol_bm.reshape(nz, ny, nx, 4, BRICK, BRICK, BRICK)
        .transpose(0, 4, 1, 5, 2, 6, 3)
        .reshape(vz, vy, vx, 4)
    )
    return vol, cvol
