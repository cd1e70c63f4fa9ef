"""Persistent-program Pallas TSDF integration (affine warp edition).

Round-2's kernel (ops/tsdf_pallas.py) laid the work out as a
(max_bricks x sensors) Pallas grid: ~8192 program slots per frame, ~95% of
them padding (predicated off), at a measured ~6.4 us of per-program
sequencing overhead on the target — ~52 ms/frame of pure overhead, by far
the largest single cost in the pipeline. A TPU v5e core runs grid programs
SEQUENTIALLY anyway, so the grid bought nothing but overhead.

This kernel is ONE program. It reads the occupied-brick count from scalar
prefetch and runs a dynamic-trip ``fori_loop`` over exactly the occupied
bricks — no padding slots, no per-program overhead, and the loop body keeps
the whole machinery of the old kernel:

  * per-brick sensor image windows (channel-paired, 4 groups x WY x 128)
    double-buffered via manual DMA (brick b+1's windows prefetch while
    brick b computes),
  * gather-as-matmul sampling: NEAREST depth via exact one-hot weights +
    hi/lo split, LINEAR quality/silhouette/color via bf16 hat weights
    (same exactness argument as tsdf_pallas.py, SIL_PL gate),
  * per-chunk fusion state in registers (sensors unrolled inside the loop
    body instead of spread across grid steps — no scratch round-trips),
  * double-buffered output flush (one 16^3 block + color block per brick).

The voxel->sensor warp comes from per-brick QUADRATIC COEFFICIENTS
(ops/tsdf_affine.py) instead of the ~800 MB dense table: 30 floats per
brick x sensor, evaluated in-kernel as one tiny matmul against the static
local-coordinate basis. This removes the table DMA entirely (the old
kernel's largest input stream) and the minutes-long bake.

Validity: the affine model extrapolates smoothly, so off-frustum voxels
are gated analytically — (u, v, d) outside [0,1]^3 is invalid — replacing
the table's interpolated (-1) markers (calibration_inverter.cpp:95-98).
Invalid voxels take the image corner values, the GL clamp behaviour of
sampling at (-1,-1) (tsdf_integration.vs:31-39).

Reference math: tsdf_integration.vs:23-59 (fusion update),
tsdf_raymarch.fs:295-320 (color blend terms), recon_integration.cpp:242-269
(per-occupied-brick integration loop).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tsdf import TsdfConfig
from .tsdf_fast import BRICK, occupied_list, pack_frames
from .tsdf_affine import AffineTables, NBASIS, _brick_basis, win_offsets_affine

from .tsdf_pallas import (
    B3, SIL_PL, WY, WX2, XSTRIDE2, _hat2d, _onehot2d,
    expand_xblocks_pairs, pack_pairs,
)

NB_PAD = 16   # basis rows padded to a sublane tile

def fuse_chunk(pc_all, wnd_k, po_b, corner_ref, *, num_k, h, w, limit,
               strip: str = ""):
    """Per-chunk multi-sensor TSDF + color fusion (tsdf_integration.vs:23-59,
    tsdf_raymarch.fs:295-320) on warped coords ``pc_all`` [K*4, HB].

    ``wnd_k(k)`` -> f32[4, WY, 128] sensor window in the channel-PAIRED
    layout (tsdf_pallas.expand_xblocks_pairs): groups (d_hi|d_lo, sil|qual,
    r|g, b|0) with two 64-px channels per lane tile. ``po_b[k]`` packed
    window origin. Returns (wt f32[HB], rgb_out f32[3, HB], flag f32[HB]).
    Shared by the block-major kernel below and the dense-emit kernel
    (ops/tsdf_dense.py) so the fusion math exists exactly once.

    Why pairs (measured on the v5e, 256^3/512 bricks): the unpaired layout
    needed 7 output lane tiles per sensor (depth hi+lo at 128 px + 5
    linear channels at 128 px) and x reductions over 896 lanes — but the
    x-window guarantee (footprint centered, stride-quantized) only ever
    used ~64 of the 128 px. Packing two channels per tile at WX2=64 keeps
    the SAME two K=WY matmuls per sensor at 4 output tiles and halves the
    reduction lanes. MXU time scales with K x N-tiles (a stacked-K=128
    single-matmul variant measured slower: 128 x 4 > 48 x (1+3)).
    Exactness is unchanged: one-hot/hat rows select <= 2 f32-accumulated
    terms and the hi/lo depth split still reconstructs to ~2^-16.

    ``strip``: BENCHMARK-ONLY cost bisection (scripts/bisect_integrate.py;
    wrong results by design): 'nomm' replaces the sampling matmuls with a
    scalar broadcast, 'noxred' replaces the x lane-reductions with a lane
    pick, 'nofuse' skips the fusion/blend update chain. Empty = real math."""
    hb = pc_all.shape[1]
    wt = jnp.full((hb,), limit, jnp.float32)
    tw = jnp.zeros((hb,), jnp.float32)
    tc = jnp.zeros((3, hb), jnp.float32)
    tcw = jnp.zeros((hb,), jnp.float32)
    tc2 = jnp.zeros((3, hb), jnp.float32)
    tcw2 = jnp.zeros((hb,), jnp.float32)

    for k in range(num_k):
        u = pc_all[4 * k + 0]
        v = pc_all[4 * k + 1]
        d_vox = pc_all[4 * k + 2]
        # analytic frustum gate: outside the (u, v, d) unit box
        invalid = (
            (u < 0.0) | (u > 1.0) | (v < 0.0) | (v > 1.0)
            | (d_vox < 0.0) | (d_vox > 1.0)
        )
        # offs packs the y origin's 8-row tile index (y/8): the in-kernel
        # *8 lets Mosaic prove the window DMA offset's tile divisibility
        y_lo = (po_b[k] >> 16) * 8
        x_lo = (po_b[k] & 0xFFFF) * XSTRIDE2
        ux_l = jnp.clip(u * w - 0.5, 0.0, w - 1.0)
        vy_l = jnp.clip(v * h - 0.5, 0.0, h - 1.0)
        ux_n = jnp.clip(jnp.floor(u * w), 0.0, w - 1.0).astype(jnp.int32)
        vy_n = jnp.clip(jnp.floor(v * h), 0.0, h - 1.0).astype(jnp.int32)
        ux_l = jnp.clip(ux_l - x_lo.astype(jnp.float32), 0.0, WX2 - 1.0)
        vy_l = jnp.clip(vy_l - y_lo.astype(jnp.float32), 0.0, WY - 1.0)
        ux_n = jnp.clip(ux_n - x_lo, 0, WX2 - 1)
        vy_n = jnp.clip(vy_n - y_lo, 0, WY - 1)

        bf16 = jnp.bfloat16
        if strip == "noweights":  # bisect: weight construction -> 1 op each
            ones_y = jnp.ones((1, WY), jnp.float32)
            ones_x = jnp.ones((1, WX2), jnp.float32)
            rows_n16 = (vy_n[:, None].astype(jnp.float32) * ones_y).astype(bf16)
            rows_l16 = (vy_l[:, None] * ones_y).astype(bf16)
            cols_l = ux_l[:, None] * ones_x
            cols_n = ux_n[:, None].astype(jnp.float32) * ones_x
        else:
            rows_n16 = _onehot2d(vy_n[:, None], WY).astype(bf16)  # 0/1 — exact
            rows_l16 = _hat2d(vy_l[:, None], WY).astype(bf16)
            cols_l = _hat2d(ux_l[:, None], WX2)   # [HB, 64] f32 (VPU side)
            cols_n = _onehot2d(ux_n[:, None], WX2)

        wnd = wnd_k(k)                            # f32 [4, WY, 128]
        if strip == "nomm":   # bisect: shrink the sampling contraction K
            # 48 -> 8 (structurally identical matmuls; a plain broadcast
            # crashes the Mosaic lowering): mm(48) ~= (full - this) * 48/40
            nt = jnp.dot(rows_n16[:, :8], wnd[0][:8].astype(bf16),
                         preferred_element_type=jnp.float32)
            lin = jnp.dot(
                rows_l16[:, :8],
                jnp.concatenate([wnd[1], wnd[2], wnd[3]], axis=1)[:8].astype(bf16),
                preferred_element_type=jnp.float32,
            )
        else:
            # depth pair (hi|lo): ONE output tile; linear pairs: THREE
            nt = jnp.dot(rows_n16, wnd[0].astype(bf16),
                         preferred_element_type=jnp.float32)   # [HB, 128]
            lin = jnp.dot(
                rows_l16,
                jnp.concatenate([wnd[1], wnd[2], wnd[3]], axis=1).astype(bf16),
                preferred_element_type=jnp.float32,
            )                                     # [HB, 384]

        if strip == "noxred":  # bisect: lane reductions (and col weights) off
            depth = nt[:, 0]
            sil, qual = lin[:, 0], lin[:, 1]
            r_, g_, b_ = lin[:, 2], lin[:, 3], lin[:, 4]
        else:
            # x contraction stays a VPU lane-reduce (f32 exact; a bf16
            # ones-matvec variant was measured slower AND lossy — rejected,
            # docs/PERF.md). Lane halves fold first: 64-wide reduces.
            depth = jnp.sum((nt[:, :WX2] + nt[:, WX2:]) * cols_n, axis=1)
            cols5 = jnp.concatenate([cols_l] * 5, axis=1)     # [HB, 320]
            prod = lin[:, :5 * WX2] * cols5
            sil = jnp.sum(prod[:, 0 * WX2:1 * WX2], axis=1)
            qual = jnp.sum(prod[:, 1 * WX2:2 * WX2], axis=1)
            r_ = jnp.sum(prod[:, 2 * WX2:3 * WX2], axis=1)
            g_ = jnp.sum(prod[:, 3 * WX2:4 * WX2], axis=1)
            b_ = jnp.sum(prod[:, 4 * WX2:5 * WX2], axis=1)

        cv = corner_ref[k]
        depth = jnp.where(invalid, cv[0], depth)
        qual = jnp.where(invalid, cv[1], qual)
        # pack_pairs stores (1 - sil); unflip (f32-exact) for the gate
        sil = 1.0 - jnp.where(invalid, 1.0 - cv[2], sil)
        r_ = jnp.where(invalid, cv[3], r_)
        g_ = jnp.where(invalid, cv[4], g_)
        b_ = jnp.where(invalid, cv[5], b_)

        if strip == "nofuse":  # bisect: fusion/blend update chain off
            # accumulate (not overwrite): every sensor's sampling must stay
            # live or the compiler dead-code-eliminates all but the last
            wt = wt + depth
            tw = tw + qual
            tc = tc + jnp.stack([r_, g_, b_])
            tcw = tcw + sil
            continue

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

    hasq = tcw > 0.0
    rgb_out = jnp.where(
        hasq[None, :],
        tc / jnp.maximum(tcw, 1e-20)[None, :],
        tc2 / jnp.maximum(tcw2, 1e-20)[None, :],
    )
    flag = jnp.where(hasq, 1.0, -1.0)
    return wt, rgb_out, flag




def fuse_chunk_v2(pc_all, wnd_k, po_b, corner_ref, *, num_k, h, w, limit,
                  strip: str = ""):
    """``fuse_chunk`` with the per-voxel coordinate soup restructured
    (measured round 4: the clip/floor/scale chains on [HB] rank-1 vectors
    and their [:, None] relayouts were a double-digit-ms cost at 256^3 —
    bigger than the sampling matmuls they feed):

    * the affine transforms u -> u*w - 0.5 - x_lo / v -> v*h - 0.5 - y_lo
      are FOLDED INTO THE WARP COEFFICIENTS in prep (fold_window_coords),
      so ``pc_all`` rows arrive already in window-relative pixel coords;
    * gates and clips run ONCE on the [K*4, HB] bulk array (full-sublane
      2D ops) against per-row bound columns built from the offs scalars,
      instead of ~16 rank-1 ops per sensor.

    Numerically identical up to f32 re-association of the folded scale
    (≲1e-4 px); the clip/floor identities are exact (x_lo, y_lo integer).
    """
    hb = pc_all.shape[1]
    nr = 4 * num_k
    rid = jax.lax.broadcasted_iota(jnp.int32, (nr, 1), 0)
    zc = jnp.zeros((nr, 1), jnp.float32)
    hi = zc        # linear/nearest upper clip per row
    ivlo = zc      # frustum-gate bounds per row (window-relative px)
    ivhi = zc
    for k in range(num_k):
        y_lo = ((po_b[k] >> 16) * 8).astype(jnp.float32)
        x_lo = ((po_b[k] & 0xFFFF) * XSTRIDE2).astype(jnp.float32)
        ubx = jnp.minimum(jnp.float32(w - 1) - x_lo, WX2 - 1.0)
        uby = jnp.minimum(jnp.float32(h - 1) - y_lo, WY - 1.0)
        hi = jnp.where(rid == 4 * k, ubx, hi)
        hi = jnp.where(rid == 4 * k + 1, uby, hi)
        # u < 0 <=> u_px < -0.5 - x_lo etc.; d gates at [0, 1] unscaled
        ivlo = jnp.where(rid == 4 * k, -0.5 - x_lo, ivlo)
        ivlo = jnp.where(rid == 4 * k + 1, -0.5 - y_lo, ivlo)
        ivhi = jnp.where(rid == 4 * k, jnp.float32(w) - 0.5 - x_lo, ivhi)
        ivhi = jnp.where(rid == 4 * k + 1, jnp.float32(h) - 0.5 - y_lo, ivhi)
        ivhi = jnp.where(rid == 4 * k + 2, 1.0, ivhi)

    inv3 = (pc_all < ivlo) | (pc_all > ivhi)      # [K*4, HB]
    pcl = jnp.clip(pc_all, 0.0, hi)               # linear sample coords
    pcn = jnp.clip(jnp.floor(pc_all + 0.5), 0.0, hi)  # nearest (exact ints)

    bf16 = jnp.bfloat16
    wt = jnp.full((hb,), limit, jnp.float32)
    tw = jnp.zeros((hb,), jnp.float32)
    tc = jnp.zeros((3, hb), jnp.float32)
    tcw = jnp.zeros((hb,), jnp.float32)
    tc2 = jnp.zeros((3, hb), jnp.float32)
    tcw2 = jnp.zeros((hb,), jnp.float32)

    for k in range(num_k):
        invalid = inv3[4 * k] | inv3[4 * k + 1] | inv3[4 * k + 2]
        d_vox = pc_all[4 * k + 2]
        # hat of integer-valued coords IS the one-hot — one constructor
        rows_n16 = _hat2d(pcn[4 * k + 1][:, None], WY).astype(bf16)
        rows_l16 = _hat2d(pcl[4 * k + 1][:, None], WY).astype(bf16)
        cols_n = _hat2d(pcn[4 * k][:, None], WX2)
        cols_l = _hat2d(pcl[4 * k][:, None], WX2)

        wnd = wnd_k(k)                            # f32 [4, WY, 128]
        # depth path stays f32: the hi/lo pair fold needs ~2^-16
        nt = jnp.dot(rows_n16, wnd[0].astype(bf16),
                     preferred_element_type=jnp.float32)   # [HB, 128]
        depth = jnp.sum((nt[:, :WX2] + nt[:, WX2:]) * cols_n, axis=1)

        # linear channels run bf16 END-TO-END (VERDICT r4 #1 follow-up:
        # the kernel is bound by VMEM traffic of these [HB, 384]
        # intermediates, not ALU — halving their bytes is the lever).
        # Values are 8-bit colors, a smooth quality weight and the FLIPPED
        # silhouette (near 0 at the gate margin): all carry bf16's ~2^-9
        # relative error, the deviation class the SIL_PL gate and color
        # budget were designed for. Hat weights have <= 2 nonzero taps, so
        # the bf16 tree-sum adds one rounding step, not sqrt(n).
        lin = jnp.dot(
            rows_l16,
            jnp.concatenate([wnd[1], wnd[2], wnd[3]], axis=1).astype(bf16),
            preferred_element_type=jnp.float32,   # Mosaic: acc must be 32-bit
        ).astype(bf16)                            # [HB, 384] bf16
        cols_l16 = cols_l.astype(bf16)
        cols6 = jnp.concatenate(
            [cols_l16] * 5 + [jnp.zeros_like(cols_l16)], axis=1
        )                                         # [HB, 384] bf16
        prod = lin * cols6
        f32 = jnp.float32
        sil = jnp.sum(prod[:, 0 * WX2:1 * WX2], axis=1).astype(f32)
        qual = jnp.sum(prod[:, 1 * WX2:2 * WX2], axis=1).astype(f32)
        r_ = jnp.sum(prod[:, 2 * WX2:3 * WX2], axis=1).astype(f32)
        g_ = jnp.sum(prod[:, 3 * WX2:4 * WX2], axis=1).astype(f32)
        b_ = jnp.sum(prod[:, 4 * WX2:5 * WX2], axis=1).astype(f32)

        cv = corner_ref[k]
        depth = jnp.where(invalid, cv[0], depth)
        qual = jnp.where(invalid, cv[1], qual)
        # the sampled plane is (1 - sil) (pack_pairs): the corner holds the
        # unflipped value, and the gate stays in the flipped basis where
        # bf16 sampling is relatively exact near the margin
        sflip = jnp.where(invalid, 1.0 - cv[2], sil)
        r_ = jnp.where(invalid, cv[3], r_)
        g_ = jnp.where(invalid, cv[4], g_)
        b_ = jnp.where(invalid, cv[5], b_)

        # TSDF update (tsdf_integration.vs:33-54)
        sdist = d_vox - depth
        skip = (sflip > 1.0 - SIL_PL) & (wt >= limit)
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

    hasq = tcw > 0.0
    rgb_out = jnp.where(
        hasq[None, :],
        tc / jnp.maximum(tcw, 1e-20)[None, :],
        tc2 / jnp.maximum(tcw2, 1e-20)[None, :],
    )
    flag = jnp.where(hasq, 1.0, -1.0)
    return wt, rgb_out, flag


def _fuse_update(carry, d_vox, depth, qual, sflip, rgb, limit):
    """One sensor's TSDF + color-blend update (tsdf_integration.vs:33-54,
    tsdf_raymarch.fs:295-320) on lane-major rows. ``depth``/``qual``/
    ``sflip`` may be broadcast scalars (the invalid-brick corner fold —
    identical arithmetic, so the fold is bit-exact vs the full body)."""
    wt, tw, tc, tcw, tc2, tcw2 = carry
    sdist = d_vox - depth
    skip = (sflip > 1.0 - SIL_PL) & (wt >= limit)
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

    dist = jnp.abs(depth - d_vox)
    q_c = jnp.where(dist < limit, qual, 0.0)
    w_c = q_c / (dist + 0.01)
    tc = tc + rgb * w_c[None, :]
    tcw = tcw + w_c
    w2 = 1.0 / jnp.maximum(dist, 1e-9)
    tc2 = tc2 + rgb * w2[None, :]
    tcw2 = tcw2 + w2
    return (wt, tw, tc, tcw, tc2, tcw2)


def fuse_chunk_v3(pc_all, wnd_k, po_b, corner_ref, *, num_k, h, w, limit,
                  strip: str = "", wy: int = WY, wx: int = WX2,
                  xstride: int = XSTRIDE2, quad: bool = False,
                  cls: bool = False):
    """``fuse_chunk_v2`` with the sampling stage TRANSPOSED: voxels live in
    LANES end-to-end.

    Why (measured, round 4): the voxel-major orientation put voxels in
    sublanes, so every weight plane was [HB, W] (HB/8 tile-rows per op),
    the x-contraction was a lane-reduce, and every per-voxel scalar was a
    rank-1 [HB] vector — instruction count, not FLOPs or bytes, bound the
    kernel (window size, precision and coordinate restructures all moved
    it <3%). Here:

      * weight planes are built TRANSPOSED ([W, HB]: taps in sublanes,
        voxels in lanes) directly from the lane-major coordinate rows of
        ``pc_all`` — no [:, None] column relayouts anywhere;
      * the sampling matmuls contract the window y against the transposed
        weights (dot_general ((0,), (0,)) — both operands contract dim 0,
        which the MXU streams natively) and emit [x_window, HB];
      * the x-contraction is elementwise mul + a SUBLANE-axis reduction
        (sublane slices are free, the fold tree shrinks the array each
        step), emitting [HB] lane-major rows;
      * the fusion/blend chain then runs on lane-major rows: 4 tiles per
        op instead of 512.

    Same math as v2 (folded window-relative coords, flipped silhouette,
    bf16 linear channels, f32 nearest-depth path).

    ``quad``: windows use the channel-QUADDED layout (expand_xblocks_quads,
    4 x wx-px channels per 128-lane plane — the chip-legal form of the
    half-tile x window): wnd_k(k) is [2, wy, 4*wx], and the y-stage runs
    one nearest matmul on plane 0 (depth quarters 0/1; the sil/qual
    quarters of that product are discarded) + one linear matmul on both
    planes concatenated (8*wx output lanes vs the pairs layout's 6*wx + a
    full depth tile — 384 vs 512 at wx=32 vs 64 — with half the window
    bytes and x-stage heights).

    ``cls``: per-(brick, sensor) integration classes ride in bits 24-25 of
    ``po_b`` (ops/tsdf_affine.block_depth_cull): 0 FULL runs the body; 1
    NONE (strictly behind a fully-live window — provably stateless) is
    skipped; 2 FRONT (strictly in front, fully live) folds to an
    unconditional wt = -limit; 3 INVALID (bake-invalid brick: every voxel
    takes the corner-pixel constants with d_vox = 0) runs the identical
    update chain on broadcast scalars — exact, no weights/matmuls. The
    branch is a per-sensor ``lax.switch`` on a scalar, so NONE/FRONT/
    INVALID sensors skip the weight construction, both sampling matmuls
    and the x-stage entirely. NONE/FRONT skip the inverse-distance
    fallback-color accumulation too (documented in block_depth_cull).

    ``strip`` (BENCHMARK-ONLY, wrong results): 'xnomm' replaces the
    sampling matmuls with slices of the weight planes; 'xnoxs' skips the
    x-stage subsums; 'xnowt' skips the transposed weight construction;
    'xnofu' skips the fusion/blend chain (accumulate raw samples)."""
    assert not (cls and strip), "strip bisects run classless"
    hb = pc_all.shape[1]
    nr = 4 * num_k
    rid = jax.lax.broadcasted_iota(jnp.int32, (nr, 1), 0)
    zc = jnp.zeros((nr, 1), jnp.float32)
    hi = zc
    ivlo = zc
    ivhi = zc
    for k in range(num_k):
        # po_b packs cls<<24 | y_tile<<16 | xblock (y tile fits 8 bits:
        # images up to 2040 rows)
        y_lo = (((po_b[k] >> 16) & 0xFF) * 8).astype(jnp.float32)
        x_lo = ((po_b[k] & 0xFFFF) * xstride).astype(jnp.float32)
        ubx = jnp.minimum(jnp.float32(w - 1) - x_lo, wx - 1.0)
        uby = jnp.minimum(jnp.float32(h - 1) - y_lo, wy - 1.0)
        hi = jnp.where(rid == 4 * k, ubx, hi)
        hi = jnp.where(rid == 4 * k + 1, uby, hi)
        ivlo = jnp.where(rid == 4 * k, -0.5 - x_lo, ivlo)
        ivlo = jnp.where(rid == 4 * k + 1, -0.5 - y_lo, ivlo)
        ivhi = jnp.where(rid == 4 * k, jnp.float32(w) - 0.5 - x_lo, ivhi)
        ivhi = jnp.where(rid == 4 * k + 1, jnp.float32(h) - 0.5 - y_lo, ivhi)
        ivhi = jnp.where(rid == 4 * k + 2, 1.0, ivhi)

    inv3 = (pc_all < ivlo) | (pc_all > ivhi)      # [K*4, HB]
    pcl = jnp.clip(pc_all, 0.0, hi)
    pcn = jnp.clip(jnp.floor(pc_all + 0.5), 0.0, hi)

    bf16 = jnp.bfloat16
    f32 = jnp.float32

    # weight-plane construction is a first-order VPU cost (4 planes x 4
    # sensors per brick): hoist the iotas out of the sensor loop, build
    # NEAREST planes as exact 0/1 comparisons (2 passes, not a hat), and
    # drop the redundant upper clip (1 - |d| <= 1 always)
    iota_y = jax.lax.broadcasted_iota(jnp.int32, (wy, hb), 0).astype(f32)
    iota_x = jax.lax.broadcasted_iota(jnp.int32, (wx, hb), 0).astype(f32)

    def hat_t(coords_row, iota):
        """[1, HB] coords -> transposed hat weights (taps in sublanes,
        voxels in lanes)."""
        return jnp.maximum(1.0 - jnp.abs(coords_row - iota), 0.0)

    def one_t(coords_row, iota, dt):
        """Integer-valued coords -> exact one-hot planes."""
        return (coords_row == iota).astype(dt)

    def subsum(x):
        """Sublane-axis sum via a halving fold tree (the array shrinks
        every step, unlike a lane reduce which stays full-width)."""
        n = x.shape[0]
        while n > 1:
            half = n // 2
            x = x[:half] + x[half:half * 2]
            n = half
        return x[0]

    def full_body(k, carry):
        wt, tw, tc, tcw, tc2, tcw2 = carry
        invalid = inv3[4 * k] | inv3[4 * k + 1] | inv3[4 * k + 2]
        d_vox = pc_all[4 * k + 2]
        rt_n = one_t(pcn[4 * k + 1:4 * k + 2], iota_y, bf16)     # [wy, HB]
        rt_l = hat_t(pcl[4 * k + 1:4 * k + 2], iota_y).astype(bf16)
        ct_n = one_t(pcn[4 * k:4 * k + 1], iota_x, f32)          # [WX2, HB]
        ct_l = hat_t(pcl[4 * k:4 * k + 1], iota_x).astype(bf16)

        wnd = wnd_k(k)        # bf16 [4, wy, 2*wx] pairs | [2, wy, 4*wx] quad
        nq = 4 if quad else 2         # channels per 128-lane window plane
        # linear channels start after the depth quarters in the quad
        # product (its plane 0 carries d_hi/d_lo ahead of 1-sil/qual)
        lo = 2 * wx if quad else 0
        if strip == "xnomm":  # bisect: sampling matmuls off (weights live)
            zx = jnp.concatenate([iota_x] * nq, axis=0) * 0.0
            nt = rt_n[0:1].astype(f32) + zx
            lin = (rt_l[0:1] + jnp.concatenate(
                [zx] * (2 if quad else 3), axis=0).astype(bf16))
        else:
            # y-stage, transposed output: [x_window, HB]
            nt = jax.lax.dot_general(
                wnd[0].astype(bf16), rt_n, (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )                                     # [nq*wx, HB] f32
            lin = jax.lax.dot_general(
                jnp.concatenate(
                    [wnd[0], wnd[1]] if quad else [wnd[1], wnd[2], wnd[3]],
                    axis=1).astype(bf16),
                rt_l, (((0,), (0,)), ((), ())),
                preferred_element_type=f32,   # Mosaic: acc must be 32-bit
            ).astype(bf16)                        # [(8|6)*wx, HB] bf16

        if strip == "xnoxs":  # bisect: x-stage mul+subsum off
            depth = nt[0] * ct_n[0]
            sil = lin[lo].astype(f32) * ct_l[0].astype(f32)
            qual, r_, g_, b_ = (lin[lo + i].astype(f32) for i in range(1, 5))
        else:
            # x-stage: sublane slices (free) + fold-tree sublane sums
            depth = subsum((nt[:wx] + nt[wx:2 * wx]) * ct_n)     # [HB] f32
            sil = subsum(lin[lo + 0 * wx:lo + 1 * wx] * ct_l).astype(f32)
            qual = subsum(lin[lo + 1 * wx:lo + 2 * wx] * ct_l).astype(f32)
            r_ = subsum(lin[lo + 2 * wx:lo + 3 * wx] * ct_l).astype(f32)
            g_ = subsum(lin[lo + 3 * wx:lo + 4 * wx] * ct_l).astype(f32)
            b_ = subsum(lin[lo + 4 * wx:lo + 5 * wx] * ct_l).astype(f32)

        cv = corner_ref[k]
        depth = jnp.where(invalid, cv[0], depth)
        qual = jnp.where(invalid, cv[1], qual)
        sflip = jnp.where(invalid, 1.0 - cv[2], sil)   # plane is (1 - sil)
        r_ = jnp.where(invalid, cv[3], r_)
        g_ = jnp.where(invalid, cv[4], g_)
        b_ = jnp.where(invalid, cv[5], b_)

        if strip == "xnofu":  # bisect: fusion/blend chain off (accumulate)
            return (wt + depth, tw + qual, tc + jnp.stack([r_, g_, b_]),
                    tcw + sflip, tc2, tcw2)

        return _fuse_update(carry, d_vox, depth, qual, sflip,
                            jnp.stack([r_, g_, b_]), limit)

    def inv_body(k, carry):
        """Bake-invalid brick (class 3): every voxel is out of bounds, so
        the full body substitutes the corner constants everywhere and
        d_vox = 0 (zeroed coefficients) — the identical update chain on
        broadcast scalars, no weights, matmuls or x-stage. Bit-exact."""
        cv = corner_ref[k]
        zero = jnp.zeros_like(carry[0])
        return _fuse_update(carry, zero, cv[0], cv[1], 1.0 - cv[2],
                            jnp.stack([cv[3], cv[4], cv[5]])[:, None] + zero,
                            limit)

    carry = (jnp.full((hb,), limit, f32), jnp.zeros((hb,), f32),
             jnp.zeros((3, hb), f32), jnp.zeros((hb,), f32),
             jnp.zeros((3, hb), f32), jnp.zeros((hb,), f32))

    # switch-branch results must be >= 2-D (Mosaic assigns layouts to
    # scf.if results; rank-1 [HB] vectors crash its layout pass), so the
    # carry crosses branches in the native (HB/128, 128) shape — free
    # relayout both ways
    def to2(c):
        return tuple(x.reshape(x.shape[:-1] + (hb // 128, 128)) for x in c)

    def to1(c):
        return tuple(x.reshape(x.shape[:-2] + (hb,)) for x in c)

    for k in range(num_k):
        if not cls:
            carry = full_body(k, carry)
            continue

        def front_fn(c, _k=k):
            return (jnp.full_like(c[0], -limit),) + c[1:]

        carry = to1(jax.lax.switch(
            jnp.clip(po_b[k] >> 24, 0, 3),
            [lambda c, _k=k: to2(full_body(_k, to1(c))),
             lambda c: c,                               # NONE
             front_fn,                                  # FRONT
             lambda c, _k=k: to2(inv_body(_k, to1(c)))],  # INVALID
            to2(carry),
        ))

    wt, tw, tc, tcw, tc2, tcw2 = carry
    hasq = tcw > 0.0
    rgb_out = jnp.where(
        hasq[None, :],
        tc / jnp.maximum(tcw, 1e-20)[None, :],
        tc2 / jnp.maximum(tcw2, 1e-20)[None, :],
    )
    flag = jnp.where(hasq, 1.0, -1.0)
    return wt, rgb_out, flag


def fold_window_coords(cmats: jnp.ndarray, offs3: jnp.ndarray, num_k: int,
                       h: int, w: int,
                       xstride: int = XSTRIDE2) -> jnp.ndarray:
    """Fold the window-relative pixel transform into the warp coefficients
    (fuse_chunk_v2's prep): u -> u*w - 0.5 - x_lo, v -> v*h - 0.5 - y_lo.
    ``cmats`` [MB, NBASIS, K*4] channel-lane order (u, v, d, pad) per
    sensor; ``offs3`` [MB, K, 2] = (y_origin_px, x_block)."""
    mb = cmats.shape[0]
    scale = jnp.tile(jnp.array([w, h, 1.0, 1.0], jnp.float32), num_k)
    cmats = cmats * scale[None, None, :]
    x_lo = offs3[..., 1].astype(jnp.float32) * xstride       # [MB, K]
    y_lo = offs3[..., 0].astype(jnp.float32)
    off = jnp.stack(
        [x_lo + 0.5, y_lo + 0.5, jnp.zeros_like(x_lo), jnp.zeros_like(x_lo)],
        axis=-1,
    ).reshape(mb, 4 * num_k)
    return cmats.at[:, 0, :].add(-off)


def _kernel(
    # scalar prefetch
    count_ref,    # i32[1]    occupied-brick count
    sel_ref,      # i32[MB]   brick index (into NB) per occupied slot
    offs_ref,     # i32[MB*K] packed window origin (y8 << 16 | xblock)
    # inputs
    cmat_ref,     # HBM f32[MB, NB_PAD, 128] per-slot warp coeffs,
                  # basis-major (cmat[b, a, 4k+c] = coeff of basis fn a for
                  # channel c of sensor k), lane dim padded to a full
                  # 128-lane tile: Mosaic rejects minor-dim slices < 128
                  # even on HBM memrefs. DMA'd per brick with the windows
    basis_ref,    # VMEM f32[NB_PAD, B3] quadratic local-coordinate basis
    corner_ref,   # VMEM f32[K, 8]    image corner values (GL clamp target)
    packed_ref,   # HBM  f32[K, NXB2, 4, Hp, 128] paired x-blocks
    # outputs
    vol_ref,      # HBM f32[NB, 32, 128]      TSDF blocks (block-major)
    cvol_ref,     # HBM bf16[NB, 4, 32, 128]  color blocks
    # scratch
    wnd_ref,      # VMEM f32[2, K, 4, WY, 128] (paired channels)
    cmbuf_ref,    # VMEM f32[2, NB_PAD, 128]
    vblk_ref,     # VMEM f32[2, 32, 128]
    cblk_ref,     # VMEM bf16[2, 4, 32, 128]
    win_sems,     # DMA (2, K)
    cm_sems,      # DMA (2,)
    out_sems,     # DMA (2, 2)
    *, num_k: int, h: int, w: int, limit: float, chunks: int,
    strip: str = "", variant: str = "v1", wy: int = WY,
):
    HB = B3 // chunks
    count = count_ref[0]

    def win_dma(b, slot, k):
        po = offs_ref[b * num_k + k]
        return pltpu.make_async_copy(
            packed_ref.at[k, po & 0xFFFF, :, pl.ds((po >> 16) * 8, wy), :],
            wnd_ref.at[slot, k],
            win_sems.at[slot, k],
        )

    def cm_dma(b, slot):
        return pltpu.make_async_copy(
            cmat_ref.at[b], cmbuf_ref.at[slot], cm_sems.at[slot]
        )

    def vol_dma(b, slot):
        return pltpu.make_async_copy(
            vblk_ref.at[slot], vol_ref.at[sel_ref[b]], out_sems.at[slot, 0]
        )

    def cvol_dma(b, slot):
        return pltpu.make_async_copy(
            cblk_ref.at[slot], cvol_ref.at[sel_ref[b]], out_sems.at[slot, 1]
        )

    @pl.when(count > 0)
    def _bootstrap():
        cm_dma(0, 0).start()
        for k in range(num_k):
            win_dma(0, 0, k).start()

    def body(b, _):
        slot = jax.lax.rem(b, 2)

        # prefetch the next brick's windows into the other slot (that slot's
        # previous windows were consumed in iteration b-1)
        @pl.when(b + 1 < count)
        def _prefetch():
            nslot = jax.lax.rem(b + 1, 2)
            cm_dma(b + 1, nslot).start()
            for k in range(num_k):
                win_dma(b + 1, nslot, k).start()

        # the output buffers for this slot were last DMA'd by brick b-2;
        # drain that copy before overwriting them
        @pl.when(b >= 2)
        def _drain():
            vol_dma(b - 2, slot).wait()
            cvol_dma(b - 2, slot).wait()

        cm_dma(b, slot).wait()
        for k in range(num_k):
            win_dma(b, slot, k).wait()

        po_b = [offs_ref[b * num_k + k] for k in range(num_k)]

        if strip == "dmaonly":  # bisect: DMA pipeline + loop sequencing only
            acc = sum(wnd_ref[slot, k, 0, 0, 0] for k in range(num_k))
            vblk_ref[slot] = jnp.full((32, 128), acc, jnp.float32)
            cblk_ref[slot] = jnp.zeros((4, 32, 128), jnp.bfloat16)
            vol_dma(b, slot).start()
            cvol_dma(b, slot).start()
            return 0

        for ch in range(chunks):
            # per-sensor warp: one tiny matmul per chunk against the static
            # quadratic basis — [NB_PAD, K*4]^T @ [NB_PAD, HB] -> rows
            # (u, v, d, pad) per sensor. The lhs is sliced to its real
            # columns BEFORE the dot: the 128-lane DMA padding would make
            # the HIGHEST multi-pass f32 product 8x wider (~25 us/brick of
            # pure combining). Mosaic supports only DEFAULT/HIGHEST here;
            # DEFAULT's single bf16 pass is too lossy for d_norm.
            cm_t = cmbuf_ref[slot][:, : num_k * 4]   # [NB_PAD, K*4]
            pc_all = jax.lax.dot_general(
                cm_t, basis_ref[:, ch * HB:(ch + 1) * HB],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                     # [K*4, HB]
            if variant == "v3":
                wt, rgb_out, flag = fuse_chunk_v3(
                    pc_all, lambda k: wnd_ref[slot, k], po_b, corner_ref,
                    num_k=num_k, h=h, w=w, limit=limit, strip=strip, wy=wy,
                )
            else:
                fuse = {"v1": fuse_chunk, "v2": fuse_chunk_v2}[variant]
                wt, rgb_out, flag = fuse(
                    pc_all, lambda k: wnd_ref[slot, k], po_b, corner_ref,
                    num_k=num_k, h=h, w=w, limit=limit, strip=strip,
                )
            hrows = HB // 128
            vblk_ref[slot, pl.ds(ch * hrows, hrows), :] = wt.reshape(hrows, 128)
            cblk_ref[slot, :, pl.ds(ch * hrows, hrows), :] = jnp.concatenate(
                [rgb_out, flag[None, :]], axis=0
            ).reshape(4, hrows, 128).astype(jnp.bfloat16)

        vol_dma(b, slot).start()
        cvol_dma(b, slot).start()
        return 0

    jax.lax.fori_loop(0, count, body, 0)

    # drain the last two bricks' output copies
    @pl.when(count >= 2)
    def _drain_m2():
        bb = count - 2
        s = jax.lax.rem(bb, 2)
        vol_dma(bb, s).wait()
        cvol_dma(bb, s).wait()

    @pl.when(count >= 1)
    def _drain_m1():
        bb = count - 1
        s = jax.lax.rem(bb, 2)
        vol_dma(bb, s).wait()
        cvol_dma(bb, s).wait()


def integrate_affine_pallas(
    frames,
    affine: AffineTables,
    cfg: TsdfConfig,
    mask16: jnp.ndarray,
    max_bricks: int = 1024,
    win_off: jnp.ndarray | None = None,
    interpret: bool = False,
    raw: bool = False,
    chunks: int = 1,
    strip: str = "",
    variant: str = "v3",
    wy: int | None = None,
):
    """Brick-sparse fused TSDF + color volumes from affine warp coefficients.

    Same contract as tsdf_fast.integrate_sparse / tsdf_pallas
    .integrate_sparse_pallas except the color volume dtype: returns
    (tsdf f32[Vz,Vy,Vx], color BF16[Vz,Vy,Vx,4] — 8-bit-source colors and
    the ±1 flag are exact, and the volume is the pipeline's biggest HBM
    stream: bf16 halves the assembly + render traffic); unoccupied voxels
    hold the clear values
    (recon_integration.cpp:249-250). ``win_off``: cached
    win_offsets_affine(affine, h, w, WY, WX2, XSTRIDE2)."""
    vx, vy, vz = cfg.res
    nb = (vx // BRICK) * (vy // BRICK) * (vz // BRICK)
    assert affine.coeffs.shape[1] == nb, (affine.coeffs.shape, cfg.res)
    if strip and not strip.startswith("x"):
        variant = "v1"   # the legacy bisect strips live in the v1 fuse path
    if wy is None:
        wy = WY
    assert wy % 8 == 0 and (variant == "v3" or wy == WY), (wy, variant)
    packed = pack_frames(frames)                 # [K, H, W, 6]
    num_k, h, w, _ = packed.shape
    packed_xb = expand_xblocks_pairs(pack_pairs(packed))
    corner = jnp.pad(packed[:, 0, 0, :], ((0, 0), (0, 2)))  # [K, 8]

    idx_list, valid_list = occupied_list(mask16, max_bricks)
    count = jnp.sum(valid_list.astype(jnp.int32))[None]     # i32[1]
    if win_off is None:
        win_off = win_offsets_affine(affine, h, w, wy, WX2, XSTRIDE2)
    offs3 = jnp.transpose(win_off[:, idx_list], (1, 0, 2))  # [MB, K, 2]
    # y packs as its 8-row tile index (origin / 8): the kernel multiplies
    # back by 8, which is how Mosaic proves the tile divisibility of the
    # dynamic window DMA offset
    offs = ((offs3[..., 0] >> 3) << 16 | offs3[..., 1]).reshape(-1)

    # [K, MB, chan, basis] -> [MB, basis, K, chan] -> [MB, NB_PAD, 128]
    cmats = jnp.transpose(affine.coeffs[:, idx_list], (1, 3, 0, 2))
    cmats = cmats.reshape(max_bricks, NBASIS, num_k * 4)
    if variant in ("v2", "v3"):
        cmats = fold_window_coords(cmats, offs3, num_k, h, w)
    cmats = jnp.pad(
        cmats, ((0, 0), (0, NB_PAD - NBASIS), (0, 128 - num_k * 4))
    )
    basis = jnp.pad(jnp.asarray(_brick_basis()), ((0, NB_PAD - NBASIS), (0, 0)))
    sel = idx_list.astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,   # count, sel, offs
        grid=(1,),
        in_specs=[
            # cmats must be pinned to HBM: under ANY the compiler puts this
            # small array in VMEM, where .at[b] would need a 128-aligned
            # lane slice of the padded tile
            pl.BlockSpec(memory_space=pltpu.HBM),    # cmats (manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # basis
            pl.BlockSpec(memory_space=pltpu.VMEM),   # corner
            pl.BlockSpec(memory_space=pltpu.ANY),    # packed_xb (manual DMA)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, num_k, 4, wy, 2 * WX2), jnp.float32),
            pltpu.VMEM((2, NB_PAD, 128), jnp.float32),
            pltpu.VMEM((2, 32, 128), jnp.float32),
            pltpu.VMEM((2, 4, 32, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, num_k)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    kernel = functools.partial(
        _kernel, num_k=num_k, h=h, w=w, limit=float(cfg.limit),
        chunks=chunks, strip=strip, variant=variant, wy=wy,
    )

    vol_bm, cvol_bm = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb, 32, 128), jnp.float32),
            jax.ShapeDtypeStruct((nb, 4, 32, 128), jnp.bfloat16),
        ],
        # the unrolled sensor/chunk bodies peak ~18 MB of stack; v5e has
        # 128 MB of physical VMEM — raise the conservative 16 MB default
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 2**20),
        interpret=interpret,
    )(count, sel, offs, cmats, basis, corner, packed_xb)

    # assemble: only occupied blocks were written (the rest is whatever the
    # output buffer held) — mask to clear values, transpose block-major ->
    # voxel order
    visited = jnp.zeros((nb + 1,), jnp.bool_).at[
        jnp.where(valid_list, idx_list, nb)
    ].set(True, mode="drop")[:nb]
    if raw:  # block-major outputs for benchmarking/layout experiments
        return vol_bm, cvol_bm, visited
    blocks = jnp.where(visited[:, None], vol_bm.reshape(nb, B3), -cfg.limit)
    cvol_bm = jnp.where(
        visited[:, None, None], cvol_bm.reshape(nb, 4, B3),
        jnp.bfloat16(0.0),
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
