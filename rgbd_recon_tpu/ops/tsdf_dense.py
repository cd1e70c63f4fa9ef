"""Persistent TSDF integration emitting the DENSE volume directly.

Round 3's persistent kernel (ops/tsdf_persist.py) writes one block-major
[32, 128] block per occupied brick; a full-volume XLA transpose then
assembles the dense volume — a pure relayout measured at 11.6 ms/frame at
256^3 (the x-interleave of 16-voxel bricks forces 64-byte minor runs at
~35 GB/s, docs/PERF.md). A DMA cannot perform that interleave either:
Mosaic memrefs carry (1, 128) lane tiling even in HBM, so any sub-128
minor-dim slice is rejected — there is no copy-only escape.

This kernel dissolves the relayout into the compute, where the brick's
values are still in registers:

  * bricks are processed in ascending index order (the occupied list is
    sorted), so bricks of one X-ROW — 8 consecutive x-bricks = 128 voxels
    = one full lane tile — are adjacent in the loop;
  * per brick, the fused [4096]-voxel result (native (32, 128) layout,
    rows (lz*16+ly)//8, lanes (ly%8)*16+lx) is re-laid to dense row order
    with ONE row-expand matmul (U[r] = V[r//8], a 0/1 matmul — exact) and
    ONE strided lane roll (pltpu.roll stride=112: lane rotation by
    (bxi - r%8)*16 per row — verified element-exact), then masked into a
    VMEM row buffer [16, 16, 128] = the brick-row's dense [z, y, x] region;
  * when the brick index leaves the row, the buffer is flushed with ONE
    fully lane-aligned DMA into the dense output at
    [z0:z0+16, y0:y0+16, xg] — 512-byte minor runs, and only occupied
    rows are written at all;
  * the dense outputs are input_output-aliased pre-cleared buffers
    (~0.25 ms HBM fill), the reference's per-frame clear
    (recon_integration.cpp:249-250); untouched rows keep the clear.

Color is emitted CHANNEL-MAJOR ([4, Vz, Vy, Vx] bf16): the per-channel
row buffers are separate lane tiles, and the sweep renderer consumes the
channel-leading form natively (it resamples density and color jointly).

Everything else — window/coefficient double-buffered DMA, the quadratic
warp, the fusion math (shared ``fuse_chunk``) — is identical to
tsdf_persist.py. Requires Vx % 128 == 0 (an x-row must be a whole number
of lane tiles); the pipeline falls back to the block-major kernel + XLA
assembly otherwise.

Reference math: tsdf_integration.vs:23-59, recon_integration.cpp:242-269.
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
    B3, WY, WX2, XSTRIDE2, expand_xblocks_pairs, expand_xblocks_quads,
    pack_pairs,
)
from .tsdf_persist import (
    NB_PAD, fold_window_coords, fuse_chunk, fuse_chunk_v2, fuse_chunk_v3,
)

XROW = 8          # bricks per x-row (8 * 16 voxels = one 128-lane tile)


def _kernel(
    # scalar prefetch
    count_ref,    # i32[1]    occupied-brick count
    sel_ref,      # i32[MB]   brick index (into NB) per occupied slot
    offs_ref,     # i32[MB*K] packed window origin (y/8 << 16 | xblock)
    # inputs
    cmat_ref,     # HBM f32[MB, NB_PAD, 128] per-slot warp coeffs
    basis_ref,    # VMEM f32[NB_PAD, B3]
    corner_ref,   # VMEM f32[K, 8]
    packed_ref,   # HBM bf16[K, NXB, 4|2, Hp, 128] paired|quadded x-blocks
    in_v_ref,     # HBM f32[Vz, Vy, NXG, 128]  pre-cleared, aliased
    in_c_ref,     # HBM bf16[4, Vz, Vy, NXG, 128]
    # outputs (the aliased dense buffers)
    dst_v_ref,
    dst_c_ref,
    # scratch
    wnd_ref,      # VMEM bf16[2, G, K, 4|2, WY, 128] (paired|quadded chans)
    cmbuf_ref,    # VMEM f32[2, G, NB_PAD, 128]
    rowv_ref,     # VMEM f32[2, 16, 16, 128]   row accumulation (double buf)
    rowc_ref,     # VMEM bf16[2, 4, 16, 16, 128]
    win_sems,     # DMA (2,)  shared by all of a slot's window copies
    cm_sems,      # DMA (2,)
    row_sems,     # DMA (2, 2)
    *, num_k: int, h: int, w: int, limit: float, nby: int, nxg: int,
    variant: str = "v3", group: int = 2, strip: str = "", wy: int = WY,
    wx: int = WX2, xstride: int = XSTRIDE2, quad: bool = False,
    use_cls: bool = False, zmajor: bool = False, vol_dtype=jnp.float32,
    fold_offs: bool = False,
):
    """The brick loop runs GROUPED: ``group`` bricks per fori_loop
    iteration (unrolled members), because the floor is per-ITERATION
    scalar sequencing, not DMA bytes (measured: the bare window-DMA loop
    costs the same at WY=8 as WY=48 and barely less at K=1 than K=4 when
    copies share one semaphore — docs/PERF.md round-4 bisect). Grouping
    cuts iterations by ``group``x, the coefficient DMA becomes ONE
    contiguous [G, NB_PAD, 128] copy per group, and all of a group's
    window copies share one semaphore. Tail members past ``count`` clamp
    to the last valid brick: same row -> no flush, and the accumulation
    mask gates on validity, so they are compute-only no-ops."""
    del in_v_ref, in_c_ref
    count = count_ref[0]
    ngroups = jax.lax.div(count + group - 1, group)

    def clamp(b):
        return jnp.minimum(b, count - 1)

    def win_dma(b, slot, i, k):
        po = offs_ref[clamp(b) * num_k + k]
        return pltpu.make_async_copy(
            packed_ref.at[k, po & 0xFFFF, :,
                          pl.ds(((po >> 16) & 0xFF) * 8, wy), :],
            wnd_ref.at[slot, i, k],
            win_sems.at[slot],
        )

    def win_needed(b, k):
        """Only FULL-class sensors read their window (NONE/FRONT skip the
        sensor, INVALID reads the corner constants) — the per-brick DMA
        issue overhead is the kernel's sequencing floor (docs/PERF.md), so
        skipped sensors skip the copy too. Starts and waits share this
        predicate, keeping the shared semaphore balanced."""
        return (offs_ref[clamp(b) * num_k + k] >> 24) == 0

    def cm_dma_starts(g, slot):
        """Coefficient DMA(s) for group ``g``. Per-frame-gathered cmats are
        slot-contiguous (ONE copy per group); the session-baked full table
        (fold_offs) is indexed directly by brick id via sel — one copy per
        member, all sharing the group's semaphore."""
        if fold_offs:
            for i in range(group):
                pltpu.make_async_copy(
                    cmat_ref.at[sel_ref[clamp(g * group + i)]],
                    cmbuf_ref.at[slot, i], cm_sems.at[slot],
                ).start()
        else:
            pltpu.make_async_copy(
                cmat_ref.at[pl.ds(g * group, group)],
                cmbuf_ref.at[slot], cm_sems.at[slot],
            ).start()

    def cm_wait(slot):
        if fold_offs:   # per-member copies: matching-size waits
            for i in range(group):
                pltpu.make_async_copy(
                    cmbuf_ref.at[slot, i], cmbuf_ref.at[slot, i],
                    cm_sems.at[slot],
                ).wait()
        else:
            pltpu.make_async_copy(
                cmbuf_ref.at[slot], cmbuf_ref.at[slot], cm_sems.at[slot]
            ).wait()

    def row_of(b):
        return sel_ref[clamp(b)] // XROW

    def flush_row(row, rslot):
        """Start the dense-region DMAs for a completed row buffer.

        The destination lane offset must be STATIC (Mosaic requires
        128-aligned static minor-dim slices; a dynamic xg-indexed dim
        would make (nxg, 128) the tiled pair and reject the sub-tile
        slice), so the small nxg is unrolled into predicated branches."""
        xg = jax.lax.rem(row, nxg)
        t = jax.lax.div(row, nxg)
        y0 = jax.lax.rem(t, nby) * BRICK
        z0 = jax.lax.div(t, nby) * BRICK
        for g in range(nxg):
            @pl.when(xg == g)
            def _start():
                pltpu.make_async_copy(
                    rowv_ref.at[rslot],
                    dst_v_ref.at[
                        pl.ds(z0, BRICK), pl.ds(y0, BRICK),
                        pl.ds(g * 128, 128),
                    ],
                    row_sems.at[rslot, 0],
                ).start()
                if zmajor:
                    # z-major color ([Vz, 4, Vy, Vx] — the layout the sweep
                    # slices per z with NO relayout): one DMA per channel,
                    # all sharing the row semaphore
                    for c in range(4):
                        pltpu.make_async_copy(
                            rowc_ref.at[rslot, c],
                            dst_c_ref.at[
                                pl.ds(z0, BRICK), c, pl.ds(y0, BRICK),
                                pl.ds(g * 128, 128),
                            ],
                            row_sems.at[rslot, 1],
                        ).start()
                else:
                    pltpu.make_async_copy(
                        rowc_ref.at[rslot],
                        dst_c_ref.at[
                            :, pl.ds(z0, BRICK), pl.ds(y0, BRICK),
                            pl.ds(g * 128, 128),
                        ],
                        row_sems.at[rslot, 1],
                    ).start()

    def wait_row(rslot):
        pltpu.make_async_copy(
            rowv_ref.at[rslot], rowv_ref.at[rslot], row_sems.at[rslot, 0]
        ).wait()
        if zmajor:   # four per-channel copies, matching-size waits
            for c in range(4):
                pltpu.make_async_copy(
                    rowc_ref.at[rslot, c], rowc_ref.at[rslot, c],
                    row_sems.at[rslot, 1],
                ).wait()
        else:
            pltpu.make_async_copy(
                rowc_ref.at[rslot], rowc_ref.at[rslot], row_sems.at[rslot, 1]
            ).wait()

    @pl.when(count > 0)
    def _bootstrap():
        cm_dma_starts(0, 0)
        for i in range(group):
            for k in range(num_k):
                @pl.when(win_needed(i, k))
                def _start(i=i, k=k):
                    win_dma(i, 0, i, k).start()

    # loop-invariant relayout constants (hoisted by the compiler)
    VROWS = B3 // 128           # 32: rows of the value's native layout
    DROWS = B3 // BRICK         # 256: dense rows (lz*16 + ly)
    rexp = (
        jax.lax.broadcasted_iota(jnp.int32, (DROWS, VROWS), 0) // XROW
        == jax.lax.broadcasted_iota(jnp.int32, (DROWS, VROWS), 1)
    )
    rexp16 = rexp.astype(jnp.bfloat16)   # 0/1 — exact row-select matmul
    rexp32 = rexp.astype(jnp.float32)
    lane16 = jax.lax.broadcasted_iota(
        jnp.int32, (BRICK, BRICK, 128), 2
    ) // BRICK                            # [16, 16, 128]: lane -> x-brick

    def body(g, carry):
        rslot, nflush = carry
        slot = jax.lax.rem(g, 2)

        @pl.when(g + 1 < ngroups)
        def _prefetch():
            nslot = jax.lax.rem(g + 1, 2)
            cm_dma_starts(g + 1, nslot)
            for i in range(group):
                for k in range(num_k):
                    @pl.when(win_needed((g + 1) * group + i, k))
                    def _start(i=i, k=k, nslot=nslot):
                        win_dma((g + 1) * group + i, nslot, i, k).start()

        cm_wait(slot)
        for i in range(group):
            for k in range(num_k):
                @pl.when(win_needed(g * group + i, k))
                def _wait(i=i, k=k, slot=slot):
                    win_dma(g * group + i, slot, i, k).wait()

        for i in range(group):
            b = g * group + i
            valid = b < count

            # row management: flush on row change, rotate + clear the
            # buffer (tail members clamp to the last brick: no change)
            prev_b = jnp.maximum(b - 1, 0)
            is_new = (b == 0) | (row_of(b) != row_of(prev_b))

            @pl.when(is_new & (b > 0))
            def _flush_prev():
                flush_row(row_of(prev_b), rslot)

            rslot = jnp.where(is_new & (b > 0), 1 - rslot, rslot)
            nflush = nflush + jnp.where(is_new & (b > 0), 1, 0)

            @pl.when(is_new & (nflush >= 2))
            def _wait_reuse():
                wait_row(rslot)

            @pl.when(is_new)
            def _clear_row():
                rowv_ref[rslot] = jnp.full(
                    (BRICK, BRICK, 128), -limit, vol_dtype
                )
                rowc_ref[rslot] = jnp.zeros(
                    (4, BRICK, BRICK, 128), jnp.bfloat16
                )

            if strip == "dmaonly":
                # BENCHMARK-ONLY: DMA pipeline + row flushes, compute off.
                wtouch = jnp.sum(sum(
                    wnd_ref[slot, i, k, 0, 0:1, :].astype(jnp.float32)
                    for k in range(num_k)
                )) + jnp.sum(cmbuf_ref[slot, i, 0:1, 0:128])
                rowv_ref[rslot, 0:1] = jnp.where(
                    valid,
                    (jnp.zeros((1, BRICK, 128), jnp.float32) + wtouch
                     ).astype(vol_dtype),
                    rowv_ref[rslot, 0:1])
                continue

            po_b = [offs_ref[clamp(b) * num_k + k] for k in range(num_k)]
            if fold_offs:
                # window-offset fold, in-kernel (fold_window_coords minus
                # the session-invariant scale, which is baked into the full
                # table): subtract (x_lo + 0.5, y_lo + 0.5) from the
                # CONSTANT basis row (row 0) of the u/v channels BEFORE the
                # warp matmul — identical f32 operands and association as
                # the host-side fold, hence bit-exact (x_lo/y_lo are small
                # integers, + 0.5 is exact in f32)
                rid0 = jax.lax.broadcasted_iota(jnp.int32, (NB_PAD, 128), 0)
                lid0 = jax.lax.broadcasted_iota(jnp.int32, (NB_PAD, 128), 1)
                off_m = jnp.zeros((NB_PAD, 128), jnp.float32)
                for k in range(num_k):
                    x_lo = ((po_b[k] & 0xFFFF) * xstride).astype(jnp.float32)
                    y_lo = (((po_b[k] >> 16) & 0xFF) * 8).astype(jnp.float32)
                    off_m = jnp.where(
                        (rid0 == 0) & (lid0 == 4 * k), x_lo + 0.5, off_m)
                    off_m = jnp.where(
                        (rid0 == 0) & (lid0 == 4 * k + 1), y_lo + 0.5, off_m)
                cm_t = (cmbuf_ref[slot, i] - off_m)[:, : num_k * 4]
            else:
                cm_t = cmbuf_ref[slot, i][:, : num_k * 4]
            pc_all = jax.lax.dot_general(
                cm_t, basis_ref[...],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                     # [K*4, B3]
            if strip == "nofuse":
                # BENCHMARK-ONLY (scripts/bisect_integrate.py): windows +
                # warp matmul + relayout/RMW, fuse math off. Touch every
                # window so the DMAs stay live.
                wtouch = sum(
                    wnd_ref[slot, i, k, 0, 0:1, :].astype(jnp.float32)
                    for k in range(num_k)
                )                                 # [1, 128]
                wt = pc_all[2] + jnp.tile(wtouch, (1, B3 // 128))[0]
                rgb_out = pc_all[:3]
                flag = pc_all[3]
            else:
                if variant == "v3":
                    wt, rgb_out, flag = fuse_chunk_v3(
                        pc_all, lambda k, _i=i: wnd_ref[slot, _i, k], po_b,
                        corner_ref, num_k=num_k, h=h, w=w, limit=limit,
                        strip=strip if strip.startswith("x") else "", wy=wy,
                        wx=wx, xstride=xstride, quad=quad, cls=use_cls,
                    )
                else:
                    fuse = {"v1": fuse_chunk, "v2": fuse_chunk_v2}[variant]
                    wt, rgb_out, flag = fuse(
                        pc_all, lambda k, _i=i: wnd_ref[slot, _i, k], po_b,
                        corner_ref, num_k=num_k, h=h, w=w, limit=limit,
                        strip=strip if strip.startswith("x") else "",
                    )

            # relayout (32, 128) -> dense row order and place at the
            # brick's lane group: rows r = lz*16+ly via the row-expand
            # matmul (0/1 selection — HIGHEST precision makes the f32 pass
            # bit-exact; the default single bf16 pass measured 6e-5 TSDF
            # deviation), lanes bxi*16+lx via the strided roll (rotation
            # (bxi - r%8)*16 per row)
            bxi = jax.lax.rem(sel_ref[clamp(b)], XROW)
            keep = (lane16 == bxi) & valid

            if strip == "norelay":
                # BENCHMARK-ONLY: fuse on, row-expand/roll/RMW replaced by
                # a raw (wrong-layout) store that keeps the results live.
                rowv_ref[rslot, 0:2] = wt.reshape(2, BRICK, 128).astype(
                    vol_dtype)
                for c in range(3):
                    rowc_ref[rslot, c, 0:2] = (
                        rgb_out[c].reshape(2, BRICK, 128).astype(jnp.bfloat16))
                rowc_ref[rslot, 3, 0:2] = (
                    flag.reshape(2, BRICK, 128).astype(jnp.bfloat16))
                continue

            V = wt.reshape(VROWS, 128)
            U = jnp.dot(rexp32, V, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            W = pltpu.roll(U, bxi * BRICK, 1, stride=112, stride_axis=0)
            # vol_dtype=bf16: cast AFTER the exact relayout — the stored
            # value is bf16(f32 wt), the identical rounding the sweep
            # renderer applies to an f32 volume before its resample
            rowv_ref[rslot] = jnp.where(
                keep, W.reshape(BRICK, BRICK, 128).astype(vol_dtype),
                rowv_ref[rslot]
            )

            call = jnp.concatenate([rgb_out, flag[None, :]], axis=0)  # [4, B3]
            for c in range(4):
                Vc = call[c].reshape(VROWS, 128).astype(jnp.bfloat16)
                # bf16 operands with f32 acc: the selection product is exact
                Uc = jnp.dot(rexp16, Vc, preferred_element_type=jnp.float32)
                Wc = pltpu.roll(Uc, bxi * BRICK, 1, stride=112, stride_axis=0)
                rowc_ref[rslot, c] = jnp.where(
                    keep, Wc.reshape(BRICK, BRICK, 128).astype(jnp.bfloat16),
                    rowc_ref[rslot, c]
                )

        return (rslot, nflush)

    rslot, nflush = jax.lax.fori_loop(
        0, ngroups, body, (jnp.int32(0), jnp.int32(0))
    )

    # flush the final row, then drain the last two flushes
    @pl.when(count > 0)
    def _flush_last():
        flush_row(row_of(count - 1), rslot)

    nflush = nflush + jnp.where(count > 0, 1, 0)

    @pl.when(nflush >= 2)
    def _drain_m2():
        wait_row(1 - rslot)

    @pl.when(nflush >= 1)
    def _drain_m1():
        wait_row(rslot)


def bake_cmats_kernel(affine: AffineTables, h: int, w: int) -> jnp.ndarray:
    """Session-baked FULL kernel-layout coefficient table
    f32[NB, NB_PAD, 128]: the per-brick quadratic warp coefficients in the
    kernel's (basis-major, channel-lane) order with the frame-INVARIANT
    pixel scale (u*w, v*h — fold_window_coords' first half) pre-applied.

    With this table, integrate_dense_pallas skips its per-frame
    occupied-brick gather + fold + pad chain (measured 1.05 ms/frame at
    512³ over 32768 bricks, docs/PERF.md lever #2): the kernel DMAs each
    brick's row directly via ``sel`` and applies the per-frame window
    offset in-kernel (bit-exact — same f32 operands and association).
    Pure function of (rig bake, sensor size); cache it host-side and pass
    as a jit argument like the pipeline's other kernel tables."""
    num_k, nb, nchan, nbasis = affine.coeffs.shape
    assert nchan == 4 and nbasis == NBASIS, affine.coeffs.shape
    cm = jnp.transpose(affine.coeffs, (1, 3, 0, 2)).reshape(
        nb, NBASIS, num_k * 4
    )
    scale = jnp.tile(jnp.array([w, h, 1.0, 1.0], jnp.float32), num_k)
    cm = cm * scale[None, None, :]
    return jnp.pad(
        cm, ((0, 0), (0, NB_PAD - NBASIS), (0, 128 - num_k * 4))
    )


def integrate_dense_pallas(
    frames,
    affine: AffineTables,
    cfg: TsdfConfig,
    mask16: jnp.ndarray,
    max_bricks: int = 1024,
    win_off: jnp.ndarray | None = None,
    interpret: bool = False,
    variant: str = "v3",
    group: int = 2,
    strip: str = "",
    wy: int | None = None,
    wx: int | None = None,
    xstride: int | None = None,
    cls: jnp.ndarray | None = None,
    zmajor: bool = False,
    vol_dtype=jnp.float32,
    cmats_full: jnp.ndarray | None = None,
):
    """Brick-sparse fused TSDF + color, dense outputs straight from the
    kernel: (tsdf f32[Vz, Vy, Vx], color bf16[4, Vz, Vy, Vx] CHANNEL-MAJOR).
    Same fusion math/contract as tsdf_persist.integrate_affine_pallas minus
    its block->dense assembly; unoccupied voxels hold the clear values
    (recon_integration.cpp:249-250). Requires cfg.res[0] % 128 == 0.

    ``zmajor``: emit color as bf16[Vz, 4, Vy, Vx] — Z-MAJOR, the layout the
    sweep renderer slices per z-plane with NO relayout (a [4, Vz, Vy, Vx]
    volume costs XLA a full-volume copy into exactly this memory order
    every frame: 3.3 ms at 512³, docs/PERF.md). ``vol_dtype``: TSDF output
    dtype; bf16 stores bf16(f32 tsdf) — the identical rounding the sweep
    applies to an f32 volume on entry, so renders are bit-identical while
    the clear/flush/slice traffic halves (bf16 ulp at |t| ≤ limit=0.01 is
    ~4e-5, inside the 1e-3 per-voxel contract)."""
    vx, vy, vz = cfg.res
    assert vx % 128 == 0, "dense-emit needs whole 128-lane x-rows"
    assert max_bricks % group == 0, (max_bricks, group)
    if wy is None:
        wy = WY
    if wx is None:
        wx = WX2
    if xstride is None:
        xstride = XSTRIDE2
    assert wy % 8 == 0 and (variant == "v3" or wy == WY), (wy, variant)
    assert wx in (32, 64) and xstride in (4, 8, 16), (wx, xstride)
    assert variant == "v3" or (wx == WX2 and xstride == XSTRIDE2), variant
    # the half-tile x window ships in the channel-QUADDED layout (4 x 32-px
    # channels per 128-lane plane) — the only form whose window DMA slices
    # are full lane tiles and therefore chip-legal
    quad = wx == 32
    nbz, nby, nbx = vz // BRICK, vy // BRICK, vx // BRICK
    nxg = nbx // XROW
    nb = nbz * nby * nbx
    assert affine.coeffs.shape[1] == nb, (affine.coeffs.shape, cfg.res)
    packed = pack_frames(frames)                 # [K, H, W, 6]
    num_k, h, w, _ = packed.shape
    expand = expand_xblocks_quads if quad else expand_xblocks_pairs
    packed_xb = expand(pack_pairs(packed), dtype=jnp.bfloat16,
                       wx=wx, xstride=xstride)
    corner = jnp.pad(packed[:, 0, 0, :], ((0, 0), (0, 2)))  # [K, 8]

    idx_list, valid_list = occupied_list(mask16, max_bricks)
    count = jnp.sum(valid_list.astype(jnp.int32))[None]     # i32[1]
    if win_off is None:
        win_off = win_offsets_affine(affine, h, w, wy, wx, xstride)
    offs3 = jnp.transpose(win_off[:, idx_list], (1, 0, 2))  # [MB, K, 2]
    # y packs as its 8-row tile index (origin / 8): the kernel multiplies
    # back by 8, which is how Mosaic proves the tile divisibility of the
    # dynamic window DMA offset. Per-(brick, sensor) integration classes
    # (block_depth_cull: NONE/FRONT/INVALID sensor skips, variant v3 only)
    # ride in bits 24-25.
    offs = ((offs3[..., 0] >> 3) << 16 | offs3[..., 1]).reshape(-1)
    use_cls = cls is not None and variant == "v3" and not strip
    if use_cls:
        assert cls.shape == (num_k, nb), (cls.shape, nb)
        offs = offs | (jnp.transpose(cls[:, idx_list], (1, 0))
                       .astype(jnp.int32) << 24).reshape(-1)

    fold_offs = cmats_full is not None
    if fold_offs:
        # session-baked full table (bake_cmats_kernel): no per-frame
        # gather/fold/pad — the kernel indexes rows by brick id via sel
        # and folds the window offset itself. v3-only (v1/v2 expect
        # unfolded resp. host-folded coordinates).
        assert variant == "v3", "cmats_full requires the v3 fuse path"
        assert cmats_full.shape == (nb, NB_PAD, 128), cmats_full.shape
        cmats = cmats_full
    else:
        cmats = jnp.transpose(affine.coeffs[:, idx_list], (1, 3, 0, 2))
        cmats = cmats.reshape(max_bricks, NBASIS, num_k * 4)
        if variant in ("v2", "v3"):
            cmats = fold_window_coords(cmats, offs3, num_k, h, w,
                                       xstride=xstride)
        cmats = jnp.pad(
            cmats, ((0, 0), (0, NB_PAD - NBASIS), (0, 128 - num_k * 4))
        )
    basis = jnp.pad(jnp.asarray(_brick_basis()), ((0, NB_PAD - NBASIS), (0, 0)))
    sel = idx_list.astype(jnp.int32)

    # dense-shaped outputs: (vy, vx) is the tiled pair, so the flush DMAs
    # slice z (untiled, dynamic), y (sublane, dynamic 16-aligned — same as
    # the window DMAs) and x (lane, static 128-aligned)
    clear_v = jnp.full((vz, vy, vx), -float(cfg.limit), vol_dtype)
    c_shape = (vz, 4, vy, vx) if zmajor else (4, vz, vy, vx)
    clear_c = jnp.zeros(c_shape, jnp.bfloat16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,   # count, sel, offs
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),    # cmats (manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # basis
            pl.BlockSpec(memory_space=pltpu.VMEM),   # corner
            pl.BlockSpec(memory_space=pltpu.ANY),    # packed_xb (manual DMA)
            pl.BlockSpec(memory_space=pltpu.HBM),    # clear_v (aliased)
            pl.BlockSpec(memory_space=pltpu.HBM),    # clear_c (aliased)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, group, num_k, 2 if quad else 4, wy, 128),
                       jnp.bfloat16),
            pltpu.VMEM((2, group, NB_PAD, 128), jnp.float32),
            pltpu.VMEM((2, BRICK, BRICK, 128), vol_dtype),
            pltpu.VMEM((2, 4, BRICK, BRICK, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    kernel = functools.partial(
        _kernel, num_k=num_k, h=h, w=w, limit=float(cfg.limit),
        nby=nby, nxg=nxg, variant=variant, group=group, strip=strip, wy=wy,
        wx=wx, xstride=xstride, quad=quad, use_cls=use_cls,
        zmajor=zmajor, vol_dtype=vol_dtype, fold_offs=fold_offs,
    )

    vol, cvol = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((vz, vy, vx), vol_dtype),
            jax.ShapeDtypeStruct(c_shape, jnp.bfloat16),
        ],
        # operand numbering includes the 3 scalar-prefetch args
        input_output_aliases={7: 0, 8: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(count, sel, offs, cmats, basis, corner, packed_xb, clear_v, clear_c)

    return vol, cvol
