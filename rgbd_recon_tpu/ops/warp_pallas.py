"""Pallas screen-warp: bilinear resample of the sweep buffers to screen.

The XLA blocked warp (ops/warp.sample2d_blocked_px) materializes its
row-stage intermediate ``t [pixels, window_w, C]`` in HBM — ~2-3 GB per
720p frame whatever the tile size (measured ~20-28 ms). This kernel is
the same gather-as-matmul construction with ``t`` VMEM-resident: one
persistent program loops over screen tiles, DMAs each tile's source
window (double-buffered), and runs the hat-weight matmuls per pixel
chunk, writing finished tiles through pipelined output blocks.

Layout tricks shared with ops/tsdf_persist.py: source x-origins come from
overlapping 128-lane x-blocks (stride 64), y-origins are 8-aligned
``pl.ds`` row offsets; the precise channel (hit_s — screen depth) uses
the 8-bit hi/lo split so its bf16 matmul stays exact to ~2^-16.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

XSTRIDE = 64
WXW = 128       # window width (one x-block)
CPAD = 16       # channel planes padded to a sublane tile
PCHUNK = 1024   # pixels per in-kernel chunk (bounds the VMEM intermediate)


def _hat2d(coords_col, n):
    i = jax.lax.broadcasted_iota(
        jnp.int32, (coords_col.shape[0], n), 1
    ).astype(jnp.float32)
    return jnp.clip(1.0 - jnp.abs(coords_col - i), 0.0, 1.0)


def _kernel(
    offs_ref,     # prefetch i32[T] (y0 << 16 | xblock)
    fy_ref,       # VMEM f32[T, P]
    fx_ref,       # VMEM f32[T, P]
    img_ref,      # HBM  f32[NXB, CPAD, Hc, WXW]
    out_ref,      # VMEM block f32[1, CPAD, P] (pipelined per tile)
    wnd_ref,      # VMEM f32[2, CPAD, WH, WXW]
    sems,         # DMA (2,)
    *, wh: int, n_ch: int,
):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    slot = jax.lax.rem(t, 2)

    def wnd_dma(tt, s):
        po = offs_ref[tt]
        return pltpu.make_async_copy(
            img_ref.at[po & 0xFFFF, :, pl.ds(po >> 16, wh), :],
            wnd_ref.at[s],
            sems.at[s],
        )

    @pl.when(t == 0)
    def _boot():
        wnd_dma(0, 0).start()

    @pl.when(t + 1 < nt)
    def _prefetch():
        wnd_dma(t + 1, jax.lax.rem(t + 1, 2)).start()

    wnd_dma(t, slot).wait()

    po = offs_ref[t]
    y0 = (po >> 16).astype(jnp.float32)
    x0 = ((po & 0xFFFF) * XSTRIDE).astype(jnp.float32)

    wnd = wnd_ref[slot]                        # [CPAD, WH, WXW]
    qcat = jnp.concatenate(
        [wnd[c] for c in range(n_ch)], axis=1
    ).astype(jnp.bfloat16)                     # [WH, n_ch*WXW]

    p_total = fy_ref.shape[1]
    pchunk = min(PCHUNK, p_total)
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    # pixels-in-LANES orientation (the integrate kernel's fuse_chunk_v3
    # lesson, docs/PERF.md): transposed hat weights built from hoisted
    # iotas, a dim0-contracting y-stage, and a sublane fold-tree x-stage —
    # the pixel-major form paid [PCHUNK, W] weight planes and full-width
    # lane reductions per channel
    iota_y = jax.lax.broadcasted_iota(jnp.int32, (wh, pchunk), 0).astype(f32)
    iota_x = jax.lax.broadcasted_iota(jnp.int32, (WXW, pchunk), 0).astype(f32)

    def subsum(x):
        n = x.shape[0]
        while n > 1:
            half = n // 2
            x = x[:half] + x[half:half * 2]
            n = half
        return x[0]

    for c0 in range(0, p_total, pchunk):
        ry = jnp.clip(fy_ref[t, c0:c0 + pchunk] - y0, 0.0, wh - 1.0)[None, :]
        rx = jnp.clip(fx_ref[t, c0:c0 + pchunk] - x0, 0.0, WXW - 1.0)[None, :]
        wy_t = jnp.maximum(1.0 - jnp.abs(ry - iota_y), 0.0).astype(bf16)
        wx_t = jnp.maximum(1.0 - jnp.abs(rx - iota_x), 0.0)   # [WXW, P] f32
        lin = jax.lax.dot_general(
            qcat, wy_t, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )                                      # [n_ch*WXW, P] f32
        outs = [
            subsum(lin[c * WXW:(c + 1) * WXW] * wx_t) for c in range(n_ch)
        ]
        outs += [jnp.zeros_like(outs[0])] * (CPAD - n_ch)
        out_ref[0, :, pl.ds(c0, pchunk)] = jnp.stack(outs)


def warp_screen_pallas(
    packed: jnp.ndarray,    # f32[Ti, Si, C]  (C <= 14)
    fy: jnp.ndarray,        # f32[H, W] fractional rows into packed
    fx: jnp.ndarray,        # f32[H, W]
    tile: tuple[int, int],
    precise_channels: tuple[int, ...] = (),
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for warp.sample2d_blocked_px on TPU (same bilinear + window
    placement semantics; window height = the 1.5x footprint rule, width =
    one 128-px x-block at stride 64 — wider footprints clamp like the XLA
    path's fixed window)."""
    ti, si, cch = packed.shape
    h, w = fy.shape
    th, tw = tile
    assert h % th == 0 and w % tw == 0
    nty, ntx = h // th, w // tw
    nt = nty * ntx
    p = th * tw
    assert p % min(PCHUNK, p) == 0 and p % 128 == 0

    def _ru8(n):
        return -(-n // 8) * 8

    # +16: 8 rows for the 8-aligned origin (floors up to 7 below center)
    # plus bilinear reach and centering round-off
    wh = min(_ru8(math.ceil(th * ti / h * 1.5) + 16), _ru8(ti))

    # hi/lo split planes for the precise channels (8-bit parts are
    # bf16-exact; recombined after the warp)
    planes = [packed[..., c] for c in range(cch)]
    split_at = {}
    for c in precise_channels:
        hi = jnp.floor(planes[c] * 256.0) * (1.0 / 256.0)
        lo = planes[c] - hi
        split_at[c] = (len(planes))
        planes[c] = hi
        planes.append(lo)
    n_ch = len(planes)
    assert n_ch <= CPAD
    img = jnp.stack(planes)                    # [n_ch, Ti, Si]

    # pad rows to wh-reachable and columns into overlapping x-blocks
    ti_p = _ru8(ti) + wh
    si_p = -(-si // XSTRIDE) * XSTRIDE + XSTRIDE
    img = jnp.pad(img, ((0, CPAD - n_ch), (0, ti_p - ti), (0, si_p - si)),
                  mode="edge")
    nxb = si_p // XSTRIDE - 1
    img_xb = jnp.stack(
        [img[:, :, j * XSTRIDE:j * XSTRIDE + WXW] for j in range(nxb)]
    )                                          # [NXB, CPAD, ti_p, WXW]

    # tile the coordinate planes: [H, W] -> [T, P]
    def tile_plane(a):
        return (a.reshape(nty, th, ntx, tw).transpose(0, 2, 1, 3)
                .reshape(nt, p))

    fy_t = tile_plane(fy)
    fx_t = tile_plane(fx)

    # per-tile window origin centered on the footprint (same placement as
    # sample2d_blocked_px; y 8-aligned, x as an x-block index)
    y_mid = (jnp.min(fy_t, axis=1) + jnp.max(fy_t, axis=1)) * 0.5
    x_mid = (jnp.min(fx_t, axis=1) + jnp.max(fx_t, axis=1)) * 0.5
    y0 = jnp.clip(
        (jnp.floor(y_mid).astype(jnp.int32) - wh // 2) & ~7, 0, ti_p - wh
    )
    xb = jnp.clip(
        (jnp.floor(x_mid).astype(jnp.int32) - WXW // 2 + XSTRIDE // 2)
        // XSTRIDE,
        0, nxb - 1,
    )
    offs = (y0 << 16) | xb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # fy_t
            pl.BlockSpec(memory_space=pltpu.VMEM),   # fx_t
            pl.BlockSpec(memory_space=pltpu.HBM),    # img_xb
        ],
        out_specs=pl.BlockSpec(
            (1, CPAD, p), lambda t, offs: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CPAD, wh, WXW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, wh=wh, n_ch=n_ch),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, CPAD, p), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 2**20),
        interpret=interpret,
    )(offs, fy_t, fx_t, img_xb)

    # recombine precise hi/lo parts, drop padding planes, untile
    chans = []
    for c in range(cch):
        v = out[:, c]
        if c in split_at:
            v = v + out[:, split_at[c]]
        chans.append(v)
    res = jnp.stack(chans, axis=-1)            # [T, P, C]
    return (res.reshape(nty, ntx, th, tw, cch).transpose(0, 2, 1, 3, 4)
            .reshape(h, w, cch))
