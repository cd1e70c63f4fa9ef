"""Pallas bilateral-filter accumulator.

The XLA formulation (preprocess.bilateral_lab's scan-over-rows) spills
each of the 169 taps' intermediates to HBM (~2+ GB per frame at Kinect
resolution — measured as most of the ~20 ms preprocess stage). Here the
padded depth image sits whole in VMEM (~1 MB/sensor) and a grid of
(sensor, 8-row block) programs accumulates all 13x13 taps on ~[8, W]
vectors:

  * the program's input window is ONE aligned dynamic slice (24 rows at
    8*i — Mosaic requires provably 8-aligned sublane offsets); every tap
    is then a static sub-slice of that loaded window,
  * x taps are lane rolls over a sentinel-padded row (only pad/sentinel
    lanes ever cross the wrap boundary),
  * the 169 taps run on [8, WPAD] temporaries (~20 KB each), far under
    the VMEM budget that a whole-image unroll blew (~270 MB).

Semantics identical to the scan version (pre_depth.fs:85-127): edge-clamp
padding, depth-proportional range sigma, tent spatial weights (negative in
the window corners, as the reference computes them), and the three
accumulators (weighted depth, total weight, range-weight sum).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KS = 6                  # kernel_size (pre_depth.fs:27)
MAX_DEPTH_M = 4.5
RB = 8                  # output rows per program (sublane alignment unit)
WIN = RB + 2 * KS + (8 - (2 * KS) % 8) % 8   # aligned load window (24)


def _kernel(dpad_ref, lim_ref, out_ref, *, wp: int):
    """dpad_ref VMEM [1, Hp, WPAD] (whole padded image of one sensor);
    lim_ref VMEM [K, 8]; out_ref VMEM [3, 1, RB, WPAD]."""
    k = pl.program_id(0)
    i = pl.program_id(1)
    cv_min = lim_ref[k, 0]
    cv_max = lim_ref[k, 1]

    win = dpad_ref[0, pl.ds(i * RB, WIN), :]   # aligned; taps are static
    d_c = win[KS:KS + RB]
    dist_range_max = 0.35 * (d_c / MAX_DEPTH_M)
    inv_drm = 1.0 / jnp.maximum(dist_range_max, 1e-20)

    depth_bf = jnp.zeros_like(d_c)
    w_acc = jnp.zeros_like(d_c)
    w_range = jnp.zeros_like(d_c)
    for dy in range(-KS, KS + 1):
        row = win[KS + dy:KS + dy + RB]
        for dx in range(-KS, KS + 1):
            # circular roll; shift must be non-negative, so left-shifts
            # wrap (only pad/sentinel lanes cross the boundary)
            s = pltpu.roll(row, (-dx) % wp, 1) if dx else row
            dist = jnp.abs(s - d_c)
            accept = (
                (s >= cv_min) & (s <= cv_max) & (dist <= dist_range_max)
            )
            gs = 1.0 - (dx * dx + dy * dy) ** 0.5 / KS
            gr = 1.0 - jnp.minimum(dist, dist_range_max) * inv_drm
            ws = gs * gr
            depth_bf = depth_bf + jnp.where(accept, ws * s, 0.0)
            w_acc = w_acc + jnp.where(accept, ws, 0.0)
            w_range = w_range + jnp.where(accept, gr, 0.0)
    out_ref[0, 0] = depth_bf
    out_ref[1, 0] = w_acc
    out_ref[2, 0] = w_range


def bilateral_accum_pallas(
    depth_m: jnp.ndarray,        # f32[K, H, W] meters
    depth_limits: jnp.ndarray,   # f32[K, 2]
    interpret: bool = False,
):
    """(depth_bf, w_acc, w_range), each f32[K, H, W] — the 13x13 bilateral
    accumulators of pre_depth.fs:85-127. Requires H % 8 == 0."""
    kk, h, w = depth_m.shape
    assert h % RB == 0, h
    # lanes: [KS left edge-pad | W | KS right edge-pad | sentinel]; rows:
    # KS edge-pad + enough tail for the last program's aligned window
    wp = -(-(w + 2 * KS) // 128) * 128
    hp = h + WIN - RB
    dpad = jnp.pad(depth_m, ((0, 0), (KS, 0), (KS, KS)), mode="edge")
    dpad = jnp.pad(dpad, ((0, 0), (0, hp - (h + KS)), (0, 0)), mode="edge")
    dpad = jnp.pad(dpad, ((0, 0), (0, 0), (0, wp - (w + 2 * KS))),
                   constant_values=-1.0)
    lim = jnp.pad(depth_limits, ((0, 0), (0, 6)))

    out = pl.pallas_call(
        functools.partial(_kernel, wp=wp),
        grid=(kk, h // RB),
        in_specs=[
            pl.BlockSpec((1, hp, wp), lambda k, i: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # lim (whole)
        ],
        out_specs=pl.BlockSpec((3, 1, RB, wp), lambda k, i: (0, k, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, kk, h, wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 2**20),
        interpret=interpret,
    )(dpad, lim)
    out = out[:, :, :, KS:KS + w]
    return out[0], out[1], out[2]
