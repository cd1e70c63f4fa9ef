"""VMEM-resident piecewise-warp evaluation kernel.

The PiecewiseWarp (ops/warp.py) evaluates ``A + d·B + Σ_s hat(c(d)-s)·R[s]``
per pixel — ``knots`` (≈48) elementwise FMAs over the residual knot table R
(~250 MB bf16 at Kinect res). As plain XLA the hat loop cannot keep a
multi-output accumulator resident: each consumer re-walks R, and the
preprocess stage needs SIX evaluations per frame (center + 4 neighbor taps
for pre_normal.fs + registration uv) — measured ~17 ms/frame of pure HBM
re-reads at the distorted-rig bench config.

This kernel evaluates M depth maps against the same table in ONE pass:
per (sensor, channel, row-band) program it holds the R band in VMEM and
accumulates all M outputs simultaneously, so R streams from HBM exactly
once per call (~0.3 ms at Kinect res) regardless of M. The neighbor taps
become M=5 rows of the depth stack via the caller's shift-of-depth trick
(ops/warp.PiecewiseWarp.xyz_neighborhood).

Math is identical to the XLA path (same f32 hat weights, same accumulation
order over s) — parity-tested bitwise in tests/test_distortion.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(S, DC_ref, CC_ref, a_ref, b_ref, r_ref, o_ref):
    dc = DC_ref[:, 0]                   # [M, TH, W] clamped depth
    cc = CC_ref[:, 0]                   # [M, TH, W] knot coordinate
    acc = a_ref[0, 0][None] + dc * b_ref[0, 0][None]     # [M, TH, W]

    def body(s, acc):
        w = jnp.maximum(1.0 - jnp.abs(cc - s.astype(jnp.float32)), 0.0)
        r_s = r_ref[0, 0, s].astype(jnp.float32)         # [TH, W]
        return acc + w * r_s[None]

    acc = jax.lax.fori_loop(0, S, body, acc)
    o_ref[:, 0, 0] = acc


def piecewise_eval_pallas(D, a, b, r, d_min, d_max,
                          interpret: bool = False):
    """Evaluate the piecewise warp for M depth maps at once.

    D f32[M, K, H, W]; a, b f32[K, H, W, C]; r bf16[K, C, S, H, W];
    d_min/d_max: floats OR traced scalars (the warp rides jit argument
    pytrees, so its leaves may be tracers — clamp and knot-coordinate
    construction therefore happen outside the kernel).
    Returns f32[M, K, H, W, C]. Requires H % 8 == 0 and W % 128 == 0
    (callers fall back to the XLA form otherwise).
    """
    m, k, h, w = D.shape
    c = a.shape[-1]
    s = r.shape[2]
    assert h % 8 == 0 and w % 128 == 0, (h, w)
    assert r.shape == (k, c, s, h, w), (r.shape, (k, c, s, h, w))
    th = 8
    a_cf = jnp.moveaxis(a, -1, 1)       # [K, C, H, W]
    b_cf = jnp.moveaxis(b, -1, 1)
    dc = jnp.clip(D, d_min, d_max)
    cc = (dc - d_min) / (d_max - d_min) * (s - 1)

    out = pl.pallas_call(
        functools.partial(_kernel, s),
        grid=(k, c, h // th),
        in_specs=[
            pl.BlockSpec((m, 1, th, w), lambda ki, ci, hi: (0, ki, hi, 0)),
            pl.BlockSpec((m, 1, th, w), lambda ki, ci, hi: (0, ki, hi, 0)),
            pl.BlockSpec((1, 1, th, w), lambda ki, ci, hi: (ki, ci, hi, 0)),
            pl.BlockSpec((1, 1, th, w), lambda ki, ci, hi: (ki, ci, hi, 0)),
            pl.BlockSpec((1, 1, s, th, w),
                         lambda ki, ci, hi: (ki, ci, 0, hi, 0)),
        ],
        out_specs=pl.BlockSpec((m, 1, 1, th, w),
                               lambda ki, ci, hi: (0, ki, ci, hi, 0)),
        out_shape=jax.ShapeDtypeStruct((m, k, c, h, w), jnp.float32),
        interpret=interpret,
    )(dc, cc, a_cf, b_cf, r)
    return jnp.moveaxis(out, 2, -1)     # [M, K, H, W, C]
