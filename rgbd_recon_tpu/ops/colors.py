"""Color space conversion (reference: glsl/inc_color.glsl:1-48).

The boundary-refinement and quality stages compare colors in CIELAB. The
reference feeds RGB in [0, 1] into ``rgb_to_lab`` whose first step divides by
255 (inc_color.glsl:14-16) — i.e. it operates on a non-standard, 255x-darkened
domain. We replicate that exactly, quirk included, since the LAB distances and
the 0.5 thresholds (pre_boundary.fs:19) are tuned to it.
"""
from __future__ import annotations

import jax.numpy as jnp

# inc_color.glsl:4-6
_WHITE_REF = jnp.array([95.047, 100.000, 108.883], jnp.float32)
_EPSILON = 0.008856
_KAPPA = 903.3


def _pivot_rgb(n: jnp.ndarray) -> jnp.ndarray:
    # inc_color.glsl:8-10
    return jnp.where(
        n > 0.04045, jnp.power((n + 0.055) / 1.055, 2.4), n / 12.92
    ) * 100.0


def _pivot_xyz(n: jnp.ndarray) -> jnp.ndarray:
    # inc_color.glsl:27-29
    return jnp.where(n > _EPSILON, jnp.cbrt(n), (_KAPPA * n + 16.0) / 116.0)


def rgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """``[..., 3]`` RGB in [0,1] -> reference-quirk LAB (inc_color.glsl:45-47)."""
    p = _pivot_rgb(rgb / 255.0)  # the reference divides its [0,1] input by 255
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    # inc_color.glsl:20-22
    x = r * 0.4124 + g * 0.3576 + b * 0.1805
    y = r * 0.2126 + g * 0.7152 + b * 0.0722
    z = r * 0.0193 + g * 0.1192 + b * 0.9505
    xyz = jnp.stack([x, y, z], axis=-1) / _WHITE_REF
    px, py, pz = (_pivot_xyz(xyz[..., i]) for i in range(3))
    # inc_color.glsl:38-40
    l_ = jnp.maximum(0.0, 116.0 * py - 16.0)
    a_ = 500.0 * (px - py)
    b_ = 200.0 * (py - pz)
    return jnp.stack([l_, a_, b_], axis=-1)
