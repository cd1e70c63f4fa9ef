"""GL-exact texture sampling on jax arrays.

The reference's entire compute surface is built on GLSL ``texture()`` lookups
into 2D image arrays and 3D calibration/TSDF volumes (e.g.
``glsl/pre_depth.fs:133``, ``glsl/tsdf_integration.vs:31``,
``glsl/tsdf_raymarch.fs:136-137``). This module replicates the exact OpenGL
LINEAR / NEAREST + CLAMP_TO_EDGE semantics so per-voxel results can match the
GL renderer within 1e-3 (BASELINE.md accuracy bar):

* texel ``i`` has its center at normalized coordinate ``(i + 0.5) / N``
* LINEAR: ``c = t*N - 0.5`` clamped to ``[0, N-1]``, lerp between
  ``floor(c)`` and ``floor(c)+1`` (CLAMP_TO_EDGE clamps the coordinate)
* NEAREST: ``i = floor(t*N)`` clamped to ``[0, N-1]``

Array layouts (z-major, identical to the binary calib volume files,
``calibration_volume.hpp:57-59``):
  2D image: ``[H, W, C]``; texcoord ``(s, t)`` -> ``(x=s*W, y=t*H)``
  3D volume: ``[D, H, W, C]``; texcoord ``(s, t, r)`` -> x along W, y along H,
  z along D.

These are gather-based reference implementations; the hot paths re-express the
same math as one-hot matmuls / separable resamples (see ops/tsdf.py,
ops/raymarch.py).
"""
from __future__ import annotations

import jax.numpy as jnp


def _linear_prep(t: jnp.ndarray, n: int):
    """Map normalized coord -> (lo index, hi index, fraction) per GL LINEAR."""
    c = t * n - 0.5
    c = jnp.clip(c, 0.0, float(n - 1))
    i0 = jnp.floor(c)
    f = c - i0
    i0 = i0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, n - 1)
    return i0, i1, f


def _nearest_index(t: jnp.ndarray, n: int) -> jnp.ndarray:
    i = jnp.floor(t * n).astype(jnp.int32)
    return jnp.clip(i, 0, n - 1)


def sample2d(img: jnp.ndarray, uv: jnp.ndarray, method: str = "linear") -> jnp.ndarray:
    """Sample ``img [H, W, C]`` at texcoords ``uv [..., 2]`` -> ``[..., C]``."""
    h, w = img.shape[0], img.shape[1]
    flat = img.reshape(h * w, -1)
    s, t = uv[..., 0], uv[..., 1]
    if method == "nearest":
        x = _nearest_index(s, w)
        y = _nearest_index(t, h)
        return jnp.take(flat, y * w + x, axis=0, mode="clip")
    x0, x1, fx = _linear_prep(s, w)
    y0, y1, fy = _linear_prep(t, h)
    v00 = jnp.take(flat, y0 * w + x0, axis=0, mode="clip")
    v01 = jnp.take(flat, y0 * w + x1, axis=0, mode="clip")
    v10 = jnp.take(flat, y1 * w + x0, axis=0, mode="clip")
    v11 = jnp.take(flat, y1 * w + x1, axis=0, mode="clip")
    fx = fx[..., None]
    fy = fy[..., None]
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy


def sample3d(vol: jnp.ndarray, str_: jnp.ndarray, method: str = "linear") -> jnp.ndarray:
    """Sample ``vol [D, H, W, C]`` at texcoords ``str_ [..., 3]`` -> ``[..., C]``.

    Coordinate order is GL: ``(s, t, r)`` with s along W, t along H, r along D
    (so ``texture(cv_xyz, vec3(uv, depth))`` == ``sample3d(cv_xyz, [u, v, d])``).
    """
    d, h, w = vol.shape[0], vol.shape[1], vol.shape[2]
    flat = vol.reshape(d * h * w, -1)
    s, t, r = str_[..., 0], str_[..., 1], str_[..., 2]
    if method == "nearest":
        x = _nearest_index(s, w)
        y = _nearest_index(t, h)
        z = _nearest_index(r, d)
        return jnp.take(flat, (z * h + y) * w + x, axis=0, mode="clip")
    x0, x1, fx = _linear_prep(s, w)
    y0, y1, fy = _linear_prep(t, h)
    z0, z1, fz = _linear_prep(r, d)

    def tap(z, y, x):
        return jnp.take(flat, (z * h + y) * w + x, axis=0, mode="clip")

    fx = fx[..., None]
    fy = fy[..., None]
    fz = fz[..., None]
    c00 = tap(z0, y0, x0) * (1.0 - fx) + tap(z0, y0, x1) * fx
    c01 = tap(z0, y1, x0) * (1.0 - fx) + tap(z0, y1, x1) * fx
    c10 = tap(z1, y0, x0) * (1.0 - fx) + tap(z1, y0, x1) * fx
    c11 = tap(z1, y1, x0) * (1.0 - fx) + tap(z1, y1, x1) * fx
    c0 = c00 * (1.0 - fy) + c01 * fy
    c1 = c10 * (1.0 - fy) + c11 * fy
    return c0 * (1.0 - fz) + c1 * fz


def pixel_texcoords(h: int, w: int) -> jnp.ndarray:
    """Texcoord grid hitting every texel center, ``[H, W, 2]`` as (s, t).

    Equivalent to the fullscreen-pass ``pass_TexCoord`` the reference feeds
    every preprocessing shader (glsl/texture_passthrough.vs).
    """
    s = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    t = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    return jnp.stack(jnp.meshgrid(s, t, indexing="xy"), axis=-1)
