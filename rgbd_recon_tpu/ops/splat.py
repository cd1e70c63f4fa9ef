"""Forward-splatting rasterization for the non-TSDF reconstruction modes.

The reference's ReconPoints / ReconTrigrid / ReconMVT rely on the GL
rasterizer (point sprites with distance-scaled size, per-pixel triangle grids
with additive quality-weighted blending — recon_points.cpp:72-112,
recon_trigrid.cpp:82-148, glsl/trigrid_accum.*). TPUs have no rasterizer;
the TPU-native equivalent is forward splatting with deterministic
scatter-min/scatter-add:

  pass 1  z-buffer:    scatter-min of view depth over a small static splat
                       footprint (≙ the depth prepass / point sprite)
  pass 2  accumulate:  scatter-add of (shade * quality, quality) for
                       fragments within epsilon of the z-buffer
                       (≙ glBlendFunc(GL_ONE, GL_ONE) accumulation,
                       trigrid_accum.fs:60-73)
  resolve normalize:   color / alpha (≙ trigrid_normalize.fs:11-31)

A triangle-grid cell projects to ~1-3 px in typical novel views, so a small
square footprint approximates the rasterized triangle pair; this is the
documented deviation from exact GL rasterization.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.math import pmat

from .raymarch import RenderCamera, CAMERA_COLORS, phong_shade


class SplatBuffers(NamedTuple):
    color: jnp.ndarray  # f32[H, W, 4] accumulated (rgb*q, q)
    depth: jnp.ndarray  # f32[H, W] min view -z (+inf empty)


def project(world: jnp.ndarray, cam: RenderCamera):
    """World points [..., 3] -> (pixel xy f32[..., 2], view pos [..., 3],
    ndc z, in-frustum mask)."""
    mv = cam.modelview
    pos_es = pmat(world, mv[:3, :3].T) + mv[:3, 3]
    clip = pmat(jnp.concatenate([pos_es, jnp.ones_like(pos_es[..., :1])], -1), cam.proj.T)
    w = clip[..., 3]
    safe_w = jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    ndc = clip[..., :3] / safe_w[..., None]
    px = (ndc[..., 0] * 0.5 + 0.5) * cam.width
    py = (ndc[..., 1] * 0.5 + 0.5) * cam.height
    inside = (
        (w > 0)
        & (ndc[..., 0] >= -1) & (ndc[..., 0] <= 1)
        & (ndc[..., 1] >= -1) & (ndc[..., 1] <= 1)
        & (ndc[..., 2] >= -1) & (ndc[..., 2] <= 1)
    )
    return jnp.stack([px, py], -1), pos_es, ndc[..., 2], inside


def _flat_indices(pxy: jnp.ndarray, cam: RenderCamera, dx: int, dy: int):
    x = jnp.clip(jnp.floor(pxy[..., 0]).astype(jnp.int32) + dx, 0, cam.width - 1)
    y = jnp.clip(jnp.floor(pxy[..., 1]).astype(jnp.int32) + dy, 0, cam.height - 1)
    return y * cam.width + x


def splat(
    world: jnp.ndarray,
    colors: jnp.ndarray,
    quality: jnp.ndarray,
    valid: jnp.ndarray,
    cam: RenderCamera,
    epsilon: float = 0.075,  # recon_trigrid.cpp epsilon uniform
    footprint: int = 2,
    size: jnp.ndarray | None = None,
) -> SplatBuffers:
    """Two-pass accumulation splat of shaded points.

    world f32[N, 3]; colors f32[N, 3] (already shaded); quality f32[N];
    valid bool[N]. Returns accumulated buffers (use ``normalize`` to resolve).

    ``size``: optional per-point footprint f32[N] in pixels (clipped to
    [1, footprint]) — the splatting analogue of the reference rasterizing
    the PROJECTED triangle pair (whose extent scales with edge length,
    trigrid_accum.gs:26-57): oblique close-up views project grid cells to
    >2 px and a fixed 2 px square leaves inter-vertex holes. ``footprint``
    is then the static upper bound; None keeps the full fixed square.
    """
    pxy, pos_es, ndc_z, inside = project(world, cam)
    dist = -pos_es[..., 2]  # view-space depth (camera looks down -z)
    ok = valid & inside & (dist > 0)
    size_f = None if size is None else jnp.clip(size, 1.0, float(footprint))

    def cover(dx, dy):
        if size_f is None:
            return ok
        return ok & (size_f > dx) & (size_f > dy)

    # ONE stacked scatter per pass instead of footprint^2 sequential
    # scatters: min/add are order-independent, and the unrolled chain's
    # compile time scales with footprint^2 (72 scatter ops at cap 6 —
    # minutes of XLA compile; the stacked form is 2 ops at any cap)
    offsets = [(dx, dy) for dy in range(footprint) for dx in range(footprint)]
    idx_all = jnp.concatenate(
        [_flat_indices(pxy, cam, dx, dy) for dx, dy in offsets]
    )
    cov_all = jnp.concatenate([cover(dx, dy) for dx, dy in offsets])

    npix = cam.width * cam.height
    nf = len(offsets)
    dist_all = jnp.tile(dist, nf)
    zbuf = jnp.full((npix,), jnp.inf, jnp.float32)
    zbuf = zbuf.at[idx_all].min(jnp.where(cov_all, dist_all, jnp.inf))

    wq = quality
    payload = jnp.concatenate([colors * wq[..., None], wq[..., None]], -1)
    zb = zbuf[idx_all]
    # within-epsilon test ≙ |position_curr_es - pos_es| (accum fs :60-66)
    # reconstructed along the same ray: |pos_es| * |1 - zb/dist|
    ratio_all = jnp.tile(
        jnp.linalg.norm(pos_es, axis=-1) / jnp.maximum(dist, 1e-9), nf
    )
    eps_ok = cov_all & (jnp.abs(dist_all - zb) * ratio_all < epsilon)
    acc = jnp.zeros((npix, 4), jnp.float32)
    acc = acc.at[idx_all].add(
        jnp.where(eps_ok[..., None], jnp.tile(payload, (nf, 1)), 0.0)
    )

    return SplatBuffers(
        acc.reshape(cam.height, cam.width, 4),
        zbuf.reshape(cam.height, cam.width),
    )


def normalize(buffers: SplatBuffers):
    """trigrid_normalize.fs: color/alpha where alpha > 0, else background.
    Returns (rgba f32[H, W, 4], hit bool[H, W], view depth f32[H, W])."""
    a = buffers.color[..., 3]
    hit = a > 0.0
    rgb = buffers.color[..., :3] / jnp.maximum(a, 1e-20)[..., None]
    rgba = jnp.where(
        hit[..., None],
        jnp.concatenate([rgb, jnp.ones_like(a)[..., None]], -1),
        0.0,
    )
    return rgba, hit, buffers.depth


def zbuffer_points(
    world: jnp.ndarray,
    colors: jnp.ndarray,
    valid: jnp.ndarray,
    cam: RenderCamera,
    max_size: float = 10.0,  # points.gs:54
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Point-splat with winner-takes-all z-buffer (≙ ReconPoints: GL_POINTS
    with gl_PointSize = max_size/dist, points.gs:35-60).

    Returns (rgba f32[H, W, 4], depth f32[H, W]). The distance-scaled point
    size becomes a per-point square footprint of 1..3 px.
    """
    pxy, pos_es, ndc_z, inside = project(world, cam)
    dist = jnp.linalg.norm(pos_es, axis=-1)
    ok = valid & inside & (-pos_es[..., 2] > 0)
    size = jnp.clip(max_size / jnp.maximum(dist, 1e-6), 1.0, 3.0)

    offsets = [(dx, dy) for dy in range(-1, 2) for dx in range(-1, 2)]
    nf = len(offsets)
    idx_all = jnp.concatenate(
        [_flat_indices(pxy, cam, dx, dy) for dx, dy in offsets]
    )
    cov_all = jnp.concatenate([
        ok & (size >= jnp.maximum(abs(dx), abs(dy)) * 2.0 - 1.0 + 1e-6)
        for dx, dy in offsets
    ])

    npix = cam.width * cam.height
    zdist = -pos_es[..., 2]
    zdist_all = jnp.tile(zdist, nf)
    zbuf = jnp.full((npix,), jnp.inf, jnp.float32)
    zbuf = zbuf.at[idx_all].min(jnp.where(cov_all, zdist_all, jnp.inf))

    rgba = jnp.concatenate([colors, jnp.ones_like(colors[..., :1])], -1)
    win = cov_all & (zdist_all <= zbuf[idx_all] + 1e-7)
    cbuf = jnp.zeros((npix, 4), jnp.float32)
    cbuf = cbuf.at[jnp.where(win, idx_all, npix)].set(
        jnp.tile(rgba, (nf, 1)), mode="drop"
    )
    return cbuf.reshape(cam.height, cam.width, 4), zbuf.reshape(cam.height, cam.width)
