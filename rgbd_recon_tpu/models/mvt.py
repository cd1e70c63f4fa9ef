"""Legacy multi-view texturing reconstruction.

≙ ReconMVT (framework/reconstruction/recon_mvt.cpp:15-156 + glsl/mvt_accum.*):
same two-pass accumulation as trigrid, but the bilateral filter runs in the
vertex shader on UNPROCESSED depth (recon_mvt.cpp:32 binds the raw depth
array), quality = lateral_quality^30 / depth (mvt_accum.vs:97, .fs:52), and
grid validity uses ``l = min_length * avg_depth + 0.005`` (mvt_accum.gs:36-39).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .trigrid import ReconTrigrid
from ..ops.preprocess import MAX_DEPTH_M, _pad_edge, _shifted
from ..ops.sample import sample3d, pixel_texcoords


def mvt_bilateral(depth_m: jnp.ndarray, cv_min, cv_max):
    """mvt_accum.vs:43-102: returns (filtered depth meters, lateral^30).

    Differs from pre_depth.fs: weight-sum guard (w>0), and the w_range <
    0.65*n rejection zeroes the depth (mvt_accum.vs:90-95).
    """
    kk, h, w = depth_m.shape
    ks = 6
    n = float((2 * ks + 1) ** 2)
    outside_c = (depth_m < cv_min) | (depth_m > cv_max)
    drm = 0.35 * depth_m / MAX_DEPTH_M
    padded = _pad_edge(depth_m, ks)
    depth_bf = jnp.zeros_like(depth_m)
    w_acc = jnp.zeros_like(depth_m)
    w_range = jnp.zeros_like(depth_m)
    border = jnp.zeros_like(depth_m)
    for dy in range(-ks, ks + 1):
        for dx in range(-ks, ks + 1):
            s = _shifted(padded, dy, dx, h, w, ks)
            dist = jnp.abs(s - depth_m)
            reject = (s < cv_min) | (s > cv_max) | (dist > drm)
            gs = 1.0 - math.hypot(dx, dy) / ks
            gr = 1.0 - jnp.minimum(dist, drm) / jnp.where(drm > 0, drm, 1.0)
            depth_bf += jnp.where(reject, 0.0, gs * gr * s)
            w_acc += jnp.where(reject, 0.0, gs * gr)
            w_range += jnp.where(reject, 0.0, gr)
            border += reject.astype(depth_m.dtype)
    lateral = 1.0 - border / n
    filtered = jnp.where(w_acc > 0.0, depth_bf / jnp.where(w_acc > 0, w_acc, 1.0), 0.0)
    filtered = jnp.where(w_range < n * 0.65, 0.0, filtered)  # vs:90-95
    filtered = jnp.where(outside_c, 0.0, filtered)
    return filtered, lateral**30.0


class ReconMVT(ReconTrigrid):
    name = "mvt"

    def _per_sensor(self, k, frames, mv):
        rig = self.ctx.rig
        cv_min = rig.depth_limits[k, 0]
        cv_max = rig.depth_limits[k, 1]
        raw = frames.depth_raw[k : k + 1]
        filtered, lat_q = mvt_bilateral(raw, cv_min, cv_max)
        filtered = filtered[0]
        lat_q = lat_q[0]
        d_idx = (filtered - cv_min) / (cv_max - cv_min)  # mvt_accum.vs:107
        h, w = filtered.shape
        uv = pixel_texcoords(h, w)
        coords = jnp.concatenate(
            [jnp.broadcast_to(uv, d_idx.shape + (2,)), d_idx[..., None]], -1
        )
        world = sample3d(rig.cv_xyz[k], coords)
        qual = lat_q / jnp.maximum(filtered, 1e-6)  # mvt_accum.fs:52
        color = frames.color_registered[k]
        valid = self._edge_valid_mvt(world, filtered)
        return world, color, qual, valid

    def _edge_valid_mvt(self, world, depth):
        w_r = jnp.roll(world, -1, axis=1)
        w_d = jnp.roll(world, -1, axis=0)
        w_rd = jnp.roll(jnp.roll(world, -1, axis=0), -1, axis=1)
        d_r = jnp.roll(depth, -1, axis=1)
        d_d = jnp.roll(depth, -1, axis=0)
        d_rd = jnp.roll(jnp.roll(depth, -1, axis=0), -1, axis=1)
        avg = (depth + d_r + d_d) / 3.0
        l = self.min_length * avg + 0.005  # mvt_accum.gs:36-39

        def ok(a, b):
            return jnp.linalg.norm(a - b, axis=-1) < l

        depths_ok = (depth > 0.5) & (d_r > 0.5) & (d_d > 0.5) & (d_rd > 0.5)
        return (
            depths_ok
            & ok(world, w_r) & ok(world, w_d) & ok(w_r, w_d)
            & ok(w_r, w_rd) & ok(w_d, w_rd)
        )
