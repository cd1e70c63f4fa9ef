"""TSDF volume fusion.

TPU re-expression of the reference's integration pass
(glsl/tsdf_integration.vs:23-59 + recon_integration.cpp:242-269): instead of
one GL vertex per voxel with rasterizer discard and ``imageStore`` into an
R32F image3D, every voxel of the ``[Vz, Vy, Vx]`` grid is updated in a single
fused program; the sensor loop is a compile-time-unrolled scan carrying the
quality-weighted running average ``(weighted_tsd, total_weight)`` exactly as
the shader does (:50-54).

Sampling parity (see ops/sample.py and NetKinectArray.cpp:181-188):
  cv_xyz_inv  trilinear (GL_LINEAR 3D texture)
  silhouette  bilinear
  depth       NEAREST (m_textures_depth_b is GL_NEAREST)
  quality     bilinear
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from .sample import sample2d, sample3d
from .preprocess import ProcessedFrames
from ..calibration.rig import RigCalibration
from ..utils.math import Bbox


class TsdfConfig(NamedTuple):
    """Volume geometry + fusion params (kinect_client.cpp:86-88 defaults)."""

    res: tuple[int, int, int]  # (vx, vy, vz) voxel counts
    limit: float = 0.01        # tsdf truncation (normalized-depth units)

    @staticmethod
    def from_voxel_size(bbox: Bbox, voxel_size: float, limit: float = 0.01,
                        align: int = 1) -> "TsdfConfig":
        # recon_integration.cpp:342-345: res = ceil(bbox_size / voxel_size).
        # ``align``: round each axis res UP to this multiple (the TPU fast
        # path tiles the volume in 16^3 bricks with 128-voxel x rows, so
        # the pipeline derives with align=16 — voxels come out slightly
        # finer than requested along the padded axes, never coarser; a
        # TPU-first deviation from the reference's exact ceil)
        res = tuple(
            -(-int(np.ceil(float(s) / voxel_size)) // align) * align
            for s in bbox.size
        )
        return TsdfConfig(res, limit)


def voxel_centers_normalized(res: tuple[int, int, int]) -> jnp.ndarray:
    """Normalized voxel-center grid f32[Vz, Vy, Vx, 3] in GL (s, t, r) order.

    VolumeSampler feeds voxel centers (volume_sampler.cpp:20) as in_Position,
    and ``ivec3(position * res)`` recovers the integer index
    (tsdf_integration.vs:57)."""
    vx, vy, vz = res
    xs = (jnp.arange(vx, dtype=jnp.float32) + 0.5) / vx
    ys = (jnp.arange(vy, dtype=jnp.float32) + 0.5) / vy
    zs = (jnp.arange(vz, dtype=jnp.float32) + 0.5) / vz
    zz, yy, xx = jnp.meshgrid(zs, ys, xs, indexing="ij")
    return jnp.stack([xx, yy, zz], axis=-1)


def integrate(
    frames: ProcessedFrames,
    rig: RigCalibration,
    cfg: TsdfConfig,
    voxel_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Fuse all sensors into a TSDF volume f32[Vz, Vy, Vx].

    ``voxel_mask`` (bool[Vz, Vy, Vx], from ops/bricks.voxel_occupancy) limits
    the update to occupied bricks; unmasked voxels keep the clear value
    ``-limit`` (recon_integration.cpp:249-250 clears the volume to -limit and
    only draws occupied bricks' voxels).
    """
    limit = jnp.float32(cfg.limit)
    pos = voxel_centers_normalized(cfg.res)
    num_sensors = rig.num_sensors

    weighted_tsd = jnp.full(pos.shape[:-1], cfg.limit, jnp.float32)
    total_weight = jnp.zeros(pos.shape[:-1], jnp.float32)

    for i in range(num_sensors):
        pos_calib = sample3d(rig.cv_xyz_inv[i], pos)  # (u, v, d_norm)
        uv = pos_calib[..., :2]
        sil = sample2d(frames.silhouette[i][..., None], uv)[..., 0]
        depth = sample2d(frames.depth[i][..., :1], uv, method="nearest")[..., 0]
        qual = sample2d(frames.quality[i][..., None], uv)[..., 0]

        sdist = pos_calib[..., 2] - depth  # tsdf_integration.vs:41

        # silhouette gate (:33-39): when sil < 1 and nothing written yet,
        # force -limit and skip this sensor; when something was written the
        # shader falls through and still integrates. The GL interpolator
        # returns exactly 1.0 on constant-1 windows; float lerp may not, so
        # compare against 1-1e-4 (shared with the fast path, tsdf_fast.py).
        skip = (sil < 0.9999) & (weighted_tsd >= limit)
        forced = jnp.where(skip, -limit, weighted_tsd)

        in_front = sdist <= -limit
        in_band = (sdist > -limit) & (sdist < limit)
        new_tw = total_weight + qual
        accum = jnp.where(
            new_tw > 0.0,
            (weighted_tsd * total_weight + qual * sdist) / jnp.where(new_tw > 0.0, new_tw, 1.0),
            weighted_tsd,
        )
        wt_next = jnp.where(in_front, -limit, jnp.where(in_band, accum, weighted_tsd))
        tw_next = jnp.where(in_band & (new_tw > 0.0), new_tw, total_weight)

        weighted_tsd = jnp.where(skip, forced, wt_next)
        total_weight = jnp.where(skip, total_weight, tw_next)

    if voxel_mask is not None:
        weighted_tsd = jnp.where(voxel_mask, weighted_tsd, -limit)
    return weighted_tsd


def integrate_colors(
    frames: ProcessedFrames,
    rig: RigCalibration,
    cfg: TsdfConfig,
    voxel_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-voxel blended color volume f32[Vz, Vy, Vx, 4] (rgb, flag).

    TPU-first deferred shading: the reference blends sensor colors per *ray
    sample* inside the raymarch shader (glsl/tsdf_raymarch.fs:295-330
    ``blendColors``). We evaluate the identical blend at voxel centers during
    integration and let the renderer interpolate the color volume — turning
    per-ray scattered texture reads into one dense volume pass. alpha > 0
    marks a quality-weighted blend, alpha <= 0 the 1/dist fallback.
    """
    limit = jnp.float32(cfg.limit)
    pos = voxel_centers_normalized(cfg.res)

    total_color = jnp.zeros(pos.shape[:-1] + (3,), jnp.float32)
    total_weight = jnp.zeros(pos.shape[:-1], jnp.float32)
    total_color2 = jnp.zeros(pos.shape[:-1] + (3,), jnp.float32)
    total_weight2 = jnp.zeros(pos.shape[:-1], jnp.float32)

    for i in range(rig.num_sensors):
        pos_calib = sample3d(rig.cv_xyz_inv[i], pos)
        pos_color = sample3d(rig.cv_uv[i], pos_calib)  # tsdf_raymarch.fs:304
        color = sample2d(frames.color[i], pos_color)
        depth = sample2d(frames.depth[i][..., :1], pos_calib[..., :2], method="nearest")[..., 0]
        dist = jnp.abs(depth - pos_calib[..., 2])
        qual = sample2d(frames.quality[i][..., None], pos_calib[..., :2])[..., 0]
        qual = jnp.where(dist < limit, qual, 0.0)  # :311-313

        w = qual / (dist + 0.01)  # :315-316
        total_color = total_color + color * w[..., None]
        total_weight = total_weight + w
        w2 = 1.0 / jnp.maximum(dist, 1e-9)  # :318-319
        total_color2 = total_color2 + color * w2[..., None]
        total_weight2 = total_weight2 + w2

    has_quality = total_weight > 0.0
    blended = jnp.where(
        has_quality[..., None],
        total_color / jnp.maximum(total_weight, 1e-20)[..., None],
        total_color2 / jnp.maximum(total_weight2, 1e-20)[..., None],
    )
    flag = jnp.where(has_quality, 1.0, -1.0)
    out = jnp.concatenate([blended, flag[..., None]], axis=-1)
    if voxel_mask is not None:
        out = jnp.where(voxel_mask[..., None], out, 0.0)
    return out
