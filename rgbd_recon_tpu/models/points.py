"""Point-splatting reconstruction.

≙ ReconPoints (framework/reconstruction/recon_points.cpp:27-113 + glsl/
points.{vs,gs,fs}): one point per depth pixel, unprojected through cv_xyz,
bbox-culled, sized 10/dist, textured via cv_uv with Phong/debug shade modes.
The GL point-sprite rasterization becomes a winner-takes-all z-buffer splat
(ops/splat.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.math import pmat

from .base import Reconstruction, ReconContext
from ..ops import splat as splat_ops
from ..ops.preprocess import ProcessedFrames
from ..ops.raymarch import RenderCamera, CAMERA_COLORS, phong_shade
from ..ops.sample import sample2d, sample3d, pixel_texcoords


class ReconPoints(Reconstruction):
    name = "points"

    def __init__(self, ctx: ReconContext, shade_mode: int = 0):
        super().__init__(ctx)
        self.shade_mode = shade_mode
        self._draw = jax.jit(self._draw_impl, static_argnums=(2, 3))

    def _draw_impl(self, frames: ProcessedFrames, cam_mats, width, height):
        mv, proj = cam_mats
        cam = RenderCamera(mv, proj, width, height)
        rig = self.ctx.rig
        k_, h, w = frames.depth.shape[:3]
        uv = pixel_texcoords(h, w)

        worlds, colors, quals = [], [], []
        valids = []
        for k in range(rig.num_sensors):
            depth = frames.depth[k, ..., 0]  # processed normalized depth
            coords = jnp.concatenate(
                [jnp.broadcast_to(uv, depth.shape + (2,)), depth[..., None]], -1
            )
            world = sample3d(rig.cv_xyz[k], coords)       # points.vs:28
            texc = sample3d(rig.cv_uv[k], coords)         # points.vs:30
            color = sample2d(frames.color[k], texc)       # points.fs:66
            normal = frames.normals[k]

            in_box = (
                jnp.all(world >= rig.bbox_min, -1)
                & jnp.all(world <= rig.bbox_max, -1)
            )
            valid = in_box & (depth > 0.0)                # points.gs:37-39
            # rgb-border cull (points.fs:38-42)
            valid &= (
                (texc[..., 0] > 0.01) & (texc[..., 0] < 0.99)
                & (texc[..., 1] > 0.01) & (texc[..., 1] < 0.99)
            )

            if self.shade_mode == 3:
                shaded = jnp.broadcast_to(CAMERA_COLORS[k], color.shape)
            elif self.shade_mode == 1:
                pos_es = pmat(world, mv[:3, :3].T) + mv[:3, 3]
                n_es = pmat(normal, mv[:3, :3].T)
                nn = jnp.linalg.norm(n_es, axis=-1, keepdims=True)
                n_es = n_es / jnp.where(nn < 1e-20, 1.0, nn)
                shaded = phong_shade(pos_es, n_es)
            elif self.shade_mode == 2:
                shaded = normal
            else:
                shaded = color

            worlds.append(world.reshape(-1, 3))
            colors.append(shaded.reshape(-1, 3))
            valids.append(valid.reshape(-1))

        world = jnp.concatenate(worlds)
        color = jnp.concatenate(colors)
        valid = jnp.concatenate(valids)
        max_size = 4.0 if self.shade_mode == 3 else 10.0  # points.gs:53-57
        rgba, depth = splat_ops.zbuffer_points(world, color, valid, cam, max_size)
        return rgba, depth

    def draw(self, frames: ProcessedFrames, cam: RenderCamera):
        rgba, depth = self._draw(
            frames, (cam.modelview, cam.proj), cam.width, cam.height
        )
        return rgba
