"""Calibration/TSDF debug visualization.

≙ ReconCalibs (framework/reconstruction/recon_calibs.cpp:22-66 + glsl/
calib_vis.*): renders the selected sensor's calibration volume for
inspection. The GL version splats colored voxels; here the inspection images
are slice mosaics of the lookup volumes plus a point-splat of the valid
inverse-calibration voxels (drawValidVoxels, CalibVolumes.cpp:188-212).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .base import Reconstruction, ReconContext
from ..ops import splat as splat_ops
from ..ops.preprocess import ProcessedFrames
from ..ops.raymarch import RenderCamera


class ReconCalibs(Reconstruction):
    name = "calibs"

    def __init__(self, ctx: ReconContext):
        super().__init__(ctx)
        self.active = 0
        self._draw = jax.jit(self._draw_impl, static_argnums=(1, 2, 3))

    def set_active_kinect(self, num: int) -> None:
        # ≙ ReconCalibs::setActiveKinect
        self.active = int(num) % self.ctx.rig.num_sensors

    def slice_mosaic(self, volume: str = "cv_xyz_inv", slices: int = 9) -> np.ndarray:
        """[rows*h, cols*w, 3] mosaic of evenly-spaced z-slices, channels
        normalized to [0,1] for display."""
        rig = self.ctx.rig
        vol = getattr(rig, volume)[self.active]
        d = vol.shape[0]
        cols = int(np.ceil(np.sqrt(slices)))
        rows = int(np.ceil(slices / cols))
        picks = np.linspace(0, d - 1, slices).astype(int)
        imgs = np.asarray(vol[picks, :, :, :3])
        lo = imgs.min()
        hi = imgs.max()
        imgs = (imgs - lo) / max(hi - lo, 1e-9)
        h, w = imgs.shape[1:3]
        grid = np.zeros((rows * h, cols * w, 3), np.float32)
        for i, img in enumerate(imgs):
            r, c = divmod(i, cols)
            grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = img
        return grid

    def _draw_impl(self, cam_mats_and_k, width, height, stride):
        (mv, proj), k = cam_mats_and_k
        cam = RenderCamera(mv, proj, width, height)
        rig = self.ctx.rig
        inv = rig.cv_xyz_inv[k][::stride, ::stride, ::stride]
        valid = inv[..., 0] >= 0.0
        vz, vy, vx = inv.shape[:3]
        zs = (jnp.arange(vz, dtype=jnp.float32) + 0.5) / vz
        ys = (jnp.arange(vy, dtype=jnp.float32) + 0.5) / vy
        xs = (jnp.arange(vx, dtype=jnp.float32) + 0.5) / vx
        zz, yy, xx = jnp.meshgrid(zs, ys, xs, indexing="ij")
        bmin = rig.bbox_min
        size = rig.bbox_max - rig.bbox_min
        world = jnp.stack([xx, yy, zz], -1) * size + bmin
        # color voxels by their sensor coords (calib_vis.fs visualization)
        color = jnp.clip(inv[..., :3], 0.0, 1.0)
        rgba, depth = splat_ops.zbuffer_points(
            world.reshape(-1, 3), color.reshape(-1, 3), valid.reshape(-1), cam
        )
        return rgba

    def draw(self, frames: ProcessedFrames, cam: RenderCamera):
        return self._draw(
            ((cam.modelview, cam.proj), self.active), cam.width, cam.height, 2
        )
