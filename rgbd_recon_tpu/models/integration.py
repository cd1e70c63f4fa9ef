"""TSDF integration + raymarch reconstruction (the flagship strategy).

≙ ReconIntegration (framework/reconstruction/recon_integration.hpp:35-103):
owns the TSDF volume geometry, brick machinery, renderer and hole filling,
with the same knob surface (setTsdfLimit/setVoxelSize/setBrickSize/
setColorFilling/setUseBricks/setSpaceSkip/setDrawBricks/
setMinVoxelsPerBrick, occupiedRatio). Compute goes through the fast
MXU-structured paths (ops/tsdf_fast.py, ops/raymarch_fast.py) with the
reference-faithful gather paths as fallback.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .base import Reconstruction, ReconContext
from ..ops import bricks as brick_ops
from ..ops import tsdf as tsdf_ops
from ..ops import tsdf_fast
from ..ops import raymarch as rm
from ..ops import raymarch_fast as rmf
from ..ops import inpaint
from ..ops.preprocess import ProcessedFrames
from ..ops.raymarch import RenderCamera
from ..utils.timers import TimerDatabase


class ReconIntegration(Reconstruction):
    name = "integration"

    def __init__(self, ctx: ReconContext, limit: float = 0.01,
                 voxel_size: float = 0.01, brick_size: float = 0.1):
        super().__init__(ctx)
        self._limit = limit
        self._voxel_size = voxel_size
        self._brick_size = brick_size
        self._min_voxels = 10
        self._fill_holes = True
        self._use_bricks = True
        self._skip_space = True
        self._draw_bricks = False
        self._shade_mode = 0
        self._ratio_occupied = 0.0
        self._num_lods = 6
        self._rebuild()
        for t in ("2integrate", "holefill", "brickdraw", "3recon"):
            TimerDatabase.instance().add_timer(t)

    # -- knobs (≙ recon_integration.hpp setters) ---------------------------

    def set_tsdf_limit(self, limit: float):
        self._limit = limit
        self._rebuild()

    def set_voxel_size(self, size: float):
        # recon_integration.cpp:340-353
        self._voxel_size = size
        self._rebuild()

    def set_brick_size(self, size: float):
        # snapped to voxel multiples (recon_integration.cpp:462-464)
        self._brick_size = size
        self._rebuild()

    def set_min_voxels_per_brick(self, n: int):
        self._min_voxels = n

    def set_color_filling(self, v: bool):
        self._fill_holes = v
        self._jit()

    def set_use_bricks(self, v: bool):
        self._use_bricks = v
        self._jit()

    def set_space_skip(self, v: bool):
        self._skip_space = v
        self._jit()

    def set_draw_bricks(self, v: bool):
        self._draw_bricks = v

    def set_shade_mode(self, mode: int):
        self._shade_mode = mode
        self._jit()

    def occupied_ratio(self) -> float:
        return float(self._ratio_occupied)

    @property
    def volume_res(self):
        return self.tsdf_cfg.res

    # ---------------------------------------------------------------------

    def _rebuild(self):
        self.tsdf_cfg = tsdf_ops.TsdfConfig.from_voxel_size(
            self.ctx.bbox, self._voxel_size, self._limit
        )
        # fast path wants 16-aligned volumes; round res up
        res = tuple(-(-r // tsdf_fast.BRICK) * tsdf_fast.BRICK for r in self.tsdf_cfg.res)
        self.tsdf_cfg = self.tsdf_cfg._replace(res=res)
        self.brick_grid = brick_ops.make_brick_grid(
            self.ctx.bbox, self._brick_size, self._voxel_size
        )
        self.tables = tsdf_fast.precompute_tables(self.ctx.rig, self.tsdf_cfg)
        self._jit()

    def _jit(self):
        self._draw = jax.jit(self._draw_impl, static_argnums=(2, 3, 4, 5))

    def _draw_impl(self, frames: ProcessedFrames, cam_mats, width, height, axis, flip):
        mv, proj = cam_mats
        cam = RenderCamera(mv, proj, width, height)
        counts = brick_ops.mark_bricks(
            frames.world, frames.world_valid, self.brick_grid
        )
        mask = brick_ops.occupancy_mask(counts, self._min_voxels)
        ratio = brick_ops.occupied_ratio(mask)
        mask16 = brick_ops.block_occupancy(
            mask, self.brick_grid, self.tsdf_cfg.res, tsdf_fast.BRICK
        )
        if not self._use_bricks:
            mask16 = jnp.ones_like(mask16)

        vol, cvol = tsdf_fast.integrate_sparse(
            frames, self.tables, self.tsdf_cfg, mask16
        )
        occ = (
            rmf.slab_occupancy(mask16, axis, self.tsdf_cfg.res[axis])
            if (self._skip_space and self._use_bricks) else None
        )
        out = rmf.render_fast(
            vol, cvol, cam, self.ctx.bbox, self.tsdf_cfg.limit, axis, flip,
            rm.RenderParams(shade_mode=self._shade_mode),
            slab_occupied=occ,
        )
        color = out.color
        if self._fill_holes:
            pyr_c, pyr_d = inpaint.build_pyramid(out.color, out.depth, self._num_lods)
            color = inpaint.colorfill(pyr_c, pyr_d)
        return color, out.depth, ratio

    def draw(self, frames: ProcessedFrames, cam: RenderCamera):
        axis, flip = rmf.pick_axis(
            np.asarray(cam.modelview), rm.vol_to_world_matrix(self.ctx.bbox)
        )
        color, depth, ratio = self._draw(
            frames, (cam.modelview, cam.proj), cam.width, cam.height, axis, flip
        )
        self._ratio_occupied = np.asarray(ratio)
        return color
