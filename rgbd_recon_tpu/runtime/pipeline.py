"""Whole-frame pipeline orchestration.

The TPU equivalent of the reference's per-frame hot path
(kinect_client.cpp:580-614 ``draw3d``): update -> preprocess -> brick
occupancy -> TSDF integrate -> raymarch draw -> hole fill — but expressed as
ONE jitted pure function of (depth, color, camera), so XLA fuses the whole
frame into a single device program with no host round-trips (the reference
needs a GPU->CPU occupancy readback per frame, recon_integration.cpp:430-445;
we keep the occupancy mask on device).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..calibration.rig import RigCalibration
from ..utils.math import Bbox
from ..ops import preprocess as pp
from ..ops import bricks as brick_ops
from ..ops import tsdf as tsdf_ops
from ..ops import tsdf_fast
from ..ops import raymarch as rm
from ..ops import raymarch_fast as rmf
from ..ops import inpaint


class PipelineConfig(NamedTuple):
    """Static configuration (kinect_client.cpp:86-92 defaults)."""

    voxel_size: float = 0.01
    brick_size: float = 0.1
    tsdf_limit: float = 0.01
    min_voxels_per_brick: int = 10
    render_width: int = 1280
    render_height: int = 720
    shade_mode: int = 0
    use_bricks: bool = True
    skip_space: bool = True
    fill_holes: bool = True
    num_lods: int = 6
    filter_textures: bool = True
    use_processed_depth: bool = True
    refine_boundary: bool = True
    tsdf_res: tuple[int, int, int] | None = None  # override ceil(bbox/voxel)
    # fast (MXU-structured) integration + sweep renderer (ops/tsdf_fast.py,
    # ops/raymarch_fast.py); requires a 16-aligned volume res
    fast_path: bool = True
    max_bricks: int = 1024        # occupied-brick capacity of the fast path
    sample_window: int = 64       # image window per brick (px)
    sweep_res: tuple[int, int] = (512, 512)  # intermediate sweep grid


class FrameOutput(NamedTuple):
    color: jnp.ndarray          # f32[H, W, 4] final image (hole-filled)
    depth: jnp.ndarray          # f32[H, W] window depth
    hit: jnp.ndarray            # bool[H, W]
    tsdf: jnp.ndarray           # f32[Vz, Vy, Vx]
    occupied_ratio: jnp.ndarray  # f32[] (≙ ReconIntegration::occupiedRatio)
    num_samples: jnp.ndarray    # i32[H, W] raymarch cost image


class FramePipeline:
    """Holds the rig + static config and exposes a jitted ``step``.

    ≙ the composition of NetKinectArray::processTextures +
    ReconIntegration::{integrate, drawF} with camera matrices as per-call
    inputs (model/view from the navigator, kinect_client.cpp:537-567).
    """

    def __init__(self, rig: RigCalibration, cfg: PipelineConfig = PipelineConfig()):
        self.rig = rig
        self.cfg = cfg
        self.bbox = rig.bbox
        if cfg.tsdf_res is not None:
            self.tsdf_cfg = tsdf_ops.TsdfConfig(cfg.tsdf_res, cfg.tsdf_limit)
        else:
            self.tsdf_cfg = tsdf_ops.TsdfConfig.from_voxel_size(
                self.bbox, cfg.voxel_size, cfg.tsdf_limit
            )
        self.brick_grid = brick_ops.make_brick_grid(
            self.bbox, cfg.brick_size, cfg.voxel_size
        )
        self.pre_cfg = pp.PreprocessConfig(
            filter_textures=cfg.filter_textures,
            use_processed_depth=cfg.use_processed_depth,
            refine_boundary=cfg.refine_boundary,
        )
        vx, vy, vz = self.tsdf_cfg.res
        self.use_fast = bool(
            cfg.fast_path and cfg.use_bricks
            and vx % tsdf_fast.BRICK == 0 and vy % tsdf_fast.BRICK == 0
            and vz % tsdf_fast.BRICK == 0
        )
        self.tables = (
            tsdf_fast.precompute_tables(rig, self.tsdf_cfg) if self.use_fast else None
        )
        self._step = jax.jit(self._step_impl, static_argnums=(4, 5))

    # -- pure step ---------------------------------------------------------

    def _step_impl(self, depth_m, color, modelview, proj, axis=2, flip=False) -> FrameOutput:
        cfg = self.cfg
        rig = self.rig
        frames = pp.preprocess(depth_m, color, rig, self.pre_cfg)

        mask = None
        vox_mask = None
        occupied = jnp.float32(1.0)
        if cfg.use_bricks:
            counts = brick_ops.mark_bricks(frames.world, frames.world_valid, self.brick_grid)
            mask = brick_ops.occupancy_mask(counts, cfg.min_voxels_per_brick)
            vox_mask = brick_ops.voxel_occupancy(mask, self.brick_grid, self.tsdf_cfg.res)
            occupied = brick_ops.occupied_ratio(mask)

        cam = rm.RenderCamera(modelview, proj, cfg.render_width, cfg.render_height)
        if self.use_fast:
            mask16 = tsdf_fast.brick16_mask(vox_mask)
            vol, cvol = tsdf_fast.integrate_sparse(
                frames, self.tables, self.tsdf_cfg, mask16,
                max_bricks=cfg.max_bricks, window=cfg.sample_window,
            )
            n_slices = self.tsdf_cfg.res[axis]
            occ_slices = (
                rmf.slab_occupancy(mask16, axis, n_slices) if cfg.skip_space else None
            )
            out = rmf.render_fast(
                vol, cvol, cam, self.bbox, self.tsdf_cfg.limit, axis, flip,
                rm.RenderParams(shade_mode=cfg.shade_mode),
                cfg=rmf.SweepConfig(res=cfg.sweep_res),
                slab_occupied=occ_slices,
            )
        else:
            vol = tsdf_ops.integrate(frames, rig, self.tsdf_cfg, voxel_mask=vox_mask)
            cvol = tsdf_ops.integrate_colors(frames, rig, self.tsdf_cfg, voxel_mask=vox_mask)
            bsz_vol = self.brick_grid.brick_size / float(np.max(self.bbox.size))
            out = rm.render(
                vol, cvol, frames, rig, cam, self.bbox, self.tsdf_cfg.limit,
                rm.RenderParams(shade_mode=cfg.shade_mode),
                brick_mask=mask if (cfg.skip_space and cfg.use_bricks) else None,
                brick_size_vol=bsz_vol,
            )

        color_out = out.color
        if cfg.fill_holes:
            pyr_c, pyr_d = inpaint.build_pyramid(out.color, out.depth, cfg.num_lods)
            color_out = inpaint.colorfill(pyr_c, pyr_d)

        return FrameOutput(
            color=color_out,
            depth=out.depth,
            hit=out.hit,
            tsdf=vol,
            occupied_ratio=occupied,
            num_samples=out.num_samples,
        )

    # -- public API --------------------------------------------------------

    def step(self, depth_m, color, modelview, proj) -> FrameOutput:
        """One fused frame. depth_m f32[K,H,W] meters; color f32[K,Hc,Wc,3];
        modelview/proj f32[4,4] row-major GL matrices (host numpy — the
        sweep axis is chosen host-side; at most 6 jit variants get cached)."""
        axis, flip = 2, False
        if self.use_fast:
            axis, flip = rmf.pick_axis(
                np.asarray(modelview), rm.vol_to_world_matrix(self.bbox)
            )
        return self._step(
            jnp.asarray(depth_m), jnp.asarray(color),
            jnp.asarray(modelview), jnp.asarray(proj),
            axis, flip,
        )

    def default_camera(self, eye=None) -> tuple[np.ndarray, np.ndarray]:
        """Convenience view/projection aimed at the volume center."""
        from ..utils.math import look_at, perspective

        center = (self.bbox.min + self.bbox.max) * 0.5
        if eye is None:
            eye = center + np.array([1.5, 0.8, 2.2], np.float32)
        mv = look_at(eye, center, [0, 1, 0])
        proj = perspective(
            50.0, self.cfg.render_width / self.cfg.render_height, 0.1, 200.0
        )
        return mv, proj
