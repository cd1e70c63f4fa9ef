"""Triangle-grid multi-view blending reconstruction.

≙ ReconTrigrid (framework/reconstruction/recon_trigrid.cpp:15-153 + glsl/
trigrid_accum.*, trigrid_normalize.fs): a regular triangle grid over each
depth image, validity by world-space edge length ``l = min_length *
avg_depth * 4`` (trigrid_accum.gs:34-37), depth prepass + additive
quality-weighted accumulation with an epsilon z-test, then a normalize
resolve. Realized as a two-pass accumulation splat (ops/splat.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.math import pmat

from .base import Reconstruction, ReconContext
from ..ops import splat as splat_ops
from ..ops.preprocess import ProcessedFrames
from ..ops.raymarch import RenderCamera, CAMERA_COLORS, phong_shade


class ReconTrigrid(Reconstruction):
    name = "trigrid"

    def __init__(self, ctx: ReconContext, min_length: float = 0.0125,
                 epsilon: float = 0.075, shade_mode: int = 0,
                 adaptive: bool = True, footprint_cap: int = 6):
        super().__init__(ctx)
        self.min_length = min_length
        self.epsilon = epsilon  # recon_trigrid.cpp epsilon uniform
        self.shade_mode = shade_mode
        # adaptive=False reverts to the fixed 2 px square footprint
        # (pre-round-4 behaviour; kept for the adversarial-view A/B test).
        # footprint_cap bounds the per-point adaptive size (the splat costs
        # cap^2 scatter passes; 6 px keeps grazing close-up views watertight
        # — measured interior-hole fraction 1.2% vs 2.3% at cap 4)
        self.adaptive = adaptive
        self.footprint_cap = footprint_cap
        self._draw = jax.jit(self._draw_impl, static_argnums=(2, 3))

    def _edge_valid(self, world, depth, min_length, scale4: bool):
        """Grid-cell validity (trigrid_accum.gs validSurface): all edges of
        the two cell triangles shorter than l; invalid depths reject."""
        w_r = jnp.roll(world, -1, axis=1)
        w_d = jnp.roll(world, -1, axis=0)
        w_rd = jnp.roll(jnp.roll(world, -1, axis=0), -1, axis=1)
        d_r = jnp.roll(depth, -1, axis=1)
        d_d = jnp.roll(depth, -1, axis=0)
        d_rd = jnp.roll(jnp.roll(depth, -1, axis=0), -1, axis=1)
        avg = (depth + d_r + d_d) / 3.0
        if scale4:
            l = self.min_length * avg * 4.0        # trigrid_accum.gs:34
        else:
            l = self.min_length * avg + 0.005      # mvt_accum.gs:36-39
        def ok(a, b):
            return jnp.linalg.norm(a - b, axis=-1) < l
        depths_ok = (depth > 0.0) & (d_r > 0.0) & (d_d > 0.0) & (d_rd > 0.0)
        if not scale4:
            depths_ok = (depth > 0.5) & (d_r > 0.5) & (d_d > 0.5) & (d_rd > 0.5)
        return (
            depths_ok
            & ok(world, w_r) & ok(world, w_d) & ok(w_r, w_d)
            & ok(w_r, w_rd) & ok(w_d, w_rd)
        )

    def _per_sensor(self, k, frames, mv):
        """Returns (world, shaded color, quality, valid) for sensor k."""
        rig = self.ctx.rig
        depth = frames.depth[k, ..., 0]
        world = frames.world[k]
        texc_valid = True
        color = frames.color_registered[k]
        qual = frames.quality[k]
        valid = self._edge_valid(world, depth, self.min_length, scale4=True)
        return world, color, qual, valid

    def _draw_impl(self, frames: ProcessedFrames, cam_mats, width, height):
        mv, proj = cam_mats
        cam = RenderCamera(mv, proj, width, height)
        rig = self.ctx.rig
        worlds, colors, quals, valids, sizes = [], [], [], [], []
        for k in range(rig.num_sensors):
            world, color, qual, valid = self._per_sensor(k, frames, mv)

            in_box = (
                jnp.all(world >= rig.bbox_min, -1)
                & jnp.all(world <= rig.bbox_max, -1)
            )  # trigrid_accum.fs:41-43
            valid = valid & in_box

            # backface cull via eye-space cell normal (gs:56 + fs:52-55)
            pos_es = pmat(world, mv[:3, :3].T) + mv[:3, 3]
            a = jnp.roll(pos_es, -1, axis=1) - pos_es
            b = jnp.roll(pos_es, -1, axis=0) - pos_es
            n_es = jnp.cross(a, b)
            nn = jnp.linalg.norm(n_es, axis=-1, keepdims=True)
            n_es = n_es / jnp.where(nn < 1e-20, 1.0, nn)
            dirn = pos_es / jnp.maximum(
                jnp.linalg.norm(pos_es, axis=-1, keepdims=True), 1e-20
            )
            facing = jnp.sum(-n_es * dirn, axis=-1) <= 0.0
            valid = valid & facing

            if self.shade_mode == 3:
                shaded = jnp.broadcast_to(CAMERA_COLORS[k], color.shape)
            elif self.shade_mode == 1:
                shaded = phong_shade(pos_es, -n_es)
            elif self.shade_mode == 2:
                shaded = frames.normals[k]
            else:
                shaded = color

            # adaptive splat footprint = projected cell extent in pixels
            # (the reference rasterizes the triangle pair, whose screen size
            # scales with the projected edges, trigrid_accum.gs:26-57; a
            # fixed 2 px square leaves holes in oblique close-up views)
            pxy, _, _, _ = splat_ops.project(world, cam)
            ext = jnp.maximum(
                jnp.linalg.norm(jnp.roll(pxy, -1, axis=1) - pxy, axis=-1),
                jnp.linalg.norm(jnp.roll(pxy, -1, axis=0) - pxy, axis=-1),
            )
            sizes.append((ext + 1.0).reshape(-1))

            worlds.append(world.reshape(-1, 3))
            colors.append(shaded.reshape(-1, 3))
            quals.append(qual.reshape(-1))
            valids.append(valid.reshape(-1))

        if self.adaptive:
            fp, size = self.footprint_cap, jnp.concatenate(sizes)
        else:
            fp, size = 2, None
        buffers = splat_ops.splat(
            jnp.concatenate(worlds), jnp.concatenate(colors),
            jnp.concatenate(quals), jnp.concatenate(valids),
            cam, epsilon=self.epsilon,
            footprint=fp, size=size,
        )
        rgba, hit, depth = splat_ops.normalize(buffers)
        return rgba, depth

    def draw(self, frames: ProcessedFrames, cam: RenderCamera):
        rgba, _ = self._draw(frames, (cam.modelview, cam.proj), cam.width, cam.height)
        return rgba
