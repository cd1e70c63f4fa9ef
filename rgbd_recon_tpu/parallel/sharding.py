"""Device-mesh sharding of the reconstruction pipeline.

The reference has no distributed compute (SURVEY.md §2.4): its only
parallelism is GPU data-parallel shader passes plus a ZMQ ingest thread. The
TPU-native scaling story is defined here from scratch:

* preprocessing is data-parallel over sensors (K axis) when K divides the
  mesh — each device filters its sensor subset, no communication
* TSDF integration shards the voxel grid along its z axis: the dense
  voxel-parallel integration (ops/tsdf.integrate) is elementwise over voxels,
  so a z-shard constraint on the volume makes every device compute ONLY its
  slab (1/n compute + 1/n memory), reading the (replicated or
  sensor-sharded) frames — XLA inserts the all-gather of frames if they were
  sensor-sharded
* the raymarch reads the whole volume (rays cross slabs), so XLA all-gathers
  the z-sharded volume over ICI; screen rows are sharded for the march itself

``sharded_step`` builds this as an explicitly-constrained jitted step (the
constraints sit INSIDE the computation, so XLA partitions the producing ops
— not compute-replicated-then-resharded). It is what
``__graft_entry__.dryrun_multichip`` exercises on a virtual device mesh and
what parallel/replay.py uses for sequence-parallel offline replay.

The brick-sparse fast path (ops/tsdf_fast) stays single-chip for now: its
occupied-brick scan with dynamic volume updates does not partition cleanly;
one chip already holds a 256^3 volume comfortably, so multi-chip is about
throughput (replay batches, parallel/replay.py) rather than capacity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import preprocess as pp
from ..ops import bricks as brick_ops
from ..ops import tsdf as tsdf_ops
from ..ops import raymarch as rm
from ..ops import inpaint


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("shard",))


def sharded_step(pipe, mesh: Mesh):
    """Jit a dense (voxel-parallel) frame step with real volume-z / sensor
    shardings on ``mesh``. ``pipe`` supplies rig + config.

    Returns f(depth, color, modelview, proj) -> FrameOutput with out.tsdf
    left z-sharded across the mesh (callers keep slabs distributed)."""
    from ..runtime.pipeline import FrameOutput

    cfg = pipe.cfg
    n = int(np.prod([d for d in mesh.devices.shape]))

    def constrain(x, spec):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    def step(depth_m, color, modelview, proj, rig, warp) -> FrameOutput:
        k = depth_m.shape[0]
        if k % n == 0:
            # sensor-parallel preprocessing
            depth_m = constrain(depth_m, P("shard"))
            color = constrain(color, P("shard"))
        frames = pp.preprocess(depth_m, color, rig, pipe.pre_cfg, warp)

        vox_mask = None
        mask = None
        occupied = jnp.float32(1.0)
        if cfg.use_bricks:
            counts = brick_ops.mark_bricks(
                frames.world, frames.world_valid, pipe.brick_grid
            )
            mask = brick_ops.occupancy_mask(counts, cfg.min_voxels_per_brick)
            vox_mask = brick_ops.voxel_occupancy(
                mask, pipe.brick_grid, pipe.tsdf_cfg.res
            )
            occupied = brick_ops.occupied_ratio(mask)

        # z-sharded dense integration: each device computes its voxel slab
        vol = tsdf_ops.integrate(frames, rig, pipe.tsdf_cfg, voxel_mask=vox_mask)
        vol = constrain(vol, P("shard", None, None))
        cvol = tsdf_ops.integrate_colors(
            frames, rig, pipe.tsdf_cfg, voxel_mask=vox_mask
        )
        cvol = constrain(cvol, P("shard", None, None, None))

        cam = rm.RenderCamera(modelview, proj, cfg.render_width, cfg.render_height)
        bsz_vol = pipe.brick_grid.brick_size / float(np.max(pipe.bbox.size))
        bext = np.asarray(pipe.brick_grid.res, np.float32) \
            * pipe.brick_grid.brick_size / pipe.bbox.size.astype(np.float32)
        out = rm.render(
            vol, cvol, frames, rig, cam, pipe.bbox, pipe.tsdf_cfg.limit,
            rm.RenderParams(shade_mode=cfg.shade_mode),
            brick_mask=mask if (cfg.skip_space and cfg.use_bricks) else None,
            brick_size_vol=bsz_vol,
            brick_extent=bext,
        )
        # row-sharded image-space work (march reads the volume across slabs
        # -> XLA all-gathers it; the per-ray march itself is row-parallel)
        color_out = constrain(out.color, P("shard", None, None))
        if cfg.fill_holes:
            pyr_c, pyr_d = inpaint.build_pyramid(color_out, out.depth, cfg.num_lods)
            color_out = inpaint.colorfill(pyr_c, pyr_d)
            color_out = constrain(color_out, P("shard", None, None))

        n_occ = (jnp.sum(mask.astype(jnp.int32)) if mask is not None
                 else jnp.int32(0))
        return FrameOutput(
            color=color_out,
            depth=out.depth,
            hit=out.hit,
            tsdf=vol,
            occupied_ratio=occupied,
            num_samples=out.num_samples,
            occupied_bricks=n_occ,
        )

    repl = NamedSharding(mesh, P())
    jitted = jax.jit(
        step,
        in_shardings=(repl, repl, repl, repl, repl, repl),
        out_shardings=None,  # propagate: tsdf stays z-sharded
    )

    class _ShardedStep:
        """4-arg facade that binds the rig/warp data arguments host-side
        (big arrays must be jit args, not closure constants)."""

        def _data_args(self, depth_m):
            warp = pipe._get_warp(depth_m.shape[1], depth_m.shape[2])
            return pipe.rig, warp

        def __call__(self, depth_m, color, modelview, proj):
            return jitted(depth_m, color, modelview, proj, *self._data_args(depth_m))

        def lower(self, depth_m, color, modelview, proj):
            return jitted.lower(
                depth_m, color, modelview, proj, *self._data_args(depth_m)
            )

    return _ShardedStep()


def shard_volume(mesh: Mesh, vol):
    """Place a [Vz, Vy, Vx] (or [Vz, Vy, Vx, C]) volume sharded along z."""
    spec = P("shard", *([None] * (vol.ndim - 1)))
    return jax.device_put(vol, NamedSharding(mesh, spec))
