"""Device-mesh sharding of the reconstruction pipeline.

The reference has no distributed compute (SURVEY.md §2.4): its only
parallelism is GPU data-parallel shader passes plus a ZMQ ingest thread. The
TPU-native scaling story is therefore defined here from scratch:

* preprocessing is data-parallel over sensors (K axis) — each device filters
  its sensor subset; no communication
* TSDF integration shards the voxel grid along its z-axis — every voxel
  update only reads (replicated) sensor images, so no communication either
* the raymarch shards screen rows; sampling the (sharded) TSDF across shard
  boundaries makes XLA all-gather the volume over ICI — acceptable because
  the volume is small relative to ICI bandwidth, and the alternative
  (halo-exchanged sweeps) lands in the Pallas fast path later

``sharded_step`` wraps a FramePipeline's pure step with in/out sharding
constraints on a 1-D mesh; it is what ``__graft_entry__.dryrun_multichip``
exercises on a virtual device mesh and what the offline replay driver uses on
real slices (parallel/replay.py).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("shard",))


def sharded_step(pipe, mesh: Mesh):
    """Jit a FramePipeline step with volume-z / sensor shardings on ``mesh``.

    Inputs stay replicated (host feeds every chip its frames — they are small
    vs the volume); intermediate shardings are driven by constraints inside
    the step via with_sharding_constraint.
    """
    repl = NamedSharding(mesh, P())

    def step(depth_m, color, modelview, proj):
        out = pipe._step_impl(depth_m, color, modelview, proj)
        # keep the big volumes sharded along z so no single device must hold
        # them; everything else is replicated
        tsdf = jax.lax.with_sharding_constraint(
            out.tsdf, NamedSharding(mesh, P("shard", None, None))
        )
        return out._replace(tsdf=tsdf)

    return jax.jit(
        step,
        in_shardings=(repl, repl, repl, repl),
    )


def shard_volume(mesh: Mesh, vol):
    """Place a [Vz, Vy, Vx] (or [Vz, Vy, Vx, C]) volume sharded along z."""
    spec = P("shard", *([None] * (vol.ndim - 1)))
    return jax.device_put(vol, NamedSharding(mesh, spec))
