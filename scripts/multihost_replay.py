"""Two-process loopback DCN replay validation.

Demonstrates the multi-host story of parallel/replay.py with REAL multiple
processes: each process owns a range-partition of the recorded sequences
(``partition_sequences``), the device mesh spans all processes
(jax.distributed over loopback gRPC — the DCN stand-in), and one batched
DP replay step runs on the GLOBAL mesh with each host feeding only its
local shard.

Run (two shells or the test harness):
    python scripts/multihost_replay.py <port> 0 2
    python scripts/multihost_replay.py <port> 1 2

Prints "MULTIHOST OK ..." on success in each process.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def main(port: int, pid: int, nproc: int) -> None:
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
    ndev = len(jax.devices())          # global
    nloc = len(jax.local_devices())
    assert ndev == nloc * nproc

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from rgbd_recon_tpu.parallel.replay import partition_sequences
    from rgbd_recon_tpu.utils.math import Bbox
    from rgbd_recon_tpu.calibration import synthetic
    from rgbd_recon_tpu.runtime.pipeline import FramePipeline, PipelineConfig

    # each host owns its range partition of the recorded sequences
    seqs = [f"seq{i}.stream" for i in range(2 * ndev)]
    mine = partition_sequences(seqs)
    assert len(mine) == len(seqs) // nproc

    # same deterministic scene on every process (≙ shared recordings)
    bbox = Bbox.default()
    rig, cams = synthetic.synthetic_rig(
        num_sensors=2, bbox=bbox, fwd_res=(32, 48, 32), inv_res=(32, 32, 32),
        width=128, height=104,
    )
    scene = synthetic.SphereScene.default(bbox)
    depth, color = synthetic.render_frames(cams, scene)
    pipe = FramePipeline(
        rig,
        PipelineConfig(render_width=96, render_height=64,
                       tsdf_res=(32, 32, 32),
                       voxel_size=float(np.max(bbox.size) / 32),
                       brick_size=0.2, num_lods=4, fast_path=True),
    )
    mv, proj = pipe.default_camera()

    # global mesh across processes; batch axis = one sequence per device
    mesh = Mesh(np.array(jax.devices()), ("shard",))
    sharding = NamedSharding(mesh, P("shard"))
    b_local = nloc
    local_depth = np.stack([depth] * b_local) + pid * 1e-6
    local_color = np.stack([color] * b_local)
    gshape_d = (ndev,) + depth.shape
    gshape_c = (ndev,) + color.shape
    depth_b = jax.make_array_from_process_local_data(sharding, local_depth, gshape_d)
    color_b = jax.make_array_from_process_local_data(sharding, local_color, gshape_c)

    warp = pipe._get_warp(depth.shape[1], depth.shape[2])

    @jax.jit
    def step(d_b, c_b, m, p, rg, wp, tb):
        out = jax.vmap(
            lambda dd, cc: pipe._step_impl(dd, cc, m, p, rg, wp, tb, 2, False)
        )(d_b, c_b)
        # cross-host reduction over DCN: global mean coverage
        return out.color, jnp.mean((out.color[..., 3] > 0).astype(jnp.float32))

    color_out, coverage = step(
        depth_b, color_b, jnp.asarray(mv), jnp.asarray(proj),
        pipe.rig, warp, pipe._warp_data(),
    )
    jax.block_until_ready(color_out)
    cov = float(coverage)
    # every process sees the same global reduction value
    assert np.isfinite(cov)
    local = [s.data for s in color_out.addressable_shards]
    assert len(local) == nloc
    print(f"MULTIHOST OK pid={pid} devices={ndev} local={nloc} "
          f"mine={mine} coverage={cov:.4f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
