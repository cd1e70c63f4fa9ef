"""Benchmark: fused frames/sec at 256³ TSDF from 4 RGBD streams (one chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

vs_baseline is against the driver-set target of 30 fps (BASELINE.md — the
reference publishes no absolute numbers; 30 fps at this config is the
north star).

Env knobs:
  BENCH_TSDF=256      volume resolution per axis
  BENCH_SENSORS=4     stream count
  BENCH_RENDER=1280x720
  BENCH_ITERS=8
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    tsdf_n = int(os.environ.get("BENCH_TSDF", "256"))
    num_sensors = int(os.environ.get("BENCH_SENSORS", "4"))
    rw, rh = (int(v) for v in os.environ.get("BENCH_RENDER", "1280x720").split("x"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))

    import jax

    # persistent compilation cache: the fused frame program is large; cache
    # it across bench invocations
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from rgbd_recon_tpu.utils.math import Bbox
    from rgbd_recon_tpu.calibration import synthetic
    from rgbd_recon_tpu.runtime.pipeline import FramePipeline, PipelineConfig

    bbox = Bbox.default()
    rig, cams = synthetic.synthetic_rig(
        num_sensors=num_sensors, bbox=bbox,
        fwd_res=(128, 256, 128),  # reference forward-volume res (CalibVolumes.cpp:19)
        inv_res=(128, 128, 128),
        width=512, height=424,    # Kinect v2
    )
    scene = synthetic.SphereScene.default(bbox)
    depth, color = synthetic.render_frames(cams, scene)

    pipe = FramePipeline(
        rig,
        PipelineConfig(
            render_width=rw, render_height=rh,
            tsdf_res=(tsdf_n, tsdf_n, tsdf_n),
            voxel_size=float(np.max(bbox.size) / tsdf_n),
            brick_size=0.1,
            num_lods=6,
        ),
    )
    mv, proj = pipe.default_camera()

    import jax.numpy as jnp
    d = jnp.asarray(depth)
    c = jnp.asarray(color)
    mvj = jnp.asarray(mv)
    pj = jnp.asarray(proj)

    # warmup / compile
    t0 = time.time()
    out = pipe.step(d, c, mvj, pj)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    print(f"# compile+first-step: {compile_s:.1f}s", file=sys.stderr)

    t0 = time.time()
    for _ in range(iters):
        out = pipe.step(d, c, mvj, pj)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    fps = 1.0 / dt
    print(f"# steady-state: {dt*1e3:.1f} ms/frame", file=sys.stderr)

    print(json.dumps({
        "metric": f"fused frames/sec at {tsdf_n}^3 TSDF from {num_sensors} RGBD streams",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 4),
    }))


if __name__ == "__main__":
    main()
