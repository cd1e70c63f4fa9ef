#!/usr/bin/env python
"""On-chip cost bisection of the persistent TSDF integration kernel.

Measures stripped variants (see tsdf_persist.fuse_chunk ``strip``) with the
honest remote-timing protocol so the per-brick budget is attributable:

  full      the shipped kernel (block-major out)
  dense     the dense-emit kernel (adds the in-kernel relayout)
  nofuse    sampling only (fusion/blend chain off)
  noxred    matmuls only (x lane-reductions + col weights off)
  nomm      no sampling matmuls (row weights off too)
  dmaonly   DMA pipeline + loop sequencing only

Env: BI_TSDF=256 BI_SENSORS=4 BI_ITERS=8
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    tsdf_n = int(os.environ.get("BI_TSDF", "256"))
    k = int(os.environ.get("BI_SENSORS", "4"))
    iters = int(os.environ.get("BI_ITERS", "8"))

    import jax
    import jax.numpy as jnp

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
    except Exception:
        pass

    from rgbd_recon_tpu.utils.math import Bbox
    from rgbd_recon_tpu.calibration import synthetic
    from rgbd_recon_tpu.runtime.pipeline import FramePipeline, PipelineConfig
    from rgbd_recon_tpu.ops.tsdf_persist import integrate_affine_pallas
    from rgbd_recon_tpu.ops.tsdf_dense import integrate_dense_pallas
    from scripts.profile_stages import timeit

    bbox = Bbox.default()
    rig, cams = synthetic.synthetic_rig(
        num_sensors=k, bbox=bbox, fwd_res=(128, 256, 128),
        inv_res=(128, 128, 128), width=512, height=424,
    )
    scene = synthetic.SphereScene.default(bbox)
    depth, color = synthetic.render_frames(cams, scene)
    pipe = FramePipeline(
        rig,
        PipelineConfig(
            render_width=1280, render_height=720, tsdf_res=(tsdf_n,) * 3,
            voxel_size=float(np.max(bbox.size) / tsdf_n), brick_size=0.1,
        ),
        table_cache_dir=cache, log=lambda s: print(f"# {s}", flush=True),
    )
    warp = pipe._get_warp(424, 512)
    rng = np.random.default_rng(0)
    nbuf = 4
    pre_outs = []
    pre = jax.jit(pipe._pre_impl)
    for _ in range(nbuf):
        d = jnp.asarray(depth + rng.uniform(0, 2e-3, depth.shape).astype(np.float32))
        c = jnp.asarray(np.clip(color + rng.uniform(0, 1e-2, color.shape), 0, 1).astype(np.float32))
        frames, _, _, mask16, _, n_occ, cls = pre(d, c, pipe._rig_for_step(warp), warp)
        pre_outs.append((frames, mask16))
    print(f"# occupied bricks: {int(np.asarray(n_occ))}", flush=True)

    max_bricks = pipe.max_bricks
    print(f"== {tsdf_n}^3, {k} sensors, max_bricks {max_bricks}, "
          f"backend {jax.default_backend()}", flush=True)

    strips = os.environ.get(
        "BI_STRIPS", "v1,v2,nofuse,noxred,nomm,noweights,dmaonly,dense"
    ).split(",")
    # window overrides for the dense strips (defaults = the pipeline's
    # auto policy at this config)
    pipe._wy_sensor_h, pipe._wx_sensor_w = 424, 512
    wy = int(os.environ.get("BI_WY", pipe._window_rows()))
    wxa, xsa = pipe._window_cols()
    wx = int(os.environ.get("BI_WX", wxa))
    xs = int(os.environ.get("BI_XS", xsa))
    print(f"# dense windows: wy={wy} wx={wx}/{xs}", flush=True)

    for s in strips:
        if s == "dense" or s.startswith("dense-"):
            _st = s[6:] if s.startswith("dense-") else ""
            jf = jax.jit(lambda f_, m_, _s=_st: integrate_dense_pallas(
                f_, pipe.affine, pipe.tsdf_cfg, m_, max_bricks=max_bricks,
                wy=wy, wx=wx, xstride=xs, strip=_s))
            timeit(f"dense:v3:{_st or 'full'}", jf, pre_outs, iters)
        elif s in ("v1", "v2", "v3"):
            jf = jax.jit(lambda f_, m_, _v=s: integrate_affine_pallas(
                f_, pipe.affine, pipe.tsdf_cfg, m_, max_bricks=max_bricks,
                raw=True, variant=_v))
            timeit(f"full:{s}", jf, pre_outs, iters)
        else:
            jf = jax.jit(lambda f_, m_, _s=s: integrate_affine_pallas(
                f_, pipe.affine, pipe.tsdf_cfg, m_, max_bricks=max_bricks,
                raw=True, strip=_s))
            timeit(f"full:{s}", jf, pre_outs, iters)


if __name__ == "__main__":
    main()
