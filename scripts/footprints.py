#!/usr/bin/env python
"""Per-brick projected footprint statistics (from the affine bake) — sizes
the integration kernel's static sampling window (WY, WX). Env: FP_TSDF=256."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    tsdf_n = int(os.environ.get("FP_TSDF", "256"))
    k = int(os.environ.get("FP_SENSORS", "4"))
    import jax.numpy as jnp
    import jax

    from rgbd_recon_tpu.utils.math import Bbox
    from rgbd_recon_tpu.calibration import synthetic
    from rgbd_recon_tpu.runtime.pipeline import FramePipeline, PipelineConfig

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
        table_cache_dir=os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
        log=lambda s: print(f"# {s}", flush=True),
    )
    warp = pipe._get_warp(424, 512)
    pre = jax.jit(pipe._pre_impl)
    frames, _, _, mask16, _, n_occ, _cls = pre(
        jnp.asarray(depth), jnp.asarray(color), pipe._rig_for_step(warp), warp)
    mask16 = np.asarray(mask16)
    print(f"occupied bricks: {int(np.asarray(n_occ))}")

    c = np.asarray(pipe.affine.coeffs)   # [K, NB, 4, NBASIS]
    w_img, h_img = 512, 424
    # conservative half-extent of the projected brick: sum of |slopes|*7.5
    # + quadratic terms * 7.5^2 (basis: 1, lz, ly, lx, lz2, ly2, lx2, ...)
    lin = np.abs(c[..., 1:4]).sum(-1) * 7.5
    quad = np.abs(c[..., 4:]).sum(-1) * 7.5**2
    ext_u = (lin[..., 0] + quad[..., 0]) * w_img   # half-extent in px
    ext_v = (lin[..., 1] + quad[..., 1]) * h_img
    valid = c[..., 0, 0] >= 0.0                     # u0 >= 0 marker
    occ = mask16.reshape(-1)[None, :] & valid
    for name, e in (("u(x)", ext_u), ("v(y)", ext_v)):
        ev = e[valid]
        eo = e[occ]
        print(f"{name} half-extent px: valid bricks p50={np.percentile(ev,50):.1f} "
              f"p99={np.percentile(ev,99):.1f} max={ev.max():.1f} | "
              f"occupied p50={np.percentile(eo,50):.1f} "
              f"p99={np.percentile(eo,99):.1f} max={eo.max():.1f}")


if __name__ == "__main__":
    main()
