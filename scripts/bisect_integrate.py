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
        pre_outs.append((frames, mask16, cls))
    print(f"# occupied bricks: {int(np.asarray(n_occ))}", flush=True)
    if cls is not None:
        c_np = np.asarray(cls)
        m_np = np.asarray(pre_outs[-1][1])
        occ = m_np.reshape(-1)  # 16^3-block occupancy, same block order as cls
        frac = float((c_np[:, occ] != 0).mean()) if occ.any() else 0.0
        print(f"# non-FULL (sensor, occupied-block) pairs: {frac:.1%}", flush=True)

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

    # BI_CLS=0 strips the per-(sensor, block) classes from the dense
    # variants (cls=None: every sensor runs FULL and every window DMA
    # issues) — the A/B partner for the class dispatch + conditional DMA.
    use_cls = os.environ.get("BI_CLS", "1") == "1"

    def dense_fn(strip_name, with_cls):
        return jax.jit(lambda f_, m_, c_, _s=strip_name: integrate_dense_pallas(
            f_, pipe.affine, pipe.tsdf_cfg, m_, max_bricks=max_bricks,
            wy=wy, wx=wx, xstride=xs, strip=_s,
            cls=c_ if with_cls else None))

    if os.environ.get("BI_PARITY", "0") == "1":
        # on-chip bit parity: classes + conditional window DMA vs the
        # classless kernel (all sensors FULL, all DMAs issued)
        a = dense_fn("", True)(*pre_outs[0])
        b = dense_fn("", False)(*pre_outs[0])
        ta, tb = np.asarray(a[0]), np.asarray(b[0])
        ca, cb = np.asarray(a[1]), np.asarray(b[1])
        dt = np.abs(ta - tb)
        dc = np.abs(ca.astype(np.float32) - cb.astype(np.float32))
        # color is meaningful only on touched voxels (TSDF moved off the
        # -limit clear value); untouched voxels are never rendered
        touched = ta > (-pipe.tsdf_cfg.limit + 1e-7)
        dcm = float(dc[:, touched].max()) if touched.any() else 0.0
        print(f"# PARITY cls-vs-nocls: max|dTSDF|={dt.max():.3g} "
              f"frac>0={float((dt > 0).mean()):.3g} "
              f"max|dcolor|={dc.max():.3g} "
              f"max|dcolor@touched|={dcm:.3g}", flush=True)
        # the color deltas live in the 1/dist FALLBACK blend (NONE/FRONT
        # sensors skip it, documented in block_depth_cull) — the question
        # that matters is whether any RENDERED pixel changes
        from rgbd_recon_tpu.ops import raymarch as rm
        from rgbd_recon_tpu.ops import raymarch_fast as rmf
        from rgbd_recon_tpu.utils.metrics import render_parity

        mv, proj = pipe.default_camera()
        cam = rm.RenderCamera(jnp.asarray(mv), jnp.asarray(proj), 1280, 720)
        bbox_ = pipe.bbox
        axis, flip = rmf.pick_axis(mv, rm.vol_to_world_matrix(bbox_))
        rfn = jax.jit(lambda v_, c_: rmf.render_fast(
            v_, c_, cam, bbox_, pipe.tsdf_cfg.limit, axis, flip,
            cfg=rmf.SweepConfig(res=pipe._sweep_res()), channel_major=True))
        st = render_parity(rfn(*b[:2]), rfn(*a[:2]))
        print(f"# PARITY image-space cls-vs-nocls: {st}", flush=True)

    for s in strips:
        if s == "dense" or s.startswith("dense-"):
            _st = s[6:] if s.startswith("dense-") else ""
            jf = dense_fn(_st, use_cls)
            tag = "" if use_cls else ":nocls"
            timeit(f"dense:v3:{_st or 'full'}{tag}", jf, pre_outs, iters)
        elif s in ("v1", "v2", "v3"):
            jf = jax.jit(lambda f_, m_, c_, _v=s: integrate_affine_pallas(
                f_, pipe.affine, pipe.tsdf_cfg, m_, max_bricks=max_bricks,
                raw=True, variant=_v))
            timeit(f"full:{s}", jf, pre_outs, iters)
        else:
            jf = jax.jit(lambda f_, m_, c_, _s=s: integrate_affine_pallas(
                f_, pipe.affine, pipe.tsdf_cfg, m_, max_bricks=max_bricks,
                raw=True, strip=_s))
            timeit(f"full:{s}", jf, pre_outs, iters)


if __name__ == "__main__":
    main()
