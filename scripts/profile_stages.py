#!/usr/bin/env python
"""Per-op microbenchmarks of the frame pipeline on the current backend.

Times each sub-stage as its own jitted function over varied pre-staged
inputs (a memoizing backend would fake repeats of identical calls).
Env: PROF_TSDF=256 PROF_SENSORS=4 PROF_RENDER=1280x720 PROF_ITERS=10
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(name, fn, args_list, iters):
    """Honest remote-backend timing: block_until_ready does not wait for
    remote execution, so drain with a host read and difference two loop
    lengths to cancel the read's RTT."""
    import jax
    import numpy as np

    out = fn(*args_list[0])  # compile

    def first_leaf(o):
        return jax.tree_util.tree_leaves(o)[0]

    float(np.asarray(first_leaf(out)).ravel()[0])

    def run(n):
        import jax.numpy as jnp

        t0 = time.perf_counter()
        carry = jnp.float32(0.0)
        for i in range(n):
            o = fn(*args_list[i % len(args_list)])
            # accumulate one element of every output on device: each
            # iteration's result is consumed, none can be elided
            carry = carry + sum(
                jnp.ravel(l)[0].astype(jnp.float32)
                for l in jax.tree_util.tree_leaves(o)[:2]
            )
        float(np.asarray(carry))
        return time.perf_counter() - t0

    # the drain read carries a noisy fixed RTT (~35 ms, spikes to ~2 s);
    # min-over-trials at two loop lengths cancels it robustly
    t1 = min(run(1) for _ in range(4))
    tn = min(run(iters) for _ in range(3))
    dt = (tn - t1) / (iters - 1) * 1e3
    print(f"{name:28s} {dt:8.2f} ms")
    return out


def main():
    tsdf_n = int(os.environ.get("PROF_TSDF", "256"))
    k = int(os.environ.get("PROF_SENSORS", "4"))
    rw, rh = (int(v) for v in os.environ.get("PROF_RENDER", "1280x720").split("x"))
    iters = int(os.environ.get("PROF_ITERS", "10"))

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
    except Exception:
        pass

    from rgbd_recon_tpu.utils.math import Bbox
    from rgbd_recon_tpu.calibration import synthetic
    from rgbd_recon_tpu.runtime.pipeline import FramePipeline, PipelineConfig
    from rgbd_recon_tpu.ops import preprocess as pp
    from rgbd_recon_tpu.ops import bricks as brick_ops
    from rgbd_recon_tpu.ops import tsdf_fast, raymarch_fast as rmf, raymarch as rm
    from rgbd_recon_tpu.ops import inpaint

    bbox = Bbox.default()
    rig, cams = synthetic.synthetic_rig(
        num_sensors=k, bbox=bbox, fwd_res=(128, 256, 128), inv_res=(128, 128, 128),
        width=512, height=424,
    )
    scene = synthetic.SphereScene.default(bbox)
    depth, color = synthetic.render_frames(cams, scene)
    pipe = FramePipeline(
        rig,
        PipelineConfig(
            render_width=rw, render_height=rh, tsdf_res=(tsdf_n,) * 3,
            voxel_size=float(np.max(bbox.size) / tsdf_n), brick_size=0.1,
        ),
        table_cache_dir=cache,
    )
    mv, proj = pipe.default_camera()
    warp = pipe._get_warp(424, 512)
    rng = np.random.default_rng(0)
    nbuf = 4
    ds = [jnp.asarray(depth + rng.uniform(0, 2e-3, depth.shape).astype(np.float32)) for _ in range(nbuf)]
    cs = [jnp.asarray(np.clip(color + rng.uniform(0, 1e-2, color.shape).astype(np.float32), 0, 1)) for _ in range(nbuf)]

    print(f"== config: {tsdf_n}^3, {k} sensors, {rw}x{rh}, backend {jax.default_backend()}")

    # --- preprocess pieces
    jm = jax.jit(pp.morph_dilate)
    morphed = timeit("morph_dilate", jm, [(d,) for d in ds], iters)
    jb = jax.jit(lambda d, c: pp.bilateral_lab(d, c, rig, pipe.pre_cfg, warp))
    b_out = timeit("bilateral_lab(warp)", jb, list(zip(ds, cs)), iters)
    depth2, lab, reg = b_out
    jbo = jax.jit(lambda d2, l: pp.boundary(d2, l, pipe.pre_cfg))
    bo = timeit("boundary", jbo, [(depth2, lab)], iters)
    depth_b, sil = bo
    jn = jax.jit(lambda db_: pp.normals(db_, rig, warp))
    nrm_out = timeit("normals(warp)", jn, [(depth_b,)], iters)
    nrm, world, world_valid = nrm_out
    jq = jax.jit(lambda db_, n_: pp.quality(db_, n_, rig, warp))
    timeit("quality(warp)", jq, [(depth_b, nrm)], iters)
    jpre = jax.jit(lambda d, c: pp.preprocess(d, c, rig, pipe.pre_cfg, warp))
    frames = timeit("preprocess(all)", jpre, list(zip(ds, cs)), iters)

    # --- bricks
    jmark = jax.jit(lambda w_, v_: brick_ops.mark_bricks(w_, v_, pipe.brick_grid))
    counts = timeit("mark_bricks(scatter)", jmark, [(world, world_valid)], iters)
    if jax.default_backend() == "tpu":
        from rgbd_recon_tpu.ops.bricks_pallas import mark_bricks_pallas

        jmark2 = jax.jit(lambda w_, v_: mark_bricks_pallas(w_, v_, pipe.brick_grid))
        counts = timeit("mark_bricks(pallas)", jmark2, [(world, world_valid)], iters)
    jmask = jax.jit(lambda c_: brick_ops.occupancy_mask(c_, 10))
    mask = timeit("occupancy_mask", jmask, [(counts,)], iters)
    jvox = jax.jit(lambda m_: brick_ops.voxel_occupancy(m_, pipe.brick_grid, pipe.tsdf_cfg.res))
    vox = timeit("voxel_occupancy", jvox, [(mask,)], iters)
    j16 = jax.jit(tsdf_fast.brick16_mask)
    mask16 = timeit("brick16_mask", j16, [(vox,)], iters)

    # --- integrate
    max_bricks = pipe.max_bricks
    if pipe._use_affine:
        from rgbd_recon_tpu.ops.tsdf_persist import integrate_affine_pallas

        if tsdf_n <= 256:   # block-major out is [NB, 32, 128]: OOM at 512^3
            jint = jax.jit(lambda f_, m_, a_: integrate_affine_pallas(
                f_, a_, pipe.tsdf_cfg, m_, max_bricks=max_bricks))
            intout = timeit("integrate(persistent)", jint,
                            [(frames, mask16, pipe.affine)], iters)
            jraw = jax.jit(lambda f_, m_, a_: integrate_affine_pallas(
                f_, a_, pipe.tsdf_cfg, m_, max_bricks=max_bricks, raw=True))
            timeit("integrate(kernel only)", jraw,
                   [(frames, mask16, pipe.affine)], iters)
        if tsdf_n % 128 == 0:
            from rgbd_recon_tpu.ops.tsdf_dense import integrate_dense_pallas

            jdense = jax.jit(lambda f_, m_, a_: integrate_dense_pallas(
                f_, a_, pipe.tsdf_cfg, m_, max_bricks=max_bricks))
            intout = timeit("integrate(dense-emit)", jdense,
                            [(frames, mask16, pipe.affine)], iters)
            # the windows the pipeline actually runs (auto-sized from the
            # bake: wy via auto_window_rows, (wx, xstride) quad layout via
            # auto_window_cols) — differs from the fixed default above at
            # high volume res, where footprints shrink
            pipe._wy_sensor_h, pipe._wx_sensor_w = frames.depth.shape[1:3]
            wy = pipe._window_rows()
            wxa, xsa = pipe._window_cols()
            if (wy, wxa, xsa) != (48, 64, 16):
                jauto = jax.jit(lambda f_, m_, a_: integrate_dense_pallas(
                    f_, a_, pipe.tsdf_cfg, m_, max_bricks=max_bricks,
                    wy=wy, wx=wxa, xstride=xsa))
                intout = timeit(
                    f"integrate(auto wy={wy} wx={wxa}/{xsa})", jauto,
                    [(frames, mask16, pipe.affine)], iters)
    else:
        jint = jax.jit(lambda f_, m_, t_: tsdf_fast.integrate_sparse(
            f_, t_, pipe.tsdf_cfg, m_, max_bricks=max_bricks,
            window=pipe.cfg.sample_window))
        intout = timeit("integrate_sparse(xla)", jint,
                        [(frames, mask16, pipe.tables)], iters)
    vol, cvol = intout
    chm = cvol.ndim == 4 and cvol.shape[0] == 4   # dense-emit channel-major

    # --- render
    axis, flip = 2, True
    n_slices = pipe.tsdf_cfg.res[axis]
    jocc = jax.jit(lambda m_: rmf.slab_occupancy(m_, axis, n_slices))
    occ = timeit("slab_occupancy", jocc, [(mask16,)], iters)
    cam = rm.RenderCamera(jnp.asarray(mv), jnp.asarray(proj), rw, rh)
    jsw = jax.jit(lambda v_, c_, o_: rmf.sweep(
        v_, c_, cam, bbox, pipe.tsdf_cfg.limit, axis, flip,
        rmf.SweepConfig(res=pipe._sweep_res()), o_, channel_major=chm))
    timeit("sweep(only)", jsw, [(vol, cvol, occ)], iters)
    jr = jax.jit(lambda v_, c_, o_: rmf.render_fast(
        v_, c_, cam, bbox, pipe.tsdf_cfg.limit, axis, flip,
        rm.RenderParams(), rmf.SweepConfig(res=pipe._sweep_res()), o_,
        channel_major=chm))
    out = timeit("render_fast(full)", jr, [(vol, cvol, occ)], iters)

    # --- holefill
    jpyr = jax.jit(lambda c_, d_: inpaint.build_pyramid(c_, d_, 6))
    pyr = timeit("build_pyramid", jpyr, [(out.color, out.depth)], iters)
    jcf = jax.jit(lambda pc, pd: inpaint.colorfill(pc, pd))
    timeit("colorfill(oracle)", jcf, [(pyr[0], pyr[1])], iters)
    jcfm = jax.jit(lambda pc, pd: inpaint.colorfill_mm(pc, pd))
    timeit("colorfill(mm)", jcfm, [(pyr[0], pyr[1])], iters)

    # --- device trace capture (SURVEY §5.1's jax.profiler equivalent of the
    # reference's GPU timestamp queries). PROF_TRACE=<dir> writes a trace
    # artifact viewable with tensorboard/xprof; may be unsupported on
    # remote-tunnel backends, hence the guard.
    trace_dir = os.environ.get("PROF_TRACE", "")
    if trace_dir:
        try:
            with jax.profiler.trace(trace_dir):
                o = jpre(ds[0], cs[0])
                o2 = jint(frames, mask16,
                          pipe.affine if pipe._use_affine else pipe.tables)
                o3 = jr(o2[0], o2[1], occ)
                jax.block_until_ready((o, o2, o3))
            print(f"wrote jax.profiler trace to {trace_dir}")
        except Exception as e:  # remote backends may lack profiling support
            print(f"trace capture unavailable on this backend: {e}")


if __name__ == "__main__":
    main()
