"""Fast-path robustness on realistic (non-pinhole) calibration.

VERDICT r4 #4: every fast-path gate (pixel-warp affinity warp_tol, per-brick
quadratic affine_tol) was previously validated only on zero-distortion
pinholes. Real cv volumes come from distortion-corrected NNI-interpolated
bakes (KinectCalibrationFile.cpp:148-580); these tests build a synthetic rig
with Kinect-magnitude Brown-Conrady lens distortion, an NNI-like smooth
world deformation, and an offset rgb camera, then verify (a) the gates
detect the non-affinity and fall back, (b) the pipeline still reconstructs
the scene correctly end-to-end on the fallback path, and (c) mild lens-only
distortion keeps the fast bake usable (residual within tolerance).
"""
import numpy as np
import pytest

from rgbd_recon_tpu.utils.math import Bbox
from rgbd_recon_tpu.calibration import synthetic
from rgbd_recon_tpu.calibration.synthetic import (
    DistortedCamera, kinect_distortion, make_cameras,
)


@pytest.fixture(scope="module")
def distorted_rig():
    """2-sensor rig with full realism: lens distortion + 4 mm NNI warp +
    offset rgb cameras, plus rendered frames of the sphere scene."""
    bbox = Bbox.default()
    rig, cams, ccams = synthetic.synthetic_rig(
        num_sensors=2, bbox=bbox, fwd_res=(32, 48, 32), inv_res=(32, 32, 32),
        width=128, height=104, distortion=0.004,
    )
    scene = synthetic.SphereScene.default(bbox)
    depth, color = synthetic.render_frames(cams, scene, color_cams=ccams)
    return dict(rig=rig, cams=cams, ccams=ccams, scene=scene,
                depth=depth, color=color, bbox=bbox)


def test_distorted_model_consistency():
    """project∘unproject == id to iteration tolerance; the distortion is
    material (several pixels at the frame corners, like a real Kinect)."""
    bbox = Bbox.default()
    cam = kinect_distortion(
        make_cameras(1, bbox, width=512, height=424)[0], warp_amp=0.004
    )
    rng = np.random.default_rng(0)
    u = rng.uniform(0.05, 0.95, 500)
    v = rng.uniform(0.05, 0.95, 500)
    z = rng.uniform(0.8, 4.0, 500)
    w = cam.unproject(u, v, z)
    u2, v2, z2 = cam.project(w)
    # the lens/warp inverses are machine-exact; the residual floor is the
    # float32 extrinsics (R^T R = I to ~6e-8), i.e. ~1e-7 in uv = 0.06 px
    assert np.abs(u2 - u).max() < 1e-6
    assert np.abs(v2 - v).max() < 1e-6
    assert np.abs(z2 - z).max() < 1e-6

    # corner ray vs the pinhole base: the lens bends it by pixels
    wp = cam.base.unproject(np.float64(0.02), np.float64(0.02), np.float64(3.0))
    ud, vd, _ = cam.project(wp)
    shift_px = np.hypot((ud - 0.02) * cam.width, (vd - 0.02) * cam.height)
    assert shift_px > 3.0


def test_pixel_warp_gate_detects_nni_warp(distorted_rig):
    """With a curved-ray rig the per-pixel affine-in-depth residual must
    exceed warp_tol (1e-4) — the gate that routes to the exact gather path.
    With lens-only distortion (straight rays) it must pass."""
    from rgbd_recon_tpu.ops.warp import bake_pixel_warp

    warp = bake_pixel_warp(distorted_rig["rig"], 104, 128)
    assert max(warp.max_err_xyz, warp.max_err_uv) > 1e-4

    bbox = distorted_rig["bbox"]
    rig_lens, _, _ = synthetic.synthetic_rig(
        num_sensors=2, bbox=bbox, fwd_res=(32, 48, 32), inv_res=(32, 32, 32),
        width=128, height=104, distortion=0.0,   # lens only, no world warp
    )
    warp2 = bake_pixel_warp(rig_lens, 104, 128)
    # a central camera's rays are straight: affine-in-depth holds per pixel
    assert warp2.max_err_xyz < 1e-4
    # uv crosses two different lenses but stays smooth in depth; the gate
    # may keep or reject it — just require it improved vs the curved rig
    assert warp2.max_err_uv <= warp.max_err_uv


def test_piecewise_warp_tier(distorted_rig):
    """The piecewise-linear-in-depth warp (VERDICT r4 #1) must capture the
    curved-ray rig that defeats the affine fit: residual under the pipeline
    gate (1e-3) and A/B agreement with the exact gather oracle at random
    per-pixel depths."""
    import jax.numpy as jnp

    from rgbd_recon_tpu.ops.warp import bake_pixel_warp, bake_piecewise_warp
    from rgbd_recon_tpu.ops.sample import sample3d

    rig = distorted_rig["rig"]
    aff = bake_pixel_warp(rig, 104, 128)
    pw = bake_piecewise_warp(rig, 104, 128, knots=32)
    # orders of magnitude better than the affine fit, inside the gate
    assert pw.max_err_xyz < 1e-3 and pw.max_err_xyz < aff.max_err_xyz / 20
    assert pw.max_err_uv < 1e-3 and pw.max_err_uv < aff.max_err_uv / 20

    rng = np.random.default_rng(0)
    d = rng.uniform(0.1, 0.95, (2, 104, 128)).astype(np.float32)
    h, w = 104, 128
    uu = (np.arange(w) + 0.5) / w
    vv = (np.arange(h) + 0.5) / h
    um, vm = np.meshgrid(uu, vv, indexing="xy")
    xyz_pw = np.asarray(pw.xyz(jnp.asarray(d)))
    uv_pw = np.asarray(pw.uv(jnp.asarray(d)))
    for k in range(2):
        coords = jnp.asarray(
            np.stack([um, vm, d[k]], -1, dtype=np.float32)[None]
        )
        got = np.abs(
            xyz_pw[k] - np.asarray(sample3d(jnp.asarray(rig.cv_xyz[k]), coords)[0])
        ).max()
        assert got < 2e-4, got
        got_uv = np.abs(
            uv_pw[k] - np.asarray(sample3d(jnp.asarray(rig.cv_uv[k]), coords)[0])
        ).max()
        assert got_uv < 2e-4, got_uv

    # shifted eval (the pre_normal taps): xyz_shifted(1, 0) must equal
    # evaluating a manually row-shifted warp at the same depths
    def shift_rows(p, axis):
        a = np.asarray(p)
        idx = [slice(None)] * a.ndim
        idx[axis] = slice(1, None)
        last = [slice(None)] * a.ndim
        last[axis] = slice(-1, None)
        return np.concatenate([a[tuple(idx)], a[tuple(last)]], axis=axis)

    pw2 = pw._replace(
        xyz_a=jnp.asarray(shift_rows(pw.xyz_a, 1)),
        xyz_b=jnp.asarray(shift_rows(pw.xyz_b, 1)),
        xyz_r=jnp.asarray(shift_rows(pw.xyz_r, 3)),   # [K, C, S, H, W]
    )
    sh = np.asarray(pw.xyz_shifted(1, 0, jnp.asarray(d)))
    ref = np.asarray(pw2.xyz(jnp.asarray(d)))
    np.testing.assert_allclose(sh, ref, atol=1e-6)

    # the batched neighborhood pass must equal the per-direction calls
    dd = jnp.asarray(d)
    nb = pw.xyz_neighborhood(dd, dd * 0.9, dd * 1.1, dd * 0.95, dd * 1.05)
    singles = (pw.xyz(dd), pw.xyz_shifted(1, 0, dd * 0.9),
               pw.xyz_shifted(-1, 0, dd * 1.1),
               pw.xyz_shifted(0, -1, dd * 0.95),
               pw.xyz_shifted(0, 1, dd * 1.05))
    for got, want in zip(nb, singles):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)


def test_piecewise_pallas_kernel_parity(distorted_rig):
    """The VMEM-resident multi-map eval kernel (interpret mode) must match
    the XLA hat loop on the same tables."""
    import jax.numpy as jnp

    from rgbd_recon_tpu.ops.warp import bake_piecewise_warp
    from rgbd_recon_tpu.ops.piecewise_pallas import piecewise_eval_pallas

    pw = bake_piecewise_warp(distorted_rig["rig"], 104, 128, knots=16)
    rng = np.random.default_rng(3)
    D = jnp.asarray(rng.uniform(0.0, 1.0, (5, 2, 104, 128)).astype(np.float32))
    got = piecewise_eval_pallas(
        D, jnp.asarray(pw.xyz_a), jnp.asarray(pw.xyz_b),
        jnp.asarray(pw.xyz_r), pw.d_min, pw.d_max, interpret=True,
    )
    want = pw._eval_multi(D, jnp.asarray(pw.xyz_a), jnp.asarray(pw.xyz_b),
                          jnp.asarray(pw.xyz_r))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_pipeline_takes_piecewise_path(distorted_rig):
    """On the distorted rig the pipeline must select the piecewise warp
    (not the 987 ms/frame gather fallback, docs/PERF.md r5) — asserted via
    the bake logs AND the warp object type, so a silent future fallback
    shows up here rather than as an fps regression (VERDICT r4 weak #7)."""
    from rgbd_recon_tpu.runtime.pipeline import FramePipeline, PipelineConfig
    from rgbd_recon_tpu.ops.warp import PiecewiseWarp

    rig = distorted_rig["rig"]
    bbox = distorted_rig["bbox"]
    logs = []
    pipe = FramePipeline(
        rig,
        PipelineConfig(
            render_width=128, render_height=96,
            tsdf_res=(48, 48, 48),
            voxel_size=float(np.max(bbox.size / 48)),
            brick_size=0.2, num_lods=5,
        ),
        log=logs.append,
    )
    warp = pipe._get_warp(104, 128)
    assert isinstance(warp, PiecewiseWarp), logs
    assert any("piecewise warp" in s and "gather" not in s for s in logs), logs


def test_affine_bake_residual_reported(distorted_rig):
    """The per-brick quadratic bake must report an honest residual on the
    distorted rig (max_err finite and larger than the pinhole case)."""
    from rgbd_recon_tpu.ops import tsdf as tsdf_ops, tsdf_affine

    cfg = tsdf_ops.TsdfConfig((48, 48, 48), 0.02)
    aff = tsdf_affine.bake_affine(distorted_rig["rig"], cfg)
    err_d = float(np.max(np.asarray(aff.max_err)))
    assert np.isfinite(err_d) and err_d > 0.0

    bbox = distorted_rig["bbox"]
    rig_p, _ = synthetic.synthetic_rig(
        num_sensors=2, bbox=bbox, fwd_res=(32, 48, 32), inv_res=(32, 32, 32),
        width=128, height=104,
    )
    aff_p = tsdf_affine.bake_affine(rig_p, cfg)
    err_p = float(np.max(np.asarray(aff_p.max_err)))
    assert err_p < err_d


def test_pipeline_end_to_end_distorted(distorted_rig):
    """Full pipeline on the realistic rig: gates fall back as needed and
    the reconstruction still lands on the sphere surface."""
    from rgbd_recon_tpu.runtime.pipeline import FramePipeline, PipelineConfig

    rig = distorted_rig["rig"]
    bbox = distorted_rig["bbox"]
    logs = []
    pipe = FramePipeline(
        rig,
        PipelineConfig(
            render_width=128, render_height=96,
            tsdf_res=(48, 48, 48),
            voxel_size=float(np.max(bbox.size / 48)),
            brick_size=0.2, num_lods=5,
        ),
        log=logs.append,
    )
    mv, proj = pipe.default_camera()
    out = pipe.step(distorted_rig["depth"], distorted_rig["color"], mv, proj)
    color = np.asarray(out.color)
    assert np.all(np.isfinite(color))
    hit = np.asarray(out.hit)
    assert 0.01 < hit.mean() < 0.7

    # TSDF zero-crossing accuracy: sample the integrated volume near the
    # main sphere surface; sign flips must straddle the analytic surface
    tsdf = np.asarray(out.tsdf)
    res = tsdf.shape[::-1]
    scene = distorted_rig["scene"]
    zz, yy, xx = np.meshgrid(*[np.arange(r) for r in tsdf.shape], indexing="ij")
    size = bbox.size
    pts = np.stack(
        [
            bbox.min[0] + (xx + 0.5) / res[0] * size[0],
            bbox.min[1] + (yy + 0.5) / res[1] * size[1],
            bbox.min[2] + (zz + 0.5) / res[2] * size[2],
        ],
        axis=-1,
    )
    sdf = scene.sdf(pts)
    voxel = float(np.max(size / 48))
    # sign convention (ops/tsdf.py ≙ tsdf_integration.vs): observed free
    # space and the -limit clear are negative; occluded voxels clamp to
    # +limit (deep sphere interior INCLUDED — see test_tsdf.py:60). The
    # surface-accuracy invariants on the distorted rig are therefore:
    #  (a) the unclamped transition band hugs the true surface;
    #  (b) no positive voxel sits OUTSIDE the surface by more than a few
    #      voxels (outside-observed is carved negative; outside-unobserved
    #      stays at the -limit clear) — even with the 4 mm bake deformation.
    limit = float(pipe.tsdf_cfg.limit)
    band = np.abs(tsdf) < 0.99 * limit
    assert band.any()
    frac_band = np.mean(np.abs(sdf[band]) < 3.5 * voxel)
    assert frac_band > 0.9
    pos = tsdf > 1e-4
    assert pos.any()
    frac_pos = np.mean(sdf[pos] < 3.5 * voxel)
    assert frac_pos > 0.98
