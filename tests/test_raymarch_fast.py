"""Sweep renderer vs the reference-faithful per-ray marcher."""
import numpy as np
import pytest
import jax.numpy as jnp

from rgbd_recon_tpu.ops import preprocess as pp
from rgbd_recon_tpu.ops import tsdf as tsdf_ops
from rgbd_recon_tpu.ops import raymarch as rm
from rgbd_recon_tpu.ops import raymarch_fast as rmf
from rgbd_recon_tpu.utils.math import look_at, perspective


def _setup(small_rig, res=64):
    rig = small_rig["rig"]
    bbox = small_rig["bbox"]
    frames = pp.preprocess(
        jnp.asarray(small_rig["depth"]), jnp.asarray(small_rig["color"]), rig
    )
    cfg = tsdf_ops.TsdfConfig(res=(res, res, res), limit=0.01)
    vol = tsdf_ops.integrate(frames, rig, cfg)
    cvol = tsdf_ops.integrate_colors(frames, rig, cfg)
    return rig, bbox, frames, cfg, vol, cvol


def _camera(bbox, eye_offset, w=128, h=96):
    center = (bbox.min + bbox.max) * 0.5
    eye = center + np.asarray(eye_offset, np.float32)
    mv = look_at(eye, center, [0, 1, 0])
    proj = perspective(50.0, w / h, 0.1, 200.0)
    return rm.RenderCamera(jnp.asarray(mv), jnp.asarray(proj), w, h)


def test_sweep_matches_march_surface(small_rig):
    rig, bbox, frames, cfg, vol, cvol = _setup(small_rig)
    for eye_off in ([1.4, 0.9, 2.0], [2.2, 0.4, -0.5], [-0.4, 2.4, 0.3]):
        cam = _camera(bbox, eye_off)
        v2w = rm.vol_to_world_matrix(bbox)
        axis, flip = rmf.pick_axis(np.asarray(cam.modelview), v2w)

        slow = rm.render(vol, cvol, frames, rig, cam, bbox, cfg.limit)
        fast = rmf.render_fast(
            vol, cvol, cam, bbox, cfg.limit, axis, flip,
            cfg=rmf.SweepConfig(res=(256, 256)),
        )
        sh = np.asarray(slow.hit)
        fh = np.asarray(fast.hit)
        # hit masks agree away from silhouette edges
        agree = (sh == fh).mean()
        assert agree > 0.97, f"{eye_off}: hit agreement {agree}"

        both = sh & fh
        assert both.sum() > 200
        # colors of the deferred blend agree (both read the same color volume)
        sc = np.asarray(slow.color)[both]
        fc = np.asarray(fast.color)[both]
        derr = np.abs(sc[:, :3] - fc[:, :3]).max(axis=-1)
        assert np.median(derr) < 0.05, np.median(derr)
        assert np.mean(derr < 0.15) > 0.85
        # depth buffers agree
        sd = np.asarray(slow.depth)[both]
        fd = np.asarray(fast.depth)[both]
        assert np.median(np.abs(sd - fd)) < 5e-3


def test_sweep_space_skip(small_rig):
    from rgbd_recon_tpu.ops import bricks as brick_ops
    from rgbd_recon_tpu.ops import tsdf_fast as fast_ops

    rig, bbox, frames, cfg, vol, cvol = _setup(small_rig)
    grid = brick_ops.make_brick_grid(bbox, 0.2, float(np.max(bbox.size / 64)))
    counts = brick_ops.mark_bricks(frames.world, frames.world_valid, grid)
    mask = brick_ops.occupancy_mask(counts, 10)
    vox_mask = brick_ops.voxel_occupancy(mask, grid, cfg.res)
    mask16 = fast_ops.brick16_mask(vox_mask)
    vol_m = jnp.where(vox_mask, vol, -cfg.limit)
    cvol_m = jnp.where(vox_mask[..., None], cvol, 0.0)

    cam = _camera(bbox, [1.4, 0.9, 2.0])
    axis, flip = rmf.pick_axis(np.asarray(cam.modelview), rm.vol_to_world_matrix(bbox))
    occ = rmf.slab_occupancy(mask16, axis, 64)

    base = rmf.render_fast(vol_m, cvol_m, cam, bbox, cfg.limit, axis, flip,
                           cfg=rmf.SweepConfig(res=(256, 256)))
    skip = rmf.render_fast(vol_m, cvol_m, cam, bbox, cfg.limit, axis, flip,
                           cfg=rmf.SweepConfig(res=(256, 256)), slab_occupied=occ)
    bh = np.asarray(base.hit)
    sh = np.asarray(skip.hit)
    assert (bh == sh).mean() > 0.995
    both = bh & sh
    np.testing.assert_allclose(
        np.asarray(base.color)[both], np.asarray(skip.color)[both], atol=1e-4
    )


@pytest.mark.full
def test_sweep_cvol_layouts_identical(small_rig):
    """The three cvol input layouts (channel-last, channel-major, z-major)
    are pure relayouts of one another: render_fast must produce IDENTICAL
    output for all three, on every sweep axis."""
    rig, bbox, frames, cfg, vol, cvol = _setup(small_rig)
    cv_cm = jnp.moveaxis(cvol, -1, 0)          # [4, Vz, Vy, Vx]
    cv_zc = jnp.moveaxis(cvol, -1, 1)          # [Vz, 4, Vy, Vx]
    for eye_off in ([0.2, 0.3, 2.3], [2.2, 0.4, -0.5], [-0.4, 2.4, 0.3]):
        cam = _camera(bbox, eye_off)
        v2w = rm.vol_to_world_matrix(bbox)
        axis, flip = rmf.pick_axis(np.asarray(cam.modelview), v2w)
        kw = dict(cfg=rmf.SweepConfig(res=(128, 128)))
        a = rmf.render_fast(vol, cvol, cam, bbox, cfg.limit, axis, flip, **kw)
        b = rmf.render_fast(vol, cv_cm, cam, bbox, cfg.limit, axis, flip,
                            channel_major=True, **kw)
        c = rmf.render_fast(vol, cv_zc, cam, bbox, cfg.limit, axis, flip,
                            zmajor=True, **kw)
        np.testing.assert_array_equal(np.asarray(a.color), np.asarray(b.color))
        np.testing.assert_array_equal(np.asarray(a.color), np.asarray(c.color))
        np.testing.assert_array_equal(np.asarray(a.depth), np.asarray(c.depth))
