"""Renderer end-to-end: novel-view render of the fused sphere scene."""
import numpy as np
import jax.numpy as jnp

from rgbd_recon_tpu.ops import preprocess as pp
from rgbd_recon_tpu.ops import tsdf as tsdf_ops
from rgbd_recon_tpu.ops import bricks as brick_ops
from rgbd_recon_tpu.ops import raymarch as rm
from rgbd_recon_tpu.utils.math import look_at, perspective


def _novel_camera(bbox, w=160, h=120):
    center = (bbox.min + bbox.max) * 0.5
    eye = center + np.array([1.4, 0.9, 2.0], np.float32)
    mv = look_at(eye, center, [0, 1, 0])
    proj = perspective(50.0, w / h, 0.1, 200.0)
    return rm.RenderCamera(jnp.asarray(mv), jnp.asarray(proj), w, h), eye


def test_render_novel_view(small_rig):
    rig = small_rig["rig"]
    bbox = small_rig["bbox"]
    scene = small_rig["scene"]
    frames = pp.preprocess(
        jnp.asarray(small_rig["depth"]), jnp.asarray(small_rig["color"]), rig
    )
    cfg = tsdf_ops.TsdfConfig(res=(64, 64, 64), limit=0.01)
    vol = tsdf_ops.integrate(frames, rig, cfg)
    cvol = tsdf_ops.integrate_colors(frames, rig, cfg)
    cam, eye = _novel_camera(bbox)

    out = rm.render(vol, cvol, frames, rig, cam, bbox, cfg.limit)
    hit = np.asarray(out.hit)
    color = np.asarray(out.color)
    pos = np.asarray(
        rm.march(vol, cam, bbox, cfg.limit).position
    )

    assert hit.shape == (cam.height, cam.width)
    frac = hit.mean()
    assert 0.02 < frac < 0.6, f"hit fraction {frac}"

    # hit positions lie on the fused surface (within ~2.5 voxels of analytic)
    v2w = rm.vol_to_world_matrix(bbox)
    world = pos[hit] @ v2w[:3, :3].T + v2w[:3, 3]
    sdf = scene.sdf(world)
    voxel = float(np.max(bbox.size / 64))
    assert np.median(np.abs(sdf)) < 1.5 * voxel
    assert np.mean(np.abs(sdf) < 3 * voxel) > 0.85

    # colors: most hits resolve via the quality-weighted path (alpha == 1)
    assert np.mean(color[hit][:, 3] > 0) > 0.5
    # red sphere dominates the frame: red channel leads blue on hits
    assert np.mean(color[hit][:, 0] >= color[hit][:, 2]) > 0.6
    # misses are transparent black with far depth
    assert np.all(color[~hit] == 0.0)
    assert np.all(np.asarray(out.depth)[~hit] == 1.0)
    # depth buffer increases with distance: hits are closer than misses
    assert np.asarray(out.depth)[hit].mean() < 1.0


def test_render_space_skip_matches_dense(small_rig):
    rig = small_rig["rig"]
    bbox = small_rig["bbox"]
    frames = pp.preprocess(
        jnp.asarray(small_rig["depth"]), jnp.asarray(small_rig["color"]), rig
    )
    cfg = tsdf_ops.TsdfConfig(res=(48, 48, 48), limit=0.01)
    grid = brick_ops.make_brick_grid(bbox, 0.2, float(np.max(bbox.size / 48)))
    counts = brick_ops.mark_bricks(frames.world, frames.world_valid, grid)
    mask = brick_ops.occupancy_mask(counts, 10)
    vox_mask = brick_ops.voxel_occupancy(mask, grid, cfg.res)
    vol = tsdf_ops.integrate(frames, rig, cfg, voxel_mask=vox_mask)
    cam, _ = _novel_camera(bbox, w=96, h=72)

    dense = rm.march(vol, cam, bbox, cfg.limit)
    bsz_vol = grid.brick_size / float(np.max(bbox.size))
    skip = rm.march(
        vol, cam, bbox, cfg.limit,
        brick_mask=mask, brick_size_vol=bsz_vol,
    )
    d_hit = np.asarray(dense.hit)
    s_hit = np.asarray(skip.hit)
    # space skipping must find the same surface (tiny rim differences allowed)
    agree = (d_hit == s_hit).mean()
    assert agree > 0.98, f"hit agreement {agree}"
    both = d_hit & s_hit
    dp = np.asarray(dense.position)[both]
    sp = np.asarray(skip.position)[both]
    err = np.abs(dp - sp).max(axis=-1)
    assert np.mean(err < 2e-2) > 0.99  # grazing rays may refine one step apart
    # and it must actually skip work
    assert np.asarray(skip.num_samples)[both].mean() < np.asarray(dense.num_samples)[both].mean()


def test_shade_modes(small_rig):
    rig = small_rig["rig"]
    bbox = small_rig["bbox"]
    frames = pp.preprocess(
        jnp.asarray(small_rig["depth"]), jnp.asarray(small_rig["color"]), rig
    )
    cfg = tsdf_ops.TsdfConfig(res=(48, 48, 48), limit=0.01)
    vol = tsdf_ops.integrate(frames, rig, cfg)
    cvol = tsdf_ops.integrate_colors(frames, rig, cfg)
    cam, _ = _novel_camera(bbox, w=64, h=48)
    for mode in range(4):
        out = rm.render(
            vol, cvol, frames, rig, cam, bbox, cfg.limit,
            rm.RenderParams(shade_mode=mode),
        )
        c = np.asarray(out.color)
        assert np.all(np.isfinite(c))
        hit = np.asarray(out.hit)
        if mode == 2:
            # normal mode: unit-ish vectors on hits
            n = c[hit][:, :3]
            ln = np.linalg.norm(n, axis=-1)
            assert np.mean(np.abs(ln - 1.0) < 0.1) > 0.9
