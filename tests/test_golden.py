"""Golden-image render parity: fast sweep vs the per-ray oracle marcher.

VERDICT r4 #6: the sweep renderer's documented deviations (slice-spaced
steps, slice-local gradients — ops/raymarch_fast.py:25-28) must be shown
invisible in IMAGE space, not just on toy hit statistics. This is the
CPU-scale rung of the harness (the 720p / 256^3 numbers live in
docs/GOLDEN.md, produced by scripts/golden_parity.py on the chip); the
same metrics with asserted bounds at 64^3 / 320x240.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from rgbd_recon_tpu.ops import preprocess as pp
from rgbd_recon_tpu.ops import tsdf as tsdf_ops
from rgbd_recon_tpu.ops import raymarch as rm
from rgbd_recon_tpu.ops import raymarch_fast as rmf
from rgbd_recon_tpu.utils.math import look_at, perspective
from rgbd_recon_tpu.utils.metrics import psnr, ssim, render_parity


def test_metrics_sanity():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (64, 64, 3))
    assert psnr(a, a) == float("inf")
    assert ssim(a, a) == pytest.approx(1.0)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1)
    p = psnr(a, b)
    assert 18 < p < 23  # sigma 0.1 noise ~= 20 dB
    # SSIM must order degradations and sit clearly below identity; the
    # absolute value for iid noise on a noise-like base is damped by the
    # implementation's grayscale averaging (~0.95 here), so a natural-image
    # style bound like < 0.9 would misfire
    b2 = np.clip(a + rng.normal(0, 0.3, a.shape), 0, 1)
    assert ssim(a, b2) < ssim(a, b) < 0.99


@pytest.mark.full
def test_render_parity_golden(small_rig):
    """Image-space parity at 320x240 over three views, including an oblique
    one (the adversarial case for slice-plane stepping)."""
    rig = small_rig["rig"]
    bbox = small_rig["bbox"]
    frames = pp.preprocess(
        jnp.asarray(small_rig["depth"]), jnp.asarray(small_rig["color"]), rig
    )
    cfg = tsdf_ops.TsdfConfig(res=(64, 64, 64), limit=0.01)
    vol = tsdf_ops.integrate(frames, rig, cfg)
    cvol = tsdf_ops.integrate_colors(frames, rig, cfg)

    w, h = 320, 240
    center = (bbox.min + bbox.max) * 0.5
    proj = perspective(50.0, w / h, 0.1, 200.0)
    for eye_off in ([0.15, 0.25, 2.4], [1.4, 0.9, 2.0], [2.3, 0.5, 0.4]):
        eye = center + np.asarray(eye_off, np.float32)
        mv = look_at(eye, center, [0, 1, 0]).astype(np.float32)
        cam = rm.RenderCamera(jnp.asarray(mv), jnp.asarray(proj), w, h)
        axis, flip = rmf.pick_axis(mv, rm.vol_to_world_matrix(bbox))
        slow = rm.render(vol, cvol, frames, rig, cam, bbox, cfg.limit)
        fast = rmf.render_fast(vol, cvol, cam, bbox, cfg.limit, axis, flip)
        s = render_parity(slow, fast)
        # bounds: hit masks nearly identical; color indistinguishable at
        # image level; window depth agrees to ~1e-3 for the bulk with a
        # silhouette-pixel tail
        assert s["hit_agreement"] > 0.995, (eye_off, s)
        assert s["psnr_rgb"] > 30.0, (eye_off, s)
        assert s["ssim_rgb"] > 0.95, (eye_off, s)
        assert s["depth_err_med"] < 2e-3, (eye_off, s)
        assert s["depth_err_p99"] < 2e-2, (eye_off, s)


@pytest.mark.full
def test_integration_parity_golden(small_rig):
    """Image-space A/B of the INTEGRATION paths (VERDICT r4 weak #3): the
    affine fast-path volume vs the exact-table-path volume, rendered
    through the SAME renderer — the quadratic-fit gate flips (~1e-4 of
    voxels moving up to 2x limit) must be invisible at image level."""
    from rgbd_recon_tpu.ops import bricks as brick_ops, tsdf_fast
    from rgbd_recon_tpu.ops import tsdf_affine
    from rgbd_recon_tpu.ops.tsdf_persist import integrate_affine_pallas
    from rgbd_recon_tpu.ops.warp import bake_pixel_warp

    rig = small_rig["rig"]
    bbox = small_rig["bbox"]
    warp = bake_pixel_warp(rig, 212, 256)
    frames = pp.preprocess(
        jnp.asarray(small_rig["depth"]), jnp.asarray(small_rig["color"]),
        rig, warp=warp,
    )
    cfg = tsdf_ops.TsdfConfig(res=(128, 128, 128), limit=0.01)
    grid = brick_ops.make_brick_grid(bbox, 0.1, float(np.max(bbox.size) / 128))
    counts = brick_ops.mark_bricks(frames.world, frames.world_valid, grid)
    mask16 = brick_ops.block_occupancy(
        brick_ops.occupancy_mask(counts, 10), grid, cfg.res
    )

    tables = tsdf_fast.precompute_tables(rig, cfg)
    vol_tab, cvol_tab = tsdf_fast.integrate_sparse(
        frames, tables, cfg, mask16, max_bricks=128, window=64
    )
    aff = tsdf_affine.bake_affine(rig, cfg)
    vol_aff, cvol_aff = integrate_affine_pallas(
        frames, aff, cfg, mask16, max_bricks=128, interpret=True
    )

    w, h = 320, 240
    center = (bbox.min + bbox.max) * 0.5
    proj = perspective(50.0, w / h, 0.1, 200.0)
    for eye_off in ([0.15, 0.25, 2.4], [1.4, 0.9, 2.0]):
        eye = center + np.asarray(eye_off, np.float32)
        mv = look_at(eye, center, [0, 1, 0]).astype(np.float32)
        cam = rm.RenderCamera(jnp.asarray(mv), jnp.asarray(proj), w, h)
        axis, flip = rmf.pick_axis(mv, rm.vol_to_world_matrix(bbox))
        r_tab = rmf.render_fast(vol_tab, cvol_tab, cam, bbox, cfg.limit,
                                axis, flip)
        r_aff = rmf.render_fast(vol_aff, cvol_aff, cam, bbox, cfg.limit,
                                axis, flip)
        s = render_parity(r_tab, r_aff)
        assert s["hit_agreement"] > 0.998, (eye_off, s)
        assert s["psnr_rgb"] > 33.0, (eye_off, s)
        assert s["ssim_rgb"] > 0.97, (eye_off, s)
        assert s["depth_err_med"] < 2e-3, (eye_off, s)
