"""Affine warp coefficients (ops/tsdf_affine) + persistent Pallas kernel
(ops/tsdf_persist) vs the exact-table XLA oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from rgbd_recon_tpu.utils.math import Bbox
from rgbd_recon_tpu.calibration import synthetic
from rgbd_recon_tpu.ops import preprocess as pp, bricks as brick_ops, tsdf_fast
from rgbd_recon_tpu.ops import tsdf_affine
from rgbd_recon_tpu.ops.tsdf import TsdfConfig
from rgbd_recon_tpu.ops.tsdf_persist import integrate_affine_pallas
from rgbd_recon_tpu.ops.warp import bake_pixel_warp


@pytest.fixture(scope="module")
def small_setup():
    bbox = Bbox.default()
    rig, cams = synthetic.synthetic_rig(
        num_sensors=2, bbox=bbox, fwd_res=(32, 48, 32), inv_res=(48, 48, 48),
        width=256, height=212,
    )
    scene = synthetic.SphereScene.default(bbox)
    depth, color = synthetic.render_frames(cams, scene)
    return dict(bbox=bbox, rig=rig, depth=depth, color=color)


def test_affine_bake_residual(small_setup):
    """d_norm is affine in world position for a pinhole rig -> the fit must
    reproduce it to f32 noise; u, v carry only projective curvature."""
    cfg = TsdfConfig((128, 128, 128), 0.01)
    aff = tsdf_affine.bake_affine(small_setup["rig"], cfg)
    err = np.asarray(aff.max_err)
    assert err[2] < 1e-3, f"d residual {err[2]:.2e}"
    assert err[0] < 0.03 and err[1] < 0.03, f"uv residual {err[:2]}"
    assert np.all(np.isfinite(np.asarray(aff.coeffs)))


def test_affine_expand_matches_table(small_setup):
    """expand_affine vs the exact table on clean (non-cliff, non-clamped)
    voxels of valid bricks."""
    cfg = TsdfConfig((128, 128, 128), 0.01)
    rig = small_setup["rig"]
    aff = tsdf_affine.bake_affine(rig, cfg)
    tables = tsdf_fast.precompute_tables(rig, cfg)
    exp = tsdf_affine.expand_affine(aff)
    t = np.asarray(tables.pos_blocked)
    e = np.asarray(exp.pos_blocked)
    # restrict to bricks the fit kept (u0 >= 0) and CLEAN voxels: where the
    # table's trilinear stencil touches a -1 marker the TABLE is the wrong
    # one (frustum-blend garbage), so it can't serve as reference there
    kept = np.asarray(aff.coeffs[..., 0, 0] >= 0.0)  # [K, NB]
    ind = (rig.cv_xyz_inv[..., :1] < 0.0).astype(np.float32)
    cont = np.stack([
        np.asarray(tsdf_fast.resize3d_gl(jnp.asarray(ind[k]), (128, 128, 128)))
        for k in range(ind.shape[0])
    ])
    cont_blocked = tsdf_fast._to_blocked(cont)[..., 0] > 1e-6  # [K, NB, B3]
    # the edge-clamped half-texel shell reads a constant in the table but
    # extrapolates under the fit — exclude it like the bake does
    iz = tsdf_affine._interior(rig.cv_xyz_inv.shape[1], 128)
    iy = tsdf_affine._interior(rig.cv_xyz_inv.shape[2], 128)
    ix = tsdf_affine._interior(rig.cv_xyz_inv.shape[3], 128)
    interior = iz[:, None, None] & iy[None, :, None] & ix[None, None, :]
    interior_blocked = tsdf_fast._to_blocked(
        interior[None, ..., None].astype(np.float32)
    )[..., 0] > 0.5                               # [1, NB, B3]
    valid = (t[..., 0] >= 0) & kept[..., None] & ~cont_blocked & interior_blocked
    d = np.abs(e - t)[valid]
    # d: affine-exact for a pinhole rig; u, v: projective curvature only
    assert np.percentile(d[:, 2], 99.9) < 1e-3
    assert np.percentile(d[:, 0], 99.9) < 2e-2
    assert np.percentile(d[:, 1], 99.9) < 2e-2


@pytest.mark.full
def test_persist_kernel_parity(small_setup):
    """Persistent kernel (interpret mode) vs integrate_sparse running on the
    SAME affine warp (expanded + box-gated), isolating kernel correctness
    from fit accuracy."""
    bbox = small_setup["bbox"]
    rig = small_setup["rig"]
    warp = bake_pixel_warp(rig, 212, 256)
    frames = pp.preprocess(
        jnp.asarray(small_setup["depth"]), jnp.asarray(small_setup["color"]),
        rig, warp=warp,
    )
    cfg = TsdfConfig((128, 128, 128), 0.01)
    grid = brick_ops.make_brick_grid(bbox, 0.1, float(np.max(bbox.size) / 128))
    counts = brick_ops.mark_bricks(frames.world, frames.world_valid, grid)
    mask16 = brick_ops.block_occupancy(
        brick_ops.occupancy_mask(counts, 10), grid, cfg.res
    )
    aff = tsdf_affine.bake_affine(rig, cfg)

    # oracle: exact-table path on the expanded affine warp with the kernel's
    # analytic box gate folded in (outside [0,1]^3 -> the -1 marker)
    exp = tsdf_affine.expand_affine(aff).pos_blocked
    inside = jnp.all((exp >= 0.0) & (exp <= 1.0), axis=-1)
    gated = jnp.where(inside[..., None], exp, -1.0)
    tables = tsdf_fast.IntegrationTables(pos_blocked=gated)

    vol_ref, cvol_ref = tsdf_fast.integrate_sparse(
        frames, tables, cfg, mask16, max_bricks=128, window=64
    )
    vol_pl, cvol_pl = integrate_affine_pallas(
        frames, aff, cfg, mask16, max_bricks=128, interpret=True
    )
    d = np.abs(np.asarray(vol_ref) - np.asarray(vol_pl))
    frac_diff = (d > 1e-4).mean()
    assert frac_diff < 1e-4, f"{frac_diff:.2e} of voxels deviate"
    occ_ref = (np.asarray(vol_ref) > -cfg.limit + 1e-9).sum()
    occ_pl = (np.asarray(vol_pl) > -cfg.limit + 1e-9).sum()
    assert abs(occ_ref - occ_pl) <= max(100, 0.002 * occ_ref)
    cd = np.abs(np.asarray(cvol_ref) - np.asarray(cvol_pl)).max(axis=-1)
    assert (cd > 1e-2).mean() < 1e-3


def test_persist_kernel_empty_scene(small_setup):
    """count == 0 (no occupied bricks) must return the clear volumes."""
    rig = small_setup["rig"]
    warp = bake_pixel_warp(rig, 212, 256)
    frames = pp.preprocess(
        jnp.asarray(small_setup["depth"]), jnp.asarray(small_setup["color"]),
        rig, warp=warp,
    )
    cfg = TsdfConfig((32, 32, 32), 0.01)
    aff = tsdf_affine.bake_affine(rig, cfg)
    mask16 = jnp.zeros((2, 2, 2), bool)
    vol, cvol = integrate_affine_pallas(
        frames, aff, cfg, mask16, max_bricks=8, interpret=True
    )
    assert np.allclose(np.asarray(vol), -cfg.limit)
    assert np.allclose(np.asarray(cvol), 0.0)


@pytest.mark.full
def test_dense_kernel_parity(small_setup):
    """Dense-emit grouped kernel (interpret mode) vs the block-major
    persistent kernel + XLA assembly: the in-kernel relayout is exact and
    the grouped brick loop must not change a voxel. (group > 2 is
    TPU-compile-only: the 4x-unrolled fuse graph crashes the CPU
    interpreter; on-chip group 1/2/4/8 were A/B'd bit-identical.)"""
    from rgbd_recon_tpu.ops.tsdf_dense import integrate_dense_pallas

    bbox = small_setup["bbox"]
    rig = small_setup["rig"]
    warp = bake_pixel_warp(rig, 212, 256)
    frames = pp.preprocess(
        jnp.asarray(small_setup["depth"]), jnp.asarray(small_setup["color"]),
        rig, warp=warp,
    )
    cfg = TsdfConfig((128, 128, 128), 0.01)
    grid = brick_ops.make_brick_grid(bbox, 0.1, float(np.max(bbox.size) / 128))
    counts = brick_ops.mark_bricks(frames.world, frames.world_valid, grid)
    mask16 = brick_ops.block_occupancy(
        brick_ops.occupancy_mask(counts, 10), grid, cfg.res
    )
    aff = tsdf_affine.bake_affine(rig, cfg)

    vol_bm, cvol_bm = integrate_affine_pallas(
        frames, aff, cfg, mask16, max_bricks=128, interpret=True
    )
    vol_d, cvol_d = integrate_dense_pallas(
        frames, aff, cfg, mask16, max_bricks=128, interpret=True, group=2
    )
    np.testing.assert_allclose(
        np.asarray(vol_d), np.asarray(vol_bm), rtol=0, atol=1e-6
    )
    # color: both paths store bf16; the dense kernel is channel-major
    cd = np.abs(
        np.asarray(cvol_d, np.float32).transpose(1, 2, 3, 0)
        - np.asarray(cvol_bm, np.float32)
    )
    assert cd.max() < 1e-2, f"color max dev {cd.max():.3e}"


@pytest.mark.full
def test_dense_kernel_group_tail(small_setup):
    """Odd occupied count with group=2: the tail member clamps to the last
    valid brick — no spurious flush, no geometry change, and the final row
    flush lands (compare against the same scene integrated at group=1)."""
    from rgbd_recon_tpu.ops.tsdf_dense import integrate_dense_pallas

    bbox = small_setup["bbox"]
    rig = small_setup["rig"]
    warp = bake_pixel_warp(rig, 212, 256)
    frames = pp.preprocess(
        jnp.asarray(small_setup["depth"]), jnp.asarray(small_setup["color"]),
        rig, warp=warp,
    )
    cfg = TsdfConfig((128, 128, 128), 0.01)
    grid = brick_ops.make_brick_grid(bbox, 0.1, float(np.max(bbox.size) / 128))
    counts = brick_ops.mark_bricks(frames.world, frames.world_valid, grid)
    mask16 = np.array(brick_ops.block_occupancy(
        brick_ops.occupancy_mask(counts, 10), grid, cfg.res
    ))
    # force an ODD count (tail member in the last group)
    occ_idx = np.argwhere(mask16)
    if int(mask16.sum()) % 2 == 0:
        mask16[tuple(occ_idx[-1])] = False
    assert int(mask16.sum()) % 2 == 1
    mask16 = jnp.asarray(mask16)
    aff = tsdf_affine.bake_affine(rig, cfg)

    vol_1, cvol_1 = integrate_dense_pallas(
        frames, aff, cfg, mask16, max_bricks=128, interpret=True, group=1
    )
    vol_2, cvol_2 = integrate_dense_pallas(
        frames, aff, cfg, mask16, max_bricks=128, interpret=True, group=2
    )
    np.testing.assert_allclose(
        np.asarray(vol_2), np.asarray(vol_1), rtol=0, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(cvol_2), np.asarray(cvol_1))


def test_auto_window_rows(small_setup):
    """Window auto-sizing: 8-aligned, within [16, 48], covers the p99
    valid-brick footprint, and wy != 48 integrates identically to the
    fixed window (the offsets re-center; only coverage margin changes)."""
    from rgbd_recon_tpu.ops.tsdf_affine import auto_window_rows
    from rgbd_recon_tpu.ops.tsdf_dense import integrate_dense_pallas

    bbox = small_setup["bbox"]
    rig = small_setup["rig"]
    cfg = TsdfConfig((128, 128, 128), 0.01)
    aff = tsdf_affine.bake_affine(rig, cfg)
    wy, clip_frac = auto_window_rows(aff, 212)
    assert wy % 8 == 0 and 16 <= wy <= 48
    # clip_frac at the wy_max clamp reports the FIXED window's pre-existing
    # coverage risk (large at this coarse 128^3/212px fixture); it must be
    # a sane fraction, and a smaller-than-max window must keep it modest
    assert 0.0 <= clip_frac < 0.5
    if wy < 48:
        assert clip_frac < 0.02

    if wy == 48:
        return  # fixed window; nothing further to compare
    warp = bake_pixel_warp(rig, 212, 256)
    frames = pp.preprocess(
        jnp.asarray(small_setup["depth"]), jnp.asarray(small_setup["color"]),
        rig, warp=warp,
    )
    grid = brick_ops.make_brick_grid(bbox, 0.1, float(np.max(bbox.size) / 128))
    counts = brick_ops.mark_bricks(frames.world, frames.world_valid, grid)
    mask16 = brick_ops.block_occupancy(
        brick_ops.occupancy_mask(counts, 10), grid, cfg.res
    )
    vol_48, _ = integrate_dense_pallas(
        frames, aff, cfg, mask16, max_bricks=128, interpret=True, wy=48
    )
    vol_wy, _ = integrate_dense_pallas(
        frames, aff, cfg, mask16, max_bricks=128, interpret=True, wy=wy
    )
    d = np.abs(np.asarray(vol_wy) - np.asarray(vol_48))
    assert (d > 1e-4).mean() < 1e-4, f"{(d > 1e-4).mean():.2e} deviate"


def test_auto_window_cols_policy():
    """The x-window policy on synthetic coefficient tables: small linear u
    slopes -> the half-tile (32, 8) layout; large -> the full (64, 16)."""
    from rgbd_recon_tpu.ops.tsdf_affine import auto_window_cols, AffineTables

    def tables(slope_px, w=512):
        # u = u0 + slope * lx (normalized); extent over +-7.5 voxels
        c = np.zeros((1, 64, 4, 10), np.float32)
        c[..., 0, 0] = 0.5                       # valid marker (u0 >= 0)
        c[..., 0, 3] = slope_px / w / 15.0       # full extent = slope_px
        return AffineTables(
            coeffs=jnp.asarray(c), max_err=jnp.zeros(4),
            edge_err=jnp.zeros(4), n_cliff=jnp.zeros((), jnp.int32),
        )

    wx, xs, clip = auto_window_cols(tables(20.0), 512)
    assert (wx, xs) == (32, 8) and clip == 0.0
    wx, xs, clip = auto_window_cols(tables(25.0), 512)
    assert (wx, xs) == (32, 4) and clip == 0.0  # only stride-8 slack overflowed
    wx, xs, _ = auto_window_cols(tables(30.0), 512)
    assert (wx, xs) == (64, 16)


@pytest.mark.full
def test_auto_window_cols_parity():
    """Half-tile x windows (wx=32, channel-QUADDED layout) integrate
    identically to the fixed (64, 16) pairs layout when footprints fit —
    the narrow 96x80 sensor keeps the p99 u extent under the hull-placed
    stride-8 budget (22 px) at this brick scale."""
    from rgbd_recon_tpu.ops.tsdf_affine import auto_window_cols
    from rgbd_recon_tpu.ops.tsdf_dense import integrate_dense_pallas

    bbox = Bbox.default()
    rig, cams = synthetic.synthetic_rig(
        num_sensors=2, bbox=bbox, fwd_res=(32, 48, 32), inv_res=(48, 48, 48),
        width=96, height=80,
    )
    scene = synthetic.SphereScene.default(bbox)
    depth, color = synthetic.render_frames(cams, scene)
    cfg = TsdfConfig((128, 128, 128), 0.01)
    aff = tsdf_affine.bake_affine(rig, cfg)
    wx, xs, clip_frac = auto_window_cols(aff, 96)
    assert (wx, xs) == (32, 8), (wx, xs, clip_frac)
    assert clip_frac < 0.02

    warp = bake_pixel_warp(rig, 80, 96)
    frames = pp.preprocess(
        jnp.asarray(depth), jnp.asarray(color), rig, warp=warp,
    )
    grid = brick_ops.make_brick_grid(bbox, 0.1, float(np.max(bbox.size) / 128))
    counts = brick_ops.mark_bricks(frames.world, frames.world_valid, grid)
    mask16 = brick_ops.block_occupancy(
        brick_ops.occupancy_mask(counts, 10), grid, cfg.res
    )
    vol_64, cv_64 = integrate_dense_pallas(
        frames, aff, cfg, mask16, max_bricks=128, interpret=True,
        wx=64, xstride=16,
    )
    vol_32, cv_32 = integrate_dense_pallas(
        frames, aff, cfg, mask16, max_bricks=128, interpret=True,
        wx=32, xstride=8,
    )
    d = np.abs(np.asarray(vol_32) - np.asarray(vol_64))
    assert (d > 1e-4).mean() < 1e-4, f"{(d > 1e-4).mean():.2e} deviate"
    dc = np.abs(np.asarray(cv_32, np.float32) - np.asarray(cv_64, np.float32))
    assert (dc > 1e-2).mean() < 1e-4
    # the stride-4 variant (2x packed blocks, tighter placement) likewise
    vol_s4, cv_s4 = integrate_dense_pallas(
        frames, aff, cfg, mask16, max_bricks=128, interpret=True,
        wx=32, xstride=4,
    )
    d = np.abs(np.asarray(vol_s4) - np.asarray(vol_64))
    assert (d > 1e-4).mean() < 1e-4, f"{(d > 1e-4).mean():.2e} deviate"
    dc = np.abs(np.asarray(cv_s4, np.float32) - np.asarray(cv_64, np.float32))
    assert (dc > 1e-2).mean() < 1e-4


@pytest.mark.full
def test_dense_kernel_cmats_full(small_setup):
    """Session-baked full coefficient table + in-kernel window-offset fold
    (bake_cmats_kernel / cmats_full) vs the per-frame gather+fold path:
    bit-identical outputs — the kernel subtracts the same f32 offset values
    (x_lo + 0.5 exact) from the same scaled coefficients before the same
    warp matmul, just sourced by direct sel-indexed DMA."""
    from rgbd_recon_tpu.ops.tsdf_dense import (
        bake_cmats_kernel, integrate_dense_pallas,
    )

    bbox = small_setup["bbox"]
    rig = small_setup["rig"]
    warp = bake_pixel_warp(rig, 212, 256)
    frames = pp.preprocess(
        jnp.asarray(small_setup["depth"]), jnp.asarray(small_setup["color"]),
        rig, warp=warp,
    )
    cfg = TsdfConfig((128, 128, 128), 0.01)
    grid = brick_ops.make_brick_grid(bbox, 0.1, float(np.max(bbox.size) / 128))
    counts = brick_ops.mark_bricks(frames.world, frames.world_valid, grid)
    mask16 = brick_ops.block_occupancy(
        brick_ops.occupancy_mask(counts, 10), grid, cfg.res
    )
    aff = tsdf_affine.bake_affine(rig, cfg)
    h, w = frames.depth.shape[1], frames.depth.shape[2]
    cm_full = bake_cmats_kernel(aff, h, w)

    vol_g, cvol_g = integrate_dense_pallas(
        frames, aff, cfg, mask16, max_bricks=128, interpret=True,
        zmajor=True, vol_dtype=jnp.bfloat16,
    )
    vol_f, cvol_f = integrate_dense_pallas(
        frames, aff, cfg, mask16, max_bricks=128, interpret=True,
        zmajor=True, vol_dtype=jnp.bfloat16, cmats_full=cm_full,
    )
    np.testing.assert_array_equal(np.asarray(vol_f), np.asarray(vol_g))
    np.testing.assert_array_equal(np.asarray(cvol_f), np.asarray(cvol_g))


@pytest.mark.full
def test_dense_kernel_zmajor_bf16(small_setup):
    """zmajor + bf16 emission (the fused pipeline's layout) vs the default
    layout: color is the exact transpose, TSDF is the exact bf16 cast of
    the f32 result — the same rounding the sweep renderer applies to an
    f32 volume on entry (so renders are bit-identical by construction)."""
    from rgbd_recon_tpu.ops.tsdf_dense import integrate_dense_pallas

    bbox = small_setup["bbox"]
    rig = small_setup["rig"]
    warp = bake_pixel_warp(rig, 212, 256)
    frames = pp.preprocess(
        jnp.asarray(small_setup["depth"]), jnp.asarray(small_setup["color"]),
        rig, warp=warp,
    )
    cfg = TsdfConfig((128, 128, 128), 0.01)
    grid = brick_ops.make_brick_grid(bbox, 0.1, float(np.max(bbox.size) / 128))
    counts = brick_ops.mark_bricks(frames.world, frames.world_valid, grid)
    mask16 = brick_ops.block_occupancy(
        brick_ops.occupancy_mask(counts, 10), grid, cfg.res
    )
    aff = tsdf_affine.bake_affine(rig, cfg)

    vol_d, cvol_d = integrate_dense_pallas(
        frames, aff, cfg, mask16, max_bricks=128, interpret=True
    )
    vol_z, cvol_z = integrate_dense_pallas(
        frames, aff, cfg, mask16, max_bricks=128, interpret=True,
        zmajor=True, vol_dtype=jnp.bfloat16,
    )
    assert vol_z.dtype == jnp.bfloat16
    assert cvol_z.shape == (128, 4, 128, 128)
    np.testing.assert_array_equal(
        np.asarray(vol_z), np.asarray(vol_d.astype(jnp.bfloat16))
    )
    np.testing.assert_array_equal(
        np.asarray(cvol_z), np.asarray(jnp.moveaxis(cvol_d, 0, 1))
    )
