"""Fast (MXU-structured) integration vs the reference-faithful slow path."""
import numpy as np
import jax
import jax.numpy as jnp

from rgbd_recon_tpu.ops import preprocess as pp
from rgbd_recon_tpu.ops import tsdf as tsdf_ops
from rgbd_recon_tpu.ops import tsdf_fast as fast
from rgbd_recon_tpu.ops import bricks as brick_ops
from rgbd_recon_tpu.ops.sample import sample3d


def test_resize3d_matches_sample3d(rng):
    vol = rng.standard_normal((12, 10, 8, 3)).astype(np.float32)
    out = np.asarray(fast.resize3d_gl(jnp.asarray(vol), (24, 20, 16)))
    # oracle: sample3d at the voxel-center grid of the target res
    grid = np.asarray(tsdf_ops.voxel_centers_normalized((16, 20, 24)))
    want = np.asarray(sample3d(jnp.asarray(vol), jnp.asarray(grid)))
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_integrate_sparse_matches_dense(small_rig):
    rig = small_rig["rig"]
    bbox = small_rig["bbox"]
    frames = pp.preprocess(
        jnp.asarray(small_rig["depth"]), jnp.asarray(small_rig["color"]), rig
    )
    cfg = tsdf_ops.TsdfConfig(res=(64, 64, 64), limit=0.01)

    grid = brick_ops.make_brick_grid(bbox, 0.2, float(np.max(bbox.size / 64)))
    counts = brick_ops.mark_bricks(frames.world, frames.world_valid, grid)
    mask = brick_ops.occupancy_mask(counts, 10)
    vox_mask = brick_ops.voxel_occupancy(mask, grid, cfg.res)
    mask16 = fast.brick16_mask(vox_mask)

    tables = fast.precompute_tables(rig, cfg)
    vol_fast, cvol_fast = fast.integrate_sparse(
        frames, tables, cfg, mask16, max_bricks=80, window=128
    )
    vol_fast = np.asarray(vol_fast)
    cvol_fast = np.asarray(cvol_fast)

    # slow path limited to the same voxel set (16-aligned brick expansion)
    vz, vy, vx = vox_mask.shape
    vm16 = np.asarray(mask16)
    vox16 = np.repeat(np.repeat(np.repeat(vm16, 16, 0), 16, 1), 16, 2)
    vol_ref = np.asarray(
        tsdf_ops.integrate(frames, rig, cfg, voxel_mask=jnp.asarray(vox16))
    )

    nb_used = vm16.sum()
    assert nb_used > 3, "fixture should occupy several bricks"
    assert nb_used <= 80

    inside = vox16
    err = np.abs(vol_fast[inside] - vol_ref[inside])
    # identical math, different evaluation order -> float noise; a small
    # fraction of voxels in this LOW-RES fixture live in bricks whose
    # projected footprint (up to ~250 px here) overflows the static sampling
    # window and samples edge-clamped — at the production regime (256^3
    # volume, 512x424 images) the worst-case footprint is ~60 px and the
    # window always covers it
    assert np.quantile(err, 0.995) < 2e-5, np.quantile(err, 0.995)
    assert np.mean(err < 2e-5) > 0.995
    np.testing.assert_allclose(vol_fast[~inside], -cfg.limit)

    # color volume: same blend evaluated with the registered-color
    # approximation — in-band voxels must be close to the exact path
    cvol_ref = np.asarray(
        tsdf_ops.integrate_colors(frames, rig, cfg, voxel_mask=jnp.asarray(vox16))
    )
    band = inside & (np.abs(vol_ref) < cfg.limit * 0.9) & (cvol_ref[..., 3] > 0) & (cvol_fast[..., 3] > 0)
    assert band.sum() > 100
    derr = np.abs(cvol_fast[band][:, :3] - cvol_ref[band][:, :3])
    assert np.median(derr) < 0.02
    assert np.mean(derr < 0.08) > 0.9


def test_occupied_list_capacity():
    mask = jnp.zeros((4, 4, 4), bool).at[1, 2, 3].set(True).at[0, 0, 0].set(True)
    idx, valid = fast.occupied_list(mask, 8)
    got = set(np.asarray(idx)[np.asarray(valid)].tolist())
    assert got == {0, 1 * 16 + 2 * 4 + 3}
