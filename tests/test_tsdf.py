"""TSDF integration + brick occupancy invariants on the sphere scene."""
import numpy as np
import jax.numpy as jnp

from rgbd_recon_tpu.ops import preprocess as pp
from rgbd_recon_tpu.ops import tsdf as tsdf_ops
from rgbd_recon_tpu.ops import bricks as brick_ops
from rgbd_recon_tpu.ops.sample import sample3d


def _frames(small_rig):
    return pp.preprocess(
        jnp.asarray(small_rig["depth"]), jnp.asarray(small_rig["color"]), small_rig["rig"]
    )


def test_integration_zero_crossing_on_sphere(small_rig):
    rig = small_rig["rig"]
    bbox = small_rig["bbox"]
    scene = small_rig["scene"]
    frames = _frames(small_rig)
    cfg = tsdf_ops.TsdfConfig(res=(64, 64, 64), limit=0.01)
    vol = np.asarray(tsdf_ops.integrate(frames, rig, cfg))
    assert vol.shape == (64, 64, 64)
    assert np.all(np.isfinite(vol))
    assert np.all(vol <= cfg.limit + 1e-6)
    assert np.all(vol >= -cfg.limit - 1e-6)

    # Reference sign convention (tsdf_integration.vs:41): sdist =
    # voxel_depth - pixel_depth, so the field is POSITIVE behind the surface
    # (and in unobserved space, from the +limit init) and NEGATIVE in
    # observed-empty space. Cast rays from the main sphere's center outward:
    # the +/- crossing must sit within ~1.5 voxels of the analytic surface.
    c = scene.centers[0]
    r = scene.radii[0]
    size = bbox.size
    voxel = float(np.max(size / 64))
    rng = np.random.default_rng(7)
    dirs = rng.standard_normal((32, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    ts = np.linspace(0.2, 1.6, 141) * r
    pts = c + dirs[:, None, :] * ts[None, :, None]  # [32, 141, 3]
    coords = (pts - bbox.min) / size
    vals = np.asarray(sample3d(jnp.asarray(vol[..., None]), jnp.asarray(coords, dtype=np.float32)))[..., 0]
    errors = []
    for i in range(len(dirs)):
        v = vals[i]
        sign_change = np.nonzero((v[:-1] > 0) & (v[1:] <= 0))[0]
        if len(sign_change) == 0:
            continue
        errors.append(abs(ts[sign_change[0]] - r))
    errors = np.array(errors)
    # statistical: poorly-observed directions legitimately carve early (any
    # sensor with silhouette=0 at an unwritten voxel forces -limit,
    # tsdf_integration.vs:33-39), so judge the distribution, not the worst ray
    assert len(errors) > len(dirs) * 0.8
    assert np.median(errors) < 1.5 * voxel
    assert np.mean(errors < 2.5 * voxel) > 0.75

    # deep inside the sphere the field stays at the "solid" sign (+)
    inside = c + dirs * (0.3 * r)
    iv = np.asarray(sample3d(jnp.asarray(vol[..., None]), jnp.asarray(
        ((inside - bbox.min) / size).astype(np.float32))))[..., 0]
    assert np.all(iv > 0)
    # and well outside (but inside the bbox, observed) it is carved negative
    outside = c + dirs * (1.5 * r)
    ov = np.asarray(sample3d(jnp.asarray(vol[..., None]), jnp.asarray(
        ((outside - bbox.min) / size).astype(np.float32))))[..., 0]
    assert np.mean(ov < 0) > 0.9


def test_brick_occupancy_concentrates_on_surface(small_rig):
    rig = small_rig["rig"]
    bbox = small_rig["bbox"]
    scene = small_rig["scene"]
    frames = _frames(small_rig)
    grid = brick_ops.make_brick_grid(bbox, 0.2, float(np.max(bbox.size / 64)))
    counts = brick_ops.mark_bricks(frames.world, frames.world_valid, grid)
    mask = np.asarray(brick_ops.occupancy_mask(counts, 10))
    ratio = float(np.asarray(brick_ops.occupied_ratio(jnp.asarray(mask))))
    # the spheres cover a small fraction of the box
    assert 0.005 < ratio < 0.5

    # every occupied brick is near a sphere surface
    bx, by, bz = grid.res
    zz, yy, xx = np.nonzero(mask)
    centers = np.stack(
        [
            (xx + 0.5) * grid.brick_size + bbox.min[0],
            (yy + 0.5) * grid.brick_size + bbox.min[1],
            (zz + 0.5) * grid.brick_size + bbox.min[2],
        ],
        axis=-1,
    )
    sdf = scene.sdf(centers)
    assert np.all(np.abs(sdf) < grid.brick_size * 1.8)

    # masked integration matches dense integration inside occupied bricks
    cfg = tsdf_ops.TsdfConfig(res=(64, 64, 64), limit=0.01)
    vox_mask = brick_ops.voxel_occupancy(jnp.asarray(mask), grid, cfg.res)
    dense = np.asarray(tsdf_ops.integrate(frames, rig, cfg))
    sparse = np.asarray(tsdf_ops.integrate(frames, rig, cfg, voxel_mask=vox_mask))
    vm = np.asarray(vox_mask)
    np.testing.assert_allclose(sparse[vm], dense[vm], atol=1e-6)
    np.testing.assert_allclose(sparse[~vm], -cfg.limit)


def test_color_volume_matches_scene_colors(small_rig):
    rig = small_rig["rig"]
    bbox = small_rig["bbox"]
    scene = small_rig["scene"]
    frames = _frames(small_rig)
    cfg = tsdf_ops.TsdfConfig(res=(48, 48, 48), limit=0.01)
    cvol = np.asarray(tsdf_ops.integrate_colors(frames, rig, cfg))
    assert cvol.shape == (48, 48, 48, 4)
    # at voxels on the main sphere's surface, the blended color should be in
    # the ballpark of the sphere's base color
    c, r = scene.centers[0], scene.radii[0]
    rng = np.random.default_rng(3)
    dirs = rng.standard_normal((64, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    pts = c + dirs * r
    coords = ((pts - bbox.min) / bbox.size).astype(np.float32)
    cols = np.asarray(sample3d(jnp.asarray(cvol), jnp.asarray(coords)))
    ok = cols[:, 3] > 0
    assert ok.mean() > 0.5
    base = scene.colors[0]
    err = np.abs(cols[ok][:, :3] - base * 0.3) .mean()  # shade >= 0.3 of base
    # loose sanity: red channel dominates for the red sphere
    assert np.mean(cols[ok][:, 0] > cols[ok][:, 2]) > 0.8, err


def test_block_occupancy_matches_voxel_path(small_rig):
    """block_occupancy == brick16_mask(voxel_occupancy(...)) exactly."""
    import jax.numpy as jnp
    from rgbd_recon_tpu.ops import bricks as brick_ops
    from rgbd_recon_tpu.ops import tsdf_fast, preprocess as pp

    rig = small_rig["rig"]
    bbox = small_rig["bbox"]
    frames = pp.preprocess(
        jnp.asarray(small_rig["depth"]), jnp.asarray(small_rig["color"]), rig
    )
    grid = brick_ops.make_brick_grid(bbox, 0.17, 0.05)  # non-multiple sizes
    counts = brick_ops.mark_bricks(frames.world, frames.world_valid, grid)
    mask = brick_ops.occupancy_mask(counts, 5)
    res = (48, 48, 48)
    vox = brick_ops.voxel_occupancy(mask, grid, res)
    ref16 = tsdf_fast.brick16_mask(vox)
    got16 = brick_ops.block_occupancy(mask, grid, res, tsdf_fast.BRICK)
    np.testing.assert_array_equal(np.asarray(ref16), np.asarray(got16))
    assert np.asarray(got16).any()
