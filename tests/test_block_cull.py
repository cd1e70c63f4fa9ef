"""Depth-band block cull (ops/tsdf_affine.block_depth_cull — the
reference's brick depth peel, recon_integration.cpp:408-428, applied to
integration).

Safety contract: the cull may only drop blocks whose integrated content is
constant — in-front / carve voxels (== the clear value, exact) or
all-behind voxels (+limit -> clear, the documented deviation class). Every
block containing band voxels must survive.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from rgbd_recon_tpu.calibration import synthetic
from rgbd_recon_tpu.ops import preprocess as pp, bricks as brick_ops
from rgbd_recon_tpu.ops import tsdf_affine
from rgbd_recon_tpu.ops.tsdf import TsdfConfig
from rgbd_recon_tpu.ops.tsdf_affine import block_depth_cull
from rgbd_recon_tpu.ops.tsdf_dense import integrate_dense_pallas
from rgbd_recon_tpu.ops.warp import bake_pixel_warp
from rgbd_recon_tpu.utils.math import Bbox


@pytest.mark.full
def test_block_cull_safety():
    bbox = Bbox.default()
    rig, cams = synthetic.synthetic_rig(
        num_sensors=2, bbox=bbox, fwd_res=(32, 48, 32), inv_res=(48, 48, 48),
        width=96, height=80,
    )
    scene = synthetic.SphereScene.default(bbox)
    depth, color = synthetic.render_frames(cams, scene)
    cfg = TsdfConfig((128, 128, 128), 0.01)
    aff = tsdf_affine.bake_affine(rig, cfg)
    warp = bake_pixel_warp(rig, 80, 96)
    frames = pp.preprocess(jnp.asarray(depth), jnp.asarray(color), rig,
                           warp=warp)
    grid = brick_ops.make_brick_grid(bbox, 0.1, float(np.max(bbox.size) / 128))
    counts = brick_ops.mark_bricks(frames.world, frames.world_valid, grid)
    mask16 = brick_ops.block_occupancy(
        brick_ops.occupancy_mask(counts, 10), grid, cfg.res
    )
    m2, keep, _ = block_depth_cull(
        mask16, aff, frames.depth[..., 0], frames.quality,
        frames.silhouette, float(cfg.limit)
    )
    m0, m2 = np.asarray(mask16), np.asarray(m2)
    assert (m2 <= m0).all()                      # cull only ever drops

    v0, _ = integrate_dense_pallas(frames, aff, cfg, jnp.asarray(m0),
                                   max_bricks=128, interpret=True)
    v1, _ = integrate_dense_pallas(frames, aff, cfg, jnp.asarray(m2),
                                   max_bricks=128, interpret=True)
    v0, v1 = np.asarray(v0), np.asarray(v1)
    lim = float(cfg.limit)
    B = 16
    vb0 = v0.reshape(8, B, 8, B, 8, B)

    # every band-containing block survives
    band_blocks = (np.abs(vb0) < lim * 0.999).any((1, 3, 5)) & m0
    assert (band_blocks <= m2).all(), "cull dropped a band block"

    # deviations only inside dropped blocks, and only of the documented
    # class: +limit (all-behind) -> -limit (clear)
    diff = v0 != v1
    db = diff.reshape(8, B, 8, B, 8, B).any((1, 3, 5))
    dropped = m0 & ~m2
    assert (db <= dropped).all()
    if diff.any():
        old = v0[diff]
        new = v1[diff]
        np.testing.assert_allclose(old, lim, rtol=0, atol=1e-6)
        np.testing.assert_allclose(new, -lim, rtol=0, atol=1e-6)


@pytest.mark.full
def test_class_skip_parity():
    """Per-(sensor, block) kernel classes (fuse_chunk_v3 ``cls``): NONE /
    FRONT / INVALID sensor skips must be BIT-exact on the TSDF, the
    has-quality flag, and the blended color wherever the flag is set (the
    documented deviation is confined to fallback colors of flag<0 voxels).
    Natural scenes rarely yield fully-live footprints at test scale (the
    sphere covers ~10% of the sensor), so the FRAMES are doctored to a
    wall at constant depth 0.5 with qual = sil = 1 everywhere — every
    in-image footprint is then provably live — and the bake's d
    coefficients per block force each class by construction. Both paths
    consume the same doctored frames, so the parity contract is exact."""
    bbox = Bbox.default()
    rig, cams = synthetic.synthetic_rig(
        num_sensors=2, bbox=bbox, fwd_res=(32, 48, 32), inv_res=(48, 48, 48),
        width=96, height=80,
    )
    scene = synthetic.SphereScene.default(bbox)
    depth, color = synthetic.render_frames(cams, scene)
    cfg = TsdfConfig((128, 128, 128), 0.01)
    aff = tsdf_affine.bake_affine(rig, cfg)
    warp = bake_pixel_warp(rig, 80, 96)
    frames = pp.preprocess(jnp.asarray(depth), jnp.asarray(color), rig,
                           warp=warp)
    ones = jnp.ones_like(frames.quality)
    frames = frames._replace(
        depth=jnp.stack([ones * 0.5, frames.depth[..., 1]], axis=-1),
        quality=ones, silhouette=ones,
    )
    grid = brick_ops.make_brick_grid(bbox, 0.1, float(np.max(bbox.size) / 128))
    counts = brick_ops.mark_bricks(frames.world, frames.world_valid, grid)
    mask16 = brick_ops.block_occupancy(
        brick_ops.occupancy_mask(counts, 10), grid, cfg.res
    )
    occ = np.flatnonzero(np.asarray(mask16).ravel())
    assert occ.size >= 3

    # pick doctored blocks whose sensor-0 footprints are fully in-image
    # (edge footprints conservatively demote to FULL)
    from rgbd_recon_tpu.ops.tsdf_affine import _hull_basis

    sbb = _hull_basis()
    C0 = np.asarray(aff.coeffs)[0]
    inside = []
    for b in occ:
        p = C0[b, :2, :] @ sbb
        if (p[0].min() * 96 - 0.5 > 6 and p[0].max() * 96 - 0.5 < 89
                and p[1].min() * 80 - 0.5 > 6 and p[1].max() * 80 - 0.5 < 73):
            inside.append(int(b))
    assert len(inside) >= 3, inside
    ba, bb, bc = inside[0], inside[1], inside[2]

    c = np.asarray(aff.coeffs).copy()
    c[0, ba] = 0.0
    c[0, ba, 0, 0] = -1.0            # bake-invalid for sensor 0
    c[0, bb, 2, :] = 0.0
    c[0, bb, 2, 0] = 0.2             # strictly in FRONT of the 0.5 wall
    c[0, bc, 2, :] = 0.0
    c[0, bc, 2, 0] = 0.8             # strictly BEHIND the 0.5 wall
    aff = aff._replace(coeffs=jnp.asarray(c))

    m2, keep, cls = block_depth_cull(
        mask16, aff, frames.depth[..., 0], frames.quality,
        frames.silhouette, float(cfg.limit)
    )
    cls_np = np.asarray(cls)
    assert cls_np[0, ba] == 3, cls_np[0, ba]       # INVALID
    assert cls_np[0, bb] == 2, cls_np[0, bb]       # FRONT
    assert cls_np[0, bc] == 1, cls_np[0, bc]       # NONE
    assert (cls_np >= 0).all() and (cls_np <= 3).all()

    # integrate the FULL occupied mask (not the culled one) so the
    # doctored FRONT/NONE blocks are guaranteed to execute their branches
    v0, c0 = integrate_dense_pallas(frames, aff, cfg, mask16, max_bricks=128,
                                    interpret=True)
    v1, c1 = integrate_dense_pallas(frames, aff, cfg, mask16, max_bricks=128,
                                    interpret=True, cls=cls)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    c0 = np.asarray(c0, np.float32)
    c1 = np.asarray(c1, np.float32)
    np.testing.assert_array_equal(c0[3], c1[3])    # has-quality flag
    sel = c0[3] > 0
    np.testing.assert_array_equal(c0[:3][:, sel], c1[:3][:, sel])


def test_cull_bake_split_exact():
    """bake_cull + block_depth_cull_baked ≡ block_depth_cull bit-exactly
    (the session-bake split moves only frame-invariant tensors out of the
    frame; the per-frame math is the same ops in the same order)."""
    from rgbd_recon_tpu.ops.tsdf_affine import bake_cull, block_depth_cull_baked

    bbox = Bbox.default()
    rig, cams = synthetic.synthetic_rig(
        num_sensors=2, bbox=bbox, fwd_res=(32, 48, 32), inv_res=(48, 48, 48),
        width=96, height=80,
    )
    scene = synthetic.SphereScene.default(bbox)
    depth, color = synthetic.render_frames(cams, scene)
    cfg = TsdfConfig((128, 128, 128), 0.01)
    aff = tsdf_affine.bake_affine(rig, cfg)
    warp = bake_pixel_warp(rig, 80, 96)
    frames = pp.preprocess(jnp.asarray(depth), jnp.asarray(color), rig,
                           warp=warp)
    grid = brick_ops.make_brick_grid(bbox, 0.1, float(np.max(bbox.size) / 128))
    counts = brick_ops.mark_bricks(frames.world, frames.world_valid, grid)
    mask16 = brick_ops.block_occupancy(
        brick_ops.occupancy_mask(counts, 10), grid, cfg.res
    )
    args = (frames.depth[..., 0], frames.quality, frames.silhouette,
            float(cfg.limit))
    m_a, k_a, c_a = block_depth_cull(mask16, aff, *args)
    bake = bake_cull(aff, 80, 96, float(cfg.limit))
    m_b, k_b, c_b = block_depth_cull_baked(mask16, bake, *args)
    np.testing.assert_array_equal(np.asarray(m_a), np.asarray(m_b))
    np.testing.assert_array_equal(np.asarray(k_a), np.asarray(k_b))
    np.testing.assert_array_equal(np.asarray(c_a), np.asarray(c_b))

    # golden snapshot of the actual cull SEMANTICS (the A/B above checks
    # only plumbing — block_depth_cull IS the bake-then-apply composition,
    # so it cannot catch coordinated drift in both halves): known-good
    # keep/class counts on the deterministic fixture. The hulls run at
    # Precision.HIGHEST (reproducible across programs), so these are
    # stable integers; a change here means the cull DECISIONS changed.
    assert int(np.asarray(mask16).sum()) == 29
    assert int(np.asarray(m_a).sum()) == 28        # one block culled
    assert int(np.asarray(k_a).sum()) == 81        # keep over ALL bricks
    cls_np = np.asarray(c_a)
    hist = [int((cls_np == i).sum()) for i in range(4)]
    assert hist == [1000, 0, 0, 24], hist          # 24 bake-invalid pairs


def test_block_cull_wide_and_invalid_kept():
    """Footprints wider than the pooled mip window and bricks invalid in
    the bake with a live corner are kept conservatively."""
    from rgbd_recon_tpu.ops.tsdf_affine import AffineTables

    nb = 2 * 2 * 2
    c = np.zeros((1, nb, 4, 10), np.float32)
    # brick 0: valid, huge linear u slope -> wide footprint -> keep
    c[0, 0, 0, 0] = 0.5
    c[0, 0, 1, 0] = 0.5
    c[0, 0, 2, 0] = 0.9            # d far outside any window range
    c[0, 0, 0, 3] = 0.5            # u extent ~0.5*15*w px: wide
    # brick 1: valid, tight footprint, d far from the scene -> drop
    c[0, 1, 0, 0] = 0.5
    c[0, 1, 1, 0] = 0.5
    c[0, 1, 2, 0] = 0.9
    # brick 2: invalid in the bake (u0 = -1); corner depth in band of 0
    c[0, 2, 0, 0] = -1.0
    tables = AffineTables(
        coeffs=jnp.asarray(c), max_err=jnp.zeros(3),
        edge_err=jnp.zeros(3), n_cliff=jnp.zeros((), jnp.int32),
    )
    h, w = 32, 32
    depth = np.full((1, h, w), 0.25, np.float32)
    qual = np.ones((1, h, w), np.float32)
    depth[0, 0, 0] = 0.004          # corner within limit of d_vox = 0
    mask16 = jnp.ones((2, 2, 2), bool)
    m2, keep, _ = block_depth_cull(
        mask16, tables, jnp.asarray(depth), jnp.asarray(qual), None, 0.01
    )
    keep = np.asarray(keep).ravel()
    assert keep[0], "wide footprint must be kept"
    assert not keep[1], "out-of-band tight block must drop"
    assert keep[2], "invalid brick with live corner must be kept"
