"""Depth-band block cull (ops/tsdf_affine.block_depth_cull — the
reference's brick depth peel, recon_integration.cpp:408-428, applied to
integration).

Safety contract: the cull may only drop blocks whose integrated content is
constant — in-front / carve voxels (== the clear value, exact) or
all-behind voxels (+limit -> clear, the documented deviation class). Every
block containing band voxels must survive.
"""
import numpy as np
import jax.numpy as jnp

from rgbd_recon_tpu.calibration import synthetic
from rgbd_recon_tpu.ops import preprocess as pp, bricks as brick_ops
from rgbd_recon_tpu.ops import tsdf_affine
from rgbd_recon_tpu.ops.tsdf import TsdfConfig
from rgbd_recon_tpu.ops.tsdf_affine import block_depth_cull
from rgbd_recon_tpu.ops.tsdf_dense import integrate_dense_pallas
from rgbd_recon_tpu.ops.warp import bake_pixel_warp
from rgbd_recon_tpu.utils.math import Bbox


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
    m2, keep = block_depth_cull(
        mask16, aff, frames.depth[..., 0], frames.quality, float(cfg.limit)
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
    m2, keep = block_depth_cull(
        mask16, tables, jnp.asarray(depth), jnp.asarray(qual), 0.01
    )
    keep = np.asarray(keep).ravel()
    assert keep[0], "wide footprint must be kept"
    assert not keep[1], "out-of-band tight block must drop"
    assert keep[2], "invalid brick with live corner must be kept"
