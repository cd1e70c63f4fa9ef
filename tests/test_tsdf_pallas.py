"""Pallas TSDF integration kernel vs the XLA oracle (interpreter mode)."""
import numpy as np
import jax.numpy as jnp
import pytest

from rgbd_recon_tpu.utils.math import Bbox
from rgbd_recon_tpu.calibration import synthetic
from rgbd_recon_tpu.ops import preprocess as pp, bricks as brick_ops, tsdf_fast
from rgbd_recon_tpu.ops.tsdf import TsdfConfig
from rgbd_recon_tpu.ops.tsdf_pallas import integrate_sparse_pallas
from rgbd_recon_tpu.ops.warp import bake_pixel_warp


def test_pallas_integrate_parity():
    """VMEM-fused kernel must match integrate_sparse except window-clip
    boundary voxels (<0.01% at realistic brick/footprint ratios)."""
    bbox = Bbox.default()
    rig, cams = synthetic.synthetic_rig(
        num_sensors=2, bbox=bbox, fwd_res=(32, 48, 32), inv_res=(48, 48, 48),
        width=256, height=212,
    )
    scene = synthetic.SphereScene.default(bbox)
    depth, color = synthetic.render_frames(cams, scene)
    warp = bake_pixel_warp(rig, 212, 256)
    frames = pp.preprocess(jnp.asarray(depth), jnp.asarray(color), rig, warp=warp)
    cfg = TsdfConfig((128, 128, 128), 0.01)
    grid = brick_ops.make_brick_grid(bbox, 0.1, float(np.max(bbox.size) / 128))
    counts = brick_ops.mark_bricks(frames.world, frames.world_valid, grid)
    mask16 = brick_ops.block_occupancy(
        brick_ops.occupancy_mask(counts, 10), grid, cfg.res
    )
    tables = tsdf_fast.precompute_tables(rig, cfg)
    vol_ref, cvol_ref = tsdf_fast.integrate_sparse(
        frames, tables, cfg, mask16, max_bricks=128, window=64
    )
    vol_pl, cvol_pl = integrate_sparse_pallas(
        frames, tables, cfg, mask16, max_bricks=128, interpret=True
    )
    d = np.abs(np.asarray(vol_ref) - np.asarray(vol_pl))
    frac_diff = (d > 1e-4).mean()
    assert frac_diff < 1e-4, f"{frac_diff:.2e} of voxels deviate"
    # the surface itself must agree
    occ_ref = (np.asarray(vol_ref) > -cfg.limit + 1e-9).sum()
    occ_pl = (np.asarray(vol_pl) > -cfg.limit + 1e-9).sum()
    assert abs(occ_ref - occ_pl) <= max(100, 0.002 * occ_ref)
    cd = np.abs(np.asarray(cvol_ref) - np.asarray(cvol_pl)).max(axis=-1)
    assert (cd > 1e-2).mean() < 1e-3
