"""Reconstruction strategies (points / trigrid / mvt / calibs / integration)."""
import numpy as np
import jax.numpy as jnp
import pytest

from rgbd_recon_tpu.models import (
    ReconContext, ReconPoints, ReconTrigrid, ReconMVT, ReconCalibs, ReconIntegration,
)
from rgbd_recon_tpu.ops import preprocess as pp
from rgbd_recon_tpu.ops.raymarch import RenderCamera
from rgbd_recon_tpu.utils.math import look_at, perspective


@pytest.fixture(scope="module")
def setup(small_rig):
    rig = small_rig["rig"]
    bbox = small_rig["bbox"]
    frames = pp.preprocess(
        jnp.asarray(small_rig["depth"]), jnp.asarray(small_rig["color"]), rig
    )
    ctx = ReconContext(rig=rig, bbox=bbox, width=128, height=96)
    center = (bbox.min + bbox.max) * 0.5
    eye = center + np.array([1.3, 0.8, 1.9], np.float32)
    cam = RenderCamera(
        jnp.asarray(look_at(eye, center, [0, 1, 0])),
        jnp.asarray(perspective(50.0, 128 / 96, 0.1, 200.0)),
        128, 96,
    )
    return dict(ctx=ctx, frames=frames, cam=cam, scene=small_rig["scene"], bbox=bbox)


def _check_surface(rgba, setup, name, min_frac=0.02):
    rgba = np.asarray(rgba)
    assert rgba.shape == (96, 128, 4)
    assert np.all(np.isfinite(rgba))
    frac = (rgba[..., 3] > 0).mean()
    assert min_frac < frac < 0.8, f"{name}: coverage {frac}"
    hit = rgba[..., 3] > 0
    # red sphere dominates: red >= blue on most covered pixels
    assert np.mean(rgba[hit][:, 0] >= rgba[hit][:, 2]) > 0.55, name


def test_points(setup):
    model = ReconPoints(setup["ctx"])
    out = model.draw_f(setup["frames"], setup["cam"])
    _check_surface(out, setup, "points")


def test_trigrid(setup):
    model = ReconTrigrid(setup["ctx"])
    out = model.draw_f(setup["frames"], setup["cam"])
    _check_surface(out, setup, "trigrid")


@pytest.mark.full
def test_mvt(setup):
    model = ReconMVT(setup["ctx"])
    out = model.draw_f(setup["frames"], setup["cam"])
    _check_surface(out, setup, "mvt")


def test_points_shade_modes(setup):
    for mode in (1, 2, 3):
        model = ReconPoints(setup["ctx"], shade_mode=mode)
        out = np.asarray(model.draw(setup["frames"], setup["cam"]))
        assert np.all(np.isfinite(out))
        assert (out[..., 3] > 0).any()


def test_calibs(setup):
    model = ReconCalibs(setup["ctx"])
    model.set_active_kinect(1)
    out = np.asarray(model.draw(setup["frames"], setup["cam"]))
    assert np.all(np.isfinite(out))
    assert (out[..., 3] > 0).mean() > 0.05
    mosaic = model.slice_mosaic()
    assert mosaic.ndim == 3 and mosaic.shape[2] == 3
    assert mosaic.max() <= 1.0 and mosaic.min() >= 0.0


@pytest.mark.full
def test_integration_model(setup):
    bbox = setup["bbox"]
    model = ReconIntegration(
        setup["ctx"], voxel_size=float(np.max(bbox.size) / 48), brick_size=0.2,
    )
    out = model.draw_f(setup["frames"], setup["cam"])
    _check_surface(out, setup, "integration", min_frac=0.01)
    assert 0.0 < model.occupied_ratio() < 0.6
