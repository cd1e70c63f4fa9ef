"""Runtime re-tuning (≙ setVoxelSize/setBrickSize/setTsdfLimit + divideBox,
recon_integration.cpp:340-406; GUI drag + 'S' reload kinect_client.cpp:
776-783): mid-run changes rebuild only what they invalidate."""
import numpy as np
import jax.numpy as jnp
import pytest

from rgbd_recon_tpu.runtime.pipeline import FramePipeline, PipelineConfig


@pytest.fixture(scope="module")
def pipe_inputs(small_rig):
    depth = jnp.asarray(small_rig["depth"])
    color = jnp.asarray(small_rig["color"])
    return small_rig["rig"], depth, color


def _build(rig):
    return FramePipeline(
        rig,
        PipelineConfig(render_width=64, render_height=48,
                       tsdf_res=(48, 48, 48), voxel_size=0.05,
                       brick_size=0.2, tsdf_limit=0.02, num_lods=3),
    )


def test_retune_tsdf_limit_keeps_bakes(pipe_inputs):
    rig, depth, color = pipe_inputs
    pipe = _build(rig)
    mv, proj = pipe.default_camera()
    out1 = pipe.step(depth, color, mv, proj)
    tables_before = pipe.tables
    warp_before = pipe._warp_hw
    pipe.retune(tsdf_limit=0.04)
    # warp bakes survive a limit-only change
    assert pipe.tables is tables_before
    assert pipe._warp_hw == warp_before
    out2 = pipe.step(depth, color, mv, proj)
    assert out2.tsdf.shape == out1.tsdf.shape
    # the clear value IS the (negated) limit — the change must take effect
    assert np.isclose(float(out1.tsdf.min()), -0.02, atol=1e-6)
    assert np.isclose(float(out2.tsdf.min()), -0.04, atol=1e-6)


@pytest.mark.full
def test_retune_voxel_size_rebuilds_volume(pipe_inputs):
    rig, depth, color = pipe_inputs
    pipe = _build(rig)
    mv, proj = pipe.default_camera()
    out1 = pipe.step(depth, color, mv, proj)
    tables_before = pipe.tables
    pipe.retune(voxel_size=0.1)
    res = pipe.tsdf_cfg.res
    # res re-derived from bbox/voxel like the reference's setVoxelSize
    assert res != (48, 48, 48)
    from rgbd_recon_tpu.ops.tsdf import TsdfConfig

    assert TsdfConfig.from_voxel_size(rig.bbox, 0.1, 0.02).res == res
    if pipe.use_fast:
        assert pipe.tables is not tables_before  # warp re-baked
    out2 = pipe.step(depth, color, mv, proj)
    assert out2.tsdf.shape == tuple(reversed(res))
    assert out2.color.shape == out1.color.shape


@pytest.mark.full
def test_retune_bounded_recompiles(pipe_inputs):
    """Stepping twice after a retune compiles each stage exactly once
    (and an unchanged-step loop doesn't recompile at all)."""
    rig, depth, color = pipe_inputs
    pipe = _build(rig)
    mv, proj = pipe.default_camera()
    pipe.step(depth, color, mv, proj)
    pipe.step(depth, color, mv, proj)
    sizes = {}
    for name in ("_pre", "_integrate", "_render", "_fill"):
        fn = getattr(pipe, name)
        if hasattr(fn, "_cache_size"):
            sizes[name] = fn._cache_size()
            assert sizes[name] <= 1, name
    pipe.retune(min_voxels_per_brick=20)
    pipe.step(depth, color, mv, proj)
    pipe.step(depth, color, mv, proj)
    for name, before in sizes.items():
        fn = getattr(pipe, name)
        if hasattr(fn, "_cache_size"):
            assert fn._cache_size() <= 1, name  # fresh wrapper, one entry
