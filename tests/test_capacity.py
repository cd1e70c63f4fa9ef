"""Brick-capacity safety (VERDICT r3 #2): occupancy exceeding the fast
path's fixed ``max_bricks`` must be DETECTED, never silently dropped.

The reference reads exact per-frame brick counts back to the host and
rebuilds its occupied list from them (recon_integration.cpp:430-445) so it
cannot overflow; our device-resident fixed-capacity list can — hence the
count in FrameOutput.occupied_bricks + FramePipeline.check_capacity."""
import numpy as np
import pytest

from rgbd_recon_tpu.runtime.pipeline import FramePipeline, PipelineConfig


def _make_pipe(small_rig, max_bricks):
    return FramePipeline(
        small_rig["rig"],
        PipelineConfig(
            render_width=64, render_height=48,
            tsdf_res=(48, 48, 48),
            voxel_size=float(np.max(small_rig["bbox"].size / 48)),
            brick_size=0.2,
            num_lods=4,
            max_bricks=max_bricks,
        ),
    )


def test_overflow_detected(small_rig):
    # 48^3 volume = 27 blocks of 16^3; the sphere scene occupies more than
    # 2 of them, so a capacity of 2 must be flagged by check_capacity
    pipe = _make_pipe(small_rig, max_bricks=2)
    assert pipe.use_fast and pipe.max_bricks == 2
    mv, proj = pipe.default_camera()
    out = pipe.step(small_rig["depth"], small_rig["color"], mv, proj)
    n = int(np.asarray(out.occupied_bricks))
    assert n > 2, "fixture scene must exceed the tiny capacity"
    with pytest.raises(RuntimeError, match="max_bricks"):
        pipe.check_capacity(out)


def test_no_overflow_passes(small_rig):
    pipe = _make_pipe(small_rig, max_bricks=None)  # auto-size
    assert pipe.max_bricks == 27  # min(nb, max(1024, nb // 4)) at 27 blocks
    mv, proj = pipe.default_camera()
    out = pipe.step(small_rig["depth"], small_rig["color"], mv, proj)
    n = pipe.check_capacity(out)  # must not raise
    assert 0 < n <= 27
