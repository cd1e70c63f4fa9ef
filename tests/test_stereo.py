"""Stereo rendering (anaglyph + feedback-driven side-by-side), debug
overlays, and the watch_errors watchdog (kinect_client.cpp:609-708,
1017-1049)."""
import os
import struct
import time

import numpy as np
import pytest

from rgbd_recon_tpu.app import AppConfig, KinectClientApp
from rgbd_recon_tpu.calibration import synthetic
from rgbd_recon_tpu.io.stream import StreamWriter, FrameFormat
from rgbd_recon_tpu.utils.math import Bbox, perspective, look_at
from rgbd_recon_tpu.utils import stereo, overlay


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene_st")
    bbox = Bbox.default()
    ks = synthetic.write_reference_scene(
        str(d), num_sensors=2, bbox=bbox, width=128, height=104,
    )
    cams = synthetic.make_cameras(2, bbox, width=128, height=104)
    depth, color = synthetic.render_frames(
        cams, synthetic.SphereScene.default(bbox))
    fmt = FrameFormat(width=128, height=104, width_c=128, height_c=104,
                      compressed_rgb=0, compressed_depth=False)
    rec = d / "recordings"
    rec.mkdir()
    w = StreamWriter([str(rec / f"sensor{i}.stream") for i in range(2)], fmt)
    for _ in range(3):
        w.write(depth, color)
    w.close()
    return dict(dir=d, ks=ks)


def _app_cfg(**kw):
    cfg = AppConfig(screen_width=96, screen_height=64, play=True,
                    voxel_size=0.05, brick_size=0.2, tsdf_limit=0.02,
                    zoom=2.5)
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_stereo_camera_offaxis():
    """Left/right eyes: symmetric opposite x-offsets, shared far plane, and
    asymmetric frusta that converge on the screen rectangle."""
    cam = stereo.StereoCamera()
    lmv, lproj = cam.eye_view("left")
    rmv, rproj = cam.eye_view("right")
    # eye positions in world: cyclops z=1, x = -/+ sep/2
    le = np.linalg.inv(lmv)[:3, 3]
    re = np.linalg.inv(rmv)[:3, 3]
    assert np.allclose(le, [-0.032, 0.0, 1.0], atol=1e-6)
    assert np.allclose(re, [+0.032, 0.0, 1.0], atol=1e-6)
    # off-axis: left eye's frustum is skewed right (positive [0,2] term)
    assert lproj[0, 2] > 0 and rproj[0, 2] < 0
    assert np.allclose(lproj[0, 2], -rproj[0, 2], atol=1e-6)
    # a point ON the screen plane projects to the same pixel for both eyes
    p = np.array([0.3, 0.2, 0.0, 1.0])
    for mv, proj in ((lmv, lproj), (rmv, rproj)):
        clip = proj @ (mv @ p)
        ndc = clip[:2] / clip[3]
        assert np.allclose(ndc, [0.3 / 0.64, 0.2 / 0.36], atol=1e-5)


def test_anaglyph_composite_channels():
    left = np.full((4, 4, 4), 0.25, np.float32)
    right = np.full((4, 4, 4), 0.75, np.float32)
    out = stereo.anaglyph_composite(left, right, clear_alpha=0.5)
    assert np.all(out[..., 0] == 0.25)
    assert np.all(out[..., 1] == 0.75) and np.all(out[..., 2] == 0.75)
    assert np.all(out[..., 3] == 0.5)


def test_side_by_side_composite_viewports():
    l = np.ones((4, 6, 4), np.float32)
    r = np.full((4, 6, 4), 2.0, np.float32)
    out = stereo.side_by_side_composite((8, 16), l, (0, 0), r, (8, 4))
    # GL y from bottom: left at rows 4..8, cols 0..6
    assert np.all(out[4:8, 0:6] == 1.0)
    assert np.all(out[0:4, 8:14] == 2.0)
    assert np.all(out[0:4, 0:4] == 0.0)


@pytest.mark.full
def test_app_anaglyph(scene_dir):
    app = KinectClientApp(
        scene_dir["ks"], _app_cfg(stereo_mode=1),
        recordings_dir=str(scene_dir["dir"] / "recordings"),
        out_dir=str(scene_dir["dir"] / "out_ana"), log=lambda s: None,
    )
    rgba = np.asarray(app.frame_step())
    app.quit()
    assert rgba.shape == (64, 96, 4)
    # both eyes saw the sphere; red (left) and cyan (right) disagree where
    # the parallax shifted the silhouette
    assert (rgba[..., 0] > 0.01).any() and (rgba[..., 1] > 0.01).any()
    assert not np.array_equal(rgba[..., 0], rgba[..., 1])


def test_app_side_by_side_feedback(scene_dir):
    """Feedback matrices drive the side-by-side cameras
    (kinect_client.cpp:634-670; FeedbackReceiver.cpp:39-66)."""
    zmq = pytest.importorskip("zmq")
    ctx = zmq.Context(1)
    pub = ctx.socket(zmq.PUB)
    port = pub.bind_to_random_port("tcp://127.0.0.1")

    app = KinectClientApp(
        scene_dir["ks"],
        _app_cfg(stereo_mode=2, window_width=192, window_height=64,
                 left_pos=(0, 0), right_pos=(96, 0), colorfill=True),
        recordings_dir=str(scene_dir["dir"] / "recordings"),
        out_dir=str(scene_dir["dir"] / "out_sbs"),
        feedback_socket=f"127.0.0.1:{port}",
        log=lambda s: None,
    )
    # side-by-side disables depth-aware color filling (kinect_client.cpp:641)
    assert app.pipeline.cfg.fill_holes is False

    # wire format: 3 column-major fmat4 + int recon_mode
    cyclops = stereo.translate(0, 0, 2.0).astype(np.float32)
    screen = np.eye(4, dtype=np.float32)
    model = np.asarray(app.navigator.modelview(), np.float32)
    msg = (cyclops.T.tobytes() + screen.T.tobytes() + model.T.tobytes()
           + struct.pack("<i", 1))
    deadline = time.time() + 5.0
    got_fb = False
    while time.time() < deadline:
        pub.send(msg)
        time.sleep(0.05)
        if app.feedback.get() is not None:
            got_fb = True
            break
    assert got_fb, "feedback message never arrived"

    rgba = np.asarray(app.frame_step())
    app.quit()
    pub.close()
    ctx.term()
    assert rgba.shape == (64, 192, 4)
    left = rgba[:, :96]
    right = rgba[:, 96:]
    # feedback cyclops moved the head back: both eye views rendered, into
    # their own viewports, and differ by parallax
    assert (left[..., 3] != 0).any() and (right[..., 3] != 0).any()
    assert not np.array_equal(left, right)
    # the feedback matrices were consumed
    assert np.allclose(app.stereo.cyclops, cyclops, atol=1e-6)


def test_overlay_grid_depth_test():
    """Lines land on exact projected pixels and respect the depth buffer."""
    h, w = 64, 64
    img = np.zeros((h, w, 4), np.float32)
    mv = look_at([0, 0, 5], [0, 0, 0], [0, 1, 0])
    proj = perspective(50.0, 1.0, 0.1, 100.0)
    segs = np.array([[[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]]], np.float32)
    out = overlay.draw_segments(img, segs, mv, proj, color=(1, 0, 0, 1))
    assert (out[..., 0] > 0).any()
    row = np.argwhere(out[..., 0] > 0)[:, 0]
    assert np.all(np.abs(row - h // 2) <= 1)  # horizontal mid line
    # occluder in front: depth buffer 0 everywhere kills the line
    out2 = overlay.draw_segments(img, segs, mv, proj, color=(1, 0, 0, 1),
                                 depth=np.zeros((h, w), np.float32))
    assert not (out2[..., 0] > 0).any()


@pytest.mark.full
def test_app_draw_grid_and_watchdog(scene_dir):
    app = KinectClientApp(
        scene_dir["ks"], _app_cfg(draw_grid=True, watch_errors=True),
        recordings_dir=str(scene_dir["dir"] / "recordings"),
        out_dir=str(scene_dir["dir"] / "out_grid"), log=lambda s: None,
    )
    base_app = KinectClientApp(
        scene_dir["ks"], _app_cfg(draw_grid=False),
        recordings_dir=str(scene_dir["dir"] / "recordings"),
        out_dir=str(scene_dir["dir"] / "out_nogrid"), log=lambda s: None,
    )
    with_grid = np.asarray(app.frame_step())
    without = np.asarray(base_app.frame_step())
    app.quit()
    base_app.quit()
    assert not np.array_equal(with_grid, without)  # overlay composited
    # watchdog trips on injected NaN (≙ GL-error throw)
    app2 = KinectClientApp(
        scene_dir["ks"], _app_cfg(watch_errors=True),
        recordings_dir=str(scene_dir["dir"] / "recordings"),
        out_dir=str(scene_dir["dir"] / "out_wd"), log=lambda s: None,
    )
    orig = app2._render_view

    def poisoned(*a, **kw):
        rgba, out, frames = orig(*a, **kw)
        bad = np.asarray(rgba).copy()
        bad[0, 0, 0] = np.nan
        return bad, out, frames

    app2._render_view = poisoned
    with pytest.raises(RuntimeError, match="watch_errors"):
        app2.frame_step()
    app2.quit()
