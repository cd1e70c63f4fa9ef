"""Live ZMQ ingest: localhost PUB -> ZMQIngest SUB with DXT1 frames
(≙ NetKinectArray::readLoop wire protocol, NetKinectArray.cpp:482-529),
plus the device-staging double buffer."""
import time

import pytest

pytestmark = pytest.mark.full  # mesh-compile / multi-process heavy (VERDICT r3 #8)

import numpy as np
import pytest

zmq = pytest.importorskip("zmq")

from rgbd_recon_tpu.io import dxt
from rgbd_recon_tpu.io.ingest import ZMQIngest, DeviceFeed, DoubleBuffer
from rgbd_recon_tpu.io.stream import FrameFormat


def _make_frame_payload(fmt, k, rng):
    """[f64 ts][K x (color, depth)] wire message + the decoded oracle."""
    colors, depths, parts = [], [], []
    ts = 123.456
    parts.append(np.float64(ts).tobytes())
    for i in range(k):
        img = rng.integers(0, 256, (fmt.height_c, fmt.width_c, 3), np.uint8)
        payload = dxt.encode_dxt1(img)
        # the decoder's view of the encoded image is the oracle
        colors.append(dxt.decode_dxt1(payload, fmt.width_c, fmt.height_c))
        parts.append(payload.tobytes())
        d = rng.uniform(0.5, 4.4, (fmt.height, fmt.width)).astype(np.float32)
        depths.append(d)
        parts.append(d.tobytes())
    return b"".join(parts), ts, np.stack(colors), np.stack(depths)


def test_zmq_ingest_live_roundtrip():
    fmt = FrameFormat(width=64, height=48, width_c=64, height_c=48,
                      compressed_rgb=1, compressed_depth=False)
    k = 2
    port = 17311
    ctx = zmq.Context(1)
    pub = ctx.socket(zmq.PUB)
    pub.bind(f"tcp://127.0.0.1:{port}")

    ingest = ZMQIngest(f"127.0.0.1:{port}", k, fmt)
    ingest.start()
    try:
        time.sleep(0.3)  # let SUB connect
        rng = np.random.default_rng(0)
        msg, ts, colors, depths = _make_frame_payload(fmt, k, rng)
        got = None
        for _ in range(50):  # PUB/SUB joins are racy; retry-publish
            pub.send(msg)
            time.sleep(0.05)
            got = ingest.buffer.swap_if_dirty()
            if got is not None:
                break
        assert got is not None, "no frame arrived over localhost PUB/SUB"
        d, c, got_ts = got
        assert got_ts == ts
        np.testing.assert_allclose(d, depths, rtol=0, atol=0)
        np.testing.assert_allclose(c, colors.astype(np.float32) / 255.0, atol=1e-6)
    finally:
        ingest.stop()
        pub.close(0)
        ctx.term()


def test_ingest_decode_throughput():
    """Decode+unpack rate for a realistic 4x1280x1080 DXT1 frame must beat
    the 30 fps budget on the u8 fast path (the reference dedicates fastdxt
    threads to this; we keep color u8 on the host and normalize on device)."""
    fmt = FrameFormat(width=512, height=424, width_c=1280, height_c=1080,
                      compressed_rgb=1, compressed_depth=False)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (1080, 1280, 3), np.uint8)
    payload = np.frombuffer(dxt.encode_dxt1(img).tobytes(), np.uint8)
    d_raw = np.frombuffer(
        rng.uniform(0.5, 4.4, (424, 512)).astype(np.float32).tobytes(), np.uint8
    )
    n = 6
    t0 = time.perf_counter()
    for _ in range(n):
        for _k in range(4):
            c = fmt.decode_color(payload, as_float=False)
            fmt.decode_depth(d_raw)
    dt = (time.perf_counter() - t0) / n
    print(f"ingest decode (u8 path): {dt * 1e3:.1f} ms per 4-sensor frame")
    assert c.dtype == np.uint8
    from rgbd_recon_tpu.io import native

    if native.available():
        assert dt < 1.0 / 30.0, f"decode too slow for 30 fps: {dt * 1e3:.1f} ms"


def test_device_feed_overlap_protocol():
    import jax
    import jax.numpy as jnp

    feed = DeviceFeed()
    assert feed.current() is None
    a = np.ones((2, 8, 8), np.float32)
    b = np.zeros((2, 8, 8, 3), np.float32)
    feed.stage(a, b, ts=1.0)
    assert feed.advance() is not None
    cur = feed.current()
    assert isinstance(cur[0], jax.Array)
    np.testing.assert_array_equal(np.asarray(cur[0]), a)
    # staging the next frame does not disturb the current one
    feed.stage(a * 2, b, ts=2.0)
    np.testing.assert_array_equal(np.asarray(feed.current()[0]), a)
    feed.advance()
    np.testing.assert_array_equal(np.asarray(feed.current()[0]), a * 2)
