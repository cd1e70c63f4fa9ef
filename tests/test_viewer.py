"""Live HTTP viewer (io/viewer.py) — the headless stand-in for the
reference's GLFW window (kinect_client.cpp:938-977)."""
import io
import threading
import urllib.request

import numpy as np

from rgbd_recon_tpu.io.viewer import LiveViewer
from rgbd_recon_tpu.utils.png import read_png


def _get(url, timeout=10):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, r.read()


def test_viewer_frame_and_stream(tmp_path):
    v = LiveViewer(0, host="127.0.0.1")   # port 0 = auto
    base = f"http://127.0.0.1:{v.port}"
    try:
        status, page = _get(base + "/")
        assert status == 200 and b"/stream" in page

        # no frame yet -> 503
        try:
            status, _ = _get(base + "/frame.png")
            assert status == 503
        except urllib.error.HTTPError as e:
            assert e.code == 503

        frame = np.zeros((8, 12, 4), np.float32)
        frame[..., 0] = 1.0
        frame[..., 3] = 1.0
        v.publish(frame)

        status, png = _get(base + "/frame.png")
        assert status == 200
        p = tmp_path / "f.png"
        p.write_bytes(png)
        img = read_png(str(p))
        assert img.shape == (8, 12, 4)
        assert img[..., 0].min() == 255 and img[..., 1].max() == 0

        # stream: one multipart part per published frame
        got = {}

        def reader():
            req = urllib.request.urlopen(base + "/stream", timeout=10)
            line = req.readline()          # --rgbdframe
            assert line.startswith(b"--rgbdframe")
            headers = {}
            while True:
                ln = req.readline().strip()
                if not ln:
                    break
                k, _, val = ln.partition(b":")
                headers[k.lower()] = val.strip()
            n = int(headers[b"content-length"])
            got["png"] = req.read(n)

        t = threading.Thread(target=reader, daemon=True)
        t.start()
        # publish until the reader has latched one part (it may have
        # connected after the first publish)
        for _ in range(50):
            v.publish(frame)
            t.join(timeout=0.1)
            if not t.is_alive():
                break
        assert not t.is_alive(), "stream reader never got a part"
        assert got["png"].startswith(b"\x89PNG")
    finally:
        v.close()
