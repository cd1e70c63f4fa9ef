"""Live HTTP frame viewer — the headless stand-in for the reference's
interactive GLFW window (kinect_client.cpp:938-977).

The reference shows every rendered frame in an on-screen window; this
environment has no display, so the app serves the live frame stream over
HTTP instead (SURVEY §2.2 scoped a host-side viewer as the optional GL
remnant):

  GET /            minimal page with the live <img> stream
  GET /stream      multipart/x-mixed-replace PNG stream (MJPEG-style;
                   one part per *new* frame — clients block on a
                   condition variable, no polling)
  GET /frame.png   latest frame, single shot

Zero dependencies: http.server + the repo's own PNG encoder
(utils/png.encode_png). Publishing is cheap for the render loop — it
stores the numpy frame under a lock and notifies; PNG encoding happens in
each viewer's connection thread, and only while someone is watching.

Usage: ``kinect_client.py scene.ks run.conf -serve 8089`` then open
http://localhost:8089/ (or curl /frame.png).
"""
from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..utils.png import encode_png

_PAGE = b"""<!doctype html>
<html><head><title>rgbd-recon-tpu live</title>
<style>body{margin:0;background:#111;display:flex;flex-direction:column;
align-items:center;color:#ccc;font:13px monospace}
img{max-width:100vw;max-height:92vh;image-rendering:pixelated}</style>
</head><body>
<p>rgbd-recon-tpu &mdash; live reconstruction stream</p>
<img src="/stream" onerror="setTimeout(()=>{this.src='/stream?'+Date.now()},1000)">
</body></html>"""

_BOUNDARY = b"rgbdframe"


class LiveViewer:
    """Publish/subscribe frame fan-out plus the HTTP server thread."""

    def __init__(self, port: int, host: str = "0.0.0.0"):
        self._lock = threading.Condition()
        self._frame: np.ndarray | None = None
        self._seq = 0
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                path = self.path.split("?")[0]
                try:
                    if path == "/":
                        self.send_response(200)
                        self.send_header("Content-Type", "text/html")
                        self.send_header("Content-Length", str(len(_PAGE)))
                        self.end_headers()
                        self.wfile.write(_PAGE)
                    elif path == "/frame.png":
                        png = viewer._encode_latest()
                        if png is None:
                            self.send_response(503)
                            self.end_headers()
                            return
                        self.send_response(200)
                        self.send_header("Content-Type", "image/png")
                        self.send_header("Content-Length", str(len(png)))
                        self.end_headers()
                        self.wfile.write(png)
                    elif path == "/stream":
                        self.send_response(200)
                        self.send_header(
                            "Content-Type",
                            "multipart/x-mixed-replace; boundary="
                            + _BOUNDARY.decode(),
                        )
                        self.end_headers()
                        seen = -1
                        while True:
                            frame, seen = viewer._wait_frame(seen)
                            png = encode_png(frame, level=1)
                            self.wfile.write(
                                b"--" + _BOUNDARY + b"\r\n"
                                b"Content-Type: image/png\r\n"
                                b"Content-Length: "
                                + str(len(png)).encode() + b"\r\n\r\n"
                                + png + b"\r\n"
                            )
                            self.wfile.flush()
                    else:
                        self.send_response(404)
                        self.end_headers()
                except (BrokenPipeError, ConnectionResetError):
                    pass  # viewer tab closed

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._server.daemon_threads = True
        self.port = self._server.server_address[1]  # resolved if port=0
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="live-viewer", daemon=True
        )
        self._thread.start()

    # --- render-loop side -------------------------------------------------
    def publish(self, rgba: np.ndarray) -> None:
        """Store the newest frame (float [H, W, 3/4] in [0, 1] or u8) and
        wake streaming clients. O(copy) for the caller."""
        frame = np.asarray(rgba)
        with self._lock:
            self._frame = frame
            self._seq += 1
            self._lock.notify_all()

    def close(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    # --- connection-thread side -------------------------------------------
    def _wait_frame(self, seen: int, timeout: float = 30.0):
        with self._lock:
            self._lock.wait_for(
                lambda: self._frame is not None and self._seq != seen, timeout
            )
            return self._frame, self._seq

    def _encode_latest(self):
        with self._lock:
            frame = self._frame
        return None if frame is None else encode_png(frame, level=1)
