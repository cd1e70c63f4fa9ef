"""Live ZMQ frame ingest + double-buffered host->device feeding.

≙ the reference's NetKinectArray ingest thread + persistent-mapped PBO pair
(NetKinectArray::readLoop, NetKinectArray.cpp:482-529; double_pbo,
double_pixel_buffer.cpp:10-103): a SUB socket with RCVHWM=1 receives
``[f64 timestamp][K x (color, depth)]`` messages; the render side swaps in the
latest complete frame. Here the "PBO" is a pinned numpy staging pair and the
swap hands frames to ``jax.device_put`` ahead of the compute step so H2D
overlaps the previous frame's device work.
"""
from __future__ import annotations

import threading
from typing import Optional

import numpy as np

from .stream import FrameFormat

try:  # zmq is optional (file replay needs none)
    import zmq
except Exception:  # pragma: no cover
    zmq = None


class DoubleBuffer:
    """Front/back swap with a dirty flag (≙ double_buffer.hpp:6-33)."""

    def __init__(self, shape_depth, shape_color, color_dtype=np.float32,
                 depth_dtype=np.float32):
        self._depth = [np.zeros(shape_depth, depth_dtype) for _ in range(2)]
        self._color = [np.zeros(shape_color, color_dtype) for _ in range(2)]
        self._front = 0
        self.dirty = False
        self.lock = threading.Lock()
        self.timestamp = 0.0

    @property
    def back_depth(self):
        return self._depth[1 - self._front]

    @property
    def back_color(self):
        return self._color[1 - self._front]

    def swap_if_dirty(self) -> Optional[tuple[np.ndarray, np.ndarray, float]]:
        """Render-thread side of update() (NetKinectArray.cpp:224-236)."""
        with self.lock:
            if not self.dirty:
                return None
            self._front = 1 - self._front
            self.dirty = False
            return self._depth[self._front], self._color[self._front], self.timestamp

    def publish(self, ts: float) -> None:
        with self.lock:
            self.timestamp = ts
            self.dirty = True


class ZMQIngest:
    """SUB-socket reader thread (≙ readLoop). Wire layout per message:
    ``[f64 time][K1 color][K1 depth][K2 color][K2 depth]...``
    (NetKinectArray.cpp:510-523)."""

    def __init__(self, endpoint: str, num_sensors: int, fmt: FrameFormat,
                 color_u8: bool = False, raw_wire: bool = False):
        """``raw_wire``: keep the WIRE payload bytes (no host decode at
        all) — the app then uploads them as-is and decodes on device
        (ops/wire.py), cutting both ingest-thread CPU and H2D bytes for
        compressed streams (~10x)."""
        if zmq is None:
            raise RuntimeError("pyzmq not available")
        self.fmt = fmt
        self.num_sensors = num_sensors
        self.color_u8 = color_u8
        self.raw_wire = raw_wire
        if raw_wire:
            self.buffer = DoubleBuffer(
                (num_sensors, fmt.depth_size),
                (num_sensors, fmt.color_size),
                color_dtype=np.uint8, depth_dtype=np.uint8,
            )
        else:
            self.buffer = DoubleBuffer(
                (num_sensors, fmt.height, fmt.width),
                (num_sensors, fmt.height_c, fmt.width_c, 3),
                color_dtype=np.uint8 if color_u8 else np.float32,
            )
        self._endpoint = endpoint
        self._running = False
        self._thread: Optional[threading.Thread] = None

    def start(self) -> None:
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=2.0)

    def _loop(self) -> None:
        ctx = zmq.Context(1)
        sock = ctx.socket(zmq.SUB)
        sock.setsockopt(zmq.SUBSCRIBE, b"")
        sock.setsockopt(zmq.RCVHWM, 1)  # drop backlog (NetKinectArray.cpp:489)
        sock.setsockopt(zmq.RCVTIMEO, 200)
        sock.connect(f"tcp://{self._endpoint}")
        fmt = self.fmt
        frame_size = fmt.frame_size
        try:
            while self._running:
                try:
                    msg = sock.recv()
                except zmq.Again:
                    continue
                if len(msg) < 8 + frame_size * self.num_sensors:
                    continue
                ts = np.frombuffer(msg[:8], np.float64)[0]
                off = 8
                for k in range(self.num_sensors):
                    raw = np.frombuffer(msg[off : off + fmt.color_size], np.uint8)
                    if self.raw_wire:
                        self.buffer.back_color[k] = raw
                    else:
                        self.buffer.back_color[k] = fmt.decode_color(
                            raw, as_float=not self.color_u8
                        )
                    off += fmt.color_size
                    raw = np.frombuffer(msg[off : off + fmt.depth_size], np.uint8)
                    if self.raw_wire:
                        self.buffer.back_depth[k] = raw
                    else:
                        self.buffer.back_depth[k] = fmt.decode_depth(raw)
                    off += fmt.depth_size
                self.buffer.publish(float(ts))
        finally:
            sock.close(0)
            ctx.term()


class DeviceFeed:
    """Host->device staging that overlaps H2D with compute.

    ≙ the reference's persistent-mapped PBO pair + fillLayersFromPBO
    (double_pixel_buffer.cpp:10-103, TextureArray.cpp:75-87): while the
    device executes frame N, frame N+1's arrays are already being copied.
    JAX dispatch is asynchronous, so ``stage()`` merely issues device_put and
    returns; the transfer proceeds while the caller runs the current step.

    Use:
        staged = feed.current()          # device arrays staged last frame
        feed.stage(depth_np, color_np)   # async H2D for the NEXT frame
        out = pipe.step(*staged, ...)    # compute overlaps the transfer
    """

    def __init__(self):
        self._current = None
        self._next = None
        self.timestamp = 0.0

    def stage(self, depth: np.ndarray, color: np.ndarray, ts: float = 0.0):
        import jax

        self._next = (jax.device_put(depth), jax.device_put(color))
        self.timestamp = ts

    def current(self):
        """Device arrays of the most recently completed stage (None until
        two frames have been staged)."""
        return self._current

    def advance(self):
        """Swap: the staged frame becomes current (call once per loop)."""
        if self._next is not None:
            self._current = self._next
            self._next = None
        return self._current


class FeedbackSender:
    """Publishes ``feedback`` structs for head-tracked stereo viewers — the
    counterpart of the reference's FeedbackReceiver (io/FeedbackReceiver.h:
    17-47): 3 column-major f32[16] matrices + i32 recon mode."""

    @staticmethod
    def pack(cyclops: np.ndarray, screen: np.ndarray, model: np.ndarray, mode: int) -> bytes:
        out = b"".join(
            np.asarray(m, np.float32).T.tobytes() for m in (cyclops, screen, model)
        )
        return out + np.int32(mode).tobytes()


class FeedbackReceiver:
    """SUB thread for viewer feedback (≙ io/FeedbackReceiver.cpp:14-71)."""

    STRUCT_BYTES = 16 * 4 * 3 + 4

    def __init__(self, endpoint: str):
        if zmq is None:
            raise RuntimeError("pyzmq not available")
        self._endpoint = endpoint
        self._lock = threading.Lock()
        self._value = None
        self._running = False
        self._thread: Optional[threading.Thread] = None

    def start(self) -> None:
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=2.0)

    def get(self):
        with self._lock:
            return self._value

    def _loop(self) -> None:
        ctx = zmq.Context(1)
        sock = ctx.socket(zmq.SUB)
        sock.setsockopt(zmq.SUBSCRIBE, b"")
        sock.setsockopt(zmq.RCVHWM, 1)
        sock.setsockopt(zmq.RCVTIMEO, 200)
        sock.connect(f"tcp://{self._endpoint}")
        try:
            while self._running:
                try:
                    msg = sock.recv()
                except zmq.Again:
                    continue
                if len(msg) < self.STRUCT_BYTES:
                    continue
                mats = np.frombuffer(msg[: 16 * 4 * 3], np.float32).reshape(3, 4, 4)
                mode = int(np.frombuffer(msg[16 * 4 * 3 : 16 * 4 * 3 + 4], np.int32)[0])
                with self._lock:
                    # stored column-major on the wire
                    self._value = dict(
                        cyclops=mats[0].T, screen=mats[1].T, model=mats[2].T,
                        recon_mode=mode,
                    )
        finally:
            sock.close(0)
            ctx.term()
