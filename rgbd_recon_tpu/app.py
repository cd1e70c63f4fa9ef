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
import sys
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
        self._jnp = jnp
        self._pp = pp

        self.log(f"loading scene {ks_path}")
        self.calib_files, self.rig, self.fmt, self.bbox = load_scene(ks_path)

        self.pipeline = FramePipeline(
            self.rig,
            PipelineConfig(
                render_width=cfg.screen_width, render_height=cfg.screen_height,
                voxel_size=cfg.voxel_size, brick_size=cfg.brick_size,
                tsdf_limit=cfg.tsdf_limit,
                use_bricks=cfg.bricking, skip_space=cfg.skip_space,
                fill_holes=cfg.colorfill,
                filter_textures=cfg.bilateral,
                use_processed_depth=cfg.processed,
                refine_boundary=cfg.refine,
            ),
            log=lambda s: self.log(f"[pipeline] {s}"),
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
        else:
            from .io.ingest import ZMQIngest, DeviceFeed

            # u8 color stays u8 until the device (4x less decode + H2D work)
            self.ingest = ZMQIngest(
                server_socket, self.calib_files.num, self.fmt, color_u8=True
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

        self._frames_done = 0
        db = TimerDatabase.instance()
        for t in ("draw", "1preprocess", "2integrate", "3recon", "holefill"):
            db.add_timer(t)

    # ------------------------------------------------------------------

    def _acquire(self):
        """Next sensor frame (depth, color) or None. Live frames go through
        the DeviceFeed so H2D of frame N+1 overlaps frame N's compute
        (≙ the reference's double-PBO handoff)."""
        if self.reader is not None:
            got = self.reader.read()
            if got is None:
                return None
            return got
        swap = self.ingest.buffer.swap_if_dirty()
        if swap is not None:
            self.feed.stage(swap[0].copy(), swap[1].copy(), swap[2])
        return self.feed.advance()

    def frame_step(self):
        """One frame: acquire + reconstruct (≙ frameStep/draw3d)."""
        got = self._acquire()
        if got is None:
            return None
        depth, color = got
        cfg = self.cfg
        if cfg.animate:
            self.navigator.orbit(2.0 * np.pi * (self._frames_done % 360) / 360.0)
        mv = self.navigator.modelview()

        db = TimerDatabase.instance()
        db.begin("draw")
        if cfg.recon_mode == 1:
            out = self.pipeline.step_timed(depth, color, mv, self.proj)
            rgba = out.color
        else:
            frames = self._pp.preprocess(
                self._jnp.asarray(depth), self._jnp.asarray(color),
                self.rig, self.pipeline.pre_cfg,
                self.pipeline._get_warp(depth.shape[1], depth.shape[2]),
            )
            from .ops.raymarch import RenderCamera

            cam = RenderCamera(
                self._jnp.asarray(mv), self._jnp.asarray(self.proj),
                cfg.screen_width, cfg.screen_height,
            )
            model = self.models[cfg.recon_mode]
            rgba = model.draw_f(frames, cam)
            out = None
        db.end("draw", sync=rgba)
        self._frames_done += 1

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
                self.rig, self.pipeline.pre_cfg, warp,
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
        return self.quit()

    def quit(self) -> int:
        """CSV export on quit (kinect_client.cpp:831-847)."""
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


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
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
    )
    return app.run()


if __name__ == "__main__":
    raise SystemExit(main())
