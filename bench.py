"""Benchmark: fused frames/sec at 256³ TSDF from 4 RGBD streams (one chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

vs_baseline is against the driver-set target of 30 fps at 256^3/4 streams
(BASELINE.md — the reference publishes no absolute numbers).

The measurement runs on a LADDER of configs (small -> target) in a worker
thread while the main thread keeps a deadline + signal watch: whatever rung
last completed is what gets printed, even if the process is interrupted or
the target config cannot finish compiling inside the window. The metric
string always states the config the number came from.

Env knobs:
  BENCH_TSDF=256        target volume resolution per axis (the headline:
                        the printed JSON line prefers this rung's result;
                        other rungs are demonstrations in the stderr log)
  BENCH_SENSORS=4       stream count
  BENCH_RENDER=1280x720
  BENCH_ITERS=8
  BENCH_LADDER=128,256,512  comma list of rungs (512 = BASELINE config 3,
                        brick-sparse at scale)
  BENCH_BUDGET_S=0      self-imposed deadline seconds (0 = none; rely on the
                        driver's timeout + signal handling)
  BENCH_TIMED=0         1 = also print per-stage ms (stderr) via step_timed
  BENCH_DISTORT=        empty = exact pinhole rig; a float (e.g. 0.004) =
                        Kinect-magnitude lens distortion + NNI-like world
                        warp of that amplitude (meters) — measures the
                        fast-path gates' fallback cost on realistic
                        calibration (VERDICT r4 #4)
"""
from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

import numpy as np

_best: dict | None = None
_best_lock = threading.Lock()
_printed = False


def _emit_and_exit(code: int = 0) -> None:
    """Print the best JSON line exactly once, then hard-exit."""
    global _printed
    with _best_lock:
        if _printed:
            os._exit(code)
        _printed = True
        result = _best or {
            "metric": "fused frames/sec (no config finished compiling in the window)",
            "value": 0.0,
            "unit": "fps",
            "vs_baseline": 0.0,
        }
    sys.stderr.flush()
    print(json.dumps(result), flush=True)
    os._exit(code)


def log(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


def bench_rung(tsdf_n: int, num_sensors: int, rw: int, rh: int, iters: int,
               rig, cams, depth, color, bbox, cache_dir: str, timed: bool) -> dict:
    import jax
    import jax.numpy as jnp

    from rgbd_recon_tpu.runtime.pipeline import FramePipeline, PipelineConfig

    t_rung = time.time()
    log(f"rung {tsdf_n}^3 / {num_sensors} streams / {rw}x{rh}: building pipeline")
    pipe = FramePipeline(
        rig,
        PipelineConfig(
            render_width=rw, render_height=rh,
            tsdf_res=(tsdf_n, tsdf_n, tsdf_n),
            voxel_size=float(np.max(bbox.size) / tsdf_n),
            brick_size=0.1,
            num_lods=6,
        ),
        log=log,
        table_cache_dir=cache_dir,
    )
    mv, proj = pipe.default_camera()
    # pre-stage several DISTINCT input frames and cycle them: a loop over one
    # identical buffer could be memoized by a caching backend and does not
    # represent streaming anyway
    nbuf = int(os.environ.get("BENCH_NBUF", "4"))
    rng = np.random.default_rng(7)
    ds, cs = [], []
    for _ in range(nbuf):
        ds.append(jnp.asarray(depth + rng.uniform(0, 2e-3, depth.shape).astype(np.float32)))
        cs.append(jnp.asarray(np.clip(color + rng.uniform(0, 1e-2, color.shape).astype(np.float32), 0, 1)))
    d, c = ds[0], cs[0]

    t0 = time.time()
    pipe.warmup(d, c, mv, proj)
    log(f"rung {tsdf_n}: warmup/compile took {time.time()-t0:.1f}s")
    # brick-capacity audit (never bench a config that silently drops
    # geometry): one frame, exact occupied count vs capacity
    n_occ = pipe.check_capacity(pipe.step(d, c, mv, proj))
    log(f"rung {tsdf_n}: occupied bricks {n_occ} / capacity {pipe.max_bricks}")

    # the remote backend charges a fixed RTT per dispatch: the staged mode
    # pays it 4x per frame, the fused single-dispatch mode once. Measure
    # both (VERDICT r2 #2) and report the faster one.
    modes = os.environ.get("BENCH_MODES", "staged,fused").split(",")

    # honest timing on a remote/async backend: (a) thread a device-side
    # dependence between frames so iterations cannot be elided or reordered,
    # (b) drain the queue with a host read of the final output
    # (block_until_ready alone does NOT wait for remote execution here),
    # (c) amortize the read's RTT over the iterations.
    def run_loop(n):
        t0 = time.time()
        carry = jnp.float32(0.0)
        out = None
        for i in range(n):
            # 1e-8-scale perturbation: keeps a true device-side dependence
            # AND unique input content every frame (a content-addressed
            # cache would otherwise replay repeats), numerically negligible
            d_i = ds[i % nbuf] + carry * 1e-8
            out = pipe.step(d_i, cs[i % nbuf], mv, proj)
            # depend on EVERY stage's output so none can be elided
            carry = (
                out.occupied_ratio + out.color[0, 0, 0] + out.depth[0, 0]
                + out.tsdf[0, 0, 0]
            )
        float(np.asarray(carry))  # drain
        return time.time() - t0

    best = None
    for mode in modes:
        fused = mode.strip() == "fused"
        pipe.cfg = pipe.cfg._replace(fused=fused)
        if fused:
            t0 = time.time()
            pipe.warmup(d, c, mv, proj)
            log(f"rung {tsdf_n}: fused warmup took {time.time()-t0:.1f}s")
        run_loop(2)  # warm any remaining variants
        # the drain read carries a noisy fixed RTT; min-over-trials at two
        # loop lengths cancels it
        t_one = min(run_loop(1) for _ in range(3))
        t_full = min(run_loop(iters) for _ in range(2))
        dt = (t_full - t_one) / (iters - 1)
        fps = 1.0 / max(dt, 1e-9)
        log(f"rung {tsdf_n} [{mode}]: steady-state {dt*1e3:.1f} ms/frame = "
            f"{fps:.2f} fps (total rung time {time.time()-t_rung:.0f}s)")
        if best is None or fps > best[1]:
            best = (mode, fps, dt)
    mode, fps, dt = best
    log(f"rung {tsdf_n}: best mode {mode} at {fps:.2f} fps")

    if timed:
        from rgbd_recon_tpu.utils.timers import TimerDatabase

        db = TimerDatabase.instance()
        pipe.step_timed(d, c, mv, proj)
        for name in sorted(db.timers):
            t = db.timers[name]
            if t.count:
                log(f"  stage {name}: {t.last*1e3:.2f} ms")

    return {
        "metric": (
            f"fused frames/sec at {tsdf_n}^3 TSDF from {num_sensors} RGBD streams"
            f" ({rw}x{rh} render, 1 chip, {mode} dispatch)"
        ),
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 4),
    }


def worker() -> None:
    global _best
    tsdf_target = int(os.environ.get("BENCH_TSDF", "256"))
    num_sensors = int(os.environ.get("BENCH_SENSORS", "4"))
    rw, rh = (int(v) for v in os.environ.get("BENCH_RENDER", "1280x720").split("x"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    default_ladder = f"128,{tsdf_target},512" if tsdf_target != 512 else "128,256,512"
    ladder = [
        int(v) for v in os.environ.get("BENCH_LADDER", default_ladder).split(",")
    ]
    timed = os.environ.get("BENCH_TIMED", "0") == "1"
    distort = os.environ.get("BENCH_DISTORT", "")

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:
        log(f"compilation cache unavailable: {e}")

    log(f"jax backend: {jax.default_backend()}, devices: {jax.devices()}")

    from rgbd_recon_tpu.utils.math import Bbox
    from rgbd_recon_tpu.calibration import synthetic
    from rgbd_recon_tpu.calibration.rig import RigCalibration

    bbox = Bbox.default()
    scene_kind = os.environ.get("BENCH_SCENE", "sphere")
    # the distorted rig's cv-volume bake (undistort/unwarp fixed-point over
    # 4.2M-point grids in host numpy) costs ~20 min on a 1-core box — cache
    # the built (rig, frames) on disk keyed by the full build config
    rig_cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".bench_cache",
        f"rig_k{num_sensors}_d{distort or '0'}_{scene_kind}.npz",
    )
    if os.path.exists(rig_cache):
        log(f"loading cached rig + frames from {rig_cache}")
        z = np.load(rig_cache)
        rig = RigCalibration(**{f: z[f] for f in RigCalibration._fields})
        depth, color = z["depth"], z["color"]
    else:
        log(f"building synthetic {num_sensors}-sensor rig + frames"
            + (f" (distortion={distort})" if distort else ""))
        if distort:
            rig, cams, ccams = synthetic.synthetic_rig(
                num_sensors=num_sensors, bbox=bbox,
                fwd_res=(128, 256, 128), inv_res=(128, 128, 128),
                width=512, height=424, distortion=float(distort),
            )
        else:
            rig, cams = synthetic.synthetic_rig(
                num_sensors=num_sensors, bbox=bbox,
                fwd_res=(128, 256, 128),  # reference forward-volume res (CalibVolumes.cpp:19)
                inv_res=(128, 128, 128),
                width=512, height=424,    # Kinect v2
            )
            ccams = None
        scene = synthetic.make_scene(scene_kind, bbox)
        depth, color = synthetic.render_frames(cams, scene, color_cams=ccams)
        try:
            os.makedirs(os.path.dirname(rig_cache), exist_ok=True)
            np.savez(rig_cache, depth=depth, color=color,
                     **{f: np.asarray(getattr(rig, f))
                        for f in RigCalibration._fields})
        except Exception as e:
            log(f"rig cache write failed (continuing): {e}")
    cams = None

    for tsdf_n in ladder:
        try:
            result = bench_rung(
                tsdf_n, num_sensors, rw, rh, iters,
                rig, cams, depth, color, bbox, cache_dir, timed,
            )
        except Exception as e:  # a failed rung must not lose earlier rungs
            log(f"rung {tsdf_n} FAILED: {type(e).__name__}: {e}")
            continue
        with _best_lock:
            # the headline is the BENCH_TSDF rung; other rungs only stand
            # in while the target hasn't completed (or if it failed)
            if _best is None or tsdf_n == tsdf_target or (
                f" {tsdf_target}^3 " not in _best["metric"]
            ):
                _best = result


def main() -> None:
    budget = float(os.environ.get("BENCH_BUDGET_S", "0"))
    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, lambda *_: _emit_and_exit(0))

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    deadline = time.time() + budget if budget > 0 else None
    # the main thread only sleeps, so signals are handled promptly even while
    # the worker sits inside a long XLA compile
    while t.is_alive():
        if deadline is not None and time.time() > deadline:
            log("self-imposed budget exceeded; emitting best result")
            _emit_and_exit(0)
        time.sleep(0.5)
    _emit_and_exit(0)


if __name__ == "__main__":
    main()
