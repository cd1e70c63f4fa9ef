#!/usr/bin/env python
"""Device-trace budget of the FUSED frame step.

Per-op standalone timing through the remote tunnel carries a ~1-2.5 ms
noisy dispatch cost per call, which swamps everything smaller than the
integrate kernel (docs/PERF.md "honest timing"). This script instead
captures ONE jax.profiler device trace of a few fused steps and
aggregates the on-device op durations by fusion name — the same
information the reference reads from its GPU timestamp queries
(TimerGPU, framework/timevalue.h), at op rather than stage granularity.

Usage:
  python scripts/trace_fused.py [--tsdf 256] [--sensors 4]
      [--render 1280x720] [--steps 3] [--out /tmp/trace_fused]
  # prints a sorted per-op table + stage-bucket summary (stderr: progress)
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def capture(args) -> str:
    import jax
    import jax.numpy as jnp

    from rgbd_recon_tpu.utils.math import Bbox
    from rgbd_recon_tpu.calibration import synthetic
    from rgbd_recon_tpu.runtime.pipeline import FramePipeline, PipelineConfig

    rw, rh = (int(v) for v in args.render.split("x"))
    bbox = Bbox.default()
    rig, cams = synthetic.synthetic_rig(
        num_sensors=args.sensors, bbox=bbox,
        fwd_res=(128, 256, 128), inv_res=(128, 128, 128),
        width=512, height=424,
    )
    scene = synthetic.SphereScene.default(bbox)
    depth, color = synthetic.render_frames(cams, scene)

    n = args.tsdf
    pipe = FramePipeline(
        rig,
        PipelineConfig(
            render_width=rw, render_height=rh,
            tsdf_res=(n, n, n),
            voxel_size=float(np.max(bbox.size) / n),
            brick_size=0.1, num_lods=6, fused=True,
        ),
        log=lambda m: print(f"# {m}", file=sys.stderr),
    )
    mv, proj = pipe.default_camera()
    d = jnp.asarray(depth)
    c = jnp.asarray(color)
    pipe.warmup(d, c, mv, proj)
    out = pipe.step(d, c, mv, proj)
    jax.block_until_ready(out.color)
    float(np.asarray(out.occupied_ratio))  # drain the remote queue

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        carry = jnp.float32(0.0)
        for i in range(args.steps):
            o = pipe.step(d + carry * 1e-8, c, mv, proj)
            carry = o.occupied_ratio + o.color[0, 0, 0]
        float(np.asarray(carry))
    return args.out


def _classify(long_name: str) -> str:
    """Map an HLO op (by its text/shape signature) to a pipeline stage.

    HLO names carry no Python provenance on this backend, but the shapes
    are unambiguous at the bench config: sensor-res ops are [*,424,512*],
    volume-res are [*,256,256,256], sweep planes are [*,512,512] inside
    the slab scan, the screen warp emits [rows,16,W*48], 720p compose is
    [720,1280,*].
    """
    s = long_name
    if "s32[848," in s or "= f32[24,512]" in s:
        return "brick-histogram"
    if ",16,6144]" in s or "16,6144]" in s:
        return "screen-warp"
    if "424" in s and "640" in s:
        return "registration"
    if "[424,16,512]" in s:
        return "bilateral"
    if "424,512]" in s:
        return "preprocess"
    if "256,256,256]" in s or "512,512,512]" in s:
        # a 512^3 volume also matches the sweep's "512,512]" plane
        # pattern — volume-shaped ops must classify FIRST
        if "custom-call" in s:
            return "integrate-kernel"
        if "broadcast" in s:
            return "volume-clear"
        if "copy" in s:
            return "volume-relayout"
        return "volume-misc"
    if "512,512]" in s:
        return "sweep"
    if "720,1280" in s or "[360,768" in s or "[180,384" in s:
        return "render/holefill"
    return "other"


def parse(trace_dir: str, steps: int):
    files = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not files:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
            if e.get("name") == "thread_name":
                tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")

    # TPU traces nest: the "XLA Modules" line holds one event per executable
    # (its duration IS the fused ms/frame); the "XLA Ops" line nests
    # while/cond regions around their body ops. Flat sums double-count, so
    # compute SELF time with an interval stack (events sorted by start,
    # ties broken longest-first so parents precede children).
    ops = [e for e in events
           if e.get("ph") == "X"
           and "TPU" in str(pid_names.get(e["pid"], ""))
           and tid_names.get((e["pid"], e.get("tid"))) == "XLA Ops"]
    mods = [e for e in events
            if e.get("ph") == "X"
            and "TPU" in str(pid_names.get(e["pid"], ""))
            and tid_names.get((e["pid"], e.get("tid"))) == "XLA Modules"]
    mod_total = sum(e.get("dur", 0) for e in mods) / 1e3
    ops.sort(key=lambda e: (e["ts"], -e["dur"]))

    stack = []
    self_t = collections.Counter()
    cnt = collections.Counter()
    long_of = {}
    for e in ops:
        ts, dur, name = e["ts"], e["dur"], e["name"]
        while stack and ts >= stack[-1][0] + stack[-1][1] - 1e-9:
            stack.pop()
        if stack:
            self_t[stack[-1][2]] -= dur
        self_t[name] += dur
        cnt[name] += 1
        a = e.get("args", {}) or {}
        long_of[name] = a.get("long_name") or a.get("hlo_op") or name
        stack.append((ts, dur, name))

    total = sum(self_t.values()) / 1e3
    print(f"== module total {mod_total/steps:.2f} ms/frame; "
          f"op self-time {total/steps:.2f} ms/frame ==")
    for name, d in self_t.most_common(30):
        print(f"{d/steps/1e3:8.3f} ms/frame x{cnt[name]//steps:4d}  "
              f"[{_classify(long_of[name]):15s}] {long_of[name][:95]}")
    buckets = collections.Counter()
    for name, d in self_t.items():
        buckets[_classify(long_of[name])] += d
    print("\n== stage buckets (ms/frame) ==")
    for b, dur in buckets.most_common():
        print(f"{dur/steps/1e3:8.3f}  {b}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tsdf", type=int, default=256)
    ap.add_argument("--sensors", type=int, default=4)
    ap.add_argument("--render", default="1280x720")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/trace_fused")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        capture(args)
    parse(args.out, args.steps)


if __name__ == "__main__":
    main()
