"""Per-stage timing on the live device (run directly on TPU)."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rgbd_recon_tpu.utils.math import Bbox
from rgbd_recon_tpu.calibration import synthetic
from rgbd_recon_tpu.ops import preprocess as pp
from rgbd_recon_tpu.ops import tsdf as tsdf_ops
from rgbd_recon_tpu.ops import bricks as brick_ops
from rgbd_recon_tpu.ops import raymarch as rm
from rgbd_recon_tpu.ops import inpaint
from rgbd_recon_tpu.utils.math import look_at, perspective

TSDF_N = int(os.environ.get("P_TSDF", "128"))
K = int(os.environ.get("P_SENSORS", "4"))
RW, RH = (int(v) for v in os.environ.get("P_RENDER", "640x360").split("x"))
ITERS = int(os.environ.get("P_ITERS", "3"))

bbox = Bbox.default()
rig, cams = synthetic.synthetic_rig(
    num_sensors=K, bbox=bbox, fwd_res=(64, 128, 64), inv_res=(64, 64, 64),
    width=512, height=424,
)
scene = synthetic.SphereScene.default(bbox)
depth, color = synthetic.render_frames(cams, scene)
d = jnp.asarray(depth)
c = jnp.asarray(color)

cfg = tsdf_ops.TsdfConfig((TSDF_N,) * 3, 0.01)
grid = brick_ops.make_brick_grid(bbox, 0.1, float(np.max(bbox.size) / TSDF_N))
center = (bbox.min + bbox.max) * 0.5
eye = center + np.array([1.5, 0.8, 2.2], np.float32)
mv = jnp.asarray(look_at(eye, center, [0, 1, 0]))
proj = jnp.asarray(perspective(50.0, RW / RH, 0.1, 200.0))
cam = rm.RenderCamera(mv, proj, RW, RH)
bsz_vol = grid.brick_size / float(np.max(bbox.size))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.time()
    out = f(*args)
    jax.block_until_ready(out)
    compile_t = time.time() - t0
    t0 = time.time()
    for _ in range(ITERS):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / ITERS * 1e3
    print(f"{name:24s} {dt:9.1f} ms   (compile {compile_t:.1f}s)")
    return out


frames = timeit("preprocess", lambda d_, c_: pp.preprocess(d_, c_, rig), d, c)
counts = timeit("mark_bricks", lambda f: brick_ops.mark_bricks(f.world, f.world_valid, grid), frames)
mask = brick_ops.occupancy_mask(counts, 10)
vox_mask = brick_ops.voxel_occupancy(mask, grid, cfg.res)
vol = timeit("integrate", lambda f, m: tsdf_ops.integrate(f, rig, cfg, m), frames, vox_mask)
cvol = timeit("integrate_colors", lambda f, m: tsdf_ops.integrate_colors(f, rig, cfg, m), frames, vox_mask)
res = timeit("march(dense)", lambda v: rm.march(v, cam, bbox, cfg.limit), vol)
res = timeit(
    "march(skip)",
    lambda v, m: rm.march(v, cam, bbox, cfg.limit, brick_mask=m, brick_size_vol=bsz_vol),
    vol, mask,
)
out = timeit(
    "render(full)",
    lambda v, cv, f, m: rm.render(v, cv, f, rig, cam, bbox, cfg.limit, brick_mask=m, brick_size_vol=bsz_vol),
    vol, cvol, frames, mask,
)
filled = timeit(
    "holefill",
    lambda o: inpaint.colorfill(*inpaint.build_pyramid(o.color, o.depth, 6)),
    out,
)
print("hit frac", float(np.asarray(out.hit).mean()))
