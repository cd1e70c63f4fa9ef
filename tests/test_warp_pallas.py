"""Pallas screen-warp kernel vs the XLA blocked oracle (interpret mode)."""
import numpy as np
import jax.numpy as jnp

from rgbd_recon_tpu.ops.warp import sample2d_blocked_px
from rgbd_recon_tpu.ops.warp_pallas import warp_screen_pallas


def test_warp_pallas_matches_blocked(rng):
    ti, si, c = 128, 128, 9
    h, w = 96, 128
    img = rng.random((ti, si, c)).astype(np.float32)
    # smooth screen->source map (homography-like) + clamped borders
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    fy = np.clip(ys * ti / h * (1.0 + 0.1 * xs / w) - 3.0, 0, ti - 1)
    fx = np.clip(xs * si / w * (1.0 + 0.08 * ys / h) - 2.0, 0, si - 1)
    fy = fy.astype(np.float32)
    fx = fx.astype(np.float32)

    ref = sample2d_blocked_px(
        jnp.asarray(img), jnp.asarray(fy), jnp.asarray(fx),
        tile=(8, 32), window=(48, 64), precise_channels=(1,),
    )
    got = warp_screen_pallas(
        jnp.asarray(img), jnp.asarray(fy), jnp.asarray(fx),
        tile=(8, 128), precise_channels=(1,), interpret=True,
    )
    ref = np.asarray(ref)
    got = np.asarray(got)
    d = np.abs(ref - got)
    # window placements differ (x-blocks vs centered) — interior samples
    # must agree to bf16 matmul tolerance, the precise channel tighter
    assert np.percentile(d, 99.5) < 2e-2, np.percentile(d, 99.5)
    assert np.percentile(d[..., 1], 99.5) < 2e-3, np.percentile(d[..., 1], 99.5)
