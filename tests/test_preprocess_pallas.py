"""Pallas bilateral accumulator vs the scan oracle (interpret mode)."""
import numpy as np
import jax.numpy as jnp

from rgbd_recon_tpu.ops.preprocess_pallas import bilateral_accum_pallas, KS, MAX_DEPTH_M


def _scan_oracle(depth_m, limits):
    """The lax.scan formulation from preprocess.bilateral_lab (f32)."""
    kk, h, w = depth_m.shape
    cv_min = limits[:, 0][:, None, None]
    cv_max = limits[:, 1][:, None, None]
    drm = 0.35 * (depth_m / MAX_DEPTH_M)
    pad = np.pad(depth_m, ((0, 0), (KS, KS), (KS, KS)), mode="edge")
    bf = np.zeros_like(depth_m)
    wa = np.zeros_like(depth_m)
    wr = np.zeros_like(depth_m)
    for dy in range(-KS, KS + 1):
        for dx in range(-KS, KS + 1):
            s = pad[:, KS + dy:KS + dy + h, KS + dx:KS + dx + w]
            dist = np.abs(s - depth_m)
            accept = (s >= cv_min) & (s <= cv_max) & (dist <= drm)
            gs = 1.0 - np.sqrt(dx * dx + dy * dy) / KS
            gr = 1.0 - np.minimum(dist, drm) / np.maximum(drm, 1e-20)
            ws = gs * gr
            bf += np.where(accept, ws * s, 0.0)
            wa += np.where(accept, ws, 0.0)
            wr += np.where(accept, gr, 0.0)
    return bf, wa, wr


def test_bilateral_pallas_matches_scan(rng):
    kk, h, w = 2, 48, 96
    depth = (0.6 + 3.0 * rng.random((kk, h, w))).astype(np.float32)
    depth[rng.random((kk, h, w)) < 0.1] = 0.0      # invalid pixels
    limits = np.array([[0.5, 4.5], [0.5, 4.5]], np.float32)
    want = _scan_oracle(depth, limits)
    got = bilateral_accum_pallas(jnp.asarray(depth), jnp.asarray(limits),
                                 interpret=True)
    for g, wnt, name in zip(got, want, ("depth_bf", "w_acc", "w_range")):
        np.testing.assert_allclose(np.asarray(g), wnt, atol=2e-4, rtol=2e-5,
                                   err_msg=name)
