"""LAB conversion vs a scalar oracle transcribed from inc_color.glsl."""
import numpy as np
import jax.numpy as jnp

from rgbd_recon_tpu.ops.colors import rgb_to_lab


def oracle_rgb_to_lab(rgb):
    def pivot_rgb(n):
        return (((n + 0.055) / 1.055) ** 2.4 if n > 0.04045 else n / 12.92) * 100.0

    def pivot_xyz(n):
        return n ** (1.0 / 3.0) if n > 0.008856 else (903.3 * n + 16.0) / 116.0

    r, g, b = (pivot_rgb(c / 255.0) for c in rgb)
    x = r * 0.4124 + g * 0.3576 + b * 0.1805
    y = r * 0.2126 + g * 0.7152 + b * 0.0722
    z = r * 0.0193 + g * 0.1192 + b * 0.9505
    white = [95.047, 100.0, 108.883]
    px, py, pz = (pivot_xyz(c / w) for c, w in zip((x, y, z), white))
    return np.array([max(0.0, 116 * py - 16), 500 * (px - py), 200 * (py - pz)])


def test_rgb_to_lab_matches_glsl_oracle(rng):
    cols = rng.uniform(0.0, 1.0, size=(20, 3)).astype(np.float32)
    got = np.asarray(rgb_to_lab(jnp.asarray(cols)))
    want = np.stack([oracle_rgb_to_lab(c) for c in cols])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
