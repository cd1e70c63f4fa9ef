"""GL sampling semantics vs scalar numpy oracle."""
import numpy as np
import jax.numpy as jnp

from rgbd_recon_tpu.ops.sample import sample2d, sample3d, pixel_texcoords


def oracle_linear_1d(t, n):
    c = np.clip(t * n - 0.5, 0.0, n - 1)
    i0 = int(np.floor(c))
    f = c - i0
    i1 = min(i0 + 1, n - 1)
    return i0, i1, f


def oracle_sample2d(img, s, t):
    h, w, _ = img.shape
    x0, x1, fx = oracle_linear_1d(s, w)
    y0, y1, fy = oracle_linear_1d(t, h)
    top = img[y0, x0] * (1 - fx) + img[y0, x1] * fx
    bot = img[y1, x0] * (1 - fx) + img[y1, x1] * fx
    return top * (1 - fy) + bot * fy


def test_sample2d_matches_oracle(rng):
    img = rng.standard_normal((7, 9, 3)).astype(np.float32)
    pts = rng.uniform(-0.2, 1.2, size=(50, 2)).astype(np.float32)
    got = np.asarray(sample2d(jnp.asarray(img), jnp.asarray(pts)))
    want = np.stack([oracle_sample2d(img, s, t) for s, t in pts])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sample2d_texel_centers_identity(rng):
    img = rng.standard_normal((6, 8, 2)).astype(np.float32)
    uv = pixel_texcoords(6, 8).reshape(-1, 2)
    got = np.asarray(sample2d(jnp.asarray(img), uv)).reshape(6, 8, 2)
    np.testing.assert_allclose(got, img, atol=1e-6)
    got_n = np.asarray(sample2d(jnp.asarray(img), uv, method="nearest")).reshape(6, 8, 2)
    np.testing.assert_allclose(got_n, img, atol=0)


def test_sample3d_matches_analytic_trilinear(rng):
    # a volume that is linear in (x, y, z) is reproduced exactly by
    # trilinear sampling away from the clamped border
    d, h, w = 8, 6, 10
    zz, yy, xx = np.meshgrid(
        np.arange(d), np.arange(h), np.arange(w), indexing="ij"
    )
    vol = (1.5 * xx - 0.7 * yy + 0.3 * zz)[..., None].astype(np.float32)
    pts = rng.uniform(0.15, 0.85, size=(40, 3)).astype(np.float32)
    got = np.asarray(sample3d(jnp.asarray(vol), jnp.asarray(pts)))[:, 0]
    cx = pts[:, 0] * w - 0.5
    cy = pts[:, 1] * h - 0.5
    cz = pts[:, 2] * d - 0.5
    want = 1.5 * cx - 0.7 * cy + 0.3 * cz
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_sample_clamp_to_edge(rng):
    img = rng.standard_normal((4, 5, 1)).astype(np.float32)
    got = np.asarray(sample2d(jnp.asarray(img), jnp.asarray([[-3.0, -3.0]])))
    np.testing.assert_allclose(got[0, 0], img[0, 0, 0], atol=1e-6)
    got = np.asarray(sample2d(jnp.asarray(img), jnp.asarray([[5.0, 5.0]])))
    np.testing.assert_allclose(got[0, 0], img[-1, -1, 0], atol=1e-6)


def test_nearest_semantics():
    img = np.arange(8, dtype=np.float32).reshape(1, 8, 1)
    # t = 0.25 in an 8-wide texture -> floor(0.25*8) = texel 2
    got = np.asarray(sample2d(jnp.asarray(img), jnp.asarray([[0.25, 0.5]]), method="nearest"))
    assert got[0, 0] == 2.0
