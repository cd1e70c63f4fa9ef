"""Matmul-form inpaint downsample vs the 16-tap oracle."""
import numpy as np
import jax.numpy as jnp

from rgbd_recon_tpu.ops import inpaint


def _mk(h, w, rng, hole_frac=0.35):
    c = rng.random((h, w, 4)).astype(np.float32)
    c[..., 3] = (rng.random((h, w)) > hole_frac).astype(np.float32)
    d = (0.2 + 0.7 * rng.random((h, w))).astype(np.float32)
    # background pixels (depth 1) behind some holes
    bg = rng.random((h, w)) < 0.05
    d[bg] = 1.0
    return jnp.asarray(c), jnp.asarray(d)


def test_downsample_mm_matches_oracle(rng):
    for (h, w) in ((64, 96), (50, 70)):
        c, d = _mk(h, w, rng)
        co, do_ = inpaint.inpaint_downsample(c, d)
        cm, dm = inpaint.inpaint_downsample_mm(c, d)
        co, do_, cm, dm = map(np.asarray, (co, do_, cm, dm))
        # keep-set decisions may flip for taps within the hi/lo split noise
        # of the window average (~2^-16); color carries bf16 rounding
        same = np.isclose(co, cm, atol=6e-3).all(axis=-1) & np.isclose(
            do_, dm, atol=6e-3
        )
        assert same.mean() > 0.995, f"{(~same).mean():.3%} differ at {h}x{w}"
        # hole classification identical
        np.testing.assert_array_equal(co[..., 3] <= 0, cm[..., 3] <= 0)


def test_pyramid_mm_chain(rng):
    c, d = _mk(128, 128, rng)
    pc_a, pd_a = inpaint.build_pyramid(c, d, 4)
    pc_b, pd_b = inpaint.build_pyramid(c, d, 4, mm=True)
    assert len(pc_a) == len(pc_b)
    for a, b in zip(pc_a[1:], pc_b[1:]):
        same = np.isclose(np.asarray(a), np.asarray(b), atol=1e-2).all(axis=-1)
        assert same.mean() > 0.98


def test_colorfill_mm_matches_oracle(rng):
    c, d = _mk(96, 128, rng, hole_frac=0.5)
    pc, pd = inpaint.build_pyramid(c, d, 5)
    ref = np.asarray(inpaint.colorfill(pc, pd))
    got = np.asarray(inpaint.colorfill_mm(pc, pd))
    hole = np.asarray(pc[0][..., 3] <= 0.0)
    bg = hole & (np.asarray(pd[0]) >= 1.0)
    # non-hole and background pixels pass c0 through exactly
    np.testing.assert_array_equal(ref[~hole], got[~hole])
    np.testing.assert_array_equal(ref[bg], got[bg])
    # filled pixels: same blend fields resolved on coarser grids — smooth
    # deviation only
    fill = hole & ~bg
    if fill.any():
        dv = np.abs(ref[fill][:, :3] - got[fill][:, :3])
        assert np.median(dv) < 0.06, np.median(dv)
        assert (dv < 0.25).mean() > 0.9, (dv < 0.25).mean()
