"""Channel-paired window layout (tsdf_pallas.pack_pairs /
expand_xblocks_pairs) vs direct indexing, and the window-origin contract
the persistent kernels rely on (VERDICT r4 #1 integrate redesign).

The kernels (ops/tsdf_persist.py, ops/tsdf_dense.py) read
``packed[k, xb, g, y0:y0+WY, :]`` and expect lane l of group g to hold
channel ``2g + l // 64`` at pixel ``x = xb*XSTRIDE2 + l % 64`` — a silent
layout mismatch would corrupt every sampled value, so the mapping is
pinned here element-exactly.
"""
import numpy as np
import jax.numpy as jnp

from rgbd_recon_tpu.ops.tsdf_pallas import (
    WX2, XSTRIDE2, expand_xblocks_pairs, expand_xblocks_quads, pack_pairs,
)
from rgbd_recon_tpu.ops.tsdf_affine import win_offsets_affine


def test_pack_pairs_channels():
    rng = np.random.default_rng(1)
    k, h, w = 2, 24, 40
    packed = rng.uniform(0.0, 1.0, (k, h, w, 6)).astype(np.float32)
    ch8 = np.asarray(pack_pairs(jnp.asarray(packed)))
    assert ch8.shape == (k, 8, h, w)
    d = packed[..., 0]
    d_hi = np.floor(d * 256.0) / 256.0
    np.testing.assert_array_equal(ch8[:, 0], d_hi)
    np.testing.assert_allclose(ch8[:, 0] + ch8[:, 1], d, rtol=0, atol=1e-7)
    # order: (d_hi, d_lo, 1-sil, qual, r, g, b, 0) from packed
    # (d, qual, sil, r, g, b) — sil/qual swap positions, sil flips so the
    # bf16 sampling stage is exact near the gate margin (pack_pairs doc)
    np.testing.assert_array_equal(ch8[:, 2], 1.0 - packed[..., 2])
    np.testing.assert_array_equal(ch8[:, 3], packed[..., 1])
    for c in range(3):
        np.testing.assert_array_equal(ch8[:, 4 + c], packed[..., 3 + c])
    np.testing.assert_array_equal(ch8[:, 7], 0.0)


def test_expand_xblocks_pairs_mapping():
    rng = np.random.default_rng(2)
    k, h, w = 2, 23, 130   # deliberately unaligned h, w
    ch8 = rng.uniform(0.0, 1.0, (k, 8, h, w)).astype(np.float32)
    xb = np.asarray(expand_xblocks_pairs(jnp.asarray(ch8)))
    hp = -(-h // 8) * 8
    wp = -(-w // XSTRIDE2) * XSTRIDE2
    nxb = (wp - WX2) // XSTRIDE2 + 1
    assert xb.shape == (k, nxb, 4, hp, 2 * WX2)
    # edge padding ≙ GL CLAMP_TO_EDGE
    padded = np.pad(ch8, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)),
                    mode="edge")
    for j in (0, nxb // 2, nxb - 1):
        for g in range(4):
            for half in (0, 1):
                np.testing.assert_array_equal(
                    xb[:, j, g, :, half * WX2:(half + 1) * WX2],
                    padded[:, 2 * g + half, :,
                           j * XSTRIDE2:j * XSTRIDE2 + WX2],
                )


def test_expand_xblocks_quads_mapping():
    """Channel-QUADDED layout (the chip-legal half-tile x window): block j,
    plane p holds channel 4p + l // wx at pixel x = j*xstride + l % wx."""
    rng = np.random.default_rng(3)
    k, h, w, wx, xs = 2, 23, 130, 32, 8
    ch8 = rng.uniform(0.0, 1.0, (k, 8, h, w)).astype(np.float32)
    xb = np.asarray(expand_xblocks_quads(jnp.asarray(ch8), wx=wx, xstride=xs))
    hp = -(-h // 8) * 8
    wp = -(-w // xs) * xs
    nxb = (wp - wx) // xs + 1
    assert xb.shape == (k, nxb, 2, hp, 4 * wx)
    padded = np.pad(ch8, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)),
                    mode="edge")
    for j in (0, nxb // 2, nxb - 1):
        for p in range(2):
            for q in range(4):
                np.testing.assert_array_equal(
                    xb[:, j, p, :, q * wx:(q + 1) * wx],
                    padded[:, 4 * p + q, :, j * xs:j * xs + wx],
                )


def test_win_offsets_pairs_contract():
    """Origins must keep the window inside the padded image and be
    8-aligned in y (the kernels DMA at (po >> 16) * 8)."""

    class T:
        # center coefficients put footprints at the image corners and center
        coeffs = jnp.asarray(
            np.array([[[[0.0], [0.0], [0.5], [0.0]],
                       [[0.5], [0.5], [0.5], [0.0]],
                       [[1.0], [1.0], [0.5], [0.0]]]], np.float32)
        )  # [K=1, NB=3, 4, 1]

    h, w, wy = 212, 256, 48
    off = np.asarray(win_offsets_affine(T, h, w, wy, WX2, XSTRIDE2))
    assert off.shape == (1, 3, 2)
    hp = h  # yalign=8 keeps the legacy true-height clamp
    wp = -(-w // XSTRIDE2) * XSTRIDE2
    nxb = (wp - WX2) // XSTRIDE2 + 1
    for y8, xb in off[0]:
        assert 0 <= y8 <= hp - wy
        assert y8 % 8 == 0
        assert 0 <= xb < nxb
    # hull placement: the window COVERS the footprint's bilinear stencil
    # ([min - 1, max + 1]; a point footprint here) with the origin aligned
    # down from (min - 1)
    y_c, xb_c = off[0, 1]
    x_px = 0.5 * w - 0.5
    y_px = 0.5 * h - 0.5
    x0 = xb_c * XSTRIDE2
    assert x0 <= x_px - 1 and x0 + WX2 - 1 >= x_px + 1
    assert x0 > x_px - 1 - XSTRIDE2   # aligned DOWN, not merely below
    assert y_c <= y_px - 1 and y_c + wy - 1 >= y_px + 1
    assert y_c > y_px - 1 - 8
