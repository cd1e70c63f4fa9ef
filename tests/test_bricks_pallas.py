"""Matmul-histogram brick marking vs the scatter-add oracle (exact)."""
import numpy as np
import jax.numpy as jnp

from rgbd_recon_tpu.utils.math import Bbox
from rgbd_recon_tpu.ops import bricks as brick_ops
from rgbd_recon_tpu.ops.bricks_pallas import histogram_matmul, mark_bricks_pallas


def test_histogram_matmul_exact(rng):
    bz, byx = 20, 440
    ids = jnp.asarray(rng.integers(0, bz * byx, size=10_000, dtype=np.int32))
    w = jnp.asarray(rng.integers(0, 2, size=10_000).astype(np.float32))
    got = np.asarray(histogram_matmul(ids, w, bz, byx, interpret=True))
    want = np.zeros((bz * byx,), np.float32)
    np.add.at(want, np.asarray(ids), np.asarray(w))
    assert np.array_equal(got.reshape(-1), want)


def test_mark_bricks_pallas_matches_scatter(rng):
    bbox = Bbox.default()
    grid = brick_ops.make_brick_grid(bbox, 0.1, 0.01)
    n = 40_000
    world = jnp.asarray(
        bbox.min + rng.random((2, n // 2, 3)).astype(np.float32) * bbox.size
    )
    valid = jnp.asarray(rng.random((2, n // 2)) > 0.3)
    want = np.asarray(brick_ops.mark_bricks(world, valid, grid))
    got = np.asarray(mark_bricks_pallas(world, valid, grid, interpret=True))
    assert np.array_equal(got, want)
