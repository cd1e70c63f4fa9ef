"""Brick grid: occupancy marking and sparsity bookkeeping.

TPU re-expression of the reference's SSBO brick machinery
(glsl/inc_bricks.glsl:10-62, recon_integration.cpp:360-406 ``divideBox``,
:430-445 ``updateOccupiedBricks``): the GLSL ``atomicAdd`` per depth pixel
becomes a deterministic ``scatter-add``; the GPU->CPU occupancy readback +
CPU-filtered index list becomes a device-resident boolean mask (no host sync),
which downstream stages consume as a masked dense grid — static shapes, no
data-dependent control flow.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..utils.math import Bbox


class BrickGrid(NamedTuple):
    """Static brick-grid geometry (host side; shapes must be static)."""

    res: tuple[int, int, int]   # (bx, by, bz) brick counts per axis
    brick_size: float           # snapped to a voxel multiple
    bbox_min: np.ndarray
    bbox_max: np.ndarray

    @property
    def num_bricks(self) -> int:
        bx, by, bz = self.res
        return bx * by * bz


def make_brick_grid(bbox: Bbox, brick_size: float, voxel_size: float) -> BrickGrid:
    """Brick size snaps to a voxel multiple (recon_integration.cpp:462-464)
    and the grid covers the bbox with ceil division (divideBox loop)."""
    snapped = voxel_size * max(1.0, round(brick_size / voxel_size))
    size = bbox.size
    res = tuple(int(np.ceil(float(s) / snapped)) for s in size)
    return BrickGrid(res, float(snapped), bbox.min, bbox.max)


def mark_bricks(
    world: jnp.ndarray,
    valid: jnp.ndarray,
    grid: BrickGrid,
) -> jnp.ndarray:
    """``mark_brick`` (inc_bricks.glsl:40-58) over all valid depth pixels.

    world: f32[..., 3] world positions; valid: bool[...]. Returns per-brick
    pixel counts u32[bz, by, bx] (z-major like ``get_id``,
    inc_bricks.glsl:26-28).
    """
    bx, by, bz = grid.res
    res = jnp.array([bx, by, bz], jnp.int32)
    bmin = jnp.asarray(grid.bbox_min)
    bsize = jnp.float32(grid.brick_size)

    pos = world.reshape(-1, 3)
    v = valid.reshape(-1)

    index = jnp.floor((pos - bmin) / bsize).astype(jnp.int32)
    index = jnp.clip(index, 0, res - 1)

    # closest-neighbor brick co-marking (inc_bricks.glsl:42-52)
    center = bmin + (index.astype(jnp.float32) + 0.5) * bsize
    diff = pos - center
    d_abs = jnp.abs(diff)
    min_v = jnp.max(d_abs, axis=-1, keepdims=True)
    min_c = (d_abs >= min_v).astype(jnp.float32)
    offset = jnp.sign(diff * min_c).astype(jnp.int32)
    neighbor = jnp.clip(index + offset, 0, res - 1)
    # the reference gates the neighbor increment on d_abs.x (inc_bricks.glsl:52)
    neighbor_inc = (d_abs[:, 0] > bsize * 0.1) & v

    def flat_id(idx):
        return (idx[:, 2] * by + idx[:, 1]) * bx + idx[:, 0]

    counts = jnp.zeros(bx * by * bz, jnp.uint32)
    ids = jnp.concatenate([flat_id(index), flat_id(neighbor)])
    incs = jnp.concatenate(
        [v.astype(jnp.uint32), neighbor_inc.astype(jnp.uint32)]
    )
    counts = counts.at[ids].add(incs)  # one fused scatter-add
    return counts.reshape(bz, by, bx)


def occupancy_mask(counts: jnp.ndarray, min_voxels: int = 10) -> jnp.ndarray:
    """bool[bz, by, bx] — reference threshold ``>= m_min_voxels_per_brick``
    (recon_integration.cpp:434-439, default 10)."""
    return counts >= jnp.uint32(min_voxels)


def occupied_ratio(mask: jnp.ndarray) -> jnp.ndarray:
    """≙ ReconIntegration::occupiedRatio (recon_integration.cpp:441)."""
    return jnp.mean(mask.astype(jnp.float32))


def _axis_brick_index(grid: BrickGrid, n_vox: int, axis: int) -> np.ndarray:
    """Host-side: brick index of each voxel center along one axis (x=0)."""
    size = float(grid.bbox_max[axis] - grid.bbox_min[axis])
    centers = (np.arange(n_vox) + 0.5) / n_vox * size
    return np.clip(
        (centers / grid.brick_size).astype(np.int32), 0, grid.res[axis] - 1
    )


def voxel_occupancy(mask: jnp.ndarray, grid: BrickGrid, vol_res: tuple[int, int, int]) -> jnp.ndarray:
    """Expand the brick mask to per-voxel bool[Vz, Vy, Vx]: voxel centers that
    fall in an occupied brick (the masked-integration analogue of the
    reference's per-occupied-brick VolumeSampler draws,
    recon_integration.cpp:254-259). vol_res is (vx, vy, vz).

    Separable nearest upsample as three tiny one-hot matmuls — a plain
    ``mask[ix_(iz, iy, ix)]`` gather costs >200 ms at 256^3 on TPU; the
    matmul form is bandwidth-bound (<5 ms)."""
    vx, vy, vz = vol_res
    bx, by, bz = grid.res

    def onehot(idx, n):
        return jnp.asarray(
            (idx[:, None] == np.arange(n)[None, :]).astype(np.float32)
        )

    oz = onehot(_axis_brick_index(grid, vz, 2), bz)   # [vz, bz]
    oy = onehot(_axis_brick_index(grid, vy, 1), by)
    ox = onehot(_axis_brick_index(grid, vx, 0), bx)
    m = mask.astype(jnp.float32)
    m = jnp.einsum("Zb,byx->Zyx", oz, m, preferred_element_type=jnp.float32)
    m = jnp.einsum("Yb,Zby->ZYy", oy, m, preferred_element_type=jnp.float32)
    m = jnp.einsum("Xb,ZYb->ZYX", ox, m, preferred_element_type=jnp.float32)
    return m > 0.5


def block_occupancy(
    mask: jnp.ndarray, grid: BrickGrid, vol_res: tuple[int, int, int],
    block: int = 16,
) -> jnp.ndarray:
    """Direct brick-grid -> voxel-block mask: block (i, j, k) of
    ``block``^3 voxels is occupied iff ANY of its voxel centers lies in an
    occupied brick. Equals ``tsdf_fast.brick16_mask(voxel_occupancy(...))``
    without materializing the voxel grid (the fast path only ever consumes
    the block mask)."""
    vx, vy, vz = vol_res
    bx, by, bz = grid.res

    def cover(n_vox, axis, nb):
        idx = _axis_brick_index(grid, n_vox, axis).reshape(n_vox // block, block)
        m = np.zeros((n_vox // block, nb), np.float32)
        np.put_along_axis(m, idx, 1.0, axis=1)
        return jnp.asarray(m)

    cz = cover(vz, 2, bz)   # [vz/block, bz]
    cy = cover(vy, 1, by)
    cx = cover(vx, 0, bx)
    m = mask.astype(jnp.float32)
    m = jnp.einsum("Zb,byx->Zyx", cz, m, preferred_element_type=jnp.float32)
    m = jnp.einsum("Yb,Zby->ZYy", cy, m, preferred_element_type=jnp.float32)
    m = jnp.einsum("Xb,ZYb->ZYX", cx, m, preferred_element_type=jnp.float32)
    return m > 0.5
