"""Offline inverse-calibration bake (the ``calib_inverter`` tool).

≙ CalibrationInverter (framework/calibration/calibration_inverter.cpp:12-143
+ source/calib_inverter.cpp:12-73): for every voxel of a bbox grid, find the
8 nearest samples of the forward cv_xyz volume (CGAL kd-tree in the
reference) and inverse-distance-weight their (x, y, z) grid indices
(:55-67); +half-voxel offset, normalized by the forward volume dims (:101);
voxels outside the sensor frustum get fvec4(-1) (:95-98).

TPU-native search: instead of a kd-tree, a two-level blocked brute force.
Forward-volume samples are grouped into 8^3-sample cells; per 4^3-voxel
target block the nearest cells are preselected by centroid distance (small
matmul), then exact 8-NN runs against just those cells' samples — distance
cross-terms as MXU matmuls (|p-q|^2 = |p|^2 + |q|^2 - 2 p.q) and
``jax.lax.top_k`` for selection. No data-dependent structures, fully jitted.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.math import Bbox
from .volume import CalibrationVolume
from .frustum import Frustum

CELL = 8          # forward samples per cell edge
TBLOCK = 4        # target voxels per block edge
NUM_CELLS = 12    # candidate cells per target block
K_NN = 8          # calibration_inverter.cpp:99


def _cellify(samples: np.ndarray):
    """Group forward samples [Dz, Dy, Dx, 3] into cells: returns
    (cells [C, CELL^3, 3], cell index grids, centroids [C, 3]).
    Pads the volume up to CELL multiples by repeating edge samples (their
    duplicated positions never win a strict NN against interior ones)."""
    dz, dy, dx, _ = samples.shape
    pz = (-dz) % CELL
    py = (-dy) % CELL
    px = (-dx) % CELL
    padded = np.pad(samples, ((0, pz), (0, py), (0, px), (0, 0)), mode="edge")
    # carry each sample's (x, y, z) grid index along (the IDW target values)
    zz, yy, xx = np.meshgrid(
        np.arange(dz), np.arange(dy), np.arange(dx), indexing="ij"
    )
    idx = np.stack([xx, yy, zz], axis=-1).astype(np.float32)
    idx = np.pad(idx, ((0, pz), (0, py), (0, px), (0, 0)), mode="edge")

    def to_cells(a):
        gz, gy, gx = a.shape[0] // CELL, a.shape[1] // CELL, a.shape[2] // CELL
        a = a.reshape(gz, CELL, gy, CELL, gx, CELL, 3)
        return a.transpose(0, 2, 4, 1, 3, 5, 6).reshape(gz * gy * gx, CELL**3, 3)

    cells = to_cells(padded)
    cell_idx = to_cells(idx)
    centroids = cells.mean(axis=1)
    return cells, cell_idx, centroids


def _invert_blocks(cells, cell_idx, centroids, targets):
    """targets [N, TBLOCK^3, 3] blocks -> IDW index [N, TBLOCK^3, 3]."""

    def one_block(tgt):
        center = tgt.mean(axis=0)
        d2c = jnp.sum((centroids - center) ** 2, axis=-1)
        _, cand = jax.lax.top_k(-d2c, NUM_CELLS)
        cand_samples = cells[cand].reshape(-1, 3)       # [NUM_CELLS*512, 3]
        cand_indices = cell_idx[cand].reshape(-1, 3)
        # pairwise distances via matmul cross-term
        cross = jnp.dot(tgt, cand_samples.T, preferred_element_type=jnp.float32)
        d2 = (
            jnp.sum(tgt**2, -1, keepdims=True)
            + jnp.sum(cand_samples**2, -1)[None, :]
            - 2.0 * cross
        )
        _, nn = jax.lax.top_k(-d2, K_NN)                # [T3, 8]
        nn_pos = cand_samples[nn]                       # [T3, 8, 3]
        nn_idx = cand_indices[nn]
        dist = jnp.linalg.norm(tgt[:, None, :] - nn_pos, axis=-1)
        w = 1.0 / jnp.maximum(dist, 1e-12)              # inverseDistance (:55-67)
        return jnp.sum(w[..., None] * nn_idx, axis=1) / jnp.sum(w, axis=1)[..., None]

    return jax.lax.map(one_block, targets)


class CalibrationInverter:
    """Drop-in equivalent of the reference class (same outputs on disk)."""

    def __init__(self, calib_volume_files: list[str], bbox: Bbox):
        self.bbox = bbox
        self.cv_xyz_names: list[str] = []
        self.volumes: list[CalibrationVolume] = []
        self.frustums: list[Frustum] = []
        for f in calib_volume_files:
            name = f[:-3] + "cv_xyz"  # calibration_inverter.cpp:17-21
            self.cv_xyz_names.append(name)
            vol = CalibrationVolume.read(name, 3)
            self.volumes.append(vol)
            self.frustums.append(Frustum(vol.corner_points()))
        self.inverted: list[CalibrationVolume] = []

    @classmethod
    def from_volumes(cls, volumes: list[CalibrationVolume], bbox: Bbox):
        self = cls.__new__(cls)
        self.bbox = bbox
        self.cv_xyz_names = [f"sensor{i}.cv_xyz" for i in range(len(volumes))]
        self.volumes = list(volumes)
        self.frustums = [Frustum(v.corner_points()) for v in volumes]
        self.inverted = []
        return self

    def calculate_inverse_volumes(self, volume_res) -> None:
        """≙ calculateInverseVolumes (calibration_inverter.cpp:68-115)."""
        rx, ry, rz = (int(v) for v in volume_res)
        size = self.bbox.size.astype(np.float64)
        step = size / np.array([rx, ry, rz])
        start = self.bbox.min.astype(np.float64) + step * 0.5  # half-voxel (:76-77)
        xs = start[0] + step[0] * np.arange(rx)
        ys = start[1] + step[1] * np.arange(ry)
        zs = start[2] + step[2] * np.arange(rz)
        zz, yy, xx = np.meshgrid(zs, ys, xs, indexing="ij")
        pts = np.stack([xx, yy, zz], axis=-1).astype(np.float32)  # [rz, ry, rx, 3]

        # blocks of TBLOCK^3 voxels (pad to multiples)
        pz, py, px = ((-rz) % TBLOCK), ((-ry) % TBLOCK), ((-rx) % TBLOCK)
        ppts = np.pad(pts, ((0, pz), (0, py), (0, px), (0, 0)), mode="edge")
        bz, by, bx = (ppts.shape[0] // TBLOCK, ppts.shape[1] // TBLOCK, ppts.shape[2] // TBLOCK)
        blocks = (
            ppts.reshape(bz, TBLOCK, by, TBLOCK, bx, TBLOCK, 3)
            .transpose(0, 2, 4, 1, 3, 5, 6)
            .reshape(-1, TBLOCK**3, 3)
        )

        self.inverted = []
        for vol, frustum in zip(self.volumes, self.frustums):
            cells, cell_idx, centroids = _cellify(vol.volume)
            dims = vol.res.astype(np.float32)  # (x, y, z)
            run = jax.jit(
                lambda t: _invert_blocks(
                    jnp.asarray(cells), jnp.asarray(cell_idx),
                    jnp.asarray(centroids), t,
                )
            )
            widx = np.asarray(run(jnp.asarray(blocks)))  # [N, T3, 3]
            widx = (
                widx.reshape(bz, by, bx, TBLOCK, TBLOCK, TBLOCK, 3)
                .transpose(0, 3, 1, 4, 2, 5, 6)
                .reshape(bz * TBLOCK, by * TBLOCK, bx * TBLOCK, 3)
            )[:rz, :ry, :rx]
            # (index + 0.5) / dims (calibration_inverter.cpp:101)
            out = (widx + 0.5) / dims[None, None, None, :]
            out4 = np.concatenate([out, np.ones_like(out[..., :1])], axis=-1)
            inside = frustum.inside(pts)  # frustum cull (:95-98)
            out4 = np.where(inside[..., None], out4, -1.0).astype(np.float32)
            self.inverted.append(
                CalibrationVolume(
                    np.array([rx, ry, rz], np.uint32),
                    np.array([0.5, 4.5], np.float32),  # (:113)
                    out4,
                )
            )

    def write_inverse_volumes(self, path: str) -> None:
        """≙ writeInverseVolumes (calibration_inverter.cpp:29-36)."""
        import os

        for name, vol in zip(self.cv_xyz_names, self.inverted):
            out = os.path.join(path, os.path.basename(name) + "_inv")
            print(f"writing to file {out}")
            vol.write(out)
