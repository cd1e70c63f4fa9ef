"""RigCalibration — the whole sensor model as one pytree of stacked arrays.

Replaces the reference's CalibrationFiles + CalibVolumes pair
(framework/calibration/calibration_files.hpp:11-46, CalibVolumes.hpp:21-82):
instead of binding per-sensor GL 3D textures to texture units, we stack the K
per-sensor lookup volumes on a leading axis so every pipeline stage can vmap
over sensors.

Conventions (see ops/sample.py):
  cv_xyz      f32[K, Dz, Dy, Dx, 3]   sensor (u, v, d_norm) -> world xyz
  cv_uv       f32[K, Dz, Dy, Dx, 2]   sensor (u, v, d_norm) -> color texcoord
  cv_xyz_inv  f32[K, Vz, Vy, Vx, 3]   volume-normalized world -> (u, v, d_norm)
  depth_limits f32[K, 2]              (cv_min_ds, cv_max_ds) per sensor
"""
from __future__ import annotations

import os
from typing import NamedTuple, Sequence

import numpy as np
import jax.numpy as jnp

from ..utils.math import Bbox
from .volume import CalibrationVolume
from .frustum import Frustum


class RigCalibration(NamedTuple):
    cv_xyz: jnp.ndarray        # f32[K, Dz, Dy, Dx, 3]
    cv_uv: jnp.ndarray         # f32[K, Dz, Dy, Dx, 2]
    cv_xyz_inv: jnp.ndarray    # f32[K, Vz, Vy, Vx, 3]
    depth_limits: jnp.ndarray  # f32[K, 2]
    camera_positions: jnp.ndarray  # f32[K, 3]
    bbox_min: jnp.ndarray      # f32[3]
    bbox_max: jnp.ndarray      # f32[3]

    @property
    def num_sensors(self) -> int:
        return self.cv_xyz.shape[0]

    @property
    def bbox(self) -> Bbox:
        return Bbox(np.asarray(self.bbox_min), np.asarray(self.bbox_max))


def build_rig(
    volumes_xyz: Sequence[CalibrationVolume],
    volumes_uv: Sequence[CalibrationVolume],
    volumes_inv: Sequence[CalibrationVolume],
    bbox: Bbox,
) -> RigCalibration:
    """Stack per-sensor volumes; camera positions come from the frustum
    corner-ray estimate exactly like CalibVolumes.cpp:224-230."""
    cam_pos = np.stack(
        [Frustum(v.corner_points()).camera_position() for v in volumes_xyz]
    )
    limits = np.stack([v.depth_limits for v in volumes_xyz]).astype(np.float32)
    return RigCalibration(
        cv_xyz=jnp.stack([jnp.asarray(v.volume) for v in volumes_xyz]),
        cv_uv=jnp.stack([jnp.asarray(v.volume) for v in volumes_uv]),
        # the inverse bake stores fvec4 (calibration_inverter.cpp:87); the
        # shaders only read .xyz (tsdf_integration.vs:31)
        cv_xyz_inv=jnp.stack([jnp.asarray(v.volume[..., :3]) for v in volumes_inv]),
        depth_limits=jnp.asarray(limits),
        camera_positions=jnp.asarray(cam_pos),
        bbox_min=jnp.asarray(bbox.min),
        bbox_max=jnp.asarray(bbox.max),
    )


def load_rig(calib_files: Sequence[str], bbox: Bbox, inv_path: str | None = None) -> RigCalibration:
    """Load a rig from reference-format assets.

    ``calib_files`` are the ``.yml`` paths listed in the ``.ks`` scene file;
    the binary volumes live next to them with the ``.yml`` suffix replaced by
    ``cv_xyz`` / ``cv_uv`` (CalibVolumes.cpp:34-39) and the baked inverses as
    ``<name>cv_xyz_inv`` under ``inv_path`` (CalibVolumes.cpp:64-69).
    """
    xyz, uv, inv = [], [], []
    for path in calib_files:
        base = path[:-3]  # strip "yml" (CalibVolumes.cpp:36)
        xyz.append(CalibrationVolume.read(base + "cv_xyz", 3))
        uv.append(CalibrationVolume.read(base + "cv_uv", 2))
        directory = inv_path if inv_path is not None else os.path.dirname(path)
        name = os.path.basename(base + "cv_xyz") + "_inv"
        inv.append(CalibrationVolume.read(os.path.join(directory, name), 4))
    return build_rig(xyz, uv, inv, bbox)
