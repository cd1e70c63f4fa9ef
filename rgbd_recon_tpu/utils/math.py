"""Small camera / bounding-box math library.

TPU-native replacement for the ~6 gloost classes the reference uses
(``external/gloost/BoundingBox.h:64-109``, ``PerspectiveCamera.cpp:284-320``)
and the glm matrix helpers. Everything is a plain float32 numpy/jax array so it
can be closed over by jitted pipelines.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np


class Bbox(NamedTuple):
    """Axis-aligned bounding box (reference: gloost::BoundingBox).

    The reconstruction volume; default matches kinect_client.cpp:205-207.
    """

    min: np.ndarray  # f32[3]
    max: np.ndarray  # f32[3]

    @staticmethod
    def create(pmin, pmax) -> "Bbox":
        return Bbox(np.asarray(pmin, np.float32), np.asarray(pmax, np.float32))

    @staticmethod
    def default() -> "Bbox":
        # kinect_client.cpp:206-207
        return Bbox.create([-1.0, 0.0, -1.0], [1.0, 2.2, 1.0])

    @property
    def size(self) -> np.ndarray:
        return self.max - self.min

    def contains(self, p) -> np.ndarray:
        """Vectorised inside test (reference: inc_bbox_test.glsl:11-21)."""
        p = np.asarray(p)
        return np.logical_and(
            np.all(p >= self.min, axis=-1), np.all(p <= self.max, axis=-1)
        )


def perspective(fovy_deg: float, aspect: float, near: float, far: float) -> np.ndarray:
    """Column-major-equivalent GL projection matrix, returned row-major.

    Matches gluPerspective (reference: gloost::PerspectiveCamera.cpp:284).
    """
    f = 1.0 / np.tan(np.radians(fovy_deg) / 2.0)
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = f / aspect
    m[1, 1] = f
    m[2, 2] = (far + near) / (near - far)
    m[2, 3] = 2.0 * far * near / (near - far)
    m[3, 2] = -1.0
    return m


def look_at(eye, center, up) -> np.ndarray:
    """View matrix, world -> eye space. Matches gluLookAt
    (reference: CameraNavigator.cpp:87-117 builds its view this way)."""
    eye = np.asarray(eye, np.float64)
    center = np.asarray(center, np.float64)
    up = np.asarray(up, np.float64)
    fwd = center - eye
    fwd = fwd / np.linalg.norm(fwd)
    side = np.cross(fwd, up)
    side = side / np.linalg.norm(side)
    up2 = np.cross(side, fwd)
    m = np.eye(4, dtype=np.float64)
    m[0, :3] = side
    m[1, :3] = up2
    m[2, :3] = -fwd
    m[:3, 3] = -m[:3, :3] @ eye
    return m.astype(np.float32)


def transform_point(mat: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Apply a 4x4 row-major matrix to a 3-point with w-divide."""
    ph = mat @ np.append(np.asarray(p, np.float64), 1.0)
    return (ph[:3] / ph[3]).astype(np.float32)


def pmat(a, b):
    """Precise matmul for small camera/point algebra.

    TPU matmuls default to bf16 multiplications; projective math (e.g.
    unprojecting the far plane, where w is a near-cancellation of terms)
    collapses to 0/NaN at bf16. All 4x4 matrix products and point/normal
    transforms go through this f32-exact product — the cost is negligible
    (K<=4 contractions are bandwidth-bound anyway)."""
    import jax
    import jax.numpy as jnp

    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
