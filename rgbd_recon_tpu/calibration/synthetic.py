"""Synthetic calibrated rig + analytic test scenes.

The reference ships no test data; its calibration volumes come from a lab
bake. For hermetic tests and benchmarks we generate an analytically-exact
pinhole equivalent: K Kinect-v2-like cameras orbiting the bbox, with forward
volumes (cv_xyz / cv_uv) and inverse volumes (cv_xyz_inv) derived from the
same closed-form camera model, plus depth/color frames of a known scene
(spheres) rendered with the same model. End-to-end invariants (e.g. the TSDF
zero-crossing sits on the sphere surface) are then checkable to high
precision.

Kinect depth convention: depth = camera-space z (not ray length); the depth
axis of the lookup volumes is normalized d_norm = (z - near) / (far - near)
(cf. glsl/pre_depth.fs:78-80 and KinectCalibrationFile near/far).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np

from ..utils.math import Bbox, look_at
from .volume import CalibrationVolume
from .rig import RigCalibration, build_rig


class PinholeCamera(NamedTuple):
    """world->cam extrinsics (x_cam = R @ x_world + t) + intrinsics in pixels."""

    rot: np.ndarray    # f32[3,3]
    trans: np.ndarray  # f32[3]
    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int
    near: float
    far: float

    def world_to_cam(self, p: np.ndarray) -> np.ndarray:
        return p @ self.rot.T + self.trans

    def cam_to_world(self, p: np.ndarray) -> np.ndarray:
        return (p - self.trans) @ self.rot

    @property
    def position(self) -> np.ndarray:
        return (-self.trans @ self.rot).astype(np.float32)

    def unproject(self, u: np.ndarray, v: np.ndarray, z: np.ndarray) -> np.ndarray:
        """Normalized texcoords (u, v) + cam-space z -> world point."""
        x = (u * self.width - self.cx) / self.fx * z
        y = (v * self.height - self.cy) / self.fy * z
        cam = np.stack(np.broadcast_arrays(x, y, z), axis=-1)
        return self.cam_to_world(cam)

    def project(self, p_world: np.ndarray):
        """World points -> (normalized u, normalized v, cam z)."""
        cam = self.world_to_cam(p_world)
        z = cam[..., 2]
        zs = np.where(np.abs(z) < 1e-9, 1e-9, z)
        u = (cam[..., 0] / zs * self.fx + self.cx) / self.width
        v = (cam[..., 1] / zs * self.fy + self.cy) / self.height
        return u, v, z


def make_cameras(
    num: int,
    bbox: Bbox,
    width: int = 512,
    height: int = 424,
    near: float = 0.5,
    far: float = 4.5,
    radius: float = 2.4,
    fov_deg: float = 62.0,
) -> list[PinholeCamera]:
    """K cameras on a ring around the bbox center, Kinect-v2-ish intrinsics
    (512x424 depth, ~62 deg hfov, 0.5-4.5 m validity window,
    cf. glsl/pre_morph.fs:32-33)."""
    center = (bbox.min + bbox.max) * 0.5
    fx = width / (2.0 * np.tan(np.radians(fov_deg) / 2.0))
    cams = []
    for k in range(num):
        ang = 2.0 * np.pi * k / max(num, 1) + 0.35
        eye = center + np.array(
            [radius * np.cos(ang), 0.35 + 0.12 * k, radius * np.sin(ang)], np.float32
        )
        view = look_at(eye, center, [0.0, 1.0, 0.0]).astype(np.float64)
        # look_at gives GL eye space (camera looks down -z); Kinect depth is
        # +z in front, so flip z (and x to stay right-handed).
        flip = np.diag([-1.0, 1.0, -1.0])
        rot = flip @ view[:3, :3]
        trans = flip @ view[:3, 3]
        cams.append(
            PinholeCamera(
                rot.astype(np.float32), trans.astype(np.float32),
                fx, fx, width / 2.0, height / 2.0, width, height, near, far,
            )
        )
    return cams


def bake_forward_volumes(cam: PinholeCamera, res=(128, 256, 128)):
    """cv_xyz + cv_uv on the (u, v, d_norm) grid, like the reference's offline
    bake output (CalibVolumes.cpp:19 uses 128x256x128). Grid points sit on
    texel centers so GL-LINEAR sampling reconstructs the analytic model."""
    rx, ry, rz = res
    u = (np.arange(rx, dtype=np.float64) + 0.5) / rx
    v = (np.arange(ry, dtype=np.float64) + 0.5) / ry
    d = (np.arange(rz, dtype=np.float64) + 0.5) / rz
    dd, vv, uu = np.meshgrid(d, v, u, indexing="ij")  # [Dz, Dy, Dx]
    z = cam.near + dd * (cam.far - cam.near)
    world = cam.unproject(uu, vv, z)
    cu, cv_, _ = cam.project(world)  # color cam == depth cam in the synthetic rig
    cv_xyz = CalibrationVolume(
        np.array([rx, ry, rz], np.uint32),
        np.array([cam.near, cam.far], np.float32),
        world.astype(np.float32),
    )
    cv_uv = CalibrationVolume(
        np.array([rx, ry, rz], np.uint32),
        np.array([cam.near, cam.far], np.float32),
        np.stack([cu, cv_], axis=-1).astype(np.float32),
    )
    return cv_xyz, cv_uv


def bake_inverse_volume(cam: PinholeCamera, bbox: Bbox, res=(128, 128, 128)):
    """Analytic cv_xyz_inv: voxel center (half-voxel offset like
    calibration_inverter.cpp:76-77) -> (u, v, d_norm); -1 outside the view
    (frustum cull, calibration_inverter.cpp:95-98). res is (x, y, z)."""
    rx, ry, rz = res
    size = bbox.size.astype(np.float64)
    start = bbox.min.astype(np.float64) + size / np.array([rx, ry, rz]) * 0.5
    xs = start[0] + size[0] / rx * np.arange(rx)
    ys = start[1] + size[1] / ry * np.arange(ry)
    zs = start[2] + size[2] / rz * np.arange(rz)
    zz, yy, xx = np.meshgrid(zs, ys, xs, indexing="ij")
    world = np.stack([xx, yy, zz], axis=-1)
    u, v, z = cam.project(world)
    d_norm = (z - cam.near) / (cam.far - cam.near)
    valid = (
        (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0)
        & (z >= cam.near) & (z <= cam.far)
    )
    out = np.stack([u, v, d_norm, np.ones_like(u)], axis=-1)
    out = np.where(valid[..., None], out, -1.0)
    return CalibrationVolume(
        np.array([rx, ry, rz], np.uint32),
        np.array([0.5, 4.5], np.float32),  # calibration_inverter.cpp:113
        out.astype(np.float32),
    )


def synthetic_rig(
    num_sensors: int = 4,
    bbox: Bbox | None = None,
    fwd_res=(64, 128, 64),
    inv_res=(96, 96, 96),
    width: int = 512,
    height: int = 424,
) -> tuple[RigCalibration, list[PinholeCamera]]:
    bbox = bbox or Bbox.default()
    cams = make_cameras(num_sensors, bbox, width=width, height=height)
    xyz, uv, inv = [], [], []
    for cam in cams:
        a, b = bake_forward_volumes(cam, fwd_res)
        xyz.append(a)
        uv.append(b)
        inv.append(bake_inverse_volume(cam, bbox, inv_res))
    rig = build_rig(xyz, uv, inv, bbox)
    # synthetic camera positions are known exactly; prefer them over the
    # frustum estimate
    rig = rig._replace(
        camera_positions=np.stack([c.position for c in cams]).astype(np.float32)
    )
    return rig, cams


# --------------------------------------------------------------------------
# analytic test scene: spheres


class SphereScene(NamedTuple):
    centers: np.ndarray  # f32[S, 3]
    radii: np.ndarray    # f32[S]
    colors: np.ndarray   # f32[S, 3]

    @staticmethod
    def default(bbox: Bbox | None = None) -> "SphereScene":
        bbox = bbox or Bbox.default()
        c = (bbox.min + bbox.max) * 0.5
        return SphereScene(
            centers=np.array([[c[0], c[1], c[2]], [c[0] + 0.45, c[1] - 0.3, c[2] + 0.2]], np.float32),
            radii=np.array([0.5, 0.22], np.float32),
            colors=np.array([[0.85, 0.35, 0.25], [0.25, 0.55, 0.85]], np.float32),
        )

    def sdf(self, p: np.ndarray) -> np.ndarray:
        d = np.linalg.norm(p[..., None, :] - self.centers, axis=-1) - self.radii
        return d.min(axis=-1)


def render_depth(cam: PinholeCamera, scene: SphereScene) -> np.ndarray:
    """Analytic Kinect-style depth map f32[H, W] in meters (z-depth of the
    first sphere hit; 0 where no hit, mimicking invalid Kinect pixels)."""
    h, w = cam.height, cam.width
    u = (np.arange(w, dtype=np.float64) + 0.5) / w
    v = (np.arange(h, dtype=np.float64) + 0.5) / h
    uu, vv = np.meshgrid(u, v, indexing="xy")
    # ray through each pixel: cam-space dir with z=1
    dx = (uu * w - cam.cx) / cam.fx
    dy = (vv * h - cam.cy) / cam.fy
    dirs_cam = np.stack([dx, dy, np.ones_like(dx)], axis=-1)
    dirs_world = dirs_cam @ np.asarray(cam.rot, np.float64)  # R^T @ dir
    origin = cam.position.astype(np.float64)

    best_z = np.full((h, w), np.inf)
    for c, r in zip(scene.centers, scene.radii):
        oc = origin - c
        a = np.sum(dirs_world**2, axis=-1)
        b = 2.0 * dirs_world @ oc
        cc = np.dot(oc, oc) - r * r
        disc = b * b - 4 * a * cc
        hit = disc > 0
        t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0.0))) / (2 * a), np.inf)
        z = t  # cam-space z = t * dir_z with dir_z == 1
        z = np.where((z > cam.near) & (z < cam.far), z, np.inf)
        best_z = np.minimum(best_z, z)
    return np.where(np.isfinite(best_z), best_z, 0.0).astype(np.float32)


def render_color(cam: PinholeCamera, scene: SphereScene) -> np.ndarray:
    """Analytic color image f32[H, W, 3] in [0, 1]: sphere base color shaded
    by a fixed directional light; a grey gradient background elsewhere."""
    h, w = cam.height, cam.width
    depth = render_depth(cam, scene)
    u = (np.arange(w, dtype=np.float64) + 0.5) / w
    v = (np.arange(h, dtype=np.float64) + 0.5) / h
    uu, vv = np.meshgrid(u, v, indexing="xy")
    world = cam.unproject(uu, vv, np.where(depth > 0, depth, 1.0))
    dist = np.linalg.norm(world[..., None, :] - scene.centers, axis=-1) - scene.radii
    idx = np.argmin(dist, axis=-1)
    base = scene.colors[idx]
    nearest_center = scene.centers[idx]
    normal = world - nearest_center
    nrm = np.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / np.where(nrm < 1e-9, 1.0, nrm)
    light = np.array([0.4, 0.8, 0.45])
    light = light / np.linalg.norm(light)
    shade = np.clip(normal @ light, 0.0, 1.0) * 0.7 + 0.3
    color = base * shade[..., None]
    bg = np.stack([0.2 + 0.3 * vv] * 3, axis=-1)
    return np.where((depth > 0)[..., None], color, bg).astype(np.float32)


def render_frames(cams: Sequence[PinholeCamera], scene: SphereScene):
    """Stacked per-sensor frames: depth f32[K, H, W] (meters), color
    f32[K, H, W, 3] in [0, 1]."""
    depth = np.stack([render_depth(c, scene) for c in cams])
    color = np.stack([render_color(c, scene) for c in cams])
    return depth, color


# --------------------------------------------------------------------------
# reference-format scene fixtures


def write_reference_scene(
    directory: str,
    num_sensors: int = 2,
    bbox: Bbox | None = None,
    fwd_res=(32, 48, 32),
    inv_res=(32, 32, 32),
    width: int = 128,
    height: int = 104,
    compressed_rgb: int = 0,
    compressed_depth: bool = False,
) -> str:
    """Write a complete reference-format scene: ``.ks`` + RGBDemo ``.yml`` +
    ``.ext``/``.bbx`` side files + binary cv volumes. Returns the .ks path.

    Format fidelity: the yml mirrors OpenCV YAML token layout so the
    token-stream parser quirks (comma chopping, ``[`` scanning —
    KinectCalibrationFile.cpp:148-360) are exercised on realistic input.
    """
    import os

    bbox = bbox or Bbox.default()
    cams = make_cameras(num_sensors, bbox, width=width, height=height)
    os.makedirs(directory, exist_ok=True)

    def mat_block(name, rows, cols, vals):
        data = ", ".join(f"{v:.16e}" for v in vals)
        return (
            f"{name}: !!opencv-matrix\n   rows: {rows}\n   cols: {cols}\n"
            f"   dt: d\n   data: [ {data} ]\n"
        )

    names = []
    for i, cam in enumerate(cams):
        base = os.path.join(directory, f"sensor{i}.")
        names.append(f"sensor{i}.yml")
        k_rgb = [cam.fx, 0.0, cam.cx, 0.0, cam.fy, cam.cy, 0.0, 0.0, 1.0]
        with open(base + "yml", "w") as f:
            f.write("%YAML:1.0\n")
            f.write(mat_block("rgb_intrinsics", 3, 3, k_rgb))
            f.write(mat_block("rgb_distortion", 1, 5, [0.0] * 5))
            f.write(mat_block("depth_intrinsics", 3, 3, k_rgb))
            f.write(mat_block("depth_distortion", 1, 5, [0.0] * 5))
            f.write(mat_block("R", 3, 3, [1, 0, 0, 0, 1, 0, 0, 0, 1]))
            f.write(mat_block("T", 3, 1, [0.0, 0.0, 0.0]))
            f.write(mat_block("rgb_size", 1, 2, [cam.width, cam.height]))
            f.write(mat_block("depth_size", 1, 2, [cam.width, cam.height]))
            f.write(mat_block("near_far", 1, 2, [cam.near, cam.far]))
            f.write(mat_block("compress_rgb", 1, 1, [compressed_rgb]))
            f.write(mat_block("compress_depth", 1, 1, [int(compressed_depth)]))
        # .ext: world T then R (world_to_cam inverse: sensor pose)
        pose_r = cam.rot.T
        with open(base + "ext", "w") as f:
            f.write(" ".join(f"{v:.9f}" for v in cam.position) + "\n")
            for row in pose_r:
                f.write(" ".join(f"{v:.9f}" for v in row) + "\n")
        # .bbx: positive box = scene bbox, negative box empty (reference
        # default convention, KinectCalibrationFile.cpp:567-574)
        with open(base + "bbx", "w") as f:
            f.write(" ".join(f"{v:.4f}" for v in bbox.min) + "\n")
            f.write(" ".join(f"{v:.4f}" for v in bbox.max) + "\n")
            f.write("-100 -100 -100\n-100 -100 -100\n")
        with open(base + "serial", "w") as f:
            f.write(f"SYNTH{i:04d}\n")

        cv_xyz, cv_uv = bake_forward_volumes(cam, fwd_res)
        cv_inv = bake_inverse_volume(cam, bbox, inv_res)
        cv_xyz.write(base + "cv_xyz")
        cv_uv.write(base + "cv_uv")
        cv_inv.write(base + "cv_xyz_inv")

    ks_path = os.path.join(directory, "scene.ks")
    with open(ks_path, "w") as f:
        for n in names:
            f.write(f"kinect {n}\n")
        f.write("bbx " + " ".join(f"{v:.4f}" for v in np.concatenate([bbox.min, bbox.max])) + "\n")
    return ks_path
