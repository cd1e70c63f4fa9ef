"""Calibration volume I/O, frustums, and the synthetic rig's self-consistency."""
import numpy as np
import jax.numpy as jnp

from rgbd_recon_tpu.calibration.volume import CalibrationVolume
from rgbd_recon_tpu.calibration.frustum import Frustum
from rgbd_recon_tpu.calibration import synthetic
from rgbd_recon_tpu.ops.sample import sample3d
from rgbd_recon_tpu.utils.math import Bbox


def test_volume_roundtrip(tmp_path, rng):
    vol = CalibrationVolume(
        np.array([5, 4, 3], np.uint32),
        np.array([0.5, 4.5], np.float32),
        rng.standard_normal((3, 4, 5, 3)).astype(np.float32),
    )
    path = str(tmp_path / "test.cv_xyz")
    vol.write(path)
    back = CalibrationVolume.read(path, 3)
    np.testing.assert_array_equal(back.res, vol.res)
    np.testing.assert_array_equal(back.depth_limits, vol.depth_limits)
    np.testing.assert_array_equal(back.volume, vol.volume)


def test_volume_layout_is_z_major(tmp_path):
    # write a known payload and check (z, y, x) indexing matches the
    # reference's volume[z*rx*ry + y*rx + x] (calibration_volume.hpp:57-59)
    rx, ry, rz = 4, 3, 2
    payload = np.arange(rx * ry * rz, dtype=np.float32)
    path = str(tmp_path / "layout.cv")
    with open(path, "wb") as f:
        np.array([rx, ry, rz], np.uint32).tofile(f)
        np.array([0.0, 1.0], np.float32).tofile(f)
        payload.tofile(f)
    vol = CalibrationVolume.read(path, 1)
    z, y, x = 1, 2, 3
    assert vol.volume[z, y, x, 0] == payload[z * rx * ry + y * rx + x]


def test_frustum_inside_and_camera_pos():
    bbox = Bbox.default()
    cam = synthetic.make_cameras(1, bbox)[0]
    cv_xyz, _ = synthetic.bake_forward_volumes(cam, (16, 16, 16))
    fr = Frustum(cv_xyz.corner_points())
    # points on the optical axis inside the depth range are inside
    center_world = cam.unproject(np.array(0.5), np.array(0.5), np.array(2.0))
    assert fr.inside(center_world)
    # behind the camera is outside
    behind = cam.unproject(np.array(0.5), np.array(0.5), np.array(-1.0))
    assert not fr.inside(behind)
    # camera-position estimate from corner rays matches the true origin
    np.testing.assert_allclose(fr.camera_position(), cam.position, atol=2e-2)


def test_synthetic_forward_inverse_consistency():
    """cv_xyz_inv(world) composed with cv_xyz must be ~identity."""
    bbox = Bbox.default()
    rig, cams = synthetic.synthetic_rig(
        num_sensors=1, bbox=bbox, fwd_res=(48, 64, 48), inv_res=(64, 64, 64)
    )
    cam = cams[0]
    # pick world points well inside the bbox & frustum
    pts = np.array([[0.0, 1.1, 0.0], [0.3, 0.8, -0.2], [-0.25, 1.4, 0.3]], np.float32)
    vol_norm = (pts - bbox.min) / bbox.size
    sensor = np.asarray(sample3d(rig.cv_xyz_inv[0], jnp.asarray(vol_norm)))
    # exact projection for comparison
    u, v, z = cam.project(pts)
    d_norm = (z - cam.near) / (cam.far - cam.near)
    np.testing.assert_allclose(sensor[:, 0], u, atol=2e-3)
    np.testing.assert_allclose(sensor[:, 1], v, atol=2e-3)
    np.testing.assert_allclose(sensor[:, 2], d_norm, atol=2e-3)
    # and back through the forward volume
    world = np.asarray(sample3d(rig.cv_xyz[0], jnp.asarray(sensor)))
    np.testing.assert_allclose(world, pts, atol=5e-3)


def test_rendered_depth_matches_sphere(small_rig):
    """Analytic depth: unprojected hit points lie on a sphere surface."""
    rig = small_rig["rig"]
    cams = small_rig["cams"]
    scene = small_rig["scene"]
    depth = small_rig["depth"]
    for k, cam in enumerate(cams):
        d = depth[k]
        ys, xs = np.nonzero(d > 0)
        sel = slice(0, len(ys), max(1, len(ys) // 200))
        u = (xs[sel] + 0.5) / cam.width
        v = (ys[sel] + 0.5) / cam.height
        pts = cam.unproject(u, v, d[ys[sel], xs[sel]].astype(np.float64))
        sdf = scene.sdf(pts)
        np.testing.assert_allclose(sdf, 0.0, atol=1e-3)


def test_kinect_calibration_file_parse(tmp_path):
    """RGBDemo .yml + side-file parsing round-trips the fixture metadata
    (KinectCalibrationFile.cpp:148-580 semantics incl. comma-chop quirks)."""
    from rgbd_recon_tpu.calibration import synthetic
    from rgbd_recon_tpu.calibration.files import (
        CalibrationFiles, KinectCalibrationFile, file_value, load_scene,
    )
    from rgbd_recon_tpu.utils.math import Bbox

    bbox = Bbox.default()
    ks = synthetic.write_reference_scene(
        str(tmp_path), num_sensors=2, bbox=bbox, compressed_rgb=1,
    )
    cams = synthetic.make_cameras(2, bbox, width=128, height=104)

    c = KinectCalibrationFile(str(tmp_path / "sensor0.yml")).parse()
    assert c.width == 128 and c.height == 104
    assert c.width_c == 128 and c.height_c == 104
    np.testing.assert_allclose(c.color_focal, (cams[0].fx, cams[0].fy), rtol=1e-6)
    np.testing.assert_allclose(
        c.color_principal, (cams[0].cx, cams[0].cy), rtol=1e-6
    )
    np.testing.assert_allclose(c.near, cams[0].near, rtol=1e-6)
    np.testing.assert_allclose(c.far, cams[0].far, rtol=1e-6)
    assert c.compressed_rgb == 1
    assert c.compressed_depth is False
    np.testing.assert_allclose(c.rel_rotation, np.eye(3))
    np.testing.assert_allclose(c.world_translation, cams[0].position, atol=1e-6)
    np.testing.assert_allclose(c.world_rotation, cams[0].rot.T, atol=1e-6)
    np.testing.assert_allclose(c.pos_min, bbox.min, atol=1e-4)
    np.testing.assert_allclose(c.pos_max, bbox.max, atol=1e-4)
    np.testing.assert_allclose(c.neg_max, np.full(3, -100.0))
    assert c.serial == "SYNTH0000"

    # missing side files fall back to reference defaults
    (tmp_path / "sensor1.ext").unlink()
    (tmp_path / "sensor1.bbx").unlink()
    c1 = KinectCalibrationFile(str(tmp_path / "sensor1.yml")).parse()
    np.testing.assert_allclose(c1.world_rotation, np.eye(3))
    np.testing.assert_allclose(c1.world_translation, np.zeros(3))
    np.testing.assert_allclose(c1.pos_min, np.full(3, -100.0))

    cfs = CalibrationFiles([str(tmp_path / "sensor0.yml"), str(tmp_path / "sensor1.yml")])
    fmt = cfs.frame_format()
    assert fmt.width == 128 and fmt.height_c == 104
    assert fmt.compressed_rgb == 1

    # FileValue equivalent
    (tmp_path / "groundlevel").write_text("0.42\n")
    assert file_value(str(tmp_path / "groundlevel")) == 0.42
    assert file_value(str(tmp_path / "missing"), -1.0) == -1.0


def test_load_scene_end_to_end(tmp_path):
    """.ks -> yml -> rig + FrameFormat in one call, matching the in-memory
    synthetic rig exactly (byte-identical volume round trip)."""
    from rgbd_recon_tpu.calibration import synthetic
    from rgbd_recon_tpu.calibration.files import load_scene
    from rgbd_recon_tpu.utils.math import Bbox

    bbox = Bbox.default()
    ks = synthetic.write_reference_scene(str(tmp_path), num_sensors=2, bbox=bbox)
    cfs, rig, fmt, bbox2 = load_scene(ks)
    assert cfs.num == 2
    np.testing.assert_allclose(bbox2.min, bbox.min, atol=1e-4)
    ref_rig, _ = synthetic.synthetic_rig(
        num_sensors=2, bbox=bbox, fwd_res=(32, 48, 32), inv_res=(32, 32, 32),
        width=128, height=104,
    )
    np.testing.assert_array_equal(np.asarray(rig.cv_xyz), np.asarray(ref_rig.cv_xyz))
    np.testing.assert_array_equal(np.asarray(rig.cv_uv), np.asarray(ref_rig.cv_uv))
    np.testing.assert_array_equal(
        np.asarray(rig.cv_xyz_inv), np.asarray(ref_rig.cv_xyz_inv)
    )
    assert fmt.width == 128 and fmt.color_size == 128 * 104 * 3


def test_calib_inverter_cli(tmp_path):
    """scripts/calib_inverter.py: .ks -> baked *_inv volumes on disk."""
    import subprocess
    import sys
    from rgbd_recon_tpu.calibration import synthetic
    from rgbd_recon_tpu.calibration.volume import CalibrationVolume
    from rgbd_recon_tpu.utils.math import Bbox

    bbox = Bbox.default()
    ks = synthetic.write_reference_scene(
        str(tmp_path), num_sensors=1, bbox=bbox, fwd_res=(16, 24, 16),
    )
    # overwrite the pre-baked inverse so the tool's output is what we read
    (tmp_path / "sensor0.cv_xyz_inv").unlink()
    import scripts.calib_inverter as ci

    rc = ci.main([str(ks), "-s", "0.2"])
    assert rc == 0
    out = CalibrationVolume.read(str(tmp_path / "sensor0.cv_xyz_inv"), 4)
    assert tuple(int(v) for v in out.res) == (10, 12, 10)  # ceil(bbox/0.2), f32: 2.2/0.2 -> 11.0000005 -> 12
    vol = out.volume
    valid = vol[..., 0] >= 0.0
    assert valid.any()
    # valid voxels carry plausible (u, v, d) in [0, 1]
    assert np.all(vol[valid][:, :3] >= -1e-5)
    assert np.all(vol[valid][:, :3] <= 1.0 + 1e-5)
