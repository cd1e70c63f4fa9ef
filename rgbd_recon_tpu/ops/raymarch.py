"""TSDF raymarching renderer.

TPU re-expression of glsl/tsdf_raymarch.fs: the reference rasterizes the
volume cube and marches per fragment with data-dependent early exit; here
every pixel marches a fixed-trip ``lax.fori_loop`` with hit masking (XLA needs
static trip counts), sampling the TSDF volume trilinearly exactly like the GL
sampler. Shading reads a per-voxel color volume precomputed during
integration (see ops/tsdf.integrate_colors — same blend math as the shader's
``blendColors``), which replaces per-ray scattered sensor-texture reads with
dense volume interpolation. ``blend_colors_exact`` keeps the shader-faithful
per-hit blend for parity tests and the camera-influence debug mode.

Conventions: the volume occupies the unit cube in "volume space"
(vol_to_world maps it to the world bbox, recon_integration.cpp:66-71);
cameras are given in volume space via ``RenderCamera``.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .sample import sample2d, sample3d
from .preprocess import ProcessedFrames
from ..calibration.rig import RigCalibration
from ..utils.math import Bbox, pmat

# shading constants (glsl/shading.glsl:4-12)
_LIGHT_POSITION = jnp.array([1.5, 1.0, 1.0], jnp.float32)
_LIGHT_DIFFUSE = jnp.array([1.0, 0.9, 0.7], jnp.float32)
_LIGHT_AMBIENT = _LIGHT_DIFFUSE * 0.2
_LIGHT_SPECULAR = jnp.array([1.0, 1.0, 1.0], jnp.float32)
_KS = 0.5
_SHINE = 20.0
_SOLID_DIFFUSE = jnp.array([0.5, 0.5, 0.5], jnp.float32)

# per-camera debug colors (shading.glsl:24-30)
CAMERA_COLORS = jnp.array(
    [
        [228, 26, 28],
        [55, 126, 184],
        [77, 175, 74],
        [152, 78, 163],
        [255, 127, 0],
    ],
    jnp.float32,
) / 255.0


class RenderCamera(NamedTuple):
    """Pinhole render camera. ``modelview`` maps world -> eye (GL convention,
    looking down -z); ``proj`` is the GL projection. Both row-major f32[4,4]."""

    modelview: jnp.ndarray
    proj: jnp.ndarray
    width: int
    height: int


class RenderParams(NamedTuple):
    shade_mode: int = 0     # 0 color / 1 shaded / 2 normal / 3 camera blend
    max_steps: int = 0      # 0 = derive from limit (cube diagonal / step)


def vol_to_world_matrix(bbox: Bbox) -> np.ndarray:
    """translate(bbox_min) @ scale(bbox_size) (recon_integration.cpp:72-73)."""
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[1, 1], m[2, 2] = bbox.size
    m[:3, 3] = bbox.min
    return m


def _ray_grid(cam: RenderCamera, vol_to_world: jnp.ndarray):
    """Per-pixel ray origin (camera position) and direction in volume space."""
    w, h = cam.width, cam.height
    # precise matmuls: far-plane w cancels to 0 under TPU bf16 defaults
    mvp = pmat(cam.proj, pmat(cam.modelview, vol_to_world))
    inv = jnp.linalg.inv(mvp)
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2.0 - 1.0
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2.0 - 1.0
    xx, yy = jnp.meshgrid(xs, ys, indexing="xy")
    ndc_near = jnp.stack([xx, yy, -jnp.ones_like(xx), jnp.ones_like(xx)], -1)
    ndc_far = jnp.stack([xx, yy, jnp.ones_like(xx), jnp.ones_like(xx)], -1)
    p_near = pmat(ndc_near, inv.T)
    p_far = pmat(ndc_far, inv.T)
    p_near = p_near[..., :3] / p_near[..., 3:4]
    p_far = p_far[..., :3] / p_far[..., 3:4]
    # camera position in volume space
    mv_inv = jnp.linalg.inv(pmat(cam.modelview, vol_to_world))
    cam_pos = (mv_inv @ jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32))[:3]
    d = p_far - p_near
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-20)
    return cam_pos, d


def intersect_box(origin: jnp.ndarray, direction: jnp.ndarray):
    """Unit-cube slab intersection (tsdf_raymarch.fs:363-374). ``direction``
    need not be normalized; t is in units of |direction|."""
    inv_r = 1.0 / direction
    tbot = inv_r * (0.0 - origin)
    ttop = inv_r * (1.0 - origin)
    tmin = jnp.minimum(ttop, tbot)
    tmax = jnp.maximum(ttop, tbot)
    t0 = jnp.maximum(jnp.maximum(tmin[..., 0], tmin[..., 1]), tmin[..., 2])
    t1 = jnp.minimum(jnp.minimum(tmax[..., 0], tmax[..., 1]), tmax[..., 2])
    return t0, t1, t0 <= t1


class RaymarchResult(NamedTuple):
    hit: jnp.ndarray        # bool[H, W]
    position: jnp.ndarray   # f32[H, W, 3] refined hit position (volume space)
    num_samples: jnp.ndarray  # i32[H, W] (≙ tex_num_samples, fs:395-398)


def march(
    tsdf: jnp.ndarray,
    cam: RenderCamera,
    bbox: Bbox,
    limit: float,
    params: RenderParams = RenderParams(),
    brick_mask: jnp.ndarray | None = None,
    brick_size_vol: float | None = None,
    brick_extent: jnp.ndarray | None = None,
) -> RaymarchResult:
    """Fixed-trip masked raymarch (tsdf_raymarch.fs:62-114).

    ``brick_mask`` (bool[bz, by, bx]) enables space skipping: the TPU
    equivalent of the reference's MIN-blend depth peel
    (recon_integration.cpp:408-428) is a cheap coarse march over the brick
    occupancy grid that yields per-pixel entry/exit distances.

    ``brick_extent``: per-axis (x, y, z) span of the brick grid in volume
    units — ``res * snapped_brick_size / bbox.size`` — which exceeds 1 when
    the brick size does not divide the bbox (make_brick_grid ceil-rounds);
    without it the coarse lookup misaligns by up to one brick at the far
    faces.
    """
    sample_distance = limit * 0.5  # fs:34
    v2w = jnp.asarray(vol_to_world_matrix(bbox))
    origin, dirs = _ray_grid(cam, v2w)
    step_vec = dirs * sample_distance

    t0, t1, _ = intersect_box(origin, step_vec)  # t in step units (fs:78)
    t_near = jnp.maximum(t0, 0.0)
    t_far = t1

    if brick_mask is not None:
        # coarse space-skip: march the brick grid at one-brick strides and
        # shrink [t_near, t_far] to the occupied span
        bsz = brick_size_vol if brick_size_vol is not None else 1.0 / brick_mask.shape[0]
        coarse_step = bsz / sample_distance  # in fine-step units
        n_coarse = int(math.ceil(math.sqrt(3.0) / bsz)) + 2
        occ = brick_mask.astype(jnp.float32)[..., None]
        t_entry = jnp.full(t_near.shape, jnp.inf)
        t_exit = jnp.full(t_near.shape, -jnp.inf)

        extent = (
            jnp.asarray(brick_extent, jnp.float32)
            if brick_extent is not None else jnp.ones(3, jnp.float32)
        )

        def coarse_body(i, carry):
            te, tx = carry
            t = t_near + (i + 0.5) * coarse_step
            pos = origin + step_vec * t[..., None]
            inside = jnp.all((pos >= 0.0) & (pos <= 1.0), axis=-1) & (t <= t_far)
            o = sample3d(occ, pos / extent, method="nearest")[..., 0] > 0.5
            hit = inside & o
            te = jnp.where(hit, jnp.minimum(te, t - coarse_step), te)
            tx = jnp.where(hit, jnp.maximum(tx, t + coarse_step), tx)
            return te, tx

        t_entry, t_exit = jax.lax.fori_loop(0, n_coarse, coarse_body, (t_entry, t_exit))
        has_span = jnp.isfinite(t_entry)
        t_near = jnp.where(has_span, jnp.maximum(t_entry, t_near), t_far)
        t_far = jnp.where(has_span, jnp.minimum(t_exit, t_far), t_far)

    max_steps = params.max_steps or int(math.ceil(math.sqrt(3.0) / sample_distance)) + 1

    start = origin + step_vec * t_near[..., None]
    span = jnp.ceil(jnp.abs(t_far - t_near))  # fs:85

    tsdf4 = tsdf[..., None]

    def body(i, carry):
        hit, hit_pos, prev_d, nsamp = carry
        active = (~hit) & (i < span)
        pos = start + step_vec * jnp.float32(i)
        d = sample3d(tsdf4, pos)[..., 0]
        crossed = active & (d > 0.0)  # IsoValue = 0 (fs:98)
        # secant refinement (fs:100)
        denom = d - prev_d
        frac = prev_d / jnp.where(jnp.abs(denom) > 1e-20, denom, 1e-20)
        refined = (pos - step_vec) - step_vec * frac[..., None]
        hit_pos = jnp.where(crossed[..., None], refined, hit_pos)
        nsamp = nsamp + active.astype(jnp.int32)
        prev_d = jnp.where(active, d, prev_d)
        return hit | crossed, hit_pos, prev_d, nsamp

    hit0 = jnp.zeros(start.shape[:-1], bool)
    pos0 = jnp.zeros_like(start)
    prev0 = jnp.full(start.shape[:-1], -limit, jnp.float32)  # fs:89
    ns0 = jnp.zeros(start.shape[:-1], jnp.int32)
    hit, hit_pos, _, nsamp = jax.lax.fori_loop(0, max_steps, body, (hit0, pos0, prev0, ns0))
    return RaymarchResult(hit, hit_pos, nsamp)


def gradient_normal(tsdf: jnp.ndarray, pos: jnp.ndarray, limit: float) -> jnp.ndarray:
    """Central-difference gradient normal at volume positions
    (tsdf_raymarch.fs:140-149; offsets = sampleDistance, sign-flipped)."""
    sd = limit * 0.5
    t4 = tsdf[..., None]

    def s(p):
        return sample3d(t4, p)[..., 0]

    ex = jnp.array([sd, 0, 0], jnp.float32)
    ey = jnp.array([0, sd, 0], jnp.float32)
    ez = jnp.array([0, 0, sd], jnp.float32)
    g = jnp.stack(
        [s(pos + ex) - s(pos - ex), s(pos + ey) - s(pos - ey), s(pos + ez) - s(pos - ez)],
        axis=-1,
    )
    n = -g
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    return n / jnp.where(nn < 1e-20, 1.0, nn)


def blend_colors_exact(
    frames: ProcessedFrames,
    rig: RigCalibration,
    pos: jnp.ndarray,
    limit: float,
):
    """Shader-faithful per-hit color blend (tsdf_raymarch.fs:295-330):
    quality/(dist+0.01)-weighted, 1/dist fallback. Returns rgba[..., 4]."""
    total_color = jnp.zeros(pos.shape[:-1] + (3,), jnp.float32)
    total_weight = jnp.zeros(pos.shape[:-1], jnp.float32)
    total_color2 = jnp.zeros(pos.shape[:-1] + (3,), jnp.float32)
    total_weight2 = jnp.zeros(pos.shape[:-1], jnp.float32)
    for i in range(rig.num_sensors):
        pos_calib = sample3d(rig.cv_xyz_inv[i], pos)
        pos_color = sample3d(rig.cv_uv[i], pos_calib)
        color = sample2d(frames.color[i], pos_color)
        depth = sample2d(frames.depth[i][..., :1], pos_calib[..., :2], method="nearest")[..., 0]
        dist = jnp.abs(depth - pos_calib[..., 2])
        qual = sample2d(frames.quality[i][..., None], pos_calib[..., :2])[..., 0]
        qual = jnp.where(dist < limit, qual, 0.0)
        w = qual / (dist + 0.01)
        total_color = total_color + color * w[..., None]
        total_weight = total_weight + w
        w2 = 1.0 / jnp.maximum(dist, 1e-9)
        total_color2 = total_color2 + color * w2[..., None]
        total_weight2 = total_weight2 + w2
    hasq = total_weight > 0.0
    rgb = jnp.where(
        hasq[..., None],
        total_color / jnp.maximum(total_weight, 1e-20)[..., None],
        total_color2 / jnp.maximum(total_weight2, 1e-20)[..., None],
    )
    a = jnp.where(hasq, 1.0, -1.0)
    return jnp.concatenate([rgb, a[..., None]], axis=-1)


def blend_cameras(
    frames: ProcessedFrames,
    rig: RigCalibration,
    pos: jnp.ndarray,
    limit: float,
) -> jnp.ndarray:
    """Camera-influence debug colors (tsdf_raymarch.fs:346-361 with
    getWeights :151-166)."""
    total_color = jnp.zeros(pos.shape[:-1] + (3,), jnp.float32)
    total_weight = jnp.zeros(pos.shape[:-1], jnp.float32)
    for i in range(rig.num_sensors):
        pos_calib = sample3d(rig.cv_xyz_inv[i], pos)
        depth = sample2d(frames.depth[i][..., :1], pos_calib[..., :2], method="nearest")[..., 0]
        dist = jnp.abs(depth - pos_calib[..., 2])
        qual = sample2d(frames.quality[i][..., None], pos_calib[..., :2])[..., 0]
        w = jnp.where(dist < limit, qual, 0.0)
        total_color = total_color + CAMERA_COLORS[i] * w[..., None]
        total_weight = total_weight + w
    c = total_color / jnp.maximum(total_weight, 1e-20)[..., None]
    return jnp.where((total_weight > 0.0)[..., None], c, 1.0)


def phong_shade(view_pos: jnp.ndarray, view_normal: jnp.ndarray) -> jnp.ndarray:
    """shading.glsl:32-63 mode 1 (view-space Blinn-Phong on solid grey)."""
    to_light = _LIGHT_POSITION - view_pos
    to_light = to_light / jnp.maximum(jnp.linalg.norm(to_light, axis=-1, keepdims=True), 1e-20)
    light_angle = jnp.sum(view_normal * to_light, axis=-1)
    lit = light_angle > 0.0
    diff = jnp.maximum(light_angle, 0.0)
    to_viewer = -view_pos
    to_viewer = to_viewer / jnp.maximum(jnp.linalg.norm(to_viewer, axis=-1, keepdims=True), 1e-20)
    half = to_light + to_viewer
    half = half / jnp.maximum(jnp.linalg.norm(half, axis=-1, keepdims=True), 1e-20)
    spec = jnp.power(jnp.maximum(jnp.sum(half * view_normal, axis=-1), 0.0), _SHINE)
    a = (1.0 - light_angle) ** 2
    spec = spec * (1.0 - a * a * a)
    diff = jnp.where(lit, diff, 0.0)
    spec = jnp.where(lit, spec, 0.0)
    return (
        _LIGHT_AMBIENT * _SOLID_DIFFUSE
        + _LIGHT_DIFFUSE * _SOLID_DIFFUSE * diff[..., None]
        + _LIGHT_SPECULAR * _KS * spec[..., None]
    )


class RenderOutput(NamedTuple):
    color: jnp.ndarray   # f32[H, W, 4] rgba (a = blend flag / 0 for miss)
    depth: jnp.ndarray   # f32[H, W] window depth in [0, 1]; 1 for miss
    hit: jnp.ndarray     # bool[H, W]
    num_samples: jnp.ndarray  # i32[H, W]


def render(
    tsdf: jnp.ndarray,
    color_volume: jnp.ndarray | None,
    frames: ProcessedFrames,
    rig: RigCalibration,
    cam: RenderCamera,
    bbox: Bbox,
    limit: float,
    params: RenderParams = RenderParams(),
    brick_mask: jnp.ndarray | None = None,
    brick_size_vol: float | None = None,
    brick_extent: jnp.ndarray | None = None,
    exact_colors: bool = False,
) -> RenderOutput:
    """Full draw (≙ ReconIntegration::draw, recon_integration.cpp:176-240):
    march, refine, shade, write color + window-space depth."""
    res = march(tsdf, cam, bbox, limit, params, brick_mask, brick_size_vol,
                brick_extent)
    pos = res.position

    if params.shade_mode == 3:
        rgba = jnp.concatenate(
            [blend_cameras(frames, rig, pos, limit), jnp.ones(pos.shape[:-1] + (1,))],
            axis=-1,
        )
    elif exact_colors or color_volume is None:
        rgba = blend_colors_exact(frames, rig, pos, limit)
    else:
        rgba = sample3d(color_volume, pos)

    v2w = jnp.asarray(vol_to_world_matrix(bbox))
    normal_vol = gradient_normal(tsdf, pos, limit)
    mv = pmat(cam.modelview, v2w)
    # NormalMatrix in the reference is the modelview-rotation
    normal_view = pmat(normal_vol, cam.modelview[:3, :3].T)
    nn = jnp.linalg.norm(normal_view, axis=-1, keepdims=True)
    normal_view = normal_view / jnp.where(nn < 1e-20, 1.0, nn)
    view_pos = pmat(pos, mv[:3, :3].T) + mv[:3, 3]

    if params.shade_mode == 1:
        rgb = phong_shade(view_pos, normal_view)
        rgba = jnp.concatenate([rgb, rgba[..., 3:4]], axis=-1)
    elif params.shade_mode == 2:
        rgba = jnp.concatenate([normal_vol, rgba[..., 3:4]], axis=-1)

    # gl_FragDepth from view-space z (tsdf_raymarch.fs:133)
    z = view_pos[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-20, -1e-20, z)
    frag_depth = (cam.proj[2, 2] * z + cam.proj[2, 3]) / -zs * 0.5 + 0.5

    miss = ~res.hit
    rgba = jnp.where(miss[..., None], 0.0, rgba)
    frag_depth = jnp.where(miss, 1.0, frag_depth)
    return RenderOutput(rgba, frag_depth, res.hit, res.num_samples)
