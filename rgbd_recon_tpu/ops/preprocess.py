"""Per-sensor depth/color preprocessing pipeline.

TPU re-expression of the five fullscreen GLSL passes that
``NetKinectArray::processTextures`` runs per sensor layer
(framework/NetKinectArray.cpp:309-426):

  morph     glsl/pre_morph.fs      3x3 depth dilation (active path: one
                                   ``dilate`` pass, the second pass is a
                                   passthrough — pre_morph.fs:123-135)
  bilateral glsl/pre_depth.fs      13x13 bilateral depth filter + bbox cull +
                                   depth-registered color -> CIELAB
  boundary  glsl/pre_boundary.fs   silhouette classification + optional
                                   LAB-vote boundary refinement
  normals   glsl/pre_normal.fs     central-difference world-space normals
                                   (+ brick marking, see ops/bricks.py)
  quality   glsl/pre_quality.fs    per-pixel fusion weight

Everything operates on stacked ``[K, H, W]`` arrays (K sensors = leading batch
axis) with edge-clamped stencil windows — the GL CLAMP_TO_EDGE equivalent.
Each stage is a pure function; ``preprocess()`` chains them and is designed to
be jitted as one fused program (optionally vmapped/sharded over sensors).

TPU structure: calibration lookups go through the gather-free PixelWarp
(ops/warp.py — affine-in-depth FMA per pixel, exact for the piecewise-linear
cv volumes of pinhole rigs); color registration uses the blocked matmul
sampler. Passing ``warp=None`` falls back to per-pixel 3D gathers
(ops/sample.sample3d) — the reference-faithful oracle the warp paths are
parity-tested against. The big stencils (13x13 bilateral + quality) run as a
``lax.scan`` over stencil rows: same fused arithmetic, ~13x smaller HLO (the
fully unrolled version compiled for minutes).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .colors import rgb_to_lab
from .sample import sample2d, sample3d, pixel_texcoords
from .warp import PixelWarp, sample2d_blocked
from ..calibration.rig import RigCalibration

# Kinect-v2 raw validity window in meters (pre_morph.fs:32-33)
MIN_DEPTH_M = 0.5
MAX_DEPTH_M = 4.5
# boundary/quality validity threshold on the lateral channel (pre_boundary.fs:27)
MIN_RANGE = 0.65
MAX_COLOR_DIST = 0.5  # pre_boundary.fs:19


class PreprocessConfig(NamedTuple):
    """Runtime toggles, mirroring the reference's flags
    (kinect_client.cpp:73-80 / NetKinectArray toggles :468-480)."""

    filter_textures: bool = True      # g_bilateral
    use_processed_depth: bool = True  # g_processed (morph feeds bilateral)
    refine_boundary: bool = True      # g_refine


def _shifted(padded: jnp.ndarray, dy: int, dx: int, h: int, w: int, k: int) -> jnp.ndarray:
    """View of an edge-padded [K, H+2k, W+2k] stack shifted by (dy, dx)."""
    return padded[:, k + dy : k + dy + h, k + dx : k + dx + w]


def _pad_edge(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (k, k), (k, k)), mode="edge")


# ---------------------------------------------------------------------------
# morph


def _force_xla() -> bool:
    """RGBD_FORCE_XLA=1 disables the Pallas fast paths (on-chip A/B
    debugging of kernel vs XLA formulations)."""
    import os

    return os.environ.get("RGBD_FORCE_XLA", "0") == "1"


def morph_dilate(depth_m: jnp.ndarray) -> jnp.ndarray:
    """3x3 validity-aware dilation on raw depth in meters
    (pre_morph.fs:73-112 ``dilate`` with kernel_size=1).

    Valid center pixels pass through; invalid ones get the mean of the valid
    3x3 neighbors that additionally lie within 0.2 m of that first-pass mean.
    """
    k = 1
    max_dist = 0.2  # pre_morph.fs:54
    kk, h, w = depth_m.shape
    padded = _pad_edge(depth_m, k)
    valid_c = (depth_m > MIN_DEPTH_M) & (depth_m < MAX_DEPTH_M)

    sum1 = jnp.zeros_like(depth_m)
    cnt1 = jnp.zeros_like(depth_m)
    for dy in range(-k, k + 1):
        for dx in range(-k, k + 1):
            s = _shifted(padded, dy, dx, h, w, k)
            v = (s > MIN_DEPTH_M) & (s < MAX_DEPTH_M)
            sum1 = sum1 + jnp.where(v, s, 0.0)
            cnt1 = cnt1 + v.astype(depth_m.dtype)
    avg = sum1 / jnp.maximum(cnt1, 1.0)

    sum2 = jnp.zeros_like(depth_m)
    cnt2 = jnp.zeros_like(depth_m)
    for dy in range(-k, k + 1):
        for dx in range(-k, k + 1):
            s = _shifted(padded, dy, dx, h, w, k)
            v = (s > MIN_DEPTH_M) & (s < MAX_DEPTH_M) & (jnp.abs(avg - s) < max_dist)
            sum2 = sum2 + jnp.where(v, s, 0.0)
            cnt2 = cnt2 + v.astype(depth_m.dtype)
    filled = jnp.where(cnt2 > 0, sum2 / jnp.maximum(cnt2, 1.0), 0.0)
    filled = jnp.where(cnt1 > 0, filled, 0.0)
    return jnp.where(valid_c, depth_m, filled)


# ---------------------------------------------------------------------------
# bilateral + color registration


def _sample_cv_per_pixel(cv: jnp.ndarray, d_norm: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Sample a stacked calib volume [K, Dz, Dy, Dx, C] at each pixel's
    (u, v, d_norm). ``d_norm`` is [K, H, W]; ``uv`` is the shared [H, W, 2]
    texel-center grid. Returns [K, H, W, C]."""

    def per_sensor(vol, dn):
        coords = jnp.concatenate(
            [jnp.broadcast_to(uv, dn.shape + (2,)), dn[..., None]], axis=-1
        )
        return sample3d(vol, coords)

    return jax.vmap(per_sensor)(cv, d_norm)


def bilateral_lab(
    depth_m: jnp.ndarray,
    color: jnp.ndarray,
    rig: RigCalibration,
    cfg: PreprocessConfig = PreprocessConfig(),
    warp: PixelWarp | None = None,
):
    """pre_depth.fs main: returns (depth2 [K,H,W,2] = (depth_norm, w_range/n),
    color_lab [K,H,W,3], color_registered [K,H,W,3] — the depth-registered
    RGB the LAB conversion consumes; the fast TSDF path reuses it).

    depth_m: [K, H, W] meters (morphed when cfg.use_processed_depth).
    color:   [K, Hc, Wc, 3] RGB in [0, 1].
    """
    kk, h, w = depth_m.shape
    uv = pixel_texcoords(h, w)
    cv_min = rig.depth_limits[:, 0][:, None, None]
    cv_max = rig.depth_limits[:, 1][:, None, None]

    depth_norm = (depth_m - cv_min) / (cv_max - cv_min)  # pre_depth.fs:78-80
    if warp is not None:
        pos_world = warp.xyz(depth_norm)
    else:
        pos_world = _sample_cv_per_pixel(rig.cv_xyz, depth_norm, uv)
    in_box = (
        jnp.all(pos_world >= rig.bbox_min, axis=-1)
        & jnp.all(pos_world <= rig.bbox_max, axis=-1)
    )  # inc_bbox_test.glsl:11-21

    # color: cv_uv at clamped depth (pre_depth.fs:136), then the color image
    d_for_color = jnp.where((depth_norm <= 0.0) | (depth_norm >= 1.0), 1.0, depth_norm)
    hc, wc = color.shape[1], color.shape[2]
    if warp is not None:
        coords_c = warp.uv(d_for_color)
    else:
        coords_c = _sample_cv_per_pixel(rig.cv_uv, d_for_color, uv)
    # registration tile for the Pallas warp: largest tile whose source
    # footprint (+ margins) fits one 128-lane x-block window AND whose pixel
    # count satisfies warp_screen_pallas's chunking (p % min(1024, p) == 0 —
    # e.g. (48, 32) gives p=1536, which the kernel rejects)
    import math as _math

    _th, _tw = next(
        ((t_h, t_w) for t_h in (48, 24, 16, 8) for t_w in (128, 64, 32)
         if h % t_h == 0 and w % t_w == 0
         and _math.ceil(t_w * wc / w * 1.5) + 16 <= 128
         and (t_h * t_w) % 128 == 0
         and ((t_h * t_w) % 1024 == 0 or t_h * t_w < 1024)),
        (None, None),
    )
    if (warp is not None and jax.default_backend() == "tpu"
            and not _force_xla()
            and _th is not None and _tw is not None):
        # VMEM-resident warp (the XLA blocked sampler's row-stage
        # intermediate spills ~15 ms/frame of HBM traffic here)
        from .warp_pallas import warp_screen_pallas

        fx = jnp.clip(coords_c[..., 0] * wc - 0.5, 0.0, wc - 1.0)
        fy = jnp.clip(coords_c[..., 1] * hc - 0.5, 0.0, hc - 1.0)
        color_rgb = jnp.stack([
            warp_screen_pallas(color[k], fy[k], fx[k], tile=(_th, _tw))
            for k in range(kk)
        ])
    elif warp is not None and h % 8 == 0 and w % 32 == 0:
        wnd = (min(96, hc), min(128, wc))
        color_rgb = jax.vmap(
            lambda im, co: sample2d_blocked(im, co, tile=(8, 32), window=wnd)
        )(color, coords_c)
    else:
        color_rgb = jax.vmap(sample2d)(color, coords_c)
    color_lab = rgb_to_lab(color_rgb)

    if not cfg.filter_textures:
        dn = jnp.where(in_box, depth_norm, 0.0)
        lat = jnp.where(in_box, 1.0, 0.0)
        return jnp.stack([dn, lat], axis=-1), color_lab, color_rgb

    # 13x13 bilateral on meters depth (pre_depth.fs:85-127, kernel_size=6)
    ks = 6
    n_samples = float((2 * ks + 1) ** 2)
    if jax.default_backend() == "tpu" and h % 8 == 0 and not _force_xla():
        # whole-image-in-VMEM Pallas accumulator: the scan form spills each
        # tap's intermediates to HBM (~2 GB/frame, most of the stage cost)
        from .preprocess_pallas import bilateral_accum_pallas

        depth_bf, w_acc, w_range = bilateral_accum_pallas(
            depth_m, rig.depth_limits
        )
    else:
        dist_range_max = 0.35 * (depth_m / MAX_DEPTH_M)  # pre_depth.fs:89-92
        padded = _pad_edge(depth_m, ks)

        def row_body(carry, dy_idx):
            depth_bf, w_acc, w_range = carry
            row = jax.lax.dynamic_slice(
                padded, (0, dy_idx, 0), (kk, h, w + 2 * ks)
            )
            dyf = dy_idx.astype(jnp.float32) - ks
            for dx in range(-ks, ks + 1):
                s = jax.lax.slice(row, (0, 0, dx + ks), (kk, h, dx + ks + w))
                dist = jnp.abs(s - depth_m)
                outside = (s < cv_min) | (s > cv_max)
                accept = (~outside) & (dist <= dist_range_max)
                # NOTE gauss_space goes negative for |offset| > 6 px — the
                # reference keeps those corner weights (pre_depth.fs:38-41)
                gs = 1.0 - jnp.sqrt(jnp.float32(dx * dx) + dyf * dyf) / ks
                gr = 1.0 - jnp.minimum(dist, dist_range_max) / dist_range_max
                ws = gs * gr
                depth_bf = depth_bf + jnp.where(accept, ws * s, 0.0)
                w_acc = w_acc + jnp.where(accept, ws, 0.0)
                w_range = w_range + jnp.where(accept, gr, 0.0)
            return (depth_bf, w_acc, w_range), None

        zeros = jnp.zeros_like(depth_m)
        (depth_bf, w_acc, w_range), _ = jax.lax.scan(
            row_body, (zeros, zeros, zeros), jnp.arange(2 * ks + 1)
        )

    filtered = depth_bf / jnp.where(w_acc != 0.0, w_acc, 1.0)
    filtered = jnp.where(w_acc != 0.0, filtered, 0.0)  # guard the 0/0 the GL code leaves as NaN
    out_x = (filtered - cv_min) / (cv_max - cv_min)
    out_y = w_range / n_samples
    dn = jnp.where(in_box, out_x, 0.0)
    lat = jnp.where(in_box, out_y, 0.0)
    return jnp.stack([dn, lat], axis=-1), color_lab, color_rgb


# ---------------------------------------------------------------------------
# boundary / silhouette


def boundary(
    depth2: jnp.ndarray,
    color_lab: jnp.ndarray,
    cfg: PreprocessConfig = PreprocessConfig(),
):
    """pre_boundary.fs main: returns (depth_b [K,H,W,2], silhouette [K,H,W])."""
    kk, h, w, _ = depth2.shape
    ks = 2  # pre_boundary.fs:21
    total = float((2 * ks) * (2 * ks))  # pre_boundary.fs:23 (quirk: (2k)^2, not (2k+1)^2)
    dx_ = depth2[..., 0]
    dy_ = depth2[..., 1]

    # get_color_diff (pre_boundary.fs:37-55): mean LAB distance to valid
    # neighbors in the 5x5 window
    pad_x = _pad_edge(dx_, ks)
    pad_y = _pad_edge(dy_, ks)
    pad_lab = jnp.pad(color_lab, ((0, 0), (ks, ks), (ks, ks), (0, 0)), mode="edge")
    dist_sum = jnp.zeros_like(dx_)
    cnt = jnp.zeros_like(dx_)
    for oy in range(-ks, ks + 1):
        for ox in range(-ks, ks + 1):
            sx = _shifted(pad_x, oy, ox, h, w, ks)
            sy = _shifted(pad_y, oy, ox, h, w, ks)
            sl = pad_lab[:, ks + oy : ks + oy + h, ks + ox : ks + ox + w, :]
            valid = (sx > 0.0) & (sy > MIN_RANGE)
            d = jnp.linalg.norm(sl - color_lab, axis=-1)
            dist_sum = dist_sum + jnp.where(valid, d, 0.0)
            cnt = cnt + valid.astype(dx_.dtype)
    color_diff = jnp.where(cnt < total * 0.5, 1.0, dist_sum / jnp.maximum(cnt, 1.0))

    is_empty = dx_ <= 0.0
    is_boundary = (~is_empty) & ~(dy_ > MIN_RANGE)
    keep = (color_diff <= MAX_COLOR_DIST) & bool(cfg.refine_boundary)

    out_x = jnp.where(is_empty, dx_, jnp.where(is_boundary & ~keep, -1.0, dx_))
    out_y = jnp.where(
        is_empty, 0.0, jnp.where(is_boundary, jnp.where(keep, 1.0, 0.1), 0.0)
    )
    silhouette = jnp.where(is_empty | is_boundary, 0.0, 1.0)
    return jnp.stack([out_x, out_y], axis=-1), silhouette


# ---------------------------------------------------------------------------
# normals


def normals(depth_b: jnp.ndarray, rig: RigCalibration,
            warp: PixelWarp | None = None):
    """pre_normal.fs: world-space normals from cv_xyz-warped central
    differences. Returns (normals [K,H,W,3], world_pos [K,H,W,3], valid mask)
    — world_pos/valid feed brick marking (pre_normal.fs:32-33)."""
    dn = depth_b[..., 0]
    kk, h, w = dn.shape
    uv = pixel_texcoords(h, w)
    outside = (dn <= 0.0) | (dn >= 1.0)

    pad = _pad_edge(dn, 1)

    def neighbor(dyy, dxx):
        s = _shifted(pad, dyy, dxx, h, w, 1)
        s_out = (s <= 0.0) | (s >= 1.0)
        return jnp.where(s_out, dn, s)  # pre_normal.fs:45-48

    d_t = neighbor(1, 0)   # +texSizeInv.y = next row
    d_b = neighbor(-1, 0)
    d_l = neighbor(0, -1)
    d_r = neighbor(0, 1)

    if warp is not None:
        # a one-pixel texcoord shift lands exactly on the neighbor pixel's
        # center (edge rows clamp like CLAMP_TO_EDGE), so the neighbor
        # lookups are array shifts of the baked warp (affine) or one
        # multi-map kernel pass over the knot table (piecewise)
        (world_c, world_t, world_b, world_l,
         world_r) = warp.xyz_neighborhood(dn, d_t, d_b, d_l, d_r)
    else:
        uv_t = uv + jnp.array([0.0, 1.0 / h], jnp.float32)
        uv_b = uv - jnp.array([0.0, 1.0 / h], jnp.float32)
        uv_l = uv - jnp.array([1.0 / w, 0.0], jnp.float32)
        uv_r = uv + jnp.array([1.0 / w, 0.0], jnp.float32)

        def cv_at(uv_grid, d):
            def per_sensor(vol, dd):
                coords = jnp.concatenate(
                    [jnp.broadcast_to(uv_grid, dd.shape + (2,)), dd[..., None]],
                    axis=-1,
                )
                return sample3d(vol, coords)

            return jax.vmap(per_sensor)(rig.cv_xyz, d)

        world_c = cv_at(uv, dn)
        world_t = cv_at(uv_t, d_t)
        world_b = cv_at(uv_b, d_b)
        world_l = cv_at(uv_l, d_l)
        world_r = cv_at(uv_r, d_r)

    n = jnp.cross(world_b - world_t, world_l - world_r)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.where(norm < 1e-20, 1.0, norm)
    n = jnp.where(outside[..., None], 0.0, n)
    return n, world_c, ~outside


# ---------------------------------------------------------------------------
# quality


def quality(
    depth_b: jnp.ndarray,
    normal_map: jnp.ndarray,
    rig: RigCalibration,
    warp: PixelWarp | None = None,
) -> jnp.ndarray:
    """pre_quality.fs ``bilateral_filter``: per-pixel fusion weight
    (1-border_frac)^6 * (w_range/n)^6 / (6.5*d) * angle^2 (:107-114)."""
    dn = depth_b[..., 0]
    kk, h, w = dn.shape
    ks = 6
    n_samples = float((2 * ks + 1) ** 2)
    outside_c = (dn <= 0.0) | (dn >= 1.0)
    dist_range_max = 0.35 * dn  # normalized depth, max_depth=1 (:72-75)

    padded = _pad_edge(dn, ks)

    def row_body(carry, dy_idx):
        border, w_range = carry
        row = jax.lax.dynamic_slice(padded, (0, dy_idx, 0), (kk, h, w + 2 * ks))
        for dxx in range(-ks, ks + 1):
            s = jax.lax.slice(row, (0, 0, dxx + ks), (kk, h, dxx + ks + w))
            dist = jnp.abs(s - dn)
            s_out = (s <= 0.0) | (s >= 1.0)
            reject = s_out | (dist > dist_range_max)
            gr = 1.0 - jnp.minimum(dist, dist_range_max) / jnp.where(
                dist_range_max > 0, dist_range_max, 1.0
            )
            border = border + reject.astype(dn.dtype)
            w_range = w_range + jnp.where(reject, 0.0, gr)
        return (border, w_range), None

    zeros = jnp.zeros_like(dn)
    (border, w_range), _ = jax.lax.scan(
        row_body, (zeros, zeros), jnp.arange(2 * ks + 1)
    )

    lateral_q = 1.0 - border / n_samples
    strong = lateral_q**6 * (w_range / n_samples) ** 6
    strong = strong / jnp.maximum(dn * 6.5, 1e-20)

    # normal_angle (:43-48)
    uv = pixel_texcoords(h, w)
    if warp is not None:
        world_pos = warp.xyz(dn)
    else:
        world_pos = _sample_cv_per_pixel(rig.cv_xyz, dn, uv)
    to_cam = rig.camera_positions[:, None, None, :] - world_pos
    to_cam = to_cam / jnp.maximum(jnp.linalg.norm(to_cam, axis=-1, keepdims=True), 1e-20)
    angle = jnp.sum(to_cam * normal_map, axis=-1)
    strong = strong * angle**2

    return jnp.where(outside_c, 0.0, strong)


# ---------------------------------------------------------------------------
# the fused pipeline


class ProcessedFrames(NamedTuple):
    """Per-sensor texture set consumed by the reconstruction strategies
    (≙ NetKinectArray's processed texture arrays)."""

    depth: jnp.ndarray       # f32[K, H, W, 2] (depth_norm | -1/0, boundary flag)
    silhouette: jnp.ndarray  # f32[K, H, W]
    normals: jnp.ndarray     # f32[K, H, W, 3] world space
    quality: jnp.ndarray     # f32[K, H, W]
    color: jnp.ndarray       # f32[K, Hc, Wc, 3] rgb in [0, 1] (pass-through)
    color_registered: jnp.ndarray  # f32[K, H, W, 3] depth-registered rgb
    color_lab: jnp.ndarray   # f32[K, H, W, 3]
    world: jnp.ndarray       # f32[K, H, W, 3] cv_xyz-unprojected positions
    world_valid: jnp.ndarray  # bool[K, H, W]
    depth_morphed: jnp.ndarray  # f32[K, H, W] meters (morph output)
    depth_raw: jnp.ndarray   # f32[K, H, W] meters (sensor input; ReconMVT
                             # filters this itself, recon_mvt.cpp:32)


def preprocess(
    depth_m: jnp.ndarray,
    color: jnp.ndarray,
    rig: RigCalibration,
    cfg: PreprocessConfig = PreprocessConfig(),
    warp: PixelWarp | None = None,
) -> ProcessedFrames:
    """Full preprocessing chain (NetKinectArray::processTextures order).

    ``warp``: baked PixelWarp for gather-free calibration lookups (pass
    ops.warp.bake_pixel_warp(rig, H, W)); None = exact gather oracle.

    ``color`` may be u8 (the ingest fast path keeps color u8 on the host —
    4x less H2D traffic; normalization fuses into the first device op)."""
    if color.dtype == jnp.uint8:
        color = color.astype(jnp.float32) / 255.0
    morphed = morph_dilate(depth_m)
    feed = morphed if cfg.use_processed_depth else depth_m
    depth2, color_lab, color_reg = bilateral_lab(feed, color, rig, cfg, warp)
    depth_b, sil = boundary(depth2, color_lab, cfg)
    nrm, world, world_valid = normals(depth_b, rig, warp)
    qual = quality(depth_b, nrm, rig, warp)
    return ProcessedFrames(
        depth=depth_b,
        silhouette=sil,
        normals=nrm,
        quality=qual,
        color=color,
        color_registered=color_reg,
        color_lab=color_lab,
        world=world,
        world_valid=world_valid,
        depth_morphed=morphed,
        depth_raw=depth_m,
    )
