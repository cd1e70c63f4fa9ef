"""Pixel-warp tables: gather-free calibration lookups.

The reference samples per-sensor 3D lookup volumes per fragment through GPU
texture units (cv_xyz / cv_uv at (u, v, d) — pre_depth.fs:133-136,
pre_normal.fs:26-60, pre_quality.fs:43-48). On TPU those scattered trilinear
fetches serialize and dominated the frame (measured ~95% of preprocess time).
But the sampled coordinate is always (u_pixel, v_pixel, d): the SPATIAL part
is the fixed pixel-center grid — only depth varies per frame. Therefore:

  bake:    slab[k, d, y, x, c] = bilinear_spatial(cv[k, d], pixel_centers)
  runtime: trilinear(cv[k], (u, v, d))  ==  lerp along d of slab[k, :, y, x]

(trilinear interpolation is separable). And when every slab column is AFFINE
in d the lerp collapses further to

  value[k, y, x, c] = A[k, y, x, c] + clamp(d) * B[k, y, x, c]

— one fused multiply-add, zero gathers. Affinity holds exactly for pinhole
camera models (cv_xyz is a ray: origin + d * direction per pixel) and is
MEASURED at bake time on the raw cv grid: because spatial interpolation is a
convex combination, the post-resize residual is bounded by the raw-grid
residual, so the check is cheap. If the residual exceeds ``tol`` the baked
A/B stay least-squares-optimal and ``max_err`` reports the bound — callers
can then fall back to the exact gather path (ops/sample.sample3d).

GL border semantics: sampling clamps the d coordinate to the first/last
texel center, so runtime clamps d to [0.5/Dz, 1-0.5/Dz] before the FMA —
out-of-range depths read the boundary slab exactly like CLAMP_TO_EDGE.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


def _gl_resize_weights_np(n_src: int, n_dst: int) -> np.ndarray:
    """[n_dst, n_src] hat weights with GL half-texel semantics (the numpy
    twin of tsdf_fast._gl_resize_weights)."""
    t = (np.arange(n_dst, dtype=np.float64) + 0.5) / n_dst
    c = np.clip(t * n_src - 0.5, 0.0, n_src - 1)
    i = np.arange(n_src, dtype=np.float64)
    w = np.clip(1.0 - np.abs(c[:, None] - i[None, :]), 0.0, 1.0)
    w = w / w.sum(axis=1, keepdims=True)
    return w.astype(np.float32)


class PixelWarp(NamedTuple):
    """Per-pixel affine-in-depth calibration warp for one rig at one
    (H, W) pixel grid. All arrays f32."""

    xyz_a: jnp.ndarray   # [K, H, W, 3]
    xyz_b: jnp.ndarray   # [K, H, W, 3]
    uv_a: jnp.ndarray    # [K, H, W, 2]
    uv_b: jnp.ndarray    # [K, H, W, 2]
    d_min: float         # clamp range along d (GL half-texel centers)
    d_max: float
    max_err_xyz: float   # bake-time affinity residual bounds (raw cv grid)
    max_err_uv: float

    def xyz(self, d: jnp.ndarray) -> jnp.ndarray:
        """cv_xyz lookup at per-pixel depth d [K, H, W] -> [K, H, W, 3]."""
        dc = jnp.clip(d, self.d_min, self.d_max)[..., None]
        return self.xyz_a + dc * self.xyz_b

    def uv(self, d: jnp.ndarray) -> jnp.ndarray:
        """cv_uv lookup at per-pixel depth d [K, H, W] -> [K, H, W, 2]."""
        dc = jnp.clip(d, self.d_min, self.d_max)[..., None]
        return self.uv_a + dc * self.uv_b

    def xyz_shifted(self, dy: int, dx: int, d: jnp.ndarray) -> jnp.ndarray:
        """cv_xyz at the pixel grid shifted by (dy, dx) pixels — the
        neighbor taps of pre_normal.fs. A shifted texcoord lands exactly on
        the neighbor pixel's center (edge rows clamp to the border center,
        CLAMP_TO_EDGE), so this is an edge-padded array shift of A/B."""
        a = _shift2d(self.xyz_a, dy, dx)
        b = _shift2d(self.xyz_b, dy, dx)
        dc = jnp.clip(d, self.d_min, self.d_max)[..., None]
        return a + dc * b

    def xyz_neighborhood(self, dn, d_t, d_b, d_l, d_r):
        """The pre_normal.fs 5-tap stencil (center, +y, -y, -x, +x) — the
        affine warp evaluates each tap as one cheap FMA."""
        return (
            self.xyz(dn),
            self.xyz_shifted(1, 0, d_t),
            self.xyz_shifted(-1, 0, d_b),
            self.xyz_shifted(0, -1, d_l),
            self.xyz_shifted(0, 1, d_r),
        )


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Edge-clamped shift of [K, H, W, C] by (dy, dx) pixels: out[y, x] =
    x[clamp(y+dy), clamp(x+dx)]."""
    k, h, w, c = x.shape
    py1, px1 = max(-dy, 0), max(-dx, 0)
    pad = jnp.pad(
        x, ((0, 0), (py1, max(dy, 0)), (px1, max(dx, 0)), (0, 0)), mode="edge"
    )
    return pad[:, py1 + dy : py1 + dy + h, px1 + dx : px1 + dx + w, :]


def bake_pixel_warp(rig, height: int, width: int) -> PixelWarp:
    """Bake A/B warp images for ``rig`` at an (H, W) depth-pixel grid.

    Least-squares affine fit along the d axis on the raw cv grid (closed
    form), then GL-exact separable spatial resize of the A/B coefficient
    planes to pixel centers. Residuals are the max |cv - (A + dB)| over the
    raw grid — an upper bound for the resized warp (convexity).
    """
    # f32 throughout: the fitted values are sensor coordinates in [-3, 3]
    # checked against 1e-4 tolerances; f64 BLAS is 2-4x slower on the host
    xyz = np.asarray(rig.cv_xyz, np.float32)  # [K, Dz, Dy, Dx, 3]
    uv = np.asarray(rig.cv_uv, np.float32)    # [K, Dz, Dy, Dx, 2]
    dz = xyz.shape[1]
    t = ((np.arange(dz, dtype=np.float64) + 0.5) / dz).astype(np.float32)
    tm = t.mean()
    tv = ((t - tm) ** 2).sum()

    def fit(vol):
        # per-column least squares over the d axis (tensordot -> BLAS; the
        # naive einsum form took minutes at Kinect resolution)
        m = vol.mean(axis=1)                                   # [K, Dy, Dx, C]
        b = np.tensordot(t - tm, vol, axes=(0, 1)) / tv
        a = m - b * tm
        # residual slab-by-slab: the one-shot broadcast materializes a
        # ~1.6 GB f64 temporary
        resid = 0.0
        for d in range(vol.shape[1]):
            resid = max(resid, float(np.abs(vol[:, d] - (a + t[d] * b)).max()))
        return a, b, resid

    xyz_a, xyz_b, err_xyz = fit(xyz)
    uv_a, uv_b, err_uv = fit(uv)

    # GL-exact spatial resize of the coefficient planes to pixel centers
    dy_, dx_ = xyz.shape[2], xyz.shape[3]
    wy = _gl_resize_weights_np(dy_, height)
    wx = _gl_resize_weights_np(dx_, width)

    def resize(p):
        p = np.einsum("Yy,kyxc->kYxc", wy, p, optimize=True)
        p = np.einsum("Xx,kYxc->kYXc", wx, p, optimize=True)
        # host numpy on purpose: the bake may run inside a jit trace (lazy
        # per-shape baking) and cached jnp constants would leak tracers
        return p.astype(np.float32)

    return PixelWarp(
        xyz_a=resize(xyz_a), xyz_b=resize(xyz_b),
        uv_a=resize(uv_a), uv_b=resize(uv_b),
        d_min=0.5 / dz, d_max=1.0 - 0.5 / dz,
        max_err_xyz=err_xyz, max_err_uv=err_uv,
    )


class PiecewiseWarp(NamedTuple):
    """Per-pixel PIECEWISE-linear-in-depth calibration warp — the middle
    tier between the affine PixelWarp and the per-pixel gather oracle
    (VERDICT r4 #1: realistic NNI-baked rigs have curved rays, so per-pixel
    affinity in depth genuinely fails — measured 987 ms/frame on the
    gather fallback at the bench config vs ~19 ms on the warp path).

    Representation: the least-squares affine part (A + d·B, f32 — optimal
    for the smooth bulk) plus a residual table R[k, s, y, x, c] sampled at
    ``knots`` uniformly-spaced depths spanning the GL-clamped depth domain.
    R carries only the non-affine remainder (lens + NNI-warp curvature,
    |R| ~ 1e-2), so bf16 storage holds it to ~5e-5 absolute — inside the
    piecewise re-knotting error itself. Evaluation is ``knots`` hat-weight
    FMAs, elementwise and XLA-fusable: ~0.2 ms per eval at Kinect res vs
    ~2 ms/sensor for gathers.

    Residuals are measured at bake time on the raw cv depth grid (convexity
    bounds the spatially-resized version, like bake_pixel_warp) with R
    already bf16-quantized; callers gate on max_err_* and fall back to the
    gather oracle when the knot density cannot capture the rig."""

    xyz_a: jnp.ndarray   # [K, H, W, 3] f32
    xyz_b: jnp.ndarray   # [K, H, W, 3] f32
    uv_a: jnp.ndarray    # [K, H, W, 2] f32
    uv_b: jnp.ndarray    # [K, H, W, 2] f32
    xyz_r: jnp.ndarray   # [K, 3, S, H, W] bf16 residual knot planes
    uv_r: jnp.ndarray    # [K, 2, S, H, W] bf16
    d_min: float
    d_max: float
    max_err_xyz: float
    max_err_uv: float

    @property
    def knots(self) -> int:
        return self.xyz_r.shape[2]

    def _eval_multi(self, D, a, b, r):
        """Evaluate M stacked depth maps against one table in a single
        R pass. D [M, K, H, W] -> [M, K, H, W, C]. On TPU with aligned
        shapes this is the VMEM-resident kernel (ops/piecewise_pallas);
        otherwise the XLA hat loop (bit-same math, channel-first acc)."""
        m, k, h, w = D.shape
        if (jax.default_backend() == "tpu" and h % 8 == 0 and w % 128 == 0):
            from .piecewise_pallas import piecewise_eval_pallas

            return piecewise_eval_pallas(D, a, b, r, self.d_min, self.d_max)
        s = r.shape[2]
        dc = jnp.clip(D, self.d_min, self.d_max)
        c = (dc - self.d_min) / (self.d_max - self.d_min) * (s - 1)
        # channel-first accumulate ([M, K, C, H, W]), one fused pass over R
        acc = (jnp.moveaxis(a, -1, 1)[None]
               + dc[:, :, None] * jnp.moveaxis(b, -1, 1)[None])
        for i in range(s):
            wgt = jnp.maximum(1.0 - jnp.abs(c - i), 0.0)
            acc = acc + wgt[:, :, None] * r[None, :, :, i].astype(jnp.float32)
        return jnp.moveaxis(acc, 2, -1)

    def _eval_line(self, a_l, b_l, r_l, d_l):
        """Tiny line evaluation (border fixes): a_l/b_l [K, N, C],
        r_l [K, C, S, N], d_l [K, N] -> [K, N, C]."""
        s = r_l.shape[2]
        dc = jnp.clip(d_l, self.d_min, self.d_max)
        c = (dc - self.d_min) / (self.d_max - self.d_min) * (s - 1)
        out = a_l + dc[..., None] * b_l
        for i in range(s):
            wgt = jnp.maximum(1.0 - jnp.abs(c - i), 0.0)
            out = out + wgt[..., None] * jnp.moveaxis(
                r_l[:, :, i], 1, -1
            ).astype(jnp.float32)
        return out

    def xyz(self, d: jnp.ndarray) -> jnp.ndarray:
        return self._eval_multi(d[None], self.xyz_a, self.xyz_b,
                                self.xyz_r)[0]

    def uv(self, d: jnp.ndarray) -> jnp.ndarray:
        return self._eval_multi(d[None], self.uv_a, self.uv_b, self.uv_r)[0]

    # -- shifted evaluation ------------------------------------------------
    # xyz_shifted(dy, dx, d)[y, x] = P[clamp(y+dy), clamp(x+dx)](d[y, x]).
    # Shifting the (A, B, R) planes would copy the ~250 MB knot table per
    # direction; instead the depth map is COUNTER-shifted, evaluated
    # pixelwise on the unshifted planes, and the result shifted — exact
    # everywhere except the one clamp-collapsed border line (the plane row
    # needed at two different depths), which a direct line eval fixes.

    def _counter_shift(self, dy, dx, d):
        return _shift2d(d[..., None], -dy, -dx)[..., 0]

    def _shift_fix(self, q, dy, dx, d):
        out = _shift2d(q, dy, dx)
        k, h, w, _ = q.shape
        if dy != 0:
            row = h - 1 if dy > 0 else 0
            fix = self._eval_line(
                self.xyz_a[:, row], self.xyz_b[:, row],
                self.xyz_r[:, :, :, row], d[:, row],
            )
            out = out.at[:, row].set(fix)
        if dx != 0:
            col = w - 1 if dx > 0 else 0
            fix = self._eval_line(
                self.xyz_a[:, :, col], self.xyz_b[:, :, col],
                self.xyz_r[:, :, :, :, col], d[:, :, col],
            )
            out = out.at[:, :, col].set(fix)
        return out

    def xyz_shifted(self, dy: int, dx: int, d: jnp.ndarray) -> jnp.ndarray:
        q = self._eval_multi(self._counter_shift(dy, dx, d)[None],
                             self.xyz_a, self.xyz_b, self.xyz_r)[0]
        return self._shift_fix(q, dy, dx, d)

    def xyz_neighborhood(self, dn, d_t, d_b, d_l, d_r):
        """The pre_normal.fs 5-tap stencil in ONE pass over the knot table:
        (center, +y, -y, -x, +x) world positions. Semantically identical to
        (xyz(dn), xyz_shifted(1,0,d_t), xyz_shifted(-1,0,d_b),
        xyz_shifted(0,-1,d_l), xyz_shifted(0,1,d_r))."""
        D = jnp.stack([
            dn,
            self._counter_shift(1, 0, d_t),
            self._counter_shift(-1, 0, d_b),
            self._counter_shift(0, -1, d_l),
            self._counter_shift(0, 1, d_r),
        ])
        q = self._eval_multi(D, self.xyz_a, self.xyz_b, self.xyz_r)
        return (
            q[0],
            self._shift_fix(q[1], 1, 0, d_t),
            self._shift_fix(q[2], -1, 0, d_b),
            self._shift_fix(q[3], 0, -1, d_l),
            self._shift_fix(q[4], 0, 1, d_r),
        )


def bake_piecewise_warp(rig, height: int, width: int,
                        knots: int = 32) -> PiecewiseWarp:
    """Bake the piecewise warp: affine part via ``bake_pixel_warp``'s fit,
    residual knot planes by depth-lerp of the raw cv slices (the knot value
    IS the exact trilinear sample at that depth), both spatially resized to
    pixel centers. Residual = max |piecewise(d_j) - cv[:, j]| over ALL raw
    depth texels j, with R pre-quantized to bf16 (the stored form)."""
    xyz = np.asarray(rig.cv_xyz, np.float32)   # [K, Dz, Dy, Dx, 3]
    uv = np.asarray(rig.cv_uv, np.float32)
    dz = xyz.shape[1]
    d_min, d_max = 0.5 / dz, 1.0 - 0.5 / dz
    t = ((np.arange(dz, dtype=np.float64) + 0.5) / dz).astype(np.float32)
    tm = t.mean()
    tv = ((t - tm) ** 2).sum()
    d_knots = np.linspace(d_min, d_max, knots).astype(np.float32)

    def fit(vol):
        m = vol.mean(axis=1)
        b = np.tensordot(t - tm, vol, axes=(0, 1)) / tv
        a = m - b * tm
        # knot values: depth-lerp of adjacent raw slices (= exact trilinear
        # along d at the knot depth)
        c = np.clip(d_knots * dz - 0.5, 0.0, dz - 1)
        i0 = np.floor(c).astype(np.int64)
        i1 = np.minimum(i0 + 1, dz - 1)
        w = (c - i0).astype(np.float32)
        r = np.stack([
            (vol[:, a0] * (1.0 - wv) + vol[:, a1] * wv)
            - (a + dk * b)
            for a0, a1, wv, dk in zip(i0, i1, w, d_knots)
        ], axis=1)                                   # [K, S, Dy, Dx, C]
        import ml_dtypes

        r = r.astype(ml_dtypes.bfloat16)             # the stored form
        # residual over every raw depth texel with the stored (bf16) R
        rf = r.astype(np.float32)
        cc = (t - d_min) / (d_max - d_min) * (knots - 1)
        resid = 0.0
        for j in range(dz):
            hat = np.clip(1.0 - np.abs(cc[j] - np.arange(knots)), 0.0, 1.0)
            pred = a + t[j] * b
            for s in np.nonzero(hat)[0]:
                pred = pred + hat[s] * rf[:, s]
            resid = max(resid, float(np.abs(pred - vol[:, j]).max()))
        return a, b, r, resid

    xyz_a, xyz_b, xyz_r, err_xyz = fit(xyz)
    uv_a, uv_b, uv_r, err_uv = fit(uv)

    dy_, dx_ = xyz.shape[2], xyz.shape[3]
    wy = _gl_resize_weights_np(dy_, height)
    wx = _gl_resize_weights_np(dx_, width)

    def resize(p, out_dtype=np.float32):
        pf = p.astype(np.float32)
        pf = np.einsum("Yy,...yxc->...Yxc", wy, pf, optimize=True)
        pf = np.einsum("Xx,...Yxc->...YXc", wx, pf, optimize=True)
        return pf.astype(out_dtype)

    import ml_dtypes

    def to_cf(r):   # [K, S, H, W, C] -> kernel layout [K, C, S, H, W]
        return np.ascontiguousarray(np.transpose(r, (0, 4, 1, 2, 3)))

    return PiecewiseWarp(
        xyz_a=resize(xyz_a), xyz_b=resize(xyz_b),
        uv_a=resize(uv_a), uv_b=resize(uv_b),
        xyz_r=to_cf(resize(xyz_r, ml_dtypes.bfloat16)),
        uv_r=to_cf(resize(uv_r, ml_dtypes.bfloat16)),
        d_min=d_min, d_max=d_max,
        max_err_xyz=err_xyz, max_err_uv=err_uv,
    )


def resize2d_gl(img: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """GL-LINEAR resize of [h, w, C] to out_hw via two hat-weight matmuls —
    identical to ``sample2d(img, texel_center_grid)`` but on the MXU instead
    of per-pixel gathers (the colorfill resolve upsamples every LOD to full
    resolution, tsdf_colorfill.fs:42-51)."""
    h2, w2 = out_hw
    # color-only resize: single-pass bf16 matmuls (f32 inputs default to a
    # 6-pass decomposition on TPU)
    bf16 = jnp.bfloat16
    wh = jnp.asarray(_gl_resize_weights_np(img.shape[0], h2), bf16)
    ww = jnp.asarray(_gl_resize_weights_np(img.shape[1], w2), bf16)
    t = jnp.einsum("Hh,hwc->Hwc", wh, img.astype(bf16),
                   preferred_element_type=jnp.float32)
    return jnp.einsum("Ww,Hwc->HWc", ww, t.astype(bf16),
                      preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# blocked 2D sampling (registered color)


def sample2d_blocked(
    img: jnp.ndarray,
    coords: jnp.ndarray,
    tile: tuple[int, int] = (16, 32),
    window: tuple[int, int] = (96, 128),
) -> jnp.ndarray:
    """GL-LINEAR 2D sampling via per-tile windows + hat-weight matmuls.

    ``img`` f32[Hc, Wc, C]; ``coords`` f32[H, W, 2] texcoords in [0, 1]
    (x, y order like ops.sample.sample2d). The registration map is smooth, so
    a tile of output pixels touches a bounded window of the source image: one
    dynamic window fetch per tile replaces per-pixel gathers, and the
    bilinear taps become two small matmuls per tile (the MXU gather trick —
    same construction as tsdf_fast.sample_brick). Falls back to clamped
    window-edge values if a tile's true footprint overflows ``window``
    (callers size the window from the rig's registration geometry).
    """
    hc, wc, _ = img.shape
    # pixel-space sample positions (GL LINEAR: t*N - 0.5, clamped)
    fx = jnp.clip(coords[..., 0] * wc - 0.5, 0.0, wc - 1.0)
    fy = jnp.clip(coords[..., 1] * hc - 0.5, 0.0, hc - 1.0)
    return sample2d_blocked_px(img, fy, fx, tile, window)


def sample2d_blocked_px(
    img: jnp.ndarray,
    fy: jnp.ndarray,
    fx: jnp.ndarray,
    tile: tuple[int, int] = (16, 32),
    window: tuple[int, int] = (96, 128),
    precise_channels: tuple[int, ...] = (),
) -> jnp.ndarray:
    """``sample2d_blocked`` core with PIXEL-space fractional coordinates
    (fy, fx each [H, W], already clamped into [0, dim-1]).

    The row-stage matmul runs single-pass bf16 (fine for color/mask
    channels). Channels listed in ``precise_channels`` (depth-like signals)
    get the hi/lo-split treatment: exactly-representable weight/value high
    parts plus small residues keep the error ~2^-15 at ~3x one channel's
    cost — far cheaper than 6-pass f32 on everything. The column stage is
    an explicit multiply+reduce on the VPU (f32 exact)."""
    hc, wc, cch = img.shape
    h, w = fy.shape
    ty, tx = tile
    wh, ww = min(window[0], hc), min(window[1], wc)
    assert h % ty == 0 and w % tx == 0, (h, w, tile)
    nty, ntx = h // ty, w // tx
    p = ty * tx
    bf16 = jnp.bfloat16

    fx = fx.reshape(nty, ty, ntx, tx).transpose(0, 2, 1, 3).reshape(-1, p)
    fy = fy.reshape(nty, ty, ntx, tx).transpose(0, 2, 1, 3).reshape(-1, p)

    # per-tile window origin centered on the footprint
    x_mid = (jnp.min(fx, axis=1) + jnp.max(fx, axis=1)) * 0.5
    y_mid = (jnp.min(fy, axis=1) + jnp.max(fy, axis=1)) * 0.5
    x0 = jnp.clip(jnp.floor(x_mid).astype(jnp.int32) - ww // 2, 0, max(wc - ww, 0))
    y0 = jnp.clip(jnp.floor(y_mid).astype(jnp.int32) - wh // 2, 0, max(hc - wh, 0))

    def per_tile(fx_t, fy_t, x0_t, y0_t):
        wnd = jax.lax.dynamic_slice(img, (y0_t, x0_t, 0), (wh, ww, cch))
        ry = jnp.clip(fy_t - y0_t, 0.0, wh - 1.0)
        rx = jnp.clip(fx_t - x0_t, 0.0, ww - 1.0)
        iy = jax.lax.broadcasted_iota(jnp.float32, (p, wh), 1)
        ix = jax.lax.broadcasted_iota(jnp.float32, (p, ww), 1)
        wyh = jnp.clip(1.0 - jnp.abs(ry[:, None] - iy), 0.0, 1.0)   # [p, wh]
        wxh = jnp.clip(1.0 - jnp.abs(rx[:, None] - ix), 0.0, 1.0)   # [p, ww]
        t = jnp.dot(wyh.astype(bf16), wnd.reshape(wh, ww * cch).astype(bf16),
                    preferred_element_type=jnp.float32).reshape(p, ww, cch)
        if precise_channels:
            wy_hi = jnp.floor(wyh * 256.0) * (1.0 / 256.0)
            wy_lo = wyh - wy_hi
            vals = jnp.stack([wnd[:, :, c] for c in precise_channels], -1)
            v_hi = jnp.floor(vals * 256.0) * (1.0 / 256.0)
            v_lo = vals - v_hi
            npc = len(precise_channels)
            stack = jnp.concatenate([v_hi, v_lo], -1).reshape(wh, ww * 2 * npc)
            t_hi = jnp.dot(wy_hi.astype(bf16), stack.astype(bf16),
                           preferred_element_type=jnp.float32
                           ).reshape(p, ww, 2 * npc)
            t_lo = jnp.dot(wy_lo.astype(bf16),
                           vals.reshape(wh, ww * npc).astype(bf16),
                           preferred_element_type=jnp.float32
                           ).reshape(p, ww, npc)
            t_pr = t_hi[:, :, :npc] + t_hi[:, :, npc:] + t_lo
            for j, c in enumerate(precise_channels):
                t = t.at[:, :, c].set(t_pr[:, :, j])
        # column stage: explicit mul+reduce (VPU, f32 exact)
        return jnp.sum(t * wxh[:, :, None], axis=1)

    out = jax.vmap(per_tile)(fx, fy, x0, y0)      # [T, p, C]
    out = out.reshape(nty, ntx, ty, tx, cch).transpose(0, 2, 1, 3, 4)
    return out.reshape(h, w, cch)
