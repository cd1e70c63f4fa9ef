"""Per-brick affine warp coefficients — the compact replacement for the
dense voxel->sensor warp table.

The baked table (tsdf_fast.precompute_tables) stores cv_xyz_inv resampled at
every voxel: ~800 MB at 256^3 x 4 sensors, minutes of bake, and the dominant
per-brick DMA traffic of the integration kernel. But the warp is the
trilinear interpolation of a smooth calibration volume (the reference
samples it per voxel per frame, tsdf_integration.vs:31): over one 16^3
brick it is affine to ~1e-4 in normalized sensor units for pinhole-like
rigs (curvature of the projective map over a ~0.14 m brick at >= 0.5 m).

So per (sensor, brick) we store 30 floats — the least-squares QUADRATIC fit

    (u, v, d_norm)(voxel) = C @ [1, lz, ly, lx, lz2, ly2, lx2, lzly, lzlx, lylx]

(centered local coords) over the brick's CLEAN voxels (the inverse bake
marks off-frustum voxels (-1,-1,-1), calibration_inverter.cpp:95-98;
blending across that cliff would poison the fit — see _fit_slab). The fit
is exact LSQ per brick (10x10 normal equations, ridge-stabilized in a
normalized basis), computed on device one brick-z-slab at a time so the
dense table is never materialized. At 256^3 x 4 sensors the result is
~2.6 MB instead of ~800 MB and bakes in ~9 s instead of minutes; measured
residual there: u ~1.1e-3, v ~2.0e-3, d ~4e-4 (the floor is the table's
own piecewise-trilinear kinks, which no smooth basis reproduces).

Deviations vs the exact table (documented):
* residual: max |fit - table| over valid voxels is measured at bake time
  and returned in AffineTables.max_err; callers should fall back to the
  table path when it exceeds their parity budget.
* frustum-edge bricks: voxels invalid in the table (u < 0) extrapolate
  under the affine fit and may classify as valid (and vice versa) within
  ~1 voxel of the frustum boundary. The reference's own behaviour there is
  the GL border clamp of a voxelized frustum mask — the same deviation
  class as the fast path's fixed sampling window.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .tsdf import TsdfConfig
from .tsdf_fast import BRICK, IntegrationTables, _gl_resize_weights
from ..calibration.rig import RigCalibration

B3 = BRICK**3


class AffineTables(NamedTuple):
    """coeffs f32[K, NB, 4, NBASIS]: [..., chan, basis] with chan =
    (u, v, d, pad) and the quadratic basis of _brick_basis (local coords =
    in-brick voxel index - 7.5).
    An all-invalid (sensor, brick) stores the constant u = -1 row so the
    kernel's u < 0 gate skips it. max_err f32[3]: bake-time max residual vs
    the exact table, per channel (u, v, d), measured over CLEAN interior
    voxels only — table-valid voxels inside the edge-clamped half-texel
    shell and adjacent to frustum cliffs are excluded from the fit (their
    table values mix the -1 invalid marker) and so integrate with
    extrapolated values whose deviation this bound does not cover; callers
    gating on max_err (pipeline affine_tol) get a bound over the brick
    interiors, not the frustum boundary shell (see edge_err for the shell
    diagnostic)."""

    coeffs: jnp.ndarray
    max_err: jnp.ndarray
    edge_err: jnp.ndarray  # f32[3]: max |fit - table| over table-valid
                           # voxels EXCLUDED from the fit (half-texel
                           # clamp shell + cliff-adjacent) — the
                           # extrapolation-zone counterpart of max_err.
                           # Informational: the table itself blends the
                           # -1 invalid marker there, so neither value
                           # is the calibration ground truth.
    n_cliff: jnp.ndarray   # i32[]: table-valid voxels excluded as
                           # cliff-corrupted (fit quality diagnostics)


NBASIS = 10


def _brick_basis() -> np.ndarray:
    """f32[10, B3] full quadratic basis (1, lz, ly, lx, lz2, ly2, lx2,
    lzly, lzlx, lylx) on centered in-brick coordinates; voxel order matches
    tsdf_fast._to_blocked (z-major within the brick).

    Quadratic, not affine: the projective warp's second-order term
    (~(brick/distance)^2, worst-case ~5e-3 in normalized u at 256^3) flips
    silhouette/truncation gates on ~0.3% of voxels; the quadratic fit
    pushes the residual to the third-order term (~1e-4) at zero extra
    kernel cost (the per-brick basis matmul pads to 16 rows either way)."""
    idx = np.arange(B3)
    lz = (idx // (BRICK * BRICK)).astype(np.float32) - (BRICK - 1) / 2.0
    ly = ((idx // BRICK) % BRICK).astype(np.float32) - (BRICK - 1) / 2.0
    lx = (idx % BRICK).astype(np.float32) - (BRICK - 1) / 2.0
    one = np.ones(B3, np.float32)
    return np.stack([one, lz, ly, lx,
                     lz * lz, ly * ly, lx * lx,
                     lz * ly, lz * lx, ly * lx])


# the fit solves in a normalized basis (slopes scaled to ~[-1, 1]) so the
# f32 Gram stays well-conditioned; coefficients are unscaled afterwards
_BASIS_SCALE = np.array(
    [1.0, 8.0, 8.0, 8.0, 64.0, 64.0, 64.0, 64.0, 64.0, 64.0], np.float32
)


def _lsq(f, m, basis, prec):
    """Masked per-brick LSQ. f [K, nb, B3, 3]; m [K, nb, B3] weights.
    Returns coeffs [K, nb, 4(basis), 3(chan)]."""
    nvalid = jnp.sum(m, axis=-1)
    mb = m[..., None, :] * basis                  # [K, nb, 4, B3]
    gram = jnp.einsum("knav,bv->knab", mb, basis,
                      preferred_element_type=jnp.float32, precision=prec)
    rhs = jnp.einsum("knav,knvc->knac", mb, f,
                     preferred_element_type=jnp.float32, precision=prec)
    ridge = (1e-6 * jnp.maximum(nvalid, 1.0))[..., None, None] * jnp.eye(NBASIS)
    return jnp.linalg.solve(gram + ridge, rhs), nvalid


def _interior(n_src: int, n_dst: int) -> np.ndarray:
    """bool[n_dst]: voxels whose GL sample coordinate is NOT edge-clamped
    (the outer half-texel shell of _gl_resize_weights reads a constant —
    not affine — so it is excluded from the fit and extrapolated instead)."""
    t = (np.arange(n_dst, dtype=np.float64) + 0.5) / n_dst
    c = t * n_src - 0.5
    return (c >= 0.0) & (c <= n_src - 1)


def _fit_slab(src: jnp.ndarray, wd_slab: jnp.ndarray, wh: jnp.ndarray,
              ww: jnp.ndarray, basis: jnp.ndarray, interior: jnp.ndarray):
    """Fit one brick-z-slab. src f32[K, D, H, W, 3]; wd_slab f32[16, D];
    wh f32[Vy, H]; ww f32[Vx, W]; interior bool[B3-per-brick broadcastable]
    = [nb_slab, B3]. Returns (coeffs f32[K, nb_slab, 4, 4], err f32[3],
    n_cliff i32)."""
    prec = jax.lax.Precision.HIGHEST
    # 4th channel: off-frustum indicator. A resized voxel whose trilinear
    # stencil touches ANY (-1,-1,-1) source texel is cliff-contaminated —
    # its value blends the marker, not the calibration
    # (calibration_inverter.cpp:95-98) — and is excluded from the fit.
    # Exact (the indicator resize IS the contamination weight).
    src4 = jnp.concatenate(
        [src, (src[..., :1] < 0.0).astype(jnp.float32)], axis=-1
    )
    pos = jnp.einsum("Dd,kdhwc->kDhwc", wd_slab, src4,
                     preferred_element_type=jnp.float32, precision=prec)
    pos = jnp.einsum("Hh,kDhwc->kDHwc", wh, pos,
                     preferred_element_type=jnp.float32, precision=prec)
    pos = jnp.einsum("Ww,kDHwc->kDHWc", ww, pos,
                     preferred_element_type=jnp.float32, precision=prec)
    k, bz, vy, vx, _ = pos.shape
    nby, nbx = vy // BRICK, vx // BRICK
    # [K, nby, nbx, B3(z-major), 4]
    f4 = pos.reshape(k, BRICK, nby, BRICK, nbx, BRICK, 4)
    f4 = f4.transpose(0, 2, 4, 1, 3, 5, 6).reshape(k, nby * nbx, B3, 4)
    f = f4[..., :3]
    valid = f[..., 0] >= 0.0                      # [K, nb, B3]
    clean = valid & (f4[..., 3] < 1e-6) & interior[None]

    # a brick (nearly) fully inside the cliff zone has too few clean voxels
    # for a stable fit. Its table values are frustum-marker blend garbage
    # everywhere anyway, so mark the whole (sensor, brick) invalid — the
    # honest version of sampling garbage.
    has_clean = jnp.sum(clean, axis=-1) >= 32     # [K, nb]
    scale = jnp.asarray(_BASIS_SCALE)
    c_n, nvalid = _lsq(f, clean.astype(jnp.float32),
                       basis / scale[:, None], prec)
    c = c_n / scale[None, None, :, None]

    # invalid bricks: constant u = -1 (kernel-side invalid gate); same for
    # any brick whose solve still went non-finite
    c_empty = jnp.zeros((NBASIS, 3), jnp.float32).at[0, 0].set(-1.0)
    bad = ~has_clean | ~jnp.all(jnp.isfinite(c), axis=(-2, -1))
    c = jnp.where(bad[..., None, None], c_empty, c)

    pred = jnp.einsum("knac,av->knvc", c, basis,
                      preferred_element_type=jnp.float32, precision=prec)
    err = jnp.max(
        jnp.where((clean & ~bad[..., None])[..., None],
                  jnp.abs(pred - f), 0.0),
        axis=(0, 1, 2),
    )                                             # [3]
    # extrapolation-zone residual: table-valid voxels excluded from the fit
    # (clamp shell + cliff-adjacent) integrate with extrapolated values;
    # report their deviation separately so affine_tol callers know max_err's
    # domain (note: the table blends the -1 marker here, so this measures
    # fit-vs-table disagreement, not fit-vs-calibration error)
    edge_err = jnp.max(
        jnp.where((valid & ~clean & ~bad[..., None])[..., None],
                  jnp.abs(pred - f), 0.0),
        axis=(0, 1, 2),
    )
    n_cliff = jnp.sum(valid & ~clean)
    # -> [..., chan, basis] padded to 4 channels
    cm = jnp.transpose(c, (0, 1, 3, 2))
    cm = jnp.pad(cm, ((0, 0), (0, 0), (0, 1), (0, 0)))
    return cm, err, edge_err, n_cliff


def bake_affine(rig: RigCalibration, cfg: TsdfConfig) -> AffineTables:
    """Bake per-brick affine warp coefficients for every sensor at the
    volume res. ≙ precompute_tables (tsdf_fast) compressed to 12 floats
    per brick x sensor; device-resident, slab-streamed (the dense table is
    never materialized)."""
    vx, vy, vz = cfg.res
    assert vx % BRICK == vy % BRICK == vz % BRICK == 0
    nbz = vz // BRICK
    src = jnp.asarray(rig.cv_xyz_inv, jnp.float32)
    wd = _gl_resize_weights(src.shape[1], vz)
    wh = _gl_resize_weights(src.shape[2], vy)
    ww = _gl_resize_weights(src.shape[3], vx)
    basis = jnp.asarray(_brick_basis())

    iy = _interior(src.shape[2], vy)
    ix = _interior(src.shape[3], vx)
    iz = _interior(src.shape[1], vz)
    nby, nbx = vy // BRICK, vx // BRICK
    # per-brick interior mask in block-voxel order (z-major within brick)
    iyx = (iy[:, None] & ix[None, :]).reshape(nby, BRICK, nbx, BRICK)
    iyx = iyx.transpose(0, 2, 1, 3).reshape(nby * nbx, BRICK * BRICK)

    fit = jax.jit(_fit_slab)
    coeffs, errs, eerrs, cliffs = [], [], [], []
    for bz in range(nbz):
        izb = iz[bz * BRICK:(bz + 1) * BRICK]     # [16]
        interior = (izb[None, :, None] & iyx[:, None, :]).reshape(
            nby * nbx, B3
        )
        cm, err, eerr, ncl = fit(src, wd[bz * BRICK:(bz + 1) * BRICK], wh,
                                 ww, basis, jnp.asarray(interior))
        coeffs.append(cm)
        errs.append(err)
        eerrs.append(eerr)
        cliffs.append(ncl)
    coeffs = jnp.concatenate(coeffs, axis=1)      # [K, NB, 4, 4]
    max_err = jnp.max(jnp.stack(errs), axis=0)
    edge_err = jnp.max(jnp.stack(eerrs), axis=0)
    n_cliff = jnp.sum(jnp.stack(cliffs))
    return AffineTables(coeffs=coeffs, max_err=max_err, edge_err=edge_err,
                        n_cliff=n_cliff)


def expand_affine(tables: AffineTables) -> IntegrationTables:
    """Evaluate the affine model at every voxel -> the dense block-major
    table (test oracle; also the CPU fallback for small volumes)."""
    basis = jnp.asarray(_brick_basis())
    pos = jnp.einsum("knab,bv->knva", tables.coeffs[..., :3, :], basis,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return IntegrationTables(pos_blocked=pos)


def _hull_basis() -> np.ndarray:
    """f32[NBASIS, 27]: the quadratic basis at the 27 points {-7.5, 0,
    7.5}^3 of a brick. The footprint of the quadratic warp over the brick
    is bounded (to fit accuracy; the pairwise-quadratic's extremes sit at
    corners/edge-midpoints for warps whose linear term dominates) by the
    min/max over these samples — used for window placement and sizing."""
    g = np.array([-(BRICK - 1) / 2.0, 0.0, (BRICK - 1) / 2.0], np.float32)
    lz, ly, lx = [a.ravel() for a in np.meshgrid(g, g, g, indexing="ij")]
    return np.stack([np.ones_like(lz), lz, ly, lx, lz * lz, ly * ly,
                     lx * lx, lz * ly, lz * lx, ly * lx])


def win_offsets_affine(tables: AffineTables, h: int, w: int,
                       wy: int, wx: int, xstride: int,
                       yalign: int = 8) -> jnp.ndarray:
    """Per-brick per-sensor window selectors i32[K, NB, 2] (y_origin, xb)
    from the affine coefficients alone, placed from the FOOTPRINT HULL:
    the window origin aligns down from (footprint min - 1) instead of
    centering on the brick-center projection, so coverage needs only
    extent + stride + bilinear reach instead of extent + 2x(quantization
    + reach) — this is what lets the half-tile x window fit real
    footprints (auto_window_cols). Matches tsdf_pallas.win_offsets_pallas's
    quantization (y origins ``yalign``-aligned, x an overlapping block
    index of width ``wx`` at stride ``xstride``). ``yalign=16`` for
    layouts whose padded image height the y clamp must use."""
    wp = max(-(-w // xstride) * xstride, wx)
    nxb = (wp - wx) // xstride + 1
    # the f32 layout (yalign=8) is unpadded -> clamp against the true
    # height; the padded layouts pad H up to the alignment multiple
    hp = h if yalign == 8 else -(-h // yalign) * yalign
    # slice to the coeffs' basis size (tests pin the placement contract
    # with constant-only tables)
    sb = jnp.asarray(_hull_basis()[: tables.coeffs.shape[-1]])  # [NB_, S]
    pts = jnp.einsum("knca,as->kncs", tables.coeffs[..., :2, :], sb)
    u_min = jnp.min(pts[..., 0, :], axis=-1) * w - 0.5   # px
    v_min = jnp.min(pts[..., 1, :], axis=-1) * h - 0.5
    xb = jnp.clip(
        (jnp.floor(u_min).astype(jnp.int32) - 1) // xstride, 0, nxb - 1
    )
    # the upper clamp must itself be aligned (h - wy need not be a
    # multiple of yalign, e.g. 212 - 48): the kernels encode y as its
    # tile index, so an unaligned clamp would silently floor
    y8 = jnp.clip(
        ((jnp.floor(v_min).astype(jnp.int32) - 1) // yalign) * yalign,
        0, (hp - wy) & ~(yalign - 1),
    )
    return jnp.stack([y8, xb], axis=-1)


def _footprint_extents(tables: AffineTables, chan: int,
                       scale: int) -> np.ndarray:
    """Per valid (sensor, brick) footprint extent in px along ``chan``
    (0 = u, 1 = v), from the 27-point quadratic hull (_hull_basis)."""
    sb = _hull_basis()
    c = np.asarray(tables.coeffs[..., chan, :])  # [K, NB, NBASIS]
    u0 = np.asarray(tables.coeffs[..., 0, 0])
    pts = c @ sb                                 # [K, NB, S] normalized
    ext = (pts.max(-1) - pts.min(-1)) * scale    # px
    return ext[u0 >= 0.0]


class CullBake(NamedTuple):
    """Frame-INVARIANT half of block_depth_cull — everything derivable
    from the affine bake alone (footprint hulls, covered cell ranges,
    oversize/edge/validity flags). ~10 small [K, NB] tensors; baking it
    once per session removes the per-frame all-brick hull einsum + px
    bound construction from the fused step (docs/PERF.md lever #2 —
    ~1-2 ms/frame at 512^3 over the 32768-brick grid). Produced by
    ``bake_cull``; consumed by ``block_depth_cull_baked`` (whose math is
    bit-identical to ``block_depth_cull`` — the latter is now a
    bake-then-apply wrapper)."""
    d_lo: jnp.ndarray    # f32[K, NB] brick depth band (hull -/+ lim margin)
    d_hi: jnp.ndarray
    cya: jnp.ndarray     # i32[K, NB] covered depth-mip cell ranges
    cyb: jnp.ndarray
    cxa: jnp.ndarray
    cxb: jnp.ndarray
    wide: jnp.ndarray    # bool[K, NB] footprint exceeds the cell budget
    edge: jnp.ndarray    # bool[K, NB] footprint leaves the image
    valid: jnp.ndarray   # bool[K, NB] bake-valid (sensor, brick)


def bake_cull(tables: AffineTables, h: int, w: int,
              limit: float = 0.01, cell: int = 8, shifts: int = 5,
              margin: float = 1.25) -> CullBake:
    """Session bake of block_depth_cull's frame-invariant quantities
    (same formulas, hoisted verbatim — see block_depth_cull's docstring
    for semantics)."""
    k, nb = tables.coeffs.shape[:2]
    lim = limit * margin
    ch, cw = -(-h // cell), -(-w // cell)

    sb = jnp.asarray(_hull_basis())
    # f32 MXU precision: the hull must be REPRODUCIBLE across programs
    # (the bake runs in its own jit; default-precision bf16 matmuls flip
    # borderline cells between the baked and in-trace evaluations)
    pts = jnp.einsum("knca,as->kncs", tables.coeffs[..., :3, :], sb,
                     precision=jax.lax.Precision.HIGHEST)
    u_lo = jnp.min(pts[:, :, 0], -1) * w - 0.5     # px
    u_hi = jnp.max(pts[:, :, 0], -1) * w - 0.5
    v_lo = jnp.min(pts[:, :, 1], -1) * h - 0.5
    v_hi = jnp.max(pts[:, :, 1], -1) * h - 0.5
    d_lo = jnp.min(pts[:, :, 2], -1) - lim
    d_hi = jnp.max(pts[:, :, 2], -1) + lim

    cya = jnp.clip(jnp.floor((v_lo - 1.0) / cell).astype(jnp.int32), 0, ch - 1)
    cyb = jnp.clip(jnp.floor((v_hi + 1.0) / cell).astype(jnp.int32), 0, ch - 1)
    cxa = jnp.clip(jnp.floor((u_lo - 1.0) / cell).astype(jnp.int32), 0, cw - 1)
    cxb = jnp.clip(jnp.floor((u_hi + 1.0) / cell).astype(jnp.int32), 0, cw - 1)

    wide = ((u_hi - u_lo) > shifts * cell - 2) | (
        (v_hi - v_lo) > shifts * cell - 2)
    edge = (u_lo < 0.0) | (u_hi > w - 1.0) | (v_lo < 0.0) | (v_hi > h - 1.0)
    valid = tables.coeffs[..., 0, 0] >= 0.0
    return CullBake(d_lo, d_hi, cya, cyb, cxa, cxb, wide, edge, valid)


def block_depth_cull(mask16: jnp.ndarray, tables: AffineTables,
                     depth_n: jnp.ndarray, quality: jnp.ndarray,
                     silhouette: jnp.ndarray | None = None,
                     limit: float = 0.01, cell: int = 8, shifts: int = 5,
                     margin: float = 1.25):
    """Depth-band cull of occupied 16^3 blocks — the reference's brick
    depth peel (recon_integration.cpp:408-428) applied to INTEGRATION.

    The brick-grid marking (0.1 m cells, inc_bricks.glsl:40-58) is much
    coarser than the truncation band: at 512^3 only ~55% of marked blocks
    contain in-band voxels, yet per-block VPU cost dominates the integrate
    kernel there (docs/PERF.md). A block can only hold in-band voxels for
    a sensor if its baked depth range (27-point quadratic hull +- limit)
    intersects the sensor's depth range over its footprint; blocks failing
    that for EVERY sensor integrate to constants (-limit in front / carve
    — both equal the clear value — or +limit behind) and are dropped.

    Per (sensor, block), using only the affine bake + two tiny depth mips:
      * the EXACT cell range of the footprint ([min-1, max+1] px over
        ``cell``-square min/max depth mips of qual > 0 pixels; <=
        ``shifts`` cells per axis for footprints <= shifts*cell - 2 px,
        sampled as shifted one-hot matmuls + min/max — a fixed pooled
        window measured far too conservative: 48x48 px windows near
        silhouette edges span the whole depth range and kept ~97% of
        blocks; 16-px exact ranges kept ~89%; 8-px cells track the depth
        gradient near the limb); wider footprints are conservatively
        kept;
      * blocks whose footprint leaves the image fold in the CORNER pixel's
        depth (the kernel's GL-border-clamp substitute for out-of-bounds
        voxels), and (sensor, brick) pairs invalid in the bake count as
        live only if the corner depth itself is in band of d_vox = 0
        (their zeroed coefficients) — reproducing the kernel's invalid
        path exactly, conservatively.

    DOCUMENTED DEVIATION: dropped all-behind blocks hold the clear value
    (-limit) instead of +limit. Rays from the front hit the real surface
    first either way; the false back-face shell that brick-sparse TSDF
    always has (the reference included) moves from the brick-grid boundary
    to the band-block boundary — strictly closer to the surface. Measured
    image impact at the bench scene: see docs/PERF.md round-4 cull pass.

    ``margin`` inflates the band by 25% to absorb the affine-fit residual
    (~5e-4 vs limit 0.01 at 512^3) and hull underestimate.

    Also returns per-(sensor, block) integration CLASSES for the kernel's
    per-sensor skip (fuse_chunk_v3 ``cls``): 0 FULL (default), and for
    in-budget, in-image footprints over fully-live (qual > 0 everywhere)
    pixels — where no carve/corner path can fire — 1 NONE (strictly
    behind: provably no state change) or 2 FRONT (strictly in front:
    wt = -limit unconditionally); 3 INVALID for bake-invalid bricks,
    whose whole contribution folds to per-sensor corner constants.
    NONE/FRONT/INVALID still skip the inverse-distance fallback-color
    accumulation (tc2) — out-of-band voxels in kept blocks lose non-band
    sensors' fallback colors, the same approximation family as the
    cull's dropped-block colors.

    Returns (mask16 & keep, keep, cls[K, NB] i32)."""
    h, w = depth_n.shape[1:]
    bake = bake_cull(tables, h, w, limit, cell, shifts, margin)
    return block_depth_cull_baked(mask16, bake, depth_n, quality,
                                  silhouette, limit, cell, shifts, margin)


def block_depth_cull_baked(mask16: jnp.ndarray, bake: CullBake,
                           depth_n: jnp.ndarray, quality: jnp.ndarray,
                           silhouette: jnp.ndarray | None = None,
                           limit: float = 0.01, cell: int = 8,
                           shifts: int = 5, margin: float = 1.25):
    """Per-frame half of block_depth_cull over a session CullBake —
    depth mips, covered-cell range reduce and the band/class compares
    (``limit``/``cell``/``shifts``/``margin`` must match the bake's)."""
    nbz, nby, nbx = mask16.shape
    k, nb = bake.d_lo.shape
    assert nb == nbz * nby * nbx, (bake.d_lo.shape, mask16.shape)
    h, w = depth_n.shape[1:]
    lim = limit * margin
    big = jnp.float32(1e9)
    d_lo, d_hi = bake.d_lo, bake.d_hi
    cya, cyb, cxa, cxb = bake.cya, bake.cyb, bake.cxa, bake.cxb

    # 16x16 depth min/max mips over accumulation-capable (qual > 0) pixels
    ch, cw = -(-h // cell), -(-w // cell)
    live = quality > 0.0
    dp = jnp.pad(jnp.where(live, depth_n, big),
                 ((0, 0), (0, ch * cell - h), (0, cw * cell - w)),
                 constant_values=big)
    dmin = dp.reshape(k, ch, cell, cw, cell).min((2, 4))
    dn = jnp.pad(jnp.where(live, depth_n, -big),
                 ((0, 0), (0, ch * cell - h), (0, cw * cell - w)),
                 constant_values=-big)
    dmax = dn.reshape(k, ch, cell, cw, cell).max((2, 4))

    # exact covered cell range per block: [floor((min-1)/cell) ..
    # floor((max+1)/cell)], <= ``shifts`` cells for in-budget extents —
    # reduced with shifted one-hot row matmuls + elementwise min (gathers
    # serialize on TPU; out-of-range shifts substitute the identity)
    def range_reduce(mip, op, fill):
        """min/max of mip[k, cy, cx] over the block's covered cell
        rectangle (clamped to shifts^2 cells; wider handled by ``wide``)."""
        iy = jnp.arange(ch)
        rows = None
        for i in range(shifts):
            oy = ((cya + i)[..., None] == iy).astype(jnp.float32)
            s = jnp.einsum("knh,khw->knw", oy, mip)          # [K, NB, cw]
            s = jnp.where((cya + i <= cyb)[..., None], s, fill)
            rows = s if rows is None else op(rows, s)
        out = None
        ix = jnp.arange(cw)
        for i in range(shifts):
            ox = ((cxa + i)[..., None] == ix).astype(jnp.float32)
            s = jnp.sum(rows * ox, axis=-1)                  # [K, NB]
            s = jnp.where(cxa + i <= cxb, s, fill)
            out = s if out is None else op(out, s)
        return out

    wmin = range_reduce(dmin, jnp.minimum, big)
    wmax = range_reduce(dmax, jnp.maximum, -big)
    # class safety needs STRICT liveness: qual > 0 AND silhouette == 1
    # (boundary-kept pixels have qual > 0 with sil = 0 and would carve).
    # Without the silhouette no window is provably carve-free: no classes.
    if silhouette is not None:
        strict = live & (silhouette >= 1.0)
        lm = jnp.pad(strict.astype(jnp.float32),
                     ((0, 0), (0, ch * cell - h), (0, cw * cell - w)))
        lmin = lm.reshape(k, ch, cell, cw, cell).min((2, 4))
        full_live = range_reduce(lmin, jnp.minimum, big) > 0.5
    else:
        full_live = jnp.zeros((k, nb), bool)

    # the cell range covers footprints up to shifts*cell - 2 px; wider keeps
    wide, edge = bake.wide, bake.edge
    cd = depth_n[:, 0, 0]
    c_live = quality[:, 0, 0] > 0.0
    wmin = jnp.where(edge, jnp.minimum(wmin, jnp.where(c_live, cd, big)[:, None]),
                     wmin)
    wmax = jnp.where(edge, jnp.maximum(wmax, jnp.where(c_live, cd, -big)[:, None]),
                     wmax)

    band = (d_hi >= wmin) & (d_lo <= wmax)
    valid_brick = bake.valid
    inv_live = c_live & (jnp.abs(cd) < lim)        # corner in band of d=0
    touch = jnp.where(valid_brick, band | wide, inv_live[:, None])
    keep = jnp.any(touch, axis=0).reshape(nbz, nby, nbx)

    # per-(sensor, block) kernel class: NONE/FRONT only when provably
    # constant (fully-live in-image in-budget window — no carve, no
    # corner substitution); bake-invalid bricks fold to corner constants
    safe = ~wide & ~edge & full_live
    cls = jnp.zeros((k, nb), jnp.int32)
    cls = jnp.where(safe & (wmax < d_lo), 1, cls)          # NONE (behind)
    cls = jnp.where(safe & (wmin > d_hi), 2, cls)          # FRONT
    cls = jnp.where(~valid_brick, 3, cls)                  # INVALID
    return mask16 & keep, keep, cls


def auto_window_rows(tables: AffineTables, h: int,
                     wy_max: int = 48, wy_min: int = 16,
                     quantile: float = 99.0) -> tuple[int, float]:
    """Size the integration kernel's y window from the bake: (wy, clip_frac).

    The sampling matmuls' MAC count scales linearly with the window height,
    and the height needed scales with the projected brick footprint — half
    per doubling of volume resolution (a brick is 16 voxels regardless).
    The footprint's v extent per (sensor, brick) comes from the 27-point
    quadratic hull (the bulge beyond it is bounded by the fit residual,
    well under a pixel). With hull-based placement (win_offsets_affine
    aligns the origin down from footprint-min - 1), a window of size
    extent + align + bilinear reach = extent + 10 always covers; wy takes
    the ``quantile`` of VALID bricks, aligned up to 8 rows and clamped to
    [wy_min, wy_max] — at 256^3 with Kinect sensors this reproduces the
    historical fixed 48; at 512^3 it yields 32-40.

    ``clip_frac`` is the fraction of valid (sensor, brick) pairs whose
    extent exceeds the chosen window: those bricks sample edge-clamped
    rows exactly as oversized footprints always have under the fixed
    window (close-to-sensor bricks; extents up to ~400 px exist in any
    frustum). Callers log it; it is occupancy-independent."""
    ev = _footprint_extents(tables, 1, h)
    if ev.size == 0:
        return wy_max, 0.0
    need = float(np.percentile(ev, quantile)) + 10.0  # align + reach
    wy = int(min(max(-(-int(np.ceil(need)) // 8) * 8, wy_min), wy_max))
    clip_frac = float((ev > wy - 10.0).mean())
    return wy, clip_frac


def auto_window_cols(tables: AffineTables, w: int,
                     quantile: float = 99.0) -> tuple[int, int, float]:
    """Size the integration kernel's x window from the bake:
    (wx, xstride, clip_frac).

    Unlike the y window (pure DMA bytes), the x window sets the sampling
    matmuls' OUTPUT rows and the x-stage array heights — the kernel's two
    dominant compute terms scale linearly with it (docs/PERF.md round-4
    bisect). The choice is the historical full lane tile (wx=64,
    xstride=16, channel-paired) or the half tile (wx=32, channel-QUADDED
    — expand_xblocks_quads), taken when the ``quantile`` u extent of
    valid bricks fits under hull-based placement: extent + xstride +
    bilinear reach (2) <= 32. The half tile comes in two strides: 8 (same
    total packed-x-block bytes: 2x blocks x half channels per plane) and,
    when only the stride-8 placement slack overflows, 4 (2x the packed
    blocks — a once-per-frame relayout — for 4 px tighter placement at
    high volume resolutions, where footprints halve per res doubling).

    ``clip_frac`` as in auto_window_rows: oversized footprints edge-clamp,
    the fixed window's pre-existing behaviour."""
    ev = _footprint_extents(tables, 0, w)
    if ev.size == 0:
        return 64, 16, 0.0
    p = float(np.percentile(ev, quantile))
    if p + 8.0 + 2.0 <= 32.0:
        return 32, 8, float((ev > 32 - 10.0).mean())
    if p + 4.0 + 2.0 <= 32.0:
        return 32, 4, float((ev > 32 - 6.0).mean())
    return 64, 16, float((ev > 64 - 18.0).mean())
