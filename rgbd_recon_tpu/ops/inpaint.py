"""Hole-filling pyramid (inpaint + colorfill).

TPU re-expression of the reference's LOD-atlas hole filling
(ReconIntegration::fillColors, recon_integration.cpp:279-338): the GL version
packs a mip pyramid into one 1.5x-wide atlas texture (ViewLod) and runs
transfer + inpaint passes per LOD, then a colorfill resolve. Here the pyramid
is a plain list of per-LOD images.

  inpaint   glsl/tsdf_inpaint.fs:33-92   downsample with hole rejection: 4x4
            window, keep non-hole samples with depth >= window average
  colorfill glsl/tsdf_colorfill.fs:30-55 per pixel: first non-hole LOD; if
            coarser than 0, blend the two next-coarser LODs

Hole encoding follows the reference: alpha <= 0 marks a hole (the renderer's
miss pixels have alpha 0; fallback-blended pixels have alpha -1 and count as
holes for filling purposes only when fully transparent — the inpaint shader
keys on color.a <= 0, tsdf_inpaint.fs:48).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .warp import resize2d_gl


def inpaint_downsample(color: jnp.ndarray, depth: jnp.ndarray):
    """One pyramid level: [H, W, 4] + [H, W] -> [H/2, W/2, 4] + [H/2, W/2].

    For each target pixel, gathers the 4x4 source window around its 2x2
    children ([-1..2] offsets, tsdf_inpaint.fs:43-46), averages the depth of
    non-hole samples and blends those at or beyond that average
    (:70-85, equal weights — the gauss table is commented out in the shader).
    """
    h, w = depth.shape
    h2, w2 = h // 2, w // 2
    # pad by 1 on the leading edge and 2+parity on the trailing edge so both
    # padded extents are even -> window offsets [-1..2] around the 2x2 child
    py = 3 - (h & 1)
    px = 3 - (w & 1)
    cpad = jnp.pad(color, ((1, py), (1, px), (0, 0)), mode="edge")
    dpad = jnp.pad(depth, ((1, py), (1, px)), mode="edge")
    hp, wp = cpad.shape[0] // 2, cpad.shape[1] // 2
    # reshape-parity tap extraction: offset oy = 2*(block shift) + parity, so
    # each tap is a contiguous block slice + a fixed parity index — no
    # stride-2 slicing on the minor (lane) axis
    # ONE relayout into the 4 parity planes, then every tap is a contiguous
    # slice (16 mixed-stride extractions cost ~8 ms at 720p)
    cq = cpad.reshape(hp, 2, wp, 2, 4).transpose(1, 3, 0, 2, 4)  # [2,2,hp,wp,4]
    dq = dpad.reshape(hp, 2, wp, 2).transpose(1, 3, 0, 2)        # [2,2,hp,wp]

    cols = []
    deps = []
    for oy in range(4):
        sy, ry = divmod(oy, 2)
        for ox in range(4):
            sx, rx = divmod(ox, 2)
            c = cq[ry, rx, sy : sy + h2, sx : sx + w2]
            d = dq[ry, rx, sy : sy + h2, sx : sx + w2]
            cols.append(c)
            deps.append(d)
    cols = jnp.stack(cols)          # [16, h2, w2, 4]
    deps = jnp.stack(deps)          # [16, h2, w2]
    holes = cols[..., 3] <= 0.0

    nonhole = ~holes
    cnt = jnp.sum(nonhole, axis=0)
    depth_av = jnp.sum(jnp.where(nonhole, deps, 0.0), axis=0) / jnp.maximum(cnt, 1)

    keep = nonhole & (deps >= depth_av)
    wsum = jnp.sum(keep, axis=0).astype(depth.dtype)
    c_out = jnp.sum(jnp.where(keep[..., None], cols, 0.0), axis=0) / jnp.maximum(
        wsum, 1.0
    )[..., None]
    d_out = jnp.sum(jnp.where(keep, deps, 0.0), axis=0) / jnp.maximum(wsum, 1.0)
    c_out = jnp.concatenate([c_out[..., :3], jnp.ones_like(c_out[..., 3:4])], axis=-1)

    # all-hole windows (tsdf_inpaint.fs:59-68): keep the center depth; mark
    # r=-1 holes in front of geometry, background otherwise.
    # depth[2i, 2j] == dpad[1 + 2i, 1 + 2j] -> block i, parity 1
    d_center = dq[1, 1, :h2, :w2]
    empty = cnt == 0
    hole_color = jnp.where(
        (d_center < 1.0)[..., None],
        jnp.array([0.0, 0.0, 0.0, -1.0], depth.dtype),
        jnp.array([0.0, 1.0, 0.0, 0.0], depth.dtype),
    )
    c_out = jnp.where(empty[..., None], hole_color, c_out)
    d_out = jnp.where(empty, d_center, d_out)
    return c_out, d_out


def _band4(h2: int, hp: int) -> jnp.ndarray:
    """bf16[h2, hp]: row i selects padded tap rows {2i .. 2i+3} (the [-1..2]
    window around the 2x2 child in padded coords)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (h2, hp), 0)
    r = jax.lax.broadcasted_iota(jnp.int32, (h2, hp), 1)
    return ((r >= 2 * i) & (r <= 2 * i + 3)).astype(jnp.bfloat16)


def _band2(h2: int, hp: int, d: int) -> jnp.ndarray:
    """bf16[h2, hp]: row i selects padded tap rows {2i+2d, 2i+2d+1} — the
    d-quadrant half of the 4-row window."""
    i = jax.lax.broadcasted_iota(jnp.int32, (h2, hp), 0)
    r = jax.lax.broadcasted_iota(jnp.int32, (h2, hp), 1)
    return ((r >= 2 * i + 2 * d) & (r <= 2 * i + 2 * d + 1)).astype(jnp.bfloat16)


def _pick(h2: int, hp: int) -> jnp.ndarray:
    """bf16[h2, hp]: row i selects padded row 2i+1 (the window center —
    depth[2i, 2j] of the unpadded image)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (h2, hp), 0)
    r = jax.lax.broadcasted_iota(jnp.int32, (h2, hp), 1)
    return (r == 2 * i + 1).astype(jnp.bfloat16)


def _wsum(wr, wc, planes, precise=()):
    """Window-reduce [hp, wp, Q] with row/col weight matrices (MXU).

    Stage 1 runs bf16: the weights are 0/1 and every plane is either an
    integer count, an 8-bit color, or an 8-bit hi/lo depth part — all
    bf16-exact — with f32 accumulation. Stage 2's input is the f32 row
    sums; casting THOSE to bf16 silently re-rounds the hi/lo split (a
    4-tap d_hi sum needs 10 bits), so the planes listed in ``precise``
    (depth parts) contract in full f32 (HIGHEST) instead; counts stay
    exact in bf16 (integers <= 256) and colors keep their ~2^-9."""
    t = jnp.einsum("Ir,rcq->Icq", wr, planes.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    q = planes.shape[-1]
    fast = [i for i in range(q) if i not in precise]
    out = [None] * q
    if fast:
        of = jnp.einsum("Jc,Icq->IJq", wc, t[..., fast].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        for n, i in enumerate(fast):
            out[i] = of[..., n]
    if precise:
        op = jnp.einsum("Jc,Icq->IJq", wc.astype(jnp.float32),
                        t[..., list(precise)],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        for n, i in enumerate(precise):
            out[i] = op[..., n]
    return jnp.stack(out, axis=-1)


def inpaint_downsample_mm(color: jnp.ndarray, depth: jnp.ndarray):
    """``inpaint_downsample`` re-expressed as banded window matmuls.

    Identical semantics; the 16-tap parity-plane formulation deinterleaves
    lanes (measured 14 ms for ONE 720p level on the TPU — ~5 GB/s
    effective — and minutes of XLA compile). Here every tap aggregation is
    a 4-banded (or 2-banded quadrant) matmul on the MXU:

      pass 1: cnt / depth-sum over non-hole taps -> the window's depth_av.
      pass 2: the keep-test ``d >= depth_av`` couples each tap to its
        window's average, but a tap row r belongs to window floor(r/2)-d
        within quadrant d — so FOUR shifted nearest-upsamplings of
        depth_av give each (tap, quadrant) its window average, and the
        keep-masked sums become four 2x2-quadrant banded matmuls.

    Exactness: weights/indicators are 0/1 (bf16-exact); depth goes through
    an 8-bit hi/lo split (error ~2^-16); color carries bf16's ~2^-9 —
    inside the 8-bit source quantization.
    """
    h, w = depth.shape
    h2, w2 = h // 2, w // 2
    py = 3 - (h & 1)
    px = 3 - (w & 1)
    cpad = jnp.pad(color, ((1, py), (1, px), (0, 0)), mode="edge")
    dpad = jnp.pad(depth, ((1, py), (1, px)), mode="edge")
    hp, wp = dpad.shape

    nh = (cpad[..., 3] > 0.0).astype(jnp.float32)
    d_hi = jnp.floor(dpad * 256.0) * (1.0 / 256.0)
    d_lo = dpad - d_hi

    wr4 = _band4(h2, hp)
    wc4 = _band4(w2, wp)
    s1 = _wsum(wr4, wc4, jnp.stack([nh, nh * d_hi, nh * d_lo], axis=-1),
               precise=(1, 2))
    cnt = s1[..., 0]
    depth_av = (s1[..., 1] + s1[..., 2]) / jnp.maximum(cnt, 1.0)

    # per-quadrant window average at tap resolution: tap row r in quadrant
    # d belongs to window floor(r/2) - d -> repeat + shift (taps that fall
    # outside any window of a quadrant carry zero weight in its banded
    # matmul, so their clamped average value is irrelevant)
    hp2, wp2 = 2 * h2, 2 * w2
    avg_pad = jnp.pad(
        jnp.repeat(jnp.repeat(depth_av, 2, axis=0), 2, axis=1),
        ((2, hp - hp2), (2, wp - wp2)), mode="edge",
    )   # avg_pad[x] = depth_av[clip(floor((x - 2) / 2))]

    acc = 0.0
    for dy in (0, 1):
        wr2 = _band2(h2, hp, dy)
        for dx in (0, 1):
            wc2 = _band2(w2, wp, dx)
            # window avg seen by taps of this quadrant: tap row r belongs
            # to window floor(r/2) - dy (clamped into range at the edges —
            # out-of-range taps carry zero banded weight anyway)
            avg_q = avg_pad[2 - 2 * dy: 2 - 2 * dy + hp,
                            2 - 2 * dx: 2 - 2 * dx + wp]
            keep = (nh > 0.0) & (dpad >= avg_q)
            kf = keep.astype(jnp.float32)
            planes = jnp.concatenate(
                [
                    kf[..., None], (kf * d_hi)[..., None],
                    (kf * d_lo)[..., None],
                    kf[..., None] * cpad[..., :3],
                ],
                axis=-1,
            )   # [hp, wp, 6]
            acc = acc + _wsum(wr2, wc2, planes, precise=(1, 2))

    wsum = acc[..., 0]
    d_out = (acc[..., 1] + acc[..., 2]) / jnp.maximum(wsum, 1.0)
    rgb = acc[..., 3:6] / jnp.maximum(wsum, 1.0)[..., None]
    c_out = jnp.concatenate([rgb, jnp.ones_like(rgb[..., :1])], axis=-1)

    # all-hole windows: centre depth decides in-front-of-geometry vs
    # background (tsdf_inpaint.fs:59-68)
    pr = _pick(h2, hp)
    pc = _pick(w2, wp)
    d_center = (
        _wsum(pr, pc, jnp.stack([d_hi, d_lo], axis=-1), precise=(0, 1))
        .sum(axis=-1)
    )
    empty = cnt < 0.5
    hole_color = jnp.where(
        (d_center < 1.0)[..., None],
        jnp.array([0.0, 0.0, 0.0, -1.0], jnp.float32),
        jnp.array([0.0, 1.0, 0.0, 0.0], jnp.float32),
    )
    c_out = jnp.where(empty[..., None], hole_color, c_out)
    d_out = jnp.where(empty, d_center, d_out)
    return c_out, d_out


def build_pyramid(color: jnp.ndarray, depth: jnp.ndarray, num_lods: int,
                  mm: bool | None = None):
    """LOD chain starting at the rendered image (fillColors loop,
    recon_integration.cpp:299-321). Returns lists of per-LOD color/depth.
    ``mm``: use the banded-matmul downsample (default on accelerators;
    the 16-tap form stays as the oracle)."""
    if mm is None:
        mm = jax.default_backend() != "cpu"
    down = inpaint_downsample_mm if mm else inpaint_downsample
    colors = [color]
    depths = [depth]
    for _ in range(num_lods - 1):
        if min(colors[-1].shape[0], colors[-1].shape[1]) < 2:
            break
        c, d = down(colors[-1], depths[-1])
        colors.append(c)
        depths.append(d)
    return colors, depths


def colorfill_mm(colors: list[jnp.ndarray], depths: list[jnp.ndarray]) -> jnp.ndarray:
    """Coarse-to-fine ``colorfill`` (same selection rules as the oracle
    below) evaluated at native LOD resolutions.

    The per-screen-pixel form materializes six full-resolution LOD repeats
    plus six full-resolution upsamples and select-chains (~9 ms,
    resolution-independent). Here the result propagates down the pyramid:
    at level l the first-valid==l pixels take the reference's two-coarser
    blend (tsdf_colorfill.fs:42-51) evaluated on the level-l grid, and
    everything coarser arrives via one 2x GL resize of the level-(l+1)
    partial result. Total work ≈ two half-res passes.

    Documented deviation: selections and blends resolve on the level-l
    grid and are bilinearly upsampled, so fill-region transitions are
    2^l-pixel soft edges instead of per-screen-pixel hard picks (the
    affected pixels are inpainted holes by construction); non-hole pixels
    pass c0 through exactly, and background handling is identical."""
    h, w = depths[0].shape
    n = len(colors)
    lod0_hole = colors[0][..., 3] <= 0.0
    background = lod0_hole & (depths[0] >= 1.0)

    def uvw(hl, wl):
        uv = jnp.stack(
            jnp.meshgrid(
                (jnp.arange(wl, dtype=jnp.float32) + 0.5) / wl,
                (jnp.arange(hl, dtype=jnp.float32) + 0.5) / hl,
                indexing="xy",
            ),
            axis=-1,
        )
        w1 = jnp.linalg.norm(uv, axis=-1)
        return w1, 1.0 - w1

    t = None
    for l in range(n - 1, 0, -1):
        hl, wl = colors[l].shape[:2]
        l1 = min(l + 1, n - 1)
        l2 = min(l + 2, n - 1)
        c1 = resize2d_gl(colors[l1], (hl, wl)) if l1 != l else colors[l]
        c2 = resize2d_gl(colors[l2], (hl, wl)) if l2 != l else colors[l]
        w1, w2 = uvw(hl, wl)
        blend = (c1 * w1[..., None] + c2 * w2[..., None]) / (w1 + w2)[..., None]
        valid_l = colors[l][..., 3] > 0.0
        if t is None:
            t = blend
        else:
            t_up = resize2d_gl(t, (hl, wl))
            t = jnp.where(valid_l[..., None], blend, t_up)
    filled = resize2d_gl(t, (h, w)) if t is not None else colors[0]
    out = jnp.where(lod0_hole[..., None], filled, colors[0])
    out = jnp.where(background[..., None], colors[0], out)
    return out


def colorfill(colors: list[jnp.ndarray], depths: list[jnp.ndarray]) -> jnp.ndarray:
    """Resolve pass (tsdf_colorfill.fs:30-55): per pixel take the finest
    non-hole LOD; where that is coarser than LOD 0, blend the two
    next-coarser LODs bilinearly. Returns [H, W, 4].

    Background handling: the reference separates holes *in front of geometry*
    (LOD0 depth < 1, marked r=-1 by tsdf_inpaint.fs:59-68) from background
    (depth == far); it always writes gl_FragDepth from LOD0
    (tsdf_colorfill.fs:54) so background keeps far depth downstream. Since we
    return color only (callers keep the renderer's LOD0 depth), background
    pixels must stay transparent here — only geometry-adjacent holes are
    filled."""
    h, w = depths[0].shape
    n = len(colors)
    lod0_hole = colors[0][..., 3] <= 0.0
    background = lod0_hole & (depths[0] >= 1.0)

    # nearest-texel lookups of each LOD at every screen pixel (exact 2^l
    # pyramids become repeats — no gather; odd sizes fall back to indexing)
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    per_lod = []
    for l in range(n):
        hl, wl = colors[l].shape[:2]
        if hl << l == h and wl << l == w:
            img = jnp.repeat(jnp.repeat(colors[l], 1 << l, axis=0), 1 << l, axis=1)
        else:
            yl = jnp.clip((ys * hl) // h, 0, hl - 1)
            xl = jnp.clip((xs * wl) // w, 0, wl - 1)
            img = colors[l][yl[:, None], xl[None, :]]
        per_lod.append(img)
    stack = jnp.stack(per_lod)  # [n, H, W, 4]

    valid = stack[..., 3] > 0.0
    # first valid lod index per pixel
    first = jnp.argmax(valid, axis=0)
    any_valid = jnp.any(valid, axis=0)
    first = jnp.where(any_valid, first, n - 1)

    def select_by_first(arr):
        # per-pixel pick arr[first] as a select chain (take_along_axis is a
        # serialized per-element gather on TPU)
        out = arr[n - 1]
        for l in range(n - 2, -1, -1):
            out = jnp.where((first == l)[..., None], arr[l], out)
        return out

    base = select_by_first(stack)

    # blend of lods (first+1, first+2) with the reference's quirky weights
    # (tsdf_colorfill.fs:42-51: w1 = distance(texcoord, floor(texcoord))).
    # Each LOD is upsampled once via matmuls (== sample2d at texel centers)
    uv = jnp.stack(
        jnp.meshgrid(
            (jnp.arange(w, dtype=jnp.float32) + 0.5) / w,
            (jnp.arange(h, dtype=jnp.float32) + 0.5) / h,
            indexing="xy",
        ),
        axis=-1,
    )
    w1 = jnp.linalg.norm(uv, axis=-1)
    w2 = 1.0 - w1
    upsampled = [resize2d_gl(c, (h, w)) for c in colors]
    blends = []
    for l in range(n):
        l1 = min(l + 1, n - 1)
        l2 = min(l + 2, n - 1)
        c1 = upsampled[l1]
        c2 = upsampled[l2]
        blends.append((c1 * w1[..., None] + c2 * w2[..., None]) / (w1 + w2)[..., None])
    blend_stack = jnp.stack(blends)
    blended = select_by_first(blend_stack)

    out = jnp.where((first > 0)[..., None], blended, base)
    # background keeps the (transparent) miss pixel; only holes in front of
    # geometry get filled (see docstring)
    out = jnp.where(background[..., None], colors[0], out)
    return out
