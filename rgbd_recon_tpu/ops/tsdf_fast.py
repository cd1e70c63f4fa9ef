"""MXU-structured brick-sparse TSDF fusion — the fast path.

The reference integrates by rasterizing one vertex per occupied-brick voxel
and letting the GPU's texture units do scattered image reads
(tsdf_integration.vs, recon_integration.cpp:242-269). TPUs have no texture
units: scattered gathers serialize. This module re-expresses the identical
math so the scattered reads become dense MXU matmuls:

1. The voxel -> sensor warp (cv_xyz_inv sampled at voxel centers) depends
   only on the calibration, so it is PRECOMPUTED once per (rig, volume res)
   as a dense table via a separable GL-exact trilinear resize — three
   einsum contractions, no gathers (``precompute_tables``).
2. Per frame, only occupied 16^3-voxel bricks are processed (a ``lax.scan``
   over a fixed-capacity occupied list). Each brick's projected image
   footprint is a small window; sampling every brick voxel inside that
   window is done with one-hot / hat interpolation-weight matrices
   multiplied against the window — the classic TPU gather-as-matmul trick.
   Depth uses NEAREST weights, quality/silhouette/registered-color use
   bilinear hat weights, matching the reference's GL sampler states
   (NetKinectArray.cpp:181-188).

Deviation from exact GL semantics (documented):
* per-voxel color reads the *registered* color image (preprocess already
  evaluated color(cv_uv(u, v, depth_px))) at the voxel's projection instead
  of re-evaluating cv_uv at the voxel depth. Inside the truncation band the
  two differ by sub-pixel parallax (|d_voxel - d_pixel| < limit).
* a brick whose footprint exceeds the static window (sensor closer than
  ~1 m to the brick) samples edge-clamped values; such voxels are inside
  the Kinect near-range anyway.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .preprocess import ProcessedFrames
from .tsdf import TsdfConfig
from ..calibration.rig import RigCalibration

BRICK = 16          # voxels per brick edge
# matmul precision for the depth/silhouette channels in sample_brick: the
# TPU bf16 default cannot carry the TSDF band (±2e-3 normalized depth) or
# the 0.9999 silhouette gate; bf16x3 (HIGH) gives ~2^-14 relative error at
# 3 passes — sufficient for the 1e-3 parity bar at half the cost of HIGHEST
PRECISE_CHANNELS_PRECISION = jax.lax.Precision.HIGH
# silhouette "fully inside" test: the shader compares sil < 1.0 against the
# GL interpolator (exact on constant windows); float matmul accumulation
# needs an epsilon
SIL_FULL = 0.9999


class IntegrationTables(NamedTuple):
    pos_calib: jnp.ndarray  # f32[K, Vz, Vy, Vx, 3] voxel -> (u, v, d_norm)


def _gl_resize_weights(n_src: int, n_dst: int) -> jnp.ndarray:
    """[n_dst, n_src] linear-interp matrix with GL half-texel semantics:
    dst texel m samples src at t = (m+.5)/n_dst -> c = clamp(t*n_src-.5)."""
    t = (np.arange(n_dst, dtype=np.float64) + 0.5) / n_dst
    c = np.clip(t * n_src - 0.5, 0.0, n_src - 1)
    i = np.arange(n_src, dtype=np.float64)
    w = np.clip(1.0 - np.abs(c[:, None] - i[None, :]), 0.0, 1.0)
    # rows touching the clamped border can double-count the edge texel
    w = w / w.sum(axis=1, keepdims=True)
    return jnp.asarray(w, jnp.float32)


def resize3d_gl(vol: jnp.ndarray, out_res: tuple[int, int, int]) -> jnp.ndarray:
    """Separable GL-exact trilinear resize [D,H,W,C] -> out_res (d,h,w order).
    Pure matmuls — replicates ``sample3d(vol, voxel_center_grid)``."""
    d2, h2, w2 = out_res
    wd = _gl_resize_weights(vol.shape[0], d2)
    wh = _gl_resize_weights(vol.shape[1], h2)
    ww = _gl_resize_weights(vol.shape[2], w2)
    # HIGHEST precision: the resized values are sensor coordinates/depths —
    # TPU bf16 matmul defaults would put ~2e-3 error on them (≈ the whole
    # TSDF truncation band in normalized depth). Bake-time only.
    prec = jax.lax.Precision.HIGHEST
    out = jnp.einsum("Dd,dhwc->Dhwc", wd, vol,
                     preferred_element_type=jnp.float32, precision=prec)
    out = jnp.einsum("Hh,Dhwc->DHwc", wh, out,
                     preferred_element_type=jnp.float32, precision=prec)
    out = jnp.einsum("Ww,DHwc->DHWc", ww, out,
                     preferred_element_type=jnp.float32, precision=prec)
    return out


def precompute_tables(rig: RigCalibration, cfg: TsdfConfig) -> IntegrationTables:
    """Bake the voxel->sensor warp for every sensor at the volume res.

    Equivalent to ``sample3d(cv_xyz_inv[k], voxel_centers)`` (the per-voxel
    lookup tsdf_integration.vs:31 does per frame) but hoisted out of the
    frame loop — it only changes when calibration or volume res change.
    """
    vx, vy, vz = cfg.res
    pos = jax.vmap(lambda v: resize3d_gl(v, (vz, vy, vx)))(rig.cv_xyz_inv)
    return IntegrationTables(pos_calib=pos)


def tables_cached(
    rig: RigCalibration, cfg: TsdfConfig, cache_dir: str | None = None
) -> IntegrationTables:
    """``precompute_tables`` with an optional on-disk cache.

    The baked warp table is pure function of (cv_xyz_inv, volume res) — at
    256^3 x 4 sensors it is ~800 MB and costs several device ops to build, so
    benchmark/app runs key it by content hash and memoize it under
    ``cache_dir`` (e.g. the repo's .jax_cache next to XLA's own cache)."""
    if cache_dir is None:
        return precompute_tables(rig, cfg)
    import hashlib
    import os

    src = np.asarray(rig.cv_xyz_inv)
    key = hashlib.sha1(
        src.tobytes() + repr(tuple(cfg.res)).encode()
    ).hexdigest()[:16]
    path = os.path.join(cache_dir, f"warp-{key}.npy")
    try:
        if os.path.exists(path):
            return IntegrationTables(pos_calib=jnp.asarray(np.load(path, mmap_mode="r")))
    except Exception:
        pass
    tables = precompute_tables(rig, cfg)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        np.save(path, np.asarray(tables.pos_calib))
    except Exception:
        pass
    return tables


def pack_frames(frames: ProcessedFrames) -> jnp.ndarray:
    """f32[K, H, W, 6]: depth | quality | silhouette | registered rgb."""
    return jnp.concatenate(
        [
            frames.depth[..., :1],
            frames.quality[..., None],
            frames.silhouette[..., None],
            frames.color_registered,
        ],
        axis=-1,
    )


def brick16_mask(voxel_mask: jnp.ndarray) -> jnp.ndarray:
    """Reduce a per-voxel occupancy mask to 16^3 bricks (any-voxel)."""
    vz, vy, vx = voxel_mask.shape
    m = voxel_mask.reshape(vz // BRICK, BRICK, vy // BRICK, BRICK, vx // BRICK, BRICK)
    return m.any(axis=(1, 3, 5))


def occupied_list(mask16: jnp.ndarray, max_bricks: int):
    """Fixed-capacity occupied-brick index list (device-resident — replaces
    the reference's GPU->CPU readback, recon_integration.cpp:430-445)."""
    flat = mask16.ravel()
    idx = jnp.nonzero(flat, size=max_bricks, fill_value=0)[0]
    n = jnp.sum(flat)
    valid = jnp.arange(max_bricks) < n
    return idx.astype(jnp.int32), valid


def _hat(coords: jnp.ndarray, n: int) -> jnp.ndarray:
    """[..., n] linear-interp weights at fractional window coords."""
    i = jax.lax.broadcasted_iota(jnp.float32, coords.shape + (n,), coords.ndim)
    return jnp.clip(1.0 - jnp.abs(coords[..., None] - i), 0.0, 1.0)


def _onehot(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    i = jax.lax.broadcasted_iota(jnp.int32, idx.shape + (n,), idx.ndim)
    return (idx[..., None] == i).astype(jnp.float32)


def integrate_sparse(
    frames: ProcessedFrames,
    tables: IntegrationTables,
    cfg: TsdfConfig,
    mask16: jnp.ndarray,
    max_bricks: int = 1024,
    window: int = 64,
):
    """Brick-sparse fused TSDF + color volumes.

    Returns (tsdf f32[Vz,Vy,Vx], color f32[Vz,Vy,Vx,4]). Voxels outside
    occupied bricks hold -limit / 0 (the clear values,
    recon_integration.cpp:249-250).
    """
    vx, vy, vz = cfg.res
    assert vx % BRICK == vy % BRICK == vz % BRICK == 0, "volume res must be 16-aligned"
    limit = jnp.float32(cfg.limit)
    packed = pack_frames(frames)  # [K, H, W, 6]
    num_k, h, w, _ = packed.shape
    win = window
    nb_x, nb_y = vx // BRICK, vy // BRICK

    idx_list, valid_list = occupied_list(mask16, max_bricks)

    vol0 = jnp.full((vz, vy, vx), -cfg.limit, jnp.float32)
    cvol0 = jnp.zeros((vz, vy, vx, 4), jnp.float32)

    corner_vals = packed[:, 0, 0, :]  # [K, 6] — GL clamp target for (-1,-1)

    def sample_brick(k, pc):
        """pc f32[B3, 3] -> (depth, qual, sil, rgb) each [B3(,3)]."""
        b3 = pc.shape[0]
        u, v = pc[:, 0], pc[:, 1]
        invalid = u < 0.0
        # linear (GL LINEAR) and nearest (GL NEAREST) coordinate spaces
        ux_l = jnp.clip(u * w - 0.5, 0.0, w - 1.0)
        vy_l = jnp.clip(v * h - 0.5, 0.0, h - 1.0)
        ux_n = jnp.clip(jnp.floor(u * w), 0.0, w - 1.0).astype(jnp.int32)
        vy_n = jnp.clip(jnp.floor(v * h), 0.0, h - 1.0).astype(jnp.int32)

        # center the window on the footprint: identical to a min-anchored
        # window when the footprint fits, halves the clamp error when a
        # too-close brick overflows it
        big = jnp.float32(1e9)
        ux_val = jnp.where(invalid, big, ux_l)
        vy_val = jnp.where(invalid, big, vy_l)
        x_mid = (jnp.min(ux_val) + jnp.max(jnp.where(invalid, -big, ux_l))) * 0.5
        y_mid = (jnp.min(vy_val) + jnp.max(jnp.where(invalid, -big, vy_l))) * 0.5
        x_lo = jnp.clip(jnp.floor(x_mid).astype(jnp.int32) - win // 2, 0, w - win)
        y_lo = jnp.clip(jnp.floor(y_mid).astype(jnp.int32) - win // 2, 0, h - win)

        wnd = jax.lax.dynamic_slice(
            packed, (k, y_lo, x_lo, 0), (1, win, win, 6)
        )[0]  # [win, win, 6]

        ux_l = jnp.clip(ux_l - x_lo, 0.0, win - 1.0)
        vy_l = jnp.clip(vy_l - y_lo, 0.0, win - 1.0)
        ux_n = jnp.clip(ux_n - x_lo, 0, win - 1)
        vy_n = jnp.clip(vy_n - y_lo, 0, win - 1)

        rows_l = _hat(vy_l, win)        # [B3, win]
        rows_n = _onehot(vy_n, win)     # [B3, win]
        # precision split: depth (the TSDF signal, band ±2e-3 normalized)
        # and silhouette (gated at 0.9999) cannot survive the TPU bf16
        # matmul default; quality/rgb can. The second contraction is an
        # elementwise mul+sum (f32 exact on the VPU).
        prec = PRECISE_CHANNELS_PRECISION
        lin = jnp.dot(
            rows_l,
            jnp.concatenate([wnd[:, :, 1:2], wnd[:, :, 3:6]], -1).reshape(win, win * 4),
            preferred_element_type=jnp.float32,
        ).reshape(b3, win, 4)
        sil_rows = jnp.dot(rows_l, wnd[:, :, 2],
                           preferred_element_type=jnp.float32, precision=prec)
        near = jnp.dot(rows_n, wnd[:, :, 0],
                       preferred_element_type=jnp.float32, precision=prec)

        cols_l = _hat(ux_l, win)
        cols_n = _onehot(ux_n, win)
        depth = jnp.sum(near * cols_n, axis=-1)
        qual = jnp.sum(lin[:, :, 0] * cols_l, axis=-1)
        sil = jnp.sum(sil_rows * cols_l, axis=-1)
        rgb = jnp.einsum("bwc,bw->bc", lin[:, :, 1:4], cols_l)

        cv = corner_vals[k]
        depth = jnp.where(invalid, cv[0], depth)
        qual = jnp.where(invalid, cv[1], qual)
        sil = jnp.where(invalid, cv[2], sil)
        rgb = jnp.where(invalid[:, None], cv[3:6], rgb)
        return depth, qual, sil, rgb

    def brick_block(bid):
        """One occupied brick -> (tsdf block, color block, start indices).
        Batched over the occupied list with vmap (the round-1 lax.scan over
        bricks serialized ~1024 small matmul steps; batching keeps the MXU
        fed and assembles the volume with ONE block scatter)."""
        bz = bid // (nb_y * nb_x)
        by = (bid // nb_x) % nb_y
        bx = bid % nb_x
        z0, y0, x0 = bz * BRICK, by * BRICK, bx * BRICK

        # TSDF state (tsdf_integration.vs:28-29)
        wt = jnp.full((BRICK**3,), cfg.limit, jnp.float32)
        tw = jnp.zeros((BRICK**3,), jnp.float32)
        # color state (tsdf_raymarch.fs:295-320)
        tc = jnp.zeros((BRICK**3, 3), jnp.float32)
        tcw = jnp.zeros((BRICK**3,), jnp.float32)
        tc2 = jnp.zeros((BRICK**3, 3), jnp.float32)
        tcw2 = jnp.zeros((BRICK**3,), jnp.float32)

        for k in range(num_k):
            pc = jax.lax.dynamic_slice(
                tables.pos_calib, (k, z0, y0, x0, 0), (1, BRICK, BRICK, BRICK, 3)
            ).reshape(BRICK**3, 3)
            depth, qual, sil, rgb = sample_brick(k, pc)
            sdist = pc[:, 2] - depth

            # silhouette gate (tsdf_integration.vs:33-39)
            skip = (sil < SIL_FULL) & (wt >= limit)
            in_front = sdist <= -limit
            in_band = (sdist > -limit) & (sdist < limit)
            new_tw = tw + qual
            accum = jnp.where(
                new_tw > 0.0,
                (wt * tw + qual * sdist) / jnp.where(new_tw > 0.0, new_tw, 1.0),
                wt,
            )
            wt_next = jnp.where(in_front, -limit, jnp.where(in_band, accum, wt))
            tw_next = jnp.where(in_band & (new_tw > 0.0), new_tw, tw)
            wt = jnp.where(skip, -limit, wt_next)
            tw = jnp.where(skip, tw, tw_next)

            # color blend terms
            dist = jnp.abs(depth - pc[:, 2])
            q_c = jnp.where(dist < limit, qual, 0.0)
            w_c = q_c / (dist + 0.01)
            tc = tc + rgb * w_c[:, None]
            tcw = tcw + w_c
            w2 = 1.0 / jnp.maximum(dist, 1e-9)
            tc2 = tc2 + rgb * w2[:, None]
            tcw2 = tcw2 + w2

        hasq = tcw > 0.0
        rgb_out = jnp.where(
            hasq[:, None],
            tc / jnp.maximum(tcw, 1e-20)[:, None],
            tc2 / jnp.maximum(tcw2, 1e-20)[:, None],
        )
        flag = jnp.where(hasq, 1.0, -1.0)
        cblock = jnp.concatenate([rgb_out, flag[:, None]], axis=-1)

        block = wt.reshape(BRICK, BRICK, BRICK)
        cblock = cblock.reshape(BRICK, BRICK, BRICK, 4)
        return block, cblock, jnp.stack([z0, y0, x0])

    blocks, cblocks, starts = jax.vmap(brick_block)(idx_list)

    # assemble with one block scatter; invalid entries get out-of-bounds
    # starts and are DROPPED (valid starts are unique by construction)
    oob = jnp.array([vz, vy, vx], jnp.int32)
    starts = jnp.where(valid_list[:, None], starts.astype(jnp.int32), oob)
    dn3 = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 1, 2),
    )
    dn4 = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3, 4), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 1, 2),
    )
    mode = jax.lax.GatherScatterMode.FILL_OR_DROP
    vol = jax.lax.scatter(
        vol0, starts, blocks, dn3, unique_indices=True, mode=mode
    )
    cvol = jax.lax.scatter(
        cvol0, starts, cblocks, dn4, unique_indices=True, mode=mode
    )
    return vol, cvol
