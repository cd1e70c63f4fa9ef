"""Whole-frame pipeline orchestration.

The TPU equivalent of the reference's per-frame hot path
(kinect_client.cpp:580-614 ``draw3d``): update -> preprocess -> brick
occupancy -> TSDF integrate -> raymarch draw -> hole fill.

The frame is split into FOUR separately jitted stages (XLA still fuses
within each):

  1preprocess  sensor filtering + brick occupancy   (axis-independent)
  2integrate   brick-sparse TSDF + color fusion     (axis-independent)
  3recon       sweep raymarch renderer              (depends on static
                                                     (axis, flip) — at most 6
                                                     variants, and an axis
                                                     change recompiles ONLY
                                                     this stage)
  holefill     inpaint pyramid + colorfill          (axis-independent)

Splitting bounds compile time per program, caches each stage independently,
and keeps a rotating camera from recompiling anything but the renderer
(reference behaviour: shader programs are per-stage objects too). A fully
fused single-dispatch variant remains available (``PipelineConfig.fused``)
for minimum per-frame dispatch overhead once all variants are warm.

Stage names match the reference's TimerDatabase entries
(NetKinectArray.cpp:209-214, recon_integration.cpp:146-148) so the CSV
contract lines up; ``step_timed`` records them (device-synced) into
utils.timers.TimerDatabase.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..calibration.rig import RigCalibration
from ..utils.math import Bbox
from ..utils.timers import TimerDatabase
from ..ops import preprocess as pp
from ..ops import bricks as brick_ops
from ..ops import tsdf as tsdf_ops
from ..ops import tsdf_fast
from ..ops import raymarch as rm
from ..ops import raymarch_fast as rmf
from ..ops import inpaint


class PipelineConfig(NamedTuple):
    """Static configuration (kinect_client.cpp:86-92 defaults)."""

    voxel_size: float = 0.01
    brick_size: float = 0.1
    tsdf_limit: float = 0.01
    min_voxels_per_brick: int = 10
    render_width: int = 1280
    render_height: int = 720
    shade_mode: int = 0
    use_bricks: bool = True
    skip_space: bool = True
    fill_holes: bool = True
    num_lods: int = 6
    filter_textures: bool = True
    use_processed_depth: bool = True
    refine_boundary: bool = True
    tsdf_res: tuple[int, int, int] | None = None  # override ceil(bbox/voxel)
    # fast (MXU-structured) integration + sweep renderer (ops/tsdf_fast.py,
    # ops/raymarch_fast.py); requires a 16-aligned volume res
    fast_path: bool = True
    # occupied-brick capacity of the fast path. None = auto-sized from the
    # volume: min(nb, max(1024, nb // 4)) 16^3 blocks — ≥25% occupancy
    # headroom vs the reference's typical 3-5.5% (inc_bricks.glsl:51-56).
    # Exceeding the capacity is DETECTED (FrameOutput.occupied_bricks vs
    # FramePipeline.max_bricks; the app's watchdog raises) — never a silent
    # geometry drop.
    max_bricks: int | None = None
    sample_window: int = 64       # image window per brick (px)
    sweep_res: tuple[int, int] | None = None  # intermediate sweep grid
                                  # (None = derived from the render size)
    # gather-free calibration lookups in preprocessing (ops/warp.py); falls
    # back to the exact gather oracle when the rig's cv volumes are not
    # affine-in-depth within warp_tol
    use_warp: bool = True
    warp_tol: float = 1e-4
    # piecewise-linear-in-depth warp (ops/warp.PiecewiseWarp): the middle
    # tier for realistic (lens-distorted / NNI-baked) rigs whose rays are
    # curved — still gather-free (``warp_knots`` hat-weight FMAs). Used
    # when the affine fit fails warp_tol but the piecewise residual stays
    # under pw_warp_tol (xyz meters / uv normalized; 1e-3 ≈ 1 mm world,
    # 0.5 px color registration at Kinect res). 48 knots measured on the
    # Kinect-magnitude bench rig: xyz 8.0e-5, uv 5.5e-4 (32 knots left uv
    # at 1.04e-3 — just over the gate)
    warp_knots: int = 48
    pw_warp_tol: float = 1e-3
    # VMEM-fused Pallas TSDF integration (ops/tsdf_pallas.py). None = auto:
    # on for TPU backends when bricks are fine enough for its fixed windows
    # (>= 8 bricks per axis)
    use_pallas: bool | None = None
    # per-brick affine warp coefficients + persistent single-program kernel
    # (ops/tsdf_affine.py + ops/tsdf_persist.py) instead of the dense baked
    # warp table + grid kernel. None = auto: on whenever the Pallas path is
    # on AND the bake residual stays under affine_tol
    use_affine: bool | None = None
    affine_tol: float = 0.02   # max |fit - table| (normalized sensor units)
    # depth-band block cull (ops/tsdf_affine.block_depth_cull): drop
    # occupied blocks whose baked depth range cannot intersect any sensor's
    # truncation band — the reference's brick depth peel
    # (recon_integration.cpp:408-428) applied to integration. Per-block
    # VPU cost dominates the integrate kernel at high volume res
    # (docs/PERF.md); affine path only
    brick_cull: bool = True
    # one dispatch per frame instead of four (all stages in a single jit);
    # staged mode compiles much faster and recompiles only the renderer on
    # camera-axis changes
    fused: bool = False


class FrameOutput(NamedTuple):
    color: jnp.ndarray          # f32[H, W, 4] final image (hole-filled)
    depth: jnp.ndarray          # f32[H, W] window depth
    hit: jnp.ndarray            # bool[H, W]
    tsdf: jnp.ndarray           # f32[Vz, Vy, Vx]
    occupied_ratio: jnp.ndarray  # f32[] (≙ ReconIntegration::occupiedRatio)
    num_samples: jnp.ndarray    # i32[H, W] raymarch cost image
    occupied_bricks: jnp.ndarray  # i32[] occupied 16^3 blocks this frame —
                                  # compare against FramePipeline.max_bricks
                                  # (the reference reads exact counts back
                                  # every frame, recon_integration.cpp:
                                  # 430-445); 0 on the non-fast path


# reference timer names this pipeline can account for (BASELINE.md contract)
STAGE_TIMERS = ("1preprocess", "2integrate", "3recon", "holefill")


class FramePipeline:
    """Holds the rig + static config and exposes jitted frame stages.

    ≙ the composition of NetKinectArray::processTextures +
    ReconIntegration::{integrate, drawF} with camera matrices as per-call
    inputs (model/view from the navigator, kinect_client.cpp:537-567).

    ``log``: optional callable(str) for compile/progress reporting.
    """

    def __init__(self, rig: RigCalibration, cfg: PipelineConfig = PipelineConfig(),
                 log: Callable[[str], None] | None = None,
                 table_cache_dir: str | None = None):
        self.rig = rig
        self.bbox = rig.bbox
        self._log = log or (lambda s: None)
        self._table_cache_dir = table_cache_dir
        self._warp = None
        self._warp_hw = None
        for t in STAGE_TIMERS:
            TimerDatabase.instance().add_timer(t)
        self._configure(cfg)

    def _configure(self, cfg: PipelineConfig,
                   keep_warp_bake: bool = False) -> None:
        """(Re)build everything derived from the static config. With
        ``keep_warp_bake`` the baked voxel->sensor warp (affine coeffs or
        dense tables) survives — valid only when the volume res and rig are
        unchanged (retune of tsdf_limit / brick thresholds)."""
        table_cache_dir = self._table_cache_dir
        rig = self.rig
        self.cfg = cfg
        if cfg.tsdf_res is not None:
            self.tsdf_cfg = tsdf_ops.TsdfConfig(cfg.tsdf_res, cfg.tsdf_limit)
        else:
            # 16-aligned derivation keeps voxel-size-driven configs (.conf
            # files, retune()) on the brick-sparse fast path — the volume
            # is padded up to whole 16^3 bricks, never truncated
            self.tsdf_cfg = tsdf_ops.TsdfConfig.from_voxel_size(
                self.bbox, cfg.voxel_size, cfg.tsdf_limit,
                align=16 if (cfg.fast_path and cfg.use_bricks) else 1,
            )
        self.brick_grid = brick_ops.make_brick_grid(
            self.bbox, cfg.brick_size, cfg.voxel_size
        )
        self.pre_cfg = pp.PreprocessConfig(
            filter_textures=cfg.filter_textures,
            use_processed_depth=cfg.use_processed_depth,
            refine_boundary=cfg.refine_boundary,
        )
        vx, vy, vz = self.tsdf_cfg.res
        self.use_fast = bool(
            cfg.fast_path and cfg.use_bricks
            and vx % tsdf_fast.BRICK == 0 and vy % tsdf_fast.BRICK == 0
            and vz % tsdf_fast.BRICK == 0
        )
        nb_total = (
            (vx // tsdf_fast.BRICK) * (vy // tsdf_fast.BRICK)
            * (vz // tsdf_fast.BRICK)
        ) if self.use_fast else 0
        if cfg.max_bricks is not None:
            self.max_bricks = min(cfg.max_bricks, nb_total) if nb_total else cfg.max_bricks
        else:
            self.max_bricks = min(nb_total, max(1024, nb_total // 4)) if nb_total else 0
        if not keep_warp_bake:
            self.affine = None
            self.tables = None
            self._use_affine = False
        if self.use_fast and not keep_warp_bake:
            if self._use_pallas() and cfg.use_affine is not False:
                from ..ops import tsdf_affine

                self._log(
                    f"baking per-brick affine warp at {self.tsdf_cfg.res} ..."
                )
                aff = tsdf_affine.bake_affine(rig, self.tsdf_cfg)
                err = float(np.max(np.asarray(aff.max_err)))
                if cfg.use_affine or err <= cfg.affine_tol:
                    self.affine = aff
                    self._use_affine = True
                    self._log(f"  affine residual {err:.2e} (tol {cfg.affine_tol})")
                else:
                    self._log(
                        f"  affine residual {err:.2e} > tol {cfg.affine_tol};"
                        " falling back to the dense warp table"
                    )
            if not self._use_affine:
                self._log(
                    f"baking voxel->sensor warp tables at {self.tsdf_cfg.res} ..."
                )
                self.tables = tsdf_fast.tables_cached(
                    rig, self.tsdf_cfg, cache_dir=table_cache_dir
                )

        # dense-emit persistent kernel: requires whole 128-lane x-rows and
        # the affine (persistent-kernel) path; falls back to block-major +
        # XLA assembly otherwise
        self._dense_emit = bool(
            self.use_fast and self._use_affine and vx % 128 == 0
        )

        # Big calibration data (rig volumes, warp images, baked tables) is
        # passed as jit ARGUMENTS, never closed over: closure constants get
        # embedded into the serialized program (at 256^3 the warp table alone
        # is ~800 MB — the round-1 benchmark died on exactly this).
        self._step = jax.jit(self._step_impl, static_argnums=(7, 8))
        self._pre = jax.jit(self._pre_impl)
        self._integrate = jax.jit(self._integrate_impl)
        self._render = jax.jit(self._render_impl, static_argnums=(4, 5))
        self._fill = jax.jit(self._fill_impl)
        # bake caches keyed on the current warp data
        self._win_off_hw = None
        self._win_off = None
        self._tables_kernel = None
        self._cmats_full = None  # session-baked full coefficient table
        self._wy = None   # auto window height is a function of the bake
        self._wxs = None  # auto (x width, x stride) likewise
        self._cull_bake = None   # session CullBake (frame-invariant hulls)
        self._cull_hw = None

    def retune(self, voxel_size: float | None = None,
               brick_size: float | None = None,
               tsdf_limit: float | None = None,
               min_voxels_per_brick: int | None = None) -> None:
        """Mid-run parameter change (≙ ReconIntegration::setVoxelSize /
        setBrickSize / setTsdfLimit + divideBox, recon_integration.cpp:
        340-406,462-472, driven from the GUI at kinect_client.cpp:776-783).

        Rebuilds only what the change invalidates:
        * tsdf_limit / min_voxels_per_brick: jitted stages re-created (the
          constants are baked into the compiled programs) — the warp bake,
          pixel warp and brick grid survive.
        * brick_size: + brick grid rebuild.
        * voxel_size: + volume res re-derived from the bbox (any tsdf_res
          override is dropped, like the reference recomputes it) and the
          voxel->sensor warp re-baked.
        Recompiles are bounded to the touched stages; unchanged shapes hit
        XLA's compile cache."""
        cfg = self.cfg
        updates = {}
        if voxel_size is not None:
            updates["voxel_size"] = float(voxel_size)
            updates["tsdf_res"] = None
        if brick_size is not None:
            updates["brick_size"] = float(brick_size)
        if tsdf_limit is not None:
            updates["tsdf_limit"] = float(tsdf_limit)
        if min_voxels_per_brick is not None:
            updates["min_voxels_per_brick"] = int(min_voxels_per_brick)
        if not updates:
            return
        new_cfg = cfg._replace(**updates)
        res_changed = "voxel_size" in updates and (
            new_cfg.tsdf_res != cfg.tsdf_res or new_cfg.voxel_size != cfg.voxel_size
        )
        self._log(f"retune: {updates} (warp rebake: {res_changed})")
        self._configure(new_cfg, keep_warp_bake=not res_changed)

    def reload(self) -> None:
        """≙ the 'S' key shader reload (kinect_client.cpp:776-783): rebuild
        every jitted stage from source (XLA's cache makes unchanged code a
        cheap no-op recompile)."""
        self._configure(self.cfg, keep_warp_bake=True)

    def _get_warp(self, h: int, w: int):
        """Lazily bake the gather-free PixelWarp for the sensor resolution
        (first frame defines it), device-resident. Falls back to the gather
        oracle when the rig's cv volumes are not affine in depth within
        cfg.warp_tol. Host-side — call OUTSIDE jit traces."""
        if not self.cfg.use_warp:
            return None
        if self._warp_hw != (h, w):
            from ..ops.warp import bake_pixel_warp, bake_piecewise_warp

            self._log(f"baking pixel warp at {h}x{w} ...")
            warp = bake_pixel_warp(self.rig, h, w)
            if max(warp.max_err_xyz, warp.max_err_uv) > self.cfg.warp_tol:
                self._log(
                    f"  cv volumes not affine in depth (residual "
                    f"xyz={warp.max_err_xyz:.2e} uv={warp.max_err_uv:.2e} > "
                    f"{self.cfg.warp_tol}); trying piecewise warp"
                )
                warp = bake_piecewise_warp(
                    self.rig, h, w, knots=self.cfg.warp_knots
                )
                if max(warp.max_err_xyz, warp.max_err_uv) > self.cfg.pw_warp_tol:
                    self._log(
                        f"  piecewise warp ({self.cfg.warp_knots} knots) "
                        f"residual xyz={warp.max_err_xyz:.2e} "
                        f"uv={warp.max_err_uv:.2e} > {self.cfg.pw_warp_tol}; "
                        "using exact gather path"
                    )
                    warp = None
                else:
                    self._log(
                        f"  piecewise warp ({self.cfg.warp_knots} knots) "
                        f"residual xyz={warp.max_err_xyz:.2e} "
                        f"uv={warp.max_err_uv:.2e}"
                    )
                    warp = warp._replace(
                        xyz_a=jnp.asarray(warp.xyz_a),
                        xyz_b=jnp.asarray(warp.xyz_b),
                        uv_a=jnp.asarray(warp.uv_a),
                        uv_b=jnp.asarray(warp.uv_b),
                        xyz_r=jnp.asarray(warp.xyz_r),
                        uv_r=jnp.asarray(warp.uv_r),
                    )
            else:
                warp = warp._replace(
                    xyz_a=jnp.asarray(warp.xyz_a), xyz_b=jnp.asarray(warp.xyz_b),
                    uv_a=jnp.asarray(warp.uv_a), uv_b=jnp.asarray(warp.uv_b),
                )
            self._warp = warp
            self._warp_hw = (h, w)
        return self._warp

    def _rig_for_step(self, warp):
        """The rig pytree handed to the jitted stages. With the pixel warp
        active on the fast path, the stages touch only depth_limits / bbox /
        camera_positions — swap the cv volumes for 1-texel dummies so the
        jit call doesn't ship ~434 MB of unused arguments to the device
        (minutes through a remote tunnel, and HBM residency besides)."""
        if warp is None or not self.use_fast:
            return self.rig
        if getattr(self, "_slim_rig", None) is None:
            import jax.numpy as jnp

            k = self.rig.num_sensors
            self._slim_rig = self.rig._replace(
                cv_xyz=jnp.zeros((k, 1, 1, 1, 3), jnp.float32),
                cv_uv=jnp.zeros((k, 1, 1, 1, 2), jnp.float32),
                cv_xyz_inv=jnp.zeros((k, 1, 1, 1, 3), jnp.float32),
            )
        return self._slim_rig

    def _sweep_res(self) -> tuple[int, int]:
        if self.cfg.sweep_res is not None:
            return self.cfg.sweep_res

        def rnd(n):
            return max(128, min(512, -(-n // 128) * 128))

        return (rnd(self.cfg.render_height), rnd(self.cfg.render_width))

    # -- stage implementations (pure) -------------------------------------

    def _pre_impl(self, depth_m, color, rig, warp, cull_bake=None):
        """1preprocess: sensor filtering + brick occupancy (device-resident,
        replacing the reference's GPU->CPU brick readback). ``cull_bake``:
        session CullBake (ops/tsdf_affine.bake_cull) — the cull's
        frame-invariant hull/flag tensors; None re-derives them in-trace
        (external callers, small test volumes)."""
        cfg = self.cfg
        frames = pp.preprocess(depth_m, color, rig, self.pre_cfg, warp)
        mask = None
        vox_mask = None
        mask16 = None
        cls = None
        occupied = jnp.float32(1.0)
        if cfg.use_bricks:
            if self._use_pallas():
                from ..ops.bricks_pallas import mark_bricks_pallas

                counts = mark_bricks_pallas(
                    frames.world, frames.world_valid, self.brick_grid
                )
            else:
                counts = brick_ops.mark_bricks(
                    frames.world, frames.world_valid, self.brick_grid
                )
            mask = brick_ops.occupancy_mask(counts, cfg.min_voxels_per_brick)
            occupied = brick_ops.occupied_ratio(mask)
            if self.use_fast:
                # the fast path consumes only the 16^3-block mask — the
                # full voxel grid is never materialized
                mask16 = brick_ops.block_occupancy(
                    mask, self.brick_grid, self.tsdf_cfg.res, tsdf_fast.BRICK
                )
                if cfg.brick_cull and self._use_affine:
                    from ..ops.tsdf_affine import (
                        block_depth_cull, block_depth_cull_baked,
                    )

                    if cull_bake is not None:
                        mask16, _, cls = block_depth_cull_baked(
                            mask16, cull_bake, frames.depth[..., 0],
                            frames.quality, frames.silhouette,
                            float(self.tsdf_cfg.limit),
                        )
                    else:
                        mask16, _, cls = block_depth_cull(
                            mask16, self.affine, frames.depth[..., 0],
                            frames.quality, frames.silhouette,
                            float(self.tsdf_cfg.limit),
                        )
            else:
                vox_mask = brick_ops.voxel_occupancy(
                    mask, self.brick_grid, self.tsdf_cfg.res
                )
        # exact occupied-16^3-block count (the capacity unit of the fast
        # path) — surfaced so capacity overflow is detectable, like the
        # reference's per-frame count readback (recon_integration.cpp:430-445)
        n_occ = (jnp.sum(mask16.astype(jnp.int32)) if mask16 is not None
                 else jnp.int32(0))
        return frames, mask, vox_mask, mask16, occupied, n_occ, cls

    def _use_pallas(self) -> bool:
        if self.cfg.use_pallas is not None:
            return self.cfg.use_pallas
        vx, vy, vz = self.tsdf_cfg.res
        fine_enough = min(vx, vy, vz) // tsdf_fast.BRICK >= 8
        return fine_enough and jax.default_backend() == "tpu"

    def _integrate_impl(self, frames, mask16, tables, win_off=None,
                        tables_kernel=None, cls=None):
        """2integrate (fast path): brick-sparse fused TSDF + color volumes.
        ``tables`` is AffineTables (persistent kernel), or IntegrationTables
        (grid kernel / XLA path). ``cls``: per-(sensor, block) integration
        classes from block_depth_cull (dense-emit kernel sensor skips)."""
        vx, vy, vz = self.tsdf_cfg.res
        total_bricks = (vx // tsdf_fast.BRICK) * (vy // tsdf_fast.BRICK) * (
            vz // tsdf_fast.BRICK
        )
        if self._use_affine:
            if self._dense_emit:
                # dense-emit persistent kernel: the volume leaves the kernel
                # already in the sweep renderer's layout — color Z-MAJOR
                # bf16[Vz, 4, Vy, Vx] (sliced per z-plane with no relayout)
                # and bf16 TSDF (the rounding the sweep applies on entry
                # anyway) — no block->dense assembly pass and no per-frame
                # full-volume copies/converts (docs/PERF.md)
                from ..ops.tsdf_dense import integrate_dense_pallas

                wx, xstride = self._window_cols()
                return integrate_dense_pallas(
                    frames, tables, self.tsdf_cfg, mask16,
                    max_bricks=min(self.max_bricks, total_bricks),
                    win_off=win_off, wy=self._window_rows(),
                    wx=wx, xstride=xstride, cls=cls,
                    zmajor=True, vol_dtype=jnp.bfloat16,
                    cmats_full=tables_kernel,
                )
            from ..ops.tsdf_persist import integrate_affine_pallas

            return integrate_affine_pallas(
                frames, tables, self.tsdf_cfg, mask16,
                max_bricks=min(self.max_bricks, total_bricks),
                win_off=win_off, wy=self._window_rows(),
            )
        if self._use_pallas():
            from ..ops.tsdf_pallas import integrate_sparse_pallas

            return integrate_sparse_pallas(
                frames, tables, self.tsdf_cfg, mask16,
                max_bricks=min(self.max_bricks, total_bricks),
                win_off=win_off,
                tables_kernel=tables_kernel,
            )
        return tsdf_fast.integrate_sparse(
            frames, tables, self.tsdf_cfg, mask16,
            max_bricks=min(self.max_bricks, total_bricks),
            window=self.cfg.sample_window,
            win_off=win_off,
        )

    def _warp_data(self):
        """The baked warp in whichever form the integrate path consumes."""
        return self.affine if self._use_affine else self.tables

    def _kernel_tables(self):
        """Cached kernel-layout warp table (pure function of the rig and
        sensor size). Host-side cache — the result is passed as a jit
        ARGUMENT (a cached device array closed over at trace time would be
        serialized into the compile request).

        Affine dense-emit path: the session-baked FULL coefficient table
        (tsdf_dense.bake_cmats_kernel) — kills the per-frame occupied-brick
        gather/fold/pad (~1 ms at 512³, docs/PERF.md lever #2). None until
        the first _get_win_off reveals the sensor size (the kernel then
        falls back to per-frame gathering for that first dispatch)."""
        if not self.use_fast:
            return None
        if self._use_affine:
            if not self._dense_emit:
                return None
            if getattr(self, "_wy_sensor_h", None) is None:
                return None
            if getattr(self, "_cmats_full", None) is None:
                from ..ops.tsdf_dense import bake_cmats_kernel

                self._cmats_full = jax.jit(
                    bake_cmats_kernel, static_argnums=(1, 2)
                )(self.affine, self._wy_sensor_h, self._wx_sensor_w)
            return self._cmats_full
        if not self._use_pallas():
            return None
        if getattr(self, "_tables_kernel", None) is None:
            from ..ops.tsdf_pallas import kernel_tables

            self._tables_kernel = jax.jit(kernel_tables)(self.tables)
        return self._tables_kernel

    def _window_rows(self) -> int:
        """Auto-sized integration window height (ops/tsdf_affine
        .auto_window_rows): covers p99 of valid-brick footprints — the
        historical fixed 48 at 256^3, 32 at 512^3 (1/3 fewer sampling-
        matmul MACs and window-DMA bytes per brick). Cached; logs the
        oversized-footprint fraction once (those bricks edge-clamp exactly
        as they always have under the fixed window)."""
        if not (self._use_affine and self.use_fast):
            return 48
        if getattr(self, "_wy_sensor_h", None) is None:
            return 48   # sensor size unknown until the first _get_win_off
        if getattr(self, "_wy", None) is None:
            from ..ops.tsdf_affine import auto_window_rows

            self._wy, clip_frac = auto_window_rows(
                self.affine, self._wy_sensor_h
            )
            self._log(
                f"integration window: {self._wy} rows (valid bricks with "
                f"oversized footprints: {clip_frac:.2%} — close-to-sensor "
                f"frustum bricks that edge-clamp, as under the fixed "
                f"window; occupied-brick footprints are far smaller)"
            )
        return self._wy

    def _window_cols(self) -> tuple[int, int]:
        """Auto-sized integration x window (ops/tsdf_affine
        .auto_window_cols): (wx, xstride) = (64, 16) — the historical
        paired-channel full lane tile — or the half tile (32, stride 8 or
        4, channel-QUADDED so the window DMA slices stay full 128-lane
        tiles) when the p99 u footprint fits, e.g. 512^3 where footprints
        halve. Unlike wy (DMA bytes only), wx sets the sampling matmuls'
        output rows and the x-stage array heights — the kernel's two
        dominant compute terms. Dense-emit path only (the block-major
        fallback keeps the fixed layout)."""
        if not (self._use_affine and self.use_fast and self._dense_emit):
            return 64, 16
        if getattr(self, "_wx_sensor_w", None) is None:
            return 64, 16  # sensor size unknown until the first _get_win_off
        if getattr(self, "_wxs", None) is None:
            from ..ops.tsdf_affine import auto_window_cols

            wx, xstride, clip_frac = auto_window_cols(
                self.affine, self._wx_sensor_w
            )
            self._wxs = (wx, xstride)
            self._log(
                f"integration window: {wx} cols at stride {xstride} "
                f"(oversized-u footprints: {clip_frac:.2%})"
            )
        return self._wxs

    def _get_cull_bake(self, h: int, w: int):
        """Cached frame-invariant half of the depth-band block cull
        (ops/tsdf_affine.bake_cull): footprint hulls, covered cell ranges
        and flags — a pure function of the affine bake and sensor size.
        Passing it as a jit argument keeps the per-frame cull to depth
        mips + range reduce + compares (docs/PERF.md lever #2)."""
        if not (self.use_fast and self._use_affine and self.cfg.brick_cull):
            return None
        if getattr(self, "_cull_hw", None) != (h, w):
            from ..ops.tsdf_affine import bake_cull

            self._cull_bake = jax.jit(
                bake_cull, static_argnums=(1, 2, 3, 4, 5, 6)
            )(self.affine, h, w, float(self.tsdf_cfg.limit))
            self._cull_hw = (h, w)
        return self._cull_bake

    def _get_win_off(self, h: int, w: int):
        """Cached per-brick window origins for the sensor size (pure
        function of the calibration tables; ~1 ms to derive on device)."""
        if not self.use_fast:
            return None
        if getattr(self, "_win_off_hw", None) != (h, w):
            if self._use_affine:
                from ..ops.tsdf_affine import win_offsets_affine

                self._wy_sensor_h = h
                self._wx_sensor_w = w
                wx, xstride = self._window_cols()
                self._win_off = jax.jit(
                    win_offsets_affine, static_argnums=(1, 2, 3, 4, 5)
                )(self.affine, h, w, self._window_rows(), wx, xstride)
            elif self._use_pallas():
                from ..ops.tsdf_pallas import win_offsets_pallas

                self._win_off = jax.jit(
                    win_offsets_pallas, static_argnums=(1, 2)
                )(self.tables, h, w)
            else:
                self._win_off = jax.jit(
                    tsdf_fast.win_offsets, static_argnums=(1, 2, 3)
                )(self.tables, h, w, self.cfg.sample_window)
            self._win_off_hw = (h, w)
        return self._win_off

    def _render_impl(self, vol, cvol, mask16, cam_mats, axis, flip):
        """3recon (fast path): sweep-composited raymarch."""
        cfg = self.cfg
        modelview, proj = cam_mats
        cam = rm.RenderCamera(modelview, proj, cfg.render_width, cfg.render_height)
        n_slices = self.tsdf_cfg.res[axis]
        occ_slices = (
            rmf.slab_occupancy(mask16, axis, n_slices)
            if (cfg.skip_space and mask16 is not None) else None
        )
        return rmf.render_fast(
            vol, cvol, cam, self.bbox, self.tsdf_cfg.limit, axis, flip,
            rm.RenderParams(shade_mode=cfg.shade_mode),
            cfg=rmf.SweepConfig(res=self._sweep_res()),
            slab_occupied=occ_slices,
            zmajor=self._dense_emit,
        )

    def _fill_impl(self, color, depth):
        """holefill: inpaint pyramid + colorfill resolve."""
        pyr_c, pyr_d = inpaint.build_pyramid(color, depth, self.cfg.num_lods)
        if jax.default_backend() != "cpu":
            return inpaint.colorfill_mm(pyr_c, pyr_d)
        return inpaint.colorfill(pyr_c, pyr_d)

    def _step_impl(self, depth_m, color, modelview, proj, rig=None, warp=None,
                   tables=None, axis=2, flip=False, win_off=None,
                   tables_kernel=None, cull_bake=None) -> FrameOutput:
        """The fully fused single-program frame (cfg.fused; also the dense
        reference-faithful path when the fast path is disabled). ``rig``,
        ``warp`` and ``tables`` are data arguments (see __init__ note); None
        rig falls back to self.rig (small-volume test rigs only)."""
        cfg = self.cfg
        if rig is None:
            rig = self.rig
        if tables is None:
            tables = self._warp_data()
        frames, mask, vox_mask, mask16, occupied, n_occ, cls = self._pre_impl(
            depth_m, color, rig, warp, cull_bake
        )
        if self.use_fast:
            vol, cvol = self._integrate_impl(
                frames, mask16, tables, win_off, tables_kernel, cls
            )
            out = self._render_impl(vol, cvol, mask16, (modelview, proj), axis, flip)
        else:
            vol = tsdf_ops.integrate(frames, rig, self.tsdf_cfg, voxel_mask=vox_mask)
            cvol = tsdf_ops.integrate_colors(
                frames, rig, self.tsdf_cfg, voxel_mask=vox_mask
            )
            cam = rm.RenderCamera(modelview, proj, cfg.render_width, cfg.render_height)
            bsz_vol = self.brick_grid.brick_size / float(np.max(self.bbox.size))
            bext = np.asarray(self.brick_grid.res, np.float32) * self.brick_grid.brick_size \
                / self.bbox.size.astype(np.float32)
            out = rm.render(
                vol, cvol, frames, rig, cam, self.bbox, self.tsdf_cfg.limit,
                rm.RenderParams(shade_mode=cfg.shade_mode),
                brick_mask=mask if (cfg.skip_space and cfg.use_bricks) else None,
                brick_size_vol=bsz_vol,
                brick_extent=bext,
            )

        color_out = out.color
        if cfg.fill_holes:
            color_out = self._fill_impl(out.color, out.depth)

        return FrameOutput(
            color=color_out,
            depth=out.depth,
            hit=out.hit,
            tsdf=vol,
            occupied_ratio=occupied,
            num_samples=out.num_samples,
            occupied_bricks=n_occ,
        )

    # -- public API --------------------------------------------------------

    def check_capacity(self, out: FrameOutput) -> int:
        """Raise if the frame's occupied-brick count exceeded the fast
        path's capacity (geometry would have been dropped). Returns the
        count. ≙ the reference reading exact brick counts back every frame
        (recon_integration.cpp:430-445); here the count rides the normal
        output pytree, so this is the only host sync it costs."""
        n = int(np.asarray(out.occupied_bricks))
        if self.use_fast and n > self.max_bricks:
            raise RuntimeError(
                f"occupied bricks {n} exceed max_bricks={self.max_bricks}: "
                f"geometry dropped — raise PipelineConfig.max_bricks "
                f"(or leave it None to auto-size)"
            )
        return n

    def _pick_axis(self, modelview) -> tuple[int, bool]:
        return rmf.pick_axis(
            np.asarray(modelview), rm.vol_to_world_matrix(self.bbox)
        )

    def step(self, depth_m, color, modelview, proj) -> FrameOutput:
        """One frame. depth_m f32[K,H,W] meters; color f32[K,Hc,Wc,3];
        modelview/proj f32[4,4] row-major GL matrices (host numpy — the sweep
        axis is chosen host-side; only the render stage has per-axis jit
        variants)."""
        axis, flip = (2, False)
        if self.use_fast:
            axis, flip = self._pick_axis(modelview)
        warp = self._get_warp(depth_m.shape[1], depth_m.shape[2])
        win_off = self._get_win_off(depth_m.shape[1], depth_m.shape[2])
        cull_bake = self._get_cull_bake(depth_m.shape[1], depth_m.shape[2])
        depth_m = jnp.asarray(depth_m)
        color = jnp.asarray(color)
        modelview = jnp.asarray(modelview)
        proj = jnp.asarray(proj)

        if self.cfg.fused or not self.use_fast:
            return self._step(
                depth_m, color, modelview, proj, self._rig_for_step(warp), warp, self._warp_data(),
                axis, flip, win_off, self._kernel_tables(), cull_bake,
            )

        frames, mask, vox_mask, mask16, occupied, n_occ, cls = self._pre(
            depth_m, color, self._rig_for_step(warp), warp, cull_bake
        )
        vol, cvol = self._integrate(
            frames, mask16, self._warp_data(), win_off, self._kernel_tables(),
            cls,
        )
        out = self._render(vol, cvol, mask16, (modelview, proj), axis, flip)
        color_out = self._fill(out.color, out.depth) if self.cfg.fill_holes else out.color
        return FrameOutput(
            color=color_out, depth=out.depth, hit=out.hit, tsdf=vol,
            occupied_ratio=occupied, num_samples=out.num_samples,
            occupied_bricks=n_occ,
        )

    def step_timed(self, depth_m, color, modelview, proj) -> FrameOutput:
        """Like ``step`` but records per-stage device-synced wall times into
        TimerDatabase under the reference's stage names (BASELINE.md
        measurement contract). Adds sync points — use for profiling/CSV runs,
        not peak-fps loops."""
        db = TimerDatabase.instance()
        axis, flip = (2, False)
        if self.use_fast:
            axis, flip = self._pick_axis(modelview)
        warp = self._get_warp(depth_m.shape[1], depth_m.shape[2])
        win_off = self._get_win_off(depth_m.shape[1], depth_m.shape[2])
        cull_bake = self._get_cull_bake(depth_m.shape[1], depth_m.shape[2])
        depth_m = jnp.asarray(depth_m)
        color = jnp.asarray(color)
        modelview = jnp.asarray(modelview)
        proj = jnp.asarray(proj)

        if self.cfg.fused or not self.use_fast:
            with db.scope("3recon"):
                out = jax.block_until_ready(
                    self._step(
                        depth_m, color, modelview, proj,
                        self._rig_for_step(warp), warp,
                        self._warp_data(), axis, flip, win_off,
                        self._kernel_tables(), cull_bake,
                    )
                )
            return out

        with db.scope("1preprocess"):
            (frames, mask, vox_mask, mask16, occupied,
             n_occ, cls) = jax.block_until_ready(
                self._pre(depth_m, color, self._rig_for_step(warp), warp,
                          cull_bake)
            )
        with db.scope("2integrate"):
            vol, cvol = jax.block_until_ready(
                self._integrate(
                    frames, mask16, self._warp_data(), win_off,
                    self._kernel_tables(), cls,
                )
            )
        with db.scope("3recon"):
            out = jax.block_until_ready(
                self._render(vol, cvol, mask16, (modelview, proj), axis, flip)
            )
        if self.cfg.fill_holes:
            with db.scope("holefill"):
                color_out = jax.block_until_ready(self._fill(out.color, out.depth))
        else:
            color_out = out.color
        return FrameOutput(
            color=color_out, depth=out.depth, hit=out.hit, tsdf=vol,
            occupied_ratio=occupied, num_samples=out.num_samples,
            occupied_bricks=n_occ,
        )

    def warmup(self, depth_m, color, modelview, proj) -> None:
        """Compile every stage for the given shapes (one camera axis),
        logging per-stage compile progress."""
        import time

        axis, flip = (2, False)
        if self.use_fast:
            axis, flip = self._pick_axis(modelview)
        warp = self._get_warp(depth_m.shape[1], depth_m.shape[2])
        win_off = self._get_win_off(depth_m.shape[1], depth_m.shape[2])
        cull_bake = self._get_cull_bake(depth_m.shape[1], depth_m.shape[2])
        depth_m = jnp.asarray(depth_m)
        color = jnp.asarray(color)
        modelview = jnp.asarray(modelview)
        proj = jnp.asarray(proj)
        if self.cfg.fused or not self.use_fast:
            t0 = time.time()
            self._log("compiling fused frame step ...")
            jax.block_until_ready(
                self._step(
                    depth_m, color, modelview, proj,
                    self._rig_for_step(warp), warp,
                    self._warp_data(), axis, flip, win_off,
                    self._kernel_tables(), cull_bake,
                )
            )
            self._log(f"  fused step: {time.time()-t0:.1f}s")
            return
        t0 = time.time()
        self._log("compiling 1preprocess ...")
        pre = jax.block_until_ready(
            self._pre(depth_m, color, self._rig_for_step(warp), warp,
                      cull_bake)
        )
        self._log(f"  1preprocess: {time.time()-t0:.1f}s")
        frames, mask, vox_mask, mask16, occupied, n_occ, cls = pre
        t0 = time.time()
        self._log("compiling 2integrate ...")
        vol, cvol = jax.block_until_ready(
            self._integrate(
                frames, mask16, self._warp_data(), win_off,
                self._kernel_tables(), cls,
            )
        )
        self._log(f"  2integrate: {time.time()-t0:.1f}s")
        t0 = time.time()
        self._log(f"compiling 3recon (axis={axis} flip={flip}) ...")
        out = jax.block_until_ready(
            self._render(vol, cvol, mask16, (modelview, proj), axis, flip)
        )
        self._log(f"  3recon: {time.time()-t0:.1f}s")
        if self.cfg.fill_holes:
            t0 = time.time()
            self._log("compiling holefill ...")
            jax.block_until_ready(self._fill(out.color, out.depth))
            self._log(f"  holefill: {time.time()-t0:.1f}s")

    def warm_variants_async(self, depth_m, color, modelview, proj) -> None:
        """Background-compile the remaining ``(axis, flip)`` render
        variants (VERDICT r4 weak #3): a live orbit crossing a volume
        diagonal otherwise stalls 6-17 s on the first 3recon (or fused)
        compile of that variant. Runs the active dispatch mode's program
        for all 6 variants on a daemon thread — XLA's cache then makes the
        orbit's first real use of each variant a hit. Compiles are
        host/compile-server work; the handful of extra device renders
        (~10 ms each) briefly share the chip with the stream. Safe to call
        once after the first frame; subsequent calls no-op."""
        import threading

        if getattr(self, "_variants_thread", None) is not None:
            return

        def work():
            try:
                h, w = depth_m.shape[1], depth_m.shape[2]
                warp = self._get_warp(h, w)
                win_off = self._get_win_off(h, w)
                cull_bake = self._get_cull_bake(h, w)
                cur = self._pick_axis(modelview) if self.use_fast else (2, False)
                variants = [
                    (a, f) for a in (2, 0, 1) for f in (False, True)
                    if (a, f) != cur
                ]
                if self.cfg.fused or not self.use_fast:
                    for axis, flip in variants:
                        jax.block_until_ready(self._step(
                            depth_m, color, modelview, proj,
                            self._rig_for_step(warp), warp, self._warp_data(),
                            axis, flip, win_off, self._kernel_tables(),
                            cull_bake,
                        ))
                        self._log(f"warmed fused variant (axis={axis} flip={flip})")
                else:
                    (frames, mask, vox_mask, mask16, occupied, n_occ,
                     cls) = self._pre(
                        depth_m, color, self._rig_for_step(warp), warp,
                        cull_bake)
                    vol, cvol = self._integrate(
                        frames, mask16, self._warp_data(), win_off,
                        self._kernel_tables(), cls,
                    )
                    for axis, flip in variants:
                        jax.block_until_ready(self._render(
                            vol, cvol, mask16, (modelview, proj), axis, flip
                        ))
                        self._log(f"warmed 3recon variant (axis={axis} flip={flip})")
            except Exception as e:  # a retune mid-warm may orphan a stage
                self._log(f"variant warm aborted: {type(e).__name__}: {e}")

        t = threading.Thread(target=work, name="variant-warm", daemon=True)
        self._variants_thread = t
        t.start()

    def default_camera(self, eye=None) -> tuple[np.ndarray, np.ndarray]:
        """Convenience view/projection aimed at the volume center."""
        from ..utils.math import look_at, perspective

        center = (self.bbox.min + self.bbox.max) * 0.5
        if eye is None:
            eye = center + np.array([1.5, 0.8, 2.2], np.float32)
        mv = look_at(eye, center, [0, 1, 0])
        proj = perspective(
            50.0, self.cfg.render_width / self.cfg.render_height, 0.1, 200.0
        )
        return mv, proj
