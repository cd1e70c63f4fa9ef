"""Block-major -> dense volume assembly as a Pallas DMA scatter.

The persistent integration kernel (ops/tsdf_persist.py) emits one 16^3
block per occupied brick in block-major order. Round 3 assembled the dense
volume with an XLA transpose over ALL blocks — a pure relayout measured at
11.6 ms/frame at 256^3 (35 GB/s effective on 16-element minor runs,
docs/PERF.md), the second-largest frame cost.

This kernel replaces it with direct DMA placement: the dense output is
pre-cleared to the clear values (one ~0.25 ms HBM fill), then ONE program
walks the occupied-brick list and issues one strided HBM->HBM copy per
brick per array — only occupied bricks move (~25 MB at 512 bricks instead
of a 384 MB full-volume rewrite), and the unoccupied region never gets
touched (the pre-clear IS its final value, replacing the old
``jnp.where(visited, ...)`` mask).

Layout contract (why this is copy-only, no compute):
  * source viewed [NB, 16, 16, 16]: the block content is z-major
    ([lz, ly, lx]) — a free metadata reshape of the kernel's [NB, 32, 128].
  * dest viewed [Vz, Vy, NBX, 16]: x split into (brick, lane) — also free,
    since NBX*16 == Vx contiguous. A brick lands at
    ``.at[ds(z0,16), ds(y0,16), bx]`` — every slice is on a NON-minor dim
    and the minor dim moves whole (Mosaic rejects minor-dim slices < 128
    on HBM memrefs, so dest indexing must never slice dim -1).
  * color moves as ONE 4D copy per brick ([NB, 4, 16^3] -> dense
    [4, Vz, Vy, Vx]): channel-major on both sides because a DMA cannot
    transpose; the sweep renderer consumes the channel-leading dense form
    directly (it resamples density and color together anyway).

The DMA queue is the pipeline: copies are issued NQ bricks deep and
drained round-robin, so the engine streams without per-brick sync.

Reference: the dense volume is the reference's ``volume_tsdf`` R32F image3D
(recon_integration.cpp:120-128, cleared to -limit at :249-250); the brick
list is its occupied-brick readback (:430-445).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tsdf_fast import BRICK

NQ = 8   # DMA pipeline depth (in-flight bricks)


def _kernel(
    # scalar prefetch
    count_ref,   # i32[1]
    z0_ref,      # i32[MB] brick z origin (voxels)
    y0_ref,      # i32[MB] brick y origin (voxels)
    bx_ref,      # i32[MB] brick x block index
    sel_ref,     # i32[MB] source block index per occupied slot
    # inputs
    src_v_ref,   # HBM f32[NB, 16, 16, 16]
    src_c_ref,   # HBM bf16[NB, 4, 16, 16, 16]
    in_v_ref,    # HBM f32[Vz, Vy, NBX, 16]   pre-cleared, aliased to out
    in_c_ref,    # HBM bf16[4, Vz, Vy, NBX, 16]
    # outputs (the aliased dense buffers)
    dst_v_ref,
    dst_c_ref,
    # scratch
    v_sems,      # DMA (NQ,)
    c_sems,      # DMA (NQ,)
):
    del in_v_ref, in_c_ref   # nothing reads the clear values in-kernel
    count = count_ref[0]

    def v_dma(b):
        return pltpu.make_async_copy(
            src_v_ref.at[sel_ref[b]],
            dst_v_ref.at[
                pl.ds(z0_ref[b], BRICK), pl.ds(y0_ref[b], BRICK), bx_ref[b]
            ],
            v_sems.at[jax.lax.rem(b, NQ)],
        )

    def c_dma(b):
        return pltpu.make_async_copy(
            src_c_ref.at[sel_ref[b]],
            dst_c_ref.at[
                :, pl.ds(z0_ref[b], BRICK), pl.ds(y0_ref[b], BRICK),
                bx_ref[b],
            ],
            c_sems.at[jax.lax.rem(b, NQ)],
        )

    def body(b, _):
        # drain the copies that used this queue slot NQ bricks ago
        @pl.when(b >= NQ)
        def _drain():
            v_dma(b - NQ).wait()
            c_dma(b - NQ).wait()

        v_dma(b).start()
        c_dma(b).start()
        return 0

    jax.lax.fori_loop(0, count, body, 0)

    # drain the tail (the last min(count, NQ) bricks are still in flight)
    def tail(i, _):
        @pl.when(i < jnp.minimum(count, NQ))
        def _w():
            b = count - jnp.minimum(count, NQ) + i
            v_dma(b).wait()
            c_dma(b).wait()

        return 0

    jax.lax.fori_loop(0, NQ, tail, 0)


def scatter_dense(
    vol_bm: jnp.ndarray,    # f32[NB, 32, 128] block-major TSDF
    cvol_bm: jnp.ndarray,   # bf16[NB, 4, 32, 128] block-major color
    idx_list: jnp.ndarray,  # i32[MB] occupied brick indices (prefix valid)
    count: jnp.ndarray,     # i32[] or i32[1] number of valid entries
    res: tuple[int, int, int],
    limit: float,
    interpret: bool = False,
):
    """Dense (tsdf f32[Vz,Vy,Vx], color bf16[4,Vz,Vy,Vx]) from block-major
    occupied bricks; unoccupied voxels hold the clear values
    (recon_integration.cpp:249-250). Color is CHANNEL-MAJOR (see module
    docstring)."""
    vx, vy, vz = res
    nbz, nby, nbx = vz // BRICK, vy // BRICK, vx // BRICK
    nb = nbz * nby * nbx
    assert vol_bm.shape[0] == nb and cvol_bm.shape[0] == nb

    src_v = vol_bm.reshape(nb, BRICK, BRICK, BRICK)
    src_c = cvol_bm.reshape(nb, 4, BRICK, BRICK, BRICK)

    # brick index -> voxel origins (block order is (bz, by, bx))
    idx_list = idx_list.astype(jnp.int32)
    bz = idx_list // (nby * nbx)
    by = (idx_list // nbx) % nby
    bx = idx_list % nbx
    z0 = (bz * BRICK).astype(jnp.int32)
    y0 = (by * BRICK).astype(jnp.int32)

    clear_v = jnp.full((vz, vy, nbx, BRICK), -limit, jnp.float32)
    clear_c = jnp.zeros((4, vz, vy, nbx, BRICK), jnp.bfloat16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,   # count, z0, y0, bx, sel
        grid=(1,),
        in_specs=[
            # HBM-pinned: under ANY the compiler may stage these in VMEM,
            # where 16-wide slices violate the (1, 128) tiling
            pl.BlockSpec(memory_space=pltpu.HBM),    # src_v
            pl.BlockSpec(memory_space=pltpu.HBM),    # src_c
            pl.BlockSpec(memory_space=pltpu.HBM),    # clear_v (aliased)
            pl.BlockSpec(memory_space=pltpu.HBM),    # clear_c (aliased)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((NQ,)),
            pltpu.SemaphoreType.DMA((NQ,)),
        ],
    )

    dst_v, dst_c = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((vz, vy, nbx, BRICK), jnp.float32),
            jax.ShapeDtypeStruct((4, vz, vy, nbx, BRICK), jnp.bfloat16),
        ],
        # operand numbering for aliases includes the scalar-prefetch args
        input_output_aliases={7: 0, 8: 1},
        interpret=interpret,
    )(count.reshape(1).astype(jnp.int32), z0, y0, bx, idx_list,
      src_v, src_c, clear_v, clear_c)

    return dst_v.reshape(vz, vy, vx), dst_c.reshape(4, vz, vy, vx)
