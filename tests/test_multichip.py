"""Multi-device sharding on the virtual 8-device CPU mesh."""
import numpy as np
import jax

from rgbd_recon_tpu.parallel.sharding import make_mesh, sharded_step, shard_volume


def test_dryrun_multichip_contract():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_contract():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out.color)))


def test_shard_volume_layout():
    mesh = make_mesh(8)
    vol = np.zeros((32, 16, 16), np.float32)
    sharded = shard_volume(mesh, vol)
    assert sharded.sharding.num_devices == 8
    # each device holds a z-slab
    shard_shapes = {s.data.shape for s in sharded.addressable_shards}
    assert shard_shapes == {(4, 16, 16)}
