"""Multi-host data-parallel plumbing (single-process testable parts):
index-level batch sharding, global-batch placement, and loader slicing.
Reference equivalent: Accelerate's per-rank DataLoader + DDP input scatter
(accelerate_train.py:186-196)."""

import numpy as np
import jax
import jax.numpy as jnp

from genpercept_tpu.data.sampler import DataLoader, shard_batch_indices
from genpercept_tpu.parallel import batch_sharding, make_mesh, put_global_batch


def test_shard_batch_indices_partition():
    """Every global index appears exactly once across ranks, and the
    per-rank flat order matches the (accum, micro) reshape the train step
    performs: rank r holds micro-slice [r*per, (r+1)*per) of every accum
    chunk."""
    accum, world, micro_g = 3, 4, 8
    idx = list(range(accum * micro_g))
    per = micro_g // world
    shards = [shard_batch_indices(idx, accum, world, r) for r in range(world)]
    # disjoint cover
    all_idx = sorted(i for s in shards for i in s)
    assert all_idx == idx
    # reassembly: concatenating rank slices within each accum chunk
    # reproduces the global chunk
    for a in range(accum):
        chunk = []
        for r in range(world):
            s = shards[r][a * per : (a + 1) * per]
            chunk.extend(s)
        assert chunk == idx[a * micro_g : (a + 1) * micro_g]


def test_put_global_batch_single_process_matches_device_put():
    mesh = make_mesh(data=4, model=2, devices=jax.devices()[:8])
    batch = {
        "rgb_norm": jnp.arange(4 * 2 * 3, dtype=jnp.float32).reshape(4, 2, 3),
        "valid_mask": jnp.ones((4, 2), bool),
    }
    out = put_global_batch(batch, mesh, batch_axis=0)
    ref = jax.device_put(batch, batch_sharding(mesh, 0))
    for k in batch:
        assert out[k].sharding == ref[k].sharding, k
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(ref[k]))


def test_dataloader_propagates_worker_exceptions():
    """A decode/collate error in the prefetch thread must RAISE in the
    consumer — a silently dead worker would end iteration cleanly and turn
    a data bug into an infinite zero-batch training loop."""

    class BadDs:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise ValueError("corrupt sample")

    loader = DataLoader(BadDs(), [[0, 1]])
    try:
        list(loader)
        raise AssertionError("expected ValueError from worker")
    except ValueError as e:
        assert "corrupt sample" in str(e)


def test_dataloader_shard_loads_only_local_slice():
    """A sharded DataLoader touches only this rank's indices and yields the
    correctly ordered local flat batch."""

    touched = []

    class Ds:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            touched.append(i)
            return {"x": np.full((2,), i, np.float32)}

    accum, world, rank, micro_g = 2, 4, 1, 8
    global_batch = list(range(16))
    loader = DataLoader(Ds(), [global_batch], shard=(rank, world, accum))
    (batch,) = list(loader)
    per = micro_g // world
    expect = []
    for a in range(accum):
        chunk = global_batch[a * micro_g : (a + 1) * micro_g]
        expect.extend(chunk[rank * per : (rank + 1) * per])
    assert sorted(touched) == sorted(expect)
    np.testing.assert_array_equal(batch["x"][:, 0], np.asarray(expect, np.float32))
