"""Multi-host shard placement: deterministic tests of the rank->rows logic.

A real multi-process run is impossible in this sandbox, so the pure core of
the placement path (`parallel/mesh.py shard_ids_of` / `local_batch_rows`,
used by `Trainer._device_batch`) is pinned here against hand-computed
layouts — the TPU equivalent of DDP's DistributedSampler contract
(reference train.py:123-127): every global-batch row is fed by exactly one
process, in shard order.
"""

from types import SimpleNamespace

import numpy as np

from dune_transformercvn_tpu.parallel.mesh import local_batch_rows, shard_ids_of


def fake_devices(process_of):
    return [SimpleNamespace(process_index=p) for p in process_of]


def test_shard_ids_contiguous_two_process():
    # 8 devices, 4 per host (the standard v5e-8 two-host layout)
    devs = fake_devices([0, 0, 0, 0, 1, 1, 1, 1])
    assert shard_ids_of(devs, 0) == [0, 1, 2, 3]
    assert shard_ids_of(devs, 1) == [4, 5, 6, 7]


def test_shard_ids_interleaved_layout():
    # pathological (but legal) interleaved device-to-process assignment
    devs = fake_devices([0, 1, 0, 1])
    assert shard_ids_of(devs, 0) == [0, 2]
    assert shard_ids_of(devs, 1) == [1, 3]


def test_shard_ids_partition_is_exact():
    rng = np.random.default_rng(0)
    for _ in range(10):
        n_proc = int(rng.integers(1, 5))
        procs = rng.integers(0, n_proc, size=16)
        devs = fake_devices(procs.tolist())
        seen = []
        for p in range(n_proc):
            seen += shard_ids_of(devs, p)
        assert sorted(seen) == list(range(16))  # every shard fed exactly once


def test_local_batch_rows_two_process():
    num_shards, per_shard = 4, 3
    batch = np.arange(num_shards * per_shard * 2).reshape(num_shards * per_shard, 2)

    devs = fake_devices([0, 0, 1, 1])
    rows0 = local_batch_rows(batch, num_shards, shard_ids_of(devs, 0))
    rows1 = local_batch_rows(batch, num_shards, shard_ids_of(devs, 1))

    np.testing.assert_array_equal(rows0, batch[:6])   # shards 0,1
    np.testing.assert_array_equal(rows1, batch[6:])   # shards 2,3
    # the two processes' rows partition the global batch exactly, in order
    np.testing.assert_array_equal(np.concatenate([rows0, rows1]), batch)


def test_local_batch_rows_interleaved():
    num_shards, per_shard = 4, 2
    batch = np.arange(num_shards * per_shard)[:, None]
    devs = fake_devices([0, 1, 0, 1])
    rows0 = local_batch_rows(batch, num_shards, shard_ids_of(devs, 0))
    rows1 = local_batch_rows(batch, num_shards, shard_ids_of(devs, 1))
    np.testing.assert_array_equal(rows0.ravel(), [0, 1, 4, 5])  # shards 0,2
    np.testing.assert_array_equal(rows1.ravel(), [2, 3, 6, 7])  # shards 1,3


def test_single_process_degenerate():
    """Single process owns every shard: local rows == the whole batch (the
    path `Trainer._device_batch` takes on this sandbox's mesh)."""
    devs = fake_devices([0] * 8)
    ids = shard_ids_of(devs, 0)
    assert ids == list(range(8))
    batch = np.arange(40).reshape(40, 1)
    np.testing.assert_array_equal(local_batch_rows(batch, 8, ids), batch)


def test_local_shard_ids_hybrid_mesh_counts_data_rows():
    """On a hybrid (data, model) mesh, shard ids enumerate DATA rows (one
    per TP group), not flattened device positions."""
    import jax
    from dune_transformercvn_tpu.parallel.mesh import create_mesh, local_shard_ids

    mesh = create_mesh(8, model_parallel=2)           # (data=4, model=2)
    assert mesh.devices.shape == (4, 2)
    assert local_shard_ids(mesh) == [0, 1, 2, 3]      # single process owns all
    plain = create_mesh(8)                            # 1-D data mesh unchanged
    assert local_shard_ids(plain) == list(range(8))
