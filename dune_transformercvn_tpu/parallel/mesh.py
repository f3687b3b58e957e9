"""Device-mesh construction and sharding specs for data-parallel training.

The reference's only parallelism is DDP over NCCL (train.py:123-127,
SURVEY §2.3).  The TPU-native equivalent is a 1-D ``jax.sharding.Mesh`` over
the "data" axis: batches are sharded along axis 0, parameters/optimizer state
are replicated, and gradient/metric reductions ride the ICI as ``psum``
collectives emitted by ``shard_map``.  Per-host input sharding replaces the
DDP DistributedSampler: the Batcher lays out each device's shard contiguously
(batcher.py), so no resharding collective is ever needed on the input path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"


def create_mesh(num_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices.

    ``num_devices`` mirrors ``Options.num_gpu``; values above the available
    device count are clamped (with a note), 0/None means all devices.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        if num_devices > len(devices):
            print(
                f"Requested {num_devices} devices but only {len(devices)} "
                f"available; clamping."
            )
            num_devices = len(devices)
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Inputs: sharded along axis 0 over the data axis."""
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """State: fully replicated."""
    return NamedSharding(mesh, PartitionSpec())


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """K-stacked batches ``[K, num_shards*b, ...]`` (multi-step dispatch):
    replicated along the scan axis, data-sharded along axis 1."""
    return NamedSharding(mesh, PartitionSpec(None, DATA_AXIS))


def shard_ids_of(devices_flat, process_index: int) -> list:
    """Positions along the data axis owned by ``process_index``.

    Pure core of :func:`local_shard_ids` (unit-testable with fake device
    records — only ``.process_index`` is consulted).  This is the DDP
    DistributedSampler's rank->rows mapping (reference train.py:123-127):
    shard s of the global batch belongs to the process hosting device s.
    """
    return [
        s for s, d in enumerate(devices_flat) if d.process_index == process_index
    ]


def local_shard_ids(mesh: Mesh) -> list:
    """Positions along the data axis owned by this process (multi-host)."""
    return shard_ids_of(mesh.devices.flat, jax.process_index())


def local_batch_rows(array: np.ndarray, num_shards: int, shard_ids: Sequence[int]) -> np.ndarray:
    """Rows of a ``[num_shards * per_shard, ...]`` global batch that this
    process must feed, concatenated in shard order (the host-local slice
    ``jax.make_array_from_process_local_data`` expects for a 1-D data mesh).
    """
    per_shard = array.shape[0] // num_shards
    return np.concatenate(
        [array[s * per_shard:(s + 1) * per_shard] for s in shard_ids]
    )
