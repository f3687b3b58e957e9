"""Device-mesh construction and sharding specs for parallel training.

The reference's only parallelism is DDP over NCCL (train.py:123-127,
SURVEY §2.3).  The TPU-native equivalent is a 1-D ``jax.sharding.Mesh`` over
the "data" axis: batches are sharded along axis 0, parameters/optimizer state
are replicated, and gradient/metric reductions ride the ICI as ``psum``
collectives emitted by ``shard_map``.  Per-host input sharding replaces the
DDP DistributedSampler: the Batcher lays out each device's shard contiguously
(batcher.py), so no resharding collective is ever needed on the input path.

Beyond reference parity, ``model_parallel > 1`` adds a second "model" mesh
axis for tensor parallelism: the data axis stays *manual* (the shard_map body
with its tuned per-shard indices and explicit psums is unchanged) while the
model axis is *auto* — parameters and optimizer moments are laid out with
their channel axis sharded over "model" (:func:`state_shardings`) and XLA's
GSPMD pass partitions every matmul/conv and inserts the tensor-parallel
collectives.  This is the idiomatic TPU hybrid (manual DP + auto TP); the
reference has no model parallelism to match.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    num_devices: Optional[int] = None,
    devices: Optional[Sequence] = None,
    model_parallel: int = 1,
) -> Mesh:
    """Device mesh over the first ``num_devices`` devices.

    ``num_devices`` mirrors ``Options.num_gpu``; values above the available
    device count are clamped (with a note), 0/None means all devices.
    ``model_parallel > 1`` returns a 2-D ``(data, model)`` mesh whose data
    axis spans ``num_devices // model_parallel`` groups of ``model_parallel``
    adjacent devices (adjacent device ids share the fastest ICI links, where
    the tensor-parallel collectives live).
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
    mp = max(1, int(model_parallel))
    if mp > len(devices):
        # e.g. evaluating a TP-trained run's options.json on one device:
        # checkpoints are layout-independent, so fall back to no TP.
        print(
            f"model_parallel={mp} exceeds the {len(devices)} available "
            f"device(s); running without tensor parallelism."
        )
        mp = 1
    if mp > 1:
        if len(devices) % mp:
            raise ValueError(
                f"model_parallel={mp} does not divide the {len(devices)}-device mesh"
            )
        # Keep each TP group on one host: sort by (process, id) so a row of
        # ``mp`` adjacent devices shares a host whenever mp divides the
        # per-host device count.  TP collectives then ride the intra-host
        # ICI links, and host-local input feeding stays valid (a data shard
        # = a whole TP row on one process).  Cross-host TP (a row spanning
        # processes) is deliberately not built: on real pods DCN latency
        # makes per-layer TP collectives across hosts a losing layout.
        devices = sorted(devices, key=lambda d: (d.process_index, d.id))
        grid = np.asarray(devices).reshape(len(devices) // mp, mp)
        return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_axis_size(mesh: Mesh) -> int:
    """Number of data-parallel shards (mesh size on 1-D meshes)."""
    return mesh.shape[DATA_AXIS]


def is_hybrid(mesh: Mesh) -> bool:
    """True when the mesh carries a tensor-parallel "model" axis."""
    return MODEL_AXIS in mesh.axis_names


def tp_rows_process_local(mesh: Mesh) -> bool:
    """True when every TP group (mesh row) lives wholly on one process.

    This is the invariant the multi-host loop relies on: a data shard is a
    whole TP row, so host-local batch assembly/feeding is only correct when
    each row's devices share a ``process_index``.  :func:`create_mesh`
    arranges this whenever ``model_parallel`` divides the per-host device
    count; the Trainer verifies it instead of assuming.
    """
    if not is_hybrid(mesh):
        return True
    rows = mesh.devices.reshape(mesh.devices.shape[0], -1)
    return all(
        len({d.process_index for d in row}) == 1 for row in rows
    )


def state_shardings(state, mesh: Mesh, min_shard_dim: int = 8):
    """Per-leaf NamedShardings for a TrainState on a hybrid mesh.

    Rule: any leaf with >= 2 dims whose last (channel) dimension splits
    evenly over the model axis into pieces of at least ``min_shard_dim`` is
    sharded ``P(..., "model")`` — dense kernels ``[in, out]``, conv kernels
    ``[kh, kw, cin, cout]``, embeddings ``[vocab, dim]``, and the matching
    AdamW moments (same shapes) all get channel-sharded; 1-D scales/biases/
    BN statistics and scalars stay replicated.  GSPMD propagates these
    layouts through the whole step and inserts the TP collectives.
    """
    mp = mesh.shape[MODEL_AXIS]
    replicated = NamedSharding(mesh, PartitionSpec())

    def rule(leaf):
        shape = getattr(leaf, "shape", ())
        if (
            len(shape) >= 2
            and shape[-1] % mp == 0
            and shape[-1] // mp >= min_shard_dim
        ):
            spec = [None] * (len(shape) - 1) + [MODEL_AXIS]
            return NamedSharding(mesh, PartitionSpec(*spec))
        return replicated

    return jax.tree_util.tree_map(rule, state)


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
    """Positions along the DATA axis owned by this process (multi-host).

    On a hybrid ``(data, model)`` mesh a data shard is a whole TP row, so
    enumerate rows — not flattened device positions (which would yield
    ``data * model`` bogus ids).  Cross-host TP rows are rejected upstream
    (``loop.py``'s multi-process guard), so a row's process is its first
    device's.
    """
    rows = mesh.devices.reshape(mesh.devices.shape[0], -1)
    return shard_ids_of([row[0] for row in rows], jax.process_index())


def local_batch_rows(array: np.ndarray, num_shards: int, shard_ids: Sequence[int]) -> np.ndarray:
    """Rows of a ``[num_shards * per_shard, ...]`` global batch that this
    process must feed, concatenated in shard order (the host-local slice
    ``jax.make_array_from_process_local_data`` expects for a 1-D data mesh).
    """
    per_shard = array.shape[0] // num_shards
    return np.concatenate(
        [array[s * per_shard:(s + 1) * per_shard] for s in shard_ids]
    )
