"""Device mesh factory (SURVEY.md §2.3 "Communication backend").

The mesh has two axes:
  * ``data``  — utterance-level data parallelism (batches split across
    hosts/chips; gradients all-reduced by XLA over ICI/DCN),
  * ``model`` — tensor parallelism for the style-token attention, decoder
    projections and the WaveRNN sampler (BASELINE.json:5).

On a multi-host pod slice, call `initialize_distributed()` first (wraps
`jax.distributed.initialize`); single-process/virtual-device setups skip it.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host process-group init (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(model_parallelism: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """(data, model) mesh over all (or given) devices.

    `model_parallelism` must divide the device count; the data axis takes the
    rest. The model axis is laid out over adjacent device ids so TP
    collectives ride ICI neighbors, with DP crossing the slower links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallelism != 0:
        raise ValueError(
            f"model_parallelism={model_parallelism} does not divide {n} devices"
        )
    arr = np.array(devices).reshape(n // model_parallelism, model_parallelism)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def process_data_shard(mesh: Mesh) -> tuple:
    """(shard_index, num_shards) of the GLOBAL batch this process must load.

    With pure DP (model axis inside each process) every process owns a
    distinct contiguous data-row range -> classic per-process loader shards.
    When the model axis spans processes (cross-process tensor parallelism,
    e.g. a (data=1, model=2) mesh over 2 single-device processes) several
    processes cover the SAME data rows: the batch is replicated over `model`,
    so those processes must load IDENTICAL batch slices and share one shard
    index — `jax.process_count()` would silently halve the batch each rank
    binds to the cross-process sharding (the ADVICE-r4 device-corpus bug
    class, fixed here for the wire path).
    """
    if jax.process_count() <= 1:
        return 0, 1
    arr = mesh.devices  # (data, model)
    rows_by_proc: dict = {}
    for i in range(arr.shape[0]):
        for d in arr[i].ravel():
            rows_by_proc.setdefault(d.process_index, set()).add(i)
    groups = sorted({tuple(sorted(v)) for v in rows_by_proc.values()})
    for g in groups:
        if g[-1] - g[0] + 1 != len(g):
            raise ValueError(
                f"process data-rows not contiguous: {groups}; the loader "
                "yields contiguous global-batch slices")
    if len({len(g) for g in groups}) != 1:
        raise ValueError(f"uneven data-rows per process: {groups}")
    mine = tuple(sorted(rows_by_proc[jax.process_index()]))
    return groups.index(mine), len(groups)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate_tree(tree, mesh: Mesh):
    """Replicate a host-local tree onto every device of a (possibly multi-
    process) mesh. Values must be identical on every process (they are:
    init_state and checkpoint restore are deterministic per seed/step)."""
    rep = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                rep, np.asarray(x)), tree
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)


def place_tree(tree, shardings):
    """Place a host tree onto (possibly non-addressable) mesh devices.

    `shardings` is a matching pytree of NamedShardings. Single-process this
    is a device_put; multi-process it goes through make_array_from_callback,
    which asks each process only for its addressable shards — the only valid
    way to build a global array whose sharding spans processes (device_put
    would raise, and make_array_from_process_local_data expects pre-sliced
    local views; here every process holds the identical full host value).
    """
    if jax.process_count() > 1:
        def put(x, s):
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, s, lambda idx, _x=x: _x[idx])
        return jax.tree_util.tree_map(put, tree, shardings)
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict onto the mesh, batch dim over `data`.

    Single-process: a plain device_put with the global sharding. Multi-
    process: each host holds only its contiguous slice of the global batch
    (BucketedLoader's global-plan sharding), so the global jax.Array is
    assembled from process-local data — device_put with a sharding that
    spans non-addressable devices is not a valid way to build it.
    """
    sharding = data_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
