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
