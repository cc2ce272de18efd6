"""Parallelism layer: mesh, shardings, collectives (SURVEY.md §2.3)."""

from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    data_sharding,
    initialize_distributed,
    make_mesh,
    place_tree,
    process_data_shard,
    replicate_tree,
    replicated,
    shard_batch,
)
from .sharding import (
    describe_sharding,
    param_shardings,
    place_state,
    shard_params,
    state_shardings,
)
from .distributed_synthesis import DistributedSynthesizer

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "data_sharding",
    "replicate_tree",
    "replicated",
    "shard_batch",
    "initialize_distributed",
    "param_shardings",
    "place_state",
    "place_tree",
    "process_data_shard",
    "shard_params",
    "state_shardings",
    "describe_sharding",
    "DistributedSynthesizer",
]
