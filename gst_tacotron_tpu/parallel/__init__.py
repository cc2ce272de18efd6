"""Parallelism layer: mesh, shardings, collectives (SURVEY.md §2.3)."""

from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    data_sharding,
    initialize_distributed,
    make_mesh,
    replicate_tree,
    replicated,
    shard_batch,
)
from .sharding import describe_sharding, param_shardings, shard_params
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
    "shard_params",
    "describe_sharding",
    "DistributedSynthesizer",
]
