"""Data layer: offline pattern prep + online bucketed loader (SURVEY.md L2/L3)."""

from .loader import Batch, BucketedLoader, PatternDataset, make_loader
from .pattern import (
    generate_patterns,
    synthetic_utterances,
    walk_ljspeech,
    walk_vctk,
)

__all__ = [
    "Batch",
    "BucketedLoader",
    "PatternDataset",
    "make_loader",
    "generate_patterns",
    "synthetic_utterances",
    "walk_ljspeech",
    "walk_vctk",
]
