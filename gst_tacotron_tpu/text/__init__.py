"""Text frontend: cleaning + char tokenization (SURVEY.md §2.1)."""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from .cleaners import CLEANERS, english_cleaners
from .symbols import EOS_ID, NUM_SYMBOLS, PAD_ID, SYMBOL_TO_ID, ID_TO_SYMBOL, SYMBOLS


def text_to_ids(text: str, cleaner: str = "english_cleaners") -> List[int]:
    """Clean and tokenize one transcript to char ids, appending EOS."""
    cleaned = CLEANERS[cleaner](text)
    ids = [SYMBOL_TO_ID[c] for c in cleaned if c in SYMBOL_TO_ID]
    ids.append(EOS_ID)
    return ids


def ids_to_text(ids: Sequence[int]) -> str:
    return "".join(
        ID_TO_SYMBOL[i]
        for i in ids
        if i not in (PAD_ID, EOS_ID) and i in ID_TO_SYMBOL
    )


def batch_text_to_ids(
    texts: Sequence[str],
    max_len: int | None = None,
    cleaner: str = "english_cleaners",
) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize and right-pad a batch. Returns (ids[B, L], lengths[B])."""
    seqs = [text_to_ids(t, cleaner) for t in texts]
    lengths = np.array([len(s) for s in seqs], dtype=np.int32)
    if max_len is None:
        max_len = int(lengths.max())
    out = np.full((len(seqs), max_len), PAD_ID, dtype=np.int32)
    for i, s in enumerate(seqs):
        out[i, : min(len(s), max_len)] = s[:max_len]
    lengths = np.minimum(lengths, max_len)
    return out, lengths


__all__ = [
    "text_to_ids",
    "ids_to_text",
    "batch_text_to_ids",
    "english_cleaners",
    "CLEANERS",
    "SYMBOLS",
    "NUM_SYMBOLS",
    "PAD_ID",
    "EOS_ID",
]
