"""Audio DSP layer (reference Audio.py; SURVEY.md §1 L1)."""

from .jax_dsp import (
    JaxDSP,
    amp_to_db,
    db_to_amp,
    denormalize_db,
    mulaw_decode,
    mulaw_encode,
    normalize_db,
    num_frames_for,
)
from .mel import mel_filterbank, mel_pseudo_inverse

__all__ = [
    "JaxDSP",
    "amp_to_db",
    "db_to_amp",
    "normalize_db",
    "denormalize_db",
    "mulaw_encode",
    "mulaw_decode",
    "num_frames_for",
    "mel_filterbank",
    "mel_pseudo_inverse",
]
