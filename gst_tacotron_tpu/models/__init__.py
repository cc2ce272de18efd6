"""Model modules (reference Modules.py + Model.py graphs; SURVEY.md §1 L4)."""

from .attention import (
    BahdanauAttention,
    LocationSensitiveAttention,
    alignment_diagonality,
    init_attention_state,
    make_attention,
)
from .decoder import Decoder, DecoderCell
from .encoder import Taco1Encoder, Taco2Encoder
from .gst import GST, ReferenceEncoder, StyleTokenLayer
from .modules import CBHG, Conv1dBNStack, Highway, Prenet
from .postnet import PostCBHG
from .rnn import GRU, BiGRU, GRUCell
from .tacotron import GSTTacotron

__all__ = [
    "GSTTacotron",
    "Taco1Encoder",
    "Taco2Encoder",
    "GST",
    "ReferenceEncoder",
    "StyleTokenLayer",
    "Decoder",
    "DecoderCell",
    "PostCBHG",
    "CBHG",
    "Conv1dBNStack",
    "Highway",
    "Prenet",
    "GRU",
    "BiGRU",
    "GRUCell",
    "BahdanauAttention",
    "LocationSensitiveAttention",
    "make_attention",
    "init_attention_state",
    "alignment_diagonality",
]
