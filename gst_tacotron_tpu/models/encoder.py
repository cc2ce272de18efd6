"""Text encoders (reference Taco1_Encoder / Taco2_Encoder; SURVEY.md §2.1)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import EncoderConfig
from .modules import CBHG, Conv1dBNStack, Prenet, mask_sequence
from .rnn import BiGRU


class Taco1Encoder(nn.Module):
    """embedding -> prenet -> CBHG -> (B, T, 2*gru_dim) encoder states."""

    cfg: EncoderConfig
    num_symbols: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, lengths: Optional[jnp.ndarray] = None,
                 *, train: bool = False, deterministic_prenet: bool = False):
        c = self.cfg
        x = nn.Embed(self.num_symbols, c.embedding_dim, dtype=self.dtype,
                     name="embedding")(tokens)
        x = Prenet(c.prenet_dims, c.prenet_dropout, dtype=self.dtype,
                   name="prenet")(x, deterministic=deterministic_prenet)
        x = CBHG(
            bank_k=c.cbhg_bank_k,
            bank_channels=c.cbhg_bank_channels,
            proj_channels=c.cbhg_proj_channels,
            highway_layers=c.cbhg_highway_layers,
            highway_dim=c.cbhg_highway_dim,
            gru_dim=c.cbhg_gru_dim,
            dtype=self.dtype,
            name="cbhg",
        )(x, lengths, train=train)
        return mask_sequence(x, lengths)


class Taco2Encoder(nn.Module):
    """embedding -> 3x conv5+BN -> BiGRU (Taco_Version=2 switch upstream)."""

    cfg: EncoderConfig
    num_symbols: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, lengths: Optional[jnp.ndarray] = None,
                 *, train: bool = False, deterministic_prenet: bool = False):
        c = self.cfg
        x = nn.Embed(self.num_symbols, c.embedding_dim, dtype=self.dtype,
                     name="embedding")(tokens)
        x = Conv1dBNStack([c.embedding_dim] * 3, kernel_size=5, dtype=self.dtype,
                          name="convs")(x, lengths, train=train)
        x, _ = BiGRU(c.cbhg_gru_dim, dtype=self.dtype, name="bigru")(x, lengths, train=train)
        return mask_sequence(x, lengths)
