"""Post-net: CBHG over predicted mel -> linear spectrogram
(reference Vocoder_Taco1 / post-CBHG; SURVEY.md §2.1 "Post-net")."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import PostnetConfig
from .modules import CBHG


class PostCBHG(nn.Module):
    cfg: PostnetConfig
    num_freq: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray, mel_lengths: Optional[jnp.ndarray] = None,
                 *, train: bool = False) -> jnp.ndarray:
        c = self.cfg
        x = CBHG(
            bank_k=c.cbhg_bank_k,
            bank_channels=c.cbhg_bank_channels,
            proj_channels=c.cbhg_proj_channels,
            highway_layers=c.cbhg_highway_layers,
            highway_dim=c.cbhg_highway_dim,
            gru_dim=c.cbhg_gru_dim,
            dtype=self.dtype,
            name="cbhg",
        )(mel, mel_lengths, train=train)
        return nn.Dense(self.num_freq, dtype=self.dtype, name="linear_proj")(x)
