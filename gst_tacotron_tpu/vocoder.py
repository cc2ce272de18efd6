"""Pluggable vocoder interface (SURVEY.md §7 stage 9: WaveRNN "pluggable
behind the same vocode interface as Griffin-Lim").

vocode(outputs) -> waveform (B, S):
  * "griffin_lim": invert the post-net LINEAR spectrogram on device.
  * "wavernn":     sample from the MEL with the neural vocoder.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .config import Config
from .dsp import JaxDSP
from .models.wavernn import WaveRNN


class GriffinLimVocoder:
    def __init__(self, cfg: Config):
        self.dsp = JaxDSP(cfg.audio)

    def __call__(self, outputs: Dict[str, jnp.ndarray],
                 rng: Optional[jax.Array] = None) -> jnp.ndarray:
        return self.dsp.inv_linear_spectrogram(outputs["linear"])


class WaveRNNVocoder:
    def __init__(self, cfg: Config, variables: Dict[str, Any]):
        self.cfg = cfg
        self.model = WaveRNN(cfg.model.vocoder, cfg.model.num_mels)
        self.variables = variables

    def __call__(self, outputs: Dict[str, jnp.ndarray],
                 rng: Optional[jax.Array] = None) -> jnp.ndarray:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return self.model.apply(
            self.variables, outputs["mel"], rng, method=self.model.sample
        )


def make_vocoder(cfg: Config, wavernn_variables: Optional[Dict[str, Any]] = None):
    kind = cfg.model.vocoder.kind
    if kind == "griffin_lim":
        return GriffinLimVocoder(cfg)
    if kind == "wavernn":
        if wavernn_variables is None:
            raise ValueError("wavernn vocoder needs trained variables")
        return WaveRNNVocoder(cfg, wavernn_variables)
    raise ValueError(f"unknown vocoder kind {kind!r}")
