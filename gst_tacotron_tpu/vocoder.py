"""Pluggable vocoder interface (SURVEY.md §7 stage 9: WaveRNN "pluggable
behind the same vocode interface as Griffin-Lim").

vocode(outputs) -> waveform (B, S):
  * "griffin_lim": invert the post-net LINEAR spectrogram on device.
  * "wavernn":     sample from the MEL with the neural vocoder.

`load_wavernn_variables` restores a VocoderTrainer checkpoint for inference;
`make_vocoder` builds the configured vocoder from a Config (+ optional
vocoder workdir), which is what the synthesize CLI calls.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .config import Config
from .dsp import JaxDSP
from .models.wavernn import WaveRNN


def check_vocoder_hop(cfg: Config) -> None:
    """wavernn_hop must equal the audio hop or WaveRNN conditioning
    upsampling silently misaligns with the mel frame rate (ADVICE r1)."""
    if cfg.model.vocoder.wavernn_hop != cfg.audio.hop_length:
        raise ValueError(
            f"model.vocoder.wavernn_hop={cfg.model.vocoder.wavernn_hop} != "
            f"audio.hop_length={cfg.audio.hop_length}; override both together"
        )


class GriffinLimVocoder:
    kind = "griffin_lim"

    def __init__(self, cfg: Config):
        self.dsp = JaxDSP(cfg.audio)

    def __call__(self, outputs: Dict[str, jnp.ndarray],
                 rng: Optional[jax.Array] = None) -> jnp.ndarray:
        return self.dsp.inv_linear_spectrogram(outputs["linear"])


class WaveRNNVocoder:
    kind = "wavernn"

    def __init__(self, cfg: Config, variables: Dict[str, Any],
                 use_pallas: bool = True):
        """use_pallas routes sampling through the fused Pallas kernel
        (ops/wavernn_pallas.py) on TPU; CPU always uses the scan sampler.
        Both paths are jitted ONCE here (per mel shape thereafter) — the
        axon runtime dispatches every eager op as its own program."""
        check_vocoder_hop(cfg)
        self.cfg = cfg
        self.model = WaveRNN(cfg.model.vocoder, cfg.model.num_mels)
        self.variables = variables
        self.use_pallas = use_pallas and jax.default_backend() not in ("cpu",)
        if self.use_pallas:
            from .ops.wavernn_pallas import pack_wavernn_weights
            from .utils.flatten import FlatTree

            self._packed_fp = FlatTree(pack_wavernn_weights(
                jax.device_get(variables["params"]), cfg.model.vocoder
            ))
            self._fp = FlatTree(variables)
            self._run_jit = jax.jit(self._run_pallas)
        else:
            self._run_jit = jax.jit(self._run_scan)

    def _run_pallas(self, flat, packed_flat, mel, rng):
        from .dsp.jax_dsp import mulaw_decode
        from .ops.wavernn_pallas import wavernn_sample_pallas

        variables = self._fp.unpack(flat)
        packed = self._packed_fp.unpack(packed_flat)
        cond = self.model.apply(variables, mel, method=self.model.upsample_cond)
        seed = jax.random.randint(rng, (), 0, 2 ** 31 - 1)
        classes = wavernn_sample_pallas(
            packed, cond, cfg=self.cfg.model.vocoder, seed=seed
        )
        return mulaw_decode(classes, self.cfg.model.vocoder.wavernn_bits)

    def _run_scan(self, variables, mel, rng):
        return self.model.apply(variables, mel, rng, method=self.model.sample)

    def __call__(self, outputs: Dict[str, jnp.ndarray],
                 rng: Optional[jax.Array] = None) -> jnp.ndarray:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        if self.use_pallas:
            return self._run_jit(self._fp.flat, self._packed_fp.flat,
                                 outputs["mel"], rng)
        return self._run_jit(self.variables, outputs["mel"], rng)


def load_wavernn_variables(cfg: Config, vocoder_workdir: str,
                           ckpt_dirname: str = "vocoder_ckpt"
                           ) -> Dict[str, Any]:
    """Restore the WaveRNN params saved by vocoder_train.VocoderTrainer."""
    import numpy as np

    from .checkpoint import CheckpointManager
    from .train import TrainState, make_optimizer

    model = WaveRNN(cfg.model.vocoder, cfg.model.num_mels)
    hop = cfg.model.vocoder.wavernn_hop
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, cfg.model.num_mels), jnp.float32),
        jnp.zeros((1, 2 * hop), jnp.float32),
    )
    tx = make_optimizer(cfg.optimizer)
    template = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats={},
        opt_state=tx.init(variables["params"]),
        rng=jax.random.PRNGKey(0),
    )
    ckpt = CheckpointManager(os.path.join(vocoder_workdir, ckpt_dirname))
    state = ckpt.restore(jax.device_get(template))
    return {"params": state.params}


def make_vocoder(cfg: Config,
                 wavernn_variables: Optional[Dict[str, Any]] = None,
                 vocoder_workdir: Optional[str] = None):
    kind = cfg.model.vocoder.kind
    if kind == "griffin_lim":
        return GriffinLimVocoder(cfg)
    if kind == "wavernn":
        if wavernn_variables is None:
            if vocoder_workdir is None:
                raise ValueError(
                    "wavernn vocoder needs trained variables or a "
                    "vocoder workdir to restore them from"
                )
            wavernn_variables = load_wavernn_variables(cfg, vocoder_workdir)
        return WaveRNNVocoder(cfg, wavernn_variables)
    raise ValueError(f"unknown vocoder kind {kind!r}")
