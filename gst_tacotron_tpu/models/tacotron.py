"""GSTTacotron — the full seq2seq model (reference Model.py's GST_Tacotron
model graph; SURVEY.md §3.2/§3.3).

Composition:
    tokens -> Taco1Encoder -> encoder states (B, T, E)
    [GST: ref mel -> ReferenceEncoder -> StyleTokenLayer -> style (B, S)]
    [multi-speaker: speaker id -> embedding (B, P)]
    memory = concat([encoder states, broadcast style, broadcast speaker])
    memory -> Decoder (teacher-forced scan | AR scan) -> mel, stops, alignments
    mel -> PostCBHG -> linear spectrogram

The style/speaker embeddings are broadcast-concatenated to every encoder
frame, matching the reference's injection point (SURVEY.md §2.1 "STL").
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .decoder import Decoder
from .encoder import Taco1Encoder, Taco2Encoder
from .gst import GST
from .postnet import PostCBHG


class GSTTacotron(nn.Module):
    cfg: ModelConfig
    num_symbols: int
    dtype: jnp.dtype = jnp.float32

    @property
    def memory_dim(self) -> int:
        c = self.cfg
        dim = c.encoder.output_dim
        if c.gst.enabled:
            dim += c.gst.style_dim
        if c.num_speakers > 1:
            dim += c.speaker_dim
        return dim

    def setup(self):
        c = self.cfg
        enc_cls = {"taco1": Taco1Encoder, "taco2": Taco2Encoder}[c.encoder.kind]
        self.encoder = enc_cls(c.encoder, self.num_symbols, dtype=self.dtype)
        if c.gst.enabled:
            self.gst = GST(c.gst, c.num_mels, dtype=self.dtype)
        if c.num_speakers > 1:
            self.speaker_embedding = nn.Embed(c.num_speakers, c.speaker_dim,
                                              dtype=self.dtype)
        self.decoder = Decoder(
            c.decoder, c.attention, c.num_mels, self.memory_dim, dtype=self.dtype
        )
        self.postnet = PostCBHG(c.postnet, c.num_freq, dtype=self.dtype)

    def _build_memory(
        self,
        tokens: jnp.ndarray,
        token_lengths: Optional[jnp.ndarray],
        ref_mel: Optional[jnp.ndarray],
        ref_mel_lengths: Optional[jnp.ndarray],
        token_weights: Optional[jnp.ndarray],
        speaker_ids: Optional[jnp.ndarray],
        train: bool,
        deterministic_prenet: bool = False,
        precomputed_style: Optional[jnp.ndarray] = None,
    ):
        """precomputed_style: a (B, style_dim) style embedding computed
        OUTSIDE the flax GST module (e.g. the fused reference-encoder Pallas
        path, ops/refenc_pallas.py::gst_style_from_params); when given, the
        in-module GST is skipped and this embedding is concatenated instead."""
        c = self.cfg
        with jax.named_scope("encoder"):
            enc = self.encoder(tokens, token_lengths, train=train,
                               deterministic_prenet=deterministic_prenet)
        parts = [enc]
        aux: Dict[str, Any] = {}
        if c.gst.enabled:
            if precomputed_style is not None:
                style = precomputed_style
            else:
                with jax.named_scope("gst"):
                    style, style_attn = self.gst(
                        ref_mel, ref_mel_lengths, token_weights, train=train
                    )
                aux["style_attention"] = style_attn
            aux["style_embedding"] = style
            parts.append(
                jnp.broadcast_to(
                    style[:, None, :], (enc.shape[0], enc.shape[1], style.shape[-1])
                )
            )
        if c.num_speakers > 1:
            if speaker_ids is None:
                speaker_ids = jnp.zeros((enc.shape[0],), jnp.int32)
            spk = self.speaker_embedding(speaker_ids)
            parts.append(
                jnp.broadcast_to(
                    spk[:, None, :], (enc.shape[0], enc.shape[1], spk.shape[-1])
                )
            )
        memory = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else enc
        return memory, aux

    def __call__(
        self,
        tokens: jnp.ndarray,
        token_lengths: Optional[jnp.ndarray],
        mel_targets: jnp.ndarray,
        ref_mel: Optional[jnp.ndarray] = None,
        ref_mel_lengths: Optional[jnp.ndarray] = None,
        speaker_ids: Optional[jnp.ndarray] = None,
        token_weights: Optional[jnp.ndarray] = None,
        *,
        train: bool = False,
        deterministic_prenet: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Teacher-forced forward (training / eval losses).

        In the GST path the reference conditions on the TARGET mel as the
        reference signal during training (SURVEY.md §3.2); pass
        ref_mel=mel_targets for that behavior.
        """
        memory, aux = self._build_memory(
            tokens, token_lengths, ref_mel, ref_mel_lengths, token_weights,
            speaker_ids, train, deterministic_prenet,
        )
        with jax.named_scope("decoder_teacher_forced"):
            mel_out, stop_logits, alignments = self.decoder.teacher_forced(
                memory, token_lengths, mel_targets,
                deterministic_prenet=deterministic_prenet,
            )
        with jax.named_scope("postnet"):
            linear_out = self.postnet(mel_out, None, train=train)
        return {
            "mel": mel_out,
            "linear": linear_out,
            "stop_logits": stop_logits,
            "alignments": alignments,
            **aux,
        }

    def infer(
        self,
        tokens: jnp.ndarray,
        token_lengths: Optional[jnp.ndarray],
        ref_mel: Optional[jnp.ndarray] = None,
        ref_mel_lengths: Optional[jnp.ndarray] = None,
        speaker_ids: Optional[jnp.ndarray] = None,
        token_weights: Optional[jnp.ndarray] = None,
        *,
        max_steps: Optional[int] = None,
        deterministic_prenet: bool = False,
        precomputed_style: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Autoregressive synthesis (fused fixed-length scan; SURVEY.md §3.3)."""
        memory, aux = self._build_memory(
            tokens, token_lengths, ref_mel, ref_mel_lengths, token_weights,
            speaker_ids, False, deterministic_prenet,
            precomputed_style=precomputed_style,
        )
        with jax.named_scope("decoder_ar_scan"):
            mel_out, stop_logits, alignments, frame_lengths = self.decoder.decode(
                memory, token_lengths, max_steps=max_steps,
                deterministic_prenet=deterministic_prenet,
            )
        with jax.named_scope("postnet"):
            linear_out = self.postnet(mel_out, frame_lengths, train=False)
        return {
            "mel": mel_out,
            "linear": linear_out,
            "stop_logits": stop_logits,
            "alignments": alignments,
            "frame_lengths": frame_lengths,
            **aux,
        }
