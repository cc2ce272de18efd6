"""Training losses (reference Model.py loss block; SURVEY.md §2.1 "Loss &
optimizer"): masked L1 on mel, masked L1 on linear with low-frequency
emphasis (keithito lineage), and stop-token BCE. Identical weighting is
config-driven for training parity."""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .config import AudioConfig, LossConfig


def sequence_mask(lengths: jnp.ndarray, time: int) -> jnp.ndarray:
    return (jnp.arange(time)[None, :] < lengths[:, None]).astype(jnp.float32)


def masked_l1(pred: jnp.ndarray, target: jnp.ndarray,
              mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    err = jnp.abs(pred - target)
    if mask is None:
        return jnp.mean(err)
    m = mask[..., None]
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m) * err.shape[-1], 1.0)


def linear_loss_weights(loss_cfg: LossConfig, audio_cfg: AudioConfig,
                        num_freq: int) -> jnp.ndarray:
    """Per-bin weights: 1 + extra weight below linear_lowfreq_hz."""
    freqs = jnp.linspace(0.0, audio_cfg.sample_rate / 2.0, num_freq)
    low = (freqs <= loss_cfg.linear_lowfreq_hz).astype(jnp.float32)
    w = 1.0 + loss_cfg.linear_lowfreq_weight * low
    return w / jnp.mean(w)


def stop_token_targets(mel_lengths: jnp.ndarray, time: int) -> jnp.ndarray:
    """1.0 at and after each utterance's last frame, else 0."""
    return (jnp.arange(time)[None, :] >= (mel_lengths[:, None] - 1)).astype(
        jnp.float32
    )


def compute_losses(
    outputs: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    loss_cfg: LossConfig,
    audio_cfg: AudioConfig,
    reduction_factor: Optional[int] = None,
) -> Dict[str, jnp.ndarray]:
    """Returns {"loss", "mel_loss", "linear_loss", "stop_loss"}."""
    # losses always accumulate in float32 (outputs may be bfloat16)
    outputs = {
        k: (v.astype(jnp.float32) if hasattr(v, "astype") else v)
        for k, v in outputs.items()
    }
    mel_lengths = batch.get("mel_lengths")
    time = outputs["mel"].shape[1]
    mask = sequence_mask(mel_lengths, time) if mel_lengths is not None else None

    mel_loss = masked_l1(outputs["mel"], batch["mel"], mask)

    wbins = linear_loss_weights(loss_cfg, audio_cfg, outputs["linear"].shape[-1])
    lin_err = jnp.abs(outputs["linear"] - batch["linear"]) * wbins[None, None, :]
    if mask is not None:
        m = mask[..., None]
        linear_loss = jnp.sum(lin_err * m) / jnp.maximum(
            jnp.sum(m) * lin_err.shape[-1], 1.0
        )
    else:
        linear_loss = jnp.mean(lin_err)

    if "stop_logits" in outputs and mel_lengths is not None:
        targets = stop_token_targets(mel_lengths, time)
        bce = optax_sigmoid_bce(outputs["stop_logits"], targets)
        if loss_cfg.stop_masked:
            # average only over real frames + a short post-stop window: the
            # unmasked mean trains on bucket padding and dilutes the stop
            # transition signal
            smask = sequence_mask(
                mel_lengths + loss_cfg.stop_mask_extra, time
            )
            stop_loss = jnp.sum(bce * smask) / jnp.maximum(jnp.sum(smask), 1.0)
        else:
            stop_loss = jnp.mean(bce)
    else:
        stop_loss = jnp.asarray(0.0)

    loss = (
        loss_cfg.mel_weight * mel_loss
        + loss_cfg.linear_weight * linear_loss
        + loss_cfg.stop_weight * stop_loss
    )
    out = {
        "loss": loss,
        "mel_loss": mel_loss,
        "linear_loss": linear_loss,
        "stop_loss": stop_loss,
    }
    if (loss_cfg.guided_attention_weight > 0.0 and "alignments" in outputs
            and mel_lengths is not None and "token_lengths" in batch):
        if reduction_factor is None:
            # fallback reconstruction for callers that predate the explicit
            # parameter; valid only while mel frames == r * decoder steps
            reduction_factor = max(time // outputs["alignments"].shape[1], 1)
        ga = guided_attention_loss(
            outputs["alignments"], batch["token_lengths"], mel_lengths,
            reduction_factor=reduction_factor,
            sigma=loss_cfg.guided_attention_sigma,
        )
        out["guided_loss"] = ga
        out["loss"] = loss + loss_cfg.guided_attention_weight * ga
    return out


def guided_attention_loss(alignments: jnp.ndarray, token_lengths: jnp.ndarray,
                          mel_lengths: jnp.ndarray, reduction_factor: int,
                          sigma: float) -> jnp.ndarray:
    """Soft-diagonal attention prior over (B, S_dec, T_enc) alignments.

    W[s, t] = 1 - exp(-(t/T_b - s/S_b)^2 / (2 sigma^2)) on valid cells
    (s < ceil(mel_len/r), t < token_len); loss = sum(A * W) / sum(A) — the
    W-weighted fraction of attention mass off the diagonal, in [0, 1]
    regardless of shape. Optional extension beyond the reference
    (LossConfig.guided_attention_weight, default 0 = off)."""
    a = alignments.astype(jnp.float32)
    _, s_dim, t_dim = a.shape
    dec_len = jnp.ceil(mel_lengths.astype(jnp.float32)
                       / reduction_factor)[:, None, None]
    enc_len = token_lengths.astype(jnp.float32)[:, None, None]
    s = jnp.arange(s_dim, dtype=jnp.float32)[None, :, None]
    t = jnp.arange(t_dim, dtype=jnp.float32)[None, None, :]
    w = 1.0 - jnp.exp(-jnp.square(t / enc_len - s / dec_len)
                      / (2.0 * sigma * sigma))
    valid = ((s < dec_len) & (t < enc_len)).astype(jnp.float32)
    return jnp.sum(a * w * valid) / jnp.maximum(jnp.sum(a * valid), 1e-6)


def optax_sigmoid_bce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable sigmoid BCE (max(x,0) - x*z + log1p(exp(-|x|)))."""
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
