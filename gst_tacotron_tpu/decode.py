"""Chunked early-exit autoregressive decoding.

`Decoder.decode` runs a fixed `max_decode_steps`-length scan — simple, one
compiled program, but when utterances stop early the tail steps are wasted
FLOPs. This module adds the TPU-native dynamic-stopping variant
(SURVEY.md §7 hard part 1 "early-exit only via while_loop trade-offs"):

    while (not all stopped) and (chunks remain):
        run a CHUNK_STEPS-long scan; write outputs at the chunk offset

The while_loop body contains a whole scan chunk, so the host is never in the
loop and the early-exit check costs one tiny reduction every CHUNK_STEPS
decoder steps. For distributed synthesis the stop test accepts an
`all_reduce` hook (e.g. a psum over the `data` mesh axis inside shard_map) so
all shards agree on termination — the "decode-loop state (stop-token flags)
exchanged via collectives" requirement (BASELINE.json:5, SURVEY.md §2.3).

Implemented OUTSIDE flax's lifted transforms: the decoder cell is invoked
through `model.apply(..., method=...)` — a pure function — inside raw
`lax.while_loop` / `lax.scan`, avoiding nn.scan-inside-nn.while_loop
composition issues.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .models.modules import length_mask
from .models.tacotron import GSTTacotron


def chunked_decode(
    model: GSTTacotron,
    variables: Dict[str, Any],
    memory: jnp.ndarray,
    memory_lengths: Optional[jnp.ndarray],
    rng: jax.Array,
    *,
    chunk_steps: int = 64,
    max_steps: Optional[int] = None,
    all_reduce: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    deterministic_prenet: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Returns {mel, stop_logits, alignments, frame_lengths, chunks_run}."""
    dec_cfg = model.cfg.decoder
    r = dec_cfg.reduction_factor
    num_mels = model.cfg.num_mels
    max_steps = max_steps or dec_cfg.max_decode_steps
    num_chunks = math.ceil(max_steps / chunk_steps)
    total_steps = num_chunks * chunk_steps

    b, t_mem, _ = memory.shape
    memory_mask = (
        length_mask(memory_lengths, t_mem) if memory_lengths is not None else None
    )

    def _keys(mdl, mem):
        return mdl.decoder.cell.precompute_keys(mem)

    def _init(mdl, mem):
        go = jnp.zeros((mem.shape[0], num_mels), mdl.decoder.cell.dtype)
        return mdl.decoder.cell.init_carry(mem.shape[0], mem.shape[1], go)

    def _step(mdl, carry):
        return mdl.decoder.cell(carry, None, memory, keys, memory_mask,
                                deterministic_prenet=deterministic_prenet)

    keys = model.apply(variables, memory, method=_keys)
    carry0 = model.apply(variables, memory, method=_init)

    mel_buf = jnp.zeros((b, total_steps * r, num_mels), jnp.float32)
    stop_buf = jnp.zeros((b, total_steps * r), jnp.float32)
    align_buf = jnp.zeros((b, total_steps, t_mem), jnp.float32)

    def scan_body(carry, step_key):
        carry2, (frames, stops, align) = model.apply(
            variables, carry, method=_step, rngs={"dropout": step_key}
        )
        return carry2, (frames, stops, align)

    def chunk_body(state):
        chunk_idx, carry, mel_buf, stop_buf, align_buf = state
        chunk_keys = jax.random.split(
            jax.random.fold_in(rng, chunk_idx), chunk_steps
        )
        carry, (frames, stops, aligns) = jax.lax.scan(
            scan_body, carry, chunk_keys
        )
        # (S, B, r*M) -> (B, S*r, M)
        mel = jnp.moveaxis(frames, 0, 1).reshape(b, chunk_steps * r, num_mels)
        stp = jnp.moveaxis(stops, 0, 1).reshape(b, chunk_steps * r)
        aln = jnp.moveaxis(aligns, 0, 1)
        off = chunk_idx * chunk_steps
        mel_buf = jax.lax.dynamic_update_slice(
            mel_buf, mel.astype(mel_buf.dtype), (0, off * r, 0))
        stop_buf = jax.lax.dynamic_update_slice(
            stop_buf, stp.astype(stop_buf.dtype), (0, off * r))
        align_buf = jax.lax.dynamic_update_slice(
            align_buf, aln.astype(align_buf.dtype), (0, off, 0))
        return chunk_idx + 1, carry, mel_buf, stop_buf, align_buf

    def cond(state):
        chunk_idx, carry = state[0], state[1]
        finished = carry["finished"]
        if all_reduce is not None:
            finished = all_reduce(finished)
        return jnp.logical_and(
            chunk_idx < num_chunks, jnp.logical_not(jnp.all(finished))
        )

    state = (jnp.asarray(0, jnp.int32), carry0, mel_buf, stop_buf, align_buf)
    chunks_run, carry, mel_buf, stop_buf, align_buf = jax.lax.while_loop(
        cond, chunk_body, state
    )

    if dec_cfg.use_stop_token:
        stopped = jax.nn.sigmoid(stop_buf) > dec_cfg.stop_threshold
        # ignore never-written tail (stop_buf==0 -> sigmoid 0.5), mask by
        # written region
        written = (
            jnp.arange(total_steps * r)[None, :]
            < chunks_run * chunk_steps * r
        )
        stopped = jnp.logical_and(stopped, written)
        any_stop = jnp.any(stopped, axis=1)
        first_stop = jnp.argmax(stopped, axis=1) + 1
        frame_lengths = jnp.where(
            any_stop, first_stop, chunks_run * chunk_steps * r
        ).astype(jnp.int32)
    else:
        frame_lengths = jnp.full((b,), chunks_run * chunk_steps * r, jnp.int32)

    fmask = length_mask(frame_lengths, mel_buf.shape[1])
    mel_buf = mel_buf * fmask[..., None].astype(mel_buf.dtype)
    return {
        "mel": mel_buf,
        "stop_logits": stop_buf,
        "alignments": align_buf,
        "frame_lengths": frame_lengths,
        "chunks_run": chunks_run,
    }


def data_parallel_stop_consensus(axis_name: str) -> Callable:
    """all_reduce hook: global AND of finished flags across a mesh axis
    (use inside shard_map; SURVEY.md §2.3 'Collectives for loop state')."""

    def reduce(finished: jnp.ndarray) -> jnp.ndarray:
        # all-finished on every shard iff the global min of per-shard
        # all(finished) is 1
        local_done = jnp.all(finished).astype(jnp.int32)
        global_done = jax.lax.pmin(local_done, axis_name)
        return jnp.broadcast_to(global_done.astype(jnp.bool_), finished.shape)

    return reduce
