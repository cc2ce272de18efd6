"""Distributed batch synthesis over a device mesh (SURVEY.md §2.3;
BASELINE.json:5 "distributed synthesis ... decode-loop state exchanged via
collectives").

Two cooperating mechanisms:
  * GSPMD sharding (default): the jitted infer program receives the batch —
    tokens AND the GST conditioning inputs (reference mels / token weights /
    speaker ids) — sharded over the `data` axis with TP-ruled params; XLA
    inserts the collectives for the style-token attention / decoder
    projection shards.
  * Early-exit consensus (`chunked=True`): decoding runs the
    `decode.chunked_decode` while_loop under `shard_map`, with the
    pmin-based stop consensus (`data_parallel_stop_consensus`) deciding
    termination — every data shard exits the while_loop on the same chunk
    without any host round-trip. This is the production call path for the
    "decode-loop state (stop flags) exchanged via collectives" requirement.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..decode import chunked_decode, data_parallel_stop_consensus
from ..models.tacotron import GSTTacotron
from .mesh import DATA_AXIS, data_sharding
from .sharding import shard_params


class DistributedSynthesizer:
    """Mesh-sharded synthesis: utterances DP over `data`, params TP-ruled.

    A thin orchestration layer over the jitted infer program; tokenization
    and waveform writing stay host-side (see synthesize.Synthesizer for the
    single-chip fast path with the fused decode kernel).
    """

    def __init__(self, cfg: Config, model: GSTTacotron, variables: Dict[str, Any],
                 mesh: Mesh):
        self.cfg = cfg
        self.model = model
        self.mesh = mesh
        self.variables = {
            "params": shard_params(variables["params"], mesh),
            "batch_stats": jax.tree_util.tree_map(
                lambda x: jax.device_put(
                    x, NamedSharding(mesh, P())
                ),
                variables.get("batch_stats", {}),
            ),
        }
        self._batch_sharding = data_sharding(mesh)
        # pjit rejects kwargs with explicit in_shardings -> one compiled
        # program per (max_steps, input-presence) signature, cached
        self._infer_cache: Dict[Any, Any] = {}
        self._chunked_cache: Dict[Any, Any] = {}

    # -- GSPMD fixed-length path --------------------------------------------

    def _infer_for(self, max_steps: int, presence):
        key = (max_steps, presence)
        if key not in self._infer_cache:
            def fn(variables, tokens, token_lengths, ref_mel, ref_mel_lengths,
                   token_weights, speaker_ids, rng):
                return self.model.apply(
                    variables, tokens, token_lengths,
                    ref_mel=ref_mel, ref_mel_lengths=ref_mel_lengths,
                    token_weights=token_weights, speaker_ids=speaker_ids,
                    method=self.model.infer, rngs={"dropout": rng},
                    max_steps=max_steps,
                )
            bs = self._batch_sharding
            arg_sh = tuple(bs if p else None for p in presence)
            self._infer_cache[key] = jax.jit(
                fn, in_shardings=(None, bs, bs) + arg_sh + (None,),
            )
        return self._infer_cache[key]

    # -- chunked consensus path ---------------------------------------------

    def _chunked_for(self, max_steps: int, chunk_steps: int, presence,
                     deterministic_prenet: bool = False):
        """shard_map over `data`: per-shard encode + chunked decode whose
        while_loop condition is the pmin stop consensus."""
        if self.mesh.shape["model"] != 1:
            raise ValueError(
                "chunked consensus decoding shards over `data` with "
                "replicated params; build the mesh with model_parallelism=1"
            )
        key = (max_steps, chunk_steps, presence, deterministic_prenet)
        if key not in self._chunked_cache:
            model = self.model

            def local_fn(variables, tokens, token_lengths, ref_mel,
                         ref_mel_lengths, token_weights, speaker_ids, rng):
                # shard_map can't carry None leaves, so absent inputs arrive
                # as dummies; restore None per the (static) presence mask so
                # _build_memory picks the right GST conditioning path
                if not presence[0]:
                    ref_mel, ref_mel_lengths = None, None
                if not presence[2]:
                    token_weights = None
                if not presence[3]:
                    speaker_ids = None
                # decorrelate prenet dropout across shards
                rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
                memory, _aux = model.apply(
                    variables, tokens, token_lengths, ref_mel,
                    ref_mel_lengths, token_weights, speaker_ids, False,
                    deterministic_prenet,
                    method=model._build_memory, rngs={"dropout": rng},
                )
                out = chunked_decode(
                    model, variables, memory, token_lengths, rng,
                    chunk_steps=chunk_steps, max_steps=max_steps,
                    all_reduce=data_parallel_stop_consensus(DATA_AXIS),
                    deterministic_prenet=deterministic_prenet,
                )
                out["linear"] = model.apply(
                    variables, out["mel"], out["frame_lengths"], train=False,
                    method=lambda mdl, m, fl, train: mdl.postnet(
                        m, fl, train=train),
                )
                return out

            b = P(DATA_AXIS)
            arg_specs = tuple(b if p else P() for p in presence)
            out_specs = {
                "mel": b, "stop_logits": b, "alignments": b,
                "frame_lengths": b, "linear": b,
                # identical on every shard BY the consensus collective
                "chunks_run": P(),
            }
            fn = partial(
                jax.shard_map, mesh=self.mesh,
                in_specs=(P(), b, b) + arg_specs + (P(),),
                out_specs=out_specs, check_vma=False,
            )(local_fn)
            self._chunked_cache[key] = jax.jit(fn)
        return self._chunked_cache[key]

    # -- public API ---------------------------------------------------------

    def __call__(self, tokens: jnp.ndarray, token_lengths: jnp.ndarray,
                 ref_mel: Optional[jnp.ndarray] = None,
                 ref_mel_lengths: Optional[jnp.ndarray] = None,
                 token_weights: Optional[jnp.ndarray] = None,
                 speaker_ids: Optional[jnp.ndarray] = None,
                 seed: int = 0, max_steps: Optional[int] = None,
                 chunked: bool = False, chunk_steps: int = 64,
                 deterministic_prenet: bool = False):
        """tokens (B, L) with B divisible by the data-axis size; GST
        conditioning inputs are sharded over `data` alongside the batch."""
        steps = max_steps or self.cfg.model.decoder.max_decode_steps
        args = (jnp.asarray(tokens), jnp.asarray(token_lengths),
                None if ref_mel is None else jnp.asarray(ref_mel),
                None if ref_mel_lengths is None
                else jnp.asarray(ref_mel_lengths),
                None if token_weights is None else jnp.asarray(token_weights),
                None if speaker_ids is None else jnp.asarray(speaker_ids))
        presence = tuple(a is not None for a in args[2:])
        if chunked:
            if any(a is None for a in args[2:]):
                # shard_map can't take None leaves; feed zero-size dummies
                b = args[0].shape[0]
                dummies = (
                    jnp.zeros((b, 1, self.cfg.model.num_mels), jnp.float32),
                    jnp.ones((b,), jnp.int32),
                    jnp.zeros((b, self.cfg.model.gst.num_tokens), jnp.float32),
                    jnp.zeros((b,), jnp.int32),
                )
                args = args[:2] + tuple(
                    a if a is not None else d
                    for a, d in zip(args[2:], dummies)
                )
            fn = self._chunked_for(steps, chunk_steps, presence,
                                   deterministic_prenet)
        else:
            fn = self._infer_for(steps, presence)
        return fn(self.variables, *args, jax.random.PRNGKey(seed))

    # -- convenience front-end (same host prep as synthesize.Synthesizer) ----

    def synthesize(self, texts: Sequence[str],
                   reference_wavs: Optional[Sequence[np.ndarray]] = None,
                   token_weights: Optional[np.ndarray] = None,
                   speaker_ids: Optional[Sequence[int]] = None,
                   text_pad_multiple: int = 32,
                   **call_kwargs) -> Dict[str, np.ndarray]:
        """Text/ref-wav front-end over `__call__` (docs/multihost.md §5).

        Tokenizes texts, extracts GST reference mels on-device, defaults to
        neutral token weights for GST configs with no style source, and pads
        the batch up to a multiple of the data-axis size (padding rows are
        trimmed from the returned host arrays). `call_kwargs` pass through to
        `__call__` (seed / max_steps / chunked / chunk_steps / ...).
        """
        from ..text import batch_text_to_ids

        cfg = self.cfg
        n = len(texts)
        tokens, lengths = batch_text_to_ids(texts)
        pad_t = -tokens.shape[1] % text_pad_multiple
        tokens = np.pad(tokens, ((0, 0), (0, pad_t)))

        ref_mel = ref_lengths = None
        if cfg.model.gst.enabled and reference_wavs is not None:
            from ..dsp.device_features import DeviceFeatureExtractor

            mels = [m for m, _ in DeviceFeatureExtractor(cfg.audio).extract(
                [np.asarray(w, np.float32) for w in reference_wavs])]
            t_max = max(m.shape[0] for m in mels)
            t_max += -t_max % 64
            ref_mel = np.zeros((n, t_max, cfg.model.num_mels), np.float32)
            ref_lengths = np.array([m.shape[0] for m in mels], np.int32)
            for i, m in enumerate(mels):
                ref_mel[i, : m.shape[0]] = m
        elif cfg.model.gst.enabled and token_weights is None:
            token_weights = np.full(
                (n, cfg.model.gst.num_tokens),
                1.0 / cfg.model.gst.num_tokens, np.float32)

        spk = None
        if cfg.model.num_speakers > 1:
            spk = np.asarray(
                speaker_ids if speaker_ids is not None else [0] * n, np.int32)

        # batch must divide the data axis: repeat the last row as padding
        shards = self.mesh.shape[DATA_AXIS]
        pad_b = -n % shards

        def pad_rows(a):
            if a is None or pad_b == 0:
                return a
            return np.concatenate([a, np.repeat(a[-1:], pad_b, axis=0)], 0)

        out = self(
            pad_rows(tokens), pad_rows(np.asarray(lengths)),
            ref_mel=pad_rows(ref_mel), ref_mel_lengths=pad_rows(ref_lengths),
            token_weights=pad_rows(token_weights), speaker_ids=pad_rows(spk),
            **call_kwargs,
        )
        result = {}
        for k, v in out.items():
            a = np.asarray(v)
            result[k] = a[:n] if a.ndim and a.shape[0] == n + pad_b else a
        if "frame_lengths" in result:
            result["wav_lengths"] = (
                result["frame_lengths"] * cfg.audio.hop_length)
        return result
