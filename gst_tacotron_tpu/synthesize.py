"""Synthesis / inference path (reference GST_Tacotron.Inference; SURVEY.md §3.3).

(texts, optional reference wavs | token weights, optional speaker ids) ->
tokens + ref mels -> jitted [encoder + GST + fused AR decode scan + post-net]
-> on-device Griffin-Lim (or WaveRNN) -> waveforms + alignment plots.

Everything between tokenization and the waveform is ONE compiled program per
(batch, text-bucket) shape — the reference crosses host<->device every decode
step and runs Griffin-Lim on CPU (its two hot loops, SURVEY.md §3.3).
"""

from __future__ import annotations

import functools
import os
import re
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.io import wavfile

from .config import Config
from .dsp import JaxDSP
from .utils.flatten import FlatTree
from .metrics import synthesis_metrics
from .models import GSTTacotron, alignment_diagonality
from .text import batch_text_to_ids


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class Synthesizer:
    """Batch synthesis API over a trained state."""

    def __init__(self, cfg: Config, model: GSTTacotron, variables: Dict,
                 text_pad_multiple: int = 32, use_pallas_decoder: bool = False,
                 use_chunked_decoder: bool = False, chunk_steps: int = 64,
                 vocoder=None, use_pallas_refenc: Optional[bool] = None,
                 deterministic_prenet: bool = False):
        """Decoder modes (mutually exclusive; default = fixed-length scan):

        use_pallas_decoder: route the AR decode through the fused
        whole-decode Pallas kernel (ops/decode_pallas.py; Bahdanau only).
        The pipeline then runs as three programs (encode / decode-kernel /
        postnet+vocoder) instead of one; outputs are identical to ~1e-3.
        In a lean session both decoders run near the per-call floor at 200
        steps (~3.4 ms); the kernel keeps weights VMEM-resident so its
        advantage grows with decode length (see tools/tpu_kernel_bench.py
        --steps 1000).

        use_chunked_decoder: dynamic early exit — decode in `chunk_steps`
        while_loop chunks and stop as soon as every utterance's stop token
        fired (decode.chunked_decode). Saves the wasted tail when
        max_decode_steps is conservative; any attention kind.

        vocoder: a vocoder.make_vocoder object. None or GriffinLimVocoder
        keeps Griffin-Lim fused INSIDE the inference program (fastest path);
        a WaveRNNVocoder runs as its own jitted program on the decoded mel
        (config 5, SURVEY.md §7 stage 9).

        deterministic_prenet: disable the decoder prenet's always-on
        dropout at inference (the Tacotron trait) — synthesis becomes a
        deterministic function of (text, style condition), which is what
        style-contrast measurement needs (VERDICT r4 #7: the seed-noise
        floor otherwise contaminates every pairwise metric). Scan and
        chunked decoders only; the Pallas decode kernel keeps its on-core
        PRNG dropout."""
        self.cfg = cfg
        self.deterministic_prenet = deterministic_prenet
        self.vocoder = vocoder
        # inline GL inside the jit unless an external (neural) vocoder is set
        self._inline_gl = (
            vocoder is None or getattr(vocoder, "kind", "") == "griffin_lim"
        )
        # GST reference mels are extracted on-device (batched jitted program;
        # Pallas STFT kernel on TPU) — the host oracle only serves offline
        # tooling (VERDICT r1 #2). Built lazily: non-GST configs never pay it.
        self._ref_extractor = None
        self.model = model
        self.variables = variables
        self.dsp = JaxDSP(cfg.audio)
        self.text_pad_multiple = text_pad_multiple
        from .ops.decode_pallas import decode_pallas_supported

        self.use_pallas_decoder = (
            use_pallas_decoder and decode_pallas_supported(cfg.model)
        )
        if use_pallas_decoder and not self.use_pallas_decoder:
            print("[synthesize] config outside the fused-decode kernel scope; "
                  "falling back to the XLA scan decoder")
        self.use_chunked_decoder = use_chunked_decoder and not self.use_pallas_decoder
        self.chunk_steps = chunk_steps
        # GST fast path: fused reference-encoder conv-stack Pallas kernel +
        # VMEM-resident GRU (ops/refenc_pallas.py). Inference-only; default
        # on for TPU GST configs (parity: tests/test_refenc_pallas.py and
        # the synth-path equivalence test), interpreter-gated off on CPU.
        if use_pallas_refenc is None:
            use_pallas_refenc = (
                cfg.model.gst.enabled and jax.default_backend() != "cpu"
            )
        self.use_pallas_refenc = use_pallas_refenc and cfg.model.gst.enabled
        # Per-argument-buffer overhead on the axon runtime is ~10ms/buffer;
        # pass the whole variable tree as one flat buffer per dtype and carve
        # the leaves back out inside the program (utils/flatten.py).
        self._fp = FlatTree(variables)
        self._infer_jit = jax.jit(
            functools.partial(self._infer_fn), static_argnames=("max_steps",)
        )
        if self.use_chunked_decoder:
            self._chunked_jit = jax.jit(
                self._chunked_fn, static_argnames=("max_steps",))
        if self.use_pallas_decoder:
            from .ops.decode_pallas import pack_decoder_weights

            cell_params = jax.device_get(variables["params"])["decoder"]["cell"]
            self._packed_fp = FlatTree(pack_decoder_weights(
                cell_params, cfg.model.num_mels,
                cfg.model.decoder.reduction_factor,
                tuple(cfg.model.decoder.prenet_dims),
            ))
            self._encode_jit = jax.jit(self._encode_fn)
            self._decode_kernel_jit = jax.jit(
                self._decode_kernel_fn, static_argnames=("max_steps",)
            )
            self._finish_jit = jax.jit(self._finish_fn)

    # -- GST fast path (fused ref-encoder kernel) -----------------------------

    def _fast_style(self, variables, ref_mel, ref_mel_lengths, token_weights):
        """(style, style_attention) via ops/refenc_pallas.py, or (None, None)
        to use the in-module flax GST."""
        if not self.use_pallas_refenc or (
                ref_mel is None and token_weights is None):
            return None, None
        from .ops.refenc_pallas import gst_style_from_params

        return gst_style_from_params(
            variables, self.cfg.model.gst, ref_mel, ref_mel_lengths,
            token_weights, interpret=jax.default_backend() == "cpu",
        )

    # -- pallas-decoder pipeline stages -------------------------------------

    def _encode_fn(self, flat, tokens, token_lengths, ref_mel,
                   ref_mel_lengths, speaker_ids, token_weights, rng):
        variables = self._fp.unpack(flat)
        style, style_attn = self._fast_style(
            variables, ref_mel, ref_mel_lengths, token_weights)

        def fn(mdl):
            memory, aux = mdl._build_memory(
                tokens, token_lengths, ref_mel, ref_mel_lengths,
                token_weights, speaker_ids, False,
                precomputed_style=style,
            )
            keys = mdl.decoder.cell.precompute_keys(memory)
            if style_attn is not None:
                aux["style_attention"] = style_attn
            return memory, keys, aux
        return self.model.apply(variables, method=fn, rngs={"dropout": rng})

    def _decode_kernel_fn(self, packed_flat, memory, keys, token_lengths, rng,
                          *, max_steps: int):
        from .ops.decode_pallas import decode_scan_pallas

        packed = self._packed_fp.unpack(packed_flat)
        mask = jnp.arange(memory.shape[1])[None, :] < token_lengths[:, None]
        seed = jax.random.randint(rng, (), 0, 2 ** 31 - 1)
        # On CPU the kernel runs in interpreter mode, and the on-core PRNG has
        # no CPU lowering, so prenet dropout is TPU-only on this path.
        on_cpu = jax.default_backend() == "cpu"
        return decode_scan_pallas(
            packed, memory, keys, mask,
            dec_cfg=self.cfg.model.decoder, attn_cfg=self.cfg.model.attention,
            num_mels=self.cfg.model.num_mels, steps=max_steps,
            seed=seed, use_dropout=not on_cpu, interpret=on_cpu,
        )

    def _finish_fn(self, flat, mel, stops, alignments, token_lengths):
        variables = self._fp.unpack(flat)
        cfg = self.cfg
        dec = cfg.model.decoder
        if dec.use_stop_token:
            stopped = jax.nn.sigmoid(stops) > dec.stop_threshold
            any_stop = jnp.any(stopped, axis=1)
            first_stop = jnp.argmax(stopped, axis=1) + 1
            frame_lengths = jnp.where(any_stop, first_stop, mel.shape[1])
        else:
            frame_lengths = jnp.full((mel.shape[0],), mel.shape[1], jnp.int32)
        fmask = (jnp.arange(mel.shape[1])[None, :] < frame_lengths[:, None])
        mel = mel * fmask[..., None].astype(mel.dtype)
        linear = self.model.apply(
            variables, mel, frame_lengths, train=False,
            method=lambda mdl, m, fl, train: mdl.postnet(m, fl, train=train),
        )
        wav = self.dsp.inv_linear_spectrogram(linear) if self._inline_gl else None
        diag = alignment_diagonality(
            alignments, token_lengths,
            jnp.maximum(1, frame_lengths // dec.reduction_factor),
        )
        return mel, linear, wav, frame_lengths, diag

    # -- chunked early-exit pipeline ----------------------------------------

    def _chunked_fn(self, flat, tokens, token_lengths, ref_mel,
                    ref_mel_lengths, speaker_ids, token_weights, rng,
                    *, max_steps: int):
        from .decode import chunked_decode

        variables = self._fp.unpack(flat)
        style, style_attn = self._fast_style(
            variables, ref_mel, ref_mel_lengths, token_weights)
        memory, aux = self.model.apply(
            variables, tokens, token_lengths, ref_mel, ref_mel_lengths,
            token_weights, speaker_ids, False, False, style,
            method=self.model._build_memory, rngs={"dropout": rng},
        )
        if style_attn is not None:
            aux["style_attention"] = style_attn
        out = chunked_decode(
            self.model, variables, memory, token_lengths, rng,
            chunk_steps=self.chunk_steps, max_steps=max_steps,
            deterministic_prenet=self.deterministic_prenet,
        )
        linear = self.model.apply(
            variables, out["mel"], out["frame_lengths"], train=False,
            method=lambda mdl, m, fl, train: mdl.postnet(m, fl, train=train),
        )
        wav = self.dsp.inv_linear_spectrogram(linear) if self._inline_gl else None
        r = self.cfg.model.decoder.reduction_factor
        out["linear"] = linear
        out["diagonality"] = alignment_diagonality(
            out["alignments"], token_lengths,
            jnp.maximum(1, out["frame_lengths"] // r),
        )
        out.update(aux)
        return out, wav

    # -- jitted core --------------------------------------------------------

    def _infer_fn(self, flat, tokens, token_lengths, ref_mel,
                  ref_mel_lengths, speaker_ids, token_weights, rng,
                  *, max_steps: int):
        variables = self._fp.unpack(flat)
        style, style_attn = self._fast_style(
            variables, ref_mel, ref_mel_lengths, token_weights)
        out = self.model.apply(
            variables, tokens, token_lengths,
            ref_mel=ref_mel, ref_mel_lengths=ref_mel_lengths,
            speaker_ids=speaker_ids, token_weights=token_weights,
            method=self.model.infer, rngs={"dropout": rng},
            max_steps=max_steps, precomputed_style=style,
            deterministic_prenet=self.deterministic_prenet,
        )
        if style_attn is not None:
            out["style_attention"] = style_attn
        wav = (self.dsp.inv_linear_spectrogram(out["linear"])
               if self._inline_gl else None)
        # diagonality metric inside the jit: eager ops are pathologically
        # slow on the remote-compile TPU path (one program per op)
        r = self.cfg.model.decoder.reduction_factor
        out["diagonality"] = alignment_diagonality(
            out["alignments"], token_lengths,
            jnp.maximum(1, out["frame_lengths"] // r),
        )
        return out, wav

    # -- public API ---------------------------------------------------------

    def __call__(
        self,
        texts: Sequence[str],
        reference_wavs: Optional[Sequence[np.ndarray]] = None,
        token_weights: Optional[np.ndarray] = None,
        speaker_ids: Optional[Sequence[int]] = None,
        max_steps: Optional[int] = None,
        seed: int = 0,
    ) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        tokens, lengths = batch_text_to_ids(texts)
        pad_to = _round_up(tokens.shape[1], self.text_pad_multiple)
        tokens = np.pad(tokens, ((0, 0), (0, pad_to - tokens.shape[1])))

        ref_mel = ref_lengths = None
        if cfg.model.gst.enabled and reference_wavs is not None:
            if self._ref_extractor is None:
                from .dsp.device_features import DeviceFeatureExtractor

                self._ref_extractor = DeviceFeatureExtractor(cfg.audio)
            mels = [
                m for m, _ in self._ref_extractor.extract(
                    [np.asarray(w, np.float32) for w in reference_wavs]
                )
            ]
            t_max = _round_up(max(m.shape[0] for m in mels), 64)
            ref_mel = np.zeros((len(mels), t_max, cfg.model.num_mels), np.float32)
            ref_lengths = np.array([m.shape[0] for m in mels], np.int32)
            for i, m in enumerate(mels):
                ref_mel[i, : m.shape[0]] = m
        elif cfg.model.gst.enabled and token_weights is None:
            # neutral style: uniform token weights
            token_weights = np.full(
                (len(texts), cfg.model.gst.num_tokens),
                1.0 / cfg.model.gst.num_tokens, np.float32,
            )

        spk = None
        if cfg.model.num_speakers > 1:
            spk = np.asarray(
                speaker_ids if speaker_ids is not None else [0] * len(texts),
                np.int32,
            )

        steps = max_steps or cfg.model.decoder.max_decode_steps
        call_args = (
            self._fp.flat, jnp.asarray(tokens), jnp.asarray(lengths),
            None if ref_mel is None else jnp.asarray(ref_mel),
            None if ref_lengths is None else jnp.asarray(ref_lengths),
            None if spk is None else jnp.asarray(spk),
            None if token_weights is None else jnp.asarray(token_weights),
            jax.random.PRNGKey(seed),
        )
        if self.use_chunked_decoder:
            out, wav = self._chunked_jit(*call_args, max_steps=steps)
        elif self.use_pallas_decoder:
            memory, keys, aux = self._encode_jit(*call_args)
            mel_k, stops_k, aligns_k = self._decode_kernel_jit(
                self._packed_fp.flat, memory, keys, jnp.asarray(lengths),
                jax.random.PRNGKey(seed + 1), max_steps=steps,
            )
            mel_o, linear_o, wav, fl, diag = self._finish_jit(
                self._fp.flat, mel_k, stops_k, aligns_k, jnp.asarray(lengths)
            )
            out = {
                "mel": mel_o, "linear": linear_o, "stop_logits": stops_k,
                "alignments": aligns_k, "frame_lengths": fl,
                "diagonality": diag, **aux,
            }
        else:
            out, wav = self._infer_jit(*call_args, max_steps=steps)
        if not self._inline_gl:
            # neural vocoder: its own jitted program over the decoded mel
            wav = self.vocoder(out, jax.random.PRNGKey(seed + 104729))
        frame_lengths = np.asarray(out["frame_lengths"])
        result = {
            k: np.asarray(v) for k, v in out.items() if v is not None
        }
        result.update({
            "wav": np.asarray(wav),
            "frame_lengths": frame_lengths,
            "wav_lengths": frame_lengths * cfg.audio.hop_length,
        })
        return result

    # -- artifacts ----------------------------------------------------------

    def save_outputs(self, outputs: Dict[str, np.ndarray], out_dir: str,
                     prefix: str = "synth") -> List[str]:
        """Write WAVs + alignment PNGs (reference eval artifacts)."""
        os.makedirs(out_dir, exist_ok=True)
        paths = []
        sr = self.cfg.audio.sample_rate
        n = outputs["wav"].shape[0]
        for i in range(n):
            L = int(outputs["wav_lengths"][i])
            wav = np.clip(outputs["wav"][i, :L], -1.0, 1.0)
            path = os.path.join(out_dir, f"{prefix}_{i:03d}.wav")
            wavfile.write(path, sr, (wav * 32767).astype(np.int16))
            paths.append(path)
            png = self._save_alignment_png(
                outputs["alignments"][i], out_dir, f"{prefix}_{i:03d}"
            )
            if png:
                paths.append(png)
        return paths

    def _save_alignment_png(self, alignment: np.ndarray, out_dir: str,
                            name: str) -> Optional[str]:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return None
        path = os.path.join(out_dir, f"{name}_align.png")
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.imshow(alignment.T, aspect="auto", origin="lower",
                  interpolation="none")
        ax.set_xlabel("decoder step")
        ax.set_ylabel("encoder position")
        fig.tight_layout()
        fig.savefig(path, dpi=80)
        plt.close(fig)
        return path


def benchmark_synthesis(synth: Synthesizer, texts: Sequence[str],
                        iterations: int = 3, **kwargs) -> Dict[str, float]:
    """Timed synthesis for the north-star metrics (BASELINE.json:2)."""
    out = synth(texts, **kwargs)  # warmup + compile
    jax.block_until_ready(out["wav"])
    t0 = time.time()
    for _ in range(iterations):
        out = synth(texts, **kwargs)
        jax.block_until_ready(out["wav"])
    dt = (time.time() - t0) / iterations
    audio_seconds = float(np.sum(out["wav_lengths"])) / synth.cfg.audio.sample_rate
    r = synth.cfg.model.decoder.reduction_factor
    decode_steps = int(np.sum(out["frame_lengths"]) // r)
    return synthesis_metrics(audio_seconds, dt, decode_steps,
                             num_chips=jax.local_device_count())


def main(argv=None):
    """CLI synthesis (reference `python Model.py` inference entry;
    SURVEY.md §3.3): restore a checkpoint, synthesize texts, write WAVs +
    alignment PNGs."""
    import argparse

    from .utils.platform import enable_compile_cache, respect_platforms_env
    respect_platforms_env()
    enable_compile_cache()

    from .config import apply_overrides, get_preset, load_config, parse_cli_overrides
    from .checkpoint import CheckpointManager
    from .train import init_state

    p = argparse.ArgumentParser(description="Synthesize speech")
    p.add_argument("--preset", default="taco1_lj")
    p.add_argument("--config")
    p.add_argument("--workdir", required=True,
                   help="training workdir containing checkpoints/")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--texts", nargs="+", required=True)
    p.add_argument("--reference-wavs", nargs="*",
                   help="style reference wavs (GST configs)")
    p.add_argument("--token-weights",
                   help="direct style control: comma-separated per-token "
                        "attention weights (length = model.gst.num_tokens), "
                        "applied to every utterance — the reference's "
                        "token-weight inference mode; mutually exclusive "
                        "with --reference-wavs")
    p.add_argument("--speaker-ids", nargs="*", type=int)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pallas-decoder", action="store_true")
    p.add_argument("--chunked-decoder", action="store_true")
    p.add_argument("--vocoder", choices=["config", "griffin_lim", "wavernn"],
                   default="config",
                   help="waveform stage; 'config' uses model.vocoder.kind")
    p.add_argument("--vocoder-workdir",
                   help="vocoder_train workdir with vocoder_ckpt/ "
                        "(wavernn; defaults to --workdir)")
    p.add_argument("--profile",
                   help="capture a device trace of the synthesis call into "
                        "this directory (TensorBoard/Perfetto)")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)
    # argparse gives a trailing `key.path=value` override to --texts (its
    # nargs="+" is greedy); a config override silently synthesized as a
    # sentence is a confusing failure — reject it with the fix spelled out.
    for t in args.texts:
        if re.fullmatch(r"[A-Za-z_][\w.]*=[^\s=]+", t):
            p.error(
                f"{t!r} looks like a config override but was captured by "
                f"--texts; put overrides BEFORE --texts"
            )

    workdir_cfg = os.path.join(args.workdir, "config.json")
    if args.config:
        cfg = load_config(args.config)
    elif os.path.exists(workdir_cfg):
        cfg = load_config(workdir_cfg)  # the trainer's resolved config
    else:
        cfg = get_preset(args.preset)
    if args.overrides:
        cfg = apply_overrides(cfg, parse_cli_overrides(args.overrides))

    # Fail fast on a missing/typo'd workdir BEFORE the (slow) model init —
    # otherwise the fallback preset compiles a full-size model just to
    # discover there is nothing to restore.
    ckpt_dir = os.path.join(args.workdir, cfg.train.checkpoint_dir)
    if not os.path.isdir(ckpt_dir):
        raise FileNotFoundError(f"no checkpoint directory at {ckpt_dir}")

    # Parse/validate style inputs BEFORE the (slow) model init.
    token_weights = None
    if args.token_weights:
        if args.reference_wavs:
            p.error("--token-weights and --reference-wavs are mutually "
                    "exclusive (two style sources)")
        w = np.array([float(x) for x in args.token_weights.split(",")],
                     np.float32)
        if w.shape[0] != cfg.model.gst.num_tokens:
            p.error(f"--token-weights needs {cfg.model.gst.num_tokens} "
                    f"values (model.gst.num_tokens), got {w.shape[0]}")
        if not cfg.model.gst.enabled:
            p.error("--token-weights requires a GST config "
                    "(model.gst.enabled)")
        token_weights = np.tile(w[None, :], (len(args.texts), 1))

    # template state for restore
    import jax

    dummy = {
        "tokens": np.zeros((1, 8), np.int32),
        "token_lengths": np.array([8], np.int32),
        "mel": np.zeros(
            (1, 2 * cfg.model.decoder.reduction_factor, cfg.model.num_mels),
            np.float32),
        "mel_lengths": np.array(
            [2 * cfg.model.decoder.reduction_factor], np.int32),
        "linear": np.zeros((1, 2 * cfg.model.decoder.reduction_factor,
                            cfg.model.num_freq), np.float32),
        "speaker_ids": np.zeros((1,), np.int32),
    }
    model, state = init_state(cfg, jax.random.PRNGKey(0), dummy)
    ckpt = CheckpointManager(
        os.path.join(args.workdir, cfg.train.checkpoint_dir))
    state = ckpt.restore(jax.device_get(state))
    print(f"restored checkpoint at step {int(state.step)}")

    vocoder = None
    vocoder_kind = (cfg.model.vocoder.kind if args.vocoder == "config"
                    else args.vocoder)
    if vocoder_kind == "wavernn":
        from .config import apply_overrides as _apply
        from .vocoder import make_vocoder

        vcfg = _apply(cfg, {"model.vocoder.kind": "wavernn"})
        vocoder = make_vocoder(
            vcfg, vocoder_workdir=args.vocoder_workdir or args.workdir
        )
        print(f"restored wavernn vocoder from "
              f"{args.vocoder_workdir or args.workdir}")

    synth = Synthesizer(
        cfg, model,
        {"params": state.params, "batch_stats": state.batch_stats},
        use_pallas_decoder=args.pallas_decoder,
        use_chunked_decoder=args.chunked_decoder,
        vocoder=vocoder,
    )
    ref_wavs = None
    if args.reference_wavs:
        from .data.pattern import load_wav

        ref_wavs = [load_wav(w, cfg.audio.sample_rate)
                    for w in args.reference_wavs]
    from .utils.profiling import profile_trace

    with profile_trace(args.profile, enabled=args.profile is not None):
        out = synth(args.texts, reference_wavs=ref_wavs,
                    token_weights=token_weights,
                    speaker_ids=args.speaker_ids, seed=args.seed)
    paths = synth.save_outputs(out, args.out)
    for pth, d in zip([x for x in paths if x.endswith(".wav")],
                      out["diagonality"]):
        print(f"{pth}  (alignment diagonality {float(d):.3f})")


if __name__ == "__main__":
    main()
