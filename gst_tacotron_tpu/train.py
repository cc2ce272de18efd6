"""Trainer (reference Model.py GST_Tacotron.Train; SURVEY.md §3.2).

The reference's eager loop becomes: one jitted, mesh-sharded train step
(teacher-forced forward + losses + grads + optax update) with donated state;
the feeder thread becomes the BucketedLoader; tf.summary becomes
MetricLogger; tf.train.Checkpoint becomes orbax.

Train step semantics preserved from the reference: GST conditions on the
TARGET mel as reference audio during training; loss = mel L1 + linear L1
(low-freq emphasis) + stop BCE; Adam with noam-style decay + global-norm
gradient clipping.
"""

from __future__ import annotations

import argparse
import functools
import os
import time
from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .checkpoint import CheckpointManager
from .config import Config, OptimizerConfig, get_preset, load_config, parse_cli_overrides, apply_overrides
from .data import BucketedLoader, PatternDataset
from .losses import compute_losses
from .metrics import MetricLogger
from .models import GSTTacotron
from .parallel import make_mesh, param_shardings, shard_batch
from .text import NUM_SYMBOLS
from .utils.profiling import StepWindowProfiler
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jnp.ndarray


# ---------------------------------------------------------------------------
# Optimizer
# ---------------------------------------------------------------------------


def make_schedule(cfg: OptimizerConfig):
    if cfg.schedule == "noam":
        def sched(step):
            step = jnp.maximum(step, 1).astype(jnp.float32)
            w = float(cfg.warmup_steps)
            return cfg.learning_rate * w ** 0.5 * jnp.minimum(
                step * w ** -1.5, step ** -0.5
            )
        return sched
    if cfg.schedule == "exponential":
        return optax.exponential_decay(
            cfg.learning_rate, cfg.decay_steps, cfg.decay_rate
        )
    return lambda step: cfg.learning_rate


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps),
        optax.add_decayed_weights(cfg.weight_decay)
        if cfg.weight_decay > 0 else optax.identity(),
        optax.scale_by_schedule(make_schedule(cfg)),
        optax.scale(-1.0),
    )
    return tx


# ---------------------------------------------------------------------------
# State init
# ---------------------------------------------------------------------------


def build_model(cfg: Config) -> GSTTacotron:
    num_symbols = cfg.model.num_symbols or NUM_SYMBOLS
    # compute dtype: bfloat16 puts the matmul-heavy paths on the MXU's native
    # input dtype (params stay float32 — flax dtype vs param_dtype split)
    dtype = getattr(jnp, cfg.model.compute_dtype)
    return GSTTacotron(cfg.model, num_symbols, dtype=dtype)


def init_state(cfg: Config, rng: jax.Array, sample_batch: Dict[str, np.ndarray]
               ) -> Tuple[GSTTacotron, TrainState]:
    model = build_model(cfg)
    tx = make_optimizer(cfg.optimizer)
    params_rng, dropout_rng, state_rng = jax.random.split(rng, 3)
    kwargs = _model_kwargs(cfg, sample_batch)
    variables = model.init(
        {"params": params_rng, "dropout": dropout_rng},
        jnp.asarray(sample_batch["tokens"]),
        jnp.asarray(sample_batch["token_lengths"]),
        jnp.asarray(sample_batch["mel"]),
        train=False,
        **kwargs,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        rng=state_rng,
    )
    return model, state


def _materialize_features(cfg: Config, batch: Dict[str, Any]
                          ) -> Dict[str, Any]:
    """Wav-transport batches -> standard feature batches, on device.

    Unpacks the loader's {"wav" f16, "ints" int32} wire format and runs
    the window/DFT/mel/dB pipeline (matmul DFT on the MXU) inside the train
    step — the north-star "host loader feeding on-TPU feature extraction".
    Frames past each utterance's true length are zeroed so the result
    matches the offline zero-padded feature batches (BatchNorm in the GST
    reference encoder sees the padded region).
    """
    if "wav" not in batch:
        return batch
    from .dsp import JaxDSP

    dsp = JaxDSP(cfg.audio)
    ints = batch["ints"]
    tmax = ints.shape[1] - 4
    wav = batch["wav"].astype(jnp.float32)
    mel, lin = dsp.features_precentered(wav)
    true_frames = ints[:, tmax + 2]
    fmask = (jnp.arange(mel.shape[1])[None, :]
             < true_frames[:, None]).astype(mel.dtype)[:, :, None]
    return {
        "tokens": ints[:, :tmax],
        "token_lengths": ints[:, tmax],
        "mel_lengths": ints[:, tmax + 1],
        "speaker_ids": ints[:, tmax + 3],
        "mel": mel * fmask,
        "linear": lin * fmask,
    }


def _model_kwargs(cfg: Config, batch: Dict[str, Any]) -> Dict[str, Any]:
    kwargs: Dict[str, Any] = {}
    if cfg.model.gst.enabled:
        kwargs["ref_mel"] = jnp.asarray(batch["mel"])
        kwargs["ref_mel_lengths"] = jnp.asarray(batch["mel_lengths"])
    if cfg.model.num_speakers > 1:
        kwargs["speaker_ids"] = jnp.asarray(batch["speaker_ids"])
    return kwargs


# ---------------------------------------------------------------------------
# Train / eval steps
# ---------------------------------------------------------------------------


def train_step(model: GSTTacotron, tx: optax.GradientTransformation, cfg: Config,
               state: TrainState, batch: Dict[str, jnp.ndarray]
               ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    step_rng = jax.random.fold_in(state.rng, state.step)
    batch = _materialize_features(cfg, batch)

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        kwargs = _model_kwargs(cfg, batch)
        outputs, mutated = model.apply(
            variables,
            batch["tokens"],
            batch["token_lengths"],
            batch["mel"],
            train=True,
            rngs={"dropout": step_rng},
            mutable=["batch_stats"],
            **kwargs,
        )
        losses = compute_losses(
            outputs, batch, cfg.loss, cfg.audio,
            reduction_factor=cfg.model.decoder.reduction_factor)
        return losses["loss"], (losses, mutated.get("batch_stats", {}))

    grads, (losses, new_batch_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    metrics = dict(losses)
    metrics["grad_norm"] = optax.global_norm(grads)
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_batch_stats,
        opt_state=new_opt_state,
    )
    return new_state, metrics


def make_train_step(model: GSTTacotron, tx: optax.GradientTransformation,
                    cfg: Config, mesh: Optional[Mesh] = None, donate: bool = True):
    """Jit the train step; with a mesh, shard batch over `data` and params per
    the TP rules (GSPMD inserts the gradient psums / TP collectives)."""
    fn = functools.partial(train_step, model, tx, cfg)
    if mesh is None:
        return jax.jit(fn, donate_argnums=(0,) if donate else ())
    batch_sharding = NamedSharding(mesh, P("data"))
    return jax.jit(
        fn,
        in_shardings=(None, batch_sharding),
        donate_argnums=(0,) if donate else (),
    )


def train_step_device_corpus(model: GSTTacotron,
                             tx: optax.GradientTransformation, cfg: Config,
                             max_text: int, sig_len: int, t_max: int,
                             state: TrainState, corpus_wav: jnp.ndarray,
                             corpus_ints: jnp.ndarray, idx: jnp.ndarray
                             ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """Device-corpus variant: the batch is GATHERED from the HBM-resident
    prepped corpus (row slices reproduce the wav-transport wire format
    bit-exactly — loader.build_wav_corpus), so the host ships only `idx`.
    max_text/sig_len are the bucket's static dims; t_max is where the corpus
    rows keep their 4-scalar block."""
    rows_i = corpus_ints[idx]
    batch = {
        "wav": corpus_wav[idx][:, :sig_len],
        "ints": jnp.concatenate(
            [rows_i[:, :max_text], rows_i[:, t_max:]], axis=1),
    }
    return train_step(model, tx, cfg, state, batch)


def make_corpus_train_step(model: GSTTacotron,
                           tx: optax.GradientTransformation, cfg: Config,
                           max_text: int, sig_len: int, t_max: int,
                           mesh: Optional[Mesh] = None):
    """Per-bucket jit of the device-corpus step (one program per bucket spec,
    same count as the wire path). The corpus arrays are NON-donated device
    residents: one big buffer does not trip this runtime's resident-tree
    penalty (measured — see CLAUDE.md #10/#18)."""
    fn = functools.partial(train_step_device_corpus, model, tx, cfg,
                           max_text, sig_len, t_max)
    if mesh is None:
        return jax.jit(fn, donate_argnums=(0,))
    return jax.jit(
        fn,
        in_shardings=(None, None, None, NamedSharding(mesh, P("data"))),
        donate_argnums=(0,),
    )


def eval_step(model: GSTTacotron, cfg: Config, state: TrainState,
              batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    batch = _materialize_features(cfg, batch)
    kwargs = _model_kwargs(cfg, batch)
    outputs = model.apply(
        variables,
        batch["tokens"],
        batch["token_lengths"],
        batch["mel"],
        train=False,
        rngs={"dropout": jax.random.fold_in(state.rng, 2 ** 31 - 1)},
        **kwargs,
    )
    losses = compute_losses(
        outputs, batch, cfg.loss, cfg.audio,
        reduction_factor=cfg.model.decoder.reduction_factor)
    return {f"eval_{k}": v for k, v in losses.items()}


# ---------------------------------------------------------------------------
# Trainer loop
# ---------------------------------------------------------------------------


class Trainer:
    def __init__(self, cfg: Config, pattern_dir: str, work_dir: str,
                 mesh: Optional[Mesh] = None):
        self.cfg = cfg
        self.work_dir = work_dir
        self.mesh = mesh
        os.makedirs(work_dir, exist_ok=True)
        # persist the resolved config so inference tools can reload it
        from .config import save_config

        save_config(cfg, os.path.join(work_dir, "config.json"))
        if cfg.train.debug_nans:
            jax.config.update("jax_debug_nans", True)

        self.dataset = PatternDataset(pattern_dir, cfg.data.metadata_file)
        meta_audio = self.dataset.metadata.get("audio", {})
        for key, ours in [("n_fft", cfg.audio.n_fft),
                          ("hop_length", cfg.audio.hop_length),
                          ("sample_rate", cfg.audio.sample_rate),
                          ("num_mels", cfg.audio.num_mels)]:
            theirs = meta_audio.get(key)
            if theirs is not None and theirs != ours:
                raise ValueError(
                    f"pattern corpus was extracted with audio.{key}={theirs} "
                    f"but the training config has {ours}; regenerate patterns "
                    "or align the config"
                )
        if mesh is not None:
            # mesh-aware: with cross-process TP the model axis spans
            # processes and several ranks must load the SAME batch slice
            from .parallel import process_data_shard
            shard_index, num_shards = process_data_shard(mesh)
        else:
            shard_index, num_shards = jax.process_index(), jax.process_count()
        self.loader = BucketedLoader(
            self.dataset, cfg.data, cfg.model.decoder.reduction_factor,
            shard_index=shard_index, num_shards=num_shards,
            seed=cfg.train.seed, audio_cfg=cfg.audio,
        )
        # Held-out eval loader (SURVEY.md §4 — the reference has no eval set;
        # the rebuild runs teacher-forced losses on a deterministic holdout).
        self.val_loader = None
        if cfg.data.val_fraction > 0.0:
            val = BucketedLoader(
                self.dataset, cfg.data, cfg.model.decoder.reduction_factor,
                shard_index=shard_index, num_shards=num_shards,
                seed=cfg.train.seed, split="val", drop_remainder=False,
                audio_cfg=cfg.audio,
            )
            if any(val.bucket_members):
                self.val_loader = val
        try:
            sample = next(iter(self.loader.epoch(0)))
        except StopIteration:
            counts = [len(m) for m in self.loader.bucket_members]
            raise ValueError(
                f"loader produced no batches: bucket member counts {counts} "
                f"for buckets {cfg.data.buckets} (batch_size="
                f"{self.loader.batch_size}); check bucket bounds vs corpus "
                "lengths"
            )
        if cfg.data.wav_transport:
            # model.init only needs a correctly-shaped feature batch; build
            # one host-side from the wav batch's static shapes (zero mels).
            ints = sample["ints"]
            tmax = ints.shape[1] - 4
            frames = 1 + ((sample["wav"].shape[1] - cfg.audio.n_fft)
                          // cfg.audio.hop_length)
            b = ints.shape[0]
            sample = {
                "tokens": ints[:, :tmax],
                "token_lengths": ints[:, tmax],
                "mel_lengths": ints[:, tmax + 1],
                "speaker_ids": ints[:, tmax + 3],
                "mel": np.zeros((b, frames, cfg.audio.num_mels), np.float32),
                "linear": np.zeros((b, frames, cfg.model.num_freq),
                                   np.float32),
            }
        self.model, self.state = init_state(
            cfg, jax.random.PRNGKey(cfg.train.seed), sample
        )
        self._placed = (mesh is not None
                        and (jax.process_count() > 1
                             or dict(mesh.shape).get("model", 1) > 1))
        if self._placed:
            # Place the freshly-initialized state onto the mesh as global
            # jax.Arrays: params (+ Adam moments) per the TP rules, the rest
            # replicated. Multi-process init is deterministic per seed, so
            # every process holds identical host values. This is also where
            # single-process TP runs get their params ACTUALLY sharded over
            # `model` (r4 trainers replicated them).
            from .parallel import place_state
            self.state = place_state(self.state, mesh)
            if dict(mesh.shape).get("model", 1) > 1:
                from .parallel import describe_sharding
                tp = {k: v for k, v in
                      describe_sharding(self.state.params).items()
                      if "model" in v}
                head = "; ".join(f"{k} -> {v}"
                                 for k, v in list(tp.items())[:3])
                print(f"[trainer] tensor-parallel: {len(tp)} param kernels "
                      f"sharded over 'model' ({head}; ...)")
        self.tx = make_optimizer(cfg.optimizer)
        self.step_fn = make_train_step(self.model, self.tx, cfg, mesh)
        self.corpus = None
        if cfg.data.device_corpus:
            if not cfg.data.wav_transport:
                raise ValueError("data.device_corpus requires "
                                 "data.wav_transport=true")
            if jax.process_count() > 1:
                # ADVICE r4: the per-step row-index vector is a host-local
                # jnp array with DIFFERENT values per rank; binding it to a
                # cross-process P("data") sharding would make JAX assume the
                # ranks hold identical values and silently assemble a wrong
                # global batch (and the plain device_put below is likewise
                # process-local). Building the global index via
                # make_array_from_process_local_data is possible but has
                # never been executed; refuse rather than mistrain.
                raise ValueError(
                    "data.device_corpus is single-process only; use the f16 "
                    "wav-transport wire (data.wav_transport) for "
                    "multi-process runs")
            corpora = self.loader.build_wav_corpus()
            gb = sum(w.nbytes + i.nbytes for w, i in corpora.values()) / 1e9
            if gb > cfg.data.device_corpus_max_gb:
                raise ValueError(
                    f"prepped corpus is {gb:.2f} GB > "
                    f"data.device_corpus_max_gb={cfg.data.device_corpus_max_gb}"
                    "; lower bucket bounds or disable device_corpus")
            put = ((lambda x: jax.device_put(x, NamedSharding(mesh, P())))
                   if mesh is not None else jnp.asarray)
            self.corpus = {b: (put(w), put(i)) for b, (w, i) in
                           corpora.items()}
            self._corpus_step_fns: Dict[Tuple[int, int], Any] = {}
            rows = sum(w.shape[0] for w, _ in corpora.values())
            print(f"[trainer] device corpus resident: {rows} rows in "
                  f"{len(corpora)} bucket array(s), {gb:.2f} GB")
            self.device_corpus_gb = gb
        self.eval_fn = None
        if self.val_loader is not None:
            fn = functools.partial(eval_step, self.model, cfg)
            if mesh is None:
                self.eval_fn = jax.jit(fn)
            else:
                self.eval_fn = jax.jit(
                    fn, in_shardings=(None, NamedSharding(mesh, P("data"))))
        self.ckpt = CheckpointManager(
            os.path.join(work_dir, cfg.train.checkpoint_dir),
            keep=cfg.train.keep_checkpoints,
        )
        # multi-host: one shared workdir (orbax coordinates the checkpoint
        # across processes), but per-rank log streams — every process writing
        # one metrics.jsonl would interleave duplicate records
        rank = jax.process_index()
        log_dir = os.path.join(
            work_dir, "logs" if rank == 0 else f"logs_rank{rank}")
        self.logger = MetricLogger(log_dir, use_tensorboard=(rank == 0))

    def run_eval(self, step: int, max_batches: int = 8) -> Dict[str, float]:
        """Teacher-forced losses over (up to) max_batches held-out batches."""
        sums: Dict[str, float] = {}
        n = 0
        for batch in self.val_loader.epoch(0):
            metrics = self.eval_fn(self.state, self._device_batch(batch))
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
            if n >= max_batches:
                break
        if n:
            means = {k: v / n for k, v in sums.items()}
            self.logger.write(step, means, prefix="eval")
            return means
        return {}

    def _corpus_step_fn(self, spec):
        """Per-bucket jitted device-corpus step (cached by bucket dims).

        Corpus arrays are stored at their own bucket's shapes (per-bucket
        corpora), so t_max == spec.max_text and the step's row slicing is an
        identity — the general slicing form is kept so the step is also
        usable with rows wider than the bucket."""
        key = (spec.max_text, spec.max_frames)
        fn = self._corpus_step_fns.get(key)
        if fn is None:
            sig_len = ((spec.max_frames - 1) * self.cfg.audio.hop_length
                       + self.cfg.audio.n_fft)
            fn = make_corpus_train_step(
                self.model, self.tx, self.cfg, spec.max_text, sig_len,
                spec.max_text, self.mesh)
            self._corpus_step_fns[key] = fn
        return fn

    def restore_if_available(self) -> bool:
        step = self.ckpt.latest_step()
        if step is None:
            return False
        # the template already carries the mesh placement (TP params /
        # replicated rest as global arrays when self._placed) — orbax
        # StandardRestore lands shards on the template's devices directly
        self.state = self.ckpt.restore(self.state, step)
        return True

    def _device_batch(self, batch):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if self.mesh is not None:
            batch = shard_batch(batch, self.mesh)
        return batch

    def train(self, total_steps: Optional[int] = None,
              eval_fn=None, profile_dir: Optional[str] = None) -> TrainState:
        cfg = self.cfg
        total = total_steps or cfg.train.total_steps
        start_step = int(self.state.step)
        # resume the deterministic batch stream where the checkpoint left off
        if self.corpus is not None:
            it = self.loader.stream_indices(start_batch=start_step)
        else:
            it = self.loader.stream(start_batch=start_step)
        t0 = time.time()
        window = 0
        profiler = StepWindowProfiler(profile_dir)
        # step is tracked HOST-side: `int(self.state.step)` would block on a
        # device->host fetch of a value that data-depends on the whole step,
        # serializing the loop on this runtime's ~60-80 ms round trip. The
        # async dispatch below means the next batch's host->device upload
        # overlaps the current step's device execution; the loop only syncs
        # at log points (which also defeats the runtime's lazy execution —
        # unfetched chains may never run, CLAUDE.md #11).
        step = start_step
        for _ in range(start_step, total):
            profiler.tick()
            if self.corpus is not None:
                b, rows, spec = next(it)
                c_wav, c_ints = self.corpus[b]
                self.state, metrics = self._corpus_step_fn(spec)(
                    self.state, c_wav, c_ints, jnp.asarray(rows))
            else:
                batch = self._device_batch(next(it))
                self.state, metrics = self.step_fn(self.state, batch)
            window += 1
            step += 1
            if step % cfg.train.log_every == 0:
                # Fetch BEFORE taking dt: the float() is the sync point that
                # waits for the window's execution — measuring dt first would
                # time only the async dispatches and overstate steps/s ~2x.
                host_metrics = {k: float(v) for k, v in metrics.items()}
                dt = time.time() - t0
                host_metrics["steps_per_sec"] = window / max(dt, 1e-9)
                self.logger.write(step, host_metrics, prefix="train")
                t0, window = time.time(), 0
            if step % cfg.train.checkpoint_every == 0:
                self._save_ckpt(step)
            if step % cfg.train.eval_every == 0:
                if self.eval_fn is not None:
                    self.run_eval(step)
                if eval_fn is not None:
                    eval_fn(self, step)
        profiler.stop()
        self._save_ckpt(int(self.state.step))
        self.ckpt.wait()
        return self.state

    def _save_ckpt(self, step: int) -> None:
        """Async-safe checkpoint: the next step DONATES the state's buffers,
        so an async orbax save must not read live device arrays. device_get
        gives a host snapshot — except when a TP sharding spans processes
        (cross-process model axis), where fetching is impossible; there,
        save the global arrays directly and wait synchronously."""
        try:
            snap = jax.device_get(self.state)
        except RuntimeError:
            self.ckpt.save(step, self.state)
            self.ckpt.wait()
            return
        self.ckpt.save(step, snap)


def default_eval_hook(trainer: "Trainer", step: int) -> None:
    """Periodic qualitative eval (reference Model.py's fixed-sentence
    synthesis with alignment/audio dumps; SURVEY.md §3.2 'every K')."""
    if jax.process_index() != 0:
        return  # one copy of the qualitative artifacts per run, not per host
    from .synthesize import Synthesizer

    cfg = trainer.cfg
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    synth = Synthesizer(cfg, trainer.model, variables)
    try:
        out = synth(list(cfg.train.eval_sentences), seed=step)
    except Exception as e:  # eval must never kill training
        trainer.logger.write(step, {"eval_error": 1.0}, prefix="eval")
        print(f"[eval] synthesis failed at step {step}: {e}")
        return
    art_dir = os.path.join(trainer.work_dir, "eval", f"step_{step:08d}")
    synth.save_outputs(out, art_dir)
    trainer.logger.write(step, {
        "diagonality": float(np.mean(out["diagonality"])),
        "mean_frames": float(np.mean(out["frame_lengths"])),
    }, prefix="eval")
    # TensorBoard image/audio summaries (reference tf.summary parity;
    # SURVEY.md §2.1 logging row): first eval sentence's alignment + wav
    trainer.logger.write_images(step, {
        "eval/alignment": np.asarray(out["alignments"][0]).T,
        "eval/mel": np.asarray(out["mel"][0]).T,
    })
    wav_len = int(out["wav_lengths"][0])
    trainer.logger.write_audios(
        step, {"eval/wav": np.asarray(out["wav"][0][:wav_len])},
        sample_rate=cfg.audio.sample_rate)


def main(argv=None):
    from .utils.platform import enable_compile_cache, respect_platforms_env
    respect_platforms_env()
    enable_compile_cache()
    p = argparse.ArgumentParser(description="Train GST-Tacotron (TPU-native)")
    p.add_argument("--preset", default="taco1_lj")
    p.add_argument("--config", help="config JSON path (overrides preset)")
    p.add_argument("--patterns", required=True)
    p.add_argument("--workdir", required=True)
    p.add_argument("--steps", type=int)
    p.add_argument("--model-parallelism", type=int, default=1)
    p.add_argument("--coordinator",
                   help="multi-host: host:port of process 0 "
                        "(jax.distributed coordinator)")
    p.add_argument("--num-processes", type=int,
                   help="multi-host: total process count")
    p.add_argument("--process-id", type=int,
                   help="multi-host: this process's rank")
    p.add_argument("--profile",
                   help="capture a device trace of ~20 post-compile train "
                        "steps into this directory (TensorBoard/Perfetto)")
    p.add_argument("overrides", nargs="*", help="dotted config overrides k=v")
    args = p.parse_args(argv)

    cfg = load_config(args.config) if args.config else get_preset(args.preset)
    if args.overrides:
        cfg = apply_overrides(cfg, parse_cli_overrides(args.overrides))

    from .parallel import initialize_distributed
    initialize_distributed(args.coordinator, args.num_processes,
                           args.process_id)

    mesh = None
    n_dev = len(jax.devices())
    data_dev = n_dev // max(1, args.model_parallelism)
    if (n_dev > 1 or args.model_parallelism > 1) and (
            cfg.data.batch_size % max(1, data_dev) == 0):
        mesh = make_mesh(args.model_parallelism)

    trainer = Trainer(cfg, args.patterns, args.workdir, mesh)
    trainer.restore_if_available()
    trainer.train(args.steps, eval_fn=default_eval_hook,
                  profile_dir=args.profile)


if __name__ == "__main__":
    main()
