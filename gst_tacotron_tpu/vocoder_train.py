"""WaveRNN vocoder trainer (config 5, BASELINE.json:11).

A separate training stage from the seq2seq model (as in WaveRNN practice):
consumes patterns generated with --store-wav, crops fixed-size (mel segment,
wav segment) pairs — static shapes, one compiled program — and optimizes the
teacher-forced mu-law cross-entropy. Data-parallel over the mesh `data` axis;
the GRU/FC kernels carry the `model`-axis TP rules (parallel/sharding.py).
"""

from __future__ import annotations

import argparse
import functools
import os
import time
from typing import Any, Dict, Iterator, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .checkpoint import CheckpointManager
from .config import Config, apply_overrides, get_preset, load_config, parse_cli_overrides
from .data.loader import PatternDataset
from .metrics import MetricLogger
from .models.wavernn import WaveRNN
from .train import TrainState, make_optimizer
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class VocoderSegmentLoader:
    """Yields {mel (B, F, M), wav (B, F*hop)} random crops, fixed shapes.

    Hot-path design (this runtime is wire-bytes- and host-latency-bound, see
    CLAUDE.md): usable utterances are decompressed ONCE into a RAM cache as
    float16 (the 8-bit mu-law target loses nothing at f16, and mel values are
    |x| <= max_abs_value), and batches are assembled from RAM — no per-step
    npz decompression. Batches ship f16 (half the wire bytes); the train step
    casts on device.
    """

    def __init__(self, dataset: PatternDataset, hop: int, *,
                 segment_frames: int = 24, batch_size: int = 16, seed: int = 0,
                 shard_index: int = 0, num_shards: int = 1):
        self.ds = dataset
        self.hop = hop
        self.segment_frames = segment_frames
        self.batch_size = batch_size
        self.rng = np.random.default_rng((seed, shard_index))
        # Only utterances long enough AND containing wav. Metadata written by
        # pattern.py records has_wav per entry; older pattern dirs lack the
        # key, so entries without it are probed by opening the npz once here
        # (up-front, not mid-training — a partially --store-wav'd dir must
        # fail or filter at construction, never KeyError inside __iter__).
        self.usable = []
        for i, e in enumerate(dataset.entries):
            if e["mel_len"] <= segment_frames + 2:
                continue
            has_wav = e.get("has_wav")
            if has_wav is None:
                has_wav = "wav" in dataset.load(i)
            if has_wav:
                self.usable.append(i)
        self.usable = self.usable[shard_index::num_shards] or self.usable
        if not self.usable:
            raise ValueError(
                "no usable utterances for vocoder training; patterns must be "
                "generated with --store-wav and exceed segment_frames"
            )
        self._audio_cfg = None  # set for wav-only shards (mel on demand)
        probe = self._get(self.usable[0])
        self.num_mels = int(probe[0].shape[1])

    def _get(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        if not hasattr(self, "_cache"):
            self._cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        hit = self._cache.get(idx)
        if hit is None:
            item = self.ds.load(idx)
            if "mel" not in item:
                # wav-only shard: compute the mel from the stored waveform
                # (the numpy oracle — identical params to the on-device
                # features the seq2seq stage trains/infers on)
                from .dsp import ref as dsp_ref

                if self._audio_cfg is None:
                    from .config import AudioConfig

                    meta = self.ds.metadata.get("audio", {})
                    self._audio_cfg = AudioConfig(**{
                        k: v for k, v in meta.items()
                        if k in AudioConfig.__dataclass_fields__})
                mel = dsp_ref.melspectrogram(
                    np.asarray(item["wav"], np.float64), self._audio_cfg)
            else:
                mel = item["mel"]
            hit = (mel.astype(np.float16), item["wav"].astype(np.float16))
            self._cache[idx] = hit
        return hit

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        f = self.segment_frames
        while True:
            mel_b = np.zeros((self.batch_size, f, self.num_mels), np.float16)
            wav_b = np.zeros((self.batch_size, f * self.hop), np.float16)
            for j in range(self.batch_size):
                idx = int(self.rng.choice(self.usable))
                mel, wav = self._get(idx)
                max_start = min(mel.shape[0] - f,
                                (len(wav) - f * self.hop) // self.hop)
                start = int(self.rng.integers(0, max(1, max_start)))
                mel_b[j] = mel[start : start + f]
                seg = wav[start * self.hop : (start + f) * self.hop]
                wav_b[j, : len(seg)] = seg
            yield {"mel": mel_b, "wav": wav_b}


class VocoderTrainer:
    def __init__(self, cfg: Config, pattern_dir: str, work_dir: str,
                 mesh: Optional[Mesh] = None, segment_frames: int = 24,
                 batch_size: int = 16):
        from .vocoder import check_vocoder_hop

        check_vocoder_hop(cfg)
        self.cfg = cfg
        self.mesh = mesh
        os.makedirs(work_dir, exist_ok=True)
        ds = PatternDataset(pattern_dir, cfg.data.metadata_file)
        self.loader = VocoderSegmentLoader(
            ds, cfg.model.vocoder.wavernn_hop,
            segment_frames=segment_frames, batch_size=batch_size,
            seed=cfg.train.seed, shard_index=jax.process_index(),
            num_shards=jax.process_count(),
        )
        self.model = WaveRNN(cfg.model.vocoder, cfg.model.num_mels)
        batch = next(iter(self.loader))
        variables = self.model.init(
            jax.random.PRNGKey(cfg.train.seed),
            jnp.asarray(batch["mel"]), jnp.asarray(batch["wav"]),
        )
        self.tx = make_optimizer(cfg.optimizer)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats={},
            opt_state=self.tx.init(variables["params"]),
            rng=jax.random.PRNGKey(cfg.train.seed + 1),
        )
        self.step_fn = self._make_step()
        self.ckpt = CheckpointManager(os.path.join(work_dir, "vocoder_ckpt"),
                                      keep=cfg.train.keep_checkpoints)
        self.logger = MetricLogger(os.path.join(work_dir, "vocoder_logs"))

    def restore_if_available(self) -> bool:
        step = self.ckpt.latest_step()
        if step is None:
            return False
        self.state = self.ckpt.restore(self.state, step)
        return True

    def _make_step(self):
        model, tx = self.model, self.tx

        def step(state: TrainState, batch):
            # Batches arrive f16 (wire format); compute in f32 on device.
            mel = batch["mel"].astype(jnp.float32)
            wav = batch["wav"].astype(jnp.float32)

            def loss_fn(params):
                return model.apply({"params": params}, mel, wav,
                                   method=model.loss)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return state.replace(step=state.step + 1, params=params,
                                 opt_state=opt_state), {"loss": loss}

        if self.mesh is None:
            return jax.jit(step, donate_argnums=(0,))
        batch_sharding = NamedSharding(self.mesh, P("data"))
        return jax.jit(step, in_shardings=(None, batch_sharding),
                       donate_argnums=(0,))

    def train(self, total_steps: int) -> TrainState:
        # Background host assembly: batch crops are built in a thread feeding
        # a bounded queue, so host work overlaps device compute. The step
        # counter is tracked host-side — `int(self.state.step)` would force a
        # device fetch of the donated state every iteration (~one tunnel RTT
        # per step on this runtime).
        import queue as _queue
        import threading

        start_step = int(self.state.step)
        todo = total_steps - start_step
        q: _queue.Queue = _queue.Queue(maxsize=4)

        def _feed():
            it = iter(self.loader)
            for _ in range(max(0, todo)):
                q.put(next(it))

        feeder = threading.Thread(target=_feed, daemon=True)
        feeder.start()

        t0, window = time.time(), 0
        for step in range(start_step + 1, total_steps + 1):
            batch = {k: jnp.asarray(v) for k, v in q.get().items()}
            if self.mesh is not None:
                from .parallel import shard_batch
                batch = shard_batch(batch, self.mesh)
            self.state, metrics = self.step_fn(self.state, batch)
            window += 1
            if step % self.cfg.train.log_every == 0:
                # Sync (the loss fetch) BEFORE taking dt, or steps_per_sec
                # times only the async dispatches (see train.py).
                loss = float(metrics["loss"])
                dt = time.time() - t0
                self.logger.write(step, {
                    "loss": loss,
                    "steps_per_sec": window / max(dt, 1e-9),
                }, prefix="vocoder")
                t0, window = time.time(), 0
            if step % self.cfg.train.checkpoint_every == 0:
                self.ckpt.save(step, jax.device_get(self.state))
        self.ckpt.save(int(self.state.step), jax.device_get(self.state))
        self.ckpt.wait()
        return self.state


def main(argv=None):
    from .utils.platform import enable_compile_cache, respect_platforms_env
    respect_platforms_env()
    enable_compile_cache()
    p = argparse.ArgumentParser(description="Train the WaveRNN vocoder stage")
    p.add_argument("--preset", default="gst_wavernn")
    p.add_argument("--config")
    p.add_argument("--patterns", required=True)
    p.add_argument("--workdir", required=True)
    p.add_argument("--steps", type=int, default=100000)
    p.add_argument("--segment-frames", type=int, default=24)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    cfg = load_config(args.config) if args.config else get_preset(args.preset)
    if args.overrides:
        cfg = apply_overrides(cfg, parse_cli_overrides(args.overrides))

    mesh = None
    n_dev = len(jax.devices())
    if n_dev > 1 and args.batch_size % n_dev == 0:
        from .parallel import make_mesh
        mesh = make_mesh(1)

    trainer = VocoderTrainer(cfg, args.patterns, args.workdir, mesh,
                             segment_frames=args.segment_frames,
                             batch_size=args.batch_size)
    trainer.restore_if_available()
    trainer.train(args.steps)


if __name__ == "__main__":
    main()
