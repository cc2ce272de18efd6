"""Profiling consumer tests (SURVEY.md §5 "Tracing / profiling"): the
train/synthesize --profile flags drive StepWindowProfiler / profile_trace,
which must actually produce a trace artifact on disk."""

import os

import jax
import jax.numpy as jnp

from gst_tacotron_tpu.utils.profiling import StepWindowProfiler, profile_trace


def _trace_files(root):
    return [os.path.join(d, f) for d, _, fs in os.walk(root) for f in fs]


def test_step_window_profiler_writes_trace(tmp_path):
    log_dir = str(tmp_path / "trace")
    f = jax.jit(lambda x: jnp.sin(x) @ jnp.cos(x).T)
    x = jnp.ones((16, 16))
    with StepWindowProfiler(log_dir, warmup=1, active=3) as prof:
        for _ in range(6):
            prof.tick()
            x = f(x) * 1e-3 + 1.0
        x.block_until_ready()
    assert _trace_files(log_dir), "no trace artifact written"


def test_step_window_profiler_disabled_is_noop(tmp_path):
    prof = StepWindowProfiler(None)
    for _ in range(5):
        prof.tick()
    prof.stop()  # idempotent, never started


def test_step_window_profiler_stop_flushes_partial_window(tmp_path):
    log_dir = str(tmp_path / "partial")
    prof = StepWindowProfiler(log_dir, warmup=0, active=100)
    prof.tick()
    jnp.zeros(8).block_until_ready()
    prof.stop()  # loop ended before the window filled
    prof.stop()  # idempotent
    assert _trace_files(log_dir)


def test_profile_trace_context_manager(tmp_path):
    log_dir = str(tmp_path / "cm")
    with profile_trace(log_dir):
        jnp.ones((8, 8)).sum().block_until_ready()
    assert _trace_files(log_dir)
