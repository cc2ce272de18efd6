"""Tracing / profiling hooks (SURVEY.md §5 "Tracing / profiling").

The reference has nothing beyond TensorBoard scalars; here:
  * `profile_trace(dir)` — context manager around `jax.profiler.trace`,
    capturing device traces viewable in TensorBoard / Perfetto. Model code is
    annotated with `jax.named_scope` regions (encoder / gst /
    decoder_ar_scan / postnet) so kernels attribute to pipeline stages.
  * `maybe_start_server(port)` — on-demand `jax.profiler.start_server` for
    live capture from a running trainer.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True) -> Iterator[None]:
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield


_server = None


def maybe_start_server(port: Optional[int]) -> None:
    global _server
    if port and _server is None:
        _server = jax.profiler.start_server(port)


class StepWindowProfiler:
    """Capture a device trace over a window of hot-loop steps.

    Consumed by `train --profile DIR` and `synthesize --profile DIR`:
    skips `warmup` iterations (compile + cache effects), then traces the
    next `active` iterations and writes a TensorBoard/Perfetto trace under
    DIR. `tick()` is called once per loop iteration; `stop()` is idempotent
    and also runs on context exit so a crashed loop still flushes the trace.
    """

    def __init__(self, log_dir: Optional[str], warmup: int = 2,
                 active: int = 20):
        self.log_dir = log_dir
        self.warmup = warmup
        self.active = active
        self._n = 0
        self._tracing = False
        self._done = log_dir is None

    def tick(self) -> None:
        if self._done:
            return
        if self._n == self.warmup:
            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._tracing = True
        elif self._n == self.warmup + self.active:
            self.stop()
        self._n += 1

    def stop(self) -> None:
        if self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False
        self._done = True

    def __enter__(self) -> "StepWindowProfiler":
        return self

    def __exit__(self, *exc) -> None:
        self.stop()
