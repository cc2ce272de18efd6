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
