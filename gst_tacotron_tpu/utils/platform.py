"""Backend-selection helper for the CLIs.

On this machine a sitecustomize pins `jax_platforms` to "axon,cpu" in every
interpreter, which silently overrides a user's `JAX_PLATFORMS=cpu` (the env
var alone is NOT enough — see CLAUDE.md #1). The CLIs call
`respect_platforms_env()` first so an explicit single-platform request in
the environment wins: `JAX_PLATFORMS=cpu python -m gst_tacotron_tpu.train
...` really runs on CPU (the BASELINE config-1 "CPU-runnable" requirement),
and a wedged accelerator tunnel can't hang a CPU run.
"""

from __future__ import annotations

import os


def respect_platforms_env() -> None:
    """If JAX_PLATFORMS names a single explicit platform, re-apply it over
    whatever a sitecustomize set. No-op otherwise (the default behaviour —
    accelerator with CPU fallback — is untouched)."""
    want = os.environ.get("JAX_PLATFORMS", "")
    if want and "," not in want and want != "axon":
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass
