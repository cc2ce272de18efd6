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


def enable_compile_cache(path: str = "/tmp/gst_tacotron_jax_cache") -> None:
    """Enable JAX's persistent compilation cache (works through the axon
    remote-compile path — repeat compiles drop from minutes to seconds;
    CLAUDE.md #13). Called by every TPU-facing CLI. Override the location
    with GST_TACOTRON_JAX_CACHE; set it empty to disable."""
    path = os.environ.get("GST_TACOTRON_JAX_CACHE", path)
    if not path:
        return
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
