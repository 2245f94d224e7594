"""Persistent XLA compilation cache.

First compiles of the flagship programs cost minutes through this backend's
remote-compile path; the persistent cache (verified to work through it) makes
repeat CLI invocations start in seconds. Enabled by every CLI entry point;
override the location with JAX_COMPILATION_CACHE_DIR, disable with
AUDIOSR_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os


def enable_compile_cache(default_dir: str = "~/.cache/audiosr_tpu_xla") -> None:
    if os.environ.get("AUDIOSR_NO_COMPILE_CACHE") == "1":
        return
    try:
        import jax
        path = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                              os.path.expanduser(default_dir))
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a requirement
