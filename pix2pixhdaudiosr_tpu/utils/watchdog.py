"""Fail-fast backend initialization watchdog.

The axon relay backing the TPU can die mid-session, after which
`jax.devices()` blocks forever inside backend init — a hung training job
looks identical to a slow compile. Every CLI calls `backend_watchdog()`
before touching the device: if the backend does not come up within the
timeout, the process exits 3 with a clear message so schedulers retry
instead of hanging (SURVEY.md §5 failure-detection subsystem; verified
against a live relay outage on 2026-08-17).

CPU/interpret runs are unaffected (init returns in milliseconds, the
timer is cancelled). Tune or disable with AUDIOSR_INIT_TIMEOUT (seconds;
0 disables).
"""

from __future__ import annotations

import os
import sys
import threading


def backend_watchdog(seconds: float = 240.0) -> None:
    env = os.environ.get("AUDIOSR_INIT_TIMEOUT")
    if env is not None:
        try:
            seconds = float(env)
        except ValueError:
            pass
    if seconds <= 0:
        return

    done = threading.Event()

    def boom():
        if not done.wait(seconds):
            print(f"backend watchdog: device backend failed to initialize "
                  f"within {seconds:.0f}s (relay down?); exiting",
                  file=sys.stderr, flush=True)
            os._exit(3)

    threading.Thread(target=boom, daemon=True).start()
    import jax
    # sitecustomize imports jax at interpreter start, before user code —
    # by the time a CLI runs, the JAX_PLATFORMS env var has already been
    # consumed and re-exporting it does nothing. Re-apply it through the
    # config API so `JAX_PLATFORMS=cpu python train.py ...` behaves the
    # way every JAX user expects (and CPU drive-runs work when the TPU
    # relay is down).
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        try:
            jax.config.update("jax_platforms", platforms)
        except Exception:
            pass  # backend already initialized; keep whatever it chose
    jax.devices()
    done.set()
