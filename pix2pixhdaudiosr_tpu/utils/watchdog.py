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


def _env_platform_override(env_value, current):
    """The JAX_PLATFORMS env var wins only when it NARROWS the current
    platform list (sitecustomize's relay register overrides the env var
    with "axon,cpu" at interpreter start; an embedding program's explicit
    jax.config.update("jax_platforms", ...) must not be undone by the
    stale global env var). Returns the value to apply, or None."""
    if not env_value or env_value == (current or ""):
        return None
    if set(env_value.split(",")) <= set((current or "").split(",")):
        return env_value
    return None


# The probe child must ALWAYS end by touching the backend: backend_watchdog
# alone returns before probing when the caller disabled it via
# AUDIOSR_INIT_TIMEOUT=0, which would make a probe vacuously "succeed"
# against a downed relay. The explicit jax.devices() guarantees the touch;
# the subprocess timeout in wait_for_backend bounds the resulting hang.
_PROBE_CODE = ("from pix2pixhdaudiosr_tpu.utils.watchdog import "
               "backend_watchdog; backend_watchdog(); "
               "import jax; jax.devices()")


def wait_for_backend(window: float = 1800.0, probe_timeout: float = 240.0,
                     sleep_s: float = 60.0, probe=None) -> int:
    """Bounded retry window for a flapping relay (bench capture path).

    `backend_watchdog` is the right per-process behavior (fail fast, let the
    scheduler retry), but a one-shot capture like bench.py loses a whole
    round's record if the relay happens to be down at the single moment the
    driver runs it. This re-probes the backend in a SUBPROCESS (a hung
    backend init cannot be cancelled in-process) every `sleep_s` seconds
    until one probe succeeds or `window` seconds elapse, then exits 3.
    Tune/disable with AUDIOSR_BENCH_RETRY_WINDOW (seconds; <= 0 skips the
    pre-probe entirely — no redundant relay init; the process's own
    `backend_watchdog()` then provides the old fail-fast behavior).

    The happy path costs one extra relay init (the probe subprocess); that
    is the price of being able to retry at all — a hung in-process init
    cannot be cancelled, so the first touch must be sacrificial.

    Returns the number of probe attempts on success (for logging/tests),
    or 0 when the pre-probe is skipped.
    """
    import subprocess
    import time

    env_window = os.environ.get("AUDIOSR_BENCH_RETRY_WINDOW")
    if env_window is not None:
        try:
            window = float(env_window)
        except ValueError:
            pass
    if window <= 0:
        return 0

    if probe is None:
        def probe():
            # a caller-set AUDIOSR_INIT_TIMEOUT wins (lets the driver trade
            # probe patience for more retries inside the same window)
            env = dict(os.environ)
            env.setdefault("AUDIOSR_INIT_TIMEOUT", str(probe_timeout))
            try:
                inner = float(env["AUDIOSR_INIT_TIMEOUT"])
            except ValueError:
                inner = probe_timeout
            try:
                # hard outer bound converts a hung child into rc 3; it
                # scales with a caller-set inner timeout so a deliberately
                # patient probe is not killed early
                return subprocess.run(
                    [sys.executable, "-c", _PROBE_CODE],
                    env=env, cwd=os.path.dirname(os.path.dirname(
                        os.path.dirname(os.path.abspath(__file__)))),
                    timeout=max((inner if inner > 0 else probe_timeout) * 2,
                                60.0),
                ).returncode
            except subprocess.TimeoutExpired:
                return 3

    deadline = time.monotonic() + window
    attempt = 0
    while True:
        attempt += 1
        t0 = time.monotonic()
        rc = probe()
        if rc == 0:
            return attempt
        if time.monotonic() >= deadline:
            print(f"wait_for_backend: relay still down after {attempt} "
                  f"probe(s) over {window:.0f}s window; exiting",
                  file=sys.stderr, flush=True)
            raise SystemExit(3)
        print(f"wait_for_backend: probe {attempt} failed (rc={rc}, "
              f"{time.monotonic() - t0:.0f}s); retrying in {sleep_s:.0f}s "
              f"({deadline - time.monotonic():.0f}s left in window)",
              file=sys.stderr, flush=True)
        time.sleep(min(sleep_s, max(0.0, deadline - time.monotonic())))


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
    # sitecustomize's device-relay register sets jax_platforms itself at
    # interpreter start ("axon,cpu"), so the JAX_PLATFORMS env var has
    # already been overridden by the time a CLI runs. Re-apply it through
    # the config API so `JAX_PLATFORMS=cpu python train.py ...` behaves
    # the way every JAX user expects (and CPU drive-runs work when the
    # TPU relay is down) — but only when the env value NARROWS the current
    # platform list. If an embedding program explicitly chose a different
    # backend (jax.config.update("jax_platforms", "cpu") before calling a
    # CLI main()), the stale global env var must not override that choice.
    override = _env_platform_override(os.environ.get("JAX_PLATFORMS"),
                                      jax.config.jax_platforms)
    if override:
        try:
            jax.config.update("jax_platforms", override)
        except Exception:
            pass  # backend already initialized; keep whatever it chose
    jax.devices()
    done.set()
