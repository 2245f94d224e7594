"""Backend-init watchdog: the env-var re-apply must narrow, never override.

The container's sitecustomize registers the TPU relay backend and sets
jax_platforms to "axon,cpu" at interpreter start, clobbering the
JAX_PLATFORMS env var. backend_watchdog re-applies the env var so CPU
drive-runs of the CLIs work — but an embedding program's explicit
jax.config.update("jax_platforms", "cpu") (the repo's own documented
CPU-forcing pattern) must win over the stale global env var."""

import os

import jax
import pytest

from pix2pixhdaudiosr_tpu.utils.watchdog import (_env_platform_override,
                                                 backend_watchdog,
                                                 wait_for_backend)


def test_env_narrows_sitecustomize_default():
    # `JAX_PLATFORMS=cpu python train.py` on the relay image: register set
    # "axon,cpu", the user asked for cpu -> apply
    assert _env_platform_override("cpu", "axon,cpu") == "cpu"


def test_env_does_not_override_explicit_config():
    # embedding program called jax.config.update("jax_platforms", "cpu");
    # the global env still says axon -> keep the explicit choice
    assert _env_platform_override("axon", "cpu") is None
    assert _env_platform_override("axon,cpu", "cpu") is None


def test_noop_cases():
    assert _env_platform_override(None, "axon,cpu") is None
    assert _env_platform_override("", "axon,cpu") is None
    assert _env_platform_override("cpu", "cpu") is None       # already equal
    assert _env_platform_override("cpu", None) is None        # config unset:
    # jax consumes the env var itself at backend init


def test_backend_watchdog_cpu_fast_path(monkeypatch):
    # on CPU the init returns immediately and the timer is cancelled; the
    # explicit cpu config (tests/conftest.py) must survive the call
    monkeypatch.setenv("JAX_PLATFORMS", "axon")  # stale global env
    backend_watchdog(seconds=60.0)
    assert jax.config.jax_platforms == "cpu"
    assert jax.devices()[0].platform == "cpu"


def test_timeout_env_disable(monkeypatch):
    monkeypatch.setenv("AUDIOSR_INIT_TIMEOUT", "0")
    backend_watchdog(seconds=0.001)  # returns before starting any timer


def test_wait_for_backend_immediate_success(monkeypatch):
    # a driver-exported AUDIOSR_BENCH_RETRY_WINDOW overrides the window
    # argument — isolate so these tests don't inherit a 30-min window
    monkeypatch.delenv("AUDIOSR_BENCH_RETRY_WINDOW", raising=False)
    assert wait_for_backend(window=10.0, sleep_s=0.01, probe=lambda: 0) == 1


def test_wait_for_backend_flapping_relay_recovers(monkeypatch):
    # relay down for two probes, then back: the capture must survive
    monkeypatch.delenv("AUDIOSR_BENCH_RETRY_WINDOW", raising=False)
    rcs = iter([3, 3, 0])
    assert wait_for_backend(window=10.0, sleep_s=0.01,
                            probe=lambda: next(rcs)) == 3


def test_wait_for_backend_window_exhausted_exits_3(monkeypatch):
    monkeypatch.delenv("AUDIOSR_BENCH_RETRY_WINDOW", raising=False)
    with pytest.raises(SystemExit) as exc:
        wait_for_backend(window=0.05, sleep_s=0.01, probe=lambda: 3)
    assert exc.value.code == 3


def test_wait_for_backend_env_window_zero_skips_preprobe(monkeypatch):
    # AUDIOSR_BENCH_RETRY_WINDOW=0 skips the pre-probe entirely (no
    # redundant relay init on the happy path); the caller's own
    # backend_watchdog then provides the old fail-fast behavior
    monkeypatch.setenv("AUDIOSR_BENCH_RETRY_WINDOW", "0")
    calls = []
    assert wait_for_backend(window=999.0, sleep_s=0.01,
                            probe=lambda: calls.append(1) or 3) == 0
    assert calls == []


def test_probe_child_always_touches_backend():
    # the probe subprocess must end with an explicit jax.devices() so a
    # caller-set AUDIOSR_INIT_TIMEOUT=0 (inner watchdog disabled) cannot
    # make a probe vacuously succeed without touching the relay — the
    # outer subprocess timeout is what bounds it then
    from pix2pixhdaudiosr_tpu.utils.watchdog import _PROBE_CODE
    assert _PROBE_CODE.strip().endswith("jax.devices()")
