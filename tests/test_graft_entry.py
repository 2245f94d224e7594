"""Driver-contract test: __graft_entry__.dryrun_multichip must pass in a
subprocess that does NOT inherit the conftest's cpu-forcing (the driver runs
it `python -c ...` with the stock environment — MULTICHIP_r01.json showed the
round-1 version crashing there with one real device)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    """The driver's environment: no conftest cpu-forcing. We drop the vars
    tests/conftest.py sets so dryrun_multichip must self-provision."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    # Keep the run hermetic/offline: a missing axon tunnel in CI must not
    # break the CPU-forced dryrun.
    env["JAX_PLATFORMS"] = env.get("GRAFT_DRIVER_PLATFORM", "")
    if not env["JAX_PLATFORMS"]:
        del env["JAX_PLATFORMS"]
    return env


def test_dryrun_multichip_subprocess_no_conftest():
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=REPO, env=_driver_env(), capture_output=True, text=True,
        timeout=1800)  # 10 legs; single-core CI hosts compile slowly
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    out = proc.stdout
    # All four parallelism legs must report success.
    assert "dp train step ok" in out, out
    assert "zero-1 step ok" in out, out
    assert "cp generator ok" in out, out
    assert "tp resblocks ok" in out, out


def test_dryrun_multichip_in_process_with_enough_devices():
    """With the conftest's 8 virtual devices already provisioned, the
    fallback path (config update raises, count check passes) must work."""
    import __graft_entry__
    __graft_entry__.dryrun_multichip(4)
