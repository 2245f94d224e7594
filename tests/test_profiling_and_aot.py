"""utils/profiling.py (the tracing subsystem the reference lacks, SURVEY §5)
and tools/aot_engine.py (the TensorRT-engine-runner analog: XLA AOT compile +
cost analysis + serialized export, reference deprecated/run_engine.py)."""

import jax
import pytest

from pix2pixhdaudiosr_tpu.utils.profiling import StepTimer, trace


def test_steptimer_warmup_skip_and_summary():
    st = StepTimer(warmup=2)
    for _ in range(5):
        st.start()
        st.stop()
    s = st.summary()
    assert s["steps"] == 3  # first `warmup` laps discarded
    assert 0 <= s["p50_ms"] <= s["p95_ms"]
    assert s["mean_ms"] >= 0


def test_steptimer_empty_and_unbalanced_stop():
    st = StepTimer()
    st.stop()  # stop without start is a no-op, not an error
    assert st.summary() == {}


def test_trace_falls_back_when_profiler_unavailable(monkeypatch, capsys):
    def boom(log_dir):
        raise RuntimeError("backend does not support tracing")

    monkeypatch.setattr(jax.profiler, "start_trace", boom)
    with trace("/tmp/unused"):
        pass  # must not raise, must not call stop_trace
    assert "falling back" in capsys.readouterr().out


def test_trace_real_backend(tmp_path):
    # the CPU backend supports profiler traces; the context must start/stop
    # cleanly and leave the trace directory behind
    with trace(str(tmp_path)):
        float(jax.jit(lambda x: x + 1)(1.0))
    assert any(tmp_path.iterdir())


@pytest.mark.slow
def test_aot_engine_tiny_end_to_end(tmp_path, capsys):
    from tools.aot_engine import main
    out = tmp_path / "engine.bin"
    main(["--tiny", "--out", str(out)])
    printed = capsys.readouterr().out
    assert "cost analysis:" in printed
    assert "ms/call" in printed
    # the serialized jax.export artifact (the TRT-engine analog) was written
    assert "serialized engine" in printed
    assert out.exists() and out.stat().st_size > 0
