"""Contract tests for the shared benchmark sweep (benchmarks/common.serve_sweep),
the timing harness behind benchmarks/serve_latency.py and
benchmarks/g730_experiment.py. Pins on CPU: the per-batch result schema, the
OOM-break rule (larger batches will also OOM), and the transient-error
continue rule (one flaky remote compile must not masquerade as a memory
ceiling — ADVICE r4)."""

import types

import jax.numpy as jnp
import pytest

from benchmarks.common import serve_sweep
from pix2pixhdaudiosr_tpu.config import Config
from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem

TINY = Config(
    net_g="global", ngf=4, n_downsample_global=2, n_blocks_global=1,
    ndf=4, n_layers_d=2, num_d=2, input_nc=2, output_nc=2, label_nc=0,
    explicit_encoding=True, mask_mode="mode2", no_instance=True,
    no_vgg_loss=True, batch_size=1,
    segment_length=32512, compute_dtype="float32",
)

RESULT_FIELDS = ("ms_per_batch", "frames_per_sec", "samples_per_sec",
                 "achieved_tflops", "realtime_factor", "bytes_gb",
                 "compile_s")


def test_serve_sweep_schema_on_real_system():
    system = Pix2PixHDSystem(TINY)
    res = {}
    serve_sweep(system, TINY, [1, 2], res,
                base_iters=1, extra_iters=lambda b: 1)
    assert res["n_params_g"] > 0
    for key in ("b1", "b2"):
        assert "error" not in res[key], res[key]
        for f in RESULT_FIELDS:
            assert f in res[key], (key, f)
            assert isinstance(res[key][f], float), (key, f)


def _fake_system(fail_batches, msg):
    """Minimal object satisfying serve_sweep's surface; inference raises at
    trace time for the given (static) batch sizes so the error-classification
    branch runs without needing a device that can actually OOM."""
    netg = types.SimpleNamespace(
        init=lambda key, x: {"w": jnp.zeros((2, 2), jnp.float32)})

    class Fake:
        netG = netg
        dtype = jnp.float32
        n_frames = 4

        @staticmethod
        def spectro_shape(b):
            return (b, 4, 4, 2)

        @staticmethod
        def inference(p, a, k):
            if a.shape[0] in fail_batches:
                raise RuntimeError(msg)
            return (jnp.sum(a) + jnp.sum(p["w"]),)

    return Fake()


FAKE_CFG = types.SimpleNamespace(segment_length=16, hr_sampling_rate=48000)


def test_serve_sweep_transient_error_continues():
    res = {}
    serve_sweep(_fake_system({2}, "connection reset by relay"), FAKE_CFG,
                [1, 2, 3], res, base_iters=1, extra_iters=lambda b: 1)
    assert "error" not in res["b1"]
    assert "connection reset" in res["b2"]["error"]
    assert "b3" in res and "error" not in res["b3"]  # sweep kept going


def test_serve_sweep_oom_breaks():
    res = {}
    serve_sweep(_fake_system({2}, "RESOURCE_EXHAUSTED: out of memory"),
                FAKE_CFG, [1, 2, 3], res,
                base_iters=1, extra_iters=lambda b: 1)
    assert "error" not in res["b1"]
    assert "RESOURCE_EXHAUSTED" in res["b2"]["error"]
    assert "b3" not in res  # larger batches would also OOM


def test_serve_sweep_oom_marker_past_truncation_still_breaks():
    # relay errors arrive wrapped in long RPC prefixes; the OOM marker can
    # land beyond the 400-char stored truncation — classification must use
    # the full message (a truncated-classify bug would sweep on, paying a
    # 20-300 s remote compile per larger batch)
    msg = "x" * 450 + " RESOURCE_EXHAUSTED: out of memory"
    res = {}
    serve_sweep(_fake_system({2}, msg), FAKE_CFG, [1, 2, 3], res,
                base_iters=1, extra_iters=lambda b: 1)
    assert "error" in res["b2"] and len(res["b2"]["error"]) <= 400
    assert "b3" not in res  # broke despite the marker being truncated away


def test_serve_sweep_param_count_gate():
    with pytest.raises(AssertionError):
        serve_sweep(_fake_system(set(), ""), FAKE_CFG, [], {},
                    expect_params=999)


def test_g730_train_attempts_parser():
    from benchmarks.g730_experiment import parse_train_attempts

    assert parse_train_attempts(["32", "16:full", "8:full:mubf16",
                                 "4:mubf16", "2:dots"]) == [
        (32, None, False), (16, "full", False), (8, "full", True),
        (4, None, True), (2, "dots", False)]
    # a typo must fail NOW, not silently record the capture under the
    # wrong knob label (nor blow up minutes later at trace time)
    with pytest.raises(SystemExit, match="unknown token"):
        parse_train_attempts(["32:full:mubf816"])
    with pytest.raises(SystemExit, match="unknown token"):
        parse_train_attempts(["16:fulll"])
    with pytest.raises(SystemExit, match="unknown token"):
        parse_train_attempts(["full:16"])  # swapped fields: '16' is caught
    with pytest.raises(SystemExit, match="batch must be an integer"):
        parse_train_attempts(["full"])
    with pytest.raises(SystemExit, match="empty"):
        parse_train_attempts([])
