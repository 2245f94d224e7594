#!/usr/bin/env python
"""Performance harness: frames/sec/chip, MDCT round-trip error, transform
latency (XLA matmul vs Pallas fused vs Lee), and train-step throughput.

The profiling subsystem the reference lacks (SURVEY.md §5: its only timing is
test/DCT_benchmark.py and per-iteration prints). Run on the TPU:
    python benchmarks/run_benchmarks.py [--quick]
Writes benchmarks/results.json.

Note on timing: on the axon relay backend block_until_ready does not fence
AOT executions; a derived-scalar fetch does (the device queue is serialized).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

RESULTS = {}
_sum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def timeit(compiled, args, iters=10, warm=3):
    o = compiled(*args)
    float(_sum(o if not isinstance(o, (tuple, list)) else o[0]))

    def run(m):
        t0 = time.perf_counter()
        for _ in range(m):
            o = compiled(*args)
        float(_sum(o if not isinstance(o, (tuple, list)) else o[0]))
        return time.perf_counter() - t0

    run(warm)
    t_small, t_big = run(3), run(3 + iters)
    return (t_big - t_small) / iters


def bench_mdct(quick: bool):
    from pix2pixhdaudiosr_tpu.ops.mdct import IMDCT2, MDCT2
    from pix2pixhdaudiosr_tpu.ops.window import kbdwin
    B, SEG = 64, 32512
    win = kbdwin(512)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, SEG)).astype(np.float32) * 0.3)
    for backend in ("xla", "pallas"):
        try:
            mdct = MDCT2(512, 256, 512, win, backend=backend)
            imdct = IMDCT2(512, 256, 512, win, out_length=SEG, backend=backend)
            c = jax.jit(lambda a: imdct(mdct(a))).lower(x).compile()
            o = c(x)
            err = float(jnp.mean((o - x) ** 2))
            per = timeit(c, (x,))
            RESULTS[f"mdct_roundtrip_{backend}_ms"] = round(per * 1000, 3)
            RESULTS[f"mdct_roundtrip_{backend}_mse"] = err
            print(f"mdct roundtrip [{backend}]: {per * 1000:.3f} ms, mse {err:.2e}")
        except Exception as e:
            print(f"mdct [{backend}] failed: {str(e)[:120]}")


def bench_lee(quick: bool):
    from pix2pixhdaudiosr_tpu.ops.dct import dct_n
    from pix2pixhdaudiosr_tpu.ops.dctlib import dct_lee
    # the reference's DCT_benchmark.py shape: (16, 1, 512, 512)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((16, 1, 512, 512)).astype(np.float32))
    for name, fn in (("matmul", dct_n), ("lee", dct_lee)):
        c = jax.jit(fn).lower(x).compile()
        per = timeit(c, (x,))
        RESULTS[f"dct512_{name}_ms"] = round(per * 1000, 3)
        print(f"dct 512 [{name}]: {per * 1000:.3f} ms on (16,1,512,512)")


def bench_inference(quick: bool):
    from __graft_entry__ import _flagship_cfg
    from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem
    cfg = _flagship_cfg()
    system = Pix2PixHDSystem(cfg)
    B = 16 if quick else 64
    params = jax.jit(lambda k: system.netG.init(
        k, jnp.zeros(system.spectro_shape(1), jnp.float32)))(jax.random.PRNGKey(0))
    audio = jnp.zeros((B, cfg.segment_length), jnp.float32)
    key = jax.random.PRNGKey(1)
    c = jax.jit(lambda p, a, k: system.inference(p, a, k)[0]) \
        .lower(params, audio, key).compile()
    per = timeit(c, (params, audio, key))
    RESULTS["inference_ms_per_batch"] = round(per * 1000, 2)
    RESULTS["inference_frames_per_sec"] = round(B * system.n_frames / per, 1)
    RESULTS["inference_samples_per_sec"] = round(B * cfg.segment_length / per, 1)
    try:
        ca = c.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        RESULTS["inference_tflops"] = round(float(ca["flops"]) / per / 1e12, 1)
    except Exception:
        pass
    print(f"flagship inference: {per * 1000:.2f} ms @ batch {B} "
          f"({RESULTS['inference_frames_per_sec']} frames/s)")


def bench_loader(quick: bool):
    """Host input-pipeline throughput: native C++ pipeline vs numpy fallback
    (the reference's analog is torchaudio + 16 worker processes)."""
    import tempfile
    import numpy as _np
    from pix2pixhdaudiosr_tpu.data import AudioDataset, Loader, write_wav
    from pix2pixhdaudiosr_tpu.runtime import native_audio
    with tempfile.TemporaryDirectory() as d:
        rng = _np.random.default_rng(0)
        for i in range(16):
            x = (rng.standard_normal(48000) * 0.3).astype(_np.float32)
            write_wav(os.path.join(d, f"w{i}.wav"), x, 48000)
        ds = AudioDataset(d, 8000, 48000, 32512)
        ld = Loader(ds, list(range(16)) * 8, batch_size=16, n_threads=8)
        t0 = time.perf_counter()
        n = sum(b["image"].shape[0] for b in ld)
        dt = time.perf_counter() - t0
        RESULTS["loader_items_per_sec"] = round(n / dt, 1)
        RESULTS["loader_native"] = bool(native_audio.available())
        print(f"loader: {n / dt:.1f} items/s (native={native_audio.available()})")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args(argv)
    # fail fast (exit 3) instead of hanging forever when the relay is down
    from pix2pixhdaudiosr_tpu.utils.watchdog import backend_watchdog
    backend_watchdog()
    bench_loader(args.quick)
    bench_mdct(args.quick)
    bench_lee(args.quick)
    bench_inference(args.quick)
    out = os.path.join(os.path.dirname(__file__), "results.json")
    with open(out, "w") as f:
        json.dump(RESULTS, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
