#!/usr/bin/env python
"""AOT compile + per-op profiling of the inference graph.

TPU-native equivalent of the reference's TensorRT engine runner (reference
deprecated/run_engine.py, with its per-layer `Profiler` at :34-60, and the
ONNX/TRT export flags in reference options/test_options.py:14-16): on TPU the
deployment artifact is an XLA AOT executable. This tool lowers the flagship
inference function, serializes the compiled executable (jax AOT / jax.export
when available), and reports cost analysis (FLOPs, bytes) plus wall-clock —
the per-layer-profile analog.

Usage: python tools/aot_engine.py [--batch 4] [--out engine.bin]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--out", type=str, default="")
    p.add_argument("--tiny", action="store_true",
                   help="CPU smoke mode: shrink the config to exercise "
                        "every code path without the chip (same pattern as "
                        "the benchmarks/ harnesses)")
    args = p.parse_args(argv)

    from __graft_entry__ import _flagship_cfg
    from benchmarks.common import tiny_or_fail_fast
    from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem

    cfg = _flagship_cfg()
    tiny_or_fail_fast(args.tiny)
    if args.tiny:
        cfg = cfg.replace(ngf=8, n_blocks_global=1, n_blocks_local=1,
                          n_downsample_global=2, compute_dtype="float32")
        args.batch = min(args.batch, 2)
    system = Pix2PixHDSystem(cfg)
    params = jax.jit(lambda k: system.netG.init(
        k, jnp.zeros(system.spectro_shape(1), jnp.float32)))(jax.random.PRNGKey(0))

    def fwd(p, audio, rng):
        return system.inference(p, audio, rng)[0]

    audio = jnp.zeros((args.batch, cfg.segment_length), jnp.float32)
    rng = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    lowered = jax.jit(fwd).lower(params, audio, rng)
    compiled = lowered.compile()
    print(f"compile: {time.perf_counter() - t0:.1f}s")

    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        print("cost analysis:", {k: v for k, v in ca.items()
                                 if k in ("flops", "bytes accessed",
                                          "transcendentals")})
    except Exception as e:
        print("cost analysis unavailable:", e)
    try:
        mem = compiled.memory_analysis()
        print("memory analysis:", mem)
    except Exception as e:
        print("memory analysis unavailable:", e)

    # relay-safe timing (CLAUDE.md): block_until_ready does not fence AOT
    # executions on this backend, and ad-hoc sync ops (slices/np.asarray)
    # would remote-compile INSIDE the timed region — fetch a pre-compiled
    # derived scalar instead and difference two run lengths to cancel the
    # dispatch constant.
    sumjit = jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)))
    float(sumjit(compiled(params, audio, rng)))   # warm both programs

    def run(m):
        t0 = time.perf_counter()
        o = None
        for _ in range(m):
            o = compiled(params, audio, rng)
        float(sumjit(o))
        return time.perf_counter() - t0

    run(2)
    t3, tn = run(3), run(13)
    print(f"exec: {(tn - t3) / 10 * 1000:.2f} ms/call @ batch {args.batch}")

    if args.out:
        try:
            from jax import export as jexport
            exported = jexport.export(jax.jit(fwd))(params, audio, rng)
            blob = exported.serialize()
            with open(args.out, "wb") as f:
                f.write(blob)
            print(f"serialized engine -> {args.out} ({len(blob)} bytes)")
        except Exception as e:
            print("export unavailable on this backend:", e)


if __name__ == "__main__":
    main()
