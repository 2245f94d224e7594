#!/usr/bin/env python
"""Whole-forward XLA compiler-option sweep (VERDICT r2 ask 1, lever (b)).

Round 2b attacked single stages with Pallas; this sweeps graph-level XLA
knobs on the FULL flagship inference forward (encode + G, batch 128) via
per-compile `compiler_options` — these ship inside the compile request, so
they reach the remote TPU compiler (env XLA_FLAGS would not). Unknown or
rejected options are recorded and skipped.

Run on the TPU: python benchmarks/xla_flag_sweep.py [--batch 128]
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

from pix2pixhdaudiosr_tpu.config import Config
from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem
from pix2pixhdaudiosr_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

_sum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

SWEEP = [
    ("baseline", {}),
    ("vmem32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("no_dot_strength", {"xla_tpu_enable_dot_strength_reduction": "false"}),
    ("fusion_cost_model",
     {"xla_tpu_enable_experimental_fusion_cost_model": "true"}),
    ("no_multi_level_fusion",
     {"xla_tpu_enable_multi_level_nested_loop_fusion": "false"}),
    ("no_lhs", {"xla_latency_hiding_scheduler_rerun": "0",
                "xla_tpu_enable_latency_hiding_scheduler": "false"}),
    ("rwb_fusion_off", {"xla_tpu_rwb_fusion": "false"}),
    ("licm2", {"xla_tpu_licm_size_inflation_ratio": "2.0"}),
    ("copy_insertion", {"xla_tpu_copy_with_multiple_strided_sources": "false"}),
]


def timed(compiled, args, iters=12):
    o = compiled(*args)
    float(_sum(o))

    def run(m):
        t0 = time.perf_counter()
        o = None
        for _ in range(m):
            o = compiled(*args)
        float(_sum(o))
        return time.perf_counter() - t0

    run(2)
    t3, tN = run(3), run(3 + iters)
    return (tN - t3) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    cfg = Config(net_g="local", ngf=48, n_downsample_global=3,
                 n_blocks_global=3, n_local_enhancers=1, n_blocks_local=2,
                 input_nc=2, output_nc=2, label_nc=0, explicit_encoding=True,
                 mask_mode="mode2", compute_dtype="bfloat16")
    system = Pix2PixHDSystem(cfg)
    rng_np = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: jax.device_put((rng_np.standard_normal(s.shape) * 0.02
                                  ).astype(s.dtype)),
        jax.eval_shape(lambda k: system.init_params(k, batch=2),
                       jax.random.PRNGKey(0)))["G"]
    audio = jax.device_put(rng_np.standard_normal(
        (args.batch, cfg.segment_length)).astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(1)

    def fwd(pg, a, k):
        spec, _, _, _ = system.inference(pg, a, k)
        return spec

    lowered = jax.jit(fwd).lower(params, audio, key)
    results = {}
    for name, opts in SWEEP:
        try:
            t0 = time.time()
            compiled = lowered.compile(compiler_options=opts or None)
            ct = time.time() - t0
            ms = timed(compiled, (params, audio, key)) * 1e3
            results[name] = {"ms": round(ms, 2), "compile_s": round(ct, 1)}
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(name, results[name], flush=True)

    out = os.path.join(os.path.dirname(__file__), "xla_flag_sweep.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
