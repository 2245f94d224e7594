#!/usr/bin/env python
"""Flagship serving latency vs batch size on one chip.

The throughput story (bench.py, BASELINE.md) is anchored at batch 128 — the
best *throughput* batch on v5e. Production serving also cares about the
other end of the curve: what latency does one stream pay, and where does the
chip saturate? This harness sweeps the flagship G3L2@48 (156M params, bf16
serving layout — the same `system.inference` program generate.py serves)
over batch 1..128 and records, per batch:

  ms/batch, frames/s, achieved TF/s, and the real-time factor
  (seconds of 48 kHz audio produced per second of wall clock; one
  segment = segment_length samples = 0.677 s of audio).

Reference axis: the reference serves its 0.677 s segments through
generate_audio.py one torch batch at a time with no published latency
numbers; this table is the TPU-native equivalent of its serving envelope.

Run on the TPU: python benchmarks/serve_latency.py
CPU smoke: python benchmarks/serve_latency.py --tiny
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

from benchmarks.common import fence_sum as _sum
from benchmarks.common import host_params as _host_params
from pix2pixhdaudiosr_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def sweep(system, cfg, batches, res):
    shapes = jax.eval_shape(system.netG.init, jax.random.PRNGKey(0),
                            jnp.zeros(system.spectro_shape(1), jnp.float32))
    n_p = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    res["n_params_g"] = n_p
    print(f"G params: {n_p:,}", flush=True)
    params = _host_params(shapes)
    # serving param layout: pre-cast once to the compute dtype (same as
    # generate.py / bench.py — halves param HBM traffic vs per-call casts)
    params = jax.tree.map(lambda a: a.astype(system.dtype), params)
    audio_s = cfg.segment_length / cfg.hr_sampling_rate

    for b in batches:
        key = f"b{b}"
        try:
            @jax.jit
            def fwd(p, a, k):
                return system.inference(p, a, k)[0]

            audio = jnp.zeros((b, cfg.segment_length), jnp.float32)
            t0 = time.time()
            compiled = fwd.lower(params, audio,
                                 jax.random.PRNGKey(1)).compile()
            cs = time.time() - t0
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca

            def run(m):
                o = None
                t0 = time.perf_counter()
                for _ in range(m):
                    o = compiled(params, audio, jax.random.PRNGKey(1))
                float(_sum(o))
                return time.perf_counter() - t0

            run(3)
            # differenced run lengths cancel dispatch/sync constants
            # (CLAUDE.md timing method); small batches are fast, use more
            # iterations so the delta stays well above relay jitter
            extra = max(6, int(round(600 / max(b, 1))))
            t2, tn = run(3), run(3 + extra)
            ms = (tn - t2) / extra * 1e3
            flops = float(ca.get("flops", 0.0))
            res[key] = {
                "ms_per_batch": round(ms, 2),
                "frames_per_sec": round(b * system.n_frames / (ms / 1e3), 1),
                "samples_per_sec": round(
                    b * cfg.segment_length / (ms / 1e3), 1),
                "achieved_tflops": round(flops / 1e12 / (ms / 1e3), 1),
                "realtime_factor": round(b * audio_s / (ms / 1e3), 1),
                "bytes_gb": round(
                    float(ca.get("bytes accessed", 0.0)) / 1e9, 2),
                "compile_s": round(cs, 1),
            }
        except Exception as e:
            res[key] = {"error": f"{type(e).__name__}: {e}"[:400]}
        print(key, json.dumps(res[key]), flush=True)
        if "error" in res[key]:
            msg = res[key]["error"].lower()
            if "resource_exhausted" in msg or "out of memory" in msg:
                break  # larger batches will also OOM
            # transient relay/compile failure: keep sweeping


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*",
                    default=[1, 2, 4, 8, 16, 32, 64, 128])
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke mode: shrink the config to exercise "
                         "every harness code path without the chip")
    args = ap.parse_args()

    from __graft_entry__ import _flagship_cfg
    from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem

    cfg = _flagship_cfg()
    if args.tiny:
        # live-config update before any backend init (tests/conftest pattern;
        # env vars alone are too late under sitecustomize's axon register)
        jax.config.update("jax_platforms", "cpu")
        cfg = cfg.replace(ngf=8, n_blocks_global=1, n_blocks_local=1,
                          n_downsample_global=2, compute_dtype="float32")
        args.batches = [1, 2]
    system = Pix2PixHDSystem(cfg)
    res = {"segment_audio_seconds": round(
        cfg.segment_length / cfg.hr_sampling_rate, 4)}
    sweep(system, cfg, args.batches, res)

    out = os.path.join(os.path.dirname(__file__),
                       "serve_latency_tiny.json" if args.tiny
                       else "serve_latency.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
