#!/usr/bin/env python
"""Per-stage profile of the flagship LocalEnhancer G3L2@48 forward (batch 64)
by cumulative-prefix timing: stage cost = time(prefix k) - time(prefix k-1).
Micro-benchmarks of isolated convs mis-sample XLA's in-graph algorithm
choices and the relay adds +-40% noise to sub-ms kernels; cumulative
aggregates are stable.

Run: python benchmarks/g_profile.py [--impl toeplitz]
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

from pix2pixhdaudiosr_tpu.models.layers import (ConvIN, ConvTransposeIN,
                                                ResnetBlock, avg_pool_3s2)
from pix2pixhdaudiosr_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

_sum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def timeit(compiled, args, iters=12):
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


def build_stages(dtype, final_impl=None, up_impl=None):
    """The flagship LocalEnhancer G3L2 @ ngf48 layer sequence as named stage
    groups (models/generator.py)."""
    ngf, ngf_g = 48, 96
    stages = []
    stages.append(("pyramid+head", [
        ("pool", None),
        ("conv", ConvIN(ngf_g, 7, reflect=3, dtype=dtype)),
    ]))
    downs = [ConvIN(ngf_g * 2 ** (i + 1), 3, stride=2, pad=1, dtype=dtype)
             for i in range(4)]
    stages.append(("trunk downs", [("conv", m) for m in downs]))
    stages.append(("trunk resblocks x3", [
        ("conv", ResnetBlock(ngf_g * 16, dtype=dtype)) for _ in range(3)]))
    ups = [ConvTransposeIN(ngf_g * 2 ** (3 - i) // 1, dtype=dtype)
           for i in range(4)]
    # channels: 1536->768, ->384, ->192, ->96
    ups = [ConvTransposeIN(768, dtype=dtype), ConvTransposeIN(384, dtype=dtype),
           ConvTransposeIN(192, dtype=dtype), ConvTransposeIN(96, dtype=dtype)]
    stages.append(("trunk deconvs", [("conv", m) for m in ups]))
    stages.append(("enh down0 2->48", [
        ("enh_input", None),
        ("conv", ConvIN(ngf, 7, reflect=3, dtype=dtype))]))
    stages.append(("enh down1 48->96", [
        ("conv", ConvIN(ngf * 2, 3, stride=2, pad=1, dtype=dtype))]))
    stages.append(("enh add+resblocks x2", [
        ("add_trunk", None),
        ("conv", ResnetBlock(ngf * 2, dtype=dtype)),
        ("conv", ResnetBlock(ngf * 2, dtype=dtype))]))
    stages.append(("enh up 96->48", [
        ("conv", ConvTransposeIN(ngf, dtype=dtype, impl=up_impl))]))
    stages.append(("enh final 48->2", [
        ("conv", ConvIN(2, 7, reflect=3, norm=False, act="tanh", dtype=dtype,
                        impl=final_impl))]))
    return stages


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default=None, choices=[None, "toeplitz"])
    ap.add_argument("--up_impl", default=None, choices=[None, "subpixel"])
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    dtype = jnp.bfloat16
    stages = build_stages(dtype, final_impl=args.impl, up_impl=args.up_impl)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((args.batch, 512, 128, 2))
                     .astype(np.float32))
    key = jax.random.PRNGKey(0)

    # init all params once, by running the full stack
    def full(x, params_list, upto):
        """Apply stage groups 0..upto-1. `enh_input` switches the stream to
        the full-res input; `add_trunk` adds the saved trunk output."""
        full_res = x
        h = None
        saved_trunk = None
        idx = 0
        for si, (name, layers) in enumerate(stages):
            if si >= upto:
                break
            for kind, m in layers:
                if kind == "pool":
                    h = avg_pool_3s2(x)
                elif kind == "enh_input":
                    saved_trunk = h
                    h = full_res
                elif kind == "add_trunk":
                    h = h + saved_trunk
                else:
                    h = m.apply(params_list[idx], h)
                    idx += 1
        return h

    # init params by tracing the full stack
    params_list = []
    h = x0
    full_res = x0
    saved = None
    for name, layers in stages:
        for kind, m in layers:
            if kind == "pool":
                h = avg_pool_3s2(h)
            elif kind == "enh_input":
                saved = h
                h = full_res
            elif kind == "add_trunk":
                h = h + saved
            else:
                p = m.init(key, h)
                params_list.append(jax.device_get(p))
                h = m.apply(p, h)
    params_list = [jax.device_put(p) for p in params_list]
    print("init done; output", h.shape, flush=True)

    results = {}
    prev = 0.0
    for upto in range(1, len(stages) + 1):
        fn = jax.jit(lambda x, pl, u=upto: full(x, pl, u))
        c = fn.lower(x0, params_list).compile()
        t = timeit(c, (x0, params_list))
        name = stages[upto - 1][0]
        results[name] = (t - prev) * 1000
        print(f"prefix {upto:2d} ({name:24s}): {t*1000:7.2f} ms  "
              f"(stage {results[name]:+6.2f} ms)", flush=True)
        prev = t
    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
