#!/usr/bin/env python
"""Round-3 cross-stage experiments on the enhancer head (VERDICT r2 ask 1).

Stage budget at batch 128 (BASELINE.md): `enh down0` (2->48 7x7 full-res
ConvIN) 6.8 ms "BW-bound", `enh down1` ~0 attributed, vs an im2col-optimal
estimate of ~1.4 ms for down0's 77 GFLOP at K=98/N=48 MXU occupancy. This
harness measures where those ms actually go and whether reformulations
help, using prefix-differenced timings (isolated microbenchmarks mislead —
BASELINE.md round-2b):

  p0: encode-shaped input -> down0 (model formulation)
  p1: p0 -> IN+relu -> down1 (48->96 3x3 s2)         [the real consumer]
  variants of down0 inside p1:
    - model default (implicit-reflect conv)
    - materialized reflect pad + plain conv
    - materialized reflect pad + Toeplitz time-tile conv (S=8/16)
    - bigger-N trick: fold the 7 freq taps into input channels (ci 2->14)
      so the matmul K is 14*7=98 with better memory behavior

Run on the TPU: python benchmarks/enh_head_experiments.py [--batch 128]
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

from pix2pixhdaudiosr_tpu.models.layers import (conv_reflect_same,
                                                conv_toeplitz_t,
                                                instance_norm, reflect_pad)
from pix2pixhdaudiosr_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

_sum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def timeit(fn, args, iters=12):
    compiled = jax.jit(fn).lower(*args).compile()
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


def conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def down1(h, w1, b1):
    h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h = conv(h, w1, stride=2) + b1
    return jax.nn.relu(instance_norm(h))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    B = args.batch
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    x = jnp.asarray(rng.standard_normal((B, 512, 128, 2)).astype(np.float32)
                    ).astype(dt)
    w0 = jnp.asarray((rng.standard_normal((7, 7, 2, 48)) * .05
                      ).astype(np.float32)).astype(dt)
    b0 = jnp.zeros((48,), dt)
    w1 = jnp.asarray((rng.standard_normal((3, 3, 48, 96)) * .05
                      ).astype(np.float32)).astype(dt)
    b1 = jnp.zeros((96,), dt)

    res = {}

    # --- down0 variants (alone, then with the real consumer chained)
    def d0_model(x, w0, b0):
        return jax.nn.relu(instance_norm(conv_reflect_same(x, w0, b0)))

    def d0_padded(x, w0, b0):
        return jax.nn.relu(instance_norm(conv(reflect_pad(x, 3), w0) + b0))

    def d0_toep(x, w0, b0, S):
        return jax.nn.relu(instance_norm(
            conv_toeplitz_t(reflect_pad(x, 3), w0, b0, S=S)))

    def d0_freqfold(x, w0, b0):
        # fold the 7 freq taps into channels: xf[h,w,dh*ci] = xp[h+dh,w,ci]
        # then a 1x7 conv with ci=14 — identical math, K=98 but the conv is
        # 1-D so XLA's im2col window is 7x smaller
        xp = reflect_pad(x, 3)
        Hp = xp.shape[1]
        xf = jnp.concatenate([xp[:, i:Hp - 6 + i] for i in range(7)], -1)
        wf = w0.transpose(0, 2, 1, 3).reshape(1, 14, 7, 48).transpose(0, 2, 1, 3)
        # wf[0, dw, dh*ci, co]
        return jax.nn.relu(instance_norm(conv(xf, wf) + b0))

    variants = {
        "model_implicit": d0_model,
        "padded": d0_padded,
        "toeplitz8": lambda x, w0, b0: d0_toep(x, w0, b0, 8),
        "toeplitz16": lambda x, w0, b0: d0_toep(x, w0, b0, 16),
        "freqfold": d0_freqfold,
    }

    for name, fn in variants.items():
        try:
            # correctness vs padded oracle (f32 on host shapes is overkill;
            # bf16 tolerance)
            a = np.asarray(jax.jit(fn)(x[:2], w0, b0), np.float32)
            b = np.asarray(jax.jit(d0_padded)(x[:2], w0, b0), np.float32)
            err = float(np.max(np.abs(a - b)))
            t_alone = timeit(fn, (x, w0, b0))
            t_pair = timeit(lambda x, w0, b0, w1, b1: down1(fn(x, w0, b0),
                                                           w1, b1),
                            (x, w0, b0, w1, b1))
            res[name] = {"down0_ms": round(t_alone * 1e3, 3),
                         "pair_ms": round(t_pair * 1e3, 3),
                         "max_err_vs_padded": err}
        except Exception as e:
            res[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(name, res[name], flush=True)

    out = os.path.join(os.path.dirname(__file__), "enh_head_results.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
