#!/usr/bin/env python
"""Conv formulation experiments for the full-resolution enhancer layers.

Measured on v5e (benchmarks/results.json, BASELINE.md): the 156M-param coarse
trunk hits 128 TFLOP/s but the full-res convs with tiny channel counts crawl
(c7s1 2->48: 5.5 TF/s; c7s1 48->2: 3.4 TF/s) because a 2-channel operand
occupies 2 of the MXU's 128 lanes. This script compares:
  A. XLA lax.conv (the default lowering)
  B. explicit shifted-slice im2col + one MXU matmul
  C. tap-batched matmul: x @ W[48, taps*2] then shifted accumulation
     (moves the tiny dimension out of the MXU lanes)
Run: python benchmarks/conv_experiments.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

_sum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def timeit(fn, args, iters=10):
    c = jax.jit(fn).lower(*args).compile()
    o = c(*args)
    float(_sum(o))

    def run(m):
        t0 = time.perf_counter()
        for _ in range(m):
            o = c(*args)
        float(_sum(o))
        return time.perf_counter() - t0

    run(2)
    t3, tN = run(3), run(3 + iters)
    return (tN - t3) / iters


def conv_xla(x, w):
    # NHWC x HWIO, already padded input
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_im2col(x, w):
    """B: 49 shifted slices -> [.., ci*49] -> matmul."""
    k = w.shape[0]
    H = x.shape[1] - k + 1
    W = x.shape[2] - k + 1
    cols = [x[:, dh : dh + H, dw : dw + W, :] for dh in range(k)
            for dw in range(k)]
    patches = jnp.concatenate(cols, axis=-1)
    w2 = w.reshape(-1, w.shape[-1])  # [k*k*ci] grouping must match cols order
    # cols order: (dh, dw) major, ci minor -> transpose w to [kh, kw, ci, co]
    return jnp.einsum("bhwk,kc->bhwc", patches, w2,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def conv_tapbatch(x, w):
    """C: z = x @ W[ci, k*k*co]; y[h, w] = sum_taps z[h+dh, w+dw, tap, :]."""
    k = w.shape[0]
    ci, co = w.shape[2], w.shape[3]
    H = x.shape[1] - k + 1
    W = x.shape[2] - k + 1
    w2 = jnp.transpose(w, (2, 0, 1, 3)).reshape(ci, k * k * co)
    z = jnp.einsum("bhwi,ij->bhwj", x, w2,
                   preferred_element_type=jnp.float32)  # [b, H+k-1, W+k-1, k*k*co]
    z = z.reshape(z.shape[:3] + (k * k, co))
    acc = None
    idx = 0
    for dh in range(k):
        for dw in range(k):
            part = z[:, dh : dh + H, dw : dw + W, idx, :]
            acc = part if acc is None else acc + part
            idx += 1
    return acc.astype(x.dtype)


def main():
    rng = np.random.default_rng(0)
    cases = [
        ("c7s1 2->48 @518x134", (64, 518, 134, 2), (7, 7, 2, 48)),
        ("c7s1 48->2 @518x134", (64, 518, 134, 48), (7, 7, 48, 2)),
    ]
    for label, xs, ws in cases:
        x = jnp.asarray(rng.standard_normal(xs).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal(ws).astype(np.float32) * 0.02).astype(jnp.bfloat16)
        ref = None
        for name, fn in (("xla", conv_xla), ("im2col", conv_im2col),
                         ("tapbatch", conv_tapbatch)):
            try:
                out = jax.jit(fn)(x, w)
                if ref is None:
                    ref = np.asarray(out, np.float32)
                else:
                    err = np.max(np.abs(np.asarray(out, np.float32) - ref))
                    assert err < 0.5, (name, err)
                per = timeit(fn, (x, w))
                print(f"{label} [{name}]: {per * 1000:.2f} ms", flush=True)
            except Exception as e:
                print(f"{label} [{name}]: FAILED {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
