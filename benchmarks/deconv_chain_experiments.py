#!/usr/bin/env python
"""Phase-major chained-deconv experiment (VERDICT r2 ask 1, lever (c)).

The trunk's three ConvTranspose(3x3, s2) layers run at ~102 TF/s effective
under XLA's zero-dilated lowering (4x wasted MXU work; BASELINE.md stage
budget: 6.9 ms at batch 128). The round-2 subpixel decomposition removed
the waste but lost to per-layer depth-to-space interleaves. The untried
cross-stage move measured here: keep the WHOLE deconv stack phase-major —
phases live as channel groups on the deepest (32,8) grid, InstanceNorm and
ReLU run phase-major (mathematically identical: IN reduces over all fine
positions = coarse positions x phases), and one depth-to-space at the end.

Per level, the fine-grid 2x2 subpixel conv decomposes into 4 shifted
matmul terms with OUTPUT-phase-structured kernels:
  out phase a (per dim) uses taps p with (a+p) even at coarse offset
  du=(a+p)/2, so the (du,dv) term's kernel has nonzeros only into
  out-phases with a = p mod 2 reachable at that offset — N-sum over the 4
  terms is exactly 9*co: zero tap waste.

Run on the TPU: python benchmarks/deconv_chain_experiments.py [--batch 128]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pix2pixhdaudiosr_tpu.models.layers import instance_norm
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


# ---------------------------------------------------------------- reference
def deconv_flax(x, w, b):
    """flax nn.ConvTranspose(3x3, s2, SAME) equivalent (layers.py default
    path): conv_transpose VALID then SAME-crop [1:2H+1]."""
    B, H, W, _ = x.shape
    y = jax.lax.conv_transpose(x, w, (2, 2), "VALID",
                               dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y[:, 1:1 + 2 * H, 1:1 + 2 * W, :] + b


def chain_xla(x, params):
    for w, b in params:
        x = jax.nn.relu(instance_norm(deconv_flax(x, w, b)))
    return x


# ------------------------------------------------------------- phase-major
# Phase-major tensor: [B, H, W, P, P, C] with (ph, pw) phase indices; the
# fine grid value at (2^l i + ph interleave...) uses row-major phase order:
# fine index u = i * P + ph  is NOT the subpixel order — depth-to-space
# order is u = i*P + ph with ph the bit-reversed... we keep the standard
# order u = i*P + ph and verify against the XLA chain numerically.


def _phase_shift(t, du, dv):
    """Input gather for the (du, dv) term: fine offset du on the phase-major
    tensor [B,H,W,P,P,C]: phase ph -> ph+du, wrapping into a coarse +1 shift
    with zero fill at the bottom/right edge (the VALID conv over the
    top/left padded fine grid reads one row beyond only via the pad row,
    which contributes zero after the top/left pad trick below)."""
    if du:
        lead = t[:, :, :, 1:]
        wrap = jnp.pad(t[:, 1:, :, :1], ((0, 0), (0, 1), (0, 0),
                                         (0, 0), (0, 0), (0, 0)))
        t = jnp.concatenate([lead, wrap], axis=3)
    if dv:
        lead = t[:, :, :, :, 1:]
        wrap = jnp.pad(t[:, :, 1:, :, :1], ((0, 0), (0, 0), (0, 1),
                                            (0, 0), (0, 0), (0, 0)))
        t = jnp.concatenate([lead, wrap], axis=4)
    return t


def _split_kernel(w):
    """w: [3,3,ci,co] (conv_transpose orientation, no flip: out[u] +=
    w[p] x_fine[i] at u = 2i + 2 - p after the SAME crop, i.e. fine out
    index u-1 = 2i + 1 - p -> out phase a = (1-p) % 2, coarse offset
    du = (1 - p + a) // 2 ... derive: u' = 2i + 1 - p; a = u' % 2;
    I = (u' - a) / 2 = i + (1 - p - a)/2 -> term offset d = (1 - p - a)/2
    in {-1, 0}; we implement input-side gather i = I - d in {I, I+1} so
    d=-1 means input shift +1 (the du=1 gather above)."""
    terms = {}
    for p in range(3):
        for q in range(3):
            a = (1 - p) % 2
            bph = (1 - q) % 2
            du = -((1 - p - a) // 2)
            dv = -((1 - q - bph) // 2)
            terms.setdefault((du, dv), []).append((a, bph, p, q))
    return terms


def make_phase_chain(params):
    """Builds fn(x) running the whole deconv+IN+relu stack phase-major.
    x: [B, H, W, C] (coarse). Returns interleaved [B, 2^L H, 2^L W, C_L]."""

    def fn(x):
        B, H, W, _ = x.shape
        t = x[:, :, :, None, None, :]                      # P=1 phase-major
        for w, b in params:
            ci, co = w.shape[2], w.shape[3]
            P = t.shape[3]
            terms = _split_kernel(np.zeros((3, 3, 1, 1)))  # structure only
            outs = {}
            for (du, dv), taps in terms.items():
                g = _phase_shift(t, du, dv)                # [B,H,W,P,P,ci]
                gm = g.reshape(B, H, W, P * P, ci)
                # one matmul per (a,bph) out-phase in this term
                for a, bph, p, q in taps:
                    y = jnp.einsum("bhwpc,cd->bhwpd", gm, w[p, q])
                    outs[(a, bph)] = (outs.get((a, bph), 0.0) + y)
            # assemble new phase axes: new fine phase = old phase * 2 + a
            rows = []
            for a in (0, 1):
                cols = [outs[(a, bph)].reshape(B, H, W, P, 1, P, 1, co)
                        for bph in (0, 1)]
                rows.append(jnp.concatenate(cols, axis=6))
            t = jnp.concatenate(rows, axis=4)              # [B,H,W,P,2,P,2,co]
            P2 = P * 2
            t = t.reshape(B, H, W, P2, P2, co) + b
            # IN over fine positions == over (H, W, P, P)
            tf = t.astype(jnp.float32)
            m = jnp.mean(tf, axis=(1, 2, 3, 4), keepdims=True)
            v = jnp.mean(jnp.square(tf), axis=(1, 2, 3, 4),
                         keepdims=True) - jnp.square(m)
            t = ((tf - m) * jax.lax.rsqrt(v + 1e-5)).astype(t.dtype)
            t = jax.nn.relu(t)
        # depth-to-space once
        P = t.shape[3]
        co = t.shape[-1]
        t = t.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * P, W * P, co)
        return t

    return fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    B = args.batch
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    # flagship trunk deconv stack: 768->384 @(32,8), ->192, ->96
    chans = [(768, 384), (384, 192), (192, 96)]
    x = jnp.asarray(rng.standard_normal((B, 32, 8, 768)).astype(np.float32)
                    ).astype(dt)
    params = []
    for ci, co in chans:
        w = jnp.asarray((rng.standard_normal((3, 3, ci, co)) * .05
                         ).astype(np.float32)).astype(dt)
        b = jnp.zeros((co,), dt)
        params.append((w, b))

    res = {}

    # correctness first (small batch, f32 for a clean oracle)
    xs = x[:2].astype(jnp.float32)
    ps = [(w.astype(jnp.float32), b.astype(jnp.float32)) for w, b in params]
    want = np.asarray(jax.jit(lambda x: chain_xla(x, ps))(xs))
    got = np.asarray(jax.jit(make_phase_chain(ps))(xs))
    err = float(np.max(np.abs(want - got)))
    res["max_err_f32"] = err
    print("max_err_f32", err, flush=True)

    t_xla = timeit(lambda x: chain_xla(x, params), (x,))
    res["xla_chain_ms"] = round(t_xla * 1e3, 3)
    print("xla_chain_ms", res["xla_chain_ms"], flush=True)

    t_pm = timeit(make_phase_chain(params), (x,))
    res["phase_chain_ms"] = round(t_pm * 1e3, 3)
    print("phase_chain_ms", res["phase_chain_ms"], flush=True)

    out = os.path.join(os.path.dirname(__file__), "deconv_chain_results.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
