#!/usr/bin/env python
"""Round-2 conv formulation experiments: lane-packing the tiny-channel
full-res enhancer convs (VERDICT.md item 2).

The MXU is a 128-lane systolic array; a conv with 2 input or output channels
uses 2 lanes. Two reformulations move spatial positions into the lane dim:

  toeplitz_t(S): kernel spans a whole time tile of S outputs (+k-1 halo), so
    the matmul's N dim = S*co lanes. Per-output MACs inflate by (S+k-1)/k but
    the matmul runs at MXU speed instead of 3-5 TF/s.
  subpixel convT: ConvTranspose(3,s2) as 4 phase convs (2x2/2x1/1x2/1x1 taps)
    + interleave, avoiding XLA's zero-dilated lowering (4x FLOP waste).

Run: python benchmarks/conv_experiments2.py
"""

from __future__ import annotations

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
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def make_toeplitz_t(w: jnp.ndarray, S: int) -> jnp.ndarray:
    """[k,k,ci,co] -> [k, S+k-1, ci, S*co] with
    W2[dh, t_in, i, t_out*co+o] = w[dh, t_in-t_out, i, o] (0 outside band)."""
    k, _, ci, co = w.shape
    t_in = np.arange(S + k - 1)[:, None]
    t_out = np.arange(S)[None, :]
    d = t_in - t_out                              # [S+k-1, S]
    idx = np.where((d >= 0) & (d < k), d, k)      # k -> zero row
    wp = jnp.pad(w, ((0, 0), (0, 1), (0, 0), (0, 0)))
    g = wp[:, idx]                                # [k, S+k-1, S, ci, co]
    g = jnp.moveaxis(g, 3, 2)                     # [k, S+k-1, ci, S, co]
    return g.reshape(k, S + k - 1, ci, S * co)


def conv_toeplitz_t(x, w, S):
    """VALID conv of padded x [B,Hp,Wp,ci] with w [k,k,ci,co] via a kernel
    spanning an S-wide time tile. Output width (Wp-k+1) must divide by S."""
    k, _, ci, co = w.shape
    B, Hp, Wp, _ = x.shape
    H, W = Hp - k + 1, Wp - k + 1
    assert W % S == 0, (W, S)
    w2 = make_toeplitz_t(w, S).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w2, (1, S), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)       # [B, H, W/S, S*co]
    return y.reshape(B, H, W // S, S, co).reshape(B, H, W, co).astype(x.dtype)


def conv_toeplitz_t_matmul(x, w, S):
    """Same tiling, but hand-lowered to an explicit einsum over tile slices
    (checks whether XLA's conv lowering or a raw matmul is faster)."""
    k, _, ci, co = w.shape
    B, Hp, Wp, _ = x.shape
    H, W = Hp - k + 1, Wp - k + 1
    nt = W // S
    w2 = make_toeplitz_t(w, S).astype(x.dtype)    # [k, S+k-1, ci, S*co]
    w2 = w2.reshape(k * (S + k - 1) * ci, S * co)
    # tiles: [B, H+k-1?, ...] gather k freq shifts x nt tile slices
    tiles = jnp.stack([x[:, :, j * S : j * S + S + k - 1, :]
                       for j in range(nt)], axis=1)  # [B, nt, Hp, S+k-1, ci]
    cols = jnp.concatenate([tiles[:, :, dh : dh + H] for dh in range(k)],
                           axis=-1)               # [B, nt, H, S+k-1, ci*k]
    # reorder to (dh, t_in, ci): cols last dim is (dh major? no: concat over dh
    # placed dh as the most-minor blocks of axis -1 with (t_in, ci) inside)
    cols = cols.reshape(B, nt, H, (S + k - 1), k, ci)
    cols = jnp.moveaxis(cols, 4, 3).reshape(B, nt, H, k * (S + k - 1) * ci)
    y = jnp.einsum("bjhk,kn->bjhn", cols, w2,
                   preferred_element_type=jnp.float32)
    y = y.reshape(B, nt, H, S, co)
    return jnp.moveaxis(y, 1, 2).reshape(B, H, W, co).astype(x.dtype)


def convT_xla(x, w):
    return jax.lax.conv_transpose(
        x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def convT_subpixel(x, w):
    """ConvTranspose(3x3, stride 2, SAME) == 4 phase convs + interleave.

    lax.conv_transpose(strides=2, SAME, no kernel flip) maps
      out[u, v] += w[p, q] * x[i, j]  at  u = 2i + 2 - p, v = 2j + 2 - q
    (probed empirically; see benchmarks notes). For output phase a = u % 2 the
    contributing taps have p % 2 == a and read x at index i = i' + (a+p)/2 - 1,
    which is (a+p)//2 into an x padded by 1 on the top/left only.
    """
    B, H, W, ci = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
    outs = {}
    for a in (0, 1):
        ps = [p for p in range(3) if (a + p) % 2 == 0]
        for b in (0, 1):
            qs = [q for q in range(3) if (b + q) % 2 == 0]
            acc = None
            for p in ps:
                for q in qs:
                    oi = (a + p) // 2
                    oj = (b + q) // 2
                    sl = xp[:, oi : oi + H, oj : oj + W, :]
                    t = jnp.einsum("bhwi,io->bhwo", sl, w[p, q],
                                   preferred_element_type=jnp.float32)
                    acc = t if acc is None else acc + t
            outs[(a, b)] = acc
    y = jnp.stack([outs[(0, 0)], outs[(0, 1)], outs[(1, 0)], outs[(1, 1)]],
                  axis=-2)                          # [B,H,W,4,co]
    y = y.reshape(B, H, W, 2, 2, co)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, co)
    return y.astype(x.dtype)


def convT_subpixel_fused(x, w):
    """Sub-pixel convT as ONE conv: kernel [2,2,ci,4*co] built from the phase
    taps, then depth-to-space. (Single big matmul instead of 9 einsums.)"""
    B, H, W, ci = x.shape
    co = w.shape[-1]
    # big kernel over a 2x2 input window [di, dj, ci, (a,b,o)]
    wk = jnp.zeros((2, 2, ci, 2, 2, co), w.dtype)
    for a in (0, 1):
        ps = [p for p in range(3) if (a + p) % 2 == 0]
        for b in (0, 1):
            qs = [q for q in range(3) if (b + q) % 2 == 0]
            for p in ps:
                for q in qs:
                    di = (a + p) // 2  # in [0,2)
                    dj = (b + q) // 2
                    wk = wk.at[di, dj, :, a, b, :].add(w[p, q])
    wk = wk.reshape(2, 2, ci, 4 * co).astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, wk, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)         # [B,H,W,4co]
    y = y.reshape(B, H, W, 2, 2, co)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, co)
    return y.astype(x.dtype)


def main():
    rng = np.random.default_rng(0)
    results = {}

    cases = [
        ("48->2 7x7 @512x128", (64, 518, 134, 48), (7, 7, 48, 2), (8, 16, 32, 64)),
        ("2->48 7x7 @512x128", (64, 518, 134, 2), (7, 7, 2, 48), (2, 4, 8)),
        ("2->96 7x7 @256x64", (64, 262, 70, 2), (7, 7, 2, 96), (2, 4)),
    ]
    for label, xs, ws, tiles in cases:
        x = jnp.asarray(rng.standard_normal(xs).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray((rng.standard_normal(ws) * 0.02).astype(np.float32)).astype(jnp.bfloat16)
        ref = np.asarray(jax.jit(conv_xla)(x, w), np.float32)
        t = timeit(conv_xla, (x, w))
        print(f"{label} [xla]: {t*1000:.2f} ms", flush=True)
        results[f"{label} xla"] = t
        for S in tiles:
            for name, fn in (("toep_conv", conv_toeplitz_t),
                             ("toep_mm", conv_toeplitz_t_matmul)):
                try:
                    out = jax.jit(lambda a, b: fn(a, b, S))(x, w)
                    err = np.max(np.abs(np.asarray(out, np.float32) - ref))
                    assert err < 0.2, err
                    t = timeit(lambda a, b: fn(a, b, S), (x, w))
                    print(f"{label} [{name} S={S}]: {t*1000:.2f} ms", flush=True)
                    results[f"{label} {name} S={S}"] = t
                except Exception as e:
                    print(f"{label} [{name} S={S}]: FAILED {str(e)[:120]}",
                          flush=True)

    # ConvTranspose cases: enhancer up (96->48 @256x64->512x128) and the two
    # largest trunk deconvs
    tcases = [
        ("convT 96->48 @256x64", (64, 256, 64, 96), (3, 3, 96, 48)),
        ("convT 192->96 @128x32", (64, 128, 32, 192), (3, 3, 192, 96)),
    ]
    for label, xs, ws in tcases:
        x = jnp.asarray(rng.standard_normal(xs).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray((rng.standard_normal(ws) * 0.02).astype(np.float32)).astype(jnp.bfloat16)
        ref = np.asarray(jax.jit(convT_xla)(x, w), np.float32)
        t = timeit(convT_xla, (x, w))
        print(f"{label} [xla]: {t*1000:.2f} ms", flush=True)
        results[f"{label} xla"] = t
        for name, fn in (("subpixel", convT_subpixel),
                         ("subpixel_fused", convT_subpixel_fused)):
            try:
                out = jax.jit(fn)(x, w)
                err = np.max(np.abs(np.asarray(out, np.float32) - ref))
                assert err < 0.2, err
                t = timeit(fn, (x, w))
                print(f"{label} [{name}]: {t*1000:.2f} ms", flush=True)
                results[f"{label} {name}"] = t
            except Exception as e:
                print(f"{label} [{name}]: FAILED {str(e)[:120]}", flush=True)

    import json
    print(json.dumps({k: round(v * 1000, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
