#!/usr/bin/env python
"""Round-2b: 2D Toeplitz tiles for 48->2 and sub-pixel for all trunk deconvs."""
import os, sys, time, json
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from conv_experiments2 import (timeit, conv_xla, conv_toeplitz_t, convT_xla,
                               convT_subpixel, convT_subpixel_fused)

def make_toeplitz_2d(w, Sf, St):
    """[k,k,ci,co] -> [Sf+k-1, St+k-1, ci, Sf*St*co]."""
    k = w.shape[0]; ci, co = w.shape[2], w.shape[3]
    fi = np.arange(Sf + k - 1)[:, None]; fo = np.arange(Sf)[None, :]
    df = fi - fo
    fidx = np.where((df >= 0) & (df < k), df, k)
    ti = np.arange(St + k - 1)[:, None]; to = np.arange(St)[None, :]
    dt = ti - to
    tidx = np.where((dt >= 0) & (dt < k), dt, k)
    wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    g = wp[fidx][:, :, tidx]            # axes (fi, fo, ti, to, ci, co)
    g = g.transpose(0, 2, 4, 1, 3, 5)   # -> (fi, ti, ci, fo, to, co)
    return g.reshape(Sf + k - 1, St + k - 1, ci, Sf * St * co)

def conv_toeplitz_2d(x, w, Sf, St):
    k = w.shape[0]; ci, co = w.shape[2], w.shape[3]
    B, Hp, Wp, _ = x.shape
    H, W = Hp - k + 1, Wp - k + 1
    assert H % Sf == 0 and W % St == 0
    w2 = make_toeplitz_2d(w, Sf, St).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w2, (Sf, St), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)      # [B, H/Sf, W/St, Sf*St*co]
    y = y.reshape(B, H // Sf, W // St, Sf, St, co)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, co)
    return y.astype(x.dtype)

def main():
    rng = np.random.default_rng(0)
    results = {}
    # 48->2 full-res: 2D tiles
    x = jnp.asarray(rng.standard_normal((64, 518, 134, 48)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray((rng.standard_normal((7, 7, 48, 2)) * 0.02).astype(np.float32)).astype(jnp.bfloat16)
    ref = np.asarray(jax.jit(conv_xla)(x, w), np.float32)
    for Sf, St in ((8, 8), (4, 16), (16, 8), (8, 16), (16, 16), (32, 4), (4, 32)):
        try:
            out = jax.jit(lambda a, b: conv_toeplitz_2d(a, b, Sf, St))(x, w)
            err = np.max(np.abs(np.asarray(out, np.float32) - ref))
            assert err < 0.2, err
            t = timeit(lambda a, b: conv_toeplitz_2d(a, b, Sf, St), (x, w))
            print(f"48->2 [toep2d {Sf}x{St}]: {t*1000:.2f} ms", flush=True)
            results[f"48->2 toep2d {Sf}x{St}"] = t
        except Exception as e:
            print(f"48->2 [toep2d {Sf}x{St}]: FAILED {str(e)[:100]}", flush=True)
    # re-time the round-2a winners for noise
    t = timeit(conv_xla, (x, w)); print(f"48->2 [xla re]: {t*1000:.2f} ms", flush=True)
    results["48->2 xla re"] = t
    t = timeit(lambda a, b: conv_toeplitz_t(a, b, 16), (x, w))
    print(f"48->2 [toep_t S=16 re]: {t*1000:.2f} ms", flush=True)
    results["48->2 toep_t16 re"] = t
    # all trunk deconv shapes + enhancer, subpixel vs xla
    tcases = [
        ("convT 1536->768 @16x4", (64, 16, 4, 1536), (3, 3, 1536, 768)),
        ("convT 768->384 @32x8", (64, 32, 8, 768), (3, 3, 768, 384)),
        ("convT 384->192 @64x16", (64, 64, 16, 384), (3, 3, 384, 192)),
        ("convT 192->96 @128x32", (64, 128, 32, 192), (3, 3, 192, 96)),
        ("convT 96->48 @256x64", (64, 256, 64, 96), (3, 3, 96, 48)),
    ]
    for label, xs, ws in tcases:
        x = jnp.asarray(rng.standard_normal(xs).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray((rng.standard_normal(ws) * 0.02).astype(np.float32)).astype(jnp.bfloat16)
        ref = np.asarray(jax.jit(convT_xla)(x, w), np.float32)
        for name, fn in (("xla", convT_xla), ("subpixel", convT_subpixel),
                         ("subpixel_fused", convT_subpixel_fused)):
            try:
                out = jax.jit(fn)(x, w)
                err = np.max(np.abs(np.asarray(out, np.float32) - ref))
                assert err < 0.3, err
                t = timeit(fn, (x, w))
                print(f"{label} [{name}]: {t*1000:.2f} ms", flush=True)
                results[f"{label} {name}"] = t
            except Exception as e:
                print(f"{label} [{name}]: FAILED {str(e)[:100]}", flush=True)
    print(json.dumps({k: round(v * 1000, 3) for k, v in results.items()}))

if __name__ == "__main__":
    main()
