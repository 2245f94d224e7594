#!/usr/bin/env python
"""InstanceNorm formulation experiments at the enhancer's full-res shapes."""
import os, sys, time, json
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np

_sum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

def timeit(fn, args, iters=10):
    c = jax.jit(fn).lower(*args).compile()
    o = c(*args)
    float(_sum(o if not isinstance(o, tuple) else o[0]))
    def run(m):
        t0 = time.perf_counter()
        o = None
        for _ in range(m):
            o = c(*args)
        float(_sum(o if not isinstance(o, tuple) else o[0]))
        return time.perf_counter() - t0
    run(2)
    t3, tN = run(3), run(3 + iters)
    return (tN - t3) / iters

def in_current(x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    c = x32 - mean
    var = jnp.mean(c * c, axis=(1, 2), keepdims=True)
    return jnp.maximum((c * jax.lax.rsqrt(var + eps)).astype(x.dtype), 0)

def in_lite(x, eps=1e-5):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    ex2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(1, 2),
                   keepdims=True, dtype=jnp.float32)
    var = jnp.maximum(ex2 - mean * mean, 0.0)
    scale = jax.lax.rsqrt(var + eps)
    y = (x.astype(jnp.float32) - mean) * scale
    return jnp.maximum(y.astype(x.dtype), 0)

def in_pallas(x):
    from pix2pixhdaudiosr_tpu.ops.norm_pallas import fused_instance_norm
    return fused_instance_norm(x, act="relu")

def main():
    rng = np.random.default_rng(0)
    results = {}
    for shape in ((64, 512, 128, 48), (64, 256, 64, 96)):
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(jnp.bfloat16)
        ref = np.asarray(jax.jit(in_current)(x), np.float32)
        for name, fn in (("current", in_current), ("lite", in_lite),
                         ("pallas", in_pallas)):
            try:
                out = jax.jit(fn)(x)
                err = np.max(np.abs(np.asarray(out, np.float32) - ref))
                assert err < 0.05, err
                t = timeit(fn, (x,))
                print(f"IN fwd {shape} [{name}]: {t*1000:.2f} ms", flush=True)
                results[f"fwd {shape} {name}"] = t
            except Exception as e:
                print(f"IN fwd {shape} [{name}]: FAILED {str(e)[:90]}", flush=True)
        # fwd+bwd (pallas skipped: no vjp yet)
        for name, fn in (("current", in_current), ("lite", in_lite)):
            g = lambda x, f=fn: jnp.sum(jnp.square(f(x).astype(jnp.float32)))
            vg = jax.grad(g)
            t = timeit(vg, (x,))
            print(f"IN grad {shape} [{name}]: {t*1000:.2f} ms", flush=True)
            results[f"grad {shape} {name}"] = t
    print(json.dumps({k: round(v*1000, 3) for k, v in results.items()}))

if __name__ == "__main__":
    main()
