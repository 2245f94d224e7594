#!/usr/bin/env python
"""Does rematerializing the G forward speed up the memory-bound train step?

The flagship train step is HBM-bound (BASELINE.md: 129 GB accessed/step at
~95% of v5e peak). jax.checkpoint on the generator forward drops the
stashed conv/IN activations from the vjp (re-computing them in the
backward) — for a bandwidth-bound program this wins only if the stash
traffic saved exceeds the recompute's own traffic, which for conv stacks
is usually a loss; this measures it rather than guessing.

Variants: baseline vjp | jax.checkpoint(G fwd) | checkpoint with
dots_saveable policy (keep MXU outputs, recompute elementwise/IN).

Run on the TPU: python benchmarks/remat_experiment.py [--batch 64]
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


def timed(compiled, args, iters=8):
    o = compiled(*args)
    float(_sum(o[0]))

    def run(m):
        t0 = time.perf_counter()
        o = None
        for _ in range(m):
            o = compiled(*args)
        float(_sum(o[0]))
        return time.perf_counter() - t0

    run(2)
    t2, tN = run(2), run(2 + iters)
    return (tN - t2) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    cfg = Config(net_g="local", ngf=48, n_downsample_global=3,
                 n_blocks_global=3, n_local_enhancers=1, n_blocks_local=2,
                 input_nc=2, output_nc=2, label_nc=0, explicit_encoding=True,
                 mask_mode="mode2", use_match_loss=True,
                 compute_dtype="bfloat16")
    system = Pix2PixHDSystem(cfg)
    rng_np = np.random.default_rng(0)
    shapes = jax.eval_shape(lambda k: system.init_params(k, batch=2),
                            jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda s: jax.device_put((rng_np.standard_normal(s.shape) * 0.02
                                  ).astype(s.dtype)), shapes)
    lr = jnp.asarray(rng_np.standard_normal(
        (args.batch, cfg.segment_length)).astype(np.float32) * 0.1)
    hr = jnp.asarray(rng_np.standard_normal(
        (args.batch, cfg.segment_length)).astype(np.float32) * 0.1)
    batch = {"label": lr, "image": hr}
    key = jax.random.PRNGKey(1)

    def make_step(remat):
        def step(params, batch, rng):
            losses, gg, gd, _ = system.losses_and_grads(
                params, batch, rng, remat_g=remat)
            # grad consumption stand-in (keeps all grads live like Adam)
            gsum = sum(jnp.sum(jnp.square(x))
                       for x in jax.tree.leaves((gg, gd)))
            return losses["G_GAN"] + 0.0 * gsum, losses["D_real"]
        return step

    res = {}
    for name, remat in [("baseline", None), ("full", "full"),
                        ("dots_saveable", "dots")]:
        try:
            t0 = time.time()
            compiled = jax.jit(make_step(remat)).lower(
                params, batch, key).compile()
            ct = time.time() - t0
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            ms = timed(compiled, (params, batch, key)) * 1e3
            res[name] = {"ms": round(ms, 2), "compile_s": round(ct, 1),
                         "gflops": round(float(ca.get("flops", 0)) / 1e9, 1),
                         "gbytes": round(
                             float(ca.get("bytes accessed", 0)) / 1e9, 1)}
        except Exception as e:
            res[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(name, res[name], flush=True)

    out = os.path.join(os.path.dirname(__file__), "remat_experiment.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
