#!/usr/bin/env python
"""Whole-forward AUTO entry-layout experiment (VERDICT r2 ask 1, lever (b)).

The flag sweep (xla_flag_sweep.py) varied graph-level options but kept the
default major-to-minor entry layouts. This lets XLA *choose* the entry
layouts for every param and the activation input of the full flagship
forward (jax.experimental.layout Format(Layout.AUTO)), then times the
compiled program with inputs device_put into exactly the layouts it chose —
i.e. a serving configuration where weights are stored pre-laid-out. Run
combinations: {default, AUTO} x {no opts, scoped-vmem 32 MiB}.

Run on the TPU: python benchmarks/auto_layout_experiment.py [--batch 128]
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
from jax.experimental.layout import Format, Layout

from pix2pixhdaudiosr_tpu.config import Config
from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem
from pix2pixhdaudiosr_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

_sum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

VMEM32 = {"xla_tpu_scoped_vmem_limit_kib": "32768"}


def timed(fn, args, iters=12):
    o = fn(*args)
    float(_sum(o))

    def run(m):
        t0 = time.perf_counter()
        o = None
        for _ in range(m):
            o = fn(*args)
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

    results = {}

    # Baselines: default layouts, with/without the tuned vmem option.
    lowered = jax.jit(fwd).lower(params, audio, key)
    for name, opts in [("default", None), ("default+vmem32", VMEM32)]:
        compiled = lowered.compile(compiler_options=opts)
        ms = timed(compiled, (params, audio, key)) * 1e3
        results[name] = {"ms": round(ms, 2)}
        print(name, results[name], flush=True)

    # AUTO entry layouts: XLA chooses the layout of every input and output.
    auto = Format(Layout.AUTO)
    for name, opts in [("auto", None), ("auto+vmem32", VMEM32)]:
        try:
            jitted = jax.jit(fwd, in_shardings=auto, out_shardings=auto)
            low = jitted.lower(params, audio, key)
            compiled = low.compile(compiler_options=opts)
            in_fmts = compiled.input_formats
            # Relay inputs into the chosen layouts (serving would store
            # weights this way once).
            p_fmt, a_fmt, k_fmt = in_fmts[0]
            params_l = jax.tree.map(jax.device_put, params, p_fmt)
            audio_l = jax.device_put(audio, a_fmt)
            ms = timed(compiled, (params_l, audio_l, key)) * 1e3
            # Count how many params got a non-default layout.
            flat_f = jax.tree.leaves(p_fmt)
            flat_p = jax.tree.leaves(params)
            nondefault = []
            for f, p in zip(flat_f, flat_p):
                mjm = tuple(range(p.ndim - 1, -1, -1))
                lay = getattr(f, "layout", None)
                mm = getattr(lay, "major_to_minor", None)
                if mm is not None and tuple(mm) != mjm:
                    nondefault.append((p.shape, tuple(mm)))
            aud_mm = getattr(getattr(a_fmt, "layout", None),
                             "major_to_minor", None)
            results[name] = {"ms": round(ms, 2),
                             "n_nondefault_param_layouts": len(nondefault),
                             "audio_layout": str(aud_mm),
                             "sample_nondefault": [
                                 [list(s), list(m)] for s, m in nondefault[:6]]}
        except Exception as e:  # noqa: BLE001 - record and continue
            results[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(name, results[name], flush=True)

    out = os.path.join(os.path.dirname(__file__), "auto_layout_experiment.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
