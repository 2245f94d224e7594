#!/usr/bin/env python
"""Stand up the reference's DEFAULT 730M-param generator on the real chip
(VERDICT r3 ask 2).

The reference's default `netG=local` config is G9L3@64 = 730,713,346 params
(reference train_script.sh comment under mdct_hifitts_pretrain_explict_pha2;
this repo's exact-count oracle: tests/test_networks.py LADDER[0]). This repo
built --remat_g, ZeRO-1 and FSDP explicitly for that scale — this script
produces the evidence:

  (a) serve: bf16 params (~1.46 GB) through the generate-style forward,
      batch sweep, ms/batch + frames/s;
  (b) train: one real donated two-optimizer GAN step at the largest batch
      that fits 16 GB HBM, walking down (batch, remat, mu_dtype) attempts;
  (c) on any OOM the error text / memory analysis is recorded verbatim so
      the measured HBM requirement is part of the record.

Run on the TPU: python benchmarks/g730_experiment.py
(expect long remote compiles: the 156M train step took ~5 min; this is
4.7x the params — run with run_in_background and patience).
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
from benchmarks.common import mem_info as _mem_info
from benchmarks.common import serve_sweep, tiny_or_fail_fast
from pix2pixhdaudiosr_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def g730_cfg():
    from pix2pixhdaudiosr_tpu.config import Config
    return Config(net_g="local", ngf=64, n_blocks_global=9, n_blocks_local=3,
                  n_downsample_global=4, n_local_enhancers=1,
                  input_nc=2, output_nc=2, label_nc=0, no_instance=True,
                  explicit_encoding=True, mask_mode="mode2",
                  no_vgg_loss=True, compute_dtype="bfloat16")


def serve(system, cfg, batches, res, expect_params=730_713_346):
    # the big-model sweep uses fewer timing iterations (each b64 run is
    # ~70 ms; 2+6 differenced runs keep the delta above relay jitter)
    serve_sweep(system, cfg, batches, res, key_fmt="serve_b{b}",
                base_iters=2, extra_iters=lambda b: 6, include_memory=True,
                expect_params=expect_params, ms_digits=1)


def parse_train_attempts(items):
    """BATCH[:remat][:mubf16] items -> [(batch, remat, mu_bf16)].

    Validates every token NOW — a typo silently dropped here would record a
    capture under the wrong knob label (round-5 review finding)."""
    if not items:
        raise SystemExit("--train_attempts given but empty: pass at least "
                         "one BATCH[:remat][:mubf16] item")
    attempts = []
    for item in items:
        parts = item.split(":")
        remat, mu_bf16 = None, False
        for tok in parts[1:]:
            if tok in ("full", "dots"):
                remat = tok
            elif tok == "mubf16":
                mu_bf16 = True
            elif tok:
                raise SystemExit(
                    f"--train_attempts {item!r}: unknown token {tok!r} "
                    f"(expected 'full', 'dots' or 'mubf16')")
        try:
            batch = int(parts[0])
        except ValueError:
            raise SystemExit(f"--train_attempts {item!r}: batch must be an "
                             f"integer, got {parts[0]!r}") from None
        attempts.append((batch, remat, mu_bf16))
    return attempts


def train(system, cfg, attempts, res):
    from pix2pixhdaudiosr_tpu.trainer import (TrainState, _split_params,
                                              make_optimizer, make_train_step)

    for b, remat, mu_bf16 in attempts:
        key = f"train_b{b}_remat-{remat or 'none'}" + \
              ("_mubf16" if mu_bf16 else "")
        try:
            ocfg = cfg.replace(adam_mu_bf16=mu_bf16)
            opt_g, opt_d = make_optimizer(ocfg), make_optimizer(ocfg)
            sys_r = system
            if remat:
                from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem
                sys_r = Pix2PixHDSystem(cfg.replace(remat_g=remat))
            shapes = jax.eval_shape(
                lambda k: sys_r.init_params(k, batch=b), jax.random.PRNGKey(0))
            params = _host_params(shapes)

            @jax.jit
            def init_opts(p):
                pg, pd = _split_params(p)
                return opt_g.init(pg), opt_d.init(pd)

            og, od = init_opts(params)
            state = TrainState(params=params, opt_g=og, opt_d=od,
                               step=jnp.zeros((), jnp.int32))
            step = make_train_step(sys_r, opt_g, opt_d, donate=True)
            rng_np = np.random.default_rng(0)
            data = {
                "label": jnp.asarray(rng_np.standard_normal(
                    (b, cfg.segment_length)).astype(np.float32) * 0.1),
                "image": jnp.asarray(rng_np.standard_normal(
                    (b, cfg.segment_length)).astype(np.float32) * 0.1),
            }
            k = jax.random.PRNGKey(1)
            t0 = time.time()
            compiled = step.lower(state, data, k, None, fix_global=False,
                                  with_visuals=False).compile()
            cs = time.time() - t0
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            mem = _mem_info(compiled)

            def run(m):
                nonlocal state
                o = None
                t0 = time.perf_counter()
                for _ in range(m):
                    o = compiled(state, data, k, None)
                    state = o[0]
                float(_sum(o[1]["G_GAN"]))
                return time.perf_counter() - t0

            run(1)
            t1, tn = run(1), run(1 + 3)
            ms = (tn - t1) / 3 * 1e3
            res[key] = {
                "ms_per_step": round(ms, 1),
                "segments_per_sec": round(b / (ms / 1e3), 2),
                "gbytes_accessed": round(
                    float(ca.get("bytes accessed", 0.0)) / 1e9, 1),
                "tflops": round(float(ca.get("flops", 0.0)) / 1e12, 2),
                "compile_s": round(cs, 1),
                "memory": mem,
            }
            print(key, json.dumps(res[key]), flush=True)
            return  # largest fitting attempt wins; stop walking down
        except Exception as e:
            res[key] = {"error": f"{type(e).__name__}: {e}"[:400]}
            print(key, json.dumps(res[key]), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--serve_batches", type=int, nargs="*",
                    default=[16, 32, 64])
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--skip_serve", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke mode: shrink the config to exercise "
                         "every harness code path without the chip")
    ap.add_argument("--train_attempts", type=str, nargs="*", default=None,
                    help="override the train knob walk: each item is "
                         "BATCH[:remat][:mubf16], e.g. 32 32:full "
                         "32:full:mubf16 (walk stops at the first fit)")
    ap.add_argument("--out_suffix", default="",
                    help="append to the result filename (so an override run "
                         "does not clobber the canonical g730_results.json)")
    args = ap.parse_args()

    from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem

    cfg = g730_cfg()
    tiny_or_fail_fast(args.tiny)
    if args.tiny:
        cfg = cfg.replace(ngf=8, n_blocks_global=1, n_blocks_local=1,
                          n_downsample_global=2, ndf=8, n_layers_d=2,
                          compute_dtype="float32")
        args.serve_batches = [2]
    system = Pix2PixHDSystem(cfg)
    res = {}
    if not args.skip_serve:
        serve(system, cfg, args.serve_batches, res,
              expect_params=None if args.tiny else 730_713_346)
    if not args.skip_train:
        # walk down until one fits; remat/mu-bf16 are the memory knobs built
        # for this scale (BASELINE.md remat bullet; trainstep_hbm.py)
        attempts = [(2, "full", True)] if args.tiny else \
                   [(16, None, False),
                    (16, "full", False),
                    (8, "full", False),
                    (8, "full", True),
                    (4, "full", True)]
        if args.train_attempts is not None:
            attempts = parse_train_attempts(args.train_attempts)
        train(system, cfg, attempts, res)

    out = os.path.join(os.path.dirname(__file__),
                       ("g730_results_tiny%s.json" if args.tiny
                        else "g730_results%s.json") % args.out_suffix)
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
