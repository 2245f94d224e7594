#!/usr/bin/env python
"""Train-step HBM closure (VERDICT r3 ask 3).

Produces ONE canonical HBM-utilization figure for the flagship train step
(resolving the stale 72%-vs-84% pair — both were the same 129 GB figure
divided by different rounds' step times), plus the train-step equivalent of
the inference composition-floor table: a traffic decomposition showing
where the bytes go and which components have measured-negative
alternatives.

Measures the REAL production configuration (make_train_step donate=True,
state-chained timing, exactly bench.py's program) and one bounded
experiment: Adam first-moment storage in bf16 (optax mu_dtype) — the only
untried train-step traffic knob from the r3 verdict. Everything else
(remat, layouts, compiler options, implicit-pad backward) was measured in
rounds 2-3 and is cited from BASELINE.md in the emitted table.

Run on the TPU: python benchmarks/trainstep_hbm.py [--batch 64]
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
from benchmarks.common import tiny_or_fail_fast
from pix2pixhdaudiosr_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

V5E_HBM_GBPS = 819.0  # v5e peak HBM bandwidth
V5E_BF16_TFLOPS = 197.0


def measure_step(system, cfg, batch_n, mu_dtype=None, iters=6):
    """Compile + time the donated two-optimizer train step; returns
    (ms/step, bytes accessed, flops)."""
    from pix2pixhdaudiosr_tpu.trainer import (TrainState, _split_params,
                                              make_optimizer, make_train_step)

    ocfg = cfg.replace(adam_mu_bf16=bool(mu_dtype))
    opt_g, opt_d = make_optimizer(ocfg), make_optimizer(ocfg)
    shapes = jax.eval_shape(lambda k: system.init_params(k, batch=batch_n),
                            jax.random.PRNGKey(0))
    params = _host_params(shapes)

    @jax.jit
    def init_opts(p):
        pg, pd = _split_params(p)
        return opt_g.init(pg), opt_d.init(pd)

    og, od = init_opts(params)
    state = TrainState(params=params, opt_g=og, opt_d=od,
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(system, opt_g, opt_d, donate=True)
    rng_np = np.random.default_rng(0)
    data = {
        "label": jnp.asarray(rng_np.standard_normal(
            (batch_n, cfg.segment_length)).astype(np.float32) * 0.1),
        "image": jnp.asarray(rng_np.standard_normal(
            (batch_n, cfg.segment_length)).astype(np.float32) * 0.1),
    }
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    compiled = step.lower(state, data, key, None, fix_global=False,
                          with_visuals=False).compile()
    compile_s = time.time() - t0
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    gbytes = float(ca.get("bytes accessed", 0.0)) / 1e9
    flops = float(ca.get("flops", 0.0))

    def run(m):
        nonlocal state
        t0 = time.perf_counter()
        o = None
        for _ in range(m):
            o = compiled(state, data, key, None)
            state = o[0]
        float(_sum(o[1]["G_GAN"]))
        return time.perf_counter() - t0

    run(2)
    t2 = run(2)
    tn = run(2 + iters)
    ms = (tn - t2) / iters * 1e3
    return ms, gbytes, flops, compile_s


def inference_bytes(system, cfg, batch_n):
    """Forward-only bytes accessed (bf16 serving params) — separates the
    forward's activation traffic from the train step's stash+backward."""
    shapes = jax.eval_shape(system.netG.init, jax.random.PRNGKey(0),
                            jnp.zeros(system.spectro_shape(1), jnp.float32))
    params = _host_params(shapes)
    params = jax.tree.map(lambda a: a.astype(system.dtype), params)

    @jax.jit
    def fwd(p, a, k):
        return system.inference(p, a, k)[0]

    audio = jnp.zeros((batch_n, cfg.segment_length), jnp.float32)
    compiled = fwd.lower(params, audio, jax.random.PRNGKey(1)).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return float(ca.get("bytes accessed", 0.0)) / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--skip_bf16_mu", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke mode: shrink config+batch to exercise "
                         "every harness code path without the chip")
    args = ap.parse_args()

    from __graft_entry__ import _flagship_cfg
    from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem

    cfg = _flagship_cfg()
    iters = 6
    tiny_or_fail_fast(args.tiny)
    if args.tiny:
        cfg = cfg.replace(ngf=8, n_blocks_global=1, n_blocks_local=1,
                          n_downsample_global=2, ndf=8, n_layers_d=2,
                          segment_length=(32 - 1) * 256,
                          compute_dtype="float32")
        args.batch, iters = 2, 2
    system = Pix2PixHDSystem(cfg)
    res = {"batch": args.batch}

    ms, gbytes, flops, cs = measure_step(system, cfg, args.batch, iters=iters)
    res["baseline"] = {
        "ms_per_step": round(ms, 1),
        "gbytes_accessed": round(gbytes, 1),
        "tflops": round(flops / 1e12, 2),
        "achieved_gbps": round(gbytes / (ms / 1e3), 1),
        "hbm_utilization_pct": round(100 * gbytes / (ms / 1e3) / V5E_HBM_GBPS, 1),
        "achieved_tflops": round(flops / 1e12 / (ms / 1e3), 1),
        "mfu_pct": round(100 * flops / 1e12 / (ms / 1e3) / V5E_BF16_TFLOPS, 1),
        "segments_per_sec": round(args.batch / (ms / 1e3), 1),
        "compile_s": round(cs, 1),
    }
    print("baseline", json.dumps(res["baseline"]), flush=True)

    try:
        res["inference_fwd_gbytes"] = round(
            inference_bytes(system, cfg, args.batch), 1)
        print("inference fwd bytes:", res["inference_fwd_gbytes"], "GB",
              flush=True)
    except Exception as e:
        res["inference_fwd_gbytes"] = f"error: {e}"[:200]

    if not args.skip_bf16_mu:
        try:
            ms2, gb2, fl2, cs2 = measure_step(system, cfg, args.batch,
                                              mu_dtype=jnp.bfloat16,
                                              iters=iters)
            res["adam_mu_bf16"] = {
                "ms_per_step": round(ms2, 1),
                "gbytes_accessed": round(gb2, 1),
                "achieved_gbps": round(gb2 / (ms2 / 1e3), 1),
                "segments_per_sec": round(args.batch / (ms2 / 1e3), 1),
                "compile_s": round(cs2, 1),
            }
            print("adam_mu_bf16", json.dumps(res["adam_mu_bf16"]), flush=True)
        except Exception as e:
            res["adam_mu_bf16"] = f"error: {type(e).__name__}: {e}"[:300]
            print(res["adam_mu_bf16"], flush=True)

    # analytic traffic decomposition (f32 params; n_params from eval_shape)
    n_p = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(
        jax.eval_shape(lambda k: system.init_params(k, batch=1),
                       jax.random.PRNGKey(0))))
    adam_gb = 6 * 4 * n_p / 1e9      # read p,mu,nu + write p,mu,nu
    grads_gb = 2 * 4 * n_p / 1e9     # bwd writes grads, Adam reads them
    param_reads_gb = 2 * 4 * n_p / 1e9  # fwd + bwd f32 param reads
    res["decomposition"] = {
        "n_params": n_p,
        "adam_update_gb": round(adam_gb, 1),
        "grad_writeread_gb": round(grads_gb, 1),
        "param_reads_fwd_bwd_gb": round(param_reads_gb, 1),
        "optimizer_side_total_gb": round(adam_gb + grads_gb + param_reads_gb, 1),
        "activation_side_gb (baseline - optimizer side)": round(
            gbytes - (adam_gb + grads_gb + param_reads_gb), 1),
    }
    print("decomposition", json.dumps(res["decomposition"]), flush=True)

    out = os.path.join(os.path.dirname(__file__),
                       "trainstep_hbm_tiny.json" if args.tiny
                       else "trainstep_hbm.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
