"""Benchmark: flagship throughput on one chip.

Prints TWO JSON lines (VERDICT.md round-1 item 6):
  1. flagship 156M-param GAN TRAIN step (G+D fwd+bwd+2xAdam), segments/s
  2. flagship inference (MDCT encode + G forward), spectrogram frames/s —
     the BASELINE.md headline metric, printed LAST.

vs_baseline: measured samples/sec divided by an estimated reference GPU
samples/sec. The reference publishes no throughput (BASELINE.md), so the
estimate is analytic: FLOPs per sample (from XLA cost analysis) divided by
an assumed 25 TFLOP/s effective fp16 throughput for the reference's single
training GPU (V100-class at ~20% conv utilization, consistent with its
batchSize-64 fp16 recipes). Recorded in BASELINE.md.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REF_EFFECTIVE_FLOPS = 25e12  # assumed reference GPU effective fp16 FLOP/s


from benchmarks.common import host_params as _host_params_from_shapes


def bench_train_step(system, cfg):
    """Flagship 156M-param two-optimizer GAN train step, batch 64."""
    from pix2pixhdaudiosr_tpu.trainer import (_split_params, make_optimizer,
                                              make_train_step, TrainState)

    batch = 64
    rng_np = np.random.default_rng(0)
    shapes = jax.eval_shape(lambda k: system.init_params(k, batch=batch),
                            jax.random.PRNGKey(0))
    params = _host_params_from_shapes(shapes)
    opt_g, opt_d = make_optimizer(cfg), make_optimizer(cfg)

    @jax.jit
    def init_opts(p):
        pg, pd = _split_params(p)
        return opt_g.init(pg), opt_d.init(pd)

    og, od = init_opts(params)
    state = TrainState(params=params, opt_g=og, opt_d=od,
                       step=jnp.zeros((), jnp.int32))
    # donate=True is the real training configuration (train_loop.py); the
    # timing loop chains state -> state so donation stays valid.
    step = make_train_step(system, opt_g, opt_d, donate=True)
    data = {
        "label": jnp.asarray(rng_np.standard_normal(
            (batch, cfg.segment_length)).astype(np.float32) * 0.1),
        "image": jnp.asarray(rng_np.standard_normal(
            (batch, cfg.segment_length)).astype(np.float32) * 0.1),
    }
    key = jax.random.PRNGKey(1)
    lowered = step.lower(state, data, key, None, fix_global=False,
                         with_visuals=False)
    compiled = lowered.compile()
    flops = None
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass
    sumjit = jax.jit(lambda x: x.sum())

    def run(iters):
        nonlocal state
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = compiled(state, data, key, None)
            state = o[0]
        float(sumjit(o[1]["G_GAN"]))
        return time.perf_counter() - t0

    run(2)
    t_small = run(2)
    t_big = run(2 + 6)
    per = (t_big - t_small) / 6
    seg_per_sec = batch / per
    if flops:
        ref_sps = REF_EFFECTIVE_FLOPS / (flops / batch)
        vs_baseline = seg_per_sec / ref_sps
    else:
        vs_baseline = 0.0
    print(json.dumps({
        "metric": "flagship_train_step_segments_per_sec_per_chip",
        "value": round(seg_per_sec, 1),
        "unit": "segments/s",
        "vs_baseline": round(vs_baseline, 3),
    }), flush=True)


def main():
    # Bounded retry window first (default 30 min, AUDIOSR_BENCH_RETRY_WINDOW)
    # so a flapping relay doesn't cost the round's only capture, then the
    # shared fail-fast init watchdog (honors AUDIOSR_INIT_TIMEOUT like the
    # CLIs; exits 3 if the axon relay stays down instead of hanging the
    # driver).
    from pix2pixhdaudiosr_tpu.utils.watchdog import (backend_watchdog,
                                                     wait_for_backend)
    wait_for_backend()
    backend_watchdog()
    from pix2pixhdaudiosr_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from __graft_entry__ import _flagship_cfg
    from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem

    cfg = _flagship_cfg()
    system = Pix2PixHDSystem(cfg)

    try:
        bench_train_step(system, cfg)
    except Exception as e:  # the headline inference line must still print
        print(f"train-step bench failed: {e}", flush=True)
    batch = 128  # best measured serving batch on v5e (64 amortizes worse;
    # the reference trains at 64 — see BASELINE.md batch sweep)

    # Build params host-side from the abstract shapes (values are irrelevant
    # for throughput; a jitted init of the 156M-param model costs ~4 min of
    # remote compile on this backend).
    shapes = jax.eval_shape(system.netG.init, jax.random.PRNGKey(0),
                            jnp.zeros(system.spectro_shape(1), jnp.float32))
    params_g = _host_params_from_shapes(shapes)
    # serving param layout: pre-cast to the compute dtype once (bit-identical
    # to the per-call cast every conv does; halves param HBM traffic) — same
    # as generate.py's serving path
    params_g = jax.tree.map(lambda a: a.astype(system.dtype), params_g)

    @jax.jit
    def fwd(params, lr_audio, rng):
        sr_spec, _, _, _ = system.inference(params, lr_audio, rng)
        return sr_spec

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((batch, cfg.segment_length))
                        .astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(1)

    lowered = fwd.lower(params_g, audio, key)
    compiled = lowered.compile()
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    # Synchronization: on the axon relay backend block_until_ready does not
    # reliably wait for AOT executions; fetching a derived scalar does (the
    # device queue is serialized, so it fences all prior calls).
    sumjit = jax.jit(lambda x: x.sum())

    def run(iters):
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = compiled(params_g, audio, key)
        float(sumjit(o))
        return time.perf_counter() - t0

    out = compiled(params_g, audio, key)
    float(sumjit(out))  # warm both programs
    run(2)
    t_small, t_big = run(5), run(20)
    iters = 15
    dt = t_big - t_small  # differenced: removes dispatch/sync constants

    frames_per_sec = batch * system.n_frames * iters / dt
    samples_per_sec = batch * cfg.segment_length * iters / dt

    if flops:
        ref_sps = REF_EFFECTIVE_FLOPS / (flops / batch) * cfg.segment_length
        vs_baseline = samples_per_sec / ref_sps
    else:
        vs_baseline = 0.0

    print(json.dumps({
        "metric": "mdct_g_forward_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 1),
        "unit": "frames/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
