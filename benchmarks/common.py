"""Shared helpers for the on-chip benchmark harnesses.

fence_sum: on the axon relay backend `block_until_ready` does not fence AOT
executions; fetching a derived scalar (`float(fence_sum(out))`) serializes
the device queue — the only reliable sync/timing primitive there (see
CLAUDE.md "Environment quirks").

host_params: random host-side parameter trees from an eval_shape tree,
avoiding a device-side init compile (the 730M init alone takes ~4 min
through the remote compile server) and keeping params as ARGUMENTS —
closing large params over a jit embeds them in the compile payload, which
the remote-compile endpoint rejects (HTTP 413).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

fence_sum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def tiny_or_fail_fast(tiny: bool) -> None:
    """Every harness's backend preamble, one implementation (the per-harness
    config shrink stays at the call site — the models differ).

    tiny=True: force the live jax config to CPU BEFORE any backend init
    (tests/conftest pattern; env vars alone are too late — sitecustomize's
    axon register wins at interpreter start).
    tiny=False: arm the fail-fast init watchdog so a downed relay exits 3
    instead of hanging the harness — same protection as bench.py and the
    CLIs.
    """
    if tiny:
        jax.config.update("jax_platforms", "cpu")
    else:
        from pix2pixhdaudiosr_tpu.utils.watchdog import backend_watchdog
        backend_watchdog()


def host_params(shapes, seed: int = 0, scale: float = 0.02):
    rng_np = np.random.default_rng(seed)
    return jax.tree.map(
        lambda s: jax.device_put(
            (rng_np.standard_normal(s.shape) * scale).astype(s.dtype)),
        shapes)


def mem_info(compiled):
    try:
        ma = compiled.memory_analysis()
        return {k: round(getattr(ma, k, 0) / 1e9, 2)
                for k in ("argument_size_in_bytes", "output_size_in_bytes",
                          "temp_size_in_bytes", "generated_code_size_in_bytes")
                if hasattr(ma, k)}
    except Exception:
        return None


def serve_sweep(system, cfg, batches, res, *, key_fmt="b{b}", base_iters=3,
                extra_iters=lambda b: max(6, int(round(600 / max(b, 1)))),
                include_memory=False, expect_params=None, ms_digits=2):
    """Shared inference-latency sweep (serve_latency.py, g730_experiment.py).

    One implementation so timing-method fixes land everywhere at once:
    bf16 serving params passed as arguments (HTTP-413 rule), a PRNG key
    hoisted OUT of the timed loop (a per-iteration PRNGKey() device_puts a
    fresh key through the relay — per-iteration cost the run-length
    differencing cannot cancel), and differenced run lengths per the
    CLAUDE.md timing method. On an OOM-flavored error the sweep breaks
    (larger batches will also OOM); transient relay/compile errors are
    recorded and the sweep continues (ADVICE r4).
    """
    shapes = jax.eval_shape(system.netG.init, jax.random.PRNGKey(0),
                            jnp.zeros(system.spectro_shape(1), jnp.float32))
    n_p = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    res["n_params_g"] = n_p
    print(f"G params: {n_p:,}", flush=True)
    if expect_params is not None:
        assert n_p == expect_params, n_p
    params = host_params(shapes)
    # serving param layout: pre-cast once to the compute dtype (same as
    # generate.py / bench.py — halves param HBM traffic vs per-call casts)
    params = jax.tree.map(lambda a: a.astype(system.dtype), params)
    rng = jax.device_put(jax.random.PRNGKey(1))
    audio_s = cfg.segment_length / cfg.hr_sampling_rate

    for b in batches:
        key = key_fmt.format(b=b)
        err_full = None
        try:
            @jax.jit
            def fwd(p, a, k):
                return system.inference(p, a, k)[0]

            audio = jnp.zeros((b, cfg.segment_length), jnp.float32)
            t0 = time.time()
            compiled = fwd.lower(params, audio, rng).compile()
            cs = time.time() - t0
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca

            def run(m):
                o = None
                t0 = time.perf_counter()
                for _ in range(m):
                    o = compiled(params, audio, rng)
                float(fence_sum(o))
                return time.perf_counter() - t0

            run(base_iters)
            # differenced run lengths cancel dispatch/sync constants
            # (CLAUDE.md timing method); small batches are fast, use more
            # iterations so the delta stays well above relay jitter
            extra = extra_iters(b)
            t2, tn = run(base_iters), run(base_iters + extra)
            ms = (tn - t2) / extra * 1e3
            flops = float(ca.get("flops", 0.0))
            res[key] = {
                "ms_per_batch": round(ms, ms_digits),
                "frames_per_sec": round(b * system.n_frames / (ms / 1e3), 1),
                "samples_per_sec": round(
                    b * cfg.segment_length / (ms / 1e3), 1),
                "achieved_tflops": round(flops / 1e12 / (ms / 1e3), 1),
                "realtime_factor": round(b * audio_s / (ms / 1e3), 1),
                "bytes_gb": round(
                    float(ca.get("bytes accessed", 0.0)) / 1e9, 2),
                "compile_s": round(cs, 1),
            }
            if include_memory:
                res[key]["memory"] = mem_info(compiled)
        except Exception as e:
            err_full = f"{type(e).__name__}: {e}"
            res[key] = {"error": err_full[:400]}
        print(key, json.dumps(res[key]), flush=True)
        if err_full is not None:
            # classify on the FULL message (relay errors arrive wrapped in
            # long RPC prefixes that can push the marker past the stored
            # 400-char truncation), store truncated
            msg = err_full.lower()
            if "resource_exhausted" in msg or "out of memory" in msg:
                break  # larger batches will also OOM
            # transient relay/compile failure: keep sweeping
