#!/usr/bin/env python
"""730M default-G FSDP demonstration at REAL shapes on the 8-way virtual
mesh (VERDICT r3 ask 2c).

One full two-optimizer GAN train step of the reference-default G9L3@64
(730,713,346 params — the exact-count oracle config) with FSDP/ZeRO-3
param+moment sharding over 8 devices, at the production segment length
(32512 samples) and batch 8 — real shapes, not the toy dryrun shapes.
On CPU this validates that the sharded program compiles and executes and
that the sharding actually splits the big tensors; the per-device memory
arithmetic for a v5e pod is printed alongside.

Run: python benchmarks/g730_fsdp_dryrun.py  [--batch 8]
(CPU-forced; expect a long single-core compile.)
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--remat", choices=["full", "dots"], default=None,
                    help="also apply --remat_g at this scale (peak-RSS "
                         "comparison vs the no-remat run)")
    ap.add_argument("--mu_bf16", action="store_true")
    args = ap.parse_args()

    from benchmarks.g730_experiment import g730_cfg
    from pix2pixhdaudiosr_tpu.parallel import make_mesh, replicated, shard_batch
    from pix2pixhdaudiosr_tpu.parallel.fsdp import apply_fsdp
    from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem
    from pix2pixhdaudiosr_tpu.trainer import init_state, make_train_step

    cfg = g730_cfg().replace(compute_dtype="float32")  # CPU has no bf16 units
    if args.remat:
        cfg = cfg.replace(remat_g=args.remat)
    if args.mu_bf16:
        cfg = cfg.replace(adam_mu_bf16=True)
    system = Pix2PixHDSystem(cfg)
    res = {"batch": args.batch, "segment_length": cfg.segment_length,
           "remat_g": args.remat, "adam_mu_bf16": args.mu_bf16}

    t0 = time.time()
    state, opt_g, opt_d = init_state(system, jax.random.PRNGKey(0),
                                     batch=args.batch)
    res["init_s"] = round(time.time() - t0, 1)
    n_p = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(
        state.params["G"]))
    res["n_params_g"] = n_p
    print(f"init {res['init_s']}s, G params {n_p:,}", flush=True)
    assert n_p == 730_713_346

    mesh = make_mesh((8,), ("data",))
    state = apply_fsdp(jax.device_put(state, replicated(mesh)), mesh)
    big = [l for l in jax.tree.leaves(state.params["G"]) if l.ndim == 4]
    n_sharded = sum(not l.sharding.is_fully_replicated for l in big)
    res["sharded_4d_leaves"] = f"{n_sharded}/{len(big)}"
    print("fsdp sharded 4-D leaves:", res["sharded_4d_leaves"], flush=True)

    step = make_train_step(system, opt_g, opt_d, donate=False)
    rng = np.random.default_rng(0)
    batch = shard_batch({
        k: (rng.standard_normal((args.batch, cfg.segment_length)) * 0.1
            ).astype(np.float32) for k in ("label", "image")}, mesh)
    t0 = time.time()
    new_state, losses, _ = step(state, batch, jax.random.PRNGKey(1), None,
                                fix_global=False, with_visuals=False)
    losses = {k: float(v) for k, v in losses.items()}
    res["first_step_s (incl. compile)"] = round(time.time() - t0, 1)
    assert all(np.isfinite(v) for v in losses.values()), losses
    res["losses"] = {k: round(v, 4) for k, v in losses.items()}
    print("step ok:", json.dumps(res["losses"]), flush=True)

    # second step (warm) for a step-time signal
    t0 = time.time()
    new_state, losses2, _ = step(new_state, batch, jax.random.PRNGKey(2),
                                 None, fix_global=False, with_visuals=False)
    float(jax.device_get(losses2["G_GAN"]))
    res["second_step_s"] = round(time.time() - t0, 1)

    res["peak_rss_gb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 1)
    # v5e pod arithmetic: per-device optimizer+param state under fsdp-8
    state_gb = (4 + 4 + 4) * n_p / 8 / 1e9   # p + mu + nu f32, sharded
    res["v5e_fsdp8_state_gb_per_chip"] = round(state_gb, 2)
    res["v5e_fsdp8_state_gb_per_chip_mu_bf16"] = round(
        (4 + 2 + 4) * n_p / 8 / 1e9, 2)
    print(json.dumps(res, indent=1), flush=True)

    tag = f"_{args.remat}" if args.remat else ""
    tag += "_mubf16" if args.mu_bf16 else ""
    out = os.path.join(os.path.dirname(__file__),
                       f"g730_fsdp_dryrun{tag}.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
