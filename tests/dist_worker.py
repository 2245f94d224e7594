"""Multi-process data-parallel worker (NOT a test — launched as a subprocess
by tests/test_distributed.py, one python process per simulated host).

Exercises the real multi-host path of parallel/mesh.py end-to-end on CPU:
`initialize_distributed` (jax.distributed bring-up), `make_mesh` over the
GLOBAL device set, `host_local_batch` (jax.make_array_from_process_local_data
assembly of per-host batch shards), then ONE full two-optimizer GAN train
step over the data-sharded global batch. Prints the losses as one JSON line
prefixed with LOSSES so the test can compare them against a single-process
run of the identical program.

Usage: python tests/dist_worker.py <process_id> <num_processes> <port> [mode]
mode = "dp" (default) or "fsdp": fsdp additionally shards params + both
optimizers' states over the GLOBAL data axis (parallel/fsdp.py), so each
process holds only its 1/n_dev param/moment shards — the real multi-host
ZeRO-3 pattern with Gloo all-gather/reduce-scatter across processes.
Env (set by the test): JAX_PLATFORMS=cpu, JAX_NUM_CPU_DEVICES=<n_local>,
PALLAS_AXON_POOL_IPS unset (so sitecustomize does not pre-register a PJRT
backend before jax.distributed.initialize).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "dp"

    import jax
    import numpy as np

    from pix2pixhdaudiosr_tpu.parallel.mesh import (host_local_batch,
                                                    initialize_distributed,
                                                    make_mesh, replicated)
    from tests.dist_common import TINY_CFG, make_global_batch

    got_pid = initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs, process_id=pid)
    assert got_pid == pid, (got_pid, pid)

    from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem
    from pix2pixhdaudiosr_tpu.trainer import init_state, make_train_step

    n_dev = jax.device_count()
    system = Pix2PixHDSystem(TINY_CFG)
    mesh = make_mesh((n_dev,), ("data",))
    state, opt_g, opt_d = init_state(system, jax.random.PRNGKey(0),
                                     batch=n_dev)
    # deterministic init on every process; replicate across all hosts
    state = jax.device_put(jax.device_get(state), replicated(mesh))
    if mode == "fsdp":
        # params + Adam moments sharded over the 4-device GLOBAL axis: each
        # 2-device process addresses only half of every sharded leaf, and
        # the step's all-gather / reduce-scatter cross the process boundary
        from pix2pixhdaudiosr_tpu.parallel.fsdp import apply_fsdp
        state = apply_fsdp(state, mesh)
        big = [l for l in jax.tree.leaves(state.params["G"]) if l.ndim == 4]
        assert any(not l.sharding.is_fully_replicated for l in big)
        assert any(not l.is_fully_addressable for l in big)
    step = make_train_step(system, opt_g, opt_d, donate=False)

    full = make_global_batch(n_dev)
    per = n_dev // nprocs
    local = {k: v[pid * per:(pid + 1) * per] for k, v in full.items()}
    batch = host_local_batch(local, mesh)
    for v in batch.values():
        assert v.shape[0] == n_dev  # global shape, per-host shards

    _, losses, _ = step(state, batch, jax.random.PRNGKey(1), None,
                        fix_global=False, with_visuals=False)
    out = {k: float(v) for k, v in losses.items()}
    assert all(np.isfinite(v) for v in out.values()), out
    print("LOSSES " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
