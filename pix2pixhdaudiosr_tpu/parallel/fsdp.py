"""FSDP / ZeRO-3-style parameter + optimizer-state sharding.

SURVEY.md §6 hard parts: the reference's default generator (9 global blocks,
ngf 64) is ~0.73B params. ZeRO-1 (parallel/zero.py) shards only the Adam
moments; this module additionally shards the PARAMETERS over the `data`
mesh axis — the FSDP memory pattern, expressed purely through sharding
annotations: XLA's SPMD partitioner inserts a per-parameter all-gather
where the sharded weight meets its (batch-sharded) consumer in the forward
and backward, and a reduce-scatter where the replicated-gradient sum meets
the sharded moment/param update. No manual collectives.

Memory per device drops from P*(4 params + 8 moments) to ~P*12/N (+ the
transient gathered weight of the layer in flight), enabling the 730M
default G where replicated Adam state would not fit alongside activations.

Numerics are identical to the replicated run (tests/test_fsdp.py asserts
exact parity on the virtual 8-device mesh).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh

from .zero import opt_state_shardings, _leaf_spec
from jax.sharding import NamedSharding


def param_shardings(params: Any, mesh: Mesh, axis: str = "data"):
    """Pytree of NamedShardings for a parameter tree: each leaf's largest
    axis-divisible dim is sharded; small/indivisible leaves replicate."""
    n = mesh.shape[axis]

    def spec_for(leaf):
        shape = tuple(getattr(leaf, "shape", ()))
        return NamedSharding(mesh, _leaf_spec(shape, n, axis))

    return jax.tree.map(spec_for, params)


def shard_params(params: Any, mesh: Mesh, axis: str = "data"):
    return jax.tree.map(jax.device_put, params,
                        param_shardings(params, mesh, axis))


def apply_fsdp(state, mesh: Mesh, axis: str = "data"):
    """Shard a TrainState's params and both optimizers' states over `axis`.
    The train step needs no change: out shardings follow the inputs, so the
    updated params/moments stay sharded across steps."""
    return state.replace(
        params=shard_params(state.params, mesh, axis),
        opt_g=jax.tree.map(jax.device_put, state.opt_g,
                           opt_state_shardings(state.opt_g, mesh, axis)),
        opt_d=jax.tree.map(jax.device_put, state.opt_d,
                           opt_state_shardings(state.opt_d, mesh, axis)))
