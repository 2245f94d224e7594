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

import jax
import jax.numpy as jnp
import numpy as np

fence_sum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def host_params(shapes, seed: int = 0, scale: float = 0.02):
    rng_np = np.random.default_rng(seed)
    return jax.tree.map(
        lambda s: jax.device_put(
            (rng_np.standard_normal(s.shape) * scale).astype(s.dtype)),
        shapes)
