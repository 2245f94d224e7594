"""Int8 weight quantization for inference.

The reference parses --data_type {8,16,32} but only ever uses fp16 AMP
(reference options/base_options.py:19; the 8-bit path is dead). Here
--data_type 8 is real: per-output-channel symmetric int8 weight quantization
for the generator. Weights are stored int8 (4x smaller checkpoints/HBM) and
dequantized inside the jit (cast+scale fuses into the conv's weight load;
activations stay bf16).

Includes a Pallas stochastic-rounding quantizer (the guide's quantization
kernel pattern) for on-device quantization of large trees.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_leaf(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-last-axis-channel symmetric int8: returns (q int8, scale f32)."""
    axes = tuple(range(w.ndim - 1))
    amax = jnp.max(jnp.abs(w), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize_leaf(q: jnp.ndarray, scale: jnp.ndarray,
                    dtype=jnp.bfloat16) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale).astype(dtype)


def _is_weight(path) -> bool:
    last = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    return last == "kernel"


def quantize_params(params: Any) -> Tuple[Any, Any]:
    """Quantize every conv kernel leaf; biases/others pass through.
    Returns (quantized tree with int8 kernels, scales tree with None for
    non-quantized leaves)."""

    def q(path, leaf):
        if _is_weight(path) and leaf.ndim >= 2:
            return quantize_leaf(jnp.asarray(leaf))
        return (leaf, None)

    pairs = jax.tree_util.tree_map_with_path(q, params)
    qtree = jax.tree.map(lambda p: p[0], pairs,
                         is_leaf=lambda x: isinstance(x, tuple))
    scales = jax.tree.map(lambda p: p[1], pairs,
                          is_leaf=lambda x: isinstance(x, tuple))
    return qtree, scales


def dequantize_params(qtree: Any, scales: Any, dtype=jnp.float32) -> Any:
    def dq(q, s):
        return dequantize_leaf(q, s, dtype) if s is not None else q

    return jax.tree.map(dq, qtree, scales,
                        is_leaf=lambda x: x is None or hasattr(x, "shape"))


def quantized_size_bytes(qtree: Any) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(qtree)
               if hasattr(x, "size"))


# ---------------------------------------------------------------------------
# Pallas stochastic-rounding quantizer (guide pattern)
# ---------------------------------------------------------------------------
def stochastic_quantize_2d(x: jnp.ndarray, seed: int) -> Tuple[jnp.ndarray,
                                                               jnp.ndarray]:
    """[M, N] -> (int8 [M, N], per-column scale [1, N]) with stochastic
    rounding on TPU (interpret mode elsewhere)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(seed_ref, x_ref, q_ref, s_ref):
        pltpu.prng_seed(seed_ref[0])
        xv = x_ref[:].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xv), axis=0, keepdims=True)
        scale = jnp.maximum(amax, 1e-12) / 127.0
        scaled = xv / scale
        bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape), jnp.uint32)
        # stochastic round: add uniform [0,1) then floor. (uint32->f32 casts
        # are unsupported by Mosaic; go through int32 — 24 bits fit exactly.)
        u = (bits >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
        q = jnp.clip(jnp.floor(scaled + u), -127, 127)
        q_ref[:] = q.astype(jnp.int8)
        s_ref[:] = scale

    m, n = x.shape
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((m, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((m, n), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, n), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((m, n), jnp.int8),
                   jax.ShapeDtypeStruct((1, n), jnp.float32)],
    )(jnp.asarray([seed], jnp.int32), x)
