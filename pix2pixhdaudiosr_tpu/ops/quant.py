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
# True int8 MXU compute for the coarse-trunk resblock stack
# ---------------------------------------------------------------------------
# XLA's int8 CONV lowering is slower than bf16 on v5e (measured 64-94 TOP/s),
# but int8 dot_general hits the MXU's fast path at ~463 TOP/s (2.4x the bf16
# peak). The trunk resblocks run at tiny spatial extent ([16,4] flagship), so
# their 3x3 reflect-padded convs reformulate exactly as 9 shifted
# [B*H*W, C] x [C, C] dots — the fast shape. Weight-only quantization
# (above) keeps bf16 compute; this path is the real thing: dynamic
# per-tensor activation scales, per-output-channel weight scales, int32
# accumulation, f32 requantize into the usual InstanceNorm/ReLU epilogue.


def _quant_act_tensor(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tensor symmetric int8 for activations (dynamic, in-graph)."""
    s = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def _conv3x3_int8(x: jnp.ndarray, k: jnp.ndarray, b: jnp.ndarray):
    """Reflect-padded SAME 3x3 conv of NHWC x via 9 shifted int8 dots."""
    B, H, W, C = x.shape
    co = k.shape[-1]
    xq, sx = _quant_act_tensor(x)
    kq, sw = quantize_leaf(k)                     # sw [1,1,1,co]
    xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    acc = jnp.zeros((B * H * W, co), jnp.int32)
    for dh in range(3):
        for dw in range(3):
            win = xp[:, dh:dh + H, dw:dw + W, :].reshape(B * H * W, C)
            acc = acc + jax.lax.dot_general(
                win, kq[dh, dw], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * sw.reshape(1, co)) \
        + b.astype(jnp.float32)[None]
    return y.reshape(B, H, W, co).astype(x.dtype)


def int8_resblock_stack(x: jnp.ndarray, blocks, eps: float = 1e-5):
    """Sequential ResnetBlocks (reference models/networks.py:214-253) with
    int8-MXU convs. blocks: [((k1,b1),(k2,b2)), ...] — the exact
    ConvIN_{0,1}/Conv_0 params of models/layers.ResnetBlock (f32).
    Numerics: int8 weight+activation quantization error on the convs; the
    InstanceNorm/ReLU/residual epilogue matches the bf16 path."""
    from ..models.layers import instance_norm
    cur = x
    for (k1, b1), (k2, b2) in blocks:
        h = jax.nn.relu(instance_norm(_conv3x3_int8(cur, k1, b1), eps=eps))
        h = instance_norm(_conv3x3_int8(h, k2, b2), eps=eps)
        cur = cur + h
    return cur


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
