"""Fused Pallas InstanceNorm(+activation) kernel.

InstanceNorm dominates the memory-bound share of the full-resolution enhancer
layers (~4 ms per 64x512x128x48 activation on v5e; see BASELINE.md): the XLA
lowering runs separate reduction and normalize passes over HBM. This kernel
holds one sample's [H, W, C] block in VMEM, computes the per-channel moments
and normalizes (optionally fusing ReLU / leaky-ReLU) in a single
read + write of HBM.

Matches models/layers.instance_norm (affine-free, eps 1e-5, f32 statistics,
centered two-pass variance) to f32 roundoff; tests run in interpret mode,
benchmarks on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _in_kernel(act: str, eps: float, h: int, w: int, c: int):
    def kernel(x_ref, o_ref):
        x = x_ref[0].reshape(h * w, c).astype(jnp.float32)
        mean = jnp.mean(x, axis=0, keepdims=True)
        centered = x - mean
        var = jnp.mean(centered * centered, axis=0, keepdims=True)
        y = centered * jax.lax.rsqrt(var + eps)
        if act == "relu":
            y = jnp.maximum(y, 0.0)
        elif act == "leaky":
            y = jnp.where(y >= 0, y, 0.2 * y)
        o_ref[0] = y.reshape(h, w, c).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("act", "eps"))
def fused_instance_norm(x: jnp.ndarray, act: str = "none",
                        eps: float = 1e-5) -> jnp.ndarray:
    """[B, H, W, C] -> InstanceNorm(+activation), one HBM read + write.
    Each grid program owns one sample (fits VMEM for every layer of the
    flagship model: max block 512*128*48*2B = 6.3 MB)."""
    b, h, w, c = x.shape
    return pl.pallas_call(
        _in_kernel(act, eps, h, w, c),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


def vmem_fits(x_shape, dtype=jnp.bfloat16, budget_bytes: int = 12 * 2**20) -> bool:
    _, h, w, c = x_shape
    # in + out block plus the f32 working copy
    per = h * w * c
    return per * (2 * jnp.dtype(dtype).itemsize + 4) <= budget_bytes
