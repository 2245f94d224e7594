"""Shared layers: reflection padding, affine-free InstanceNorm, the exact
AvgPool used by the reference pyramids, and the 0.02-normal conv init
(reference models/networks.py:10-16, :22, :165, :308).

All modules run NHWC (TPU-native layout); the reference is NCHW.
"""

from __future__ import annotations

import functools
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# Conv weight init: normal(0, 0.02) (reference models/networks.py:10-13).
conv_init = nn.initializers.normal(stddev=0.02)


def reflect_pad(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """nn.ReflectionPad2d(p) on NHWC."""
    return jnp.pad(x, [(0, 0), (p, p), (p, p), (0, 0)], mode="reflect")


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d(affine=False) (reference models/networks.py:22): per
    (sample, channel) statistics over H, W. Stats in f32 regardless of the
    compute dtype (bf16-safe)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


@functools.lru_cache(maxsize=32)
def _avgpool_counts(h: int, w: int) -> np.ndarray:
    """Window-valid counts for AvgPool2d(3, stride=2, padding=1,
    count_include_pad=False) (reference models/networks.py:165, :308)."""
    ones = np.ones((h, w), np.float32)
    padded = np.pad(ones, 1)
    oh, ow = (h + 2 - 3) // 2 + 1, (w + 2 - 3) // 2 + 1
    counts = np.zeros((oh, ow), np.float32)
    for i in range(oh):
        for j in range(ow):
            counts[i, j] = padded[2 * i : 2 * i + 3, 2 * j : 2 * j + 3].sum()
    return counts


def avg_pool_3s2(x: jnp.ndarray) -> jnp.ndarray:
    """AvgPool2d(3, stride=2, padding=1, count_include_pad=False) on NHWC.

    Implemented as nine shifted strided slices summed (not lax.reduce_window,
    whose add-monoid lacks a linearization rule when nested inside an outer
    vjp trace on jax 0.9; slices+adds are fully differentiable and fuse)."""
    h, w = x.shape[1], x.shape[2]
    oh, ow = (h - 1) // 2 + 1, (w - 1) // 2 + 1
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    summed = None
    for di in range(3):
        for dj in range(3):
            part = padded[:, di : di + 2 * oh - 1 : 2, dj : dj + 2 * ow - 1 : 2, :]
            summed = part if summed is None else summed + part
    counts = jnp.asarray(_avgpool_counts(h, w), x.dtype)
    return summed / counts[None, :, :, None]


class ConvIN(nn.Module):
    """Conv(+optional reflect pad) -> InstanceNorm -> activation."""
    features: int
    kernel: int
    stride: int = 1
    pad: int = 0              # zero padding handled by the conv
    reflect: int = 0          # reflection padding applied before the conv
    norm: bool = True
    act: str = "relu"         # relu | leaky | tanh | none
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.reflect:
            x = reflect_pad(x, self.reflect)
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(self.pad, self.pad)] * 2,
                    kernel_init=conv_init, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        if self.norm:
            x = instance_norm(x)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "leaky":
            x = nn.leaky_relu(x, 0.2)
        elif self.act == "tanh":
            x = jnp.tanh(x)
        return x


class ConvTransposeIN(nn.Module):
    """ConvTranspose2d(3, stride 2, padding 1, output_padding 1) analog:
    exact 2x upsampling -> InstanceNorm -> ReLU
    (reference models/networks.py:155, :205)."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(self.features, (3, 3), strides=(2, 2),
                             padding="SAME", kernel_init=conv_init,
                             dtype=self.dtype, param_dtype=jnp.float32)(x)
        return nn.relu(instance_norm(x))


class ResnetBlock(nn.Module):
    """Reflect-padded 3x3 conv x2 with InstanceNorm and residual add
    (reference models/networks.py:214-253)."""
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ConvIN(self.dim, 3, reflect=1, act="relu", dtype=self.dtype)(x)
        h = ConvIN(self.dim, 3, reflect=1, act="none", dtype=self.dtype)(h)
        return x + h
