"""HiFi-GAN multi-scale + multi-period time-domain discriminator (Flax).

The reference imports HiFiGANMultiScaleMultiPeriodDiscriminator from the
ParallelWaveGAN git submodule (reference models/pix2pixHD_model.py:61-63,
.gitmodules:1-3 — not vendored). This is a from-scratch Flax implementation of
the standard architecture (Kong et al. 2020, HiFi-GAN) with the
ParallelWaveGAN default hyperparameters: 3 scale discriminators over avg-pooled
waveforms (grouped 1-D convs, kernel 15/41/5/3) and period discriminators for
periods (2, 3, 5, 7, 11) (5x1 stride-3x1 2-D convs), all with weight-norm-free
conv + leaky ReLU (slope 0.1).

Input: waveform [B, T, 1]. Output: list over sub-discriminators of per-layer
feature lists (final score last), the same nested structure the GAN loss
consumes for the frequency-domain discriminators.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import conv_init


class ScaleDiscriminator(nn.Module):
    """One HiFi-GAN scale discriminator (Conv1d stack with groups)."""
    channels: Sequence[int] = (128, 128, 256, 512, 1024, 1024, 1024)
    kernel_sizes: Sequence[int] = (15, 41, 5, 3)
    groups: Sequence[int] = (1, 4, 16, 16, 16, 16, 1)
    strides: Sequence[int] = (1, 2, 2, 4, 4, 1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        feats = []
        h = x
        ks = [self.kernel_sizes[0]] + [self.kernel_sizes[1]] * 5 + [self.kernel_sizes[2]]
        for i, (c, k, g, s) in enumerate(zip(self.channels, ks, self.groups,
                                             self.strides)):
            h = nn.Conv(c, (k,), strides=(s,), padding="SAME",
                        feature_group_count=g, kernel_init=conv_init,
                        dtype=self.dtype, param_dtype=jnp.float32)(h)
            h = nn.leaky_relu(h, 0.1)
            feats.append(h)
        h = nn.Conv(1, (self.kernel_sizes[3],), padding="SAME",
                    kernel_init=conv_init, dtype=self.dtype,
                    param_dtype=jnp.float32)(h)
        feats.append(h)
        return feats


class PeriodDiscriminator(nn.Module):
    """One HiFi-GAN period discriminator: reshape [B,T,1] -> [B,T/p,p,1] and
    run (5,1) stride (3,1) convs."""
    period: int
    channels: Sequence[int] = (32, 128, 512, 1024)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        b, t, c = x.shape
        pad = (-t) % self.period
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="reflect")
        h = x.reshape(b, -1, self.period, c)
        feats = []
        for ch in self.channels:
            h = nn.Conv(ch, (5, 1), strides=(3, 1), padding=((2, 2), (0, 0)),
                        kernel_init=conv_init, dtype=self.dtype,
                        param_dtype=jnp.float32)(h)
            h = nn.leaky_relu(h, 0.1)
            feats.append(h)
        h = nn.Conv(1024, (5, 1), padding=((2, 2), (0, 0)),
                    kernel_init=conv_init, dtype=self.dtype,
                    param_dtype=jnp.float32)(h)
        h = nn.leaky_relu(h, 0.1)
        feats.append(h)
        h = nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)), kernel_init=conv_init,
                    dtype=self.dtype, param_dtype=jnp.float32)(h)
        feats.append(h)
        return feats


def _avg_pool_1d(x: jnp.ndarray, k: int = 4, s: int = 2) -> jnp.ndarray:
    """AvgPool1d(4, 2, padding=2) via shifted strided slices (differentiable
    everywhere; see models/layers.py avg_pool_3s2 note)."""
    t = x.shape[1]
    ot = (t + 2 * (k // 2) - k) // s + 1
    padded = jnp.pad(x, ((0, 0), (k // 2, k // 2), (0, 0)))
    summed = None
    for d in range(k):
        part = padded[:, d : d + s * (ot - 1) + 1 : s, :]
        summed = part if summed is None else summed + part
    return summed / k


class HiFiGANMultiScaleMultiPeriodDiscriminator(nn.Module):
    """MSD (3 scales) + MPD (periods 2,3,5,7,11)."""
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    n_scales: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[List[jnp.ndarray]]:
        out = []
        h = x
        for i in range(self.n_scales):
            out.append(ScaleDiscriminator(dtype=self.dtype, name=f"msd{i}")(h))
            if i != self.n_scales - 1:
                h = _avg_pool_1d(h)
        for p in self.periods:
            out.append(PeriodDiscriminator(p, dtype=self.dtype, name=f"mpd{p}")(x))
        return out
