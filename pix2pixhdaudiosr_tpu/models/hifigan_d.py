"""HiFi-GAN multi-scale + multi-period time-domain discriminator (Flax).

The reference imports HiFiGANMultiScaleMultiPeriodDiscriminator from the
ParallelWaveGAN git submodule (reference models/pix2pixHD_model.py:61-63,
.gitmodules:1-3 — not vendored). This is a from-scratch Flax implementation of
the standard architecture (Kong et al. 2020, HiFi-GAN) with the
ParallelWaveGAN default hyperparameters: 3 scale discriminators over avg-pooled
waveforms (grouped 1-D convs, kernel 15/41/5/3) and period discriminators for
periods (2, 3, 5, 7, 11) (5x1 stride-3x1 2-D convs), leaky ReLU (slope 0.1).

Normalization follows the submodule's `follow_official_norm=True` default
(HiFi-GAN paper scheme): the raw-scale MSD uses SPECTRAL norm, the pooled
scales and every MPD use WEIGHT norm. Weight norm reparametrizes the kernel
as g * v / ||v|| per output channel (init g = ||v||, so initialization
matches a plain conv exactly); spectral norm divides the kernel by its top
singular value, estimated by a 3-step power iteration from a fixed start
(stateless — equivalent to torch's persistent-u buffer at convergence).

Input: waveform [B, T, 1]. Output: list over sub-discriminators of per-layer
feature lists (final score last), the same nested structure the GAN loss
consumes for the frequency-domain discriminators.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import conv_init


class NormConv(nn.Module):
    """Conv with optional weight/spectral normalization of the kernel.

    norm="weight": w = g * v / ||v||_per_out_channel (torch weight_norm dim=0
    on [out, in, k] == our [*k, in, out] reduced over all but the last axis).
    norm="spectral": w = v / sigma_max(v reshaped to [-1, out]), 3 power
    iterations from a deterministic start, gradients flow through v only via
    sigma = u^T W v' (u, v' stop-gradiented like torch's buffers).
    """
    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...] = None
    padding: Union[str, Tuple[Tuple[int, int], ...]] = "SAME"
    feature_group_count: int = 1
    norm: str = "weight"      # weight | spectral | none
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        nd = len(self.kernel_size)
        in_ch = x.shape[-1]
        kshape = (*self.kernel_size, in_ch // self.feature_group_count,
                  self.features)
        v = self.param("kernel", conv_init, kshape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        red = tuple(range(v.ndim - 1))
        if self.norm == "weight":
            # init g = ||v|| so the initial function equals the plain conv
            g = self.param(
                "g", lambda rng, _: jnp.sqrt(jnp.sum(v * v, axis=red)),
                (self.features,))
            w = v * (g * jax.lax.rsqrt(jnp.sum(v * v, axis=red) + 1e-12))
        elif self.norm == "spectral":
            m = v.reshape(-1, self.features)
            u = jnp.full((self.features,), 1.0 / jnp.sqrt(1.0 * self.features),
                         jnp.float32)
            for _ in range(3):
                vv = m @ u
                vv = vv * jax.lax.rsqrt(jnp.sum(vv * vv) + 1e-12)
                u = m.T @ vv
                u = u * jax.lax.rsqrt(jnp.sum(u * u) + 1e-12)
            u = jax.lax.stop_gradient(u)
            vv = jax.lax.stop_gradient(vv)
            sigma = jnp.einsum("i,io,o->", vv, m, u)
            w = v / sigma
        elif self.norm == "none":
            w = v
        else:
            raise ValueError(f"unknown norm {self.norm}")
        strides = self.strides or (1,) * nd
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape,
            ("NHC", "HIO", "NHC") if nd == 1 else ("NHWC", "HWIO", "NHWC"))
        # no explicit preferred_element_type: its f32 output makes the conv's
        # VJP emit mixed f32/bf16 gradient convs (TypeError under bf16
        # training); XLA accumulates in f32 internally either way, matching
        # flax nn.Conv(dtype=...) semantics
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype), strides, self.padding,
            dimension_numbers=dn,
            feature_group_count=self.feature_group_count)
        return y + bias.astype(y.dtype)


class ScaleDiscriminator(nn.Module):
    """One HiFi-GAN scale discriminator (Conv1d stack with groups)."""
    channels: Sequence[int] = (128, 128, 256, 512, 1024, 1024, 1024)
    kernel_sizes: Sequence[int] = (15, 41, 5, 3)
    groups: Sequence[int] = (1, 4, 16, 16, 16, 16, 1)
    strides: Sequence[int] = (1, 2, 2, 4, 4, 1, 1)
    norm: str = "weight"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        feats = []
        h = x
        ks = [self.kernel_sizes[0]] + [self.kernel_sizes[1]] * 5 + [self.kernel_sizes[2]]
        for i, (c, k, g, s) in enumerate(zip(self.channels, ks, self.groups,
                                             self.strides)):
            h = NormConv(c, (k,), strides=(s,), padding="SAME",
                         feature_group_count=g, norm=self.norm,
                         dtype=self.dtype)(h)
            h = nn.leaky_relu(h, 0.1)
            feats.append(h)
        h = NormConv(1, (self.kernel_sizes[3],), padding="SAME",
                     norm=self.norm, dtype=self.dtype)(h)
        feats.append(h)
        return feats


class PeriodDiscriminator(nn.Module):
    """One HiFi-GAN period discriminator: reshape [B,T,1] -> [B,T/p,p,1] and
    run (5,1) stride (3,1) convs."""
    period: int
    channels: Sequence[int] = (32, 128, 512, 1024)
    norm: str = "weight"
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
            h = NormConv(ch, (5, 1), strides=(3, 1), padding=((2, 2), (0, 0)),
                         norm=self.norm, dtype=self.dtype)(h)
            h = nn.leaky_relu(h, 0.1)
            feats.append(h)
        h = NormConv(1024, (5, 1), strides=(1, 1), padding=((2, 2), (0, 0)),
                     norm=self.norm, dtype=self.dtype)(h)
        h = nn.leaky_relu(h, 0.1)
        feats.append(h)
        h = NormConv(1, (3, 1), strides=(1, 1), padding=((1, 1), (0, 0)),
                     norm=self.norm, dtype=self.dtype)(h)
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
    """MSD (3 scales) + MPD (periods 2,3,5,7,11).

    follow_official_norm (the submodule default): raw-scale MSD is
    spectral-normed, pooled scales and all MPDs weight-normed."""
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    n_scales: int = 3
    follow_official_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[List[jnp.ndarray]]:
        out = []
        h = x
        for i in range(self.n_scales):
            norm = "spectral" if (self.follow_official_norm and i == 0) \
                else "weight"
            out.append(ScaleDiscriminator(norm=norm, dtype=self.dtype,
                                          name=f"msd{i}")(h))
            if i != self.n_scales - 1:
                h = _avg_pool_1d(h)
        for p in self.periods:
            out.append(PeriodDiscriminator(p, dtype=self.dtype,
                                           name=f"mpd{p}")(x))
        return out
