"""Generators: GlobalGenerator, LocalEnhancer, Encoder (Flax/NHWC).

Parity: reference models/networks.py:129-290. Architecture-parity oracle:
parameter counts must match the reference ladder exactly (reference
train_script.sh comments), e.g. LocalEnhancer G3L2 @ ngf 48, io 2ch
= 156,050,690 params — pinned in tests/test_networks.py.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import enhancer_pallas
from .layers import (ConvIN, ConvTransposeIN, ResnetBlock, _ChildConvParams,
                     avg_pool_3s2)


class GlobalTrunk(nn.Module):
    """GlobalGenerator without its final (ReflectionPad, Conv, Tanh) triple —
    the trunk reused by LocalEnhancer (reference models/networks.py:137-139).
    Output has ngf channels at full resolution."""
    input_nc: int
    ngf: int = 64
    n_downsampling: int = 4
    n_blocks: int = 9
    dtype: jnp.dtype = jnp.float32
    cp_axis: Optional[str] = None
    int8_blocks: bool = False  # int8-MXU resblock convs (ops/quant.py;
    #                            inference serving mode for --data_type 8)
    deconv_impl: Optional[str] = None  # "torch": imported-checkpoint compat

    @nn.compact
    def __call__(self, x):
        cp = self.cp_axis
        x = ConvIN(self.ngf, 7, reflect=3, dtype=self.dtype, cp_axis=cp)(x)
        for i in range(self.n_downsampling):
            x = ConvIN(self.ngf * 2 ** (i + 1), 3, stride=2, pad=1,
                       dtype=self.dtype, cp_axis=cp)(x)
        mult = 2 ** self.n_downsampling
        rblocks = [ResnetBlock(self.ngf * mult, dtype=self.dtype, cp_axis=cp)
                   for _ in range(self.n_blocks)]
        if self.int8_blocks and cp is None and self.n_blocks > 0:
            from ..ops.quant import int8_resblock_stack
            pairs = [blk(x, params_only=True) for blk in rblocks]
            x = int8_resblock_stack(x, pairs)
        else:
            for blk in rblocks:
                x = blk(x)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            x = ConvTransposeIN(self.ngf * mult // 2, dtype=self.dtype,
                                cp_axis=cp, impl=self.deconv_impl)(x)
        return x


class GlobalGenerator(nn.Module):
    """c7s1-ngf, strided downsamples, resnet trunk, mirrored deconvs,
    c7s1-out + Tanh (reference models/networks.py:183-211)."""
    input_nc: int
    output_nc: int
    ngf: int = 64
    n_downsampling: int = 4
    n_blocks: int = 9
    dtype: jnp.dtype = jnp.float32
    cp_axis: Optional[str] = None
    fast_conv: bool = True
    int8_trunk: bool = False
    deconv_impl: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        x = GlobalTrunk(self.input_nc, self.ngf, self.n_downsampling,
                        self.n_blocks, dtype=self.dtype,
                        cp_axis=self.cp_axis,
                        int8_blocks=self.int8_trunk,
                        deconv_impl=self.deconv_impl)(x)
        # the tiny-output-channel final conv is MXU-lane-bound under the
        # plain lowering; Toeplitz time-tiling halves it (BASELINE.md)
        impl = "toeplitz" if self.fast_conv else None
        return ConvIN(self.output_nc, 7, reflect=3, norm=False, act="tanh",
                      dtype=self.dtype, cp_axis=self.cp_axis, impl=impl)(x)


class LocalEnhancer(nn.Module):
    """Coarse global trunk at ngf*2^n_local on a downsampled pyramid plus
    per-level enhancer branches fused by addition
    (reference models/networks.py:129-181)."""
    input_nc: int
    output_nc: int
    ngf: int = 32
    n_downsample_global: int = 4
    n_blocks_global: int = 9
    n_local_enhancers: int = 1
    n_blocks_local: int = 3
    dtype: jnp.dtype = jnp.float32
    cp_axis: Optional[str] = None
    fast_conv: bool = True
    fused_enh_blocks: bool = False  # Pallas fused resblock chain (inference)
    int8_trunk: bool = False        # int8-MXU trunk resblocks (inference)
    deconv_impl: Optional[str] = None  # "torch": imported-checkpoint compat

    @nn.compact
    def __call__(self, x):
        cp = self.cp_axis
        nle = self.n_local_enhancers
        pyramid = [x]
        for _ in range(nle):
            pyramid.append(avg_pool_3s2(pyramid[-1], cp_axis=cp))

        ngf_global = self.ngf * (2 ** nle)
        out = GlobalTrunk(self.input_nc, ngf_global, self.n_downsample_global,
                          self.n_blocks_global, dtype=self.dtype, cp_axis=cp,
                          int8_blocks=self.int8_trunk,
                          deconv_impl=self.deconv_impl,
                          name="global")(pyramid[-1])

        for n in range(1, nle + 1):
            ngf_n = self.ngf * (2 ** (nle - n))
            inp = pyramid[nle - n]
            bi, hi, wi, _ = inp.shape
            down = ConvIN(ngf_n, 7, reflect=3, dtype=self.dtype, cp_axis=cp,
                          name=f"enh{n}_down0")(inp)
            blocks = [ResnetBlock(ngf_n * 2, dtype=self.dtype, cp_axis=cp,
                                  name=f"enh{n}_block{i}")
                      for i in range(self.n_blocks_local)]
            fused = (self.fused_enh_blocks and cp is None
                     and self.n_blocks_local > 0
                     and jnp.dtype(self.dtype) == jnp.bfloat16
                     and enhancer_pallas.supports(
                         (bi, (hi + 1) // 2, (wi + 1) // 2, ngf_n * 2),
                         self.dtype))
            if fused:
                # lane-bound 3x3 convs + InstanceNorm + entry/residual adds
                # fused in Pallas (ops/enhancer_pallas.py; ~2x the in-graph
                # TF/s of the XLA lowering on v5e); param tree identical,
                # numerics to bf16 roundoff. Inference-only (no vjp).
                k, b = _ChildConvParams((3, 3, down.shape[-1], ngf_n * 2),
                                        name=f"enh{n}_down1")()
                d_raw = enhancer_pallas.conv_s2_raw(
                    down.astype(self.dtype), k, b)
                pairs = [blk(d_raw, params_only=True) for blk in blocks]
                h = enhancer_pallas.fused_enhancer_section(d_raw, out, pairs)
                h = ConvTransposeIN(ngf_n, dtype=self.dtype, cp_axis=cp,
                                    impl=self.deconv_impl,
                                    name=f"enh{n}_up")(h)
            else:
                down = ConvIN(ngf_n * 2, 3, stride=2, pad=1, dtype=self.dtype,
                              cp_axis=cp, name=f"enh{n}_down1")(down)
                h = down + out
                for blk in blocks:
                    h = blk(h)
                h = ConvTransposeIN(ngf_n, dtype=self.dtype, cp_axis=cp,
                                    impl=self.deconv_impl,
                                    name=f"enh{n}_up")(h)
            if n == nle:
                impl = "toeplitz" if self.fast_conv else None
                h = ConvIN(self.output_nc, 7, reflect=3, norm=False, act="tanh",
                           dtype=self.dtype, cp_axis=cp, impl=impl,
                           name=f"enh{n}_final")(h)
            out = h
        return out


class Encoder(nn.Module):
    """Feature encoder with instance-wise average pooling (reference
    models/networks.py:255-290; effectively deprecated for audio). The
    instance pooling here averages features over regions sharing an instance
    id via one-hot matmuls (jit-friendly), assuming ids in [0, max_ids)."""
    input_nc: int
    output_nc: int
    ngf: int = 32
    n_downsampling: int = 4
    max_ids: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inst: Optional[jnp.ndarray] = None):
        h = ConvIN(self.ngf, 7, reflect=3, dtype=self.dtype)(x)
        for i in range(self.n_downsampling):
            h = ConvIN(self.ngf * 2 ** (i + 1), 3, stride=2, pad=1, dtype=self.dtype)(h)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            h = ConvTransposeIN(self.ngf * mult // 2, dtype=self.dtype)(h)
        h = ConvIN(self.output_nc, 7, reflect=3, norm=False, act="tanh",
                   dtype=self.dtype)(h)
        if inst is None:
            return h
        # instance-wise average pooling: mean of h over each instance region
        ids = inst.astype(jnp.int32)[..., 0]                       # [B,H,W]
        oh = jax.nn.one_hot(ids, self.max_ids, dtype=h.dtype)      # [B,H,W,K]
        sums = jnp.einsum("bhwk,bhwc->bkc", oh, h)
        counts = jnp.maximum(jnp.einsum("bhwk->bk", oh), 1.0)[..., None]
        means = sums / counts                                       # [B,K,C]
        return jnp.einsum("bhwk,bkc->bhwc", oh, means)


def build_generator(net_g: str, input_nc: int, output_nc: int, ngf: int,
                    n_downsample_global: int, n_blocks_global: int,
                    n_local_enhancers: int, n_blocks_local: int,
                    dtype=jnp.float32, cp_axis=None,
                    fast_conv: bool = True,
                    fused_enh_blocks: bool = False,
                    int8_trunk: bool = False,
                    deconv_impl=None) -> nn.Module:
    """define_G parity (reference models/networks.py:27-44)."""
    if net_g == "global":
        return GlobalGenerator(input_nc, output_nc, ngf, n_downsample_global,
                               n_blocks_global, dtype=dtype, cp_axis=cp_axis,
                               fast_conv=fast_conv, int8_trunk=int8_trunk,
                               deconv_impl=deconv_impl)
    if net_g == "local":
        return LocalEnhancer(input_nc, output_nc, ngf, n_downsample_global,
                             n_blocks_global, n_local_enhancers,
                             n_blocks_local, dtype=dtype, cp_axis=cp_axis,
                             fast_conv=fast_conv,
                             fused_enh_blocks=fused_enh_blocks,
                             int8_trunk=int8_trunk,
                             deconv_impl=deconv_impl)
    if net_g == "encoder":
        return Encoder(input_nc, output_nc, ngf, n_downsample_global, dtype=dtype)
    raise ValueError(f"generator not implemented: {net_g}")
