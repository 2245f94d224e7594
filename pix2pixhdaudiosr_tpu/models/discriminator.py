"""PatchGAN discriminators (Flax/NHWC).

Parity: NLayerDiscriminator / MultiscaleDiscriminator with intermediate
feature capture for the feature-matching loss
(reference models/networks.py:292-383). Param oracle: D @ defaults
(netD_input_nc 4, ndf 64, n_layers 3, num_D 2) = 5,531,522
(reference train_script.sh comment).
"""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvIN, avg_pool_3s2


class NLayerDiscriminator(nn.Module):
    """4x4 stride-2 conv stack (reference models/networks.py:334-383).
    Returns the per-layer outputs list when get_interm_feat (the reference's
    getIntermFeat result[1:], i.e. each layer's activation, final score last);
    otherwise a one-element list with the score map."""
    input_nc: int
    ndf: int = 64
    n_layers: int = 3
    use_sigmoid: bool = False
    get_interm_feat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        feats = []
        h = ConvIN(self.ndf, 4, stride=2, pad=2, norm=False, act="leaky",
                   dtype=self.dtype)(x)
        feats.append(h)
        nf = self.ndf
        for _ in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = ConvIN(nf, 4, stride=2, pad=2, act="leaky", dtype=self.dtype)(h)
            feats.append(h)
        nf = min(nf * 2, 512)
        h = ConvIN(nf, 4, stride=1, pad=2, act="leaky", dtype=self.dtype)(h)
        feats.append(h)
        h = ConvIN(1, 4, stride=1, pad=2, norm=False, act="none", dtype=self.dtype)(h)
        if self.use_sigmoid:
            h = nn.sigmoid(h)
        feats.append(h)
        return feats if self.get_interm_feat else [feats[-1]]


class MultiscaleDiscriminator(nn.Module):
    """num_D PatchGANs over an avg-pooled pyramid (reference
    models/networks.py:292-331). Output: list (coarsest scale first, matching
    the reference's num_D-1-i indexing) of per-scale feature lists."""
    input_nc: int
    ndf: int = 64
    n_layers: int = 3
    use_sigmoid: bool = False
    num_d: int = 3
    get_interm_feat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[List[jnp.ndarray]]:
        results = []
        inp = x
        for i in range(self.num_d):
            d = NLayerDiscriminator(self.input_nc, self.ndf, self.n_layers,
                                    self.use_sigmoid, self.get_interm_feat,
                                    dtype=self.dtype,
                                    name=f"scale{self.num_d - 1 - i}")
            results.append(d(inp))
            if i != self.num_d - 1:
                inp = avg_pool_3s2(inp)
        return results


def build_discriminator(input_nc: int, ndf: int, n_layers_d: int,
                        use_sigmoid: bool, num_d: int, get_interm_feat: bool,
                        dtype=jnp.float32) -> MultiscaleDiscriminator:
    """define_D parity (reference models/networks.py:46-54)."""
    return MultiscaleDiscriminator(input_nc, ndf, n_layers_d, use_sigmoid,
                                   num_d, get_interm_feat, dtype=dtype)
