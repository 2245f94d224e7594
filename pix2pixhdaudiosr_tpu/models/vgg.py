"""VGG19 feature extractor + perceptual loss.

Parity: reference models/networks.py:112-124 (VGGLoss) and :386-416 (Vgg19
sliced at relu1_1/relu2_1/relu3_1/relu4_1/relu5_1). The reference disables
this loss for every audio recipe (--no_vgg_loss; the call site is commented
out, reference models/pix2pixHD_model.py:400-403) — it exists for the
upstream image path. Provided here for API completeness: the Flax VGG19
matches torchvision's feature layout, initialises randomly (no torchvision
weights in this environment), and `load_torch_weights` can ingest a
torchvision state_dict if one is available on disk.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax.numpy as jnp

# torchvision vgg19.features conv layout per slice (conv counts per stage)
_CFG = ((64, 64), (128, 128), (256, 256, 256, 256),
        (512, 512, 512, 512), (512, 512, 512, 512))
# slice boundaries (reference models/networks.py:395-404): outputs are taken
# after relu1_1, relu2_1, relu3_1, relu4_1, relu5_1 — i.e. after the 1st,
# 3rd, 5th, 9th, and 13th conv in torchvision's features order
_SLICE_AFTER_CONV = (1, 3, 5, 9, 13)


class Vgg19Features(nn.Module):
    """Returns [relu1_1, relu2_1, relu3_1, relu4_1, relu5_1] like the
    reference's Vgg19.forward."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        outs = []
        conv_count = 0
        h = x
        for stage, widths in enumerate(_CFG):
            if stage > 0:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            for i, wdt in enumerate(widths):
                h = nn.Conv(wdt, (3, 3), padding=1, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"conv{stage + 1}_{i + 1}")(h)
                h = nn.relu(h)
                conv_count += 1
                if conv_count in _SLICE_AFTER_CONV:
                    outs.append(h)
                    if len(outs) == len(_SLICE_AFTER_CONV):
                        return outs
        return outs


class VGGLoss:
    """Weighted L1 over VGG19 slices (reference models/networks.py:112-124)."""

    WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)

    def __init__(self, params: Any, dtype=jnp.float32):
        self.vgg = Vgg19Features(dtype=dtype)
        self.params = params

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        import jax
        fx = self.vgg.apply(self.params, x)
        fy = self.vgg.apply(self.params, jax.lax.stop_gradient(y))
        loss = 0.0
        for w, a, b in zip(self.WEIGHTS, fx, fy):
            loss = loss + w * jnp.mean(jnp.abs(a.astype(jnp.float32)
                                               - b.astype(jnp.float32)))
        return loss


def load_torch_weights(params, state_dict_path: str):
    """Merge a torchvision vgg19 state_dict (.npz of numpy arrays keyed
    'features.<i>.weight/bias') into the Flax param tree. Optional utility —
    the base image carries no pretrained weights."""
    import numpy as np
    raw = np.load(state_dict_path)
    # torchvision features indices of convs in order
    conv_indices = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
    names = [f"conv{s + 1}_{i + 1}" for s, ws in enumerate(_CFG)
             for i, _ in enumerate(ws)]
    out = dict(params)
    p = dict(out["params"])
    for idx, name in zip(conv_indices, names):
        if name not in p:
            continue
        w = raw[f"features.{idx}.weight"]  # [O, I, H, W] torch
        b = raw[f"features.{idx}.bias"]
        leaf = dict(p[name])
        leaf["kernel"] = np.transpose(w, (2, 3, 1, 0))  # -> HWIO
        leaf["bias"] = b
        p[name] = leaf
    out["params"] = p
    return out
