"""Int8 weight quantization: roundtrip bounds, tree quantization, generator
output fidelity, Pallas stochastic quantizer (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pix2pixhdaudiosr_tpu.config import Config
from pix2pixhdaudiosr_tpu.ops.quant import (dequantize_params, quantize_leaf,
                                            dequantize_leaf, quantize_params,
                                            quantized_size_bytes)
from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem


def test_leaf_roundtrip(rng_np):
    w = jnp.asarray((rng_np.standard_normal((3, 3, 16, 8)) * 0.05)
                    .astype(np.float32))
    q, s = quantize_leaf(w)
    assert q.dtype == jnp.int8 and s.shape == (1, 1, 1, 8)
    back = dequantize_leaf(q, s, jnp.float32)
    err = np.max(np.abs(np.asarray(back) - np.asarray(w)))
    # max error <= half a quantization step per channel
    step = np.asarray(s).max()
    assert err <= step * 0.51


def test_tree_quantization_and_size(rng_np):
    cfg = Config(net_g="global", ngf=8, n_downsample_global=2,
                 n_blocks_global=1, input_nc=2, output_nc=2, label_nc=0,
                 explicit_encoding=True, compute_dtype="float32")
    system = Pix2PixHDSystem(cfg)
    params = system.netG.init(jax.random.PRNGKey(0),
                              jnp.zeros(system.spectro_shape(1), jnp.float32))
    qtree, scales = quantize_params(params)
    f32_bytes = sum(x.size * 4 for x in jax.tree.leaves(params))
    q_bytes = quantized_size_bytes(qtree)
    assert q_bytes < f32_bytes * 0.3  # kernels dominate -> ~4x smaller

    deq = dequantize_params(qtree, scales, jnp.float32)
    spec = jnp.asarray(np.random.default_rng(0)
                       .standard_normal((1, 64, 64, 2)).astype(np.float32))
    y_full = np.asarray(system.netG.apply(params, spec))
    y_q = np.asarray(system.netG.apply(deq, spec))
    # high fidelity through the whole net
    corr = np.corrcoef(y_full.ravel(), y_q.ravel())[0, 1]
    assert corr > 0.99, corr


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="pltpu PRNG has no interpreter support; "
                           "verified on hardware (see BASELINE.md)")
def test_pallas_stochastic_quantizer(rng_np):
    import pix2pixhdaudiosr_tpu.ops.quant as Q
    x = jnp.asarray((rng_np.standard_normal((64, 128)) * 0.1).astype(np.float32))
    q, s = Q.stochastic_quantize_2d(x, seed=7)
    assert q.dtype == jnp.int8 and s.shape == (1, 128)
    back = np.asarray(q, np.float32) * np.asarray(s)
    err = np.abs(back - np.asarray(x))
    assert err.max() <= np.asarray(s).max() * 1.01  # within one step
