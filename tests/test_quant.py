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


def test_int8_resblock_stack_accuracy(rng_np):
    """int8-MXU resblock chain (ops/quant.py) tracks the f32 chain closely
    on realistically-scaled activations."""
    from pix2pixhdaudiosr_tpu.models.layers import ResnetBlock
    from pix2pixhdaudiosr_tpu.ops.quant import int8_resblock_stack

    B, H, W, C = 2, 8, 8, 32
    x = jnp.asarray(rng_np.standard_normal((B, H, W, C)).astype(np.float32))

    def mkpair():
        k = jnp.asarray(rng_np.standard_normal((3, 3, C, C)).astype(np.float32) * .08)
        b = jnp.asarray(rng_np.standard_normal((C,)).astype(np.float32) * .05)
        return (k, b)

    blocks = [(mkpair(), mkpair()) for _ in range(3)]

    # f32 oracle via the real modules, params injected to match
    import flax.core
    ref = x
    for (k1, b1), (k2, b2) in blocks:
        blk = ResnetBlock(C)
        params = {"params": {
            "ConvIN_0": {"Conv_0": {"kernel": k1, "bias": b1}},
            "ConvIN_1": {"Conv_0": {"kernel": k2, "bias": b2}},
        }}
        ref = blk.apply(flax.core.freeze(params), ref)

    got = np.asarray(int8_resblock_stack(x, blocks), np.float32)
    ref = np.asarray(ref, np.float32)
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.995, corr
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
    assert rel < 0.2, rel  # int8 step error, bounded


def test_generator_int8_trunk_tree_and_fidelity(rng_np):
    """int8_trunk generator: identical param tree, close output."""
    from pix2pixhdaudiosr_tpu.models.generator import GlobalGenerator

    kw = dict(input_nc=2, output_nc=2, ngf=8, n_downsampling=2, n_blocks=2,
              dtype=jnp.float32)
    g0 = GlobalGenerator(**kw)
    g1 = GlobalGenerator(**kw, int8_trunk=True)
    x = jnp.asarray(rng_np.standard_normal((2, 32, 32, 2)).astype(np.float32))
    p0 = g0.init(jax.random.PRNGKey(0), x)
    p1 = g1.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(p0) == jax.tree.structure(p1)
    assert jax.tree.all(jax.tree.map(lambda a, b: bool((a == b).all()), p0, p1))
    y0 = np.asarray(g0.apply(p0, x), np.float32)
    y1 = np.asarray(g1.apply(p0, x), np.float32)
    corr = np.corrcoef(y0.ravel(), y1.ravel())[0, 1]
    assert corr > 0.99, corr
