"""Fused Pallas enhancer-resblock chain (ops/enhancer_pallas.py).

Parity oracle: the XLA formulation in models/layers.py (ResnetBlock =
reflect-padded 3x3 ConvIN x2 + residual; reference models/networks.py:
214-253). Off-TPU the kernel runs in interpret mode automatically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pix2pixhdaudiosr_tpu.models.generator import LocalEnhancer
from pix2pixhdaudiosr_tpu.models.layers import reflect_pad, instance_norm
from pix2pixhdaudiosr_tpu.ops import enhancer_pallas as ep


def _ref_conv(x, k, b):
    xp = reflect_pad(x, 1)
    y = jax.lax.conv_general_dilated(
        xp.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(jnp.bfloat16)


def _ref_chain(x, blocks):
    cur = x
    for (k1, b1), (k2, b2) in blocks:
        h = jax.nn.relu(instance_norm(_ref_conv(cur, k1, b1)))
        h = instance_norm(_ref_conv(h, k2, b2))
        cur = cur + h
    return cur


def _mk_blocks(rng, c, n):
    out = []
    for _ in range(n):
        pair = []
        for _ in range(2):
            k = jnp.asarray(rng.standard_normal((3, 3, c, c)).astype(np.float32) * .1)
            b = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * .1)
            pair.append((k, b))
        out.append(tuple(pair))
    return out


@pytest.mark.parametrize("shape,nblocks", [
    ((128, 8, 8, 16), 2),   # even H/W
    ((128, 5, 7, 8), 1),    # odd spatial dims exercise the reflect maps
])
def test_chain_matches_xla(shape, nblocks):
    rng = np.random.default_rng(0)
    b, h, w, c = shape
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32) * .5,
                    jnp.bfloat16)
    blocks = _mk_blocks(rng, c, nblocks)
    want = np.asarray(_ref_chain(x, blocks), np.float32)
    got = np.asarray(ep.fused_resblock_chain(x, blocks), np.float32)
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 0.03


def test_fused_section_matches_xla():
    """conv_s2_raw + fused_enhancer_section == ConvIN(s2)+add+blocks."""
    rng = np.random.default_rng(2)
    B, H, W, C = 128, 8, 8, 16
    x = jnp.asarray(rng.standard_normal((B, 2 * H, 2 * W, C // 2))
                    .astype(np.float32) * .5, jnp.bfloat16)
    out = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32) * .5,
                      jnp.bfloat16)
    kd = jnp.asarray(rng.standard_normal((3, 3, C // 2, C)).astype(np.float32) * .1)
    bd = jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * .1)
    blocks = _mk_blocks(rng, C, 2)

    d_raw = ep.conv_s2_raw(x, kd, bd)
    got = np.asarray(ep.fused_enhancer_section(d_raw, out, blocks), np.float32)

    down = jax.nn.relu(instance_norm(d_raw))
    want = np.asarray(_ref_chain(down + out, blocks), np.float32)
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 0.03


def test_supports_conditions():
    ok = (128, 8, 8, 16)
    assert ep.supports(ok, jnp.bfloat16)
    assert not ep.supports(ok, jnp.float32)            # bf16 only
    assert not ep.supports((64, 8, 8, 16), jnp.bfloat16)   # batch % 128
    assert not ep.supports((128, 8, 8, 12), jnp.bfloat16)  # C % 8
    assert not ep.supports((128, 1, 8, 16), jnp.bfloat16)  # H >= 2
    assert not ep.supports((128, 8, 2, 16), jnp.bfloat16)  # W >= 3


def test_local_enhancer_fused_param_tree_and_parity():
    kw = dict(input_nc=2, output_nc=2, ngf=8, n_downsample_global=1,
              n_blocks_global=1, n_local_enhancers=1, n_blocks_local=2,
              dtype=jnp.bfloat16)
    g0 = LocalEnhancer(**kw, fused_enh_blocks=False)
    g1 = LocalEnhancer(**kw, fused_enh_blocks=True)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((128, 16, 16, 2)),
        jnp.float32).astype(jnp.bfloat16)
    p0 = g0.init(jax.random.PRNGKey(0), x)
    p1 = g1.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(p0) == jax.tree.structure(p1)
    assert jax.tree.all(jax.tree.map(lambda a, b: bool((a == b).all()), p0, p1))
    y0 = np.asarray(g0.apply(p0, x), np.float32)
    y1 = np.asarray(g1.apply(p0, x), np.float32)
    scale = max(np.abs(y0).max(), 1e-3)
    assert np.abs(y0 - y1).max() / scale < 0.05


def test_fallback_on_unsupported_batch():
    """Batch not a multiple of 128 -> identical code path (exact equality)."""
    kw = dict(input_nc=2, output_nc=2, ngf=8, n_downsample_global=1,
              n_blocks_global=1, n_local_enhancers=1, n_blocks_local=1,
              dtype=jnp.bfloat16)
    g0 = LocalEnhancer(**kw, fused_enh_blocks=False)
    g1 = LocalEnhancer(**kw, fused_enh_blocks=True)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 16, 16, 2)),
                    jnp.float32).astype(jnp.bfloat16)
    p = g0.init(jax.random.PRNGKey(0), x)
    y0 = np.asarray(g0.apply(p, x), np.float32)
    y1 = np.asarray(g1.apply(p, x), np.float32)
    np.testing.assert_array_equal(y0, y1)
