"""s2d_conv experiment equals lax.conv exactly (see ops/fast_conv.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pix2pixhdaudiosr_tpu.ops.fast_conv import (depth_to_space, s2d_conv,
                                                space_to_depth)


@pytest.mark.parametrize("ci,co,k,s", [(48, 2, 7, 8), (2, 48, 7, 8),
                                       (16, 8, 3, 4)])
def test_s2d_conv_matches_lax(rng_np, ci, co, k, s):
    H = W = 32
    x = jnp.asarray(rng_np.standard_normal((2, H + k - 1, W + k - 1, ci))
                    .astype(np.float32))
    w = jnp.asarray((rng_np.standard_normal((k, k, ci, co)) * 0.1)
                    .astype(np.float32))
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = jax.jit(lambda a, b: s2d_conv(a, b, s=s))(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_space_depth_roundtrip(rng_np):
    x = jnp.asarray(rng_np.standard_normal((2, 16, 8, 3)).astype(np.float32))
    y = depth_to_space(space_to_depth(x, 4), 4)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
