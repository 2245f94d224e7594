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


class TestToeplitzInModel:
    """fast_conv=True swaps the final convs to conv_toeplitz_t with the SAME
    param tree; outputs must match the plain lowering to f32 roundoff and
    gradients must flow (it is the training path too)."""

    def _mk(self, fast):
        import jax.numpy as jnp
        from pix2pixhdaudiosr_tpu.models.generator import LocalEnhancer
        return LocalEnhancer(2, 2, ngf=8, n_downsample_global=2,
                             n_blocks_global=1, n_local_enhancers=1,
                             n_blocks_local=1, dtype=jnp.float32,
                             fast_conv=fast)

    def test_exact_vs_plain(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (2, 64, 32, 2)).astype(np.float32))
        fastm, plainm = self._mk(True), self._mk(False)
        params = fastm.init(jax.random.PRNGKey(0), x)
        # identical param trees -> same params apply to both
        chex = jax.tree_util.tree_structure(params)
        assert chex == jax.tree_util.tree_structure(
            plainm.init(jax.random.PRNGKey(0), x))
        yf = jax.jit(fastm.apply)(params, x)
        yp = jax.jit(plainm.apply)(params, x)
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yp), atol=3e-6)

    def test_grads_match(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        x = jnp.asarray(np.random.default_rng(1).standard_normal(
            (1, 64, 32, 2)).astype(np.float32))
        fastm, plainm = self._mk(True), self._mk(False)
        params = fastm.init(jax.random.PRNGKey(0), x)
        gf = jax.grad(lambda p: jnp.sum(jnp.square(fastm.apply(p, x))))(params)
        gp = jax.grad(lambda p: jnp.sum(jnp.square(plainm.apply(p, x))))(params)
        for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=2e-4)

    def test_fallback_on_indivisible_frames(self):
        """W not divisible by the tile -> ConvIN silently uses the plain
        conv (same params, identical output)."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from pix2pixhdaudiosr_tpu.models.layers import ConvIN
        x = jnp.asarray(np.random.default_rng(2).standard_normal(
            (1, 64, 20, 48)).astype(np.float32))  # 20 % 16 != 0
        fastm = ConvIN(2, 7, reflect=3, norm=False, act="tanh",
                       dtype=jnp.float32, impl="toeplitz")
        plainm = ConvIN(2, 7, reflect=3, norm=False, act="tanh",
                        dtype=jnp.float32)
        params = fastm.init(jax.random.PRNGKey(0), x)
        yf = fastm.apply(params, x)
        yp = plainm.apply(params, x)
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yp), atol=1e-6)
        # divisible width DOES take the toeplitz path and still matches
        x2 = jnp.asarray(np.random.default_rng(3).standard_normal(
            (1, 64, 32, 48)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(fastm.apply(params, x2)),
                                   np.asarray(plainm.apply(params, x2)),
                                   atol=3e-6)
