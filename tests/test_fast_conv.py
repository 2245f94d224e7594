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


class TestImplicitReflectPad:
    """conv_reflect_same (zero-padded conv + thin border corrections) must
    equal the materialized reflect-pad conv exactly; it is the default for
    every reflect conv so both forward and grads are pinned here."""

    @pytest.mark.parametrize("k,H,W,ci,co", [(3, 16, 24, 5, 7),
                                             (7, 64, 32, 2, 6),
                                             (7, 12, 8, 3, 2),
                                             (3, 8, 8, 4, 4)])
    def test_function_matches_materialized_pad(self, rng_np, k, H, W, ci, co):
        from pix2pixhdaudiosr_tpu.models.layers import (conv_reflect_same,
                                                        reflect_pad)
        r = k // 2
        x = jnp.asarray(rng_np.standard_normal((2, H, W, ci))
                        .astype(np.float32))
        w = jnp.asarray((rng_np.standard_normal((k, k, ci, co)) * 0.1)
                        .astype(np.float32))
        b = jnp.asarray(rng_np.standard_normal(co).astype(np.float32))
        want = jax.lax.conv_general_dilated(
            reflect_pad(x, r), w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        got = jax.jit(conv_reflect_same)(x, w, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5)

    def test_convin_implicit_vs_padded(self, rng_np):
        from pix2pixhdaudiosr_tpu.models.layers import ConvIN
        # B*H*W=4096 > 4*k^2*co=1960: the default heuristic picks implicit
        x = jnp.asarray(rng_np.standard_normal((4, 32, 32, 6))
                        .astype(np.float32))
        m_new = ConvIN(10, 7, reflect=3, dtype=jnp.float32, impl="implicit")
        m_old = ConvIN(10, 7, reflect=3, dtype=jnp.float32, impl="padded")
        params = m_new.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(
                    m_old.init(jax.random.PRNGKey(0), x)))
        np.testing.assert_allclose(np.asarray(m_new.apply(params, x)),
                                   np.asarray(m_old.apply(params, x)),
                                   atol=1e-5)

    def test_function_grads_match(self, rng_np):
        """Pure-conv grads (no InstanceNorm in the way): tight. Verified
        exact to 1e-16 relative in f64."""
        from pix2pixhdaudiosr_tpu.models.layers import (conv_reflect_same,
                                                        reflect_pad)
        x = jnp.asarray(rng_np.standard_normal((1, 16, 16, 8))
                        .astype(np.float32))
        w = jnp.asarray((rng_np.standard_normal((3, 3, 8, 8)) * 0.1)
                        .astype(np.float32))
        b = jnp.asarray(rng_np.standard_normal(8).astype(np.float32))

        def f_impl(w_, b_, x_):
            return jnp.sum(jnp.square(conv_reflect_same(x_, w_, b_)))

        def f_pad(w_, b_, x_):
            y = jax.lax.conv_general_dilated(
                reflect_pad(x_, 1), w_, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b_
            return jnp.sum(jnp.square(y))

        g1 = jax.grad(f_impl, argnums=(0, 1, 2))(w, b, x)
        g2 = jax.grad(f_pad, argnums=(0, 1, 2))(w, b, x)
        for a, bb in zip(g1, g2):
            scale = float(jnp.max(jnp.abs(bb))) + 1e-8
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(bb) / scale, atol=2e-6)

    def test_grads_match_padded(self, rng_np):
        from pix2pixhdaudiosr_tpu.models.layers import ResnetBlock
        # B*H*W=1024 > 4*k^2*co=288 so the block's convs take the implicit
        # path under the default heuristic
        x = jnp.asarray(rng_np.standard_normal((1, 32, 32, 8))
                        .astype(np.float32))
        m = ResnetBlock(8, dtype=jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)

        def loss(p, xx):
            return jnp.sum(jnp.square(m.apply(p, xx)))

        g_new, gx_new = jax.grad(loss, argnums=(0, 1))(params, x)
        # reroute through the padded path by monkeypatch-free construction:
        from pix2pixhdaudiosr_tpu.models import layers as L

        class PaddedBlock(L.nn.Module):
            dim: int

            @L.nn.compact
            def __call__(self, xx):
                h = L.ConvIN(self.dim, 3, reflect=1, act="relu",
                             dtype=jnp.float32, impl="padded")(xx)
                h = L.ConvIN(self.dim, 3, reflect=1, act="none",
                             dtype=jnp.float32, impl="padded")(h)
                return xx + h

        m2 = PaddedBlock(8)

        def loss2(p, xx):
            return jnp.sum(jnp.square(m2.apply(p, xx)))

        g_old, gx_old = jax.grad(loss2, argnums=(0, 1))(params, x)
        # InstanceNorm's rsqrt amplifies f32 roundoff through the backward
        # pass (~1e-3 here); the conv reformulation itself is exact — see
        # test_function_grads_match (and 1e-16 relative in f64).
        np.testing.assert_allclose(np.asarray(gx_new), np.asarray(gx_old),
                                   atol=5e-3, rtol=5e-3)
        for a, b in zip(jax.tree.leaves(g_new), jax.tree.leaves(g_old)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3, rtol=5e-3)
