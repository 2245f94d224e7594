"""DCT family numerics vs scipy oracles (the reference validates dct_lee
against scipy.fft.dct in test/DCT_test.ipynb cells 1-2)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.fft

from pix2pixhdaudiosr_tpu.ops import dct as D


@pytest.mark.parametrize("N", [64, 128, 512])
def test_dct_2n_matches_scipy(rng_np, N):
    x = rng_np.standard_normal((4, N)).astype(np.float32)
    got = np.asarray(D.dct_2n(jnp.asarray(x)))
    want = scipy.fft.dct(x.astype(np.float64), type=2, axis=-1) / N
    np.testing.assert_allclose(got, want, atol=2e-6)


@pytest.mark.parametrize("N", [64, 512])
def test_idct_2n_matches_scipy_dct3(rng_np, N):
    x = rng_np.standard_normal((4, N)).astype(np.float32)
    got = np.asarray(D.idct_2n(jnp.asarray(x)))
    want = scipy.fft.dct(x.astype(np.float64), type=3, axis=-1)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_dct_idct_roundtrip_is_2x(rng_np):
    """idct_2n(dct_2n(x)) == 2x — the reason IMDCT2 divides by 2
    (reference models/mdct.py:437)."""
    x = rng_np.standard_normal((2, 512)).astype(np.float32)
    rt = np.asarray(D.idct_2n(D.dct_2n(jnp.asarray(x))))
    np.testing.assert_allclose(rt, 2 * x, atol=5e-6)


def test_rfft_path_matches_matmul_path(rng_np):
    x = rng_np.standard_normal((3, 256)).astype(np.float32)
    a = np.asarray(D.dct_2n(jnp.asarray(x)))
    b = np.asarray(D.dct_2n_rfft(jnp.asarray(x)))
    np.testing.assert_allclose(a, b, atol=2e-6)
    a = np.asarray(D.idct_2n(jnp.asarray(x)))
    b = np.asarray(D.idct_2n_rfft(jnp.asarray(x)))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_dct_n_scaling(rng_np):
    """Native-ext 'N' DCT is (1/2N)*DCT-II (reference dct/src/dct.h:66-89),
    i.e. exactly half of dct_2n."""
    x = rng_np.standard_normal((2, 128)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(D.dct_n(jnp.asarray(x))),
                               np.asarray(D.dct_2n(jnp.asarray(x))) / 2, atol=1e-7)


def test_dct2d_roundtrip(rng_np):
    x = rng_np.standard_normal((2, 64, 128)).astype(np.float32)
    y = D.idct2d(D.dct2d(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)
