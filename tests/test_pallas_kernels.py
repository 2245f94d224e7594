"""Pallas fused MDCT/IMDCT kernels vs the jnp reference path (interpret mode
on CPU; the real-hardware check runs in benchmarks/ on the TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from pix2pixhdaudiosr_tpu.ops import framing
from pix2pixhdaudiosr_tpu.ops.dct import dct2_basis, dct3_basis
from pix2pixhdaudiosr_tpu.ops.mdct import IMDCT2, MDCT2
from pix2pixhdaudiosr_tpu.ops.window import kbdwin

SEG = 32512


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # run pallas kernels in interpreter mode on CPU
    import pix2pixhdaudiosr_tpu.ops.conv_pallas as C
    import pix2pixhdaudiosr_tpu.ops.dct_pallas as K
    orig = pl.pallas_call

    def interp_call(*a, **kw):
        kw.setdefault("interpret", True)
        return orig(*a, **kw)

    monkeypatch.setattr(K.pl, "pallas_call", interp_call)
    monkeypatch.setattr(C.pl, "pallas_call", interp_call)
    yield


def test_fused_mdct2_matches_reference(rng_np):
    from pix2pixhdaudiosr_tpu.ops.dct_pallas import fused_mdct2
    win = kbdwin(512)
    mdct = MDCT2(n_fft=512, hop_length=256, win_length=512, window=win,
                 center=True)
    x = jnp.asarray(rng_np.standard_normal((2, SEG)).astype(np.float32) * 0.3)
    want = np.asarray(mdct(x))
    padded = framing.pad_signal(x, 256, center=True)
    basis = win[:, None] * dct2_basis(512) / 512
    got = np.asarray(fused_mdct2(padded, jnp.asarray(basis, jnp.float32),
                                 hop=256, win=512, t_tile=128))
    assert got.shape == want.shape == (2, 128, 512)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fused_imdct2_matches_reference(rng_np):
    from pix2pixhdaudiosr_tpu.ops.dct_pallas import fused_imdct2
    win = kbdwin(512)
    imdct = IMDCT2(n_fft=512, hop_length=256, win_length=512, window=win,
                   center=True, out_length=SEG)
    spec = jnp.asarray(rng_np.standard_normal((2, 128, 512)).astype(np.float32))
    want = np.asarray(imdct(spec))
    basis = dct3_basis(512)[:, :512] * win[None, :] / 2.0
    raw = np.asarray(fused_imdct2(spec, jnp.asarray(basis, jnp.float32),
                                  hop=256, win=512))
    got = raw[:, 256:-256][:, :SEG]  # center crop + out_length
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fused_roundtrip(rng_np):
    from pix2pixhdaudiosr_tpu.ops.dct_pallas import fused_imdct2, fused_mdct2
    win = kbdwin(512)
    x = jnp.asarray(rng_np.standard_normal((1, SEG)).astype(np.float32) * 0.3)
    padded = framing.pad_signal(x, 256, center=True)
    fwd_basis = win[:, None] * dct2_basis(512) / 512
    inv_basis = dct3_basis(512) * win[None, :] / 2.0
    spec = fused_mdct2(padded, jnp.asarray(fwd_basis, jnp.float32), 256, 512)
    rec = fused_imdct2(spec, jnp.asarray(inv_basis, jnp.float32), 256, 512)
    rec = np.asarray(rec)[:, 256:-256][:, :SEG]
    err = np.mean((rec - np.asarray(x)) ** 2)
    assert err < 1e-10, err


def test_conv3x3_pallas_matches_lax(rng_np):
    from pix2pixhdaudiosr_tpu.ops.conv_pallas import conv3x3_pallas
    x = jnp.asarray(rng_np.standard_normal((2, 66, 34, 16)).astype(np.float32))
    w = jnp.asarray((rng_np.standard_normal((3, 3, 16, 16)) * 0.1)
                    .astype(np.float32))
    got = conv3x3_pallas(x, w, th=32)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pallas_backend_falls_back_for_non_dividing_codec(rng_np):
    """backend="pallas" with win % hop != 0 (the fused kernels tile hop
    blocks) silently takes the XLA gcd-cell path and matches backend="xla"
    bit-for-bit — the gate added with the round-4 framing generalization."""
    win = kbdwin(512)
    x = jnp.asarray(rng_np.standard_normal((2, 32000)).astype(np.float32) * 0.3)
    kw = dict(n_fft=512, hop_length=160, win_length=512, window=win,
              center=True)
    want_spec = MDCT2(backend="xla", **kw)(x)
    got_spec = MDCT2(backend="pallas", **kw)(x)
    np.testing.assert_array_equal(np.asarray(got_spec), np.asarray(want_spec))
    want = IMDCT2(backend="xla", **kw)(want_spec)
    got = IMDCT2(backend="pallas", **kw)(want_spec)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
