"""MDCT/IMDCT numerics: framing vs torch.unfold, perfect reconstruction,
README MDCT4 round-trip parity (reference README.md:95-119)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pix2pixhdaudiosr_tpu.ops import framing
from pix2pixhdaudiosr_tpu.ops.mdct import (IMDCT2, IMDCT4, MDCT2, MDCT4,
                                           imdct4_np, mdct4_np)
from pix2pixhdaudiosr_tpu.ops.window import kbdwin

SEG = 32512  # reference options/audio_config.py FRAME_LENGTH


# hop | win (every reference config) AND non-dividing codecs (512/160 etc.),
# which the round-4 gcd-cell framing supports like torch.unfold does
FRAMINGS = [(512, 256), (512, 512), (1024, 256), (512, 160), (512, 384),
            (400, 256), (512, 96)]


@pytest.mark.parametrize("win,hop", FRAMINGS)
def test_frame_matches_torch_unfold(rng_np, win, hop):
    torch = pytest.importorskip("torch")
    x = rng_np.standard_normal((2, 3000)).astype(np.float32)
    padded = framing.pad_signal(jnp.asarray(x), hop, center=True)
    got = np.asarray(framing.frame(padded, win, hop))
    want = torch.from_numpy(np.asarray(padded)).unfold(-1, win, hop).numpy()
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("win,hop", FRAMINGS)
def test_overlap_add_matches_torch_fold(rng_np, win, hop):
    torch = pytest.importorskip("torch")
    frames = rng_np.standard_normal((2, 128, win)).astype(np.float32)
    got = np.asarray(framing.overlap_add(jnp.asarray(frames), hop))
    t = torch.from_numpy(frames).transpose(-1, -2)
    out_len = (128 - 1) * hop + win
    want = torch.nn.functional.fold(t, kernel_size=(1, win), stride=(1, hop),
                                    output_size=(1, out_len))
    np.testing.assert_allclose(got, want.squeeze(1).squeeze(1).numpy(), atol=1e-6)


def test_mdct2_shape_and_frames():
    """The production config yields exactly BINS=128 frames per 32512-sample
    segment (reference options/audio_config.py:6-12)."""
    win = kbdwin(512)
    mdct = MDCT2(n_fft=512, hop_length=256, win_length=512, window=win, center=True)
    x = jnp.zeros((4, SEG))
    assert mdct(x).shape == (4, 128, 512)


def test_mdct2_imdct2_roundtrip(rng_np):
    """Production path reconstruction at f32 (BASELINE target <= 1e-6)."""
    win = kbdwin(512)
    mdct = MDCT2(n_fft=512, hop_length=256, win_length=512, window=win, center=True)
    imdct = IMDCT2(n_fft=512, hop_length=256, win_length=512, window=win,
                   center=True, out_length=SEG)
    x = rng_np.standard_normal((2, SEG)).astype(np.float32) * 0.3
    rec = np.asarray(imdct(mdct(jnp.asarray(x))))
    assert rec.shape == (2, SEG)
    err = np.mean((rec - x) ** 2)
    assert err < 1e-12, err


def test_mdct2_return_ola(rng_np):
    win = kbdwin(512)
    mdct = MDCT2(n_fft=512, hop_length=256, win_length=512, window=win, center=True)
    x = jnp.asarray(rng_np.standard_normal((2, SEG)).astype(np.float32))
    spec, frames = mdct(x, return_ola=True)
    assert spec.shape == (2, 128, 512) and frames.shape == (2, 128, 512)
    padded = framing.pad_signal(x, 256, True)
    want = np.asarray(framing.frame(padded, 512, 256)) * win
    np.testing.assert_allclose(np.asarray(frames), want, atol=1e-6)


def test_mdct4_readme_roundtrip_f64():
    """README recipe (reference README.md:95-119): n_fft=1024, hop=512, kbd
    window, center, 130816-sample segment -> [257, 512] and reconstruction MSE
    at float64 ~ 1e-31."""
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(130816) * 0.2).astype(np.float64)
    win = kbdwin(1024)
    spec = mdct4_np(x[None], 1024, 512, win, center=True)
    assert spec.shape == (1, 257, 512)
    rec = imdct4_np(spec, 1024, 512, win, center=True, out_length=130816)
    mse = np.mean((rec[0] - x) ** 2)
    assert mse < 1e-24, mse  # f64 roundoff; reference README quotes 4.89e-32 on a quieter segment


def test_mdct4_imdct4_roundtrip_f32(rng_np):
    win = kbdwin(1024)
    mdct = MDCT4(n_fft=1024, hop_length=512, win_length=1024, window=win, center=True)
    imdct = IMDCT4(n_fft=1024, hop_length=512, win_length=1024, window=win,
                   center=True, out_length=8192)
    x = rng_np.standard_normal((2, 8192)).astype(np.float32) * 0.3
    rec = np.asarray(imdct(mdct(jnp.asarray(x))))
    err = np.mean((rec - x) ** 2)
    assert err < 1e-12, err


def test_mdct4_jax_matches_np_oracle(rng_np):
    win = kbdwin(1024)
    x = rng_np.standard_normal((2, 8192)).astype(np.float32)
    mdct = MDCT4(n_fft=1024, hop_length=512, win_length=1024, window=win, center=True)
    got = np.asarray(mdct(jnp.asarray(x)))
    want = mdct4_np(x, 1024, 512, win, center=True)
    # f32 matmul vs f64 oracle; outputs reach ~65 in magnitude
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_win_less_than_nfft(rng_np):
    """Zero-padding to n_fft when win < n_fft (reference models/mdct.py:398-400)."""
    win = kbdwin(256)
    mdct = MDCT2(n_fft=512, hop_length=128, win_length=256, window=win, center=True)
    imdct = IMDCT2(n_fft=512, hop_length=128, win_length=256, window=win,
                   center=True, out_length=4096)
    x = rng_np.standard_normal((1, 4096)).astype(np.float32)
    spec = mdct(jnp.asarray(x))
    assert spec.shape[-1] == 512
    rec = np.asarray(imdct(spec))
    assert np.mean((rec - x) ** 2) < 1e-10


@pytest.mark.parametrize("win,hop", FRAMINGS)
def test_imdct2_out_length_contract(rng_np, win, hop):
    """IMDCT2(out_length=L) returns EXACTLY L samples for every codec —
    zero-padding the tail for non-dividing (win % hop != 0) configs, where
    the forward's end-pad rounds past the last frame and the raw inverse
    comes up short. Keeps chunked decode segments on their exact time base
    (review finding, round 4)."""
    w = kbdwin(win) if win % 2 == 0 else np.ones(win, np.float32)
    n_fft = win
    seg = hop * 40  # an arbitrary hop-aligned segment length
    mdct = MDCT2(n_fft=n_fft, hop_length=hop, win_length=win, window=w,
                 center=True)
    imdct = IMDCT2(n_fft=n_fft, hop_length=hop, win_length=win, window=w,
                   center=True, out_length=seg)
    x = jnp.asarray(rng_np.standard_normal((2, seg)).astype(np.float32))
    out = imdct(mdct(x))
    assert out.shape == (2, seg), (win, hop, out.shape)
    if win == 2 * hop:  # princen-bradley configs reconstruct perfectly
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)
