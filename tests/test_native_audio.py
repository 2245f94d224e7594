"""Native C++ pipeline vs numpy oracles (skipped if g++ is unavailable)."""

import numpy as np
import pytest

from pix2pixhdaudiosr_tpu.ops.audio import resample_np
from pix2pixhdaudiosr_tpu.runtime import native_audio

pytestmark = pytest.mark.skipif(not native_audio.available(),
                                reason="native lib not built (no g++)")


def test_native_resample_matches_numpy(rng_np):
    x = (rng_np.standard_normal(48000) * 0.3).astype(np.float32)
    got = native_audio.resample(x, 48000, 8000)
    want = resample_np(x, 48000, 8000)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_native_resample_up(rng_np):
    x = (rng_np.standard_normal(8000) * 0.3).astype(np.float32)
    got = native_audio.resample(x, 8000, 48000)
    want = resample_np(x, 8000, 48000)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_make_pair_batch_matches_per_item(rng_np):
    b, n, seg = 4, 40000, 32512
    wavs = (rng_np.standard_normal((b, n)) * 0.3).astype(np.float32)
    lens = np.full(b, n, np.int64)
    hr, lr = native_audio.make_pair_batch(wavs, lens, 48000, 8000, 48000, seg)
    assert hr.shape == lr.shape == (b, seg)
    for i in range(b):
        want_hr = wavs[i][:seg]
        np.testing.assert_allclose(hr[i][: len(want_hr)], want_hr, atol=1e-6)
        lo = resample_np(wavs[i], 48000, 8000)
        want_lr = resample_np(lo, 8000, 48000)[:seg]
        np.testing.assert_allclose(lr[i][: len(want_lr)], want_lr, atol=1e-5)


def test_native_decode_pcm16(rng_np):
    x = rng_np.uniform(-0.9, 0.9, 1000).astype(np.float32)
    pcm = np.clip(x * 32768, -32768, 32767).astype("<i2")
    stereo = np.stack([pcm, pcm * 0], -1).tobytes()
    out = native_audio.decode_pcm_first_channel(stereo, fmt=1, bits=16, nch=2)
    np.testing.assert_allclose(out, pcm.astype(np.float32) / 32768, atol=1e-7)
