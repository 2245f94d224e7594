"""Spectrogram codec parity tests: dB encode/decode inverse pair, explicit
two-channel encoding roundtrip, mask geometry, and the eval-path inverse
scale (reference models/pix2pixHD_model.py:142-258, util/util.py:104-130)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pix2pixhdaudiosr_tpu.ops.audio import amplitude_to_db, db_to_amplitude
from pix2pixhdaudiosr_tpu.ops.encoding import CodecConfig, SpectroCodec

SEG = 32512


def make_codec(**kw):
    return SpectroCodec(CodecConfig(**kw))


def test_db_inverse_pair(rng_np):
    """amplitude_to_DB(x,20,amin,1) and DB_to_amplitude(x,10,0.5) are exact
    inverses above the amin floor (reference metrics_test.ipynb cell 11)."""
    x = jnp.asarray(np.abs(rng_np.standard_normal(1000)).astype(np.float32) + 1e-3)
    rec = db_to_amplitude(amplitude_to_db(x, 20.0, 1e-7, 1.0), 10.0, 0.5)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), rtol=1e-4)


def test_to_spectro_shapes_and_range(rng_np):
    codec = make_codec()
    audio = jnp.asarray(rng_np.standard_normal((2, SEG)).astype(np.float32) * 0.1)
    spec, pha, norm = codec.to_spectro(audio, rng=jax.random.PRNGKey(0), mask=False)
    assert spec.shape == (2, 512, 128, 2)
    assert pha.shape == (2, 512, 128)
    s = np.asarray(spec)
    assert s.min() >= 0.0 and s.max() <= 1.0  # normalized to [0,1]
    assert set(np.unique(np.asarray(pha))) <= {-1.0, 0.0, 1.0}


def test_mask_geometry(rng_np):
    """mask fills the TOP (1 - 1/up_ratio) of the freq axis with noise
    (reference models/pix2pixHD_model.py:196-226); low band is untouched."""
    codec = make_codec(up_ratio=6.0, mask_mode="mode2")
    audio = jnp.asarray(rng_np.standard_normal((1, SEG)).astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(1)
    spec_nomask, _, _ = codec.to_spectro(audio, rng=key, mask=False)
    spec_mask, _, _ = codec.to_spectro(audio, rng=key, mask=True)
    mask_size = int(512 * (1 - 1 / 6.0))
    keep = 512 - mask_size
    np.testing.assert_array_equal(np.asarray(spec_mask[:, :keep]),
                                  np.asarray(spec_nomask[:, :keep]))
    # masked band is mode2 noise in [0, 1], uncorrelated with the original
    band = np.asarray(spec_mask[:, keep:])
    assert 0.0 <= band.min() and band.max() <= 1.0
    assert abs(band.mean() - 0.5) < 0.05


def test_mask_mode1_double_peak(rng_np):
    codec = make_codec(mask_mode="mode1")
    audio = jnp.asarray(rng_np.standard_normal((1, SEG)).astype(np.float32) * 0.1)
    spec, _, _ = codec.to_spectro(audio, rng=jax.random.PRNGKey(2), mask=True)
    band = np.asarray(spec[:, 512 - int(512 * (1 - 1 / 6.0)):])
    assert band.min() < -0.5 and band.max() > 0.5  # in [-1,1], double peak


def test_explicit_roundtrip_imdct_eval(rng_np):
    """Perfect generation -> imdct_eval returns original/2 (reference
    util/util.py:127 divides by 2; IMDCT2 is the exact inverse)."""
    codec = make_codec()
    audio = jnp.asarray(rng_np.standard_normal((2, SEG)).astype(np.float32) * 0.3)
    spec, pha, norm = codec.to_spectro(audio, rng=jax.random.PRNGKey(0), mask=False)
    rec = codec.imdct_eval(spec, pha, norm)
    assert rec.shape == (2, SEG)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(audio) / 2,
                               atol=2e-4)


def test_to_audio_scale(rng_np):
    """to_audio divides by (2 alpha - 1) and scales by sqrt(up_ratio-1)
    (reference models/pix2pixHD_model.py:237, :249)."""
    codec = make_codec(alpha=0.6, up_ratio=6.0)
    audio = jnp.asarray(rng_np.standard_normal((1, SEG)).astype(np.float32) * 0.3)
    spec, pha, norm = codec.to_spectro(audio, rng=jax.random.PRNGKey(0), mask=False)
    out = codec.to_audio(spec, norm)
    # (ch0-ch1)/(2a-1) reproduces s exactly, so out = sqrt(5) * audio
    want = np.sqrt(5.0) * np.asarray(audio)[..., : out.shape[-1]]
    np.testing.assert_allclose(np.asarray(out)[..., :SEG - 512],
                               want[..., :SEG - 512], atol=2e-3)


def test_to_frames_shape(rng_np):
    codec = make_codec()
    audio = jnp.asarray(rng_np.standard_normal((1, SEG)).astype(np.float32) * 0.3)
    spec, pha, norm = codec.to_spectro(audio, rng=jax.random.PRNGKey(0), mask=False)
    frames = codec.to_frames(spec, norm)
    assert frames.shape == (1, 128, 512)


def test_implicit_encoding_single_channel(rng_np):
    codec = make_codec(explicit_encoding=False, mask_mode="mode0")
    audio = jnp.asarray(rng_np.standard_normal((1, SEG)).astype(np.float32) * 0.1)
    spec, pha, norm = codec.to_spectro(audio, rng=jax.random.PRNGKey(0), mask=True)
    assert spec.shape == (1, 512, 128, 1)


@pytest.mark.parametrize("lr_rate,up", [(24000, 2.0), (16000, 3.0),
                                        (12000, 4.0), (8000, 6.0)])
def test_up_ratio_ladder(rng_np, lr_rate, up):
    """The reference's 2x/4x/3x/6x recipes (train_script.sh): mask size and
    phase cutoff scale with up_ratio."""
    codec = make_codec(up_ratio=up)
    audio = jnp.asarray(rng_np.standard_normal((1, SEG)).astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(0)
    nomask, _, _ = codec.to_spectro(audio, rng=key, mask=False)
    masked, pha, norm = codec.to_spectro(audio, rng=key, mask=True)
    keep = 512 - int(512 * (1 - 1 / up))
    np.testing.assert_array_equal(np.asarray(masked[:, :keep]),
                                  np.asarray(nomask[:, :keep]))
    assert not np.allclose(np.asarray(masked[:, keep:]),
                           np.asarray(nomask[:, keep:]))
    # inverse splices the true phase below 512/up
    rec = codec.imdct_eval(nomask, pha, norm)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(audio) / 2, atol=2e-4)


def test_bad_segment_length_raises():
    from pix2pixhdaudiosr_tpu.config import Config
    from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem
    cfg = Config(net_g="global", ngf=4, n_downsample_global=4,
                 segment_length=25500, input_nc=2, output_nc=2, label_nc=0,
                 explicit_encoding=True)
    system = Pix2PixHDSystem(cfg)
    with pytest.raises(ValueError, match="divisible by the generator stride"):
        system.spectro_shape(1)
