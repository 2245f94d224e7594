"""Less-traveled reference paths: phase-encoding modes, mask None, BCE GAN,
encoder generator, is_lr_input test dataset, dct2d/idct_n aliases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pix2pixhdaudiosr_tpu.config import Config
from pix2pixhdaudiosr_tpu.data import AudioTestDataset, write_wav
from pix2pixhdaudiosr_tpu.ops.encoding import CodecConfig, SpectroCodec

SEG = 32512


@pytest.mark.parametrize("mode", ["uni_dist", "norm_dist", "norm_dist2", "scale"])
def test_phase_encoding_modes(rng_np, mode):
    """reference models/pix2pixHD_model.py:179-192 (non-explicit only)."""
    codec = SpectroCodec(CodecConfig(explicit_encoding=False,
                                     phase_encoding_mode=mode))
    audio = jnp.asarray(rng_np.standard_normal((1, SEG)).astype(np.float32) * 0.1)
    spec, pha, _ = codec.to_spectro(audio, rng=jax.random.PRNGKey(0), mask=False)
    p = np.asarray(pha)
    assert np.all(np.isfinite(p))
    if mode == "scale":
        assert set(np.unique(np.round(np.abs(p), 5))) <= {0.0, 0.5}
    else:
        assert np.abs(p).max() <= 10  # randomized magnitude, sign preserved
        # sign structure preserved where nonzero
        raw_sign = np.sign(p)
        assert set(np.unique(raw_sign)) <= {-1.0, 0.0, 1.0}


def test_mask_mode_none_zero_fill(rng_np):
    """mask_mode None fills the band with zeros
    (reference models/pix2pixHD_model.py:220-221)."""
    codec = SpectroCodec(CodecConfig(mask_mode=None))
    audio = jnp.asarray(rng_np.standard_normal((1, SEG)).astype(np.float32) * 0.1)
    spec, _, _ = codec.to_spectro(audio, rng=jax.random.PRNGKey(0), mask=True)
    band = np.asarray(spec[:, 512 - int(512 * (1 - 1 / 6.0)):])
    np.testing.assert_array_equal(band, 0)


@pytest.mark.slow
def test_bce_gan_step(rng_np):
    """--no_lsgan: sigmoid discriminator outputs + BCE
    (reference models/networks.py:77-80, :363-364)."""
    from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem
    from pix2pixhdaudiosr_tpu.trainer import init_state, make_train_step
    cfg = Config(net_g="global", ngf=4, n_downsample_global=2,
                 n_blocks_global=1, ndf=4, n_layers_d=2, num_d=2, input_nc=2,
                 output_nc=2, label_nc=0, explicit_encoding=True,
                 mask_mode="mode2", no_lsgan=True, compute_dtype="float32")
    system = Pix2PixHDSystem(cfg)
    state, opt_g, opt_d = init_state(system, jax.random.PRNGKey(0), batch=2)
    step = make_train_step(system, opt_g, opt_d, donate=False)
    batch = {"label": (rng_np.standard_normal((2, SEG)) * 0.1).astype(np.float32),
             "image": (rng_np.standard_normal((2, SEG)) * 0.1).astype(np.float32)}
    _, losses, _ = step(state, batch, jax.random.PRNGKey(1), None,
                        fix_global=False, with_visuals=False)
    assert all(np.isfinite(float(v)) for v in losses.values())


def test_encoder_generator_builds():
    from pix2pixhdaudiosr_tpu.models import build_generator
    enc = build_generator("encoder", 2, 3, 8, 2, 0, 0, 0)
    x = jnp.zeros((1, 64, 32, 2))
    params = enc.init(jax.random.PRNGKey(0), x)
    y = enc.apply(params, x)
    assert y.shape == (1, 64, 32, 3)
    inst = jnp.zeros((1, 64, 32, 1), jnp.int32)
    y2 = enc.apply(params, x, inst)
    assert y2.shape == (1, 64, 32, 3)


def test_is_lr_input_dataset(tmp_path, rng_np):
    """--is_lr_input skips the down-resample (reference
    data/audio_dataset.py:108-112)."""
    x = (0.3 * np.sin(2 * np.pi * 400 * np.arange(8000) / 8000)).astype(np.float32)
    p = str(tmp_path / "lr.wav")
    write_wav(p, x, 8000)
    ds = AudioTestDataset(p, 8000, 48000, SEG, is_lr_input=True)
    assert ds.in_sampling_rate == 8000
    # upsampled straight to 48 kHz: 6x the samples
    assert abs(len(ds.lr_audio) - 48000) <= 6
    ds2 = AudioTestDataset(p, 8000, 48000, SEG, is_lr_input=False)
    assert len(ds2.lr_audio) == len(ds.lr_audio)  # 8k->8k->48k same length


def test_unknown_generator_raises():
    from pix2pixhdaudiosr_tpu.models import build_generator
    with pytest.raises(ValueError):
        build_generator("nope", 2, 2, 8, 2, 1, 1, 1)


@pytest.mark.slow
def test_instance_features_training_path(rng_np):
    """--instance_feat: netE encodes hr features (lr_pha as instance map),
    concatenated onto the G input; the G optimizer trains E too (reference
    models/pix2pixHD_model.py:338-347, :128-131)."""
    from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem
    from pix2pixhdaudiosr_tpu.trainer import init_state, make_train_step
    cfg = Config(instance_feat=True, feat_num=3, nef=4, n_downsample_e=2,
                 net_g="global", ngf=4, n_downsample_global=2,
                 n_blocks_global=1, ndf=4, n_layers_d=2, num_d=2, input_nc=2,
                 output_nc=2, label_nc=0, explicit_encoding=True,
                 mask_mode="mode2", compute_dtype="float32")
    system = Pix2PixHDSystem(cfg)
    assert system.netE is not None
    assert cfg.netg_input_nc == 2 + 3
    state, opt_g, opt_d = init_state(system, jax.random.PRNGKey(0), batch=2)
    assert "E" in state.params
    step = make_train_step(system, opt_g, opt_d, donate=False)
    batch = {"label": (rng_np.standard_normal((2, cfg.segment_length)) * 0.1).astype(np.float32),
             "image": (rng_np.standard_normal((2, cfg.segment_length)) * 0.1).astype(np.float32)}
    new_state, losses, _ = step(state, batch, jax.random.PRNGKey(1), None,
                                fix_global=False, with_visuals=False)
    assert all(np.isfinite(float(v)) for v in losses.values())
    e0 = jax.tree.leaves(state.params["E"])[0]
    e1 = jax.tree.leaves(new_state.params["E"])[0]
    assert not np.allclose(np.asarray(e0), np.asarray(e1))  # E trained by opt_G


def test_sample_features_from_clusters(tmp_path, rng_np):
    """Inference-time style sampling from k-means clusters (reference
    models/pix2pixHD_model.py:457-476)."""
    from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem
    cfg = Config(instance_feat=True, feat_num=3, nef=4,
                 net_g="global", ngf=4, n_downsample_global=2,
                 n_blocks_global=1, input_nc=2, output_nc=2, label_nc=0,
                 explicit_encoding=True, compute_dtype="float32")
    system = Pix2PixHDSystem(cfg)
    clusters = {0: rng_np.standard_normal((4, 3)),
                5: rng_np.standard_normal((2, 3))}
    p = str(tmp_path / "features_clustered_010.npy")
    np.save(p, clusters, allow_pickle=True)
    inst = np.zeros((1, 8, 8), np.int64)
    inst[0, 4:, 4:] = 5
    feat = system.sample_features(inst, p)
    assert feat.shape == (1, 8, 8, 3)
    # each region is constant (one center broadcast over the region)
    assert np.allclose(feat[0, :4, :4], feat[0, 0, 0])
    assert np.allclose(feat[0, 5:, 5:], feat[0, 7, 7])
    assert not np.allclose(feat[0, 0, 0], feat[0, 7, 7])
