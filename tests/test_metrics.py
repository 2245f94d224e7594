"""Metric sanity mirroring reference test/metrics_test.ipynb cells 4-7:
resample-degraded audio scores worse than the reference signal; SNR/LSD of a
perfect reconstruction are ideal."""

import jax.numpy as jnp
import numpy as np
import pytest

from pix2pixhdaudiosr_tpu.metrics import compute_metrics
from pix2pixhdaudiosr_tpu.ops.audio import resample, resample_np


def _tone_mix(n, fs, freqs, rng):
    t = np.arange(n) / fs
    x = sum(a * np.sin(2 * np.pi * f * t) for f, a in freqs)
    return (x + 0.01 * rng.standard_normal(n)).astype(np.float32)


def test_perfect_sr_beats_lowpassed_lr(rng_np):
    fs = 48000
    hr = _tone_mix(32512, fs, [(400, 0.5), (3000, 0.3), (9000, 0.2)], rng_np)
    lr = resample_np(resample_np(hr, fs, 8000), 8000, fs)[: len(hr)]
    lr = np.pad(lr, (0, len(hr) - len(lr)))
    mse, snr_sr, snr_lr, *_, lsd = compute_metrics(
        jnp.asarray(hr), jnp.asarray(lr), jnp.asarray(hr),
        n_fft=512, hop_length=256, win_length=512)
    assert snr_sr > 100           # perfect reconstruction
    assert snr_lr < snr_sr
    assert lsd < 1e-3


def test_degraded_sr_scores_between(rng_np):
    fs = 48000
    hr = _tone_mix(32512, fs, [(400, 0.5), (3000, 0.3), (9000, 0.2)], rng_np)
    lr = resample_np(resample_np(hr, fs, 8000), 8000, fs)
    lr = np.pad(lr, (0, max(0, len(hr) - len(lr))))[: len(hr)]
    sr = 0.5 * hr + 0.5 * lr      # halfway reconstruction
    mse, snr_sr, snr_lr, ssnr_sr, ssnr_lr, pesq, lsd_sr = compute_metrics(
        jnp.asarray(hr), jnp.asarray(lr), jnp.asarray(sr),
        n_fft=512, hop_length=256, win_length=512)
    _, _, _, *_, lsd_lr = compute_metrics(
        jnp.asarray(hr), jnp.asarray(lr), jnp.asarray(lr),
        n_fft=512, hop_length=256, win_length=512)
    assert snr_sr > snr_lr
    assert lsd_sr < lsd_lr
    # the SSNR slots are real (reference returns 0 there — pysepm disabled)
    assert ssnr_sr != 0.0 and ssnr_lr != 0.0
    assert ssnr_sr > ssnr_lr
    assert pesq == 0.0


def test_resample_device_matches_host(rng_np):
    x = rng_np.standard_normal(9600).astype(np.float32)
    host = resample_np(x, 48000, 8000)
    dev = np.asarray(resample(jnp.asarray(x), 48000, 8000))
    assert host.shape == dev.shape == (1600,)
    np.testing.assert_allclose(dev, host, atol=1e-5)


def test_resample_preserves_tone(rng_np):
    fs, f0 = 48000, 440.0
    t = np.arange(48000) / fs
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    y = resample_np(x, fs, 8000)
    t8 = np.arange(len(y)) / 8000
    want = np.sin(2 * np.pi * f0 * t8)
    # interior only (filter edge effects)
    np.testing.assert_allclose(y[200:-200], want[200:-200], atol=2e-3)


def test_segmental_snr_properties(rng_np):
    from pix2pixhdaudiosr_tpu.metrics import segmental_snr
    t = np.arange(48000) / 48000
    hr = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    # identical signal clamps at the 35 dB ceiling
    assert segmental_snr(hr, hr) == pytest.approx(35.0)
    # mild noise scores high; heavy noise scores low; ordering holds
    mild = hr + 0.005 * rng_np.standard_normal(hr.size).astype(np.float32)
    heavy = hr + 0.5 * rng_np.standard_normal(hr.size).astype(np.float32)
    s_mild = segmental_snr(hr, mild)
    s_heavy = segmental_snr(hr, heavy)
    assert s_mild > 25 > s_heavy > -10
    # silence-padded signal: silent frames are excluded, score unchanged-ish
    hr_pad = np.concatenate([np.zeros(48000, np.float32), hr])
    mild_pad = np.concatenate([np.zeros(48000, np.float32), mild])
    assert segmental_snr(hr_pad, mild_pad) == pytest.approx(s_mild, abs=1.0)


def test_train_loop_empty_split_message(tmp_path, rng_np):
    """Fewer post-split files than one batch -> actionable SystemExit."""
    from pix2pixhdaudiosr_tpu.config import Config
    from pix2pixhdaudiosr_tpu import train_loop
    from pix2pixhdaudiosr_tpu.data import write_wav
    d = tmp_path / "wavs"
    d.mkdir()
    for i in range(3):
        write_wav(str(d / f"a{i}.wav"),
                  rng_np.standard_normal(40000).astype(np.float32) * 0.1, 48000)
    cfg = Config(dataroot=str(d), checkpoints_dir=str(tmp_path / "ck"),
                 name="t", batch_size=8, validation_split=0.0,
                 net_g="global", ngf=4, n_downsample_global=1,
                 n_blocks_global=1, input_nc=2, output_nc=2, label_nc=0,
                 no_instance=True, explicit_encoding=True, mask_mode="mode2",
                 compute_dtype="float32")
    with pytest.raises(SystemExit, match="no training batches"):
        train_loop.main(cfg=cfg)


def test_train_loop_divergence_guard(tmp_path, rng_np):
    """Non-finite losses -> 'diverged' checkpoint + actionable SystemExit."""
    from pix2pixhdaudiosr_tpu.config import Config
    from pix2pixhdaudiosr_tpu import train_loop
    from pix2pixhdaudiosr_tpu.data import write_wav
    d = tmp_path / "wavs"
    d.mkdir()
    for i in range(4):
        write_wav(str(d / f"a{i}.wav"),
                  rng_np.standard_normal(40000).astype(np.float32) * 0.1, 48000)
    cfg = Config(dataroot=str(d), checkpoints_dir=str(tmp_path / "ck"),
                 name="t", batch_size=2, validation_split=0.0,
                 net_g="global", ngf=4, ndf=4, n_layers_d=2, num_d=1,
                 n_downsample_global=1, n_blocks_global=1, input_nc=2,
                 output_nc=2, label_nc=0, no_instance=True,
                 explicit_encoding=True, mask_mode="mode2",
                 compute_dtype="float32", niter=2, niter_decay=0,
                 lr=1e18, print_freq=2, save_latest_freq=10**9,
                 display_freq=10**9, eval_freq=10**9)
    with pytest.raises(SystemExit, match="non-finite losses"):
        train_loop.main(cfg=cfg)
    assert (tmp_path / "ck" / "t" / "diverged_state").exists()


def test_train_loop_divergence_guard_print_disabled(tmp_path, rng_np):
    """--print_freq 0 must NOT disable the divergence guard: the check also
    runs before every 'latest' overwrite, so a NaN state cannot silently
    clobber the last good checkpoint (round-5 review finding)."""
    from pix2pixhdaudiosr_tpu.config import Config
    from pix2pixhdaudiosr_tpu import train_loop
    from pix2pixhdaudiosr_tpu.data import write_wav
    d = tmp_path / "wavs"
    d.mkdir()
    for i in range(4):
        write_wav(str(d / f"a{i}.wav"),
                  rng_np.standard_normal(40000).astype(np.float32) * 0.1, 48000)
    cfg = Config(dataroot=str(d), checkpoints_dir=str(tmp_path / "ck"),
                 name="t", batch_size=2, validation_split=0.0,
                 net_g="global", ngf=4, ndf=4, n_layers_d=2, num_d=1,
                 n_downsample_global=1, n_blocks_global=1, input_nc=2,
                 output_nc=2, label_nc=0, no_instance=True,
                 explicit_encoding=True, mask_mode="mode2",
                 compute_dtype="float32", niter=2, niter_decay=0,
                 lr=1e18, print_freq=0, save_latest_freq=2,
                 display_freq=10**9, eval_freq=10**9)
    with pytest.raises(SystemExit, match="non-finite losses"):
        train_loop.main(cfg=cfg)
    assert (tmp_path / "ck" / "t" / "diverged_state").exists()
