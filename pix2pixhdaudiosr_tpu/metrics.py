"""Evaluation metrics: MSE, SNR, LSD (+ optional segmental SNR).

Parity: reference util/util.py:132-184 compute_matrics — sr renormalized to
hr mean/std, SNR in dB for both sr and lr against hr, LSD from log10 power
STFT at 2x the model's n_fft/hop/win with a kbd window.

Deliberate improvement over the reference: SSNR and PESQ are commented out
there (pysepm, util/util.py:152-175) and its eval.csv snr_seg/pesq columns
are always 0. Here `compute_metrics` fills the two SSNR slots with the real
`segmental_snr` (sr and lr against hr, computed on the same renormalized sr
the other metrics use) so eval.csv carries a measured value; PESQ stays 0
(see PARITY.md). Column order and count are unchanged.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .ops.audio import spectrogram_power
from .ops.window import kbdwin


def renormalize(hr: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Match x to hr mean/std (reference util/util.py:138-139)."""
    x = (x - jnp.mean(x, axis=-1, keepdims=True)) / jnp.std(
        x, axis=-1, keepdims=True)
    return x * jnp.std(hr, axis=-1, keepdims=True) + jnp.mean(
        hr, axis=-1, keepdims=True)


def lsd(hr: jnp.ndarray, x: jnp.ndarray, n_fft: int, hop_length: int,
        win_length: int, center: bool = True) -> float:
    """Log-spectral distance of x vs hr (no renormalization — callers that
    want the reference's behavior pass renormalize(hr, x)): log10 power STFT
    at 2x n_fft/hop/win with a kbd window (reference util/util.py:141-151)."""
    window = kbdwin(2 * win_length)
    a = jnp.log10(spectrogram_power(hr, 2 * n_fft, 2 * hop_length,
                                    2 * win_length, window, center=center)
                  + 1e-6)
    b = jnp.log10(spectrogram_power(x, 2 * n_fft, 2 * hop_length,
                                    2 * win_length, window, center=center)
                  + 1e-6)
    return float(jnp.mean(jnp.sqrt(jnp.mean((a - b) ** 2, axis=-2))))


def compute_metrics(hr_audio: jnp.ndarray, lr_audio: jnp.ndarray,
                    sr_audio: jnp.ndarray, n_fft: int, hop_length: int,
                    win_length: int, center: bool = True
                    ) -> Tuple[float, float, float, float, float, float, float]:
    """Returns (mse, snr_sr, snr_lr, ssnr_sr, ssnr_lr, 0, lsd) — reference
    shape (util/util.py:184) with the two dead SSNR slots filled by the
    working `segmental_snr` (the pesq slot stays 0)."""
    hr = hr_audio.astype(jnp.float32)
    lr = lr_audio.astype(jnp.float32)
    sr = renormalize(hr, sr_audio.astype(jnp.float32))

    mse = jnp.mean((sr - hr) ** 2)
    snr_sr = jnp.mean(10 * jnp.log10(jnp.sum(hr ** 2, axis=-1)
                                     / jnp.sum((sr - hr) ** 2, axis=-1)))
    snr_lr = jnp.mean(10 * jnp.log10(jnp.sum(hr ** 2, axis=-1)
                                     / jnp.sum((lr - hr) ** 2, axis=-1)))

    lsd_sr = lsd(hr, sr, n_fft, hop_length, win_length, center)
    ssnr_sr = segmental_snr(hr, sr)
    ssnr_lr = segmental_snr(hr, lr)
    return (float(mse), float(snr_sr), float(snr_lr), ssnr_sr, ssnr_lr,
            0.0, lsd_sr)


def segmental_snr(hr_audio, sr_audio, frame_length: int = 1536,
                  hop: int = 768, min_db: float = -10.0,
                  max_db: float = 35.0, active_db: float = -40.0) -> float:
    """Classic frame-wise segmental SNR in dB (the quantity the reference's
    disabled pysepm SNRseg would compute; reference util/util.py:147-149).

    Frames of ~32 ms (1536 samples @ 48 kHz), per-frame
    10*log10(sum(hr^2)/sum((sr-hr)^2)) clamped to [min_db, max_db], averaged
    over active frames (reference energy above `active_db` dBFS) so silence
    does not dominate. Pure numpy, host-side."""
    hr = np.asarray(hr_audio, np.float32).reshape(-1)
    sr = np.asarray(sr_audio, np.float32).reshape(-1)
    n = min(hr.size, sr.size)
    hr, sr = hr[:n], sr[:n]
    if n < frame_length:
        return 0.0
    starts = np.arange(0, n - frame_length + 1, hop)
    idx = starts[:, None] + np.arange(frame_length)[None]
    hf, sf = hr[idx], sr[idx]
    sig = np.sum(hf * hf, axis=1)
    err = np.sum((sf - hf) ** 2, axis=1)
    peak = max(np.max(np.abs(hr)), 1e-9)
    active = 10 * np.log10(sig / (frame_length * peak * peak) + 1e-12) > active_db
    if not active.any():
        return 0.0
    snr = 10 * np.log10((sig + 1e-12) / (err + 1e-12))
    return float(np.mean(np.clip(snr[active], min_db, max_db)))
