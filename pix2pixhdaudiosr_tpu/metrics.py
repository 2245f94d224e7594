"""Evaluation metrics: MSE, SNR, LSD.

Parity: reference util/util.py:132-184 compute_matrics — sr renormalized to
hr mean/std, SNR in dB for both sr and lr against hr, LSD from log10 power
STFT at 2x the model's n_fft/hop/win with a kbd window. SSNR/PESQ are
commented out in the reference and return 0 there; we return 0 likewise.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .ops.audio import spectrogram_power
from .ops.window import kbdwin


def compute_metrics(hr_audio: jnp.ndarray, lr_audio: jnp.ndarray,
                    sr_audio: jnp.ndarray, n_fft: int, hop_length: int,
                    win_length: int, center: bool = True
                    ) -> Tuple[float, float, float, float, float, float, float]:
    """Returns (mse, snr_sr, snr_lr, 0, 0, 0, lsd) like the reference."""
    hr = hr_audio.astype(jnp.float32)
    lr = lr_audio.astype(jnp.float32)
    sr = sr_audio.astype(jnp.float32)
    # Match sr to hr statistics (reference util/util.py:138-139)
    sr = (sr - jnp.mean(sr, axis=-1, keepdims=True)) / jnp.std(sr, axis=-1, keepdims=True)
    sr = sr * jnp.std(hr, axis=-1, keepdims=True) + jnp.mean(hr, axis=-1, keepdims=True)

    mse = jnp.mean((sr - hr) ** 2)
    snr_sr = jnp.mean(10 * jnp.log10(jnp.sum(hr ** 2, axis=-1)
                                     / jnp.sum((sr - hr) ** 2, axis=-1)))
    snr_lr = jnp.mean(10 * jnp.log10(jnp.sum(hr ** 2, axis=-1)
                                     / jnp.sum((lr - hr) ** 2, axis=-1)))

    window = kbdwin(2 * win_length)
    hr_stft = spectrogram_power(hr, 2 * n_fft, 2 * hop_length, 2 * win_length,
                                window, center=center)
    sr_stft = spectrogram_power(sr, 2 * n_fft, 2 * hop_length, 2 * win_length,
                                window, center=center)
    hr_log = jnp.log10(hr_stft + 1e-6)
    sr_log = jnp.log10(sr_stft + 1e-6)
    lsd = jnp.mean(jnp.sqrt(jnp.mean((hr_log - sr_log) ** 2, axis=-2)))
    return (float(mse), float(snr_sr), float(snr_lr), 0.0, 0.0, 0.0, float(lsd))
