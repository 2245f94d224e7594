"""Device-side audio utilities: dB conversion, STFT power spectrogram, and
polyphase sinc resampling.

Parity targets: torchaudio.functional.amplitude_to_DB / DB_to_amplitude as
used by the reference encode/decode (reference models/pix2pixHD_model.py:154,
:232), torchaudio.functional.spectrogram as used by the LSD metric (reference
util/util.py:178-182), and torchaudio.functional.resample (sinc_interp_hann,
lowpass_filter_width=6, rolloff=0.99) as used by the data pipeline (reference
data/audio_dataset.py:56-58).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .window import kbdwin


def amplitude_to_db(x: jnp.ndarray, multiplier: float = 20.0,
                    amin: float = 1e-7, db_multiplier: float = 1.0) -> jnp.ndarray:
    """torchaudio.functional.amplitude_to_DB with top_db=None:
    multiplier * log10(max(x, amin)) - multiplier * db_multiplier."""
    return multiplier * jnp.log10(jnp.maximum(x, amin)) - multiplier * db_multiplier


def db_to_amplitude(x: jnp.ndarray, ref: float = 10.0, power: float = 0.5) -> jnp.ndarray:
    """torchaudio.functional.DB_to_amplitude: ref * (10^(0.1 x))^power.
    With (ref=10, power=0.5) this is the exact inverse of
    amplitude_to_db(., 20, amin, 1) above the amin floor."""
    return ref * jnp.power(10.0, 0.1 * x * power)


def spectrogram_power(x: jnp.ndarray, n_fft: int, hop_length: int,
                      win_length: int, window: np.ndarray,
                      center: bool = True) -> jnp.ndarray:
    """|STFT|^2 matching torchaudio.functional.spectrogram(power=2,
    normalized=False, pad=0) — used only by the LSD metric (reference
    util/util.py:178-182). Returns [..., n_fft//2 + 1, T]."""
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode="reflect")
    if win_length < n_fft:  # torch.stft zero-pads the window symmetrically
        left = (n_fft - win_length) // 2
        window = np.pad(window, (left, n_fft - win_length - left))
    L = x.shape[-1]
    T = (L - n_fft) // hop_length + 1
    starts = hop_length * np.arange(T)
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    frames = x[..., idx] * jnp.asarray(window, x.dtype)
    spec = jnp.fft.rfft(frames, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return jnp.swapaxes(power, -1, -2)


# ---------------------------------------------------------------------------
# Polyphase sinc resampling (torchaudio sinc_interp_hann parity)
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=64)
def sinc_resample_kernel(orig_freq: int, new_freq: int,
                         lowpass_filter_width: int = 6,
                         rolloff: float = 0.99) -> Tuple[np.ndarray, int, int, int]:
    """Build the torchaudio-style polyphase kernel bank.

    Returns (kernels[q, width*2 + p], width, p, q) with p = reduced orig,
    q = reduced new. Output sample j*q + i of phase i is the dot of kernel[i]
    with input window starting at (j*p - width)."""
    gcd = math.gcd(int(orig_freq), int(new_freq))
    p, q = int(orig_freq) // gcd, int(new_freq) // gcd
    base_freq = min(p, q) * rolloff
    width = int(math.ceil(lowpass_filter_width * p / base_freq))
    idx = np.arange(-width, width + p, dtype=np.float64)[None, :] / p
    t = (-np.arange(q, dtype=np.float64)[:, None] / q + idx) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    win = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    tpi = t * np.pi
    kernels = np.where(tpi == 0, 1.0, np.sin(tpi) / np.where(tpi == 0, 1.0, tpi))
    kernels = kernels * win * (base_freq / p)
    return kernels.astype(np.float64), width, p, q


def resample_np(x: np.ndarray, orig_freq: int, new_freq: int,
                lowpass_filter_width: int = 6, rolloff: float = 0.99) -> np.ndarray:
    """Host (numpy) polyphase resample, torchaudio parity. x: [..., L]."""
    if orig_freq == new_freq:
        return x
    kernels, width, p, q = sinc_resample_kernel(orig_freq, new_freq,
                                                lowpass_filter_width, rolloff)
    L = x.shape[-1]
    target_len = int(math.ceil(L * q / p))
    xp = np.pad(np.asarray(x, np.float64),
                [(0, 0)] * (x.ndim - 1) + [(width, width + p)])
    n_frames = (xp.shape[-1] - kernels.shape[1]) // p + 1
    idx = p * np.arange(n_frames)[:, None] + np.arange(kernels.shape[1])[None, :]
    frames = xp[..., idx]                              # [..., n_frames, K]
    out = np.einsum("...fk,qk->...fq", frames, kernels)  # [..., n_frames, q]
    out = out.reshape(x.shape[:-1] + (n_frames * q,))[..., :target_len]
    return out.astype(x.dtype if np.issubdtype(x.dtype, np.floating) else np.float32)


def resample(x: jnp.ndarray, orig_freq: int, new_freq: int,
             lowpass_filter_width: int = 6, rolloff: float = 0.99) -> jnp.ndarray:
    """Device polyphase resample as a strided conv (MXU-friendly): frames at
    stride p against a [q, K] kernel bank. Jittable; static shapes."""
    if orig_freq == new_freq:
        return x
    kernels, width, p, q = sinc_resample_kernel(orig_freq, new_freq,
                                                lowpass_filter_width, rolloff)
    L = x.shape[-1]
    target_len = int(math.ceil(L * q / p))
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(width, width + p)])
    K = kernels.shape[1]
    n_frames = (xp.shape[-1] - K) // p + 1
    idx = p * np.arange(n_frames)[:, None] + np.arange(K)[None, :]
    frames = xp[..., idx]
    out = jnp.einsum("...fk,qk->...fq", frames, jnp.asarray(kernels, x.dtype),
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(x.shape[:-1] + (n_frames * q,))[..., :target_len]


def lsd_window(win_length: int) -> np.ndarray:
    """The 2x kbd window the LSD metric uses (reference util/util.py:178)."""
    return kbdwin(win_length)
