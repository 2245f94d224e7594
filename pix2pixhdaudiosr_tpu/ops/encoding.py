"""Waveform <-> normalized 2-channel MDCT spectrogram codec.

Parity targets (golden-tested):
  * to_spectro — reference models/pix2pixHD_model.py:142-227 (dB encode with
    explicit pos/neg alpha mixing, batch-global max/min normalization, noise
    mask modes 0/1/2 over the top (1 - 1/up_ratio) of the frequency axis).
  * denormalize / to_audio / to_frames — reference
    models/pix2pixHD_model.py:229-258.
  * imdct helper (the eval/generate inverse with phase splice) — reference
    util/util.py:104-130.

Layout: spectrograms are [B, F(freq=n_fft), T(frames), C] (NHWC; the reference
uses NCHW [B, C, F, T]). Phase tensors are [B, F, T].

All functions are pure and jittable; randomness comes from explicit PRNG keys
(the reference uses torch's global RNG). The batch-global max/min reduction
(reference models/pix2pixHD_model.py:165-167) is a plain jnp.max/min — under
pjit data sharding XLA lowers it to an ICI all-reduce, replacing the
single-device semantics of the reference's DataParallel gather.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .audio import amplitude_to_db, db_to_amplitude
from .dct import idct_2n
from .mdct import IMDCT2, MDCT2
from .window import kbdwin


@dataclass(frozen=True)
class CodecConfig:
    n_fft: int = 512
    hop_length: int = 256
    win_length: int = 512
    center: bool = True
    segment_length: int = 32512
    up_ratio: float = 6.0
    alpha: float = 0.6
    min_value: float = 1e-7
    explicit_encoding: bool = True
    mask_mode: Optional[str] = "mode2"   # None | mode0 | mode1 | mode2
    phase_encoding_mode: Optional[str] = None


class SpectroCodec:
    """Stateless codec bundling MDCT2/IMDCT2 with the kbd window, mirroring
    the transforms built in reference models/pix2pixHD_model.py:34-40."""

    def __init__(self, cc: CodecConfig):
        self.cc = cc
        self.window = kbdwin(cc.win_length)
        self.mdct = MDCT2(n_fft=cc.n_fft, hop_length=cc.hop_length,
                          win_length=cc.win_length, window=self.window,
                          center=cc.center)
        self.imdct = IMDCT2(n_fft=cc.n_fft, hop_length=cc.hop_length,
                            win_length=cc.win_length, window=self.window,
                            center=cc.center)
        self.imdct_seg = IMDCT2(n_fft=cc.n_fft, hop_length=cc.hop_length,
                                win_length=cc.win_length, window=self.window,
                                center=cc.center, out_length=cc.segment_length)

    # ------------------------------------------------------------------
    def to_spectro(self, audio: jnp.ndarray, rng: Optional[jax.Array] = None,
                   mask: bool = False, return_frames: bool = False):
        """[B, S] waveform -> (log_spectro [B,F,T,C], pha [B,F,T], norm_param).

        Reference models/pix2pixHD_model.py:142-227."""
        cc = self.cc
        if return_frames:
            spec_tn, frames = self.mdct(audio, return_ola=True)
        else:
            spec_tn = self.mdct(audio)
            frames = None
        spectro = jnp.swapaxes(spec_tn, -1, -2)  # [B, F, T]

        if cc.explicit_encoding:
            neg = 0.5 * (jnp.abs(spectro) - spectro)
            pos = spectro + neg
            ch0 = amplitude_to_db(cc.alpha * pos + (1 - cc.alpha) * neg, 20.0, cc.min_value, 1.0)
            ch1 = amplitude_to_db((1 - cc.alpha) * pos + cc.alpha * neg, 20.0, cc.min_value, 1.0)
            log_spectro = jnp.stack([ch0, ch1], axis=-1)  # [B, F, T, 2]
        else:
            log_spectro = amplitude_to_db(jnp.abs(spectro) + cc.min_value,
                                          20.0, cc.min_value, 1.0)[..., None]
        pha = jnp.sign(spectro)

        mean = jnp.mean(log_spectro)
        std = jnp.sqrt(jnp.var(log_spectro))
        amax = jnp.max(log_spectro)
        amin = jnp.min(log_spectro)

        if not cc.explicit_encoding and cc.phase_encoding_mode is not None:
            rng, sub = jax.random.split(rng)
            if cc.phase_encoding_mode == "uni_dist":
                pha = pha * jax.random.uniform(sub, pha.shape, pha.dtype)
            elif cc.phase_encoding_mode == "norm_dist":
                noise = jax.random.normal(sub, pha.shape, pha.dtype)
                noise = (noise - jnp.min(noise)) / (jnp.max(noise) - jnp.min(noise))
                pha = pha * noise
            elif cc.phase_encoding_mode == "norm_dist2":
                pha = pha * jnp.abs(jax.random.normal(sub, pha.shape, pha.dtype))
            elif cc.phase_encoding_mode == "scale":
                pha = pha * 0.5

        log_spectro = (log_spectro - amin) / (amax - amin)

        if mask:
            b, f, t, c = log_spectro.shape
            mask_size = int(f * (1 - 1 / cc.up_ratio))
            rng, sub, sub2 = jax.random.split(rng, 3)
            noise = jax.random.normal(sub, (b, mask_size, t, c), log_spectro.dtype)
            nmin, nmax = jnp.min(noise), jnp.max(noise)
            if cc.mask_mode == "mode0":
                noise = noise / (nmax - nmin)
            elif cc.mask_mode == "mode1":
                noise = (noise - nmin) / (nmax - nmin)
                pseudo = 2 * jax.random.randint(sub2, noise.shape, 0, 2).astype(noise.dtype) - 1
                noise = noise * pseudo
            elif cc.mask_mode == "mode2":
                noise = (noise - nmin) / (nmax - nmin)
            elif cc.mask_mode is None:
                noise = jnp.zeros_like(noise)
            log_spectro = jnp.concatenate(
                [log_spectro[:, : f - mask_size, :, :], noise], axis=1)

        norm_param = {"max": amax, "min": amin, "mean": mean, "std": std,
                      "frames": frames}
        return log_spectro, pha, norm_param

    # ------------------------------------------------------------------
    def denormalize(self, log_spectro: jnp.ndarray, norm_param) -> jnp.ndarray:
        """Reference models/pix2pixHD_model.py:229-232."""
        spectro = jnp.abs(log_spectro) * (norm_param["max"] - norm_param["min"]) \
            + norm_param["min"]
        return db_to_amplitude(spectro, 10.0, 0.5) - self.cc.min_value

    def _combine_explicit(self, spectro: jnp.ndarray) -> jnp.ndarray:
        """(ch0 - ch1) / (2 alpha - 1): reference models/pix2pixHD_model.py:237."""
        return (spectro[..., 0] - spectro[..., 1]) / (2 * self.cc.alpha - 1)

    def to_audio(self, log_spectro: jnp.ndarray, norm_param,
                 pha: Optional[jnp.ndarray] = None,
                 rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """Reference models/pix2pixHD_model.py:234-249 (the hifigan-D path
        inverse). Returns sqrt(up_ratio - 1) * IMDCT."""
        cc = self.cc
        spectro = self.denormalize(log_spectro, norm_param)
        if cc.explicit_encoding:
            spectro = self._combine_explicit(spectro)  # [B, F, T]
        else:
            spectro = spectro[..., 0]
            if cc.up_ratio > 1:
                f = pha.shape[-2]
                cut = int(f * (1 / cc.up_ratio))
                pseudo = 2 * jax.random.randint(rng, pha.shape, 0, 2).astype(pha.dtype) - 1
                pha = jnp.concatenate([pha[..., :cut, :], pseudo[..., cut:, :]], axis=-2)
            spectro = spectro * pha
        audio = self.imdct(jnp.swapaxes(spectro, -1, -2))
        return np.sqrt(cc.up_ratio - 1) * audio

    def to_frames(self, log_spectro: jnp.ndarray, norm_param) -> Optional[jnp.ndarray]:
        """Raw IDCT frames (no window/OLA) for the match loss and time-D
        (reference models/pix2pixHD_model.py:251-258). Returns [B, T, n_fft]."""
        if not self.cc.explicit_encoding:
            return None
        spectro = self._combine_explicit(self.denormalize(log_spectro, norm_param))
        return idct_2n(jnp.swapaxes(spectro, -1, -2))

    # ------------------------------------------------------------------
    def imdct_eval(self, spectro: jnp.ndarray, pha: jnp.ndarray, norm_param,
                   rng: Optional[jax.Array] = None,
                   out_segment: bool = True) -> jnp.ndarray:
        """The eval/generate inverse helper (reference util/util.py:104-130):
        denormalize, recombine channels as (ch0 + ch1) with sign(ch0 - ch1) as
        pseudo-phase, splice the true low-band phase below the cutoff, IMDCT,
        divide by 2. Callers additionally scale by sqrt(up_ratio - 1)
        (reference train.py:108 via caller, generate_audio.py:47)."""
        cc = self.cc
        device_spec = jnp.abs(spectro) * (norm_param["max"] - norm_param["min"]) \
            + norm_param["min"]
        device_spec = db_to_amplitude(device_spec, 10.0, 0.5) - cc.min_value
        if cc.explicit_encoding:
            pseudo = jnp.sign(device_spec[..., 0] - device_spec[..., 1])
            mag = device_spec[..., 0] + device_spec[..., 1]  # [B, F, T]
            if cc.up_ratio > 1:
                f = pha.shape[-2]
                cut = int(f * (1 / cc.up_ratio))
                pha = jnp.concatenate([pha[..., :cut, :], pseudo[..., cut:, :]], axis=-2)
            signal = mag * pha
        else:
            mag = device_spec[..., 0]
            if cc.up_ratio > 1:
                f = pha.shape[-2]
                cut = int(f * (1 / cc.up_ratio))
                pseudo = 2 * jax.random.randint(rng, pha.shape, 0, 2).astype(pha.dtype) - 1
                pha = jnp.concatenate([pha[..., :cut, :], pseudo[..., cut:, :]], axis=-2)
            signal = mag * pha
        imdct = self.imdct_seg if out_segment else self.imdct
        return imdct(jnp.swapaxes(signal, -1, -2)) / 2.0
