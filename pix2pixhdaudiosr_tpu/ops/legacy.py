"""Legacy orthonormal (nils-werner-style) MDCT family.

Parity: reference models/mdct.py:16-344 and models/spectrogram.py — the
"serial" per-frame MDCT/MCLT kept by the reference for testing, ported from
github.com/nils-werner/mdct. Capabilities preserved: complex MCLT
(cmdct/icmdct), orthonormal MDCT/MDST (sqrt(2)-scaled real/imag parts), and
centered lapped spectrograms with perfect reconstruction under a
Princen-Bradley window.

TPU-native: instead of per-frame Python loops over torch.fft (reference
models/spectrogram.py:151-294 runs a serial frame loop), the transform bases
are precomputed once in float64 numpy from the exact twiddle+FFT definitions
and applied as batched MXU matmuls over all frames at once.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import framing
from .window import resolve_window

_HIGHEST = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=16)
def _cmdct_basis(two_n: int) -> np.ndarray:
    """Complex basis of the oddly-stacked MCLT: cmdct(x) = x @ B, x in R^{2N},
    B in C^{2N x N} (reference models/mdct.py:84-117)."""
    N = two_n // 2
    n = np.arange(two_n)
    k = np.arange(N)
    n0 = (N + 1) / 2
    pre = np.exp(-1j * np.pi * n / two_n)
    post = np.exp(-1j * np.pi * n0 * (k + 0.5) / N)
    dft = np.exp(-2j * np.pi * np.outer(n, k) / two_n)
    return (pre[:, None] * dft) * post[None, :] * np.sqrt(1 / N)


@functools.lru_cache(maxsize=16)
def _icmdct_basis(N: int) -> np.ndarray:
    """Complex-to-real inverse MCLT basis: icmdct(X) = Re(X @ B) for the
    odd stacking (reference models/mdct.py:241-291). Built by pushing unit
    vectors through the exact ifft formulation."""
    two_n = 2 * N
    n0 = (N + 1) / 2
    n = np.arange(two_n)
    pre = np.exp(1j * np.pi * n0 * n / N)
    post = np.exp(1j * np.pi * (n + n0) / two_n)
    eye = np.eye(N)
    Y = np.zeros((N, two_n), complex)
    Y[:, :N] = eye
    Y[:, N:] = -np.conj(eye[:, ::-1])
    y = np.fft.ifft(Y * pre[None, :], axis=-1) * post[None, :]
    return y * np.sqrt(N)  # [N, 2N]: X @ B maps N coefficients -> 2N samples


def cmdct(x: jnp.ndarray) -> jnp.ndarray:
    """Complex MCLT over the last axis ([..., 2N] -> [..., N] complex)."""
    B = _cmdct_basis(x.shape[-1])
    xr = x.astype(jnp.float32)
    re = jnp.matmul(xr, jnp.asarray(B.real, jnp.float32), precision=_HIGHEST)
    im = jnp.matmul(xr, jnp.asarray(B.imag, jnp.float32), precision=_HIGHEST)
    return re + 1j * im


def mdct_ortho(x: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal MDCT: sqrt(2) * Re(cmdct) (reference models/mdct.py:131)."""
    B = _cmdct_basis(x.shape[-1])
    return jnp.matmul(x.astype(jnp.float32),
                      jnp.asarray(np.sqrt(2) * B.real, jnp.float32),
                      precision=_HIGHEST)


def mdst_ortho(x: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal MDST: -sqrt(2) * Im(cmdct) (reference models/mdct.py:146)."""
    B = _cmdct_basis(x.shape[-1])
    return jnp.matmul(x.astype(jnp.float32),
                      jnp.asarray(-np.sqrt(2) * B.imag, jnp.float32),
                      precision=_HIGHEST)


def icmdct(X: jnp.ndarray) -> jnp.ndarray:
    """Inverse MCLT ([..., N] complex -> [..., 2N] real)."""
    Bt = _icmdct_basis(X.shape[-1])  # [N, 2N] complex
    re = jnp.matmul(jnp.real(X).astype(jnp.float32),
                    jnp.asarray(Bt.real, jnp.float32), precision=_HIGHEST)
    im = jnp.matmul(jnp.imag(X).astype(jnp.float32),
                    jnp.asarray(Bt.imag, jnp.float32), precision=_HIGHEST)
    return re - im


def imdct_ortho(X: jnp.ndarray) -> jnp.ndarray:
    """Inverse orthonormal MDCT (reference models/mdct.py:293-305)."""
    Bt = _icmdct_basis(X.shape[-1])
    return jnp.matmul(X.astype(jnp.float32),
                      jnp.asarray(np.sqrt(2) * Bt.real, jnp.float32),
                      precision=_HIGHEST)


def imdst_ortho(X: jnp.ndarray) -> jnp.ndarray:
    Bt = _icmdct_basis(X.shape[-1])
    return jnp.matmul(X.astype(jnp.float32),
                      jnp.asarray(-np.sqrt(2) * Bt.imag, jnp.float32),
                      precision=_HIGHEST)


# ---------------------------------------------------------------------------
# Lapped spectrogram wrappers (reference models/spectrogram.py semantics:
# 50% overlap, centered so first/last windows straddle the signal ends)
# ---------------------------------------------------------------------------
def mdct_spectrogram(x: jnp.ndarray, window, frame_length: int = 2048,
                     center: bool = True) -> jnp.ndarray:
    """[..., S] -> [..., T, N] orthonormal lapped MDCT with 50% overlap."""
    w = resolve_window(window, frame_length)
    hop = frame_length // 2
    padded = framing.pad_signal(x, hop, center)
    frames = framing.frame(padded, frame_length, hop)
    return mdct_ortho(frames * jnp.asarray(w, frames.dtype))


def imdct_spectrogram(X: jnp.ndarray, window, center: bool = True,
                      out_length: Optional[int] = None) -> jnp.ndarray:
    """Inverse of mdct_spectrogram (overlap-add; perfect reconstruction for
    Princen-Bradley windows such as sine or kbd)."""
    frame_length = 2 * X.shape[-1]
    w = resolve_window(window, frame_length)
    hop = frame_length // 2
    y = imdct_ortho(X) * jnp.asarray(w, jnp.float32)
    out = framing.overlap_add(y, hop)
    if center:
        out = framing.center_crop(out, frame_length)
    if out_length is not None:
        out = out[..., :out_length]
    return out


def sine_window(N: int) -> np.ndarray:
    """scipy.signal.cosine analog — the Princen-Bradley default the upstream
    nils-werner/mdct uses."""
    return np.sin(np.pi / N * (np.arange(N) + 0.5))
