"""MDCT / IMDCT lapped transforms.

Parity targets:
  * MDCT2/IMDCT2 — the DCT-II based production path
    (reference models/mdct.py:352-454, used via DCT_2N_native/IDCT_2N_native
    in reference models/pix2pixHD_model.py:34-40).
  * MDCT4/IMDCT4 — the exact MATLAB-style DCT-IV MDCT
    (reference models/mdct.py:461-566, README round-trip MSE 4.89e-32 @ f64).

TPU-first shape: window multiply, zero-padding to n_fft, and the DCT are all
folded into ONE precomputed (win, n_fft) basis, so a forward MDCT over a
[B, S] batch is `frame -> single MXU matmul`; the inverse is
`single MXU matmul -> overlap-add`, with framing/OLA as pure reshapes
(see ops/framing.py). No FFT, no twiddle passes, no gathers.

Note the reference pads using `len(signal)` (reference models/mdct.py:379),
which for batched 2-D input is the *batch* size — an upstream quirk that is
content-neutral because `unfold` truncates the tail; we pad by the true time
length, which produces identical frames for every reference configuration.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import dct as dct_ops
from . import framing
from .window import resolve_window

_HIGHEST = jax.lax.Precision.HIGHEST


def _matmul(x: jnp.ndarray, basis: np.ndarray) -> jnp.ndarray:
    return jnp.matmul(x, jnp.asarray(basis, dtype=x.dtype), precision=_HIGHEST)


class _LappedBase:
    def __init__(self, n_fft: int, hop_length: int, win_length: Optional[int],
                 window, center: bool, pad_mode: str):
        self.n_fft = int(n_fft)
        self.hop_length = int(hop_length)
        self.center = bool(center)
        self.pad_mode = pad_mode
        w = resolve_window(window, int(win_length) if win_length else self.n_fft)
        self.win_length = len(w)
        self.window = w  # float64 numpy
        assert self.win_length <= self.n_fft
        assert self.hop_length <= self.win_length


class MDCT2(_LappedBase):
    """Forward DCT-II lapped transform (reference models/mdct.py:352-403).

    [..., S] -> [..., T, n_fft]. `return_ola=True` additionally returns the
    windowed frames (needed by the time-domain discriminator, reference
    models/pix2pixHD_model.py:142-148)."""

    def __init__(self, n_fft=2048, hop_length=None, win_length=None, window=None,
                 center=True, pad_mode="constant", dct_op=None,
                 backend: str = "xla"):
        super().__init__(n_fft, hop_length, win_length, window, center, pad_mode)
        # Fused: (window * zero-pad-to-n_fft * DCT_2N) as one (win, n_fft) basis.
        basis = dct_ops.dct2_basis(self.n_fft)[: self.win_length, :] / self.n_fft
        self.backend = backend
        if dct_op is not None:  # custom op path keeps reference pluggability
            self._custom_dct = dct_op
            self._basis = None
        else:
            self._custom_dct = None
            self._basis = self.window[:, None] * basis

    def __call__(self, signal: jnp.ndarray, return_ola: bool = False):
        x = framing.pad_signal(signal, self.hop_length, self.center, self.pad_mode)
        if (self.backend == "pallas" and self._basis is not None
                and signal.ndim == 2 and not return_ola
                and self.win_length % self.hop_length == 0):
            # the fused kernel tiles hop-sized blocks (dct_pallas.py);
            # non-dividing codecs take the XLA gcd-cell path below
            from .dct_pallas import fused_mdct2
            T = x.shape[-1] // self.hop_length - self.win_length // self.hop_length + 1
            return fused_mdct2(x, jnp.asarray(self._basis, jnp.float32),
                               hop=self.hop_length, win=self.win_length,
                               t_tile=T)
        frames = framing.frame(x, self.win_length, self.hop_length)
        if self._custom_dct is not None:
            wframes = frames * jnp.asarray(self.window, frames.dtype)
            pad = self.n_fft - self.win_length
            padded = jnp.pad(wframes, [(0, 0)] * (wframes.ndim - 1) + [(0, pad)]) if pad else wframes
            out = self._custom_dct(padded)
        else:
            out = _matmul(frames, self._basis)
            wframes = frames * jnp.asarray(self.window, frames.dtype) if return_ola else None
        return (out, wframes) if return_ola else out


class IMDCT2(_LappedBase):
    """Inverse of MDCT2 (reference models/mdct.py:406-454): IDCT/2 -> truncate
    -> window -> overlap-add -> center-crop -> out_length trim."""

    def __init__(self, n_fft=2048, hop_length=None, win_length=None, window=None,
                 center=True, pad_mode="constant", out_length=None, idct_op=None,
                 backend: str = "xla"):
        super().__init__(n_fft, hop_length, win_length, window, center, pad_mode)
        self.out_length = out_length
        self.backend = backend
        if idct_op is not None:
            self._custom_idct = idct_op
            self._basis = None
        else:
            self._custom_idct = None
            # Fused: (IDCT/2 * truncate-to-win * window) as one (n_fft, win) basis.
            self._basis = dct_ops.dct3_basis(self.n_fft)[:, : self.win_length] \
                * self.window[None, :] / 2.0

    def __call__(self, spec: jnp.ndarray) -> jnp.ndarray:
        assert spec.shape[-1] == self.n_fft, (spec.shape, self.n_fft)
        if (self.backend == "pallas" and self._basis is not None
                and spec.ndim == 3
                and self.win_length % self.hop_length == 0):
            from .dct_pallas import fused_imdct2
            out = fused_imdct2(spec, jnp.asarray(self._basis, jnp.float32),
                               hop=self.hop_length, win=self.win_length)
            if self.center:
                out = framing.center_crop(out, self.win_length)
            return _fit_length(out, self.out_length)
        if self._custom_idct is not None:
            y = self._custom_idct(spec) / 2.0
            y = y[..., : self.win_length] * jnp.asarray(self.window, y.dtype)
        else:
            y = _matmul(spec, self._basis)
        out = framing.overlap_add(y, self.hop_length)
        if self.center:
            out = framing.center_crop(out, self.win_length)
        return _fit_length(out, self.out_length)


class MDCT4(_LappedBase):
    """Exact MATLAB-style MDCT (reference models/mdct.py:461-513).
    [..., S] -> [..., T, n_fft//2]."""

    def __init__(self, n_fft=2048, hop_length=None, win_length=None, window=None,
                 center=True, pad_mode="constant"):
        super().__init__(n_fft, hop_length, win_length, window, center, pad_mode)
        self._basis = self.window[:, None] * dct_ops.mdct4_basis(self.n_fft)[: self.win_length, :]

    def __call__(self, signal: jnp.ndarray) -> jnp.ndarray:
        x = framing.pad_signal(signal, self.hop_length, self.center, self.pad_mode)
        frames = framing.frame(x, self.win_length, self.hop_length)
        return _matmul(frames, self._basis)


class IMDCT4(_LappedBase):
    """Inverse exact MDCT (reference models/mdct.py:516-566), including its
    4/n_fft overlap-add scale."""

    def __init__(self, n_fft=2048, hop_length=None, win_length=None, window=None,
                 center=True, pad_mode="constant", out_length=None):
        super().__init__(n_fft, hop_length, win_length, window, center, pad_mode)
        self.out_length = out_length
        self._basis = dct_ops.imdct4_basis(self.n_fft)[:, : self.win_length] \
            * self.window[None, :] * (4.0 / self.n_fft)

    def __call__(self, spec: jnp.ndarray) -> jnp.ndarray:
        assert spec.shape[-1] == self.n_fft // 2, (spec.shape, self.n_fft)
        y = _matmul(spec, self._basis)
        out = framing.overlap_add(y, self.hop_length)
        if self.center:
            out = framing.center_crop(out, self.win_length)
        return _fit_length(out, self.out_length)


def _fit_length(out: jnp.ndarray, out_length) -> jnp.ndarray:
    """Trim OR zero-pad the reconstruction to out_length. When hop | win the
    reconstruction is never short, but for non-dividing codecs the forward's
    end-pad rounds past the last frame and the inverse comes up (up to
    hop-1) samples short of the segment — padding keeps every segment on its
    exact out_length time base instead of letting chunked decode outputs
    drift (the reference's fold-based inverse has the same shortfall and
    would drift, reference models/mdct.py:447-454)."""
    if out_length is None:
        return out
    short = out_length - out.shape[-1]
    if short > 0:
        pad = [(0, 0)] * (out.ndim - 1) + [(0, short)]
        return jnp.pad(out, pad)
    return out[..., :out_length]


# ---------------------------------------------------------------------------
# float64 host oracles (numpy) for the README round-trip parity test
# (reference README.md:95-119) without flipping jax to x64 mode.
# ---------------------------------------------------------------------------
def mdct4_np(signal: np.ndarray, n_fft: int, hop: int, window: np.ndarray,
             center: bool = True) -> np.ndarray:
    s = np.asarray(signal, np.float64)
    start = hop if center else 0
    extra = s.shape[-1] % hop
    end = start + (hop - extra if extra else 0)
    s = np.pad(s, [(0, 0)] * (s.ndim - 1) + [(start, end)])
    T = (s.shape[-1] - len(window)) // hop + 1
    idx = np.arange(len(window))[None, :] + hop * np.arange(T)[:, None]
    frames = s[..., idx] * window
    return frames @ dct_ops.mdct4_basis(n_fft)[: len(window), :]


def imdct4_np(spec: np.ndarray, n_fft: int, hop: int, window: np.ndarray,
              center: bool = True, out_length: Optional[int] = None) -> np.ndarray:
    y = np.asarray(spec, np.float64) @ dct_ops.imdct4_basis(n_fft)[:, : len(window)]
    y = y * window * (4.0 / n_fft)
    T, win = y.shape[-2], y.shape[-1]
    out = np.zeros(y.shape[:-2] + ((T - 1) * hop + win,))
    for t in range(T):
        out[..., t * hop : t * hop + win] += y[..., t, :]
    if center:
        out = out[..., win // 2 : -(win // 2)]
    if out_length is not None:
        out = out[..., :out_length]
    return out
