"""DCT family as MXU matmuls.

The reference implements DCT-II/III (and DST/IDXT cousins) with a
DREAMPlace-derived C++/OpenMP + CUDA FFT+twiddle library (reference
dct/src/dct.cpp, dct/src/dct_cuda_kernel.cu) plus pure-torch fallbacks
(reference dct/dct_native.py). On TPU the right primitive is different: an
N-point DCT is a dense (N, N) matmul against a precomputed cosine basis, which
runs on the 128x128 MXU systolic array at full throughput, needs no
permutation/twiddle passes, and is bit-stable in f32 when computed with
HIGHEST matmul precision. Bases are built once on the host in float64.

Scaling conventions pinned to the reference (golden-tested):
  * dct_2n(x)   == reference dct/dct_native.py:16-34 (DCT_2N_native):
                   (1/N) * unnormalized DCT-II == scipy.fft.dct(x, 2) / N
  * idct_2n(x)  == reference dct/dct_native.py:45-67 (IDCT_2N_native) and the
                   native-ext IDCT of reference dct/dct.py:50-84:
                   unnormalized DCT-III == scipy.fft.dct(x, 3)
  * dct_n(x)    == reference dct/dct.py:15-33 native ext 'N'-algorithm DCT:
                   (1/(2N)) * unnormalized DCT-II (see dct/src/dct.cpp:10-45,
                   whose computeMulExpk carries a 0.25/N factor on 2*rfft).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_HIGHEST = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Basis builders (host, float64)
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=32)
def dct2_basis(N: int) -> np.ndarray:
    """B[n, k] = 2 cos(pi (2n+1) k / (2N)); x @ B == unnormalized DCT-II."""
    n = np.arange(N, dtype=np.float64)[:, None]
    k = np.arange(N, dtype=np.float64)[None, :]
    return 2.0 * np.cos(np.pi * (2 * n + 1) * k / (2 * N))


@functools.lru_cache(maxsize=32)
def dct3_basis(N: int) -> np.ndarray:
    """B[k, n] = (2 - delta_k0) cos(pi (2n+1) k / (2N)); x @ B == unnormalized
    DCT-III (the reference's IDCT scaling, dct/dct.py:50-58)."""
    k = np.arange(N, dtype=np.float64)[:, None]
    n = np.arange(N, dtype=np.float64)[None, :]
    b = 2.0 * np.cos(np.pi * (2 * n + 1) * k / (2 * N))
    b[0, :] = 1.0
    return b


@functools.lru_cache(maxsize=32)
def dct4_basis(N: int) -> np.ndarray:
    """B[n, k] = 2 cos(pi (2n+1) (2k+1) / (4N)); orthogonal up to scale."""
    n = np.arange(N, dtype=np.float64)[:, None]
    k = np.arange(N, dtype=np.float64)[None, :]
    return 2.0 * np.cos(np.pi * (2 * n + 1) * (2 * k + 1) / (4 * N))


@functools.lru_cache(maxsize=32)
def mdct4_basis(N: int) -> np.ndarray:
    """(N, N/2) forward basis of the reference's exact MATLAB-style MDCT4
    (reference models/mdct.py:483-513): pre-twiddle exp(-j pi n / N), N-point
    FFT, post-twiddle exp(-j (pi/2N + pi/4)(2k+1)), real part."""
    n = np.arange(N, dtype=np.float64)
    k = np.arange(N // 2, dtype=np.float64)
    exp1 = np.exp(-1j * np.pi / N * n)
    exp2 = np.exp(-1j * (np.pi / (2 * N) + np.pi / 4) * (2 * k + 1))
    dft = np.exp(-2j * np.pi * np.outer(n, k) / N)
    return np.real(exp1[:, None] * dft * exp2[None, :])


@functools.lru_cache(maxsize=32)
def imdct4_basis(N: int) -> np.ndarray:
    """(N/2, N) inverse basis of the reference IMDCT4 core (reference
    models/mdct.py:539-549), *excluding* the 4/N overlap-add scale."""
    k = np.arange(N // 2, dtype=np.float64)
    n = np.arange(N, dtype=np.float64)
    exp1 = np.exp(-1j * (np.pi / (2 * N) + np.pi / 4) * (2 * k + 1))
    exp2 = np.exp(-1j * np.pi / N * n)
    dft = np.exp(-2j * np.pi * np.outer(k, n) / N)
    return np.real(exp1[:, None] * dft * exp2[None, :])


# ---------------------------------------------------------------------------
# Functional transforms (device)
# ---------------------------------------------------------------------------
def _apply_basis(x: jnp.ndarray, basis: np.ndarray) -> jnp.ndarray:
    b = jnp.asarray(basis, dtype=x.dtype)
    return jnp.matmul(x, b, precision=_HIGHEST)


def dct_2n(x: jnp.ndarray) -> jnp.ndarray:
    """DCT_2N_native parity: (1/N) * unnormalized DCT-II over the last axis
    (reference dct/dct_native.py:16-34)."""
    N = x.shape[-1]
    return _apply_basis(x, dct2_basis(N) / N)


def idct_2n(x: jnp.ndarray) -> jnp.ndarray:
    """IDCT_2N_native / native-ext IDCT parity: unnormalized DCT-III over the
    last axis (reference dct/dct_native.py:45-67, dct/dct.py:50-84).
    idct_2n(dct_2n(x)) == 2 * x, hence IMDCT2's /2 (models/mdct.py:437)."""
    N = x.shape[-1]
    return _apply_basis(x, dct3_basis(N))


def dct_n(x: jnp.ndarray) -> jnp.ndarray:
    """Native-ext DCT parity ('N' algorithm): (1/(2N)) * unnormalized DCT-II
    (reference dct/dct.py:15-33, dct/src/dct.h:66-89)."""
    N = x.shape[-1]
    return _apply_basis(x, dct2_basis(N) / (2 * N))


def dct2d(x: jnp.ndarray) -> jnp.ndarray:
    """2D variant over the last two axes (reference dct/dct.py:86-120,
    dct/src/dct2_fft2_cuda.cpp:31-77): separable row/column matmuls."""
    N0, N1 = x.shape[-2], x.shape[-1]
    y = _apply_basis(x, dct2_basis(N1) / (2 * N1))
    y = _apply_basis(y.swapaxes(-1, -2), dct2_basis(N0) / (2 * N0))
    return y.swapaxes(-1, -2)


def idct2d(x: jnp.ndarray) -> jnp.ndarray:
    """2D inverse (reference dct/dct.py:122-156)."""
    N0, N1 = x.shape[-2], x.shape[-1]
    y = _apply_basis(x, dct3_basis(N1))
    y = _apply_basis(y.swapaxes(-1, -2), dct3_basis(N0))
    return y.swapaxes(-1, -2)


# rfft-based alternates (cross-check path; the reference's actual algorithm,
# reference dct/src/dct_2N.cpp / dct/dct_native.py). Kept for tests and for
# very large N where an O(N log N) path could win over the MXU matmul.
def dct_2n_rfft(x: jnp.ndarray) -> jnp.ndarray:
    N = x.shape[-1]
    xp = jnp.concatenate([x, jnp.zeros_like(x)], axis=-1)
    y = jnp.fft.rfft(xp, axis=-1)[..., :N] / N
    k = jnp.arange(N, dtype=x.dtype)
    tw = jnp.pi * k / (2 * N)
    return 2.0 * (jnp.real(y) * jnp.cos(tw) + jnp.imag(y) * jnp.sin(tw))


def idct_2n_rfft(x: jnp.ndarray) -> jnp.ndarray:
    N = x.shape[-1]
    k = jnp.arange(N, dtype=x.dtype)
    tw = jnp.pi * k / (2 * N)
    c = 2.0 * x * (jnp.cos(tw) + 1j * jnp.sin(tw))
    cp = jnp.concatenate([c, jnp.zeros(c.shape[:-1] + (1,), dtype=c.dtype)], axis=-1)
    return jnp.fft.irfft(cp, n=2 * N, axis=-1)[..., :N] * N
