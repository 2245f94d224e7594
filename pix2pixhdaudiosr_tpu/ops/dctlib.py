"""Full DREAMPlace-parity transform family.

The reference vendors a DCT/DST/IDXT library with C++/OpenMP + CUDA backends
(reference dct/src/dct.cpp, dst.cpp, dxt.cpp, dct_lee.cpp, dct2_fft2.cpp and
python facades dct/dct.py, dct/dct_lee.py, dct/dct2_fft2.py,
dct/discrete_spectral_transform.py). Only DCT-II/III reach the audio pipeline;
the rest is provided here for API-parity completeness, as precomputed-basis
MXU matmuls (1D) and separable matmul pairs (2D).

Conventions were pinned numerically against the reference algorithms
(rfft/irfft/ifft + twiddle steps); see tests/test_dctlib.py:
  dst(x)[k]    = -2 sum_n x_n sin(pi (2n+1)(k+1) / (2N))
                 (== -scipy.fft.dst(x, 2); the reference's computeFlip-based
                  path carries this sign)
  idxst(x)[u]  =  sum_i x_i sin(pi i (2u+1) / (2N))   (idxt flag 1)
  idxct(x)[u]  =  sum_i x_i cos(pi i (2u+1) / (2N))   (idxt flag 0)
  idst(x)      =  the reference's exact (idiosyncratic) irfft construction:
                  row 0: cos(pi/2N); row k: 2 cos(pi (k+1+2k(u+1)) / (2N))
  2D combos    =  idcct2 / idsct2 / idcst2 / idxst_idct / idct_idxst as
                  last-axis-then-first-axis compositions
                  (reference dct/discrete_spectral_transform.py:368-427)

`dct_lee` / `idct_lee` implement the actual Lee-1984 butterfly recursion
(reference dct/src/dct_lee_cpu.h:140-190) in pure JAX — log2(N) stages of
reshapes and twiddle multiplies, power-of-2 sizes only — as the FFT-free
alternative kernel; benchmarked against the matmul path in benchmarks/.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .dct import (dct2_basis, dct3_basis, dct_2n, dct_n, idct_2n,  # noqa: F401
                  _apply_basis)

_HIGHEST = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# 1D bases
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=32)
def dst_basis(N: int) -> np.ndarray:
    n = np.arange(N, dtype=np.float64)[:, None]
    k = np.arange(N, dtype=np.float64)[None, :]
    return -2.0 * np.sin(np.pi * (2 * n + 1) * (k + 1) / (2 * N))


@functools.lru_cache(maxsize=32)
def idst_basis(N: int) -> np.ndarray:
    u = np.arange(N, dtype=np.float64)[None, :]
    b = np.zeros((N, N))
    b[0, :] = np.cos(np.pi / (2 * N))
    for k in range(1, N):
        b[k, :] = 2.0 * np.cos(np.pi * ((k + 1) + 2 * k * (u + 1)) / (2 * N))
    return b


@functools.lru_cache(maxsize=32)
def idxct_basis(N: int) -> np.ndarray:
    i = np.arange(N, dtype=np.float64)[:, None]
    u = np.arange(N, dtype=np.float64)[None, :]
    return np.cos(np.pi * i * (2 * u + 1) / (2 * N))


@functools.lru_cache(maxsize=32)
def idxst_basis(N: int) -> np.ndarray:
    i = np.arange(N, dtype=np.float64)[:, None]
    u = np.arange(N, dtype=np.float64)[None, :]
    return np.sin(np.pi * i * (2 * u + 1) / (2 * N))


def dst(x):
    return _apply_basis(x, dst_basis(x.shape[-1]))


def idst(x):
    return _apply_basis(x, idst_basis(x.shape[-1]))


def idxct(x):
    return _apply_basis(x, idxct_basis(x.shape[-1]))


def idxst(x):
    return _apply_basis(x, idxst_basis(x.shape[-1]))


def idct_n(x):
    """Reference idct_N == IDCT 'N' algorithm == unnormalized DCT-III
    (same as idct_2n; both native paths share scaling)."""
    return idct_2n(x)


# ---------------------------------------------------------------------------
# 2D combinations (last axis first, then first axis — reference
# dct/discrete_spectral_transform.py:368-427)
# ---------------------------------------------------------------------------
def _last_then_first(x, last_fn, first_fn):
    y = last_fn(x)
    y = first_fn(y.swapaxes(-1, -2))
    return y.swapaxes(-1, -2)


def dst2(x):
    return _last_then_first(x, dst, dst)


def idcct2(x):
    return _last_then_first(x, idxct, idxct)


def idsct2(x):
    return _last_then_first(x, idxct, idxst)


def idcst2(x):
    return _last_then_first(x, idxst, idxct)


def idxst_idct(x):
    return _last_then_first(x, idct_n, idxst)


def idct_idxst(x):
    return _last_then_first(x, idxst, idct_n)


# ---------------------------------------------------------------------------
# Lee-1984 butterfly DCT (power-of-2 N)
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=32)
def _lee_cos_tables(N: int):
    """Per-level 0.5/cos((2n+1) pi / (2 len)) tables
    (reference dct/src/dct_lee_cpu.h:60-102)."""
    tables = {}
    size = N
    while size >= 2:
        n = np.arange(size // 2, dtype=np.float64)
        tables[size] = (0.5 / np.cos((2 * n + 1) * np.pi / (2 * size))).astype(np.float64)
        size //= 2
    return tables


def _lee_fwd(x: jnp.ndarray, N: int, tables) -> jnp.ndarray:
    """T_N(x)[k] = sum_n x[n] cos(pi (2n+1) k / (2N)), recursive."""
    if N == 1:
        return x
    half = N // 2
    head, tail = x[..., :half], x[..., half:][..., ::-1]
    g = head + tail
    h = (head - tail) * jnp.asarray(tables[N], x.dtype)
    tg = _lee_fwd(g, half, tables)
    th = _lee_fwd(h, half, tables)
    # odd outputs: b[k] + b[k+1] (b[half] := 0)
    th_shift = jnp.concatenate([th[..., 1:], jnp.zeros_like(th[..., :1])], axis=-1)
    odd = th + th_shift
    out = jnp.stack([tg, odd], axis=-1)  # interleave even/odd
    return out.reshape(x.shape[:-1] + (N,))


def _lee_inv(y: jnp.ndarray, N: int, tables) -> jnp.ndarray:
    """Inverse of _lee_fwd (up to the DCT-III duality): recovers x with
    T_N(x) = y."""
    if N == 1:
        return y
    half = N // 2
    interleaved = y.reshape(y.shape[:-1] + (half, 2))
    e, o = interleaved[..., 0], interleaved[..., 1]
    # undo the odd chain odd[k] = b[k] + b[k+1] (b[half] = 0):
    # b[k] = o[k] - o[k+1] + o[k+2] - ... — an alternating-sign suffix sum.
    sign = jnp.asarray((-1.0) ** np.arange(half), y.dtype)
    b = sign * jnp.cumsum((o * sign)[..., ::-1], axis=-1)[..., ::-1]
    g = _lee_inv(e, half, tables)
    h = _lee_inv(b, half, tables) / jnp.asarray(tables[N], y.dtype)
    head = g + h
    tail = (g - h)[..., ::-1]
    return jnp.concatenate([head, tail], axis=-1) * 0.5


def dct_lee(x: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized-DCT-II via Lee butterflies: equals scipy.fft.dct(x, 2)/2.
    Power-of-2 length only (reference dct/src/dct_lee_cpu.h:127-130)."""
    N = x.shape[-1]
    assert N & (N - 1) == 0, "dct_lee requires power-of-2 length"
    return _lee_fwd(x, N, _lee_cos_tables(N))


def idct_lee(y: jnp.ndarray) -> jnp.ndarray:
    """Inverse of dct_lee (i.e. scipy.fft.dct(., 3)-dual): idct_lee(dct_lee(x))
    == (N/2)... — exact inverse up to the forward's definition; see tests."""
    N = y.shape[-1]
    assert N & (N - 1) == 0
    return _lee_inv(y, N, _lee_cos_tables(N))
