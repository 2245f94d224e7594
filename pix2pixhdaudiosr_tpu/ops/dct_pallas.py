"""Pallas TPU kernels for the lapped-transform hot path.

The reference accelerates its transforms with CUDA kernels around cuFFT
(reference dct/src/dct_cuda_kernel.cu, dct2_fft2_cuda.cpp). The TPU analog
fuses the whole MDCT pipeline into ONE kernel each way:

  * fused_mdct2: HBM signal slice -> (DMA) VMEM -> overlap framing as
    reshapes -> windowed-DCT basis matmul on the MXU -> spectrogram tile.
    The XLA path materializes the [B, T, win] frame tensor in HBM between
    the framing concat and the matmul; the kernel keeps frames in VMEM.
  * fused_imdct2: spectrogram tile -> inverse-basis matmul -> overlap-add
    in VMEM -> waveform tile. (XLA likewise materializes y-frames.)

Both use the fused window-in-basis formulation of ops/mdct.py, require
win_length % hop_length == 0, and are numerically identical to the jnp path
(tested in interpret mode and against golden values).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mdct_kernel(m: int, hop: int, t_tile: int, n_fft: int):
    win = m * hop

    def kernel(sig_ref, basis_ref, out_ref, scratch, sem):
        b = pl.program_id(0)
        j = pl.program_id(1)
        start = j * t_tile * hop
        copy = pltpu.make_async_copy(
            sig_ref.at[b, pl.ds(start, (t_tile + m - 1) * hop)],
            scratch, sem)
        copy.start()
        copy.wait()
        blocks = scratch[:].reshape(t_tile + m - 1, hop)
        frames = jnp.concatenate(
            [jax.lax.slice_in_dim(blocks, i, i + t_tile, axis=0)
             for i in range(m)], axis=1)                      # [t_tile, win]
        out_ref[0, :, :] = jnp.dot(frames, basis_ref[:, :],
                                   preferred_element_type=jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("hop", "win", "t_tile"))
def fused_mdct2(signal_padded: jnp.ndarray, basis: jnp.ndarray, hop: int,
                win: int, t_tile: int = 128) -> jnp.ndarray:
    """signal_padded: [B, L] already reference-padded (ops/framing.pad_signal)
    with L a multiple of hop; basis: [win, n_fft] fused window*DCT/n basis.
    Returns [B, T, n_fft]."""
    B, L = signal_padded.shape
    m = win // hop
    n_fft = basis.shape[1]
    T = L // hop - m + 1
    assert T % t_tile == 0, (T, t_tile)
    grid = (B, T // t_tile)
    return pl.pallas_call(
        _mdct_kernel(m, hop, t_tile, n_fft),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # whole signal in HBM
            pl.BlockSpec((win, n_fft), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile, n_fft), lambda b, j: (b, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, n_fft), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(((t_tile + m - 1) * hop,), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(signal_padded.astype(jnp.float32), basis.astype(jnp.float32))


def _imdct_kernel(m: int, hop: int, t_tile: int):
    win = m * hop

    def kernel(spec_ref, basis_ref, out_ref):
        y = jnp.dot(spec_ref[0, :, :], basis_ref[:, :],
                    preferred_element_type=jnp.float32)       # [t_tile, win]
        chunks = y.reshape(t_tile, m, hop)
        # overlap-add: out block j (of t_tile + m - 1) = sum_i chunks[j-i, i]
        acc = jnp.zeros((t_tile + m - 1, hop), jnp.float32)
        for i in range(m):
            part = chunks[:, i, :]
            pad_lo = i
            pad_hi = m - 1 - i
            part = jnp.pad(part, ((pad_lo, pad_hi), (0, 0)))
            acc = acc + part
        out_ref[0, :] = acc.reshape((t_tile + m - 1) * hop)

    return kernel


@functools.partial(jax.jit, static_argnames=("hop", "win", "t_tile"))
def fused_imdct2(spec: jnp.ndarray, basis: jnp.ndarray, hop: int, win: int,
                 t_tile: Optional[int] = None) -> jnp.ndarray:
    """spec: [B, T, n_fft]; basis: [n_fft, win] fused IDCT/2*window basis.
    Returns the un-cropped overlap-add [B, (T-1)*hop + win]. NOTE: tiles along
    T must currently cover the whole T (t_tile == T) so the overlap-add stays
    in one program per batch row; T == 128 frames in the production config."""
    B, T, n_fft = spec.shape
    m = win // hop
    if t_tile is None:
        t_tile = T
    assert t_tile == T, "tiled IMDCT overlap-add across programs not yet supported"
    out_len = (T - 1) * hop + win
    return pl.pallas_call(
        _imdct_kernel(m, hop, t_tile),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, n_fft), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, win), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_len), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, out_len), jnp.float32),
    )(spec.astype(jnp.float32), basis.astype(jnp.float32))
