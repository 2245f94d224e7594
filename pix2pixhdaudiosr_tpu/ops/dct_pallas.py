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


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _mdct_kernel(m: int, hop: int, t_tile: int, n_fft: int, rows: int):
    def kernel(sig_ref, basis_ref, out_ref, scratch, sem):
        b = pl.program_id(0)
        j = pl.program_id(1)
        start = j * t_tile
        copy = pltpu.make_async_copy(
            sig_ref.at[b, pl.ds(start, rows), :],
            scratch, sem)
        copy.start()
        copy.wait()
        blocks = scratch[:]                                   # [rows, hop]
        # frames[t] = concat(blocks[t : t+m]); rather than a sublane-offset
        # concat (unsupported by Mosaic), accumulate m aligned matmuls:
        # out = sum_i roll(blocks, -i)[:t_tile] @ basis[i*hop : (i+1)*hop]
        acc = None
        for i in range(m):
            part = blocks if i == 0 else pltpu.roll(blocks, rows - i, axis=0)
            contrib = jnp.dot(part[:t_tile, :],
                              basis_ref[i * hop : (i + 1) * hop, :],
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
            acc = contrib if acc is None else acc + contrib
        out_ref[0, :, :] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("hop", "win", "t_tile"))
def fused_mdct2(signal_padded: jnp.ndarray, basis: jnp.ndarray, hop: int,
                win: int, t_tile: int = 128) -> jnp.ndarray:
    """signal_padded: [B, L] already reference-padded (ops/framing.pad_signal)
    with L a multiple of hop; basis: [win, n_fft] fused window*DCT/n basis.
    Returns [B, T, n_fft]. The signal is viewed as [B, L//hop, hop] blocks in
    HBM; each program DMAs its t_tile+m-1 block rows into VMEM, forms the
    overlapped frames with static slices, and runs one MXU matmul."""
    B, L = signal_padded.shape
    m = win // hop
    n_fft = basis.shape[1]
    T = L // hop - m + 1
    assert T % t_tile == 0, (T, t_tile)
    assert t_tile % 8 == 0, t_tile
    # DMA slices must be sublane(8)-aligned: round the per-program row window
    # up and zero-pad the block view so the last window stays in bounds
    rows = _round_up(t_tile + m - 1, 8)
    n_blocks = L // hop
    need = (T // t_tile - 1) * t_tile + rows
    sig_blocks = signal_padded.reshape(B, n_blocks, hop)
    if need > n_blocks:
        sig_blocks = jnp.pad(sig_blocks, ((0, 0), (0, need - n_blocks), (0, 0)))
    grid = (B, T // t_tile)
    return pl.pallas_call(
        _mdct_kernel(m, hop, t_tile, n_fft, rows),
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
            pltpu.VMEM((rows, hop), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(sig_blocks.astype(jnp.float32), basis.astype(jnp.float32))


def _imdct_kernel(m: int, hop: int, T: int, b_tile: int, n_fft: int):
    win = m * hop

    def kernel(spec_ref, basis_ref, out_ref):
        y = jnp.dot(spec_ref[:].reshape(b_tile * T, n_fft), basis_ref[:, :],
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)    # [b*T, win]
        chunks = y.reshape(b_tile, T, m, hop)
        # overlap-add: out block j (of T + m - 1) = sum_i chunks[:, j-i, i]
        acc = jnp.zeros((b_tile, T + m - 1, hop), jnp.float32)
        for i in range(m):
            part = jnp.pad(chunks[:, :, i, :], ((0, 0), (i, m - 1 - i), (0, 0)))
            acc = acc + part
        out_ref[:] = acc.reshape(b_tile, (T + m - 1) * hop)

    return kernel


@functools.partial(jax.jit, static_argnames=("hop", "win", "b_tile"))
def fused_imdct2(spec: jnp.ndarray, basis: jnp.ndarray, hop: int, win: int,
                 b_tile: int = 8) -> jnp.ndarray:
    """spec: [B, T, n_fft]; basis: [n_fft, win] fused IDCT/2*window basis.
    Returns the un-cropped overlap-add [B, (T-1)*hop + win]. Each program
    handles `b_tile` batch rows (TPU block tiling needs the penultimate output
    dim divisible by 8); the full T stays in one program so the overlap-add
    never crosses programs."""
    B, T, n_fft = spec.shape
    m = win // hop
    while B % b_tile:
        b_tile //= 2
    out_len = (T - 1) * hop + win
    return pl.pallas_call(
        _imdct_kernel(m, hop, T, b_tile, n_fft),
        grid=(B // b_tile,),
        in_specs=[
            pl.BlockSpec((b_tile, T, n_fft), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, win), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_tile, out_len), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, out_len), jnp.float32),
    )(spec.astype(jnp.float32), basis.astype(jnp.float32))
