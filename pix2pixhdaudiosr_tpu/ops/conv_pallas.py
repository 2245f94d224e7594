"""Pallas 3x3 stride-1 convolution (NHWC) — experiment, not wired in.

Measured on v5e (resblock shape [64, 256, 64, 96] bf16): this kernel reaches
32 TF/s vs XLA's conv at ~86 TF/s, which is already near the ~110 TF/s
96->128 lane-padding bound — the per-tap sublane rolls and f32<->bf16 casts
(Mosaic cannot rotate 16-bit data) eat the margin. Conclusion recorded in
BASELINE.md: XLA's conv lowering on this backend is close to optimal for
these shapes; kernel kept as a correct, tested reference for the DMA-slab +
roll-accumulate pattern.

Input must be pre-padded by 1 on H and W (reflect or zero — caller's choice,
preserving the reference's padding semantics). Matches lax.conv to bf16
accumulation tolerance; tested in interpret mode and on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(th: int, w_out: int, c_in: int, c_out: int, rows: int,
            w_pad: int, relu: bool):
    def kernel(x_ref, w_ref, out_ref, slab, sem):
        b = pl.program_id(0)
        j = pl.program_id(1)
        copy = pltpu.make_async_copy(
            x_ref.at[b, pl.ds(j * th, rows), :, :], slab, sem)
        copy.start()
        copy.wait()
        # Mosaic cannot rotate 16-bit data; roll in f32 and cast each slice
        # back for the bf16 MXU passes (f32 accumulation either way).
        x = slab[:].astype(jnp.float32)  # [rows, w_pad, c_in]
        acc = None
        for dh in range(3):
            for dw in range(3):
                part = x if dw == 0 else pltpu.roll(x, w_pad - dw, axis=1)
                lhs = part[dh : dh + th, :w_out, :].reshape(th * w_out, c_in)
                contrib = jnp.dot(lhs.astype(w_ref.dtype), w_ref[dh, dw, :, :],
                                  preferred_element_type=jnp.float32)
                acc = contrib if acc is None else acc + contrib
        y = acc.reshape(th, w_out, c_out)
        if relu:
            y = jnp.maximum(y, 0.0)
        out_ref[0] = y.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("th", "relu"))
def conv3x3_pallas(x_padded: jnp.ndarray, w: jnp.ndarray, th: int = 64,
                   relu: bool = False) -> jnp.ndarray:
    """VALID 3x3 stride-1 conv of a pre-padded [B, H+2, W+2, Ci] input with
    [3, 3, Ci, Co] weights -> [B, H, W, Co]. H must be divisible by `th`."""
    b, hp, wp, ci = x_padded.shape
    h, w_out = hp - 2, wp - 2
    co = w.shape[-1]
    assert h % th == 0, (h, th)
    rows = _round_up(th + 2, 8)
    need = (h // th - 1) * th + rows
    # DMA windows must be 8-aligned on the sublane (W) dim and 128-aligned on
    # the lane (C) dim; pad both (zero channels contribute zero)
    wp8 = _round_up(wp, 8)
    ci128 = _round_up(ci, 128)
    x_padded = jnp.pad(x_padded, ((0, 0), (0, max(0, need - hp)),
                                  (0, wp8 - wp), (0, ci128 - ci)))
    w = jnp.pad(w, ((0, 0), (0, 0), (0, ci128 - ci), (0, 0)))
    wp, ci = wp8, ci128
    return pl.pallas_call(
        _kernel(th, w_out, ci, co, rows, wp, relu),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, 3, ci, co), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w_out, co), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w_out, co), x_padded.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, wp, ci), x_padded.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(x_padded, w.astype(x_padded.dtype))
