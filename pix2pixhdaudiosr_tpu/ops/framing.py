"""Overlapping framing and overlap-add as pure reshapes.

The reference frames with `Tensor.unfold` and inverts with
`torch.nn.functional.fold` (reference models/mdct.py:391, :447-448). On TPU a
strided gather is the wrong shape for XLA; instead the signal is blocked into
gcd(win, hop)-sample cells, and framing is a blocked reshape plus static
(strided) slices while overlap-add is cell-aligned block adds — both fuse
into the surrounding matmuls with zero gather/scatter traffic. When
win_length is a multiple of hop_length (every reference config: 512/256,
1024/512) the cell IS the hop and the strides are unit; non-dividing codecs
(e.g. 512/160) take the same code path with a smaller cell.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def pad_signal(signal: jnp.ndarray, hop: int, center: bool,
               pad_mode: str = "constant") -> jnp.ndarray:
    """Reference MDCT pre-pad (reference models/mdct.py:379-388): start pad of
    `hop` when centered, end pad to the next hop multiple (plus the start pad)."""
    s = signal.shape[-1]
    start = hop if center else 0
    extra = s % hop
    end = start + (hop - extra if extra else 0)
    if start == 0 and end == 0:
        return signal
    pad = [(0, 0)] * (signal.ndim - 1) + [(start, end)]
    mode = {"constant": "constant", "reflect": "reflect", "replicate": "edge"}[pad_mode]
    return jnp.pad(signal, pad, mode=mode)


def frame(signal: jnp.ndarray, win: int, hop: int) -> jnp.ndarray:
    """[..., L] -> [..., T, win] with T = (L - win)//hop + 1, matching
    `unfold(-1, win, hop)` (reference models/mdct.py:391)."""
    g = math.gcd(win, hop)
    m, h = win // g, hop // g          # frame spans m cells, advances h cells
    L = signal.shape[-1]
    n_cells = L // g
    T = (n_cells - m) // h + 1
    assert T >= 1, f"signal too short to frame: L={L}, win={win}"
    cells = signal[..., : n_cells * g].reshape(signal.shape[:-1] + (n_cells, g))
    parts = [cells[..., i : i + (T - 1) * h + 1 : h, :] for i in range(m)]
    return jnp.concatenate(parts, axis=-1)


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """[..., T, win] -> [..., (T-1)*hop + win], matching F.fold OLA
    (reference models/mdct.py:447-448)."""
    win = frames.shape[-1]
    T = frames.shape[-2]
    g = math.gcd(win, hop)
    m, h = win // g, hop // g
    lead = frames.shape[:-2]
    out_cells = (T - 1) * h + m
    acc = jnp.zeros(lead + (out_cells, g), dtype=frames.dtype)
    chunks = frames.reshape(lead + (T, m, g))

    def zeros(rows):
        return jnp.zeros(lead + (rows, g), dtype=frames.dtype)

    for i in range(m):
        part = chunks[..., :, i, :]    # [..., T, g]: frame t's cell i lands
        if h > 1:                      # at cell offset t*h + i
            part = jnp.concatenate(
                [part[..., :, None, :],
                 jnp.zeros(lead + (T, h - 1, g), dtype=frames.dtype)],
                axis=-2).reshape(lead + (T * h, g))
        rows = part.shape[-2]          # == T*h (or T when h == 1)
        if i:
            part = jnp.concatenate([zeros(i), part], axis=-2)
        tail = out_cells - i - rows    # i + T*h vs out_cells: +/- (m - i - h)
        if tail > 0:
            part = jnp.concatenate([part, zeros(tail)], axis=-2)
        elif tail < 0:                 # only the h-1 zero rows after the last
            part = part[..., :out_cells, :]  # frame's cell are trimmed
        acc = acc + part
    return acc.reshape(lead + (out_cells * g,))


def center_crop(signal: jnp.ndarray, win: int) -> jnp.ndarray:
    """Remove win//2 from both ends (reference models/mdct.py:450-452)."""
    return signal[..., win // 2 : -(win // 2)]
