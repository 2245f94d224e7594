"""Overlapping framing and overlap-add as pure reshapes.

The reference frames with `Tensor.unfold` and inverts with
`torch.nn.functional.fold` (reference models/mdct.py:391, :447-448). On TPU a
strided gather is the wrong shape for XLA; when win_length is a multiple of
hop_length (every reference config: 512/256, 1024/512) framing is exactly a
blocked reshape plus static slices, and overlap-add is hop-sized block adds —
both fuse into the surrounding matmuls with zero gather/scatter traffic.
"""

from __future__ import annotations

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
    `unfold(-1, win, hop)` (reference models/mdct.py:391). Requires hop | win."""
    assert win % hop == 0, f"win_length {win} must be a multiple of hop_length {hop}"
    m = win // hop
    L = signal.shape[-1]
    n_blocks = L // hop
    T = n_blocks - m + 1
    assert T >= 1, f"signal too short to frame: L={L}, win={win}"
    blocks = signal[..., : n_blocks * hop].reshape(signal.shape[:-1] + (n_blocks, hop))
    parts = [blocks[..., i : i + T, :] for i in range(m)]
    return jnp.concatenate(parts, axis=-1)


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """[..., T, win] -> [..., (T-1)*hop + win], matching F.fold OLA
    (reference models/mdct.py:447-448). Requires hop | win."""
    win = frames.shape[-1]
    T = frames.shape[-2]
    assert win % hop == 0
    m = win // hop
    lead = frames.shape[:-2]
    out_blocks = T + m - 1
    acc = jnp.zeros(lead + (out_blocks, hop), dtype=frames.dtype)
    chunks = frames.reshape(lead + (T, m, hop))
    zeros_block = jnp.zeros(lead + (1, hop), dtype=frames.dtype)
    for i in range(m):
        part = chunks[..., :, i, :]  # [..., T, hop] lands at block offset i
        if i > 0:
            part = jnp.concatenate([jnp.broadcast_to(zeros_block, lead + (i, hop)), part], axis=-2)
        if out_blocks - T - i > 0:
            part = jnp.concatenate(
                [part, jnp.broadcast_to(zeros_block, lead + (out_blocks - T - i, hop))], axis=-2)
        acc = acc + part
    return acc.reshape(lead + (out_blocks * hop,))


def center_crop(signal: jnp.ndarray, win: int) -> jnp.ndarray:
    """Remove win//2 from both ends (reference models/mdct.py:450-452)."""
    return signal[..., win // 2 : -(win // 2)]
