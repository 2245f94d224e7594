"""Space-to-depth convolution for tiny channel counts (experiment).

The enhancer's full-resolution convs (2->48 first layer, 48->2 final layer,
reference models/networks.py:145, :160) waste the 128-lane MXU: a 2-channel
operand occupies 2 lanes. Folding an s x s spatial block into channels makes
both operands lane-dense at the cost of ~5x redundant FLOPs (the block kernel
is sparse).

Measured on v5e (benchmarks/conv_experiments.py): the FLOP inflation plus the
s2d relayout transposes LOSE to XLA's native conv lowering (48->2 @512x128:
14.7 ms s2d vs 8.4 ms XLA), so this is NOT wired into the model; it is kept as
a verified-correct experiment (s2d_conv == lax.conv to f32 roundoff) and a
starting point for a true Pallas conv+IN epilogue kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _block_gather_indices(k: int, s: int):
    """Static index arrays mapping conv taps into the block kernel:
    wb[bh, bw, (qh*s+qw)*ci+i, (ph*s+pw)*co+o] = w[s*bh+qh-ph, s*bw+qw-pw, i, o]
    (zero when the tap index falls outside [0, k)). Out-of-range indices point
    at a zero padding row k."""
    kb = -(-(k + s - 1) // s)
    b = np.arange(kb)[:, None, None]
    q = np.arange(s)[None, :, None]
    p = np.arange(s)[None, None, :]
    d = s * b + q - p                       # [kb, s(q), s(p)]
    idx = np.where((d >= 0) & (d < k), d, k)  # k -> zero pad row
    return idx, kb


def make_block_kernel(w: jnp.ndarray, s: int) -> jnp.ndarray:
    """Transform conv weights [k, k, ci, co] -> block weights
    [kb, kb, s*s*ci, s*s*co]. Jit-traceable: one gather with static indices."""
    k, _, ci, co = w.shape
    idx, kb = _block_gather_indices(k, s)
    wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))  # zero row/col at k
    # gather -> [kb, s(qh), s(ph), kb, s(qw), s(pw), ci, co]
    g = wp[idx][:, :, :, idx]
    # reorder to [bh, bw, qh, qw, ci, ph, pw, co]
    g = g.transpose(0, 3, 1, 4, 6, 2, 5, 7)
    return g.reshape(kb, kb, s * s * ci, s * s * co)


def space_to_depth(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H//s, W//s, s*s*C] (H, W divisible by s)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // s, s, w // s, s, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // s, w // s, s * s * c)


def depth_to_space(x: jnp.ndarray, s: int) -> jnp.ndarray:
    b, hb, wb, c = x.shape
    cc = c // (s * s)
    x = x.reshape(b, hb, wb, s, s, cc)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hb * s, wb * s, cc)


def s2d_conv(x_padded: jnp.ndarray, w, s: int = 8) -> jnp.ndarray:
    """VALID conv of pre-padded input [B, Hp, Wp, ci] with [k, k, ci, co]
    weights via space-to-depth. Output [B, Hp-k+1, Wp-k+1, co]; the output
    spatial dims must be divisible by s."""
    k = w.shape[0]
    ci, co = w.shape[2], w.shape[3]
    b, hp, wp, _ = x_padded.shape
    oh, ow = hp - k + 1, wp - k + 1
    assert oh % s == 0 and ow % s == 0, (oh, ow, s)
    kb = -(-(k + s - 1) // s)
    # zero-pad the input so every block window is in range
    need_h, need_w = (oh // s + kb - 1) * s + s, (ow // s + kb - 1) * s + s
    x_padded = jnp.pad(x_padded, ((0, 0), (0, max(0, need_h - hp)),
                                  (0, max(0, need_w - wp)), (0, 0)))
    xb = space_to_depth(x_padded, s)
    wb = make_block_kernel(jnp.asarray(w), s).astype(x_padded.dtype)
    yb = jax.lax.conv_general_dilated(
        xb, wb, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    yb = yb[:, : oh // s, : ow // s, :].astype(x_padded.dtype)
    return depth_to_space(yb, s)
