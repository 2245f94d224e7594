"""Fused Pallas resblock chain for the enhancer's lane-bound 96-channel convs.

The reference runs the LocalEnhancer's 3x3 resblock convs (models/networks.py:
214-253 via :149-153) as cuDNN calls; on this TPU the same convs are the
flagship's hotspot: XLA's in-graph lowering reaches ~60 TF/s because C=96
fills only 96/128 MXU lanes and every InstanceNorm costs an extra HBM pass
(BASELINE.md round-2 profile).

Layout: XLA stores these activations {0,3,2,1}, i.e. physically H,W,C,B with
batch minormost. A logical [H,W,C,B] ("wcb") array in default layout is the
SAME bytes, so jnp.transpose(x, (1,2,3,0)) at the chain boundary is a free
bitcast. Inside the kernel the last two dims (C,B) are the tiled ones:
batch fills all 128 lanes, C=96 fills sublanes exactly, and both spatial
dims are untiled — tap shifts are plain index arithmetic, with none of the
misaligned-slice / 16-bit-rotate blockers that killed the round-1 NHWC
kernel (ops/conv_pallas.py). (A [H,C,W,B] variant with W merged into lanes
benchmarked faster standalone but forces a real physical transpose at every
boundary in-graph — net loss; this file's git history has it.)

Fusions, per conv (all measured to matter on v5e):
* the 3x3 conv runs as per-position [C,C]x[C,B] MXU dots accumulated in f32;
* InstanceNorm statistics accumulate per row-block inside the kernel (no
  separate stats pass over HBM), are finalized in XLA ([C,B] scalars), and
  the normalize+ReLU is applied inline in the consuming conv's prologue;
* the chain-entry `relu(IN(down1)) + trunk` and the inter-block residual
  `x + IN(y)` fuse into the consuming conv's prologue as well, so those
  tensors are never materialized;
* HT rows per grid step cut the 3x-halo re-fetch of row blocks to
  (HT+2)/HT.

Numerics match models/layers.{ConvIN,instance_norm,ResnetBlock} to bf16
roundoff: f32 conv accumulation -> +bias -> bf16 (same as XLA's conv), f32
statistics of the bf16 tensor, (x - mean) * rsqrt(var + eps) normalize,
bf16 residual add. Inference-only (no vjp); the training path keeps the XLA
formulation. Requirements: B % 128 == 0, C % 8 == 0, H >= 2, W >= 3.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    """Run the kernel in interpret mode off-TPU (tests, CPU dryruns)."""
    return jax.default_backend() != "tpu"


def supports(shape, dtype, lane: int = 128) -> bool:
    """Whether the fused chain can run on an NHWC activation of this shape."""
    if len(shape) != 4:
        return False
    b, h, w, c = shape
    return (jnp.dtype(dtype) == jnp.bfloat16 and b % lane == 0 and b > 0
            and c % 8 == 0 and h >= 2 and w >= 3)


# Prologue variants: how the kernel turns its raw input rows (+ optional
# second "residual" tensor rows) into the conv's true input.
#   None        x
#   "in_relu"   relu((x - m) * s)
#   "in_relu_add"  relu((x - m) * s) + res        (chain entry)
#   "in_add"       (x - m) * s + res              (residual skip)
_PROLOGUES = (None, "in_relu", "in_relu_add", "in_add")


def _conv_kernel(C: int, W: int, B: int, H: int, HT: int,
                 prologue: Optional[str], with_res: bool):
    nrows = HT + 2

    def kernel(*refs):
        if with_res:
            (xt, xm, xb, rt, rm, rb, wt_ref, aux_ref,
             y_ref, s1_ref, s2_ref, rows_ref) = refs
        else:
            (xt, xm, xb, wt_ref, aux_ref,
             y_ref, s1_ref, s2_ref, rows_ref) = refs

        # Stage the (prologue-processed) input rows in scratch: Mosaic only
        # supports dynamic indexing on refs, and the w-loop below indexes
        # rows at traced offsets.
        for row in range(nrows):
            def pick(t, m, b, row=row):
                if row == 0:
                    return t[0]
                if row == nrows - 1:
                    return b[0]
                return m[row - 1]
            r = pick(xt, xm, xb)                       # [W, C, B] bf16
            if prologue is not None:
                rf = (r.astype(jnp.float32) - aux_ref[1][None]) \
                    * aux_ref[2][None]
                if prologue in ("in_relu", "in_relu_add"):
                    rf = jnp.maximum(rf, 0.0)
                if with_res:
                    rf = rf + pick(rt, rm, rb).astype(jnp.float32)
                r = rf.astype(jnp.bfloat16)
            rows_ref[row] = r

        s1 = jnp.zeros((C, B), jnp.float32)
        s2 = jnp.zeros((C, B), jnp.float32)
        for oh in range(HT):

            def body(w, carry):
                s1c, s2c = carry
                wm = jnp.where(w == 0, 1, w - 1)
                wp = jnp.where(w == W - 1, W - 2, w + 1)
                acc = jnp.zeros((C, B), jnp.float32)
                for dh in range(3):
                    acc += jnp.dot(wt_ref[3 * dh + 0], rows_ref[oh + dh, wm],
                                   preferred_element_type=jnp.float32)
                    acc += jnp.dot(wt_ref[3 * dh + 1], rows_ref[oh + dh, w],
                                   preferred_element_type=jnp.float32)
                    acc += jnp.dot(wt_ref[3 * dh + 2], rows_ref[oh + dh, wp],
                                   preferred_element_type=jnp.float32)
                yb = (acc + aux_ref[0]).astype(jnp.bfloat16)
                y_ref[oh, w] = yb
                yf = yb.astype(jnp.float32)
                return s1c + yf, s2c + yf * yf

            s1, s2 = jax.lax.fori_loop(0, W, body, (s1, s2))
        s1_ref[0] = s1
        s2_ref[0] = s2

    return kernel


def _row_specs(W: int, C: int, B: int, H: int, HT: int):
    """Top-halo / main / bottom-halo blocks with reflect indexing at the
    H boundaries (reflect excludes the edge row, torch ReflectionPad2d)."""
    top = pl.BlockSpec((1, W, C, B),
                       lambda i: (jnp.abs(i * HT - 1), 0, 0, 0),
                       memory_space=pltpu.VMEM)
    main = pl.BlockSpec((HT, W, C, B), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    bot = pl.BlockSpec((1, W, C, B),
                       lambda i: ((H - 1) - jnp.abs(H - 1 - (i * HT + HT)),
                                  0, 0, 0),
                       memory_space=pltpu.VMEM)
    return [top, main, bot]


def _pick_ht(H: int, with_res: bool) -> int:
    # the residual variant doubles the row operands; halve the row block to
    # stay inside the ~72 MB scoped-vmem budget (measured on v5e)
    for ht in ((2, 1) if with_res else (4, 2, 1)):
        if H % ht == 0:
            return ht
    return 1


@functools.partial(jax.jit, static_argnames=("prologue",))
def conv3x3_in_wcb(x_t: jnp.ndarray, wt: jnp.ndarray, aux: jnp.ndarray,
                   res_t: Optional[jnp.ndarray] = None,
                   prologue: Optional[str] = None):
    """Reflect-padded 3x3 conv over a [H, W, C, B] bf16 activation.

    wt:  [9, C, C] bf16 — per-tap [c_out, c_in] matrices, tap = 3*dh + dw
    aux: [3, C, B] f32 — bias (broadcast over B), prologue mean, scale
    res_t: optional second [H, W, C, B] tensor added by the *_add prologues
    Returns (y_t [H,W,C,B] bf16, s1 [Hg,C,B] f32, s2 [Hg,C,B] f32): per
    row-block sums of y and y^2 over (HT rows, W) — InstanceNorm partials.
    """
    assert prologue in _PROLOGUES, prologue
    H, W, C, B = x_t.shape
    with_res = res_t is not None
    HT = _pick_ht(H, with_res)
    specs = _row_specs(W, C, B, H, HT)
    in_specs = specs + (specs if with_res else []) + [
        pl.BlockSpec((9, C, C), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, C, B), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = (x_t, x_t, x_t) + ((res_t, res_t, res_t) if with_res else ()) \
        + (wt, aux)
    return pl.pallas_call(
        _conv_kernel(C, W, B, H, HT, prologue, with_res),
        grid=(H // HT,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((HT, W, C, B), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, W, C, B), jnp.bfloat16),
            jax.ShapeDtypeStruct((H // HT, C, B), jnp.float32),
            jax.ShapeDtypeStruct((H // HT, C, B), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((HT + 2, W, C, B), jnp.bfloat16)],
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            # the default 16 MB scoped-vmem cap is conservative (v5e allows
            # ~72 MB); the working set (double-buffered halo row blocks +
            # staging scratch + f32 prologue temps) needs more
            vmem_limit_bytes=64 * 1024 * 1024),
    )(*args)


def _finalize_stats(s1: jnp.ndarray, s2: jnp.ndarray, hw: int,
                    eps: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Row-block partials -> per-(C,B) mean and rsqrt scale (f32)."""
    mean = jnp.sum(s1, axis=0) / hw
    ex2 = jnp.sum(s2, axis=0) / hw
    var = jnp.maximum(ex2 - mean * mean, 0.0)
    return mean, jax.lax.rsqrt(var + eps)


def _pack_weights(k: jnp.ndarray) -> jnp.ndarray:
    """[3,3,Ci,Co] f32 conv kernel -> [9, Co, Ci] bf16 per-tap matrices."""
    return jnp.transpose(k, (0, 1, 3, 2)).reshape(
        9, k.shape[3], k.shape[2]).astype(jnp.bfloat16)


def _aux(bias: jnp.ndarray, mean, scale, C: int, B: int) -> jnp.ndarray:
    rows = [jnp.broadcast_to(bias.astype(jnp.float32)[:, None], (C, B))]
    rows.append(jnp.zeros((C, B), jnp.float32) if mean is None else mean)
    rows.append(jnp.ones((C, B), jnp.float32) if scale is None else scale)
    return jnp.stack(rows)


def to_wcb(x: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,C] -> [H,W,C,B]: a free bitcast — XLA already stores these
    activations {0,3,2,1}, i.e. physically H,W,C,B."""
    return jnp.transpose(x, (1, 2, 3, 0))


def from_wcb(x_t: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(x_t, (3, 0, 1, 2))


def conv_s2_raw(x: jnp.ndarray, k: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-2 pad-1 conv, NHWC, WITHOUT InstanceNorm — the enhancer's
    down1 conv whose normalize folds into the fused section's entry prologue.
    Matches flax nn.Conv(dtype=x.dtype) numerics (bf16 conv + bf16 bias)."""
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(y.dtype)


def _instance_stats(x_t: jnp.ndarray, eps: float):
    """f32 per-(C,B) InstanceNorm stats of a [H,W,C,B] tensor (one read)."""
    mean = jnp.mean(x_t, axis=(0, 1), dtype=jnp.float32)
    ex2 = jnp.mean(jnp.square(x_t.astype(jnp.float32)), axis=(0, 1),
                   dtype=jnp.float32)
    var = jnp.maximum(ex2 - mean * mean, 0.0)
    return mean, jax.lax.rsqrt(var + eps)


def fused_resblock_chain(x: jnp.ndarray,
                         blocks: List[Tuple[Tuple[jnp.ndarray, jnp.ndarray],
                                            Tuple[jnp.ndarray, jnp.ndarray]]],
                         eps: float = 1e-5) -> jnp.ndarray:
    """Sequential ResnetBlocks (reference models/networks.py:214-253) over an
    NHWC bf16 activation, convs + InstanceNorm stats fused in Pallas.

    blocks: [((k1,b1),(k2,b2)), ...] with k [3,3,C,C] f32, b [C] f32 —
    the exact ConvIN_{0,1}/Conv_0 params of models/layers.ResnetBlock.
    """
    B, H, W, C = x.shape
    hw = H * W
    cur = to_wcb(x)
    for (k1, b1), (k2, b2) in blocks:
        y1, s1a, s2a = conv3x3_in_wcb(cur, _pack_weights(k1),
                                      _aux(b1, None, None, C, B),
                                      prologue=None)
        m1, sc1 = _finalize_stats(s1a, s2a, hw, eps)
        y2, s1b, s2b = conv3x3_in_wcb(y1, _pack_weights(k2),
                                      _aux(b2, m1, sc1, C, B),
                                      prologue="in_relu")
        m2, sc2 = _finalize_stats(s1b, s2b, hw, eps)
        # residual: cur + IN(y2), bf16 add like the XLA path
        h_bf = ((y2.astype(jnp.float32) - m2[None, None])
                * sc2[None, None]).astype(jnp.bfloat16)
        cur = cur + h_bf
    return from_wcb(cur)


def fused_enhancer_section(down1_raw: jnp.ndarray, trunk_out: jnp.ndarray,
                           blocks, eps: float = 1e-5) -> jnp.ndarray:
    """The enhancer mid-section `h = relu(IN(down1)) + out` followed by the
    resblock chain (reference models/networks.py:149-153 and :176-177),
    with the entry normalize+add and every inter-block residual fused into
    the consuming conv's prologue — those tensors are never materialized.

    down1_raw: conv output of enh{n}_down1 BEFORE InstanceNorm, NHWC bf16.
    trunk_out: the coarse branch output to add, NHWC bf16 (already
    IN+ReLU'd by the trunk). Returns the chain output, NHWC bf16.
    """
    B, H, W, C = down1_raw.shape
    hw = H * W
    d_t = to_wcb(down1_raw)
    o_t = to_wcb(trunk_out)
    m0, s0 = _instance_stats(d_t, eps)

    def skip_apply(base, y, m, s):
        h_bf = ((y.astype(jnp.float32) - m[None, None])
                * s[None, None]).astype(jnp.bfloat16)
        return base + h_bf

    cur = None  # materialized lazily (only needed by the residual adds)
    prev = (d_t, o_t, m0, s0)  # entry: relu(IN(d)) + o fused into conv1
    for bi, ((k1, b1), (k2, b2)) in enumerate(blocks):
        if bi == 0:
            y1, s1a, s2a = conv3x3_in_wcb(
                d_t, _pack_weights(k1), _aux(b1, m0, s0, C, B),
                res_t=o_t, prologue="in_relu_add")
            # materialize the entry tensor once for the residual adds
            hin = ((d_t.astype(jnp.float32) - m0[None, None]) * s0[None, None])
            cur = (jnp.maximum(hin, 0.0).astype(jnp.bfloat16) + o_t)
        else:
            # cur was just produced by the previous block's skip
            y1, s1a, s2a = conv3x3_in_wcb(
                cur, _pack_weights(k1), _aux(b1, None, None, C, B),
                prologue=None)
        m1, sc1 = _finalize_stats(s1a, s2a, hw, eps)
        y2, s1b, s2b = conv3x3_in_wcb(y1, _pack_weights(k2),
                                      _aux(b2, m1, sc1, C, B),
                                      prologue="in_relu")
        m2, sc2 = _finalize_stats(s1b, s2b, hw, eps)
        cur = skip_apply(cur, y2, m2, sc2)
    return from_wcb(cur)
