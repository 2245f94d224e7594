"""Shared layers: reflection padding, affine-free InstanceNorm, the exact
AvgPool used by the reference pyramids, and the 0.02-normal conv init
(reference models/networks.py:10-16, :22, :165, :308).

All modules run NHWC (TPU-native layout); the reference is NCHW.

Context parallelism (`cp_axis` set): the W (frame) axis is sharded over a mesh
axis. Every layer performs its OWN per-layer halo exchange the size of its
kernel radius via jax.lax.ppermute (textbook conv CP) and reproduces the exact
global padding semantics at the ends of the axis (reflect for reflect-padded
convs, zeros for zero-padded/transposed convs), so local blocks stay
bit-aligned with the unsharded computation at every layer, and InstanceNorm
moments only need a pmean. See parallel/halo.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# Conv weight init: normal(0, 0.02) (reference models/networks.py:10-13).
conv_init = nn.initializers.normal(stddev=0.02)


class _ConvParams(nn.Module):
    """Parameter-only holder so custom conv formulations keep the exact
    nn.Conv/nn.ConvTranspose param tree (ConvIN_i/Conv_0/{kernel,bias}) —
    checkpoints, TP extraction (parallel/tp.py) and the ladder param-count
    oracle all key on those paths."""
    kshape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        k = self.param("kernel", conv_init, self.kshape, jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.kshape[-1],),
                       jnp.float32)
        return k, b


def _make_toeplitz_t(w: jnp.ndarray, S: int) -> jnp.ndarray:
    """[k,k,ci,co] -> [k, S+k-1, ci, S*co] banded kernel spanning an S-wide
    time tile: W2[dh, t_in, i, t_out*co+o] = w[dh, t_in-t_out, i, o]."""
    k, _, ci, co = w.shape
    d = np.arange(S + k - 1)[:, None] - np.arange(S)[None, :]
    idx = np.where((d >= 0) & (d < k), d, k)      # k -> zero row
    wp = jnp.pad(w, ((0, 0), (0, 1), (0, 0), (0, 0)))
    g = wp[:, idx]                                # [k, S+k-1, S, ci, co]
    g = jnp.moveaxis(g, 3, 2)                     # [k, S+k-1, ci, S, co]
    return g.reshape(k, S + k - 1, ci, S * co)


def conv_toeplitz_t(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray,
                    S: int = 16) -> jnp.ndarray:
    """VALID conv of pre-padded x [B,Hp,Wp,ci] with w [k,k,ci,co] via a
    kernel spanning an S-wide tile of the time (W) axis, so the MXU matmul's
    lane dim is S*co instead of co. Measured 2.1x faster than XLA's lowering
    for the enhancer's full-res 48->2 conv (benchmarks/conv_experiments2.py:
    10.9 -> 5.2 ms at batch 64 on v5e); exact to f32 roundoff."""
    k = w.shape[0]
    co = w.shape[3]
    B, Hp, Wp, _ = x.shape
    H, W = Hp - k + 1, Wp - k + 1
    w2 = _make_toeplitz_t(w, S).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w2, (1, S), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(B, H, W // S, S, co).reshape(B, H, W, co)
    return y + bias.astype(y.dtype)


def conv_subpixel_transpose(x: jnp.ndarray, w: jnp.ndarray,
                            bias: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose(3x3, stride 2, SAME, no kernel flip) as ONE stride-1
    2x2 conv producing 4 output phases + depth-to-space, avoiding the
    zero-dilated-input lowering. lax.conv_transpose maps
    out[u,v] += w[p,q] x[i,j] at u = 2i+2-p, so phase a = u%2 uses taps
    p%2 == a at input offset (a+p)//2 into a top/left-padded x. Exact;
    faster than XLA's lowering for the 192->96 full-res trunk deconv
    (benchmarks/conv_experiments3.py)."""
    B, H, W, ci = x.shape
    co = w.shape[-1]
    wk = jnp.zeros((2, 2, ci, 2, 2, co), w.dtype)
    for a in (0, 1):
        for b in (0, 1):
            for p in range(3):
                if (a + p) % 2:
                    continue
                for q in range(3):
                    if (b + q) % 2:
                        continue
                    wk = wk.at[(a + p) // 2, (b + q) // 2, :, a, b, :].add(
                        w[p, q])
    wk = wk.reshape(2, 2, ci, 4 * co).astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, wk, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(B, H, W, 2, 2, co)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, co)
    return y + bias.astype(y.dtype)


def reflect_pad(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """nn.ReflectionPad2d(p) on NHWC."""
    return jnp.pad(x, [(0, 0), (p, p), (p, p), (0, 0)], mode="reflect")


def conv_reflect_same(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray,
                      toeplitz_s: Optional[int] = None) -> jnp.ndarray:
    """Reflect-padded SAME conv WITHOUT materializing the padded input.

    jnp.pad(mode="reflect") on the activation costs a full HBM read+write
    (~400 MB per enhancer-resblock conv at batch 64) and misaligns W off the
    8-sublane tile (64 -> 66). Instead: zero padding fused into the conv's
    padding spec (free on the MXU path) + four thin border-correction strips
    that add exactly the reflected out-of-range taps. Top/bottom strips hold
    the reflected rows (xpad rows 0..r-1 / H+r..H+2r-1) with col-reflect
    padding so corner taps are included there; left/right strips use the
    conv's ZERO row padding so those corner taps aren't double-counted. The
    correction adds are zero-pads of [B,r,W,co]-sized tensors that XLA fuses
    into the epilogue. Exact to f32 roundoff (tests/test_fast_conv.py).

    toeplitz_s: additionally lane-pack the time axis (see conv_toeplitz_t)
    with the zero padding folded into the strided conv; the output tiling
    works out because (W + 2r - (S+k-1))/S + 1 == W/S.
    """
    k = w.shape[0]
    r = k // 2
    B, H, W, _ = x.shape
    co = w.shape[-1]
    dn = ("NHWC", "HWIO", "NHWC")
    if toeplitz_s:
        S = toeplitz_s
        w2 = _make_toeplitz_t(w, S).astype(x.dtype)
        y = jax.lax.conv_general_dilated(x, w2, (1, S), [(r, r), (r, r)],
                                         dimension_numbers=dn)
        y = y.reshape(B, H, W // S, S, co).reshape(B, H, W, co)
    else:
        y = jax.lax.conv_general_dilated(x, w, (1, 1), [(r, r), (r, r)],
                                         dimension_numbers=dn)
    vt = x[:, 1:r + 1][:, ::-1]
    vb = x[:, H - 1 - r:H - 1][:, ::-1]
    vt = jnp.pad(vt, [(0, 0), (0, 0), (r, r), (0, 0)], mode="reflect")
    vb = jnp.pad(vb, [(0, 0), (0, 0), (r, r), (0, 0)], mode="reflect")
    ct = jax.lax.conv_general_dilated(vt, w, (1, 1), [(0, k - 1), (0, 0)],
                                      dimension_numbers=dn)
    cb = jax.lax.conv_general_dilated(vb, w, (1, 1), [(k - 1, 0), (0, 0)],
                                      dimension_numbers=dn)
    vl = x[:, :, 1:r + 1][:, :, ::-1]
    vr = x[:, :, W - 1 - r:W - 1][:, :, ::-1]
    cl = jax.lax.conv_general_dilated(vl, w, (1, 1), [(r, r), (0, k - 1)],
                                      dimension_numbers=dn)
    cr = jax.lax.conv_general_dilated(vr, w, (1, 1), [(r, r), (k - 1, 0)],
                                      dimension_numbers=dn)
    y = y + jnp.pad(ct, [(0, 0), (0, H - r), (0, 0), (0, 0)])
    y = y + jnp.pad(cb, [(0, 0), (H - r, 0), (0, 0), (0, 0)])
    y = y + jnp.pad(cl, [(0, 0), (0, 0), (0, W - r), (0, 0)])
    y = y + jnp.pad(cr, [(0, 0), (0, 0), (W - r, 0), (0, 0)])
    return y + bias.astype(y.dtype)


def cp_pad_w(x: jnp.ndarray, radius: int, axis_name: str,
             mode: str = "zeros") -> jnp.ndarray:
    """Pad the W axis (axis 2) of a frame-sharded block by `radius` with the
    neighbors' edge frames (ppermute over ICI); the global-boundary shards pad
    with zeros or their own reflection, matching the unsharded model's padding."""
    if radius == 0:
        return x
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    right_edge = x[:, :, -radius:, :]
    left_edge = x[:, :, :radius, :]
    from_left = jax.lax.ppermute(right_edge, axis_name,
                                 [(i, i + 1) for i in range(n - 1)])
    from_right = jax.lax.ppermute(left_edge, axis_name,
                                  [(i + 1, i) for i in range(n - 1)])
    if mode == "reflect":
        # reflect excludes the edge sample itself (torch ReflectionPad2d)
        refl_left = x[:, :, 1 : radius + 1, :][:, :, ::-1, :]
        refl_right = x[:, :, -radius - 1 : -1, :][:, :, ::-1, :]
        from_left = jnp.where(idx == 0, refl_left, from_left)
        from_right = jnp.where(idx == n - 1, refl_right, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=2)


def instance_norm(x: jnp.ndarray, eps: float = 1e-5,
                  cp_axis: Optional[str] = None) -> jnp.ndarray:
    """InstanceNorm2d(affine=False) (reference models/networks.py:22): per
    (sample, channel) statistics over H, W. Stats accumulate in f32 inside
    the reductions (dtype=...) so no f32 copy of a bf16 activation is ever
    materialized — both moments come from one fused read and the normalize
    is a second read+write, the HBM floor (measured ~40% faster grads than
    the centered two-pass formulation; benchmarks/in_experiments.py). Under
    frame-axis context parallelism the moments are pmean'd across equal-sized
    shards (exact, since per-layer halo exchange keeps each shard's block
    identical to its slice of the unsharded activation)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    ex2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(1, 2),
                   keepdims=True, dtype=jnp.float32)
    if cp_axis is not None:
        mean = jax.lax.pmean(mean, cp_axis)
        ex2 = jax.lax.pmean(ex2, cp_axis)
    var = jnp.maximum(ex2 - mean * mean, 0.0)
    scale = jax.lax.rsqrt(var + eps)
    return ((x.astype(jnp.float32) - mean) * scale).astype(x.dtype)


@functools.lru_cache(maxsize=32)
def _avgpool_counts(h: int, w: int) -> np.ndarray:
    """Window-valid counts for AvgPool2d(3, stride=2, padding=1,
    count_include_pad=False) (reference models/networks.py:165, :308)."""
    ones = np.ones((h, w), np.float32)
    padded = np.pad(ones, 1)
    oh, ow = (h + 2 - 3) // 2 + 1, (w + 2 - 3) // 2 + 1
    counts = np.zeros((oh, ow), np.float32)
    for i in range(oh):
        for j in range(ow):
            counts[i, j] = padded[2 * i : 2 * i + 3, 2 * j : 2 * j + 3].sum()
    return counts


def _pool9(padded: jnp.ndarray, oh: int, ow: int) -> jnp.ndarray:
    """Sum of nine shifted strided slices (not lax.reduce_window, whose
    add-monoid lacks a linearization rule when nested inside an outer vjp
    trace on jax 0.9; slices+adds are fully differentiable and fuse)."""
    summed = None
    for di in range(3):
        for dj in range(3):
            part = padded[:, di : di + 2 * oh - 1 : 2, dj : dj + 2 * ow - 1 : 2, :]
            summed = part if summed is None else summed + part
    return summed


def avg_pool_3s2(x: jnp.ndarray, cp_axis: Optional[str] = None) -> jnp.ndarray:
    """AvgPool2d(3, stride=2, padding=1, count_include_pad=False) on NHWC.
    In CP mode the W axis pads by neighbor exchange and the count matrix marks
    only the true global boundary columns as partial windows."""
    h, w = x.shape[1], x.shape[2]
    oh, ow = (h - 1) // 2 + 1, (w - 1) // 2 + 1
    if cp_axis is None:
        padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        counts = jnp.asarray(_avgpool_counts(h, w), x.dtype)
        return _pool9(padded, oh, ow) / counts[None, :, :, None]
    padded = cp_pad_w(x, 1, cp_axis, mode="zeros")
    padded = jnp.pad(padded, ((0, 0), (1, 1), (0, 0), (0, 0)))
    summed = _pool9(padded, oh, ow)
    n = jax.lax.axis_size(cp_axis)
    idx = jax.lax.axis_index(cp_axis)
    ph = np.pad(np.ones(h, np.float32), 1)
    hcnt = np.array([ph[2 * i : 2 * i + 3].sum() for i in range(oh)], np.float32)
    # column counts: every local window is full except where it reads the
    # GLOBAL zero padding — the first window of shard 0 (left pad) and the
    # last window of shard n-1 when it reads past the last real frame
    pw_edge = np.pad(np.ones(w, np.float32), 1)
    pw_mid = np.ones(w + 2, np.float32)  # halo frames are real mid-mesh
    def wrow(left_is_pad, right_is_pad):
        p = pw_mid.copy()
        if left_is_pad:
            p[0] = 0.0
        if right_is_pad:
            p[-1] = 0.0
        return np.array([p[2 * j : 2 * j + 3].sum() for j in range(ow)], np.float32)
    wcnt_mid = jnp.asarray(wrow(False, False))
    wcnt_l = jnp.asarray(wrow(True, False))
    wcnt_r = jnp.asarray(wrow(False, True))
    wcnt_lr = jnp.asarray(wrow(True, True))
    wcnt = jnp.where(idx == 0, jnp.where(n == 1, wcnt_lr, wcnt_l),
                     jnp.where(idx == n - 1, wcnt_r, wcnt_mid))
    counts = jnp.asarray(hcnt)[None, :, None, None] * wcnt[None, None, :, None]
    return summed / counts.astype(x.dtype)


class ConvIN(nn.Module):
    """Conv(+optional reflect pad) -> InstanceNorm -> activation.

    Reflect-padded convs (stride 1, not under CP) run through
    conv_reflect_same when the activation is large relative to the weights
    (see `worth_it` below): zero padding fused into the conv + thin
    border-correction strips, saving the materialized padded copy (a full
    HBM round-trip) and keeping W tile-aligned. impl="padded" forces the
    materialized jnp.pad path; impl="implicit" forces the implicit one.

    impl="toeplitz": additionally lane-pack the time axis through the
    banded Toeplitz kernel — for tiny output-channel convs (the enhancer's
    full-res c7s1-2) whose plain lowering is MXU-lane-bound. Applies only
    when the frame count divides the tile; falls back otherwise. Param tree
    is unchanged in all cases."""
    features: int
    kernel: int
    stride: int = 1
    pad: int = 0              # zero padding handled by the conv
    reflect: int = 0          # reflection padding applied before the conv
    norm: bool = True
    act: str = "relu"         # relu | leaky | tanh | none
    dtype: jnp.dtype = jnp.float32
    cp_axis: Optional[str] = None
    impl: Optional[str] = None
    toeplitz_s: int = 16

    @nn.compact
    def __call__(self, x):
        cp = self.cp_axis
        # Implicit reflect padding wins when the activation dwarfs the
        # weights: it saves a full pad round-trip over B*H*W*ci but its four
        # correction convs each re-read the [k,k,ci,co] weight from HBM. For
        # the deep trunk resblocks (1536-2048 ch at 32x8) the weight re-reads
        # dominate (measured +4 ms at batch 64); for the full-res enhancer
        # layers the pad copy dominates (measured -4 ms). The traffic model
        # (saved pad 2*B*H*W*ci vs ~4 weight re-reads 4*k^2*ci*co) predicts
        # a crossover at B*H*W ~ 2*k^2*co; the constant below is 2x that —
        # a deliberate margin toward the padded path, which matched the
        # measured crossover between the trunk resblocks (+4 ms implicit)
        # and the full-res enhancer layers (-4 ms) at batch 64. The savings
        # side also scales with ci: for the 2-channel head convs the pad
        # copy is near-free while the four correction strips are not —
        # measured at batch 128, materialized pad beats implicit by 1.1 ms
        # on the enh down0+down1 pair (benchmarks/enh_head_experiments.py),
        # so implicit additionally requires ci >= 8.
        B_, H_, W_ = x.shape[0], x.shape[1], x.shape[2]
        worth_it = (self.impl == "implicit"
                    or (x.shape[-1] >= 8
                        and B_ * H_ * W_ > 4 * self.kernel ** 2 * self.features))
        use_implicit = (self.reflect and cp is None and self.stride == 1
                        and self.pad == 0 and self.impl != "padded"
                        and self.reflect == self.kernel // 2 and worth_it)
        if self.reflect and not use_implicit:
            if cp is None:
                x = reflect_pad(x, self.reflect)
            else:
                x = jnp.pad(x, [(0, 0), (self.reflect,) * 2, (0, 0), (0, 0)],
                            mode="reflect")
                x = cp_pad_w(x, self.reflect, cp, mode="reflect")
        if use_implicit:
            s = self.toeplitz_s
            ts = (s if self.impl == "toeplitz" and x.shape[2] % s == 0
                  else None)
            k, b = _ConvParams((self.kernel, self.kernel,
                                x.shape[-1], self.features), name="Conv_0")()
            x = conv_reflect_same(x.astype(self.dtype), k.astype(self.dtype),
                                  b, toeplitz_s=ts)
        elif (self.impl == "toeplitz" and cp is None and self.stride == 1
              and self.pad == 0 and self.reflect
              and (x.shape[2] - self.kernel + 1) % self.toeplitz_s == 0):
            k, b = _ConvParams((self.kernel, self.kernel,
                                x.shape[-1], self.features), name="Conv_0")()
            x = conv_toeplitz_t(x.astype(self.dtype), k.astype(self.dtype),
                                b, S=self.toeplitz_s)
        else:
            w_pad = (self.pad, self.pad)
            if cp is not None and self.pad:
                x = cp_pad_w(x, self.pad, cp, mode="zeros")
                w_pad = (0, 0)
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride),
                        padding=[(self.pad, self.pad), w_pad],
                        kernel_init=conv_init, dtype=self.dtype,
                        param_dtype=jnp.float32)(x)
        if self.norm:
            x = instance_norm(x, cp_axis=cp)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "leaky":
            x = nn.leaky_relu(x, 0.2)
        elif self.act == "tanh":
            x = jnp.tanh(x)
        return x


class ConvTransposeIN(nn.Module):
    """ConvTranspose2d(3, stride 2, padding 1, output_padding 1) analog:
    exact 2x upsampling -> InstanceNorm -> ReLU
    (reference models/networks.py:155, :205). CP: exchange one input frame per
    side, upsample locally, crop two output frames per side (a zero halo frame
    contributes exactly like the global SAME zero padding).

    impl="torch": bit-exact torch ConvTranspose2d(3, s2, p1, op1) semantics —
    VALID transposed conv sliced [1:2n+1] (flax's SAME crop selects a window
    one pixel off torch's; the two are shift-isomorphic for from-scratch
    training but NOT weight-compatible). Used with --torch_deconv for
    checkpoints imported from the reference
    (tools/import_torch_checkpoint.py), which stores kernels pre-flipped."""
    features: int
    dtype: jnp.dtype = jnp.float32
    cp_axis: Optional[str] = None
    impl: Optional[str] = None   # "subpixel" | "torch"

    @nn.compact
    def __call__(self, x):
        cp = self.cp_axis
        if self.impl == "torch":
            if cp is not None:
                raise ValueError("impl='torch' deconv does not support "
                                 "context parallelism")
            k, b = _ConvParams((3, 3, x.shape[-1], self.features),
                               name="ConvTranspose_0")()
            B, H, W, _ = x.shape
            y = jax.lax.conv_transpose(
                x.astype(self.dtype), k.astype(self.dtype), (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y[:, 1:1 + 2 * H, 1:1 + 2 * W, :] + b.astype(y.dtype)
            return nn.relu(instance_norm(y))
        if self.impl == "subpixel" and cp is None:
            k, b = _ConvParams((3, 3, x.shape[-1], self.features),
                               name="ConvTranspose_0")()
            x = conv_subpixel_transpose(x.astype(self.dtype),
                                        k.astype(self.dtype), b)
            return nn.relu(instance_norm(x, cp_axis=cp))
        if cp is not None:
            x = cp_pad_w(x, 1, cp, mode="zeros")
        x = nn.ConvTranspose(self.features, (3, 3), strides=(2, 2),
                             padding="SAME", kernel_init=conv_init,
                             dtype=self.dtype, param_dtype=jnp.float32)(x)
        if cp is not None:
            x = x[:, :, 2:-2, :]
        return nn.relu(instance_norm(x, cp_axis=cp))


class _ChildConvParams(nn.Module):
    """Creates a <name>/<inner>/{kernel,bias} subtree without computing —
    lets fused/relaid-out kernels (ops/enhancer_pallas.py) reuse the exact
    parameter layout of ConvIN ("Conv_0") / ConvTransposeIN
    ("ConvTranspose_0") children."""
    kshape: Tuple[int, ...]
    inner: str = "Conv_0"

    @nn.compact
    def __call__(self):
        return _ConvParams(self.kshape, name=self.inner)()


class ResnetBlock(nn.Module):
    """Reflect-padded 3x3 conv x2 with InstanceNorm and residual add
    (reference models/networks.py:214-253).

    params_only=True creates (and returns) the two (kernel, bias) pairs under
    the identical ConvIN_{0,1}/Conv_0 scopes without computing anything —
    used by the fused Pallas resblock chain."""
    dim: int
    dtype: jnp.dtype = jnp.float32
    cp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, params_only: bool = False):
        if params_only:
            ks = (3, 3, self.dim, self.dim)
            return (_ChildConvParams(ks, name="ConvIN_0")(),
                    _ChildConvParams(ks, name="ConvIN_1")())
        h = ConvIN(self.dim, 3, reflect=1, act="relu", dtype=self.dtype,
                   cp_axis=self.cp_axis)(x)
        h = ConvIN(self.dim, 3, reflect=1, act="none", dtype=self.dtype,
                   cp_axis=self.cp_axis)(h)
        return x + h
