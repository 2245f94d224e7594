"""Frame-axis context parallelism via halo exchange.

The reference has no sequence parallelism — long audio is chunked into
independent segments whose seams are audible (reference
data/audio_dataset.py:124-135, generate_audio.py:43-47). Because the model is
fully convolutional over [freq, frames], scaling the frame axis on TPU is a
data-sharding problem: shard frames across a mesh axis, exchange a halo the
size of the generator's receptive field with `jax.lax.ppermute` over ICI,
compute locally with overlap, and crop (SURVEY.md §5 long-context plan).

Exactness note: convolution outputs are exact given halo >= receptive field
and halo alignment to the total stride (2^n_downsample). InstanceNorm is
psum-exact: each layer pmeans its moments over the cp axis with halo regions
masked out (models/layers.py:InstanceNorm cp_axis path), so the sharded
generator matches the unsharded one to float tolerance — tests/test_halo_cp.py
asserts <=6e-7 max error at 2/4/8 shards.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str,
                  spatial_axis: int = 2) -> jnp.ndarray:
    """Pad a locally-sharded block with `halo` entries from each neighbor
    along `spatial_axis` (zeros at the global boundary). Must run inside
    shard_map over `axis_name`."""
    n = jax.lax.axis_size(axis_name)
    right_edge = jax.lax.slice_in_dim(x, x.shape[spatial_axis] - halo,
                                      x.shape[spatial_axis], axis=spatial_axis)
    left_edge = jax.lax.slice_in_dim(x, 0, halo, axis=spatial_axis)
    # send my right edge to my right neighbor (it becomes their left halo)
    from_left = jax.lax.ppermute(right_edge, axis_name,
                                 [(i, i + 1) for i in range(n - 1)])
    # send my left edge to my left neighbor (it becomes their right halo)
    from_right = jax.lax.ppermute(left_edge, axis_name,
                                  [(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([from_left, x, from_right], axis=spatial_axis)


def generator_receptive_halo(n_downsample_global: int, n_blocks_global: int,
                             n_local_enhancers: int = 0,
                             n_blocks_local: int = 0) -> int:
    """Upper bound on the generator's half receptive field in input frames,
    rounded up to the total stride so downsampling grids align across shards."""
    stride = 2 ** n_downsample_global
    rf = 3  # c7s1
    for i in range(n_downsample_global):
        rf += 2 ** i  # 3x3 stride-2 conv at scale 2^i
    rf += n_blocks_global * 2 * stride  # resblock 3x3 convs at the bottleneck
    for i in range(n_downsample_global):
        rf += 2 ** (n_downsample_global - 1 - i)  # transposed convs
    rf += 3
    if n_local_enhancers:
        rf = 2 * rf + 3 + 2 + n_blocks_local * 2 * 2 + 2 + 3
    total_stride = stride * (2 ** n_local_enhancers)
    return int(np.ceil(rf / total_stride) * total_stride)


def make_cp_generator(system, mesh: Mesh, axis: str = "data",
                      batch_axis: str = None) -> Callable:
    """Build a jitted frame-axis context-parallel generator forward:
    [B, F, T, C] spectrogram sharded on T -> sr spectrogram, numerically
    matching the unsharded generator (and seamless, vs the reference's
    independent-chunk seams). Every conv layer exchanges its own kernel-radius
    halo via ppermute and reproduces the global boundary padding; InstanceNorm
    moments are pmean'd (see models/layers.py). Each shard's frame count must
    be divisible by the generator's total stride.

    batch_axis: optionally also shard the batch dim over a second mesh axis
    (dp x cp serving on a 2-D mesh) — the forward is batch-independent
    (InstanceNorm is per-sample), so only the input/output specs change."""
    cfg = system.cfg

    # rebuild the generator with cp-aware layers (same param tree — the
    # cp_axis attribute does not change module names)
    from ..models.generator import build_generator
    net_g_cp = build_generator(cfg.net_g, cfg.netg_input_nc, cfg.output_nc,
                               cfg.ngf, cfg.n_downsample_global,
                               cfg.n_blocks_global, cfg.n_local_enhancers,
                               cfg.n_blocks_local, dtype=system.dtype,
                               cp_axis=axis, fast_conv=cfg.fast_conv,
                               deconv_impl="torch" if cfg.torch_deconv else None)

    def local_apply(params, x_local):
        out = net_g_cp.apply(params, x_local.astype(system.dtype))
        return out.astype(jnp.float32)

    spec = P(batch_axis, None, axis, None)
    fn = jax.shard_map(local_apply, mesh=mesh,
                       in_specs=(P(), spec), out_specs=spec)
    return jax.jit(fn)
