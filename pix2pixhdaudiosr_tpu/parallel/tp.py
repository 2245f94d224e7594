"""Tensor parallelism for the resnet trunk.

SURVEY.md §2.3: the reference has no TP, but its default 730M-param generator
(9 global blocks at 2048 bottleneck channels for ngf 64 + enhancer) puts ~93%
of parameters in the bottleneck resblocks — "optional TP over the channel dim
of the resblocks is the natural extension". This module implements the
Megatron-style decomposition for a stack of pix2pixHD ResnetBlocks
(reference models/networks.py:214-253):

  conv1: column-parallel (output channels sharded; bias sharded)
  InstanceNorm + ReLU: exactly local — IN normalizes each channel
      independently over H, W, so channel sharding needs NO collective
  conv2: row-parallel (input channels sharded; partial sums psum'd over ICI;
      bias added post-reduction)
  second IN + residual add: replicated (bottleneck activations are tiny)

One psum per block. Inference-oriented (training TP would additionally
shard the optimizer; compose with parallel/zero.py).
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def extract_resblocks(trunk_params: Any, prefix: str = "ResnetBlock") -> List[dict]:
    """Pull [(w1, b1, w2, b2), ...] out of a GlobalTrunk flax param tree
    (models/generator.py naming: ResnetBlock_i/ConvIN_j/Conv_0)."""
    p = trunk_params["params"] if "params" in trunk_params else trunk_params
    blocks = []
    i = 0
    while f"{prefix}_{i}" in p:
        b = p[f"{prefix}_{i}"]
        blocks.append({
            "w1": b["ConvIN_0"]["Conv_0"]["kernel"],
            "b1": b["ConvIN_0"]["Conv_0"]["bias"],
            "w2": b["ConvIN_1"]["Conv_0"]["kernel"],
            "b2": b["ConvIN_1"]["Conv_0"]["bias"],
        })
        i += 1
    return blocks


def block_shardings(mesh: Mesh, axis: str = "tp") -> dict:
    return {
        "w1": NamedSharding(mesh, P(None, None, None, axis)),  # column-parallel
        "b1": NamedSharding(mesh, P(axis)),
        "w2": NamedSharding(mesh, P(None, None, axis, None)),  # row-parallel
        "b2": NamedSharding(mesh, P()),
    }


def shard_blocks(blocks: Sequence[dict], mesh: Mesh, axis: str = "tp"):
    sh = block_shardings(mesh, axis)
    return [{k: jax.device_put(v, sh[k]) for k, v in b.items()} for b in blocks]


def _conv3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _reflect1(x):
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")


def _inorm(x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    c = x32 - mean
    var = jnp.mean(c * c, axis=(1, 2), keepdims=True)
    return (c * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def shard_generator_params(params_g: Any, mesh: Mesh, axis: str = "tp"):
    """GSPMD tensor parallelism for a whole generator param tree: every
    ResnetBlock (trunk `ResnetBlock_i` and enhancer `enhN_blockM`) gets its
    first conv column-parallel and second conv row-parallel over `axis`;
    everything else is replicated. XLA then inserts the per-block psum
    automatically when the jitted forward consumes these placed params —
    the pjit-native equivalent of make_tp_resblock_stack, usable without
    model surgery (generate.py --tp_shards)."""
    import re

    col = NamedSharding(mesh, P(None, None, None, axis))
    row = NamedSharding(mesh, P(None, None, axis, None))
    bcol = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def is_block(name: str) -> bool:
        return re.fullmatch(r"ResnetBlock_\d+|enh\d+_block\d+", name) is not None

    def walk(tree, in_block: bool, conv_idx: str):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if is_block(k):
                    out[k] = walk(v, True, "")
                elif in_block and k.startswith("ConvIN_"):
                    out[k] = walk(v, True, k)
                else:
                    out[k] = walk(v, in_block, conv_idx)
            else:
                if in_block and conv_idx == "ConvIN_0" and k == "kernel":
                    sh = col
                elif in_block and conv_idx == "ConvIN_0" and k == "bias":
                    sh = bcol
                elif in_block and conv_idx == "ConvIN_1" and k == "kernel":
                    sh = row
                else:
                    sh = repl
                out[k] = jax.device_put(v, sh)
        return out

    return walk(params_g, False, "")


def make_tp_resblock_stack(mesh: Mesh, axis: str = "tp"):
    """Jitted fn(blocks, x) running the whole resblock stack tensor-parallel.
    `blocks` must be placed with shard_blocks(); x is replicated [B,H,W,C]."""

    def local(blocks, x):
        for b in blocks:
            h = _conv3(_reflect1(x), b["w1"]) + b["b1"]   # local C/N channels
            h = jax.nn.relu(_inorm(h))                     # per-channel: local
            partial = _conv3(_reflect1(h), b["w2"])        # partial over C/N
            out = jax.lax.psum(partial, axis) + b["b2"]
            x = x + _inorm(out)
        return x

    n_spec = {
        "w1": P(None, None, None, axis),
        "b1": P(axis),
        "w2": P(None, None, axis, None),
        "b2": P(),
    }

    def specs_for(blocks):
        return [dict(n_spec) for _ in blocks]

    def run(blocks, x):
        fn = jax.shard_map(local, mesh=mesh,
                           in_specs=(specs_for(blocks), P()),
                           out_specs=P(), check_vma=False)
        return fn(blocks, x)

    return jax.jit(run)
