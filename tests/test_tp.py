"""Tensor-parallel resblock stack == sequential flax ResnetBlocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pix2pixhdaudiosr_tpu.models.layers import ResnetBlock
from pix2pixhdaudiosr_tpu.parallel import make_mesh
from pix2pixhdaudiosr_tpu.parallel.tp import (extract_resblocks,
                                              make_tp_resblock_stack,
                                              shard_blocks)


@pytest.mark.slow
def test_tp_resblocks_match_sequential(rng_np):
    C, B, H, W, nblocks = 64, 2, 16, 8, 3
    x = jnp.asarray(rng_np.standard_normal((B, H, W, C)).astype(np.float32))

    blocks_flax = []
    params_list = []
    for i in range(nblocks):
        m = ResnetBlock(C)
        p = m.init(jax.random.PRNGKey(i), x)
        blocks_flax.append((m, p))
        params_list.append({
            "w1": p["params"]["ConvIN_0"]["Conv_0"]["kernel"],
            "b1": p["params"]["ConvIN_0"]["Conv_0"]["bias"],
            "w2": p["params"]["ConvIN_1"]["Conv_0"]["kernel"],
            "b2": p["params"]["ConvIN_1"]["Conv_0"]["bias"],
        })

    want = x
    for m, p in blocks_flax:
        want = m.apply(p, want)
    want = np.asarray(want)

    for ndev in (2, 4, 8):
        mesh = make_mesh((ndev,), ("tp",), devices=jax.devices()[:ndev])
        sharded = shard_blocks(params_list, mesh, "tp")
        tp_fn = make_tp_resblock_stack(mesh, "tp")
        got = np.asarray(tp_fn(sharded, x))
        np.testing.assert_allclose(got, want, atol=5e-5,
                                   err_msg=f"ndev={ndev}")


def test_extract_resblocks(rng_np):
    from pix2pixhdaudiosr_tpu.models.generator import GlobalTrunk
    trunk = GlobalTrunk(2, ngf=4, n_downsampling=2, n_blocks=2)
    params = trunk.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 16, 2)))
    blocks = extract_resblocks(params)
    assert len(blocks) == 2
    assert blocks[0]["w1"].shape == (3, 3, 16, 16)  # ngf*4 at the bottleneck
    assert blocks[0]["b2"].shape == (16,)
