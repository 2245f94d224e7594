"""ZeRO-1 optimizer-state sharding: moments sharded across the data mesh,
training step numerically identical to the replicated run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pix2pixhdaudiosr_tpu.config import Config
from pix2pixhdaudiosr_tpu.parallel import make_mesh, replicated, shard_batch
from pix2pixhdaudiosr_tpu.parallel.zero import apply_zero, opt_state_shardings
from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem
from pix2pixhdaudiosr_tpu.trainer import init_state, make_train_step

CFG = Config(net_g="global", ngf=8, n_downsample_global=2, n_blocks_global=1,
             ndf=8, n_layers_d=2, num_d=2, input_nc=2, output_nc=2,
             label_nc=0, explicit_encoding=True, mask_mode="mode2",
             compute_dtype="float32")


def make_batch(n):
    rng = np.random.default_rng(0)
    return {"label": (rng.standard_normal((n, CFG.segment_length)) * 0.1).astype(np.float32),
            "image": (rng.standard_normal((n, CFG.segment_length)) * 0.1).astype(np.float32)}


@pytest.mark.slow
def test_zero_sharded_step_matches_replicated():
    system = Pix2PixHDSystem(CFG)
    mesh = make_mesh((8,), ("data",))
    state, opt_g, opt_d = init_state(system, jax.random.PRNGKey(0), batch=8)
    step = make_train_step(system, opt_g, opt_d, donate=False)
    batch = shard_batch(make_batch(8), mesh)
    rng = jax.random.PRNGKey(1)

    # replicated run
    s_rep = jax.device_put(state, replicated(mesh))
    out_rep, losses_rep, _ = step(s_rep, batch, rng, None,
                                  fix_global=False, with_visuals=False)

    # ZeRO run: moments sharded
    s_zero = apply_zero(jax.device_put(state, replicated(mesh)), mesh)
    # verify at least the big moment leaves actually got sharded
    mu_leaves = jax.tree.leaves(s_zero.opt_g)
    assert any(
        not leaf.sharding.is_fully_replicated
        for leaf in mu_leaves if hasattr(leaf, "sharding") and leaf.ndim >= 1)
    out_zero, losses_zero, _ = step(s_zero, batch, rng, None,
                                    fix_global=False, with_visuals=False)

    for k in losses_rep:
        assert float(losses_rep[k]) == pytest.approx(float(losses_zero[k]),
                                                     rel=1e-4), k
    a = np.asarray(jax.tree.leaves(out_rep.params["G"])[0])
    b = np.asarray(jax.tree.leaves(out_zero.params["G"])[0])
    np.testing.assert_allclose(a, b, atol=1e-6)
    # updated moments keep their sharding across steps
    mu2 = [l for l in jax.tree.leaves(out_zero.opt_g)
           if hasattr(l, "sharding") and l.ndim >= 1]
    assert any(not l.sharding.is_fully_replicated for l in mu2)


def test_leaf_spec_picks_divisible_dim():
    from pix2pixhdaudiosr_tpu.parallel.zero import _leaf_spec
    assert _leaf_spec((7, 16), 8, "data") == jax.sharding.PartitionSpec(None, "data")
    assert _leaf_spec((3, 3, 2, 48), 8, "data") == \
        jax.sharding.PartitionSpec(None, None, None, "data")
    assert _leaf_spec((5,), 8, "data") == jax.sharding.PartitionSpec()
    assert _leaf_spec((), 8, "data") == jax.sharding.PartitionSpec()
