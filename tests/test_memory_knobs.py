"""The beyond-flagship memory-knob composition: --fsdp x --remat_g x
--adam_mu_bf16 together are the survival kit the 730M reference-default G
(G9L3@64, reference train_script.sh param comment) relies on
(benchmarks/g730_fsdp_dryrun.py runs it at real shapes). This pins, at toy
scale, that the three knobs compose: the sharded+remat+bf16-mu step runs,
the big leaves stay sharded, the mu tree is actually bf16, and the losses
(computed before the optimizer update, so unaffected by mu storage; remat
is bit-exact per tests/test_train_step.py) match the plain replicated step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pix2pixhdaudiosr_tpu.config import Config
from pix2pixhdaudiosr_tpu.parallel import make_mesh, replicated, shard_batch
from pix2pixhdaudiosr_tpu.parallel.fsdp import apply_fsdp
from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem
from pix2pixhdaudiosr_tpu.trainer import init_state, make_train_step

CFG = Config(net_g="global", ngf=8, n_downsample_global=2, n_blocks_global=1,
             ndf=8, n_layers_d=2, num_d=2, input_nc=2, output_nc=2,
             label_nc=0, explicit_encoding=True, mask_mode="mode2",
             compute_dtype="float32")


def make_batch(n):
    rng = np.random.default_rng(0)
    return {
        "label": (rng.standard_normal((n, CFG.segment_length)) * 0.1
                  ).astype(np.float32),
        "image": (rng.standard_normal((n, CFG.segment_length)) * 0.1
                  ).astype(np.float32),
    }


@pytest.mark.slow
def test_fsdp_remat_mubf16_compose():
    mesh = make_mesh((8,), ("data",))
    batch = shard_batch(make_batch(8), mesh)
    rng = jax.random.PRNGKey(1)

    # reference: plain replicated step, no knobs
    sys_plain = Pix2PixHDSystem(CFG)
    state, opt_g, opt_d = init_state(sys_plain, jax.random.PRNGKey(0),
                                     batch=8)
    step_plain = make_train_step(sys_plain, opt_g, opt_d, donate=False)
    _, losses_ref, _ = step_plain(jax.device_put(state, replicated(mesh)),
                                  batch, rng, None,
                                  fix_global=False, with_visuals=False)

    # all three knobs on (same init seed -> same starting params)
    sys_k = Pix2PixHDSystem(CFG.replace(remat_g="full", adam_mu_bf16=True))
    state_k, opt_gk, opt_dk = init_state(sys_k, jax.random.PRNGKey(0),
                                         batch=8)
    mus = [l for l in jax.tree.leaves(state_k.opt_g)
           if getattr(l, "dtype", None) == jnp.bfloat16]
    assert mus, "adam_mu_bf16 must store bf16 moments"
    step_k = make_train_step(sys_k, opt_gk, opt_dk, donate=False)
    s = apply_fsdp(jax.device_put(state_k, replicated(mesh)), mesh)
    big = [l for l in jax.tree.leaves(s.params["G"]) if l.ndim == 4]
    assert any(not l.sharding.is_fully_replicated for l in big)

    out, losses, _ = step_k(s, batch, rng, None,
                            fix_global=False, with_visuals=False)
    for k in losses_ref:
        assert float(losses_ref[k]) == pytest.approx(float(losses[k]),
                                                     rel=1e-4), k
    # a second step runs on the updated (bf16-mu, sharded) state
    out2, losses2, _ = step_k(out, batch, jax.random.PRNGKey(2), None,
                              fix_global=False, with_visuals=False)
    assert all(np.isfinite(float(v)) for v in losses2.values())
    big2 = [l for l in jax.tree.leaves(out2.params["G"]) if l.ndim == 4]
    assert any(not l.sharding.is_fully_replicated for l in big2)
    mus2 = [l for l in jax.tree.leaves(out2.opt_g)
            if getattr(l, "dtype", None) == jnp.bfloat16]
    assert mus2, "mu stays bf16 across steps"
