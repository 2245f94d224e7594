"""Fake-pool training path (pool_size > 0): split G/D steps + host ImagePool
(reference util/image_pool.py + models/pix2pixHD_model.py:304-312)."""

import jax
import numpy as np

from pix2pixhdaudiosr_tpu.config import Config
from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem
from pix2pixhdaudiosr_tpu.trainer import init_state, make_pool_steps
from pix2pixhdaudiosr_tpu.utils.image_pool import ImagePool

CFG = Config(net_g="global", ngf=4, n_downsample_global=2, n_blocks_global=1,
             ndf=4, n_layers_d=2, num_d=2, input_nc=2, output_nc=2,
             label_nc=0, explicit_encoding=True, mask_mode="mode2",
             compute_dtype="float32", pool_size=8)


def test_pool_query_semantics():
    pool = ImagePool(2, seed=0)
    a = np.ones((1, 4)) * 1
    b = np.ones((1, 4)) * 2
    out1 = pool.query(a)
    np.testing.assert_array_equal(out1, a)    # filling phase returns input
    out2 = pool.query(b)
    np.testing.assert_array_equal(out2, b)
    assert len(pool.images) == 2
    # after full: returns either current or stored
    c = np.ones((1, 4)) * 3
    out3 = pool.query(c)
    assert out3[0, 0] in (1.0, 2.0, 3.0)


def test_pool_zero_passthrough():
    pool = ImagePool(0)
    x = np.arange(8.0).reshape(2, 4)
    np.testing.assert_array_equal(pool.query(x), x)


def test_split_steps_train(rng_np):
    system = Pix2PixHDSystem(CFG)
    state, opt_g, opt_d = init_state(system, jax.random.PRNGKey(0), batch=2)
    g_step, d_step = make_pool_steps(system, opt_g, opt_d)
    pool = ImagePool(CFG.pool_size, seed=1)
    batch = {
        "label": (rng_np.standard_normal((2, CFG.segment_length)) * 0.1).astype(np.float32),
        "image": (rng_np.standard_normal((2, CFG.segment_length)) * 0.1).astype(np.float32),
    }
    rng = jax.random.PRNGKey(1)
    s1, g_losses, aux = g_step(state, batch, rng, fix_global=False,
                               with_visuals=False)
    assert "fake_pair" in aux
    assert aux["fake_pair"].shape[-1] == 4  # label 2ch + fake 2ch
    pooled = pool.query(np.asarray(aux["fake_pair"]))
    s2, d_losses = d_step(s1, batch, rng, pooled)
    losses = {**g_losses, **d_losses}
    for k in ("G_GAN", "G_GAN_Feat", "D_real", "D_fake"):
        assert np.isfinite(float(losses[k])), k
    # G updated by g_step, D by d_step
    g0 = jax.tree.leaves(state.params["G"])[0]
    g1 = jax.tree.leaves(s2.params["G"])[0]
    d0 = jax.tree.leaves(state.params["D"])[0]
    d1 = jax.tree.leaves(s2.params["D"])[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1))
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
    assert int(s2.step) == 1


def test_split_steps_with_remat(rng_np):
    """remat_g flows through make_pool_steps' g_step (trainer.py) — same
    bit-exact-grad guarantee as the fused step (test_train_step)."""
    cfg = CFG.replace(remat_g="full", segment_length=7936,
                      frames_per_segment=32)
    system = Pix2PixHDSystem(cfg)
    state, opt_g, opt_d = init_state(system, jax.random.PRNGKey(0), batch=2)
    g_step, d_step = make_pool_steps(system, opt_g, opt_d)
    batch = {
        "label": np.asarray(rng_np.standard_normal(
            (2, cfg.segment_length)), np.float32) * 0.1,
        "image": np.asarray(rng_np.standard_normal(
            (2, cfg.segment_length)), np.float32) * 0.1,
    }
    rng = jax.random.PRNGKey(1)
    state, losses, aux = g_step(state, batch, rng, fix_global=False,
                                with_visuals=False)
    pooled = np.asarray(aux["fake_pair"])
    state, d_losses = d_step(state, batch, rng, pooled)
    for k, v in {**losses, **d_losses}.items():
        assert np.isfinite(float(v)), (k, v)
