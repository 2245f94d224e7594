"""End-to-end GAN train step on synthetic audio — the integration test the
reference lacks (its closest analog is the --debug smoke run, reference
train.py:72-77). Includes an 8-virtual-device data-parallel run (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pix2pixhdaudiosr_tpu.config import Config
from pix2pixhdaudiosr_tpu.parallel import make_mesh, shard_batch, replicated
from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem
from pix2pixhdaudiosr_tpu.trainer import (init_state, make_eval_step,
                                          make_train_step, set_learning_rate)

TINY = Config(
    net_g="global", ngf=4, n_downsample_global=2, n_blocks_global=1,
    ndf=4, n_layers_d=2, num_d=2, input_nc=2, output_nc=2, label_nc=0,
    explicit_encoding=True, mask_mode="mode2", no_instance=True,
    no_vgg_loss=True, batch_size=2,
    segment_length=32512, compute_dtype="float32",
)


def synth_batch(n, seg, rng):
    t = np.arange(seg) / 48000
    hr = np.stack([np.sin(2 * np.pi * (300 + 100 * i) * t) for i in range(n)])
    hr = (hr + 0.05 * rng.standard_normal((n, seg))).astype(np.float32)
    lr = hr * 0.8  # stand-in for the resampled pair; shapes/dtypes match
    return {"label": jnp.asarray(lr), "image": jnp.asarray(hr)}


@pytest.fixture(scope="module")
def tiny_setup():
    system = Pix2PixHDSystem(TINY)
    state, opt_g, opt_d = init_state(system, jax.random.PRNGKey(0), batch=2)
    step = make_train_step(system, opt_g, opt_d, donate=False)
    return system, state, step


def test_loss_names(tiny_setup):
    system, *_ = tiny_setup
    assert system.loss_names == ["G_GAN", "G_GAN_Feat", "D_real", "D_fake"]


def test_train_step_runs_and_updates(tiny_setup):
    system, state, step = tiny_setup
    batch = synth_batch(2, TINY.segment_length, np.random.default_rng(0))
    new_state, losses, aux = step(state, batch, jax.random.PRNGKey(1), None,
                                  fix_global=False, with_visuals=False)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    # both G and D moved
    g0 = jax.tree.leaves(state.params["G"])[0]
    g1 = jax.tree.leaves(new_state.params["G"])[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1))
    d0 = jax.tree.leaves(state.params["D"])[0]
    d1 = jax.tree.leaves(new_state.params["D"])[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
    assert int(new_state.step) == 1
    assert aux["sr"].shape == system.spectro_shape(2)


def test_two_steps_decrease_nothing_nan(tiny_setup):
    system, state, step = tiny_setup
    batch = synth_batch(2, TINY.segment_length, np.random.default_rng(1))
    s = state
    for i in range(2):
        s, losses, _ = step(s, batch, jax.random.PRNGKey(i), None,
                            fix_global=False, with_visuals=False)
    assert all(np.isfinite(float(v)) for v in losses.values())


def test_visuals(tiny_setup):
    system, state, step = tiny_setup
    batch = synth_batch(2, TINY.segment_length, np.random.default_rng(2))
    _, _, aux = step(state, batch, jax.random.PRNGKey(3), None,
                     fix_global=False, with_visuals=True)
    vis = aux["visuals"]
    assert vis["label"].shape == (512, 128)
    assert set(vis) >= {"label", "generated", "real"}


def test_eval_step(tiny_setup):
    system, state, _ = tiny_setup
    ev = make_eval_step(system)
    batch = synth_batch(2, TINY.segment_length, np.random.default_rng(3))
    sr_audio, sr_spec = ev(state.params["G"], batch["label"], jax.random.PRNGKey(0))
    assert sr_audio.shape == (2, TINY.segment_length)
    assert np.all(np.isfinite(np.asarray(sr_audio)))


def test_data_parallel_8dev():
    """Same step over an 8-device mesh with the batch sharded on `data`."""
    assert len(jax.devices()) == 8
    system = Pix2PixHDSystem(TINY)
    state, opt_g, opt_d = init_state(system, jax.random.PRNGKey(0), batch=8)
    step = make_train_step(system, opt_g, opt_d, donate=False)
    mesh = make_mesh((-1,), ("data",))
    batch = synth_batch(8, TINY.segment_length, np.random.default_rng(0))
    batch = shard_batch(batch, mesh)
    state = jax.device_put(state, replicated(mesh))
    new_state, losses, _ = step(state, batch, jax.random.PRNGKey(1), None,
                                fix_global=False, with_visuals=False)
    assert all(np.isfinite(float(v)) for v in losses.values())


def test_fix_global_masks_trunk():
    cfg = TINY.replace(net_g="local", n_local_enhancers=1, n_blocks_local=1,
                       niter_fix_global=1)
    system = Pix2PixHDSystem(cfg)
    state, opt_g, opt_d = init_state(system, jax.random.PRNGKey(0), batch=2)
    step = make_train_step(system, opt_g, opt_d, donate=False)
    batch = synth_batch(2, cfg.segment_length, np.random.default_rng(0))
    new_state, losses, _ = step(state, batch, jax.random.PRNGKey(1), None,
                                fix_global=True, with_visuals=False)
    gp0 = state.params["G"]["params"]
    gp1 = new_state.params["G"]["params"]
    for key in gp0:
        a = np.asarray(jax.tree.leaves(gp0[key])[0])
        b = np.asarray(jax.tree.leaves(gp1[key])[0])
        if key.startswith("enh"):
            assert not np.allclose(a, b), key
        else:
            np.testing.assert_array_equal(a, b, err_msg=key)


def test_lr_update():
    system = Pix2PixHDSystem(TINY)
    state, *_ = init_state(system, jax.random.PRNGKey(0), batch=1)
    state = set_learning_rate(state, 1e-5)
    assert float(state.opt_g.hyperparams["learning_rate"]) == pytest.approx(1e-5)


def test_lr_decay_with_donated_step(tiny_setup):
    """Regression: set_learning_rate must not alias one scalar buffer into
    both optimizers' hyperparams — XLA rejects donating the same buffer twice
    (surfaced after the first LR-decay epoch on hardware)."""
    system, state, _ = tiny_setup
    from pix2pixhdaudiosr_tpu.trainer import make_train_step, make_optimizer
    from pix2pixhdaudiosr_tpu.trainer import init_state as _init
    s, opt_g, opt_d = _init(system, jax.random.PRNGKey(3), batch=2)
    donating = make_train_step(system, opt_g, opt_d, donate=True)
    batch = synth_batch(2, TINY.segment_length, np.random.default_rng(5))
    s, losses, _ = donating(s, batch, jax.random.PRNGKey(1), None,
                            fix_global=False, with_visuals=False)
    s = set_learning_rate(s, 1e-4)
    s, losses, _ = donating(s, batch, jax.random.PRNGKey(2), None,
                            fix_global=False, with_visuals=False)
    assert np.isfinite(float(losses["G_GAN"]))
    assert float(s.opt_g.hyperparams["learning_rate"]) == pytest.approx(1e-4)


def test_remat_g_grads_match(tiny_setup):
    """remat_g ("full" and "dots") rematerializes the G forward without
    changing a single gradient bit (system.losses_and_grads remat_g;
    measured as a memory/speed trade in benchmarks/remat_experiment.py)."""
    system, state, _ = tiny_setup
    batch = synth_batch(2, TINY.segment_length, np.random.default_rng(7))
    key = jax.random.PRNGKey(11)

    def grads(mode):
        losses, gg, gd, _ = jax.jit(
            lambda p, b, k: system.losses_and_grads(p, b, k, remat_g=mode)
        )(state.params, batch, key)
        return losses, np.concatenate(
            [np.asarray(x).ravel() for x in jax.tree.leaves(gg)])

    base_losses, base = grads(None)
    for mode in ("full", "dots"):
        losses, flat = grads(mode)
        assert float(losses["G_GAN"]) == pytest.approx(
            float(base_losses["G_GAN"]))
        np.testing.assert_array_equal(flat, base, err_msg=mode)


def test_non_dividing_codec_train_step():
    """A win % hop != 0 codec (512/160) trains end-to-end: the gcd-cell
    framing (ops/framing.py) frames it, and IMDCT's out_length contract
    (ops/mdct.py _fit_length) keeps the inverse on the exact segment time
    base even though the forward's end-pad rounds past the last frame.
    Inference for this family is pinned in test_halo_cp; this is the
    training-side half (losses_and_grads through the same codec)."""
    cfg = TINY.replace(win_length=512, hop_length=160, n_fft=512,
                       segment_length=20640,  # 128 frames at hop 160 (center)
                       use_match_loss=True)   # exercises the codec inverse
    system = Pix2PixHDSystem(cfg)
    state, opt_g, opt_d = init_state(system, jax.random.PRNGKey(0), batch=2)
    step = make_train_step(system, opt_g, opt_d, donate=False)
    batch = synth_batch(2, cfg.segment_length, np.random.default_rng(0))
    new_state, losses, _ = step(state, batch, jax.random.PRNGKey(1), None,
                                fix_global=False, with_visuals=False)
    assert "G_mat" in losses
    assert all(np.isfinite(float(v)) for v in losses.values()), losses
    a = jax.tree.leaves(state.params["G"])[0]
    b = jax.tree.leaves(new_state.params["G"])[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))
    ev = make_eval_step(system)
    sr_audio, _ = ev(new_state.params["G"], batch["label"], jax.random.PRNGKey(0))
    assert sr_audio.shape == (2, cfg.segment_length)
    assert np.all(np.isfinite(np.asarray(sr_audio)))


def test_adam_mu_bf16_knob():
    """--adam_mu_bf16 stores the Adam first moment in bf16 (nu stays f32)
    and the step still runs finite and updates params — the optimizer-state
    memory knob for beyond-flagship models (config.py adam_mu_bf16)."""
    system = Pix2PixHDSystem(TINY.replace(adam_mu_bf16=True,
                                          segment_length=31 * 256))
    state, opt_g, opt_d = init_state(system, jax.random.PRNGKey(0), batch=2)
    dtypes = {x.dtype for x in jax.tree.leaves(state.opt_g)
              if hasattr(x, "dtype")}
    assert jnp.dtype(jnp.bfloat16) in dtypes and jnp.dtype(jnp.float32) in dtypes
    step = make_train_step(system, opt_g, opt_d, donate=False)
    batch = synth_batch(2, 31 * 256, np.random.default_rng(0))
    new_state, losses, _ = step(state, batch, jax.random.PRNGKey(1), None,
                                fix_global=False, with_visuals=False)
    assert all(np.isfinite(float(v)) for v in losses.values())
    a = jax.tree.leaves(state.params["G"])[0]
    b = jax.tree.leaves(new_state.params["G"])[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # the moments kept their storage dtypes through the update
    dtypes2 = {x.dtype for x in jax.tree.leaves(new_state.opt_g)
               if hasattr(x, "dtype")}
    assert jnp.dtype(jnp.bfloat16) in dtypes2
