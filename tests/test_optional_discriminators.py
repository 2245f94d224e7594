"""Optional loss branches: --use_time_D, --use_hifigan_D, --use_match_loss
(reference models/pix2pixHD_model.py:61-65, :363-388, :405-415)."""

import jax
import numpy as np
import pytest

from pix2pixhdaudiosr_tpu.config import Config
from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem
from pix2pixhdaudiosr_tpu.trainer import init_state, make_train_step

BASE = dict(net_g="global", ngf=4, n_downsample_global=2, n_blocks_global=1,
            ndf=4, n_layers_d=2, num_d=2, input_nc=2, output_nc=2, label_nc=0,
            explicit_encoding=True, mask_mode="mode2", no_vgg_loss=True,
            compute_dtype="float32", segment_length=32512)


def run_one_step(cfg):
    system = Pix2PixHDSystem(cfg)
    state, opt_g, opt_d = init_state(system, jax.random.PRNGKey(0), batch=2)
    step = make_train_step(system, opt_g, opt_d, donate=False)
    rng = np.random.default_rng(0)
    batch = {
        "label": (rng.standard_normal((2, cfg.segment_length)) * 0.1).astype(np.float32),
        "image": (rng.standard_normal((2, cfg.segment_length)) * 0.1).astype(np.float32),
    }
    new_state, losses, _ = step(state, batch, jax.random.PRNGKey(1), None,
                                fix_global=False, with_visuals=False)
    return system, state, new_state, losses


@pytest.mark.slow
def test_match_loss_branch():
    cfg = Config(use_match_loss=True, **BASE)
    system, _, _, losses = run_one_step(cfg)
    assert "G_mat" in losses and np.isfinite(float(losses["G_mat"]))
    assert system.loss_names == ["G_GAN", "G_GAN_Feat", "G_mat", "D_real", "D_fake"]


@pytest.mark.slow
def test_time_d_branch():
    cfg = Config(use_time_d=True, **BASE)
    system, state, new_state, losses = run_one_step(cfg)
    for k in ("G_GAN_t", "D_real_t", "D_fake_t"):
        assert k in losses and np.isfinite(float(losses[k])), k
    t0 = jax.tree.leaves(state.params["time_D"])[0]
    t1 = jax.tree.leaves(new_state.params["time_D"])[0]
    assert not np.allclose(np.asarray(t0), np.asarray(t1))


@pytest.mark.slow
def test_hifigan_d_branch():
    cfg = Config(use_hifigan_d=True, **BASE)
    system, state, new_state, losses = run_one_step(cfg)
    for k in ("G_GAN_t", "D_real_t", "D_fake_t"):
        assert k in losses and np.isfinite(float(losses[k])), k
    h0 = jax.tree.leaves(state.params["hifigan_D"])[0]
    h1 = jax.tree.leaves(new_state.params["hifigan_D"])[0]
    assert not np.allclose(np.asarray(h0), np.asarray(h1))


def test_hifigan_d_structure():
    from pix2pixhdaudiosr_tpu.models.hifigan_d import \
        HiFiGANMultiScaleMultiPeriodDiscriminator
    import jax.numpy as jnp
    d = HiFiGANMultiScaleMultiPeriodDiscriminator()
    x = jnp.zeros((1, 8192, 1))
    params = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(params, x)
    assert len(out) == 3 + 5  # 3 scales + 5 periods
    for feats in out:
        assert feats[-1].shape[-1] == 1
