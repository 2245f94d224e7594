"""UIModel editing session, model factory, and VGG19 feature extractor
(reference models/ui_model.py, models/models.py, models/networks.py:386-416)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pix2pixhdaudiosr_tpu.config import Config
from pix2pixhdaudiosr_tpu.models.vgg import VGGLoss, Vgg19Features
from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem
from pix2pixhdaudiosr_tpu.ui_model import UIModel, create_model


def test_factory_dispatch():
    cfg = Config(net_g="global", ngf=4, n_downsample_global=2,
                 n_blocks_global=1, ndf=4, n_layers_d=2, input_nc=2,
                 output_nc=2, label_nc=0, explicit_encoding=True)
    assert isinstance(create_model(cfg), Pix2PixHDSystem)
    ui = create_model(cfg.replace(model="ui"))
    assert isinstance(ui, UIModel)


def test_ui_edit_ops():
    cfg = Config(net_g="global", ngf=4, n_downsample_global=2,
                 n_blocks_global=1, input_nc=2, output_nc=2, label_nc=0,
                 explicit_encoding=True)
    ui = UIModel()
    ui.initialize(cfg)
    label = np.zeros((32, 32), np.int32)
    inst = np.zeros((32, 32), np.int32)
    label[8:16, 8:16] = 5
    inst[8:16, 8:16] = 5
    ui.load_maps(label, inst)

    ui.change_labels((10, 10), (0, 0))        # relabel region 5 -> 0
    assert (ui.label_map == 0).all()
    ui.undo()
    assert ui.label_map[10, 10] == 5

    ui.add_strokes((2, 2), label_tgt=7, bw=1)
    assert ui.label_map[2, 2] == 7 and ui.label_map[1, 1] == 7
    ui.add_objects((20, 20), 9, np.ones((4, 4)))
    assert ui.label_map[21, 21] == 9
    ui.reset()
    assert ui.label_map[2, 2] == 0 and ui.label_map[10, 10] == 5
    vis = ui.get_current_visuals()
    assert vis["label"].shape == (32, 32)


def test_vgg19_slices():
    vgg = Vgg19Features()
    x = jnp.zeros((1, 64, 64, 3))
    params = vgg.init(jax.random.PRNGKey(0), x)
    outs = vgg.apply(params, x)
    assert len(outs) == 5
    # relu1_1 full res, relu5_1 downsampled 16x
    assert outs[0].shape == (1, 64, 64, 64)
    assert outs[4].shape == (1, 4, 4, 512)


def test_vgg_loss_scalar(rng_np):
    vgg = Vgg19Features()
    x = jnp.asarray(rng_np.standard_normal((1, 32, 32, 3)).astype(np.float32))
    params = vgg.init(jax.random.PRNGKey(0), x)
    loss = VGGLoss(params)
    val = loss(x, x * 0.5)
    assert np.isfinite(float(val)) and float(val) > 0
    assert float(loss(x, x)) == pytest.approx(0.0, abs=1e-6)


def test_get_edges():
    from pix2pixhdaudiosr_tpu.ui_model import get_edges
    t = np.zeros((6, 6), np.int32)
    t[2:4, 2:4] = 7
    e = get_edges(t)
    assert e[2, 2] == 1 and e[1, 2] == 1 and e[4, 3] == 1
    assert e[0, 0] == 0 and e[5, 5] == 0
    assert e.dtype == np.float32
