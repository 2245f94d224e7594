"""Config CLI parity: reference flag spellings, derived properties, debug
semantics, opt.txt dump (reference options/base_options.py:74-108)."""

import os

import pytest

from pix2pixhdaudiosr_tpu.config import Config, parse_config


def test_reference_flag_aliases(tmp_path):
    cfg = parse_config([
        "--name", "t", "--checkpoints_dir", str(tmp_path),
        "--batchSize", "32", "--netG", "local", "--nThreads", "4",
        "--num_D", "3", "--n_layers_D", "2", "--use_time_D",
        "--no_ganFeat_loss", "--ngf", "48", "--explicit_encoding",
        "--mask", "--mask_mode", "mode2",
    ], save=False)
    assert cfg.batch_size == 32
    assert cfg.net_g == "local"
    assert cfg.n_threads == 4
    assert cfg.num_d == 3 and cfg.n_layers_d == 2
    assert cfg.use_time_d and cfg.no_gan_feat_loss
    assert cfg.explicit_encoding and cfg.mask_mode == "mode2"


def test_derived_properties():
    cfg = Config(input_nc=2, output_nc=2, label_nc=0, no_instance=True)
    assert cfg.up_ratio == 6.0
    assert cfg.netg_input_nc == 2
    assert cfg.netd_input_nc == 4
    cfg2 = cfg.replace(no_instance=False)
    assert cfg2.netg_input_nc == 3 and cfg2.netd_input_nc == 5


def test_debug_semantics():
    cfg = Config(debug=True).apply_debug()
    assert cfg.niter == 1 and cfg.niter_decay == 0
    assert cfg.print_freq == 1 and cfg.display_freq == 1
    assert cfg.max_dataset_size == 10


def test_opt_txt(tmp_path):
    cfg = Config(name="exp", checkpoints_dir=str(tmp_path))
    path = cfg.save_opt_txt()
    text = open(path).read()
    assert text.startswith("------------ Options -------------")
    assert "batch_size: 1" in text
    assert "n_fft: 512" in text


def test_frame_length_invariant():
    from pix2pixhdaudiosr_tpu.config import BINS, FRAME_LENGTH, HOP_LENGTH
    assert BINS % 16 == 0
    assert FRAME_LENGTH == (BINS - 1) * HOP_LENGTH == 32512


def test_remat_g_flag(capsys):
    from pix2pixhdaudiosr_tpu.config import parse_config
    cfg = parse_config(["--name", "x", "--dataroot", "/tmp",
                        "--remat_g", "dots"], is_train=True)
    assert cfg.remat_g == "dots"
    # the default stays off (empty string -> None inside make_train_step)
    cfg2 = parse_config(["--name", "x", "--dataroot", "/tmp"], is_train=True)
    assert cfg2.remat_g == ""


def test_frames_for_pad_rule_inversion():
    """cp_generate pads a file to `need = (t-1)*hop + win - 2*start` samples
    and relies on the codec producing exactly t frames for it (the review
    found the old hard-coded 2*hop rule; now both sides share frames_for)."""
    from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem
    f = Pix2PixHDSystem.frames_for
    assert f(32512, 256, 512, True) == 128  # flagship invariant
    for hop, win, center in [(256, 512, True), (256, 512, False),
                             (128, 256, True), (256, 1024, True)]:
        start = hop if center else 0
        for t in (16, 32, 128):
            need = (t - 1) * hop + win - 2 * start
            if need <= 0 or need % hop:
                continue  # cp_generate rejects these configs explicitly
            assert f(need, hop, win, center) == t, (hop, win, center, t)
