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


def test_every_reference_flag_is_accepted():
    """Exhaustive flag-surface parity: every --flag the reference's options
    system defines (reference options/{base,train,test}_options.py) is known
    to this parser — as an implemented field, a spelling alias, or an
    accepted-and-dropped runtime-specific flag."""
    import glob
    import re
    ref = glob.glob("/root/reference/options/*.py")
    if not ref:
        pytest.skip("reference tree not mounted")
    ref_flags = set()
    for path in ref:
        with open(path) as f:
            ref_flags |= set(
                re.findall(r"add_argument\(['\"]--(\w+)['\"]", f.read()))
    from pix2pixhdaudiosr_tpu.config import build_parser
    known = {s.lstrip("-") for a in build_parser()._actions
             for s in a.option_strings}
    assert ref_flags, "no flags extracted from the reference"
    assert ref_flags <= known, sorted(ref_flags - known)


def test_reference_readme_recipes_parse_verbatim(capsys):
    """The reference README's committed train/generate commands
    (reference README.md:138-171) must run under this CLI unchanged —
    including flags with no TPU meaning (--gpu_id, --fp16), which are
    accepted, reported, and dropped."""
    train_argv = [
        "--name", "VCTK_G3L2_48ngf",
        "--dataroot", "/root/VCTK-Corpus/wav48", "--validation_split", "0.01",
        "--no_instance", "--no_vgg_loss",
        "--label_nc", "0", "--output_nc", "2", "--input_nc", "2",
        "--batchSize", "64", "--fp16",
        "--gpu_id", "0",          # argparse prefix-match of --gpu_ids,
        "--nThreads", "16",       # exactly as the reference accepts it
        "--mask", "--mask_mode", "mode2",
        "--netG", "local",
        "--niter", "50", "--niter_decay", "50",
        "--abs_spectro", "--center",
        "--explicit_encoding",
        "--n_blocks_global", "3", "--n_blocks_local", "2", "--ngf", "48",
        "--eval_freq", "5000", "--save_latest_freq", "2000",
        "--save_epoch_freq", "20",
    ]
    cfg = parse_config(train_argv, save=False)
    assert cfg.batch_size == 64 and cfg.ngf == 48 and cfg.mask_mode == "mode2"
    assert not hasattr(cfg, "gpu_ids")  # dropped, not stored
    # --gpu_id 0 equals the reference default, so no notice is emitted
    assert "ignored" not in capsys.readouterr().out

    gen_argv = [
        "--name", "GEN_VCTK_G3L2_48ngf",
        "--checkpoints_dir", "./generated",
        "--dataroot", "/root/pix2pixHD/test/test.wav",
        "--load_pretrain", "./checkpoints/VCTK_G3L2_48ngf",
        "--no_instance", "--no_vgg_loss", "--validation_split", "0",
        "--label_nc", "0", "--output_nc", "2", "--input_nc", "2",
        "--batchSize", "4", "--serial_batches",
        "--gpu_id", "3", "--nThreads", "0",
        "--mask", "--mask_mode", "mode2",
        "--netG", "local",
        "--abs_spectro", "--center", "--explicit_encoding",
        "--n_blocks_global", "3", "--n_blocks_local", "2", "--ngf", "48",
        "--phase", "test",
    ]
    cfg = parse_config(gen_argv, is_train=False, save=False)
    assert cfg.phase == "test" and cfg.serial_batches
    out = capsys.readouterr().out
    assert "--gpu_ids 3: ignored" in out  # non-default value is reported

    # deprecated image-path / TRT flags are reported with a redirect note
    cfg = parse_config(["--name", "x", "--export_onnx", "m.onnx"], save=False)
    out = capsys.readouterr().out
    assert "tools/aot_engine.py" in out


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
    """cp_generate pads a file to `need = (t - 1 - floor((2*start - win)/hop))
    * hop` samples and relies on the codec producing exactly t frames for it
    (generate.plan_cp_padding; both sides share frames_for — the round-4
    closed form works for every codec, win % hop != 0 included)."""
    from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem
    f = Pix2PixHDSystem.frames_for
    assert f(32512, 256, 512, True) == 128  # flagship invariant
    for hop, win, center in [(256, 512, True), (256, 512, False),
                             (128, 256, True), (256, 1024, True),
                             (160, 512, True), (160, 512, False)]:
        start = hop if center else 0
        for t in (16, 32, 128):
            need = (t - 1 - (2 * start - win) // hop) * hop
            if need <= 0:
                continue
            assert f(need, hop, win, center) == t, (hop, win, center, t)
