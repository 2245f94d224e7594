"""End-to-end CLI integration: train a tiny model on synthetic wavs (the
reference's --debug smoke, train.py:72-77), checkpoint, then generate and
evaluate from the checkpoint. Exercises loaders, cadence, checkpointing,
visualizer, and both inference CLIs."""

import os

import numpy as np
import pytest

from pix2pixhdaudiosr_tpu.config import Config
from pix2pixhdaudiosr_tpu.data import write_wav


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    wav_dir = root / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        t = np.arange(40000) / 48000
        x = (0.4 * np.sin(2 * np.pi * (250 + 60 * i) * t)
             + 0.05 * rng.standard_normal(40000)).astype(np.float32)
        write_wav(str(wav_dir / f"v{i}.wav"), x, 48000)
    return {"root": root, "wav_dir": str(wav_dir),
            "ckpt_dir": str(root / "checkpoints")}


def tiny_cfg(env, **kw):
    base = dict(
        name="e2e_tiny", checkpoints_dir=env["ckpt_dir"],
        dataroot=env["wav_dir"], net_g="global", ngf=4,
        n_downsample_global=2, n_blocks_global=1, ndf=4, n_layers_d=2,
        num_d=2, input_nc=2, output_nc=2, label_nc=0, batch_size=2,
        explicit_encoding=True, mask_mode="mode2", no_instance=True,
        no_vgg_loss=True, niter=1, niter_decay=0, save_epoch_freq=1,
        save_latest_freq=4, print_freq=2, display_freq=4, eval_freq=4,
        validation_split=0.34, eval_size=1, n_threads=2, seed=7,
        compute_dtype="float32",
    )
    base.update(kw)
    return Config(**base)


@pytest.mark.slow
def test_freq_zero_disables_cadences(env):
    # Any --*_freq 0 with a validation split must mean "never", not a
    # ZeroDivisionError in the cadence modulos (found by a verify drive-run
    # with --eval_freq 0; the fix covers the whole freq family).
    from pix2pixhdaudiosr_tpu.train_loop import main as train_main
    cfg = tiny_cfg(env, name="e2e_evalfreq0", eval_freq=0, print_freq=0,
                   display_freq=0, save_latest_freq=0)
    train_main(cfg=cfg)
    expr = cfg.expr_dir
    assert os.path.exists(os.path.join(expr, "latest_state"))  # epoch save
    assert not os.path.exists(os.path.join(expr, "eval.csv"))
    with open(os.path.join(expr, "loss_log.txt")) as f:
        assert "G_GAN" not in f.read()  # print cadence disabled


@pytest.mark.slow
def test_train_generate_evaluate(env):
    from pix2pixhdaudiosr_tpu.train_loop import main as train_main
    cfg = tiny_cfg(env)
    train_main(cfg=cfg)
    expr = cfg.expr_dir
    assert os.path.exists(os.path.join(expr, "latest_state"))
    assert os.path.exists(os.path.join(expr, "1_state"))
    assert os.path.exists(os.path.join(expr, "iter.txt"))
    assert os.path.exists(os.path.join(expr, "loss_log.txt"))
    assert os.path.exists(os.path.join(expr, "eval.csv"))
    assert os.path.exists(os.path.join(expr, "validation_indices.json"))
    with open(os.path.join(expr, "loss_log.txt")) as f:
        log = f.read()
    assert "G_GAN" in log and "D_real" in log

    # resume must pick up the persisted cursor and split
    cfg2 = cfg.replace(continue_train=True)
    train_main(cfg=cfg2)

    # ---- generate from the checkpoint
    from pix2pixhdaudiosr_tpu.generate import main as gen_main
    wav0 = os.path.join(env["wav_dir"], "v0.wav")
    gcfg = tiny_cfg(env, name="e2e_gen", dataroot=wav0,
                    load_pretrain=expr, phase="test", serial_batches=True,
                    is_train=False)
    gen_main(cfg=gcfg)
    gexpr = gcfg.expr_dir
    assert os.path.exists(os.path.join(gexpr, "sr_audio.wav"))
    assert os.path.exists(os.path.join(gexpr, "metric.txt"))
    assert os.path.exists(os.path.join(gexpr, "web", "index.html"))
    from pix2pixhdaudiosr_tpu.data import read_wav
    sr, rate = read_wav(os.path.join(gexpr, "sr_audio.wav"))
    assert rate == 48000 and sr.shape[-1] >= 40000

    # ---- seamless context-parallel generate (--cp_shards; VERDICT r2 ask 6)
    ccfg = tiny_cfg(env, name="e2e_gen_cp", dataroot=wav0,
                    load_pretrain=expr, phase="test", serial_batches=True,
                    is_train=False, cp_shards=4)
    gen_main(cfg=ccfg)
    sr_cp, rate_cp = read_wav(os.path.join(ccfg.expr_dir, "sr_audio.wav"))
    assert rate_cp == 48000 and np.isfinite(sr_cp).all()
    assert sr_cp.shape[-1] >= 40000

    # tp+cp must be rejected clearly (cp's shard_map would silently
    # re-replicate the TP-sharded params — self-review finding)
    import pytest as _pytest
    bad = tiny_cfg(env, name="e2e_gen_tpcp", dataroot=wav0,
                   load_pretrain=expr, phase="test", serial_batches=True,
                   is_train=False, cp_shards=2, tp_shards=2)
    with _pytest.raises(SystemExit, match="cannot be combined"):
        gen_main(cfg=bad)

    # int8/fused serving kernels are not CP-aware — must reject, not
    # silently serve a full-precision trunk (ADVICE r3)
    bad2 = tiny_cfg(env, name="e2e_gen_int8cp", dataroot=wav0,
                    load_pretrain=expr, phase="test", serial_batches=True,
                    is_train=False, cp_shards=2, int8_trunk=True)
    with _pytest.raises(SystemExit, match="context-parallel-aware"):
        gen_main(cfg=bad2)

    # ---- standalone evaluation
    from pix2pixhdaudiosr_tpu.evaluate import main as eval_main
    ecfg = tiny_cfg(env, name="e2e_eval", load_pretrain=expr, niter=1,
                    validation_split=0.0, is_train=False)
    eval_main(cfg=ecfg)
    with open(os.path.join(ecfg.expr_dir, "eval.csv")) as f:
        rows = f.read().strip().splitlines()
    assert rows[0] == "err,snr,snr_seg,pesq,lsd"
    assert len(rows) >= 2
    # snr_seg is the REAL measured segmental SNR (the reference writes 0
    # there — pysepm disabled; see metrics.py docstring)
    assert float(rows[1].split(",")[2]) != 0.0
