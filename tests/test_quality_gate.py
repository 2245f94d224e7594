"""Converged-quality regression gate (VERDICT.md round-1 item 3).

A fixed-seed synthetic harmonic corpus is trained for a few dozen GAN steps
on the CPU mesh and the in-training eval LSD must (a) end below a pinned
threshold and (b) improve substantially from the first eval. A numerics
change that still converges-but-worse fails here even when every unit test
passes. Mirrors the reference's in-training eval loop semantics
(reference train.py:95-125).

Calibration (this exact seed/config, CPU): eval LSD trajectory
3.26 -> 2.46 (by ~30 steps) -> 2.37 (by ~60 steps); the lowpassed input
scores ~3.9 LSD on this corpus. Thresholds carry ~0.4 LSD of margin.
"""

import csv
import os

import numpy as np
import pytest

from pix2pixhdaudiosr_tpu.config import Config
from pix2pixhdaudiosr_tpu.data import write_wav


def _make_corpus(wav_dir):
    rng = np.random.default_rng(42)
    for i in range(8):
        t = np.arange(48000) / 48000.0
        f0 = 220.0 + 35.0 * i
        x = sum(np.sin(2 * np.pi * f0 * k * t + rng.uniform(0, 6.28)) / k
                for k in range(1, 40) if f0 * k < 20000)
        x = (0.35 * x / np.max(np.abs(x))).astype(np.float32)
        write_wav(os.path.join(wav_dir, f"h{i}.wav"), x, 48000)


@pytest.mark.slow
def test_training_improves_lsd(tmp_path):
    from pix2pixhdaudiosr_tpu.train_loop import main as train_main

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    _make_corpus(str(wav_dir))
    cfg = Config(
        name="qgate", checkpoints_dir=str(tmp_path / "ck"),
        dataroot=str(wav_dir), net_g="global", ngf=16, n_downsample_global=2,
        n_blocks_global=2, ndf=8, n_layers_d=2, num_d=2,
        input_nc=2, output_nc=2, label_nc=0, batch_size=4,
        explicit_encoding=True, mask_mode="mode2", no_instance=True,
        no_vgg_loss=True, use_match_loss=True, niter=32, niter_decay=0,
        save_epoch_freq=10**6, save_latest_freq=10**9, print_freq=10**9,
        display_freq=10**9, eval_freq=16, validation_split=0.25,
        eval_size=2, n_threads=2, seed=7, compute_dtype="float32")
    train_main(cfg=cfg)

    with open(os.path.join(cfg.expr_dir, "eval.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) >= 2, rows
    lsds = [float(r["lsd"]) for r in rows]
    snrs = [float(r["snr"]) for r in rows]
    # (a) converged quality under the pinned threshold
    assert lsds[-1] < 2.8, f"final LSD regressed: {lsds}"
    # (b) training actually moved the needle vs the first eval
    assert lsds[0] - min(lsds) > 0.4, f"no LSD improvement: {lsds}"
    assert max(snrs) > snrs[0], f"no SNR improvement: {snrs}"
