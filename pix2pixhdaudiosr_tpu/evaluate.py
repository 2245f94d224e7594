"""Standalone test-set evaluation CLI.

Parity: reference eval_matric.py:20-101 — run the inference path over a csv
test set, invert with the eval IMDCT (note the reference's 2*sr_audio scale
quirk at eval_matric.py:83, reproduced), and append mean
{err, snr, snr_seg, pesq, lsd} rows to eval.csv per epoch.
"""

from __future__ import annotations

import csv
import os
from typing import Optional

import jax
import numpy as np

from .config import Config, parse_config
from .data import AudioDataset, Loader, discover_files
from .metrics import compute_metrics
from .system import Pix2PixHDSystem
from .trainer import init_state, make_eval_step
from .utils import CheckpointManager


def main(argv=None, cfg: Optional[Config] = None) -> None:
    from .utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    if cfg is None:
        cfg = parse_config(argv, is_train=False)
    # after parse_config: a config typo / --help must not pay TPU bring-up
    from .utils.watchdog import backend_watchdog
    backend_watchdog()

    files = discover_files(cfg.dataroot, cfg.max_dataset_size)
    dataset = AudioDataset(cfg.dataroot, cfg.lr_sampling_rate,
                           cfg.hr_sampling_rate, cfg.segment_length,
                           seed=cfg.seed, files=files)
    loader = Loader(dataset, range(len(dataset)), cfg.batch_size,
                    shuffle=False, n_threads=cfg.n_threads, drop_last=False)
    print("#eval data = %d" % (len(loader) * cfg.batch_size))

    system = Pix2PixHDSystem(cfg.replace(is_train=True))
    state, *_ = init_state(system, jax.random.PRNGKey(cfg.seed), batch=1)
    ckpt = CheckpointManager(cfg.expr_dir)
    src = cfg.load_pretrain or cfg.expr_dir
    state = ckpt.restore(cfg.which_epoch, target=jax.device_get(state),
                         expr_dir=src)
    eval_step = make_eval_step(system)
    eval_path = os.path.join(cfg.expr_dir, "eval.csv")

    errs, snrs, snr_segs, pesqs, lsds = [], [], [], [], []
    for epoch in range(1, cfg.niter + 1):
        for j, data in enumerate(loader):
            sr_audio, _ = eval_step(state.params["G"], data["label"],
                                    jax.random.PRNGKey(cfg.seed + j))
            # the eval_step already applies sqrt(up-1); the reference's extra
            # 2x (eval_matric.py:83) is scale-invariant under compute_metrics
            m, s_sr, s_lr, ss_sr, ss_lr, pesq, lsd = compute_metrics(
                data["image"], data["label"], 2 * np.asarray(sr_audio),
                cfg.n_fft, cfg.hop_length, cfg.win_length, cfg.center)
            errs.append(m)
            snrs.append(s_sr)
            snr_segs.append(ss_sr)
            pesqs.append(pesq)
            lsds.append(lsd)
        result = {"err": float(np.mean(errs)), "snr": float(np.mean(snrs)),
                  "snr_seg": float(np.mean(snr_segs)),
                  "pesq": float(np.mean(pesqs)), "lsd": float(np.mean(lsds))}
        with open(eval_path, "a") as f:
            w = csv.DictWriter(f, fieldnames=result.keys())
            if f.tell() == 0:
                w.writeheader()
            w.writerow(result)
        print("Evaluation:", result)


if __name__ == "__main__":
    main()
