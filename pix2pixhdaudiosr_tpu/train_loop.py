"""Training CLI.

Parity: reference train.py:26-231 — resumable epoch loop with sample-counted
print/display/save/eval cadence, lcm(print_freq, batch) alignment, SIGINT
save-and-exit, the niter_fix_global switch, linear LR decay after `niter`
epochs, eval.csv rows of {err, snr, snr_seg, pesq, lsd}, and the optional
fake pool.

TPU-native: one jitted two-optimizer step over a data-parallel mesh; the host
loop only feeds sharded batches and handles cadence/checkpoint/logging.
"""

from __future__ import annotations

import csv
import math
import os
import signal
import time
from typing import Optional

import jax
import numpy as np

from .config import Config, parse_config
from .data import AudioDataset, Loader, discover_files, train_val_split
from .metrics import compute_metrics
from .parallel import replicated, shard_batch
from .parallel.mesh import device_prefetch, make_data_mesh
from .system import Pix2PixHDSystem
from .trainer import (init_state, make_eval_step, make_pool_steps,
                      make_train_step, reset_opt_g, set_learning_rate)
from .utils import CheckpointManager, Visualizer
from .utils.image_pool import ImagePool


def lcm(a: int, b: int) -> int:
    return abs(a * b) // math.gcd(a, b) if a and b else 0


def main(argv=None, cfg: Optional[Config] = None) -> None:
    from .utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    if cfg is None:
        cfg = parse_config(argv, is_train=True)
    # after parse_config: a config typo / --help must not pay TPU bring-up
    from .utils.watchdog import backend_watchdog
    backend_watchdog()
    np.random.seed(cfg.seed)

    ckpt = CheckpointManager(cfg.expr_dir)
    if cfg.continue_train:
        start_epoch, epoch_iter = ckpt.load_iter()
        print("Resuming from epoch %d at iteration %d" % (start_epoch, epoch_iter))
    else:
        start_epoch, epoch_iter = 1, 0

    # ---------------- data
    if not cfg.dataroot:
        raise SystemExit("--dataroot is required: a corpus directory or a "
                         "csv file list (reference data/audio_dataset.py:64-79)")
    files = discover_files(cfg.dataroot, cfg.max_dataset_size)
    train_idx, val_idx = train_val_split(
        len(files), cfg.validation_split, cfg.seed,
        os.path.join(cfg.expr_dir, "validation_indices.json")
        if cfg.validation_split > 0 else None)
    dataset = AudioDataset(cfg.dataroot, cfg.lr_sampling_rate,
                           cfg.hr_sampling_rate, cfg.segment_length,
                           seed=cfg.seed, files=files)
    train_loader = Loader(dataset, train_idx, cfg.batch_size,
                          shuffle=not cfg.serial_batches, seed=cfg.seed,
                          n_threads=cfg.n_threads)
    # torch DataLoader keeps partial batches (drop_last=False); without this a
    # validation split smaller than one batch would silently disable eval
    eval_loader = Loader(dataset, val_idx, cfg.batch_size, shuffle=False,
                         seed=cfg.seed, n_threads=cfg.n_threads,
                         drop_last=False) \
        if val_idx else None
    dataset_size = len(train_loader) * cfg.batch_size
    print("#training data = %d" % dataset_size)
    print("#evaluating data = %d" % (len(val_idx) if val_idx else 0))
    if dataset_size == 0:
        raise SystemExit(
            f"no training batches: {len(train_idx)} training files after the "
            f"{cfg.validation_split} validation split is less than one batch "
            f"of {cfg.batch_size} (training drops partial batches, matching "
            f"the reference's drop_last DataLoader) — add files, lower "
            f"--batchSize, or lower --validation_split")

    # ---------------- model/state
    system = Pix2PixHDSystem(cfg)
    state, opt_g, opt_d = init_state(system, jax.random.PRNGKey(cfg.seed),
                                     batch=cfg.batch_size)
    if cfg.continue_train and ckpt.has(cfg.which_epoch):
        state = ckpt.restore(cfg.which_epoch, target=jax.device_get(state))
        print("restored checkpoint '%s'" % cfg.which_epoch)
    elif cfg.load_pretrain:
        state = ckpt.restore(cfg.which_epoch, target=jax.device_get(state),
                             expr_dir=cfg.load_pretrain)
        print("warm-started from %s" % cfg.load_pretrain)

    mesh = make_data_mesh(cfg.batch_size, cfg.mesh_shape, cfg.mesh_axes)
    state = jax.device_put(state, replicated(mesh))
    if cfg.fsdp:
        from .parallel.fsdp import apply_fsdp
        state = apply_fsdp(state, mesh)
    elif cfg.zero_opt_state:
        from .parallel.zero import apply_zero
        state = apply_zero(state, mesh)

    use_pool = cfg.pool_size > 0
    pool = ImagePool(cfg.pool_size, cfg.seed)
    if use_pool:
        g_step, d_step = make_pool_steps(system, opt_g, opt_d)
    else:
        step = make_train_step(system, opt_g, opt_d)
    eval_step = make_eval_step(system)
    visualizer = Visualizer(cfg)

    # ---------------- cadence (reference train.py:70-82)
    # Any freq <= 0 disables that cadence entirely (the reference's argparse
    # defaults are all positive; a 0 would ZeroDivisionError the modulos).
    print_freq = lcm(cfg.print_freq, cfg.batch_size) if cfg.print_freq > 0 else 0
    total_steps = (start_epoch - 1) * dataset_size + epoch_iter
    display_delta = total_steps % cfg.display_freq if cfg.display_freq > 0 else -1
    print_delta = total_steps % print_freq if print_freq > 0 else -1
    save_delta = total_steps % cfg.save_latest_freq if cfg.save_latest_freq > 0 else -1
    do_eval = cfg.validation_split > 0 and cfg.eval_freq > 0
    eval_delta = total_steps % cfg.eval_freq if do_eval else -1

    end = {"flag": False}

    def _sigint(_sig, _frm):
        print("You pressed Ctrl+C!")
        end["flag"] = True

    signal.signal(signal.SIGINT, _sigint)

    eval_path = os.path.join(cfg.expr_dir, "eval.csv")

    def eval_model(params_g):
        """reference train.py:95-125."""
        errs, snrs, snr_segs, pesqs, lsds = [], [], [], [], []
        for j, data in enumerate(eval_loader):
            sr_audio, _ = eval_step(params_g, data["label"],
                                    jax.random.PRNGKey(cfg.seed + j))
            m, s_sr, s_lr, ss_sr, ss_lr, pesq, lsd = compute_metrics(
                data["image"], data["label"], np.asarray(sr_audio),
                cfg.n_fft, cfg.hop_length, cfg.win_length, cfg.center)
            errs.append(m)
            snrs.append((s_lr, s_sr))
            # real measured SSNR of sr (the reference's column is all-zero —
            # pysepm disabled; see metrics.py docstring / PARITY.md)
            snr_segs.append(ss_sr)
            pesqs.append(pesq)
            lsds.append(lsd)
            if j >= cfg.eval_size:
                break
        result = {"err": float(np.mean(errs)), "snr": float(np.mean(snrs)),
                  "snr_seg": float(np.mean(snr_segs)),
                  "pesq": float(np.mean(pesqs)), "lsd": float(np.mean(lsds))}
        with open(eval_path, "a") as f:
            w = csv.DictWriter(f, fieldnames=result.keys())
            if f.tell() == 0:
                w.writeheader()
            w.writerow(result)
        print("Evaluation:", result)

    def guard_finite(losses, epoch, epoch_iter):
        """Divergence guard: a non-finite loss means every subsequent step is
        garbage — save a post-mortem checkpoint and stop with the last good
        'latest' still on disk. Called at print cadence AND before every
        'latest' overwrite (so --print_freq 0 cannot let a NaN state clobber
        the last good checkpoint). Returns the host-side loss dict."""
        errors = {k: float(v) for k, v in losses.items()}
        if not all(math.isfinite(v) for v in errors.values()):
            ckpt.save(state, "diverged")
            raise SystemExit(
                f"non-finite losses at epoch {epoch} iter "
                f"{epoch_iter}: {errors} — state saved under the "
                f"'diverged' tag; resume from 'latest' (last good "
                f"save) with --continue_train, typically with a "
                f"lower --lr")
        return errors

    # ---------------- epoch loop (reference train.py:128-231)
    lr_value = cfg.lr
    losses = {}  # guard_finite is a no-op until the first step lands
    fix_global = cfg.niter_fix_global > 0 and start_epoch <= cfg.niter_fix_global
    iter_start_time = time.time()
    for epoch in range(start_epoch, cfg.niter + cfg.niter_decay + 1):
        epoch_start_time = time.time()
        if epoch != start_epoch:
            epoch_iter = epoch_iter % dataset_size
        for data, batch in device_prefetch(train_loader, mesh):
            if end["flag"]:
                # Ctrl+C on an obviously-diverged run must not clobber the
                # last good 'latest' either — same guard as every other save
                guard_finite(losses, epoch, epoch_iter)
                print("exiting and saving the model at epoch %d, iters %d"
                      % (epoch, total_steps))
                ckpt.save(state, "latest")
                ckpt.save(state, str(epoch))
                ckpt.save_iter(epoch + 1, 0)
                return
            if print_freq > 0 and total_steps % print_freq == print_delta:
                iter_start_time = time.time()
            total_steps += cfg.batch_size
            epoch_iter += cfg.batch_size
            save_fake = (cfg.display_freq > 0
                         and total_steps % cfg.display_freq == display_delta)

            rng = jax.random.PRNGKey(cfg.seed * 1000003 + total_steps)
            if use_pool:
                state, losses, aux = g_step(state, batch, rng,
                                            fix_global=fix_global,
                                            with_visuals=save_fake)
                pooled = pool.query(np.asarray(aux["fake_pair"]))
                state, d_losses = d_step(state, batch, rng,
                                         shard_batch(pooled, mesh))
                losses = {**losses, **d_losses}
            else:
                state, losses, aux = step(state, batch, rng, None,
                                          fix_global=fix_global,
                                          with_visuals=save_fake)

            if print_freq > 0 and total_steps % print_freq == print_delta:
                errors = guard_finite(losses, epoch, epoch_iter)
                t = (time.time() - iter_start_time) / print_freq
                visualizer.print_current_errors(epoch, epoch_iter, errors, t)
                visualizer.plot_current_errors(errors, total_steps)

            if save_fake and "visuals" in aux:
                raw = {k: np.asarray(v) for k, v in aux["visuals"].items()}
                visualizer.display_current_results(
                    visualizer.render_visuals(raw, cfg.abs_spectro),
                    epoch, total_steps)

            if (cfg.save_latest_freq > 0
                    and total_steps % cfg.save_latest_freq == save_delta):
                guard_finite(losses, epoch, epoch_iter)
                print("saving the latest model (epoch %d, total_steps %d)"
                      % (epoch, total_steps))
                ckpt.save(state, "latest")
                ckpt.save_iter(epoch, epoch_iter)

            if eval_loader and do_eval and total_steps % cfg.eval_freq == eval_delta:
                eval_model(state.params["G"])

            if epoch_iter >= dataset_size:
                break

        print("End of epoch %d / %d \t Time Taken: %d sec"
              % (epoch, cfg.niter + cfg.niter_decay,
                 time.time() - epoch_start_time))

        if cfg.save_epoch_freq > 0 and epoch % cfg.save_epoch_freq == 0:
            guard_finite(losses, epoch, epoch_iter)
            print("saving the model at the end of epoch %d, iters %d"
                  % (epoch, total_steps))
            ckpt.save(state, "latest")
            ckpt.save(state, str(epoch))
            ckpt.save_iter(epoch + 1, 0)

        # fix-global -> full finetune switch (reference train.py:226-227)
        if cfg.niter_fix_global != 0 and epoch == cfg.niter_fix_global:
            state = reset_opt_g(state, opt_g, lr_value)
            fix_global = False
            print("------------ Now also finetuning global generator -----------")

        # linear LR decay (reference train.py:230-231)
        if epoch > cfg.niter:
            lr_value -= cfg.lr / cfg.niter_decay
            state = set_learning_rate(state, lr_value)
            if cfg.verbose:
                print("update learning rate: %f" % lr_value)


if __name__ == "__main__":
    main()
