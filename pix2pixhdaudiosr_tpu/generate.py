"""File-to-file chunked inference CLI.

Parity: reference generate_audio.py:14-83 — load ONE wav, resample down/up
(or --is_lr_input), chop into segments, batch through the generator, invert
each batch with the eval IMDCT helper, concatenate, scale by
sqrt(up_ratio - 1), score MSE/SNR/LSD against the raw input, emit the HTML
visuals, metric.txt, and sr/lr/hr wavs into checkpoints_dir/name/.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config, parse_config
from .data import AudioTestDataset, write_wav
from .metrics import compute_metrics
from .system import Pix2PixHDSystem
from .trainer import init_state
from .utils import CheckpointManager, Visualizer
from .utils.spectro_img import compute_visuals


def plan_cp_padding(length: int, hop: int, win: int, center: bool,
                    shards: int, stride: int):
    """The cp_generate padding contract, as a pure function: pad a
    `length`-sample file to `need` samples so its frame count `t_frames`
    divides shards x stride under the reference codec pad rule. Returns
    (need, t_frames) — every config plans (pinned by
    tests/test_halo_cp.py::test_cp_padding_envelope).

    `frames_for(seg)` depends on seg only through ceil(seg/hop) =: K
    (the codec rounds the padded signal up to the hop grid,
    system.py:frames_for / reference models/mdct.py:379-391):
        frames = K + floor((2*start - win) / hop) + 1,  start = hop|0.
    So for ANY target t_frames a hop-aligned preimage exists:
        need = (t_frames - 1 - floor((2*start - win) / hop)) * hop,
    including win % hop != 0 configs (e.g. 512/160), where the round-3
    formula `(t-1)*hop + win - 2*start` was off-grid and bailed out."""
    frames = Pix2PixHDSystem.frames_for(length, hop, win, center)
    start = hop if center else 0
    # the decode side reconstructs (t-1)*hop + win samples, center-cropped by
    # 2*(win//2) when centered; for hop | win that equals `need` exactly, but
    # non-dividing codecs come up short (the codec's end-pad rounds past the
    # last frame), so t must also be large enough for the reconstruction to
    # cover the original file
    recon_0 = win - 2 * (win // 2) if center else win     # recon at t = 1
    t_min = max(frames, -(-(length - recon_0) // hop) + 1)
    q = shards * stride                 # per-shard frames must cover stride
    t_frames = -(-t_min // q) * q
    need = (t_frames - 1 - (2 * start - win) // hop) * hop
    if (need < length
            or Pix2PixHDSystem.frames_for(need, hop, win, center) != t_frames):
        # fail loud, not wrong-length: reachable only if frames_for's pad
        # rule ever diverges from the closed form above
        raise RuntimeError(
            f"cp padding plan violated its contract for win={win} hop={hop} "
            f"center={center} length={length} (need={need}, "
            f"t_frames={t_frames}); file a bug — the chunked path "
            f"(--cp_shards 1) still works")
    return need, t_frames


def cp_generate(system, params_g, lr_audio, cfg) -> np.ndarray:
    """--cp_shards N: one seamless full-length forward, frame axis sharded
    over an N-device cp mesh (parallel/halo.py make_cp_generator). The file
    is padded so the frame count divides shards x generator-stride; the
    spectrogram normalization and InstanceNorm statistics span the WHOLE
    file (exactly what an unsharded full-length forward computes), not each
    chunk — which is why there are no seams to begin with."""
    from .parallel import make_mesh
    from .parallel.halo import make_cp_generator

    if system.cfg.use_features:
        # covers both the netE path and --load_features (netE is None there
        # but the generator still expects feat_num extra input channels)
        raise SystemExit("--cp_shards does not support feature-encoder "
                         "configs (--instance_feat/--label_feat/"
                         "--use_encoded_image); use the chunked path")
    n = min(cfg.cp_shards, len(jax.devices()))
    mesh = make_mesh((n,), ("cp",), devices=jax.devices()[:n])

    stride = 2 ** cfg.n_downsample_global
    if cfg.net_g == "local":
        stride *= 2 ** cfg.n_local_enhancers
    hop, win, center = cfg.hop_length, cfg.win_length, cfg.center
    length = int(np.asarray(lr_audio).shape[-1])
    need, t_frames = plan_cp_padding(length, hop, win, center, n, stride)
    lr_full = np.zeros(need, np.float32)  # need >= length by plan contract
    lr_full[:length] = np.asarray(lr_audio, np.float32)

    # a full-length codec/system (the training codec crops its inverse to
    # segment_length); the generator param tree is identical
    full = Pix2PixHDSystem(system.cfg.replace(segment_length=need))
    cp_g = make_cp_generator(full, mesh, axis="cp")

    rng = jax.random.PRNGKey(cfg.seed)
    encode = jax.jit(lambda a, k: full.encode_input(a, None, k)[:3])
    lr_spec, lr_pha, lr_norm = encode(jnp.asarray(lr_full[None]), rng)
    print(f"context-parallel inference: {t_frames} frames over {n} shards")
    sr_spec = cp_g(params_g, lr_spec)
    decode = jax.jit(lambda s, p, m, k: full.codec.imdct_eval(
        jnp.abs(s), p, m, rng=k))
    wav = np.asarray(decode(sr_spec, lr_pha, lr_norm, rng)).reshape(-1)
    return np.sqrt(cfg.up_ratio - 1) * wav


def main(argv=None, cfg: Optional[Config] = None) -> None:
    from .utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    if cfg is None:
        cfg = parse_config(argv, is_train=False)
    # after parse_config: a config typo / --help must not pay TPU bring-up
    from .utils.watchdog import backend_watchdog
    backend_watchdog()
    if cfg.tp_shards > 1 and cfg.cp_shards > 1:
        # cp_generate's shard_map replicates params over the cp mesh, which
        # would silently undo the TP sharding (and its memory saving);
        # checked before any restore/compile — it's a pure-config error
        raise SystemExit("--tp_shards and --cp_shards cannot be combined in "
                         "generate; pick one parallelism for inference")
    if (cfg.int8_trunk or cfg.fused_enhancer) and cfg.cp_shards > 1:
        # the int8-MXU resblock stack (ops/quant.py) and the Pallas fused
        # enhancer chain are not halo/CP-aware; make_cp_generator would
        # silently rebuild the plain XLA generator instead
        raise SystemExit("--int8_trunk/--fused_enhancer cannot be combined "
                         "with --cp_shards in generate; these serving "
                         "kernels are not context-parallel-aware")
    visualizer = Visualizer(cfg.replace(is_train=True))  # web dir on

    ds = AudioTestDataset(cfg.dataroot, cfg.lr_sampling_rate,
                          cfg.hr_sampling_rate, cfg.segment_length,
                          is_lr_input=cfg.is_lr_input)
    print("Audio length:", ds.audio_len)
    print("#audio segments = %d" % len(ds))

    # --int8_trunk additionally switches the trunk resblocks to int8-MXU
    # dots (ops/quant.py int8_resblock_stack). Not implied by --data_type 8:
    # on v5e the in-graph quantize/dequantize overheads outweigh the 2.4x
    # MXU dot rate for these tensor sizes (BASELINE.md round-2b).
    system = Pix2PixHDSystem(cfg.replace(is_train=True))
    state, *_ = init_state(system, jax.random.PRNGKey(cfg.seed), batch=1)
    ckpt = CheckpointManager(cfg.expr_dir)
    src = cfg.load_pretrain or cfg.expr_dir
    state = ckpt.restore(cfg.which_epoch, target=jax.device_get(state),
                         expr_dir=src)
    params_g = state.params["G"]
    if cfg.data_type == 8:
        # int8 weight-only quantized inference (--data_type 8; the reference
        # parses this flag but never implements it — ops/quant.py)
        from .ops.quant import dequantize_params, quantize_params
        qtree, scales = quantize_params(params_g)
        params_g = dequantize_params(qtree, scales, jnp.float32)
        print("int8 weight quantization enabled")
    if jnp.dtype(system.dtype) == jnp.bfloat16:
        # Every conv casts its params to the compute dtype on every call, so
        # serving with an f32 param tree re-reads + re-casts 624 MB (flagship)
        # per forward. Pre-casting once is bit-identical (same cast, done
        # early) and halves the param HBM traffic.
        params_g = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, params_g)
    if cfg.tp_shards > 1:
        # Megatron tensor parallelism over the resblock channel dim: place
        # the params with column/row shardings and let XLA insert the
        # per-block psum (parallel/tp.py; SURVEY.md §2.3 TP row).
        from .parallel import make_mesh
        from .parallel.tp import shard_generator_params
        n = min(cfg.tp_shards, len(jax.devices()))
        tp_mesh = make_mesh((n,), ("tp",), devices=jax.devices()[:n])
        params_g = shard_generator_params(params_g, tp_mesh)
        print(f"tensor-parallel inference over {n} shards")

    if cfg.cp_shards > 1:
        # Seamless long-audio inference: the WHOLE file is one spectrogram,
        # frame-axis-sharded over a cp mesh with per-conv-layer halo
        # exchange (parallel/halo.py). Output == an unsharded full-length
        # forward (<=6e-7, tests/test_halo_cp.py) — no segment seams, unlike
        # the reference's independent chunks (generate_audio.py:43-47).
        audio = cp_generate(system, params_g, ds.lr_audio, cfg)
    else:
        @jax.jit
        def infer(pg, lr_audio, rng):
            sr_spec, lr_pha, lr_norm, _ = system.inference(pg, lr_audio, rng)
            wav = system.codec.imdct_eval(jnp.abs(sr_spec), lr_pha, lr_norm,
                                          rng=rng)
            return wav

        segments = ds.segments
        outs = []
        bs = max(1, cfg.batch_size)
        for i in range(0, len(segments), bs):
            batch = segments[i : i + bs]
            pad = bs - batch.shape[0]
            if pad:
                batch = np.concatenate(
                    [batch, np.zeros((pad,) + batch.shape[1:], batch.dtype)])
            wav = np.asarray(infer(params_g, jnp.asarray(batch),
                                   jax.random.PRNGKey(cfg.seed + i)))
            outs.append(wav[: wav.shape[0] - pad] if pad else wav)
        audio = np.sqrt(cfg.up_ratio - 1) * np.concatenate(outs, 0).reshape(-1)
    audio = audio[: ds.segments.size]

    n = ds.audio_len
    lr_trim = ds.lr_audio[:n]
    mse, snr_sr, snr_lr, *_, lsd = compute_metrics(
        jnp.asarray(ds.raw_audio[None, :n]), jnp.asarray(lr_trim[None]),
        jnp.asarray(audio[None, :n]), cfg.n_fft, cfg.hop_length,
        cfg.win_length, cfg.center)
    print("MSE: %.4f" % mse)
    print("SNR_SR: %.4f" % snr_sr)
    print("SNR_LR: %.4f" % snr_lr)
    print("LSD: %.4f" % lsd)
    # working segmental SNR (the reference's pysepm SNRseg is disabled and
    # its eval rows carry 0; this extra line doesn't change those)
    from .metrics import segmental_snr
    print("SSNR: %.4f" % segmental_snr(ds.raw_audio[:n], audio[:n]))

    # visuals (reference generate_audio.py:62-74)
    rng = jax.random.PRNGKey(cfg.seed)
    lr_spec, _, _, sr_spec, _, _ = system.encode_input(
        jnp.asarray(ds.lr_audio[None]), jnp.asarray(audio[None]), rng)
    if cfg.explicit_encoding:
        lr_mag = 0.5 * (lr_spec[0, :, :, 0] + lr_spec[0, :, :, 1])
        sr_mag = 0.5 * (sr_spec[0, :, :, 0] + sr_spec[0, :, :, 1])
    else:
        lr_mag, sr_mag = lr_spec[0, :, :, 0], sr_spec[0, :, :, 0]
    lr_img, lr_hist, _ = compute_visuals(sp=np.asarray(lr_mag), abs=True)
    sr_img, sr_hist, _ = compute_visuals(sp=np.asarray(sr_mag), abs=True)
    visualizer.display_current_results(
        {"lable_spectro": lr_img, "generated_spectro": sr_img,
         "lable_hist": lr_hist, "generated_hist": sr_hist}, 1, 1)

    with open(os.path.join(cfg.expr_dir, "metric.txt"), "w") as f:
        f.write("MSE,SNR_SR,LSD\n")
        f.write("%f,%f,%f" % (mse, snr_sr, lsd))
    write_wav(os.path.join(cfg.expr_dir, "sr_audio.wav"), audio,
              cfg.hr_sampling_rate)
    write_wav(os.path.join(cfg.expr_dir, "lr_audio.wav"), ds.lr_audio,
              cfg.hr_sampling_rate)
    write_wav(os.path.join(cfg.expr_dir, "hr_audio.wav"), ds.raw_audio,
              ds.in_sampling_rate)
    print("wrote outputs to", cfg.expr_dir)


if __name__ == "__main__":
    main()
