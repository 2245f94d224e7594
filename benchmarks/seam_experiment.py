"""Quantify segment-seam discontinuities: reference-style chunked inference
vs frame-axis context-parallel (seamless) inference.

The reference chops long audio into independent segments and concatenates
the generator outputs (reference data/audio_dataset.py:124-135,
generate_audio.py:43-47) — each chunk gets its own spectrogram max/min
normalization, its own mask-noise realization, and its own InstanceNorm
statistics, so the waveform jumps at every 32512-sample boundary. The CP
path (generate.cp_generate / parallel/halo.py) runs ONE full-length forward
with the frame axis sharded, so there are no boundaries at all.

Metric: first-difference |x[t] - x[t-1]| at the chunk seams (max over a
+/-1 sample window at each boundary) compared against the 99.9th percentile
of the same statistic everywhere else. A seam/background ratio >> 1 means
audible clicks. Also reports spectral flux (L2 of consecutive magnitude-
spectrum differences, 1024-sample frames) at seam-straddling frames vs
elsewhere.

CPU-runnable (tiny generator; the effect is architectural, not scale- or
training-dependent). Usage: python benchmarks/seam_experiment.py
[--wav /path/to/speech.wav] — with --wav the LR input is real speech,
constructed exactly like generate's AudioTestDataset (resample 48k->8k->48k),
instead of the synthetic harmonic default.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if not os.environ.get("SEAM_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np


def seam_stats(audio: np.ndarray, seams, frame: int = 1024):
    d = np.abs(np.diff(audio))
    mask = np.zeros(d.size, bool)
    for s in seams:
        if 1 <= s < d.size:
            mask[max(0, s - 2): s + 2] = True
    seam_jump = float(d[mask].max()) if mask.any() else 0.0
    bg = float(np.percentile(d[~mask], 99.9))
    # spectral flux
    n = (audio.size // frame) * frame
    spec = np.abs(np.fft.rfft(audio[:n].reshape(-1, frame), axis=1))
    flux = np.linalg.norm(np.diff(spec, axis=0), axis=1)
    seam_frames = sorted({min(s // frame, flux.size - 1) for s in seams
                          if s // frame < flux.size})
    other = np.setdiff1d(np.arange(flux.size), seam_frames)
    return {
        "seam_max_jump": seam_jump,
        "background_p999_jump": bg,
        "jump_ratio": seam_jump / max(bg, 1e-12),
        "seam_flux_mean": float(flux[seam_frames].mean()) if seam_frames else 0.0,
        "other_flux_mean": float(flux[other].mean()),
    }


def main():
    import argparse

    from pix2pixhdaudiosr_tpu.config import Config
    from pix2pixhdaudiosr_tpu.generate import cp_generate
    from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem
    from pix2pixhdaudiosr_tpu.trainer import init_state

    ap = argparse.ArgumentParser()
    ap.add_argument("--wav", default=None,
                    help="real speech file (48 kHz); LR constructed like "
                         "AudioTestDataset (resample down->up)")
    args = ap.parse_args()

    cfg = Config(net_g="global", ngf=8, n_downsample_global=2,
                 n_blocks_global=1, input_nc=2, output_nc=2, label_nc=0,
                 explicit_encoding=True, mask_mode="mode2",
                 compute_dtype="float32")
    system = Pix2PixHDSystem(cfg)
    state, *_ = init_state(system, jax.random.PRNGKey(0), batch=1)
    params_g = state.params["G"]

    seg = cfg.segment_length
    if args.wav:
        # real speech: same LR construction as the generate CLI
        from pix2pixhdaudiosr_tpu.data import AudioTestDataset
        ds = AudioTestDataset(args.wav, cfg.lr_sampling_rate,
                              cfg.hr_sampling_rate, seg)
        n_seg = ds.lr_audio.size // seg
        if n_seg < 2:  # seams need at least one chunk boundary
            raise SystemExit(
                f"--wav must be at least 2*{seg} samples "
                f"(~{2 * seg / 48000:.2f}s at 48 kHz); got {ds.lr_audio.size}")
        lr = np.asarray(ds.lr_audio[: n_seg * seg], np.float32)
        print(f"real speech: {args.wav} -> {n_seg} chunks")
    else:
        # long synthetic speech-like harmonic signal: 8 segments
        n_seg = 8
        t = np.arange(n_seg * seg) / 48000
        f0 = 180 + 40 * np.sin(2 * np.pi * 0.7 * t)      # slow pitch drift
        phase = 2 * np.pi * np.cumsum(f0) / 48000
        lr = sum(0.5 / k * np.sin(k * phase) for k in (1, 2, 3, 4))
        lr = (lr * (0.6 + 0.4 * np.sin(2 * np.pi * 1.3 * t))).astype(np.float32)

    # chunked path: independent segments (the reference behavior)
    rng = jax.random.PRNGKey(cfg.seed)

    @jax.jit
    def infer(pg, a, k):
        sr_spec, lr_pha, lr_norm, _ = system.inference(pg, a, k)
        return system.codec.imdct_eval(jnp.abs(sr_spec), lr_pha, lr_norm,
                                       rng=k)

    outs = []
    for i in range(n_seg):
        w = infer(params_g, jnp.asarray(lr[None, i * seg:(i + 1) * seg]),
                  jax.random.PRNGKey(cfg.seed + i))
        outs.append(np.asarray(w).reshape(-1))
    chunked = np.sqrt(cfg.up_ratio - 1) * np.concatenate(outs)

    cp = cp_generate(system, params_g, lr, cfg.replace(cp_shards=4))
    n = min(chunked.size, cp.size)
    seams = [i * seg for i in range(1, n_seg)]

    res = {
        "chunked": seam_stats(chunked[:n], seams),
        "cp": seam_stats(cp[:n], seams),
    }
    print(json.dumps(res, indent=2))
    name = "seam_results_real.json" if args.wav else "seam_results.json"
    out = os.path.join(os.path.dirname(__file__), name)
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
