#!/usr/bin/env python
"""Score the reference's committed real-speech outputs with this framework's
metrics chain (VERDICT r2 ask 2: a quality number on real speech).

The reference repo ships hr/lr/sr wav triplets of a real VCTK utterance for
four trained experiment variants (/root/reference/generated/GEN_VCTK_*/,
README.md:137-153) but publishes no metric values. This tool runs OUR
`metrics.compute_metrics` (LSD/SNR/MSE + working segmental SNR) over those
triplets — establishing, on real speech, (a) the reference's achieved
quality level as the target band, and (b) that this repo's metric pipeline
produces sane values on real speech, not just the synthetic corpus.

Usage: python tools/score_reference_outputs.py [--ref /root/reference]
Writes benchmarks/ref_speech_scores.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if not os.environ.get("SCORE_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from pix2pixhdaudiosr_tpu.data import read_wav  # noqa: E402
from pix2pixhdaudiosr_tpu.metrics import (compute_metrics, lsd,  # noqa: E402
                                          renormalize)

VARIANTS = [
    "GEN_VCTK_G3L2_48ngf",
    "GEN_VCTK_G3L2_48ngf_match_loss",
    "GEN_VCTK_G3L2_48ngf_match_loss_mse",
    "GEN_VCTK_hifitts_G3L2_48ngf_time_D",
]


def score_triplet(base: str) -> dict:
    hr, rh = read_wav(os.path.join(base, "hr_audio.wav"))
    lr, rl = read_wav(os.path.join(base, "lr_audio.wav"))
    sr, rs = read_wav(os.path.join(base, "sr_audio.wav"))
    assert rh == rl == rs == 48000, (rh, rl, rs)
    n = min(hr.size, lr.size, sr.size)
    hr, lr, sr = (a.reshape(-1)[:n] for a in (hr, lr, sr))
    mse, snr_sr, snr_lr, ssnr_sr, ssnr_lr, _, lsd_sr = compute_metrics(
        jnp.asarray(hr[None]), jnp.asarray(lr[None]), jnp.asarray(sr[None]),
        n_fft=512, hop_length=256, win_length=512, center=True)
    hr_j = jnp.asarray(hr[None], jnp.float32)
    lsd_lr = lsd(hr_j, renormalize(hr_j, jnp.asarray(lr[None], jnp.float32)),
                 n_fft=512, hop_length=256, win_length=512)
    return {"samples": int(n), "mse": round(mse, 6),
            "snr_sr": round(snr_sr, 3), "snr_lr": round(snr_lr, 3),
            "ssnr_sr": round(ssnr_sr, 3), "ssnr_lr": round(ssnr_lr, 3),
            "lsd_sr": round(lsd_sr, 4), "lsd_lr": round(lsd_lr, 4)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    args = ap.parse_args(argv)

    res = {}
    for v in VARIANTS:
        base = os.path.join(args.ref, "generated", v)
        if not os.path.isdir(base):
            print(f"{v}: missing, skipped")
            continue
        res[v] = score_triplet(base)
        print(v, res[v])
    out = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                       "ref_speech_scores.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", os.path.abspath(out))


if __name__ == "__main__":
    main()
