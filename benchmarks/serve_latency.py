#!/usr/bin/env python
"""Flagship serving latency vs batch size on one chip.

The throughput story (bench.py, BASELINE.md) is anchored at batch 128 — the
best *throughput* batch on v5e. Production serving also cares about the
other end of the curve: what latency does one stream pay, and where does the
chip saturate? This harness sweeps the flagship G3L2@48 (156M params, bf16
serving layout — the same `system.inference` program generate.py serves)
over batch 1..128 and records, per batch:

  ms/batch, frames/s, achieved TF/s, and the real-time factor
  (seconds of 48 kHz audio produced per second of wall clock; one
  segment = segment_length samples = 0.677 s of audio).

Reference axis: the reference serves its 0.677 s segments through
generate_audio.py one torch batch at a time with no published latency
numbers; this table is the TPU-native equivalent of its serving envelope.

Run on the TPU: python benchmarks/serve_latency.py
CPU smoke: python benchmarks/serve_latency.py --tiny
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from benchmarks.common import serve_sweep, tiny_or_fail_fast
from pix2pixhdaudiosr_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*",
                    default=[1, 2, 4, 8, 16, 32, 64, 128])
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke mode: shrink the config to exercise "
                         "every harness code path without the chip")
    args = ap.parse_args()

    from __graft_entry__ import _flagship_cfg
    from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem

    cfg = _flagship_cfg()
    tiny_or_fail_fast(args.tiny)
    if args.tiny:
        cfg = cfg.replace(ngf=8, n_blocks_global=1, n_blocks_local=1,
                          n_downsample_global=2, compute_dtype="float32")
        args.batches = [1, 2]
    system = Pix2PixHDSystem(cfg)
    res = {"segment_audio_seconds": round(
        cfg.segment_length / cfg.hr_sampling_rate, 4)}
    serve_sweep(system, cfg, args.batches, res)

    out = os.path.join(os.path.dirname(__file__),
                       "serve_latency_tiny.json" if args.tiny
                       else "serve_latency.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
