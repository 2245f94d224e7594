#!/usr/bin/env python
"""Segment wav files into fixed-duration chunks.

Parity: reference data/seg_audio.sh — `ffmpeg -f segment -segment_time 1.2`
over every wav in a directory, deleting the originals. Here it is
self-contained (this repo's wav I/O; no ffmpeg) and non-destructive by
default (`--delete` opts in to the reference's rm behavior). Note the
training pipeline does NOT require pre-segmented corpora — AudioDataset
windows whole files on the fly (data/dataset.py) — so this exists for
reproducing the reference's corpus-prep workflow.

Usage: python tools/seg_audio.py /path/to/wavs [--seconds 1.2] [--delete]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pix2pixhdaudiosr_tpu.data import read_wav, write_wav


def segment_file(path: str, seconds: float, delete: bool) -> int:
    audio, rate = read_wav(path)
    audio = np.asarray(audio, np.float32)   # [channels, frames]
    if audio.ndim == 1:
        audio = audio[None]
    seg = int(round(seconds * rate))
    if seg <= 0:
        return 0
    if audio.shape[1] <= seg:
        # ffmpeg's segmenter still emits one (short) segment for files no
        # longer than segment_time; match that so a "segments only" corpus
        # (the advised workflow without --delete) never loses short files
        base = os.path.splitext(path)[0]
        out = f"{base}000.wav"  # never equals `path`
        if not delete and os.path.exists(out):
            print(f"skip {path}: refusing to overwrite existing {out}",
                  file=sys.stderr)
            return 0
        write_wav(out, audio, rate)
        if delete:
            os.remove(path)
        return 1
    base = os.path.splitext(path)[0]
    offsets = range(0, audio.shape[1], seg)
    if not delete:
        # same no-clobber guarantee as the short-file branch: without
        # --delete this tool never overwrites pre-existing files (a partial
        # per-segment skip would leave a misaligned corpus, so refuse the
        # whole file)
        clashes = [f"{base}{i:03d}.wav" for i in range(len(offsets))
                   if os.path.exists(f"{base}{i:03d}.wav")]
        if clashes:
            print(f"skip {path}: refusing to overwrite existing "
                  f"{clashes[0]}" + (f" (+{len(clashes) - 1} more)"
                                     if len(clashes) > 1 else ""),
                  file=sys.stderr)
            return 0
    n = 0
    for off in offsets:
        chunk = audio[:, off : off + seg]   # channels preserved, like ffmpeg
        # the reference's ffmpeg segmenter keeps the short tail chunk too
        write_wav(f"{base}{n:03d}.wav", chunk, rate)
        n += 1
    if delete:
        os.remove(path)
    return n


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("dir")
    ap.add_argument("--seconds", type=float, default=1.2)
    ap.add_argument("--delete", action="store_true",
                    help="remove each source wav after segmenting "
                         "(the reference's behavior)")
    args = ap.parse_args(argv)
    total = 0
    for name in sorted(os.listdir(args.dir)):
        if name.lower().endswith(".wav"):
            total += segment_file(os.path.join(args.dir, name),
                                  args.seconds, args.delete)
    print(f"wrote {total} segments")
    if total and not args.delete:
        print("note: originals kept (no --delete) — segments were written "
              "NEXT TO them, so a corpus built from this directory would "
              "see the same audio twice; point training at the segments "
              "only, or re-run with --delete for the reference's behavior",
              file=sys.stderr)


if __name__ == "__main__":
    main()
