#!/usr/bin/env python
"""CLI parity wrapper: `python eval_matric.py <flags>` (reference
eval_matric.py — the reference's spelling is kept for drop-in parity)."""
from pix2pixhdaudiosr_tpu.evaluate import main

if __name__ == "__main__":
    main()
