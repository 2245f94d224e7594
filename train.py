#!/usr/bin/env python
"""CLI parity wrapper: `python train.py <flags>` (reference train.py)."""
from pix2pixhdaudiosr_tpu.train_loop import main

if __name__ == "__main__":
    main()
