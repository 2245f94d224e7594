#!/usr/bin/env python
"""CLI parity wrapper: `python generate_audio.py <flags>`
(reference generate_audio.py)."""
from pix2pixhdaudiosr_tpu.generate import main

if __name__ == "__main__":
    main()
