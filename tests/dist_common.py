"""Shared config/batch for the multi-process DP test (tests/dist_worker.py
and tests/test_distributed.py must run the byte-identical program)."""

import numpy as np

from pix2pixhdaudiosr_tpu.config import Config

_HOP = 256

TINY_CFG = Config(net_g="global", ngf=8, n_downsample_global=2,
                  n_blocks_global=1, ndf=8, n_layers_d=2, num_d=2,
                  input_nc=2, output_nc=2, label_nc=0,
                  explicit_encoding=True, mask_mode="mode2",
                  segment_length=(32 - 1) * _HOP, compute_dtype="float32")


def make_global_batch(n: int):
    rng = np.random.default_rng(0)
    sl = TINY_CFG.segment_length
    return {
        "label": (rng.standard_normal((n, sl)) * 0.1).astype(np.float32),
        "image": (rng.standard_normal((n, sl)) * 0.1).astype(np.float32),
    }
