#!/usr/bin/env python
"""Precompute encoder feature maps for a dataset.

Parity: reference deprecated/precompute_feature_maps.py — run the Encoder
(netE) over every item and persist the instance-pooled feature maps so
training with --load_features skips the encoder forward. Part of the upstream
image path; unused by the audio pipeline.

Usage (python API):
    from tools.precompute_feature_maps import precompute
    precompute(system, params_e, dataset, out_dir)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def precompute(system, params_e, dataset, out_dir: str) -> None:
    import jax.numpy as jnp
    os.makedirs(out_dir, exist_ok=True)
    for i in range(len(dataset)):
        item = dataset[i]
        image, inst = item["image"], item["inst"]
        fmap = system.netE.apply(params_e, jnp.asarray(image)[None],
                                 jnp.asarray(inst)[None])
        name = os.path.splitext(os.path.basename(item["path"]))[0]
        np.save(os.path.join(out_dir, f"{name}_feat.npy"), np.asarray(fmap)[0])
        if (i + 1) % 100 == 0:
            print(f"{i + 1} / {len(dataset)}")


if __name__ == "__main__":
    print(__doc__)
