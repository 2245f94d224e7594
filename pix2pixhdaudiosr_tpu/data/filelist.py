"""Audio file discovery and the persisted train/val split.

Parity: reference data/audio_dataset.py:64-79 (directory walk or csv list;
the reference's extension check `== ".wav" or ".mp3" or ".flac"` is a
truthy-string bug that matches EVERY file — here the three extensions are
matched properly) and reference data/custom_dataset_data_loader.py:26-59
(seeded shuffled split with validation indices persisted so resumes keep the
same split).
"""

from __future__ import annotations

import csv
import json
import os
import random
from typing import List, Optional, Tuple

AUDIO_EXTS = (".wav", ".mp3", ".flac")


def discover_files(dataroot: str, max_size: Optional[int] = None) -> List[str]:
    if os.path.isdir(dataroot):
        files = []
        for root, _dirs, names in os.walk(dataroot, topdown=False):
            for name in sorted(names):
                if os.path.splitext(name)[1].lower() in AUDIO_EXTS:
                    files.append(os.path.join(root, name))
    else:
        root = os.path.dirname(dataroot)
        with open(dataroot, "r") as f:
            files = [os.path.join(root, item)
                     for row in csv.reader(f) for item in row]
    if max_size is not None:
        files = files[: int(max_size)]
    return files


def train_val_split(n: int, validation_split: float, seed: int,
                    indices_path: Optional[str] = None
                    ) -> Tuple[List[int], List[int]]:
    """Seeded split; validation indices persisted/restored like the
    reference's validation_indices.pt (data/custom_dataset_data_loader.py:31-40)."""
    if indices_path and os.path.exists(indices_path):
        with open(indices_path) as f:
            val = json.load(f)
        val_set = set(val)
        train = [i for i in range(n) if i not in val_set]
        return train, list(val)
    idx = list(range(n))
    random.Random(seed).shuffle(idx)
    n_val = int(n * validation_split)
    val = idx[:n_val]
    val_set = set(val)
    train = [i for i in range(n) if i not in val_set]  # stable order; the
    # training sampler shuffles anyway (reference SubsetRandomSampler)
    if indices_path:
        os.makedirs(os.path.dirname(indices_path) or ".", exist_ok=True)
        with open(indices_path, "w") as f:
            json.dump(val, f)
    return train, val
