#!/usr/bin/env python
"""Instance-feature encoding + k-means clustering.

Parity: reference deprecated/encode_features.py — run the Encoder over a
dataset, pool features per instance, and cluster per-label features for
inference-time style sampling (reference models/pix2pixHD_model.py:457-498).
k-means is a small numpy Lloyd's loop (no sklearn dependency in this image).
Part of the upstream image path; the audio pipeline never uses it.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def kmeans(feat: np.ndarray, n_clusters: int, n_iter: int = 100,
           seed: int = 0) -> np.ndarray:
    """Lloyd's algorithm; returns [n_clusters, D] centers."""
    rng = np.random.default_rng(seed)
    n = feat.shape[0]
    n_clusters = min(n, n_clusters)
    centers = feat[rng.choice(n, n_clusters, replace=False)]
    for _ in range(n_iter):
        d = ((feat[:, None, :] - centers[None]) ** 2).sum(-1)
        assign = d.argmin(1)
        new = np.stack([feat[assign == k].mean(0) if np.any(assign == k)
                        else centers[k] for k in range(n_clusters)])
        if np.allclose(new, centers):
            break
        centers = new
    return centers


def encode_and_cluster(system, params_e, dataset, label_nc: int,
                       feat_num: int, n_clusters: int, save_path: str,
                       max_items: int = 10_000_000):
    """Gather per-instance pooled encoder features, then cluster per label."""
    import jax
    import jax.numpy as jnp
    from pix2pixhdaudiosr_tpu.models.generator import Encoder

    features = {label: np.zeros((0, feat_num + 1)) for label in range(label_nc)}
    for i in range(min(len(dataset), max_items)):
        item = dataset[i]
        image, inst = item["image"], item["inst"]
        fmap = system.netE.apply(params_e, jnp.asarray(image)[None],
                                 jnp.asarray(inst)[None])
        fmap = np.asarray(fmap)[0]
        inst_np = np.asarray(inst).astype(int)
        h, w = inst_np.shape[:2]
        for iid in np.unique(inst_np):
            label = iid if iid < 1000 else iid // 1000
            if label >= label_nc:
                continue
            ys, xs = np.nonzero(inst_np[..., 0] == iid)
            if len(ys) == 0:
                continue
            mid = len(ys) // 2
            val = np.zeros((1, feat_num + 1))
            val[0, :feat_num] = fmap[ys[mid], xs[mid], :feat_num]
            val[0, feat_num] = len(ys) / (h * w // 32)
            features[label] = np.append(features[label], val, axis=0)
    np.save(os.path.join(save_path, "features.npy"), features,
            allow_pickle=True)

    centers = {}
    for label in range(label_nc):
        feat = features[label]
        feat = feat[feat[:, -1] > 0.5, :-1]
        if feat.shape[0]:
            centers[label] = kmeans(feat, n_clusters)
    out = os.path.join(save_path, "features_clustered_%03d.npy" % n_clusters)
    np.save(out, centers, allow_pickle=True)
    print("saving to %s" % out)
    return out


if __name__ == "__main__":
    print(__doc__)
    print("Use encode_and_cluster(system, params_e, dataset, ...) from python;"
          " the audio pipeline does not exercise instance features.")
