"""tools/: dataset splitter and the numpy k-means used by feature encoding."""

import os

import numpy as np

from pix2pixhdaudiosr_tpu.data import write_wav


def test_split_dataset(tmp_path, rng_np):
    d = tmp_path / "corpus"
    d.mkdir()
    for i in range(10):
        write_wav(str(d / f"f{i}.wav"),
                  rng_np.uniform(-0.5, 0.5, 1000).astype(np.float32), 8000)
    from tools.split_dataset import main
    out = tmp_path / "lists"
    main([str(d), "--test", "3", "--out", str(out)])
    train = open(out / "train.csv").read().strip().splitlines()
    test = open(out / "test.csv").read().strip().splitlines()
    assert len(train) == 7 and len(test) == 3
    assert not set(train) & set(test)
    # paths resolve relative to the csv directory (data/filelist.py contract)
    from pix2pixhdaudiosr_tpu.data import discover_files
    files = discover_files(str(out / "train.csv"))
    assert all(os.path.exists(p) for p in files)


def test_kmeans(rng_np):
    from tools.encode_features import kmeans
    a = rng_np.standard_normal((50, 3)) + 10
    b = rng_np.standard_normal((50, 3)) - 10
    feat = np.concatenate([a, b])
    centers = kmeans(feat, 2, seed=1)
    assert centers.shape == (2, 3)
    signs = sorted(np.sign(centers[:, 0]))
    assert signs == [-1, 1]  # one center per cluster
    # fewer points than clusters degrades gracefully
    c2 = kmeans(feat[:3], 8)
    assert c2.shape[0] == 3
