"""Data pipeline: wav I/O roundtrip + random-access reads, file discovery,
persisted val split, dataset pair construction, threaded loader ordering."""

import os

import numpy as np
import pytest

from pix2pixhdaudiosr_tpu.data import (AudioDataset, AudioTestDataset, Loader,
                                       discover_files, read_wav,
                                       train_val_split, wav_info, write_wav)


@pytest.fixture
def wav_dir(tmp_path, rng_np):
    d = tmp_path / "wavs"
    d.mkdir()
    for i in range(6):
        x = (0.3 * np.sin(2 * np.pi * (200 + 50 * i)
                          * np.arange(48000) / 48000)).astype(np.float32)
        write_wav(str(d / f"f{i}.wav"), x, 48000)
    (d / "notes.txt").write_text("not audio")
    return str(d)


def test_wav_roundtrip(tmp_path, rng_np):
    x = rng_np.uniform(-0.9, 0.9, 5000).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 16000)
    y, rate = read_wav(p)
    assert rate == 16000 and y.shape == (1, 5000)
    np.testing.assert_allclose(y[0], x, atol=1.0 / 32768 + 1e-6)


def test_wav_random_access(tmp_path, rng_np):
    x = (rng_np.standard_normal(10000) * 0.4).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 8000)
    info = wav_info(p)
    assert info.num_frames == 10000 and info.sample_rate == 8000
    y, _ = read_wav(p, frame_offset=1234, num_frames=100)
    full, _ = read_wav(p)
    np.testing.assert_array_equal(y[0], full[0][1234:1334])


def test_discover_dir_and_csv(wav_dir, tmp_path):
    files = discover_files(wav_dir)
    assert len(files) == 6  # the .txt is excluded (reference's ext check is a
    # truthy-string bug that matches everything; we match properly)
    csv_path = tmp_path / "list.csv"
    csv_path.write_text("\n".join(os.path.basename(f) for f in files[:4]))
    # reference joins the csv's own directory — place csv next to the wavs
    csv2 = os.path.join(wav_dir, "list.csv")
    with open(csv2, "w") as f:
        f.write("\n".join(os.path.basename(p) for p in files[:4]))
    got = discover_files(csv2)
    assert len(got) == 4 and all(os.path.exists(p) for p in got)


def test_split_persistence(tmp_path):
    p = str(tmp_path / "val_indices.json")
    tr1, va1 = train_val_split(100, 0.1, seed=7, indices_path=p)
    tr2, va2 = train_val_split(100, 0.1, seed=999, indices_path=p)  # reload
    assert va1 == va2 and tr1 == tr2
    assert len(va1) == 10 and len(tr1) == 90
    assert not set(va1) & set(tr1)


def test_audio_dataset_pair(wav_dir):
    ds = AudioDataset(wav_dir, lr_sampling_rate=8000, hr_sampling_rate=48000,
                      segment_length=32512)
    item = ds[0]
    assert item["image"].shape == (32512,)
    assert item["label"].shape == (32512,)
    # LR went through 48k->8k->48k: high band removed -> different signal
    assert not np.allclose(item["image"], item["label"])


def test_audio_dataset_retry(wav_dir, tmp_path):
    bad = os.path.join(wav_dir, "a_corrupt.wav")
    with open(bad, "wb") as f:
        f.write(b"RIFFgarbage")
    ds = AudioDataset(wav_dir, 8000, 48000, 32512)
    idx = ds.files.index(bad)
    item = ds[idx]  # must silently retry the next file
    assert item["image"].shape == (32512,)


def test_test_dataset_chop(wav_dir):
    f = discover_files(wav_dir)[0]
    ds = AudioTestDataset(f, 8000, 48000, segment_length=32512)
    assert len(ds) == int(np.ceil(48000 / 32512))
    assert ds[0]["label"].shape == (32512,)
    assert ds.audio_len == 48000


def test_loader_order_and_shapes(wav_dir):
    ds = AudioDataset(wav_dir, 8000, 48000, 32512)
    ld = Loader(ds, range(len(ds)), batch_size=2, shuffle=True, seed=1,
                n_threads=3, drop_last=True)
    batches = list(ld)
    assert len(batches) == 3
    for b in batches:
        assert b["image"].shape == (2, 32512)
        assert b["label"].dtype == np.float32
    # deterministic epoch shuffles differ
    b2 = list(ld)
    assert len(b2) == 3


def test_audio_dataset_cache(wav_dir, tmp_path):
    cache = str(tmp_path / "cache")
    ds = AudioDataset(wav_dir, 8000, 48000, 32512, cache_dir=cache)
    item1 = ds[0]
    assert item1["image"].shape == (32512,)
    import os
    assert len(os.listdir(cache)) == 1          # pair cached once
    item2 = ds[0]                               # second read hits the cache
    assert item2["image"].shape == (32512,)
    # cached pairs match the direct path statistically (same content source)
    ds_direct = AudioDataset(wav_dir, 8000, 48000, 32512)
    d = ds_direct[0]
    assert abs(float(np.std(d["image"])) - float(np.std(item1["image"]))) < 0.1
