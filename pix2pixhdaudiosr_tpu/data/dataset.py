"""Datasets and the host input pipeline.

Parity: reference data/audio_dataset.py:10-135 —
  * AudioDataset: random segment offset read at the file's native rate,
    retry-next-file on decode error, HR = resample(orig -> hr_rate),
    LR = resample(resample(orig -> lr_rate) -> hr_rate), crop/zero-pad to
    segment_length, items {'image': hr, 'label': lr, 'inst': 0, 'feat': 0,
    'path': path}.
  * AudioTestDataset: ONE file, optional --is_lr_input skip-downsample, chopped
    into consecutive segment_length windows.

TPU-native pipeline: the reference uses torch DataLoader worker *processes*
(reference data/custom_dataset_data_loader.py:43-62); here a thread pool
decodes/resamples (numpy polyphase releases the GIL inside BLAS) with a
bounded prefetch queue double-buffering ahead of the device step. When the
native C++ pipeline (runtime/native) is built, decode+resample dispatch to it.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..ops.audio import resample_np
from .filelist import discover_files
from .wavio import read_wav, wav_info

try:  # optional native decode+resample (runtime/native)
    from ..runtime import native_audio
except Exception:  # pragma: no cover
    native_audio = None


def _resample(x: np.ndarray, orig: int, new: int) -> np.ndarray:
    if native_audio is not None and native_audio.available():
        return native_audio.resample(x, orig, new)
    return resample_np(x, orig, new)


class AudioDataset:
    """Training dataset of (hr, lr) waveform segment pairs.

    Optional `cache_dir`: the decode+triple-resample per item is the CPU hot
    spot the reference mitigates with 16 worker processes (SURVEY.md §7 risk
    "input pipeline throughput"); with a cache dir each file's full-length
    (hr, lr) pair is resampled once and memory-mapped thereafter — segment
    sampling stays random per epoch."""

    def __init__(self, dataroot: str, lr_sampling_rate: int,
                 hr_sampling_rate: int, segment_length: int, seed: int = 1234,
                 max_dataset_size: Optional[int] = None,
                 files: Optional[List[str]] = None,
                 cache_dir: Optional[str] = None):
        self.files = files if files is not None else \
            discover_files(dataroot, max_dataset_size)
        self.lr_rate = lr_sampling_rate
        self.hr_rate = hr_sampling_rate
        self.segment_length = segment_length
        self.rng = np.random.default_rng(seed)
        self.cache_dir = cache_dir
        if cache_dir:
            import os
            os.makedirs(cache_dir, exist_ok=True)

    def __len__(self) -> int:
        return len(self.files)

    def _read_segment(self, path: str) -> tuple:
        info = wav_info(path)
        max_start = info.num_frames - self.segment_length
        offset = int(self.rng.integers(0, max_start)) if max_start > 0 else 0
        n = self.segment_length if max_start > 0 else None
        wav, rate = read_wav(path, frame_offset=offset, num_frames=n)
        return wav[0], rate  # first channel, like reference waveform[0]

    def _seg_pad(self, x: np.ndarray) -> np.ndarray:
        if len(x) >= self.segment_length:
            return x[: self.segment_length]
        return np.pad(x, (0, self.segment_length - len(x)))

    def _cache_path(self, path: str) -> str:
        import hashlib
        import os
        h = hashlib.sha1(os.path.abspath(path).encode()).hexdigest()[:16]
        return os.path.join(self.cache_dir,
                            f"{h}_{self.lr_rate}_{self.hr_rate}.npz")

    def _cached_pair(self, path: str):
        """Full-file (hr, lr) pair via the on-disk cache; random segment cut."""
        import os
        cpath = self._cache_path(path)
        if not os.path.exists(cpath):
            wav, rate = read_wav(path)
            wav = wav[0]
            hr = _resample(wav, rate, self.hr_rate).astype(np.float32)
            lr = _resample(_resample(wav, rate, self.lr_rate),
                           self.lr_rate, self.hr_rate).astype(np.float32)
            np.savez(cpath, hr=hr, lr=lr[: len(hr)])
        z = np.load(cpath, mmap_mode="r")
        hr, lr = z["hr"], z["lr"]
        max_start = len(hr) - self.segment_length
        off = int(self.rng.integers(0, max_start)) if max_start > 0 else 0
        return (np.asarray(hr[off : off + self.segment_length]),
                np.asarray(lr[off : off + self.segment_length]))

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        # retry-next-file forever on decode failure (reference
        # data/audio_dataset.py:43-54)
        path = self.files[idx]
        for i in range(len(self.files)):
            try:
                if self.cache_dir:
                    hr, lr = self._cached_pair(path)
                else:
                    wav, rate = self._read_segment(path)
                    hr = _resample(wav, rate, self.hr_rate)
                    lr = _resample(_resample(wav, rate, self.lr_rate),
                                   self.lr_rate, self.hr_rate)
                break
            except Exception:
                path = self.files[(idx + i + 1) % len(self.files)]
        else:
            raise RuntimeError("no decodable audio file found")
        return {"image": self._seg_pad(hr).astype(np.float32),
                "label": self._seg_pad(lr).astype(np.float32),
                "inst": np.int32(0), "feat": np.float32(0), "path": path}


class AudioTestDataset:
    """One file chopped into consecutive segments (reference
    data/audio_dataset.py:89-135)."""

    def __init__(self, dataroot: str, lr_sampling_rate: int,
                 hr_sampling_rate: int, segment_length: int,
                 is_lr_input: bool = False):
        self.segment_length = segment_length
        wav, rate = read_wav(dataroot)
        self.raw_audio = wav[0]
        self.in_sampling_rate = rate
        self.audio_len = len(self.raw_audio)
        self.dataroot = dataroot
        if is_lr_input:
            self.lr_audio = _resample(self.raw_audio, rate, hr_sampling_rate)
        else:
            lo = _resample(self.raw_audio, rate, lr_sampling_rate)
            self.lr_audio = _resample(lo, lr_sampling_rate, hr_sampling_rate)
        n = len(self.lr_audio)
        num_seg = max(1, int(np.ceil(n / segment_length)))
        padded = np.pad(self.lr_audio, (0, num_seg * segment_length - n))
        self.segments = padded.reshape(num_seg, segment_length).astype(np.float32)

    def __len__(self) -> int:
        return self.segments.shape[0]

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        return {"image": np.zeros(1, np.float32),
                "label": self.segments[idx], "inst": np.int32(0),
                "feat": np.float32(0), "path": self.dataroot}


class Loader:
    """Threaded, prefetching batch loader over dataset indices."""

    def __init__(self, dataset, indices: Sequence[int], batch_size: int,
                 shuffle: bool = True, seed: int = 1234, n_threads: int = 2,
                 drop_last: bool = True, prefetch: int = 4):
        self.dataset = dataset
        self.indices = list(indices)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.n_threads = max(1, n_threads)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batches(self) -> List[List[int]]:
        idx = list(self.indices)
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        out = [idx[i : i + self.batch_size]
               for i in range(0, len(idx), self.batch_size)]
        if self.drop_last:
            out = [b for b in out if len(b) == self.batch_size]
        return out

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._batches()
        self.epoch += 1
        if not batches:
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def collate(batch_idx):
            items = [self.dataset[i] for i in batch_idx]
            return {
                "image": np.stack([it["image"] for it in items]),
                "label": np.stack([it["label"] for it in items]),
                "path": [it["path"] for it in items],
            }

        def worker(shard):
            try:
                for bi, b in shard:
                    if stop.is_set():
                        return
                    q.put((bi, collate(b)))
            except Exception as e:  # surface errors to the consumer
                q.put((-1, e))

        jobs = list(enumerate(batches))
        shards = [jobs[t :: self.n_threads] for t in range(self.n_threads)]
        threads = [threading.Thread(target=worker, args=(s,), daemon=True)
                   for s in shards if s]
        for t in threads:
            t.start()
        try:
            pending = {}
            next_i = 0
            received = 0
            while received < len(jobs):
                bi, payload = q.get()
                if bi == -1:
                    raise payload
                received += 1
                pending[bi] = payload
                while next_i in pending:  # deliver in order
                    yield pending.pop(next_i)
                    next_i += 1
        finally:
            stop.set()
