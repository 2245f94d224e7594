"""ctypes bindings for the native (C++/OpenMP) host audio pipeline.

Builds runtime/native/audio_pipeline.cpp with g++ on first use (cached next
to the source); every entry point has a numpy fallback, so the framework is
fully functional without a toolchain. See audio_pipeline.cpp for why the
native effort sits in the host loader on TPU (vs the reference's GPU DCT lib).
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "audio_pipeline.cpp")
_SO = os.path.join(_HERE, "native", "libaudio_pipeline.so")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _build() -> Optional[str]:
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        so = _SO if os.path.exists(_SO) and \
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC) else _build()
        if so is None:
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            _build_failed = True
            return None
        c64 = ctypes.c_int64
        f32p = ctypes.POINTER(ctypes.c_float)
        f64p = ctypes.POINTER(ctypes.c_double)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.resample_poly_f32.restype = c64
        lib.resample_poly_f32.argtypes = [f32p, c64, f64p, c64, c64, c64, c64,
                                          f32p, c64]
        lib.decode_pcm_first_channel.restype = c64
        lib.decode_pcm_first_channel.argtypes = [u8p, c64, ctypes.c_int32,
                                                 ctypes.c_int32, ctypes.c_int32,
                                                 f32p, c64]
        lib.flac_decode.restype = c64
        lib.flac_decode.argtypes = [u8p, c64, f32p, c64, ctypes.c_int32]
        lib.make_pair_batch.restype = None
        lib.make_pair_batch.argtypes = [f32p, ctypes.POINTER(c64), c64, c64, c64,
                                        f64p, c64, c64, c64, c64,
                                        f64p, c64, c64, c64, c64,
                                        f64p, c64, c64, c64, c64,
                                        f32p, f32p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _f64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def resample(x: np.ndarray, orig_freq: int, new_freq: int) -> np.ndarray:
    """1-D native polyphase resample (torchaudio kernel convention)."""
    from ..ops.audio import sinc_resample_kernel
    lib = _load()
    if orig_freq == new_freq:
        return np.asarray(x, np.float32)
    x = np.ascontiguousarray(x, np.float32)
    if lib is None or x.ndim != 1:
        from ..ops.audio import resample_np
        return resample_np(x, orig_freq, new_freq).astype(np.float32)
    kernels, width, p, q = sinc_resample_kernel(orig_freq, new_freq)
    kernels = np.ascontiguousarray(kernels, np.float64)
    target = int(math.ceil(len(x) * q / p))
    out = np.zeros(target, np.float32)
    n = lib.resample_poly_f32(_f32p(x), len(x), _f64p(kernels),
                              kernels.shape[1], p, q, width, _f32p(out), target)
    return out[:n]


def make_pair_batch(wavs: np.ndarray, lens: np.ndarray, orig_freq: int,
                    lr_freq: int, hr_freq: int,
                    segment_length: int) -> Tuple[np.ndarray, np.ndarray]:
    """Batch (hr, lr) pair construction fully in native code. wavs: [B, max_len]
    padded float32, lens: true lengths. Falls back to per-item numpy."""
    from ..ops.audio import sinc_resample_kernel
    lib = _load()
    b = wavs.shape[0]
    if lib is None:
        from ..ops.audio import resample_np
        hr_out = np.zeros((b, segment_length), np.float32)
        lr_out = np.zeros((b, segment_length), np.float32)
        for i in range(b):
            x = wavs[i, : lens[i]]
            hr = resample_np(x, orig_freq, hr_freq)
            lo = resample_np(x, orig_freq, lr_freq)
            lr = resample_np(lo, lr_freq, hr_freq)
            hr_out[i, : min(segment_length, len(hr))] = hr[:segment_length]
            lr_out[i, : min(segment_length, len(lr))] = lr[:segment_length]
        return hr_out, lr_out

    def bank(a, c):
        if a == c:
            return np.zeros((1, 0), np.float64), 0, 1, 1
        k, w, p, q = sinc_resample_kernel(a, c)
        return np.ascontiguousarray(k, np.float64), w, p, q

    k_hr, w_hr, p_hr, q_hr = bank(orig_freq, hr_freq)
    k_dn, w_dn, p_dn, q_dn = bank(orig_freq, lr_freq)
    k_up, w_up, p_up, q_up = bank(lr_freq, hr_freq)
    wavs = np.ascontiguousarray(wavs, np.float32)
    lens = np.ascontiguousarray(lens, np.int64)
    hr_out = np.zeros((b, segment_length), np.float32)
    lr_out = np.zeros((b, segment_length), np.float32)
    lib.make_pair_batch(
        _f32p(wavs), lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        b, wavs.shape[1], segment_length,
        _f64p(k_hr), k_hr.shape[1], p_hr, q_hr, w_hr,
        _f64p(k_dn), k_dn.shape[1], p_dn, q_dn, w_dn,
        _f64p(k_up), k_up.shape[1], p_up, q_up, w_up,
        _f32p(hr_out), _f32p(lr_out))
    return hr_out, lr_out


def flac_decode(buf: bytes, num_frames: int, nch: int) -> Optional[np.ndarray]:
    """Decode a complete FLAC stream to [C, T] float32 (None on failure or
    when the native lib is unavailable — callers fall back to data/flac.py)."""
    lib = _load()
    if lib is None:
        return None
    out = np.zeros((max(num_frames, 1), nch), np.float32)
    b = np.frombuffer(buf, np.uint8)
    n = lib.flac_decode(b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                        len(buf), _f32p(out), num_frames, nch)
    if n < 0:
        return None
    return np.ascontiguousarray(out[:n].T)


def decode_pcm_first_channel(raw: bytes, fmt: int, bits: int,
                             nch: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    bpf = nch * (bits // 8)
    frames = len(raw) // bpf if bpf else 0
    out = np.zeros(frames, np.float32)
    buf = np.frombuffer(raw, np.uint8)
    n = lib.decode_pcm_first_channel(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(raw),
        fmt, bits, nch, _f32p(out), frames)
    return out[:n] if n >= 0 else None
