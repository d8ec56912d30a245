# Copyright (c) 2026 touchnet_tpu authors.
# ctypes loader for the native C++ audio frontend.
#
# Capability parity: the reference's dataloader DSP speed comes from
# torchaudio/sox C++ (SURVEY.md §2.9); ours comes from
# touchnet_tpu/native/frontend.cc, compiled on first use into a cached .so
# and called through ctypes. Falls back silently to the numpy DSP when no
# compiler is available (TOUCHNET_NATIVE=0 disables explicitly).

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "frontend.cc")
_CACHE_DIR = os.environ.get(
    "TOUCHNET_NATIVE_CACHE", os.path.expanduser("~/.cache/touchnet_tpu")
)

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build_lib() -> Optional[str]:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    so_path = os.path.join(_CACHE_DIR, "libtouchnet_frontend.so")
    src = os.path.abspath(_SRC)
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(src):
        return so_path
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        src, "-o", so_path,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so_path
    except Exception:
        return None


def get_lib():
    """The loaded native library, or None when unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if os.environ.get("TOUCHNET_NATIVE", "1") == "0":
            _lib_failed = True
            return None
        so = _build_lib()
        if so is None:
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(so)
            lib.touchnet_fbank.restype = ctypes.c_int
            lib.touchnet_fbank.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
                ctypes.c_uint64, ctypes.POINTER(ctypes.c_float),
            ]
            lib.touchnet_fbank_num_frames.restype = ctypes.c_int
            lib.touchnet_fbank_num_frames.argtypes = [ctypes.c_int] * 4
            lib.touchnet_mfcc.restype = ctypes.c_int
            lib.touchnet_mfcc.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
                ctypes.c_uint64, ctypes.c_int, ctypes.c_float,
                ctypes.c_float, ctypes.c_float,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.touchnet_logmel_num_frames.restype = ctypes.c_int
            lib.touchnet_logmel_num_frames.argtypes = [ctypes.c_int] * 4
            lib.touchnet_logmel.restype = ctypes.c_int
            lib.touchnet_logmel.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
            ]
            _lib = lib
        except OSError:
            _lib_failed = True
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def fbank_native(
    waveform: np.ndarray,
    num_mel_bins: int,
    frame_length: int,
    frame_shift: int,
    dither: float,
    sample_frequency: int,
    dither_seed: int = 0,
) -> Optional[np.ndarray]:
    """Native kaldi fbank; returns None when the library is unavailable.
    waveform: int16-scale float samples (flattened)."""
    lib = get_lib()
    if lib is None:
        return None
    wave = np.ascontiguousarray(np.asarray(waveform).reshape(-1), np.float32)
    frames = lib.touchnet_fbank_num_frames(
        wave.size, int(sample_frequency), int(frame_length), int(frame_shift)
    )
    if frames <= 0:
        return np.empty((0, num_mel_bins), np.float32)
    out = np.empty((frames, num_mel_bins), np.float32)
    written = lib.touchnet_fbank(
        wave.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        wave.size, int(sample_frequency), int(num_mel_bins),
        int(frame_length), int(frame_shift), float(dither),
        int(dither_seed),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if written != frames:
        return None
    return out


def mfcc_native(
    waveform: np.ndarray,
    num_mel_bins: int,
    frame_length: int,
    frame_shift: int,
    dither: float,
    num_ceps: int,
    sample_frequency: int,
    cepstral_lifter: float = 22.0,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
    dither_seed: int = 0,
) -> Optional[np.ndarray]:
    """Native kaldi MFCC (fbank -> DCT-II -> lifter); None when unavailable.
    waveform: int16-scale float samples (flattened)."""
    lib = get_lib()
    if lib is None:
        return None
    wave = np.ascontiguousarray(np.asarray(waveform).reshape(-1), np.float32)
    frames = lib.touchnet_fbank_num_frames(
        wave.size, int(sample_frequency), int(frame_length), int(frame_shift)
    )
    if frames <= 0:
        return np.empty((0, num_ceps), np.float32)
    out = np.empty((frames, num_ceps), np.float32)
    written = lib.touchnet_mfcc(
        wave.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        wave.size, int(sample_frequency), int(num_mel_bins),
        int(frame_length), int(frame_shift), float(dither),
        int(dither_seed), int(num_ceps), float(cepstral_lifter),
        float(low_freq), float(high_freq),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if written != frames:
        return None
    return out


def logmel_native(
    waveform: np.ndarray,
    sample_rate: int,
    n_fft: int,
    hop_length: int,
    n_mels: int,
    padding: int = 0,
) -> Optional[np.ndarray]:
    """Native Whisper-style log-mel; None when unavailable.
    waveform: raw float samples in [-1, 1] (flattened)."""
    lib = get_lib()
    if lib is None:
        return None
    wave = np.ascontiguousarray(np.asarray(waveform).reshape(-1), np.float32)
    frames = lib.touchnet_logmel_num_frames(
        wave.size, int(padding), int(n_fft), int(hop_length)
    )
    if frames <= 0:
        return np.empty((0, n_mels), np.float32)
    out = np.empty((frames, n_mels), np.float32)
    written = lib.touchnet_logmel(
        wave.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        wave.size, int(sample_rate), int(n_fft), int(hop_length),
        int(n_mels), int(padding),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if written != frames:
        return None
    return out
