"""ctypes bindings for the native audio data plane (native/audio_io.cc).

Builds the shared library on first use with g++ (cached next to the source);
falls back to the pure-Python implementations in roar_tpu.data.audio when
unavailable or when ROAR_DISABLE_NATIVE=1.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libroar_audio.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


class _WavInfo(ctypes.Structure):
    _fields_ = [
        ("sample_rate", ctypes.c_int32),
        ("num_channels", ctypes.c_int32),
        ("num_frames", ctypes.c_int64),
        ("format", ctypes.c_int32),
        ("bits_per_sample", ctypes.c_int32),
    ]


def _build() -> bool:
    src = _NATIVE_DIR / "audio_io.cc"
    if not src.exists():
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", str(src), "-o", str(_LIB_PATH)],
            check=True,
            capture_output=True,
            timeout=180,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _tried
    if os.environ.get("ROAR_DISABLE_NATIVE") == "1":
        return None
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        lib.roar_wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(_WavInfo)]
        lib.roar_wav_info.restype = ctypes.c_int
        lib.roar_wav_read_mono.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.roar_wav_read_mono.restype = ctypes.c_int64
        lib.roar_resample_poly.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int32,
        ]
        lib.roar_resample_poly.restype = ctypes.c_int64
        lib.roar_peak_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_float,
        ]
        lib.roar_trim_bounds.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def wav_info(path: str) -> Optional[Tuple[int, int, int]]:
    """(sample_rate, num_channels, num_frames) or None."""
    lib = get_lib()
    if lib is None:
        return None
    info = _WavInfo()
    if lib.roar_wav_info(str(path).encode(), ctypes.byref(info)) != 0:
        return None
    return int(info.sample_rate), int(info.num_channels), int(info.num_frames)


def read_wav_mono(path: str) -> Optional[Tuple[np.ndarray, int]]:
    """(mono float32 samples, sample_rate) or None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    meta = wav_info(path)
    if meta is None:
        return None
    sr, _, n = meta
    out = np.empty(n, np.float32)
    got = lib.roar_wav_read_mono(str(path).encode(), _fptr(out), n)
    if got < 0:
        return None
    return out[: int(got)], sr


def resample_poly(audio: np.ndarray, up: int, down: int, half_taps: int = 16) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(audio, np.float32)
    cap = (len(x) * up + down - 1) // down + 8
    out = np.empty(cap, np.float32)
    got = lib.roar_resample_poly(_fptr(x), len(x), up, down, _fptr(out), cap, half_taps)
    if got < 0:
        return None
    return out[: int(got)]


def peak_normalize(audio: np.ndarray, level: float) -> np.ndarray:
    lib = get_lib()
    x = np.ascontiguousarray(audio, np.float32)
    if lib is None:
        peak = np.abs(x).max()
        return x * (level / peak) if peak > 0 else x
    lib.roar_peak_normalize(_fptr(x), len(x), level)
    return x


def trim_bounds(
    audio: np.ndarray, frame_length: int = 2048, hop_length: int = 512,
    threshold_db: float = 60.0,
) -> Optional[Tuple[int, int]]:
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(audio, np.float32)
    s, e = ctypes.c_int64(), ctypes.c_int64()
    lib.roar_trim_bounds(
        _fptr(x), len(x), frame_length, hop_length, threshold_db,
        ctypes.byref(s), ctypes.byref(e),
    )
    return int(s.value), int(e.value)
