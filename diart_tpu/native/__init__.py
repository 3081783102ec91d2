"""Native (C++) runtime components, loaded via ctypes.

Currently: the WAV decoder (``wavio.cpp``) used as the fast path of
:class:`diart_tpu.audio.AudioLoader`. The shared library is compiled on
first use with the system compiler and cached next to the source; every
entry point degrades gracefully to the pure-Python implementation when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

__all__ = ["wav_decode_mono", "wav_probe", "native_available"]

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "libwavio.so"
_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    src = _HERE / "wavio.cpp"
    for compiler in ("c++", "g++", "clang++"):
        try:
            subprocess.run(
                [compiler, "-O3", "-shared", "-fPIC", str(src), "-o", str(_LIB_PATH)],
                check=True,
                capture_output=True,
                timeout=120,
            )
            return True
        except (OSError, subprocess.CalledProcessError, subprocess.TimeoutExpired):
            continue
    return False


def _load():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < (
            _HERE / "wavio.cpp"
        ).stat().st_mtime:
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            _failed = True
            return None
        lib.wav_probe.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.wav_probe.restype = ctypes.c_int
        lib.wav_decode_mono_f32.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
        ]
        lib.wav_decode_mono_f32.restype = ctypes.c_long
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def wav_probe(path) -> Optional[Tuple[int, int, int]]:
    """(sample_rate, num_frames, channels), or None if unavailable/invalid."""
    lib = _load()
    if lib is None:
        return None
    rate = ctypes.c_int()
    frames = ctypes.c_long()
    channels = ctypes.c_int()
    if lib.wav_probe(str(path).encode(), ctypes.byref(rate), ctypes.byref(frames), ctypes.byref(channels)) != 0:
        return None
    return rate.value, frames.value, channels.value


def wav_decode_mono(path) -> Optional[Tuple[np.ndarray, int]]:
    """((1, samples) float32, sample_rate), or None if unavailable/invalid."""
    lib = _load()
    probe = wav_probe(path)
    if lib is None or probe is None:
        return None
    rate, frames, _ = probe
    out = np.empty(frames, dtype=np.float32)
    written = lib.wav_decode_mono_f32(
        str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), frames
    )
    if written < 0:
        return None
    return out[:written][None, :], rate
