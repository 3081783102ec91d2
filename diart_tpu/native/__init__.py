"""Native (C++) runtime components, loaded via ctypes.

Currently: the WAV decoder (``wavio.cpp``, fast path of
:class:`diart_tpu.audio.AudioLoader`) and the RTTM assembler
(``rttm.cpp``, the serving hot path's post-fetch half — see
``ops/binarize.py`` for the Python oracle it is parity-pinned against).
Each shared library is compiled on first use with the system compiler and
cached next to the source; every entry point degrades gracefully to the
pure-Python implementation when no compiler is available.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

__all__ = [
    "wav_decode_mono",
    "wav_probe",
    "native_available",
    "rttm_available",
    "rttm_from_bits",
    "rttm_from_scores",
]

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "libwavio.so"
_lock = threading.Lock()
_lib = None
_failed = False


def _compile(src: Path, out: Path) -> bool:
    for compiler in ("c++", "g++", "clang++"):
        try:
            subprocess.run(
                [compiler, "-O3", "-shared", "-fPIC", str(src), "-o", str(out)],
                check=True,
                capture_output=True,
                timeout=120,
            )
            return True
        except (OSError, subprocess.CalledProcessError, subprocess.TimeoutExpired):
            continue
    return False


def _build() -> bool:
    return _compile(_HERE / "wavio.cpp", _LIB_PATH)


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


# --------------------------------------------------------------------- #
# RTTM assembler (rttm.cpp) — serving hot path. Exact string parity with
# ops/binarize.batch_binarize_rttm is pinned by tests/test_native_rttm.py.
# --------------------------------------------------------------------- #
_RTTM_LIB_PATH = _HERE / "librttm.so"
_rttm_lib = None
_rttm_failed = False


def _load_rttm():
    global _rttm_lib, _rttm_failed
    with _lock:
        if _rttm_lib is not None or _rttm_failed:
            return _rttm_lib
        src = _HERE / "rttm.cpp"
        if not _RTTM_LIB_PATH.exists() or _RTTM_LIB_PATH.stat().st_mtime < src.stat().st_mtime:
            if not _compile(src, _RTTM_LIB_PATH):
                _rttm_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_RTTM_LIB_PATH))
        except OSError:
            _rttm_failed = True
            return None
        c_charpp = ctypes.POINTER(ctypes.c_char_p)
        lib.rttm_from_bits.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte),  # bits
            ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_double),  # window_starts
            ctypes.c_double,                  # resolution
            c_charpp,                         # uris
            ctypes.POINTER(ctypes.c_ubyte),   # emit
            ctypes.POINTER(ctypes.c_void_p),  # out
            ctypes.POINTER(ctypes.c_long),    # out_len
        ]
        lib.rttm_from_bits.restype = ctypes.c_int
        lib.rttm_from_scores.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_double,
            ctypes.c_float,
            c_charpp,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.rttm_from_scores.restype = ctypes.c_int
        lib.rttm_free.argtypes = [ctypes.POINTER(ctypes.c_void_p), ctypes.c_long]
        lib.rttm_free.restype = None
        _rttm_lib = lib
        return _rttm_lib


def rttm_available() -> bool:
    return _load_rttm() is not None


def _rttm_common(b, window_starts, uris, emit):
    starts = np.ascontiguousarray(window_starts, np.float64)
    if starts.shape != (b,):
        # explicit check (not assert): these values guard raw-memory reads
        # in C and must survive `python -O`
        raise ValueError(f"window_starts shape {starts.shape} != ({b},)")
    uri_bytes = [
        (u.encode() if isinstance(u, str) else u) if u else None for u in uris
    ]
    uri_arr = (ctypes.c_char_p * b)(*uri_bytes)
    if emit is None:
        emit_arr = np.ones(b, np.uint8)
    else:
        emit_arr = np.ascontiguousarray(np.asarray(emit, bool)).view(np.uint8)
        if emit_arr.shape != (b,):
            raise ValueError(f"emit shape {emit_arr.shape} != ({b},)")
    out = (ctypes.c_void_p * b)()
    out_len = (ctypes.c_long * b)()
    return starts, uri_bytes, uri_arr, emit_arr, out, out_len


def _rttm_collect(lib, b, emit_arr, out, out_len) -> List[Optional[str]]:
    try:
        texts: List[Optional[str]] = [None] * b
        for i in range(b):
            if emit_arr[i]:
                texts[i] = (
                    ctypes.string_at(out[i], out_len[i]).decode()
                    if out[i]
                    else ""
                )
        return texts
    finally:
        lib.rttm_free(out, b)


def rttm_from_bits(
    bits: np.ndarray,
    frames: int,
    speakers: int,
    window_starts,
    resolution: float,
    uris,
    emit=None,
) -> Optional[List[Optional[str]]]:
    """Native ``ops.binarize.batch_bits_rttm``: (B, stride) packed uint8
    device-binarized activity -> per-stream RTTM text (None where
    ``emit`` is False). Returns None when no native library is available
    (callers fall back to the numpy route)."""
    lib = _load_rttm()
    if lib is None:
        return None
    bits = np.ascontiguousarray(bits, np.uint8)
    b, stride = bits.shape
    if stride < (frames * speakers + 7) // 8:
        raise ValueError(
            f"packed stride {stride} too small for {frames}x{speakers} bits"
        )
    starts, _keep, uri_arr, emit_arr, out, out_len = _rttm_common(
        b, window_starts, uris, emit
    )
    rc = lib.rttm_from_bits(
        bits.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        b, frames, speakers, stride,
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        float(resolution), uri_arr,
        emit_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        out, out_len,
    )
    if rc != 0:
        lib.rttm_free(out, b)
        return None
    return _rttm_collect(lib, b, emit_arr, out, out_len)


def rttm_from_scores(
    scores: np.ndarray,
    window_starts,
    resolution: float,
    threshold: float,
    uris,
    emit=None,
) -> Optional[List[Optional[str]]]:
    """Native ``ops.binarize.batch_binarize_rttm``: (B, frames, speakers)
    float32 scores -> per-stream RTTM text. Returns None when no native
    library is available."""
    lib = _load_rttm()
    if lib is None:
        return None
    scores = np.ascontiguousarray(scores, np.float32)
    b, frames, speakers = scores.shape
    starts, _keep, uri_arr, emit_arr, out, out_len = _rttm_common(
        b, window_starts, uris, emit
    )
    rc = lib.rttm_from_scores(
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b, frames, speakers,
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        float(resolution), np.float32(threshold), uri_arr,
        emit_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        out, out_len,
    )
    if rc != 0:
        lib.rttm_free(out, b)
        return None
    return _rttm_collect(lib, b, emit_arr, out, out_len)
