"""ctypes bindings for the native audio decoder (builds on first use).

pybind11 is not available in this image, so the C++ decoder exports a plain
C ABI consumed through ctypes.  The library is compiled on demand with g++
into ``libwavio.so`` next to the source; failures fall back silently to the
numpy parser in ``mst_tpu.data.audio_io``.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SRC = _DIR / "wavio.cpp"
_LIB = _DIR / "libwavio.so"
_lib = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)],
            check=True, capture_output=True,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    stale = _LIB.exists() and _SRC.stat().st_mtime > _LIB.stat().st_mtime
    if (not _LIB.exists() or stale) and not _build():
        if not _LIB.exists():
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
        lib.wav_info.restype = ctypes.c_int
        lib.wav_info.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.wav_decode.restype = ctypes.c_int
        lib.wav_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_float)
        ]
        lib.wav_decode_crop.restype = ctypes.c_int
        lib.wav_decode_crop.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64,
        ]
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def wav_decode_native(data: bytes, crop: tuple[int, int] | None = None):
    """Decode WAV bytes -> ((C, T) float32, sample_rate) with the C++
    decoder, or None when unavailable/unsupported (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    ch = ctypes.c_int32()
    samples = ctypes.c_int64()
    sr = ctypes.c_int32()
    if lib.wav_info(data, len(data), ctypes.byref(ch),
                    ctypes.byref(samples), ctypes.byref(sr)) != 0:
        return None
    C, T = ch.value, samples.value
    if crop is not None:
        start, n = crop
        n = min(n, T - start)
        if n <= 0:
            return None
        out = np.empty((C, n), np.float32)
        rc = lib.wav_decode_crop(
            data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            start, n,
        )
    else:
        out = np.empty((C, T), np.float32)
        rc = lib.wav_decode(
            data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
    if rc != 0:
        return None
    return out, sr.value
