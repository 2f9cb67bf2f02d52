"""FLAC decode/encode via the native C++ codec (native/src/flac.cc).

The reference accepts .flac through librosa→audioread→ffmpeg (reference
openvoice/api.py:144, se_extractor.py:9) — a common lossless format for
reference clips.  This image has no libFLAC, so native/src/flac.cc is a
from-scratch implementation of the public FLAC bitstream: unlike the
mp3/vorbis/opus bindings it has NO system-library dependency — if the
native lib is built, FLAC works.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _find_lib() -> str | None:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for sub in ("native/build", "native"):
        p = os.path.join(root, sub, "libovt_audio.so")
        if os.path.exists(p):
            return p
    return None


def _load() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        path = _find_lib()
        if path is None:
            raise RuntimeError(
                "native audio codec not built; run `cmake -S native -B native/build && "
                "cmake --build native/build` (or use WAV inputs)"
            )
        lib = ctypes.CDLL(path)
        if not hasattr(lib, "ovt_flac_decode"):
            raise RuntimeError(
                "native audio lib predates the flac codec; rebuild with "
                "`cmake --build native/build`"
            )
        lib.ovt_flac_decode.restype = ctypes.c_int64
        lib.ovt_flac_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.ovt_flac_encode.restype = ctypes.c_int
        lib.ovt_flac_encode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.ovt_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


def available() -> bool:
    """True when the native lib is built with the flac entry points (the
    codec itself is dependency-free — no system library probe needed)."""
    try:
        _load()
        return True
    except (RuntimeError, OSError):
        return False


def read_flac(path: str) -> tuple[np.ndarray, int]:
    """Decode a FLAC file → (float32 samples [T] or [T, C], sample_rate)."""
    lib = _load()
    buf = ctypes.POINTER(ctypes.c_float)()
    sr = ctypes.c_int(0)
    n_ch = ctypes.c_int(0)
    n = lib.ovt_flac_decode(path.encode(), ctypes.byref(buf), ctypes.byref(sr), ctypes.byref(n_ch))
    if n < 0:
        raise ValueError(f"flac decode failed for {path} (code {n})")
    try:
        total = int(n) * max(1, n_ch.value)
        arr = np.ctypeslib.as_array(buf, shape=(total,)).copy()
    finally:
        lib.ovt_free(ctypes.cast(buf, ctypes.c_void_p))
    if n_ch.value > 1:
        arr = arr.reshape(-1, n_ch.value)
    return arr.astype(np.float32), sr.value


def write_flac(path: str, audio: np.ndarray, sr: int) -> None:
    """Encode float32 samples ([T] mono or [T, C], values in [-1, 1]) as
    16-bit FLAC (lossless at PCM16 precision: decode returns the PCM16
    quantization of the input exactly)."""
    lib = _load()
    audio = np.ascontiguousarray(audio, np.float32)
    frames = audio.shape[0]
    ch = 1 if audio.ndim == 1 else int(audio.shape[1])
    rc = lib.ovt_flac_encode(
        path.encode(), audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frames, int(sr), ch,
    )
    if rc < 0:
        raise ValueError(f"flac encode failed for {path} (code {rc})")
