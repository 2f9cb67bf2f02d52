"""Universal decode (m4a/aac/mp4/wma/…) + AAC-in-m4a encode via the system
ffmpeg libraries, behind the optional in-repo libovt_ffdec.so
(native/src/ffdec.cc).

The reference's ingest surface is "anything librosa/audioread/ffmpeg
decode" (reference openvoice/api.py:144, se_extractor.py:9); the in-repo
codecs cover wav/mp3/ogg/flac with no (or tiny dlopen'd) dependencies, and
this binding adds the rest wherever libavformat/libavcodec exist.  When
the lib wasn't built (no ffmpeg on the system), `available()` is False and
load_audio reports the unsupported format cleanly.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _find_lib() -> str | None:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for sub in ("native/build", "native"):
        p = os.path.join(root, sub, "libovt_ffdec.so")
        if os.path.exists(p):
            return p
    return None


def _load() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        path = _find_lib()
        if path is None:
            raise RuntimeError(
                "ffmpeg-backed codec not built (libovt_ffdec.so absent — "
                "system ffmpeg libraries missing at build time); use "
                "wav/mp3/ogg/flac inputs instead"
            )
        lib = ctypes.CDLL(path)
        lib.ovt_ff_decode.restype = ctypes.c_int64
        lib.ovt_ff_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.ovt_ff_encode_m4a.restype = ctypes.c_int
        lib.ovt_ff_encode_m4a.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        # ovt_free lives in the MAIN native lib; ffdec mallocs with the same
        # allocator, so free through libc directly
        _LIB = lib
    return _LIB


_libc = ctypes.CDLL(None)


def available() -> bool:
    try:
        _load()
        return True
    except (RuntimeError, OSError):
        return False


def read_any(path: str) -> tuple[np.ndarray, int]:
    """Decode any ffmpeg-supported audio file → (float32 [T] or [T, C],
    sample_rate)."""
    lib = _load()
    buf = ctypes.POINTER(ctypes.c_float)()
    sr = ctypes.c_int(0)
    n_ch = ctypes.c_int(0)
    n = lib.ovt_ff_decode(path.encode(), ctypes.byref(buf), ctypes.byref(sr), ctypes.byref(n_ch))
    if n < 0:
        raise ValueError(f"ffmpeg decode failed for {path} (code {n})")
    try:
        total = int(n) * max(1, n_ch.value)
        arr = np.ctypeslib.as_array(buf, shape=(total,)).copy()
    finally:
        _libc.free(ctypes.cast(buf, ctypes.c_void_p))
    if n_ch.value > 1:
        arr = arr.reshape(-1, n_ch.value)
    return arr.astype(np.float32), sr.value


def write_m4a(path: str, audio: np.ndarray, sr: int, kbps: int = 128) -> None:
    """Encode float32 samples ([T] mono or [T, C], values in [-1, 1]) as
    AAC in an mp4/m4a container (ffmpeg's native aac encoder)."""
    lib = _load()
    audio = np.ascontiguousarray(audio, np.float32)
    frames = audio.shape[0]
    ch = 1 if audio.ndim == 1 else int(audio.shape[1])
    rc = lib.ovt_ff_encode_m4a(
        path.encode(), audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frames, int(sr), ch, int(kbps),
    )
    if rc < 0:
        raise ValueError(f"m4a encode failed for {path} (code {rc})")
