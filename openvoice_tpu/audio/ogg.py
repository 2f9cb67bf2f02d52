"""Ogg/Vorbis decode/encode via the native C++ codec (native/src/vorbis.cc).

The reference accepts .ogg through librosa→audioread→ffmpeg
(se_extractor.py:9); here the codec is the system libvorbisfile /
libogg+libvorbis+libvorbisenc behind the in-repo C ABI (same
honest-dependency position as mpg123/lame for mp3).
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
        if not hasattr(lib, "ovt_ogg_decode"):
            raise RuntimeError(
                "native audio lib predates the ogg codec; rebuild with "
                "`cmake --build native/build`"
            )
        lib.ovt_ogg_decode.restype = ctypes.c_int64
        lib.ovt_ogg_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.ovt_ogg_encode.restype = ctypes.c_int
        lib.ovt_ogg_encode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
        ]
        lib.ovt_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


def available() -> bool:
    """True when the native lib is built with the ogg entry points AND the
    system vorbis libraries resolve (probed with a tiny encode+decode)."""
    global _AVAILABLE
    if _AVAILABLE is None:
        import tempfile

        try:
            lib = _load()
            probe = np.zeros(2048, np.float32)
            fd, path = tempfile.mkstemp(suffix=".ogg")
            os.close(fd)
            try:
                rc = lib.ovt_ogg_encode(
                    path.encode(), probe.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    len(probe), 22050, 1, ctypes.c_float(0.4),
                )
                # decode rides a DIFFERENT system library (libvorbisfile,
                # packaged separately from libvorbis/enc) — probe it too
                if rc == 0:
                    arr, sr = read_ogg(path)
                    _AVAILABLE = sr == 22050 and len(arr) == len(probe)
                else:
                    _AVAILABLE = False
            except ValueError:
                _AVAILABLE = False
            finally:
                os.unlink(path)
        except (RuntimeError, OSError):
            _AVAILABLE = False
    return _AVAILABLE


_AVAILABLE: bool | None = None


def read_ogg(path: str) -> tuple[np.ndarray, int]:
    """Decode an Ogg/Vorbis file → (float32 samples [T] or [T, C], rate)."""
    lib = _load()
    buf = ctypes.POINTER(ctypes.c_float)()
    sr = ctypes.c_int(0)
    n_ch = ctypes.c_int(0)
    n = lib.ovt_ogg_decode(path.encode(), ctypes.byref(buf), ctypes.byref(sr), ctypes.byref(n_ch))
    if n < 0:
        raise ValueError(f"ogg decode failed for {path} (code {n})")
    try:
        total = int(n) * max(1, n_ch.value)
        arr = np.ctypeslib.as_array(buf, shape=(total,)).copy()
    finally:
        lib.ovt_free(ctypes.cast(buf, ctypes.c_void_p))
    if n_ch.value > 1:
        arr = arr.reshape(-1, n_ch.value)
    return arr.astype(np.float32), sr.value


def write_ogg(path: str, audio: np.ndarray, sr: int, quality: float = 0.4) -> None:
    """Encode float32 samples ([T] mono or [T, C], values in [-1, 1]) to
    Ogg/Vorbis at VBR `quality` in [-0.1, 1.0] (0.4 ≈ 128 kbps stereo)."""
    lib = _load()
    audio = np.ascontiguousarray(audio, np.float32)
    frames = audio.shape[0]
    ch = 1 if audio.ndim == 1 else int(audio.shape[1])
    rc = lib.ovt_ogg_encode(
        path.encode(), audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frames, int(sr), ch, ctypes.c_float(quality),
    )
    if rc < 0:
        raise ValueError(f"ogg encode failed for {path} (code {rc})")
