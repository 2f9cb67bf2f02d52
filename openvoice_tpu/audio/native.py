"""ctypes bindings for the native audio runtime (native/libovt_audio.so).

Build: ``cmake -S native -B native/build -G Ninja && cmake --build native/build``.
Every entry degrades gracefully: `available()` gates callers, and the Python
implementations in audio/io.py + pipeline/se_extractor.py remain the
reference semantics (the C++ mirrors them; tests assert agreement).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB: ctypes.CDLL | None = None


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load() -> ctypes.CDLL | None:
    global _LIB
    if _LIB is not None:
        return _LIB
    for sub in ("native/build", "native"):
        path = os.path.join(_repo_root(), sub, "libovt_audio.so")
        if os.path.exists(path):
            lib = ctypes.CDLL(path)
            lib.ovt_free.argtypes = [ctypes.c_void_p]
            lib.ovt_wav_read.restype = ctypes.c_int64
            lib.ovt_wav_read.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.ovt_wav_write.restype = ctypes.c_int64
            lib.ovt_wav_write.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.c_int,
            ]
            lib.ovt_mp3_decode.restype = ctypes.c_int64
            lib.ovt_mp3_decode.argtypes = lib.ovt_wav_read.argtypes
            lib.ovt_resample.restype = ctypes.c_int64
            lib.ovt_resample.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ]
            lib.ovt_energy_vad.restype = ctypes.c_int64
            lib.ovt_energy_vad.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.c_float,
                ctypes.c_float,
                ctypes.c_float,
                ctypes.c_float,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
            ]
            lib.ovt_loader_create.restype = ctypes.c_void_p
            lib.ovt_loader_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
            lib.ovt_loader_destroy.argtypes = [ctypes.c_void_p]
            lib.ovt_loader_submit.restype = ctypes.c_int64
            lib.ovt_loader_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            lib.ovt_loader_next.restype = ctypes.c_int64
            lib.ovt_loader_next.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            _LIB = lib
            return lib
    return None


def available() -> bool:
    return _load() is not None


def _take(lib, buf, count: int) -> np.ndarray:
    try:
        return np.ctypeslib.as_array(buf, shape=(count,)).copy()
    finally:
        lib.ovt_free(ctypes.cast(buf, ctypes.c_void_p))


def wav_read(path: str) -> tuple[np.ndarray, int]:
    lib = _load()
    buf = ctypes.POINTER(ctypes.c_float)()
    sr = ctypes.c_int(0)
    ch = ctypes.c_int(0)
    frames = lib.ovt_wav_read(path.encode(), ctypes.byref(buf), ctypes.byref(sr), ctypes.byref(ch))
    if frames < 0:
        raise ValueError(f"native wav read failed ({frames}) for {path}")
    arr = _take(lib, buf, int(frames) * ch.value)
    if ch.value > 1:
        arr = arr.reshape(-1, ch.value)
    return arr, sr.value


def wav_write(path: str, audio: np.ndarray, sr: int) -> None:
    lib = _load()
    audio = np.ascontiguousarray(audio, np.float32)
    frames = audio.shape[0]
    ch = 1 if audio.ndim == 1 else audio.shape[1]
    rc = lib.ovt_wav_write(
        path.encode(), audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frames, sr, ch,
    )
    if rc < 0:
        raise ValueError(f"native wav write failed ({rc}) for {path}")


def resample(audio: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    lib = _load()
    audio = np.ascontiguousarray(audio, np.float32)
    buf = ctypes.POINTER(ctypes.c_float)()
    n = lib.ovt_resample(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(audio),
        sr_in, sr_out, ctypes.byref(buf),
    )
    if n < 0:
        raise ValueError(f"native resample failed ({n})")
    return _take(lib, buf, int(n))


def energy_vad(
    audio: np.ndarray, sr: int, frame_ms: float = 30.0, min_speech_s: float = 0.1,
    min_silence_s: float = 1.0, threshold_db: float = -40.0, max_segments: int = 4096,
) -> list[tuple[int, int]]:
    lib = _load()
    audio = np.ascontiguousarray(audio, np.float32)
    seg = (ctypes.c_int64 * (2 * max_segments))()
    n = lib.ovt_energy_vad(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(audio), sr,
        frame_ms, min_speech_s, min_silence_s, threshold_db, seg, max_segments,
    )
    return [(int(seg[2 * i]), int(seg[2 * i + 1])) for i in range(int(n))]


class PrefetchLoader:
    """Threaded decode+resample pipeline delivering clips in submit order."""

    def __init__(self, n_threads: int = 2, target_sr: int = 22050, capacity: int = 16):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native audio library not built")
        self._handle = self._lib.ovt_loader_create(n_threads, target_sr, capacity)
        self._submitted = 0
        self._delivered = 0

    def submit(self, path: str) -> int:
        t = self._lib.ovt_loader_submit(self._handle, path.encode())
        if t < 0:
            raise RuntimeError("loader is shutting down")
        self._submitted += 1
        return int(t)

    def next(self) -> tuple[int, np.ndarray | None]:
        """(ticket, clip) in submission order; clip=None on decode error."""
        if self._delivered >= self._submitted:
            raise IndexError("no pending clips")
        buf = ctypes.POINTER(ctypes.c_float)()
        n = ctypes.c_int64(0)
        ticket = ctypes.c_int64(0)
        rc = self._lib.ovt_loader_next(
            self._handle, ctypes.byref(buf), ctypes.byref(n), ctypes.byref(ticket)
        )
        self._delivered += 1
        if rc == -2:
            return int(ticket.value), None
        return int(rc), _take(self._lib, buf, int(n.value))

    def close(self) -> None:
        if self._handle:
            self._lib.ovt_loader_destroy(self._handle)
            self._handle = None
