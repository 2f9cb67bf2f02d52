"""MP3 decode/encode via the native C++ codec (native/src/mp3.cc).

The reference decodes mp3 through pydub→ffmpeg (se_extractor.py:9,23) and
librosa→audioread.  Here the codec is a small in-repo C++ library loaded over
ctypes (mpg123 decode, lame encode); if the shared object hasn't been built
yet, a clear error points at the build step.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LIB_NAMES = ("libovt_audio.so",)


def _find_lib() -> str | None:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for name in _LIB_NAMES:
        for sub in ("native/build", "native"):
            p = os.path.join(root, sub, name)
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
        lib.ovt_mp3_decode.restype = ctypes.c_int64
        lib.ovt_mp3_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.ovt_free.argtypes = [ctypes.c_void_p]
        if hasattr(lib, "ovt_mp3_encode"):
            lib.ovt_mp3_encode.restype = ctypes.c_int
            lib.ovt_mp3_encode.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
            ]
        _LIB = lib
    return _LIB


def read_mp3(path: str) -> tuple[np.ndarray, int]:
    """Decode an MP3 file → (float32 samples [T] or [T, C], sample_rate)."""
    lib = _load()
    buf = ctypes.POINTER(ctypes.c_float)()
    sr = ctypes.c_int(0)
    n_ch = ctypes.c_int(0)
    n = lib.ovt_mp3_decode(path.encode(), ctypes.byref(buf), ctypes.byref(sr), ctypes.byref(n_ch))
    if n < 0:
        raise ValueError(f"mp3 decode failed for {path} (code {n})")
    try:
        total = int(n) * max(1, n_ch.value)
        arr = np.ctypeslib.as_array(buf, shape=(total,)).copy()
    finally:
        lib.ovt_free(ctypes.cast(buf, ctypes.c_void_p))
    if n_ch.value > 1:
        arr = arr.reshape(-1, n_ch.value)
    return arr.astype(np.float32), sr.value


_ENCODER_OK: bool | None = None


def encoder_available() -> bool:
    """True when both the native lib exports ovt_mp3_encode (rebuilt after
    it landed) AND the system libmp3lame resolves at runtime (probed with a
    one-frame encode — the -3 'engine unavailable' path otherwise)."""
    global _ENCODER_OK
    if _ENCODER_OK is None:
        import os
        import tempfile

        try:
            lib = _load()
            if not hasattr(lib, "ovt_mp3_encode"):
                _ENCODER_OK = False
            else:
                probe = np.zeros(1152, np.float32)
                fd, path = tempfile.mkstemp(suffix=".mp3")
                os.close(fd)
                try:
                    rc = lib.ovt_mp3_encode(
                        path.encode(),
                        probe.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        len(probe), 22050, 1, 128,
                    )
                    _ENCODER_OK = rc == 0
                finally:
                    os.unlink(path)
        except (RuntimeError, OSError):
            _ENCODER_OK = False
    return _ENCODER_OK


# MPEG Layer III CBR bitrate tables (kbps).  Which table applies is fixed by
# the sample rate: MPEG-1 at 32/44.1/48 kHz, MPEG-2(.5) below — lame silently
# clamps an out-of-table request (e.g. 192 kbps at 22.05 kHz encodes at 160),
# so the clamp is made explicit here and the EFFECTIVE bitrate is returned.
_MPEG1_KBPS = (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MPEG2_KBPS = (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)


def effective_kbps(sr: int, kbps: int) -> int:
    """The CBR bitrate lame will actually use for `sr`: the largest table
    entry ≤ the request (table minimum when the request is below it)."""
    if kbps <= 0:
        raise ValueError(f"kbps must be positive, got {kbps}")
    table = _MPEG1_KBPS if sr >= 32000 else _MPEG2_KBPS
    fits = [b for b in table if b <= kbps]
    return fits[-1] if fits else table[0]


def write_mp3(path: str, audio: np.ndarray, sr: int, kbps: int = 128) -> int:
    """Encode float32 samples ([T] mono or [T, C] interleaved, values in
    [-1, 1]) to a CBR mp3.  lame's psychoacoustic model runs at quality 2;
    the encoder never resamples (out_samplerate == sr).  Returns the
    EFFECTIVE kbps (the request clamped to the MPEG table for `sr` —
    e.g. 192 at 22.05 kHz encodes at 160)."""
    lib = _load()
    if not hasattr(lib, "ovt_mp3_encode"):
        raise RuntimeError(
            "native audio lib predates the mp3 encoder; rebuild with "
            "`cmake --build native/build`"
        )
    eff = effective_kbps(int(sr), int(kbps))
    audio = np.ascontiguousarray(audio, np.float32)
    frames = audio.shape[0]
    ch = 1 if audio.ndim == 1 else int(audio.shape[1])
    rc = lib.ovt_mp3_encode(
        path.encode(), audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frames, int(sr), ch, eff,
    )
    if rc < 0:
        raise ValueError(f"mp3 encode failed for {path} (code {rc})")
    return eff
