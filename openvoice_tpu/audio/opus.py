"""Raw Opus encode/decode via the system libopus (ctypes, honest-dependency
position like mpg123/lame in native/src/mp3.cc — self-declared prototypes,
clean error when the library is absent).

Opus is the other lossy codec a served clip realistically passes through
(WebRTC, Discord, WhatsApp voice notes).  libopus has no container layer, so
this module round-trips raw packets in memory — exactly what a transport
stack does — rather than writing .ogg files.  Opus only accepts 8/12/16/24/48
kHz input, so a 22.05 kHz clip is resampled to 24 kHz first and back after
decode (the same resample every real Opus path performs); robustness claims
measured through `opus_roundtrip` therefore include that resample pair.

Used by tests/test_pipeline.py to MEASURE watermark survival through a real
Opus codec (reference wavmark robustness bar, api.py:105-109).
"""

from __future__ import annotations

import ctypes

import numpy as np

_LIB: ctypes.CDLL | None = None
_OPUS_APPLICATION_AUDIO = 2049
_OPUS_SET_BITRATE_REQUEST = 4002


def _load() -> ctypes.CDLL | None:
    global _LIB
    if _LIB is not None:
        return _LIB
    for name in ("libopus.so.0", "libopus.so"):
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.opus_encoder_create.restype = ctypes.c_void_p
        lib.opus_encoder_create.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ]
        lib.opus_encoder_ctl.restype = ctypes.c_int
        # variadic: declare the fixed args so the handle isn't truncated to
        # a 32-bit int; the one vararg we use (bitrate) passes as c_int
        lib.opus_encoder_ctl.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.opus_encode_float.restype = ctypes.c_int
        lib.opus_encode_float.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
        ]
        lib.opus_encoder_destroy.argtypes = [ctypes.c_void_p]
        lib.opus_decoder_create.restype = ctypes.c_void_p
        lib.opus_decoder_create.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ]
        lib.opus_decode_float.restype = ctypes.c_int
        lib.opus_decode_float.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ]
        lib.opus_decoder_destroy.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib
    return None


def available() -> bool:
    return _load() is not None


def opus_roundtrip(audio: np.ndarray, sr: int, kbps: int = 32) -> np.ndarray:
    """Mono float32 waveform → Opus packets (20 ms frames at `kbps`) → decode,
    returned at the input sample rate and trimmed to the input length.

    Includes the sr↔24 kHz resample pair Opus mandates for non-native rates
    (a no-op when sr is already one of 8/12/16/24/48 kHz).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("libopus not available on this system")
    audio = np.ascontiguousarray(audio, np.float32)
    n_in = len(audio)

    opus_sr = sr if sr in (8000, 12000, 16000, 24000, 48000) else 24000
    if opus_sr != sr:
        from openvoice_tpu.audio.io import resample

        work = np.ascontiguousarray(resample(audio, sr, opus_sr), np.float32)
    else:
        work = audio

    err = ctypes.c_int(0)
    enc = lib.opus_encoder_create(opus_sr, 1, _OPUS_APPLICATION_AUDIO, ctypes.byref(err))
    if not enc or err.value != 0:
        raise RuntimeError(f"opus_encoder_create failed ({err.value})")
    dec = lib.opus_decoder_create(opus_sr, 1, ctypes.byref(err))
    if not dec or err.value != 0:
        lib.opus_encoder_destroy(enc)
        raise RuntimeError(f"opus_decoder_create failed ({err.value})")
    try:
        rc = lib.opus_encoder_ctl(enc, _OPUS_SET_BITRATE_REQUEST, kbps * 1000)
        if rc != 0:
            # a silently-ignored failure here would make every kbps-specific
            # robustness measurement measure the DEFAULT bitrate instead
            raise RuntimeError(f"OPUS_SET_BITRATE({kbps} kbps) failed ({rc})")
        frame = opus_sr // 50  # 20 ms
        n_frames = (len(work) + frame - 1) // frame
        padded = np.zeros(n_frames * frame, np.float32)
        padded[: len(work)] = work
        packet = (ctypes.c_ubyte * 4000)()
        out = np.zeros_like(padded)
        pcm_out = (ctypes.c_float * frame)()
        for i in range(n_frames):
            chunk = padded[i * frame : (i + 1) * frame]
            nb = lib.opus_encode_float(
                enc, chunk.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), frame,
                packet, len(packet),
            )
            if nb < 0:
                raise RuntimeError(f"opus_encode_float failed ({nb})")
            nd = lib.opus_decode_float(dec, packet, nb, pcm_out, frame, 0)
            if nd != frame:
                raise RuntimeError(f"opus_decode_float returned {nd}, wanted {frame}")
            out[i * frame : (i + 1) * frame] = np.frombuffer(pcm_out, np.float32)
        out = out[: len(work)]
    finally:
        lib.opus_encoder_destroy(enc)
        lib.opus_decoder_destroy(dec)

    if opus_sr != sr:
        from openvoice_tpu.audio.io import resample

        out = np.ascontiguousarray(resample(out, opus_sr, sr), np.float32)
    return out[:n_in]
