"""Cloning-quality metrics: SE-cosine speaker similarity and mel-cepstral
distortion (VERDICT r4 next #7 — the training recipe previously proved
"losses move", not "cloning improves").

The reference's entire pitch is cloning quality (reference README.md:16-36)
but it ships no measurement; these are the two standard objective proxies:

* **SE cosine** — converted audio re-embedded through the model's OWN
  reference encoder (api `extract_tone_color` path) vs the target speaker
  embedding: the tone-color space the converter is trained in is the
  natural yardstick for "did the timbre move to the target".
* **MCD** — frame-aligned mel-cepstral distortion between two waveforms:
  conversion preserves content frame-for-frame (output length = input
  frames × upsample), so MCD(converted, source) measures spectral
  distortion without DTW; the classic 10/ln10·√2·‖Δc‖ formula over
  cepstra 1..D (c0/energy excluded).

Used by benchmarks/train_real_demo.py (recorded before/after numbers) and
tests/test_quality.py (threshold tests).
"""

from __future__ import annotations

import numpy as np


def _dct_ii_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Orthonormal DCT-II basis [n_out, n_in]."""
    k = np.arange(n_out)[:, None]
    i = np.arange(n_in)[None, :]
    m = np.cos(np.pi * k * (2 * i + 1) / (2 * n_in))
    m *= np.sqrt(2.0 / n_in)
    m[0] *= np.sqrt(0.5)
    return m.astype(np.float64)


def mel_cepstra(
    audio: np.ndarray,
    sr: int,
    *,
    n_fft: int = 1024,
    hop: int = 256,
    n_mels: int = 80,
    n_mcc: int = 13,
) -> np.ndarray:
    """[T] waveform → [frames, n_mcc] mel-cepstra (c0 included at col 0)."""
    import jax.numpy as jnp

    from openvoice_tpu.audio.mel import mel_filterbank
    from openvoice_tpu.audio.stft import linear_spectrogram

    audio = np.asarray(audio, np.float32)
    spec = np.asarray(
        linear_spectrogram(jnp.asarray(audio)[None], n_fft, hop, n_fft)
    )[0]  # [n_freq, frames]
    fb = mel_filterbank(sr, n_fft, n_mels, 0.0, None)
    logmel = np.log(np.clip(fb @ spec, 1e-5, None))  # [n_mels, frames]
    dct = _dct_ii_matrix(n_mels, n_mcc)
    return (dct @ logmel).T  # [frames, n_mcc]


def mcd(a: np.ndarray, b: np.ndarray, sr: int, **kw) -> float:
    """Frame-aligned mel-cepstral distortion in dB between waveforms
    (trailing length mismatch is truncated; c0 excluded per convention)."""
    ca = mel_cepstra(a, sr, **kw)
    cb = mel_cepstra(b, sr, **kw)
    n = min(len(ca), len(cb))
    if n == 0:
        raise ValueError("audio too short for one analysis frame")
    d = ca[:n, 1:] - cb[:n, 1:]
    per_frame = np.sqrt(2.0 * np.sum(d * d, axis=1))
    return float((10.0 / np.log(10.0)) * per_frame.mean())


def se_cosine(converter, audio: np.ndarray, target_se: np.ndarray) -> float:
    """Cosine similarity between `audio`'s tone-color embedding (through the
    converter's own reference encoder) and a target SE.  `converter` is an
    api.ToneColorConverter (any params — the metric is relative to that
    model's embedding space)."""
    se = np.asarray(converter._se_from_audio_batch([np.asarray(audio, np.float32)]))
    return float(cosine(se.reshape(-1), np.asarray(target_se).reshape(-1)))


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64).reshape(-1)
    b = np.asarray(b, np.float64).reshape(-1)
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 0.0
    return float(a @ b / (na * nb))
