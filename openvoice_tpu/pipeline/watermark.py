"""Audio watermarking, API-compatible with the reference's wavmark usage
(api.py:162-201): 32 bits embedded per 16,000-sample window, one window per
32,000 samples; 8-char messages via `string_to_bits`.

wavmark is an external neural model; here the watermark is a self-contained
QIM (quantization-index-modulation) scheme (SURVEY.md §2.4 'reimplement ...
or a DSP watermark'):

* each 16 k window is split into 32 sub-blocks of 500 samples;
* the correlation c_i = ⟨block_i, pn_i⟩ with a fixed unit-norm PRNG sequence
  is *quantized* to the nearest even (bit 0) or odd (bit 1) multiple of Δ by
  adding (c'−c)·pn_i — host-signal interference cancels exactly;
* decode: bit_i = round(c_i/Δ) mod 2.

Δ = 8e-3 keeps the per-sample change ≲ 1.5e-3 (−56 dBFS, inaudible under
speech) while leaving a ±Δ/2 = ±4e-3 correlation margin — two orders above
PCM16 quantization noise.  Provenance marking, not cryptography.
"""

from __future__ import annotations

import numpy as np

from openvoice_tpu.utils import bits_to_string, string_to_bits

K = 16000  # samples per watermark window (api.py:169)
COEFF = 2  # one window per COEFF·K samples (api.py:170)
BITS_PER_WINDOW = 32
_BLOCK = K // BITS_PER_WINDOW  # 500
_DELTA = 8e-3


def _pn_matrix() -> np.ndarray:
    rng = np.random.default_rng(0x0BEC0DE)
    pn = rng.standard_normal((BITS_PER_WINDOW, _BLOCK)).astype(np.float32)
    pn /= np.linalg.norm(pn, axis=1, keepdims=True)
    return pn


_PN = _pn_matrix()


def add_watermark(audio: np.ndarray, message: str) -> np.ndarray:
    """Embed `message` (≤8 chars) into a mono float waveform; returns a copy.

    Mirrors the reference loop structure (api.py:162-184): window n covers
    samples [2nK, (2n+1)K); short windows are skipped with a notice.
    """
    if not message:
        return audio
    audio = np.array(audio, dtype=np.float32, copy=True)
    bits = string_to_bits(message).reshape(-1)
    n_repeat = len(bits) // BITS_PER_WINDOW
    for n in range(n_repeat):
        start = (COEFF * n) * K
        chunk = audio[start : start + K]
        if len(chunk) != K:
            print("Audio too short, fail to add watermark")
            break
        window_bits = bits[n * BITS_PER_WINDOW : (n + 1) * BITS_PER_WINDOW]
        blocks = chunk.reshape(BITS_PER_WINDOW, _BLOCK)
        c = np.sum(blocks * _PN, axis=1)  # [32] correlations
        # nearest multiple of Δ with the required parity
        q = np.round(c / _DELTA)
        wrong_parity = (q.astype(np.int64) & 1) != window_bits
        # move to the closer adjacent multiple when parity is wrong
        q = np.where(wrong_parity, q + np.where(c / _DELTA >= q, 1, -1), q)
        c_target = q * _DELTA
        blocks = blocks + (c_target - c)[:, None] * _PN
        audio[start : start + K] = blocks.reshape(-1)
    return audio


def detect_watermark(audio: np.ndarray, n_repeat: int) -> str:
    """Decode n_repeat windows → message string, or 'Fail' if audio is short
    (api.py:186-201 contract)."""
    rows = []
    audio = np.asarray(audio, dtype=np.float32)
    for n in range(n_repeat):
        start = (COEFF * n) * K
        chunk = audio[start : start + K]
        if len(chunk) != K:
            print("Audio too short, fail to detect watermark")
            return "Fail"
        blocks = chunk.reshape(BITS_PER_WINDOW, _BLOCK)
        corr = np.sum(blocks * _PN, axis=1)
        rows.append((np.round(corr / _DELTA).astype(np.int64) & 1))
    bits = np.stack(rows).reshape(-1, 8)
    return bits_to_string(bits)
