"""Linear-magnitude spectrogram front end, TPU-native.

The reference computes spectrograms with ``torch.stft`` (cuFFT/MKL under the
hood; mel_processing.py:40-75): reflect-pad ``(n_fft - hop)/2`` each side, Hann
window, ``center=False``, one-sided, magnitude ``sqrt(re^2 + im^2 + 1e-6)``.

On TPU the natural formulation is a *framed matmul with a windowed DFT basis* —
exactly the formulation the reference itself validated against ``torch.stft``
to atol 1e-4 in its ConvSTFT prototype (mel_processing.py:98-116).  A matmul
maps straight onto the MXU; an FFT does not.  The frame matrix is built with a
gather (``jnp.take``) so the whole spectrogram is one fused XLA graph, and a
Pallas kernel (`openvoice_tpu.ops.stft_pallas`) covers the fused
frame+matmul+magnitude path for long inputs.

All math in float32 with HIGHEST matmul precision: magnitude parity with the
torch reference at 1e-4 is part of the acceptance criteria (SURVEY.md §4).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=8)
def stft_basis(n_fft: int, win_length: int) -> np.ndarray:
    """Windowed real-DFT basis, shape [n_fft, 2 * (n_fft//2 + 1)].

    Column block 0 holds cos (real) rows, block 1 holds -sin (imag) rows so
    that ``frames @ basis`` yields [re | im] matching torch.stft's convention
    (X_k = sum_n x_n e^{-2πi kn/N}).  The Hann window is periodic
    (``torch.hann_window`` default) and zero-padded centered to n_fft when
    win_length < n_fft, mirroring torch.stft.
    """
    n_freq = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None].astype(np.float64)
    k = np.arange(n_freq)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * n * k / n_fft
    # periodic Hann: 0.5 - 0.5 cos(2πn/N)
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win_length) / win_length)
    if win_length < n_fft:
        pad_l = (n_fft - win_length) // 2
        w = np.zeros(n_fft)
        w[pad_l : pad_l + win_length] = win
    else:
        w = win
    basis = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1) * w[:, None]
    return basis.astype(np.float32)


def _reflect_pad_1d(y: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect-pad the last axis by ``pad`` on both sides (torch 'reflect')."""
    if pad == 0:
        return y
    left = y[..., 1 : pad + 1][..., ::-1]
    right = y[..., -pad - 1 : -1][..., ::-1]
    return jnp.concatenate([left, y, right], axis=-1)


def frame_signal(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """[..., T] → [..., n_frames, n_fft] frames starting at multiples of hop."""
    t = y.shape[-1]
    n_frames = (t - n_fft) // hop + 1
    # gather formulation: XLA lowers this to an efficient dynamic-slice loop /
    # strided load; avoids conv-patch blowup
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]).astype(np.int32)
    return jnp.take(y, jnp.asarray(idx), axis=-1)


def host_spectrogram(padded_audio: np.ndarray, n_fft: int, hop: int,
                     win_length: int) -> np.ndarray:
    """Pure-numpy magnitude spectrogram of an ALREADY reflect-padded 1-D
    signal — same framing and `sqrt(|.|² + 1e-6)` semantics as the device
    path (matches it to ~3e-6).

    For host-resident pipelines (e.g. convert_streaming, whose design keeps
    the full-length spectrogram in host RAM and streams chunks): computing
    the STFT on device and pulling [T, 513] f32 back through a remote
    dispatch tunnel costs ~1 GB per hour of audio; numpy rfft here is
    effectively free by comparison."""
    win = np.hanning(win_length + 1)[:-1].astype(np.float64)
    if win_length < n_fft:
        # center-pad exactly like stft_basis / torch.stft: (n_fft-win)//2 on
        # the left, remainder on the right
        pad_l = (n_fft - win_length) // 2
        win = np.pad(win, (pad_l, n_fft - win_length - pad_l))
    n_frames = (len(padded_audio) - n_fft) // hop + 1
    frames = np.lib.stride_tricks.sliding_window_view(
        np.asarray(padded_audio, np.float64), n_fft
    )[:: hop][:n_frames]
    spec = np.fft.rfft(frames * win, axis=-1)
    return np.sqrt(np.abs(spec) ** 2 + 1e-6).astype(np.float32)


def masked_linear_spectrogram(
    audio: jnp.ndarray,
    sample_lengths: jnp.ndarray,
    n_fft: int,
    hop: int,
    win_length: int,
) -> jnp.ndarray:
    """Per-row reflect-padded magnitude spectrogram of DEVICE-resident audio
    with per-row true lengths — the in-graph equivalent of the host
    `_spec_from_audio` + `linear_spectrogram` pair, for fused pipelines
    (TTS-decode → convert in one dispatch) where each batch row's audio ends
    at a different sample.

    audio: [B, T] zero-padded beyond each row's `sample_lengths[b]`; T must
    be a multiple of `hop`.  Returns [B, T//hop, n_freq] — frames beyond a
    row's true frame count are garbage and must be masked downstream
    (spec_lengths), exactly like every other padded-bucket consumer.

    Reflect indexing matches torch/_reflect_pad_1d: position p maps to
    sample (L-1) - |(L-1) - |p||, valid for pads < L; shorter degenerate
    rows clamp into range (the reference's torch reflect pad would error
    on them outright).
    """
    b, t = audio.shape
    pad = (n_fft - hop) // 2
    n_frames = t // hop
    pos = (
        jnp.arange(n_frames, dtype=jnp.int32)[:, None] * hop
        + jnp.arange(n_fft, dtype=jnp.int32)[None, :]
        - pad
    )  # [n_frames, n_fft]

    def row_frames(a: jnp.ndarray, length: jnp.ndarray) -> jnp.ndarray:
        lm1 = jnp.maximum(length - 1, 1).astype(jnp.int32)
        idx = lm1 - jnp.abs(lm1 - jnp.abs(pos))
        idx = jnp.clip(idx, 0, t - 1)
        return a[idx]

    frames = jax.vmap(row_frames)(audio.astype(jnp.float32), sample_lengths)
    basis = jnp.asarray(stft_basis(n_fft, win_length))
    proj = jnp.dot(
        frames, basis,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    n_freq = n_fft // 2 + 1
    re, im = proj[..., :n_freq], proj[..., n_freq:]
    return jnp.sqrt(re * re + im * im + 1e-6)  # [B, n_frames, n_freq]


@partial(jax.jit, static_argnames=("n_fft", "hop", "win_length", "pad_signal"))
def linear_spectrogram(
    y: jnp.ndarray,
    n_fft: int = 1024,
    hop: int = 256,
    win_length: int = 1024,
    pad_signal: bool = True,
) -> jnp.ndarray:
    """Reference-semantics linear spectrogram.

    y: [B, T] float32 audio in [-1, 1].
    Returns [B, n_freq, n_frames] magnitudes (reference layout, enc_q input).
    """
    y = y.astype(jnp.float32)
    if pad_signal:
        y = _reflect_pad_1d(y, (n_fft - hop) // 2)
    frames = frame_signal(y, n_fft, hop)  # [B, F, n_fft]
    basis = jnp.asarray(stft_basis(n_fft, win_length))
    proj = jnp.dot(
        frames,
        basis,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [B, F, 2*n_freq]
    n_freq = n_fft // 2 + 1
    re, im = proj[..., :n_freq], proj[..., n_freq:]
    mag = jnp.sqrt(re * re + im * im + 1e-6)  # [B, F, n_freq]
    return jnp.swapaxes(mag, -1, -2)  # [B, n_freq, F]
