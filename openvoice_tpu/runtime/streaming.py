"""Blockwise streaming conversion — constant memory for unbounded audio.

SURVEY.md §5.7(c): the reference converts a whole utterance in one pass
(api.py:150-154), so activation memory grows with length — O(T·256 samples)
inside the HiFi-GAN upsampler — and a single chip caps out.  Sequence
parallelism (runtime/sequence_parallel.py) removes the cap by sharding time
across chips; this module removes it on ONE chip by streaming fixed-size
chunks through one compiled graph.

Every stage of the convert graph is a finite-receptive-field conv stack, so
a chunk extended by ``halo ≥ required_halo(cfg)`` frames on each side
(≈114 frames for the shipped configs) decodes **bit-identically** to the
full-utterance graph: interior chunks see the same neighbor frames, edge
chunks see the same zero padding, and the per-chunk mask is rebuilt from
global frame positions so per-layer masking matches everywhere.  The noise
tensor is sliced from one full-length array at the same global positions,
keeping the stochastic path identical too.

Window starts are clamped to frame 0 so the in-window mask is always a
PREFIX mask: the fused serving kernels (ops/{wn,mrf}_pallas.py) rebuild
masks as ``pos < sum(mask)`` and cannot represent a left-invalid margin.
At start == 0 the window's left edge IS the sequence start, so the kernels'
zero padding matches the one-shot graph exactly; clamped chunks emit from
``offset = ci·chunk − start`` (a traced scalar — still one compiled graph).

One jitted graph of shape [B, halo + chunk + halo] serves every chunk —
compile once, stream forever; peak device memory is O(chunk), independent
of utterance length.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from openvoice_tpu.config import SynthesizerConfig
from openvoice_tpu.models.synthesizer import voice_conversion_masked
from openvoice_tpu.runtime.sequence_parallel import required_halo


@partial(jax.jit, static_argnames=("cfg", "fast", "chunk_frames"))
def _run_chunk(params, dec_cache, cfg, spec_ext, mask_ext, noise_ext,
               g_src, g_tgt, tau, offset, *, fast, chunk_frames):
    """Convert one halo-extended window and emit chunk_frames·up samples
    starting at frame `offset` (traced — clamped first chunks use < halo)."""
    up = cfg.upsample_factor
    audio = voice_conversion_masked(
        params, cfg, spec_ext, mask_ext, g_src, g_tgt, tau, noise_ext,
        fast=fast, dec_cache=dec_cache,
    )
    # squeeze the unit dim on device: the dispatch tunnel reads minor-dim-1
    # arrays back element-wise (hundreds of seconds for a few MB)
    return lax.dynamic_slice_in_dim(audio[..., 0], offset * up, chunk_frames * up, axis=1)


def voice_conversion_streaming(
    params: dict,
    cfg: SynthesizerConfig,
    spec,
    spec_lengths,
    g_src,
    g_tgt,
    tau: float,
    noise,
    *,
    chunk_frames: int = 896,
    halo: int | None = None,
    fast: bool = False,
    dec_cache: dict | None = None,
) -> np.ndarray:
    """Convert an arbitrarily long spectrogram in fixed-size chunks.

    spec: [B, T, n_freq]; spec_lengths: [B]; noise: [B, T, inter] (the same
    standard-normal tensor the one-shot path would use); returns audio
    [B, T·upsample, 1] equal to voice_conversion() up to float roundoff.
    """
    spec = np.asarray(spec, np.float32)
    noise = np.asarray(noise, np.float32)
    lengths = np.asarray(spec_lengths, np.int32)
    b, t, n_freq = spec.shape
    if halo is None:
        halo = required_halo(cfg)
    up = cfg.upsample_factor
    ext = chunk_frames + 2 * halo

    g_src = jnp.asarray(g_src)
    g_tgt = jnp.asarray(g_tgt)
    n_chunks = -(-t // chunk_frames)
    pieces = []
    for ci in range(n_chunks):
        start = max(ci * chunk_frames - halo, 0)
        offset = ci * chunk_frames - start  # ≤ halo; < halo only when clamped
        window = np.zeros((b, ext, n_freq), np.float32)
        nwin = np.zeros((b, ext, noise.shape[-1]), np.float32)
        hi = min(start + ext, t)
        window[:, : hi - start] = spec[:, start:hi]
        nwin[:, : hi - start] = noise[:, start:hi]
        pos = start + np.arange(ext)
        mask = pos[None, :] < lengths[:, None]  # always a prefix mask
        pieces.append(np.asarray(_run_chunk(
            params, dec_cache, cfg,
            jnp.asarray(window),
            jnp.asarray(mask.astype(np.float32))[..., None],
            jnp.asarray(nwin),
            g_src, g_tgt, tau, offset,
            fast=fast, chunk_frames=chunk_frames,
        )))
    audio = np.concatenate(pieces, axis=1)[..., None]
    return audio[:, : t * up]
