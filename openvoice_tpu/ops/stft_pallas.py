"""Pallas TPU kernel: fused frame + windowed-DFT matmul + magnitude STFT.

One kernel pass computes what the XLA path does in three ops (gather →
matmul → magnitude).  The host view reshapes the (reflect-padded) audio into
disjoint hop-sized chunks [B, C, hop]; each grid step DMAs its overlapping
chunk window HBM→VMEM (overlap = ratio−1 chunks, not expressible as a
disjoint BlockSpec tiling, hence the manual async copy, 8-aligned in the
sublane dim), then computes

    frames[j] = chunks[j .. j+ratio)          (hop | n_fft ⇒ exact)
    mag = |frames @ windowed_dft_basis|

as `ratio` partial MXU matmuls against basis row-bands — frames are never
materialized, nothing round-trips to HBM.

Matches `audio/stft.py` (and therefore torch.stft, mel_processing.py:40-75)
to f32 precision; the caller does the reflect padding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openvoice_tpu.audio.stft import stft_basis

_FRAMES_PER_BLOCK = 128


def _stft_kernel(
    chunks_ref,  # [B, C_total, hop] in HBM
    basis_ref,   # [n_fft, 2F] VMEM
    out_ref,     # [1, 128, n_freq] VMEM block
    scratch,     # [chunks_per_copy, hop] VMEM
    sem,
    *,
    hop: int,
    n_fft: int,
    n_freq: int,
    chunks_per_copy: int,
):
    b_idx = pl.program_id(0)
    j = pl.program_id(1)
    dma = pltpu.make_async_copy(
        chunks_ref.at[b_idx, pl.ds(j * _FRAMES_PER_BLOCK, chunks_per_copy), :],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    ratio = n_fft // hop
    # frame j = chunks[j..j+ratio) concatenated; instead of materializing the
    # [128, n_fft] frame matrix (Mosaic can't concat sublane-shifted slices),
    # accumulate `ratio` partial matmuls against matching basis row-bands —
    # identical math, each partial feeds the MXU directly.
    proj = jnp.zeros((_FRAMES_PER_BLOCK, 2 * n_freq), jnp.float32)
    for s in range(ratio):
        proj = proj + jnp.dot(
            scratch[s : s + _FRAMES_PER_BLOCK],
            basis_ref[s * hop : (s + 1) * hop, :],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    re = proj[:, :n_freq]
    im = proj[:, n_freq:]
    out_ref[0] = jnp.sqrt(re * re + im * im + 1e-6)


@partial(jax.jit, static_argnames=("n_fft", "hop", "win_length", "interpret"))
def stft_magnitude_pallas(
    padded_audio: jnp.ndarray,
    n_fft: int = 1024,
    hop: int = 256,
    win_length: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, L] pre-reflect-padded audio → [B, n_frames, n_freq] magnitudes.

    Requires hop | n_fft (true for every shipped config: 1024/256).  The
    audio is zero-extended so the last partial block computes garbage frames
    that are sliced off.
    """
    assert n_fft % hop == 0, "pallas STFT requires hop | n_fft"
    assert interpret or hop % 128 == 0, (
        "pallas STFT requires lane-aligned hop (multiple of 128) for the "
        "HBM chunk view; use the XLA matmul path for smaller hops"
    )
    b, length = padded_audio.shape
    n_freq = n_fft // 2 + 1
    ratio = n_fft // hop
    n_frames = (length - n_fft) // hop + 1
    n_blocks = -(-n_frames // _FRAMES_PER_BLOCK)
    # chunks a block needs (129+ratio-1 rounded to sublane multiple of 8)
    chunks_per_copy = -(-(_FRAMES_PER_BLOCK + ratio - 1) // 8) * 8
    total_chunks = (n_blocks - 1) * _FRAMES_PER_BLOCK + chunks_per_copy

    need = total_chunks * hop
    if need > length:
        padded_audio = jnp.pad(padded_audio, ((0, 0), (0, need - length)))
    chunks = padded_audio[:, :need].reshape(b, total_chunks, hop)

    basis = jnp.asarray(stft_basis(n_fft, win_length))  # [n_fft, 2F]

    out = pl.pallas_call(
        partial(
            _stft_kernel, hop=hop, n_fft=n_fft, n_freq=n_freq,
            chunks_per_copy=chunks_per_copy,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_blocks * _FRAMES_PER_BLOCK, n_freq), jnp.float32),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((n_fft, 2 * n_freq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _FRAMES_PER_BLOCK, n_freq),
            lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((chunks_per_copy, hop), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(chunks, basis)
    return out[:, :n_frames]
