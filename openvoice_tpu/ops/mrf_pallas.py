"""Pallas TPU kernel: fused multi-receptive-field ResBlock stage.

One HiFi-GAN upsample stage runs `num_kernels` ResBlock1 branches (3
dilated+post conv pairs each — 18 convs for the shipped (3,7,11)×(1,3,5)
config) and averages them (models.py:280-286).  The XLA path issues 18
separate convolutions, each streaming the full [T, C] activation through
HBM (T up to 229k samples at audio rate); at C ≤ 128 these are
bandwidth/overhead-bound, not MXU-bound.

This kernel processes the whole stage per VMEM-resident time tile:

* the tile (+`halo` on each side) is DMA'd HBM→VMEM once; all 18 convs and
  every leaky-relu/residual run on the resident tile; only the averaged
  result is written back — 1 read + 1 write of the activation instead of ~37.
* each conv is `k` tap-matmuls: `roll(x, -shift) @ W[tap]` with static
  shifts — rolls are VPU lane-ops; the [tile+2H, C]×[C, C] matmuls feed the
  MXU with f32 accumulation.  Circular-roll contamination stays inside the
  halo margin because `halo ≥` the branch chain's receptive field
  (Σ (k-1)/2·(d_i+1) = 60 for k=11, dils (1,3,5)).
* masking between convs (needed for exact bucket-padding semantics — see
  nn/hifigan.py docstring) is rebuilt in-kernel from the true sample length
  and the tile's global offset, so results match the unfused masked path.

Weights arrive as one stacked [n_taps, C, C] tensor + [n_convs, C] biases
(host-side packing below), keeping the pallas_call signature fixed across
configs.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 1024  # frames per grid step (multiple of 8 sublanes)


def stage_halo(kernel_sizes, dilation_sizes) -> int:
    """Max branch receptive-field halo: Σ over conv pairs of
    (k-1)/2·d (dilated conv) + (k-1)/2 (post conv)."""
    h = 0
    for k, dils in zip(kernel_sizes, dilation_sizes):
        h = max(h, sum((k - 1) // 2 * d + (k - 1) // 2 for d in dils))
    return h


def pack_stage_weights(resblocks, kernel_sizes, dilation_sizes, dtype=jnp.bfloat16):
    """Stack every conv's taps/biases in kernel execution order.

    resblocks: list of ResBlock1 param dicts ({"convs1": [...], "convs2":
    [...]}); returns (w_all [n_taps, C, C], b_all [n_convs, C], meta) where
    meta is a static list of (k, shift_list) per conv.
    """
    taps, biases, meta = [], [], []
    for rb, k, dils in zip(resblocks, kernel_sizes, dilation_sizes):
        for i, d in enumerate(dils):
            for conv, dil in ((rb["convs1"][i], d), (rb["convs2"][i], 1)):
                w = conv["w"]  # [k, C, C]
                shifts = [(j - (k - 1) // 2) * dil for j in range(k)]
                meta.append(tuple(shifts))
                for j in range(k):
                    taps.append(w[j])
                biases.append(conv["b"])
    w_all = jnp.stack(taps).astype(dtype)
    b_all = jnp.stack(biases).astype(dtype)
    return w_all, b_all, tuple(meta)


def _lrelu(x, slope=0.1):
    # max/min formulation — the VPU lacks bf16 compares ("target does not
    # support this comparison"), but bf16 max/min lower fine
    return jnp.maximum(x, 0) + jnp.minimum(x, 0) * jnp.asarray(slope, x.dtype)


def _shift(x, s: int, ext: int):
    """rows shifted so result[t] = x[t + s]; pltpu.roll requires a
    non-negative shift, so negative s rolls by ext - |s| (same circle).
    Mosaic's rotate only handles 32-bit lanes — bf16 round-trips through
    f32 for the roll (VPU casts, cheap next to the tap matmuls)."""
    if s == 0:
        return x
    if x.dtype == jnp.bfloat16:
        return pltpu.roll(x.astype(jnp.float32), (-s) % ext, 0).astype(jnp.bfloat16)
    return pltpu.roll(x, (-s) % ext, 0)


def _mrf_kernel(
    len_ref,     # [1] int32 in SMEM (scalar prefetch): true sample length
    x_ref,       # [B, T_pad + 2H, C] HBM (pre-padded by H zeros each side)
    w_ref,       # [n_taps, C, C] VMEM
    b_ref,       # [n_convs, C] VMEM
    out_ref,     # [1, _TILE, C] VMEM block
    xbuf,        # [E, C] VMEM scratch, E = _TILE + 2H
    sem,
    *,
    halo: int,
    n_branches: int,
    meta: tuple,
    acc_dtype,
):
    b_idx = pl.program_id(0)
    i = pl.program_id(1)
    ext = _TILE + 2 * halo

    dma = pltpu.make_async_copy(
        x_ref.at[b_idx, pl.ds(i * _TILE, ext), :], xbuf, sem
    )
    dma.start()
    dma.wait()

    # mask from global position: row r ↔ sample i*_TILE - halo + r... but the
    # HBM view is pre-padded by `halo`, so sample index = i*_TILE + r - halo
    pos = jax.lax.broadcasted_iota(jnp.int32, (ext, 1), 0) + i * _TILE - halo
    mask = ((pos >= 0) & (pos < len_ref[b_idx])).astype(xbuf.dtype)

    x0 = xbuf[:] * mask
    convs_per_branch = len(meta) // n_branches
    acc = jnp.zeros((ext, out_ref.shape[2]), jnp.float32)
    tap = 0
    conv_idx = 0

    def conv(xt, tap0, shifts):
        # k accumulating tap-matmuls.  (A lane-concat variant — [E, k·C] ×
        # [k·C, C] in one matmul — was tried and abandoned: Mosaic takes
        # 20+ min to compile the wide concats at production shapes, an
        # unacceptable per-bucket serving cost.)
        y = jnp.zeros((ext, xt.shape[1]), jnp.float32)
        for off, s in enumerate(shifts):
            y = y + jnp.dot(
                _shift(xt, s, ext), w_ref[tap0 + off],
                preferred_element_type=jnp.float32,
            )
        return y

    # masking order mirrors apply_resblock1 exactly: lrelu → ·mask → conv
    # for both convs of each pair, residual add, branch output ·mask
    for br in range(n_branches):
        xb = x0
        for pair in range(convs_per_branch // 2):
            xt = _lrelu(xb) * mask
            y = conv(xt, tap, meta[conv_idx])
            tap += len(meta[conv_idx])
            xt = _lrelu((y + b_ref[conv_idx]).astype(xb.dtype)) * mask
            conv_idx += 1
            y2 = conv(xt, tap, meta[conv_idx])
            tap += len(meta[conv_idx])
            xb = xb + (y2 + b_ref[conv_idx]).astype(xb.dtype)
            conv_idx += 1
        acc = acc + (xb * mask).astype(jnp.float32)
    out = (acc / n_branches).astype(acc_dtype)
    out_ref[0] = out[halo : halo + _TILE]


@partial(jax.jit, static_argnames=("kernel_sizes", "dilation_sizes", "interpret"))
def fused_mrf_stage(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    w_all: jnp.ndarray,
    b_all: jnp.ndarray,
    *,
    kernel_sizes: tuple,
    dilation_sizes: tuple,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: [B, T, C] → mean of ResBlock1 branches, [B, T, C].

    lengths: [B] true sample counts at this stage's rate (masking semantics
    of nn/hifigan.py).  C must be lane-aligned-able (≤128 recommended); T is
    padded to a tile multiple internally.
    """
    b, t, c = x.shape
    halo = stage_halo(kernel_sizes, dilation_sizes)
    n_tiles = -(-t // _TILE)
    t_pad = n_tiles * _TILE
    # lane alignment: HBM slices and the MXU both want 128-wide channels;
    # padded channels stay exactly zero through the whole stage (zero
    # weights/bias → lrelu(0)=0 → residual 0), so results are unaffected
    c_pad = -(-c // 128) * 128
    if c_pad != c:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, c_pad - c)))
        w_all = jnp.pad(w_all, ((0, 0), (0, c_pad - c), (0, c_pad - c)))
        b_all = jnp.pad(b_all, ((0, 0), (0, c_pad - c)))
    x_hbm = jnp.pad(x, ((0, 0), (halo, halo + (t_pad - t)), (0, 0)))

    meta = []
    for k, dils in zip(kernel_sizes, dilation_sizes):
        for d in dils:
            meta.append(tuple((j - (k - 1) // 2) * d for j in range(k)))
            meta.append(tuple(j - (k - 1) // 2 for j in range(k)))
    meta = tuple(meta)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _TILE, c_pad), lambda i, j, len_ref: (i, j, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((_TILE + 2 * halo, c_pad), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        partial(
            _mrf_kernel,
            halo=halo,
            n_branches=len(kernel_sizes),
            meta=meta,
            acc_dtype=x.dtype,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c_pad), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(lengths.astype(jnp.int32), x_hbm, w_all, b_all)
    return out[:, :t, :c]
