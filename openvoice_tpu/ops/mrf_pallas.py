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
* each conv is a sequence of tap-matmuls: `roll(x, -shift) @ W[tap]` with
  static shifts — rolls are VPU lane-ops; the [tile+2H, C]×[C, C] matmuls
  feed the MXU with f32 accumulation.  Circular-roll contamination stays
  inside the halo margin because `halo ≥` the branch chain's receptive field.
* masking between convs (needed for exact bucket-padding semantics — see
  nn/hifigan.py docstring) is rebuilt in-kernel from the true sample length
  and the tile's global offset, so results match the unfused masked path.

Two extensions cover the stages the plain formulation can't serve:

* **Time-folding** (`fold=r`): at C < 128 the MXU pads channels to 128 lanes
  and wastes (128/C)² of the array.  Folding packs r consecutive samples
  into the channel dim — [T, C] → [T/r, r·C] (a plain row-major reshape) —
  and refactors every conv into folded-row tap-matmuls: the tap with sample
  shift `s` contributes W to block (b, a) of the [rC, rC] folded matrix for
  row-shift q, where (q, b) = divmod(a + s, r) for each output phase a.
  The kernel body is unchanged (shift + matmul); only the packed weights,
  shifts, halo, and the (now per-phase) mask differ.  Dilated taps densify
  under folding (a (k,d) conv yields ~((k−1)d/r)+1 folded taps, each r× the
  FLOPs), but full 128-lane MXU tiles more than repay it: measured 7.5×
  at C=32/r=4 and 2.1× at C=64/r=2 over the unfused XLA stage on v5e.
* **Weight streaming** (`stream=True`): at C = 256 the stacked stage weights
  (126 taps × C² × 2B = 16.5 MB bf16) outgrow VMEM.  Weights stay in HBM;
  each branch's slice is DMA'd into a VMEM scratch right before its taps
  run (~10 µs per 8.6 MB vs ~60 µs of branch matmuls — the pipeline hides
  most of it).

Weights arrive as one stacked [n_taps, C', C'] tensor + [n_convs, C']
biases (host-side packing below), keeping the pallas_call signature fixed
across configs.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# stream weights from HBM once the full stacked stage exceeds this
# (VMEM is ~16 MB/core and the kernel also holds the activation tile)
_STREAM_BYTES = 6 * 1024 * 1024


def _tile_rows(c_pad: int) -> int:
    """Rows per grid step (multiple of 8 sublanes).  Wider-than-128-lane
    stages halve the tile: Mosaic's scoped-VMEM stack holds several f32
    [ext, c_pad] temporaries of the unrolled tap-matmul chain, and at
    c_pad=256 the 1024-row tile blows the 16 MB limit."""
    return 1024 if c_pad <= 128 else 512


def stage_halo(kernel_sizes, dilation_sizes) -> int:
    """Max branch receptive-field halo in samples: Σ over conv pairs of
    (k-1)/2·d (dilated conv) + (k-1)/2 (post conv)."""
    h = 0
    for k, dils in zip(kernel_sizes, dilation_sizes):
        h = max(h, sum((k - 1) // 2 * d + (k - 1) // 2 for d in dils))
    return h


def _conv_shifts(k: int, d: int) -> list[int]:
    """Original-domain sample shifts of a (kernel k, dilation d) 'same' conv."""
    return [(j - (k - 1) // 2) * d for j in range(k)]


def _folded_conv(k: int, d: int, fold: int):
    """Folded tap structure of one conv: (q_shifts, placements) where
    placements[i] lists (j, b, a) block assignments for folded tap q_shifts[i]:
    original tap j lands in block rows b·C:(b+1)·C, cols a·C:(a+1)·C."""
    per_q: dict[int, list[tuple[int, int, int]]] = {}
    for a in range(fold):
        for j, s in enumerate(_conv_shifts(k, d)):
            q, b = divmod(a + s, fold)  # floor semantics for negatives
            per_q.setdefault(q, []).append((j, b, a))
    qs = sorted(per_q)
    return qs, [per_q[q] for q in qs]


def stage_meta(kernel_sizes, dilation_sizes, fold: int):
    """Static per-conv folded shift tuples, in kernel execution order
    (per branch: dilated conv, post conv, ×len(dils))."""
    meta = []
    for k, dils in zip(kernel_sizes, dilation_sizes):
        for d in dils:
            for dd in (d, 1):
                qs, _ = _folded_conv(k, dd, fold)
                meta.append(tuple(qs))
    return tuple(meta)


def folded_stage_halo(kernel_sizes, dilation_sizes, fold: int) -> int:
    """Branch-chain halo in folded rows (Σ of each conv's max |q|)."""
    h = 0
    for k, dils in zip(kernel_sizes, dilation_sizes):
        chain = 0
        for d in dils:
            for dd in (d, 1):
                qs, _ = _folded_conv(k, dd, fold)
                chain += max(abs(q) for q in qs)
        h = max(h, chain)
    return h


def branch_tap_ranges(kernel_sizes, dilation_sizes, fold: int):
    """(start, stop) tap indices of each branch in the stacked weights."""
    ranges, start = [], 0
    for k, dils in zip(kernel_sizes, dilation_sizes):
        n = 0
        for d in dils:
            for dd in (d, 1):
                n += len(_folded_conv(k, dd, fold)[0])
        ranges.append((start, start + n))
        start += n
    return tuple(ranges)


def pack_stage_weights(resblocks, kernel_sizes, dilation_sizes,
                       dtype=jnp.bfloat16, fold: int = 1):
    """Stack every conv's (folded) taps/biases in kernel execution order.

    resblocks: list of ResBlock1 param dicts ({"convs1": [...], "convs2":
    [...]}); returns (w_all [n_taps, fold·C, fold·C], b_all [n_convs, fold·C],
    meta) where meta is the static per-conv folded-shift tuple.
    """
    taps, biases, meta = [], [], []
    for rb, k, dils in zip(resblocks, kernel_sizes, dilation_sizes):
        for i, d in enumerate(dils):
            for conv, dd in ((rb["convs1"][i], d), (rb["convs2"][i], 1)):
                w = conv["w"]  # [k, C, C]
                c = w.shape[1]
                qs, placements = _folded_conv(k, dd, fold)
                meta.append(tuple(qs))
                for placed in placements:
                    if fold == 1:
                        (j, _, _), = placed
                        taps.append(w[j].astype(dtype))
                    else:
                        m = jnp.zeros((fold * c, fold * c), dtype)
                        for j, b_ph, a in placed:
                            m = m.at[b_ph * c:(b_ph + 1) * c,
                                     a * c:(a + 1) * c].set(w[j].astype(dtype))
                        taps.append(m)
                biases.append(jnp.tile(conv["b"].astype(dtype), fold))
    return jnp.stack(taps), jnp.stack(biases), tuple(meta)


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
    len_ref,     # [B] int32 in SMEM (scalar prefetch): true sample lengths
    x_ref,       # [B, T_pad + 2H, C'] HBM (pre-padded by H rows each side)
    w_ref,       # [n_taps, C', C'] VMEM — or HBM when streaming
    b_ref,       # [n_convs, C'] VMEM
    out_ref,     # [1, tile, C'] VMEM block
    *scratch,    # xbuf [E, C'], sem (+ wbuf, wsem when streaming)
    tile: int,
    halo: int,
    n_branches: int,
    meta: tuple,
    acc_dtype,
    fold: int,
    c_orig: int,
    stream: bool,
):
    if stream:
        xbuf, sem, wbuf, wsem = scratch
    else:
        xbuf, sem = scratch
    b_idx = pl.program_id(0)
    i = pl.program_id(1)
    ext = tile + 2 * halo
    lanes = xbuf.shape[1]

    dma = pltpu.make_async_copy(
        x_ref.at[b_idx, pl.ds(i * tile, ext), :], xbuf, sem
    )
    dma.start()
    dma.wait()

    # mask from global position: the HBM view is pre-padded by `halo` rows,
    # so folded row index = i*tile + r - halo; sample index = row·fold + phase
    row = jax.lax.broadcasted_iota(jnp.int32, (ext, 1), 0) + i * tile - halo
    if fold == 1:
        pos = row
        mask = ((pos >= 0) & (pos < len_ref[b_idx])).astype(xbuf.dtype)
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (ext, lanes), 1)
        pos = row * fold + lane // c_orig
        mask = (
            (pos >= 0) & (pos < len_ref[b_idx]) & (lane < fold * c_orig)
        ).astype(xbuf.dtype)

    x0 = xbuf[:] * mask
    convs_per_branch = len(meta) // n_branches
    acc = jnp.zeros((ext, lanes), jnp.float32)
    conv_idx = 0
    tap = 0

    def conv(xt, tap0, shifts):
        # accumulating tap-matmuls.  (A lane-concat variant — [E, k·C] ×
        # [k·C, C] in one matmul — was tried and abandoned: Mosaic takes
        # 20+ min to compile the wide concats at production shapes, an
        # unacceptable per-bucket serving cost.)
        if stream:
            # per-conv weight slice HBM→VMEM (whole-stage stacks > VMEM)
            n = len(shifts)
            wdma = pltpu.make_async_copy(
                w_ref.at[pl.ds(tap0, n)], wbuf.at[pl.ds(0, n)], wsem
            )
            wdma.start()
            wdma.wait()
            weights, base = wbuf, 0
        else:
            weights, base = w_ref, tap0
        y = jnp.zeros((ext, xt.shape[1]), jnp.float32)
        for off, s in enumerate(shifts):
            y = y + jnp.dot(
                _shift(xt, s, ext), weights[base + off],
                preferred_element_type=jnp.float32,
            )
        return y

    # masking order mirrors apply_resblock1 exactly: lrelu → ·mask → conv
    # for both convs of each pair, residual add, branch output ·mask
    for br in range(n_branches):
        xb = x0
        for _pair in range(convs_per_branch // 2):
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
    out_ref[0] = out[halo: halo + tile]


@partial(jax.jit, static_argnames=("kernel_sizes", "dilation_sizes", "fold", "interpret"))
def fused_mrf_stage(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    w_all: jnp.ndarray,
    b_all: jnp.ndarray,
    *,
    kernel_sizes: tuple,
    dilation_sizes: tuple,
    fold: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: [B, T, C] → mean of ResBlock1 branches, [B, T, C].

    lengths: [B] true sample counts at this stage's rate (masking semantics
    of nn/hifigan.py).  w_all/b_all must be packed with the same `fold`
    (pack_stage_weights).  fold=r packs r samples into the lane dim —
    use r = 128//C for C < 128; weights larger than ~6 MB are streamed
    from HBM per branch automatically.
    """
    b, t, c = x.shape
    if fold > 1:
        # row-major reshape = pack r consecutive samples into the lane dim
        t_f = -(-t // fold) * fold
        if t_f != t:
            x = jnp.pad(x, ((0, 0), (0, t_f - t), (0, 0)))
        x = x.reshape(b, t_f // fold, fold * c)
    bb, tr, cf = x.shape

    halo = folded_stage_halo(kernel_sizes, dilation_sizes, fold) if fold > 1 \
        else stage_halo(kernel_sizes, dilation_sizes)
    # the [i·tile, i·tile + tile + 2·halo) DMA slice must be 8-sublane
    # aligned: tile already is, so halo must be a multiple of 4
    halo = -(-halo // 4) * 4
    # lane alignment: HBM slices and the MXU both want 128-wide lanes;
    # padded lanes stay exactly zero through the whole stage (zero
    # weights/bias → lrelu(0)=0 → residual 0; the in-kernel mask also
    # zeroes them), so results are unaffected
    c_pad = -(-cf // 128) * 128
    tile = _tile_rows(c_pad)
    n_tiles = -(-tr // tile)
    t_pad = n_tiles * tile
    if c_pad != cf:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, c_pad - cf)))
        w_all = jnp.pad(w_all, ((0, 0), (0, c_pad - cf), (0, c_pad - cf)))
        b_all = jnp.pad(b_all, ((0, 0), (0, c_pad - cf)))
    x_hbm = jnp.pad(x, ((0, 0), (halo, halo + (t_pad - tr)), (0, 0)))

    meta = stage_meta(kernel_sizes, dilation_sizes, fold)
    stream = w_all.size * w_all.dtype.itemsize > _STREAM_BYTES
    max_conv_taps = max(len(m) for m in meta)

    scratch = [
        pltpu.VMEM((tile + 2 * halo, c_pad), x.dtype),
        pltpu.SemaphoreType.DMA,
    ]
    if stream:
        scratch += [
            pltpu.VMEM((max_conv_taps, c_pad, c_pad), w_all.dtype),
            pltpu.SemaphoreType.DMA,
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bb, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            # streamed weights must be pinned to HBM — ANY lets the compiler
            # "helpfully" stage the full 16.5 MB stack in VMEM, which OOMs
            pl.BlockSpec(memory_space=pltpu.HBM if stream else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, c_pad), lambda i, j, len_ref: (i, j, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        partial(
            _mrf_kernel,
            tile=tile,
            halo=halo,
            n_branches=len(kernel_sizes),
            meta=meta,
            acc_dtype=x.dtype,
            fold=fold,
            c_orig=c,
            stream=stream,
        ),
        out_shape=jax.ShapeDtypeStruct((bb, t_pad, c_pad), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(lengths.astype(jnp.int32), x_hbm, w_all, b_all)
    out = out[:, :tr, :cf]
    if fold > 1:
        out = out.reshape(b, tr * fold, c)
    return out[:, :t, :]
