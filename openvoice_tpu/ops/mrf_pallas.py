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
  (126 taps × C² × 2B = 16.5 MB bf16) outgrow VMEM.  Weights stay in HBM and
  each conv's tap slice is DMA'd into one of two VMEM scratch slots,
  double-buffered: conv i+1's copy is started before conv i's matmuls are
  waited on, so the ~2 µs-per-conv DMA latency (×18 convs ×n_tiles, ~0.4 ms
  per utterance when serialized) hides under the tap-matmuls.  In-order
  instruction issue makes the overwrite safe: slot s is re-filled two convs
  after its last matmul read was issued.

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


# Experiment hook: {c_pad: rows}.  NOTE: fused_mrf_stage/fused_tail_stage are
# jitted and bake the tile in at trace time — mutating this after a shape has
# been traced has no effect.  Clear jax caches (jax.clear_caches()) or use a
# fresh process between A/B runs.
_TILE_OVERRIDE: dict | None = None


def _tile_rows(c_pad: int, kind: str = "mrf") -> int:
    """Rows per grid step (multiple of 8 sublanes).  Retuned 2026-08-20 with
    interleaved A/B medians (the measurement tunnel's per-run spread is
    ±40%, so single runs are not comparable):

    * C=256 streamed MRF: 512 → 1024 rows (0.98 → 0.86 ms on the s0 shape) —
      fewer tiles halves the per-tile re-streaming of the 16.5 MB stage
      weights and the 60-row halo recompute; the old VMEM concern predates
      the slack-buffer static-slice refactor.
    * tail/upmrf kernels: 1024 → 1536 rows (s2 1.86 → 1.67 ms, s3 1.33 →
      1.19 ms); their weights are VMEM-resident so the win is halo
      amortization plus longer matmul chains between block switches.
      2048 regresses (VMEM pressure degrades in/out block pipelining).
    * 128-lane MRF: 1024 stays (1536/2048 within noise or worse)."""
    if _TILE_OVERRIDE and c_pad in _TILE_OVERRIDE:
        return _TILE_OVERRIDE[c_pad]
    return 1536 if kind == "tail" else 1024


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
                       dtype=jnp.bfloat16, fold: int = 1, host: bool = False):
    """Stack every conv's (folded) taps/biases in kernel execution order.

    resblocks: list of ResBlock1 param dicts ({"convs1": [...], "convs2":
    [...]}); returns (w_all [n_taps, fold·C, fold·C], b_all [n_convs, fold·C],
    meta) where meta is the static per-conv folded-shift tuple.

    host=True builds with numpy (device→host pull + plain slice assignment):
    use for one-time cache packing at model load — the jnp variant emits
    hundreds of scatter ops and is only for packing inside a traced graph.
    """
    xp = np if host else jnp
    cvt = (lambda a: np.asarray(jax.device_get(a))) if host else (lambda a: a)
    taps, biases, meta = [], [], []
    for rb, k, dils in zip(resblocks, kernel_sizes, dilation_sizes):
        for i, d in enumerate(dils):
            for conv, dd in ((rb["convs1"][i], d), (rb["convs2"][i], 1)):
                w = cvt(conv["w"])  # [k, C, C]
                c = w.shape[1]
                qs, placements = _folded_conv(k, dd, fold)
                meta.append(tuple(qs))
                for placed in placements:
                    if fold == 1:
                        (j, _, _), = placed
                        taps.append(xp.asarray(w[j], dtype))
                    else:
                        m = xp.zeros((fold * c, fold * c), dtype)
                        for j, b_ph, a in placed:
                            block = xp.asarray(w[j], dtype)
                            if host:
                                m[b_ph * c:(b_ph + 1) * c, a * c:(a + 1) * c] = block
                            else:
                                m = m.at[b_ph * c:(b_ph + 1) * c,
                                         a * c:(a + 1) * c].set(block)
                        taps.append(m)
                biases.append(xp.tile(xp.asarray(cvt(conv["b"]), dtype), fold))
    if host:
        return jnp.asarray(np.stack(taps)), jnp.asarray(np.stack(biases)), tuple(meta)
    return jnp.stack(taps), jnp.stack(biases), tuple(meta)


def fold_transpose_taps(k: int, u: int, padding: int, fold_in: int):
    """Folded tap structure of a ConvTranspose1d (kernel k, stride u, torch
    `padding`) from a fold_in input layout to a fold_out = fold_in·u output
    layout.  Requires k - u - 2·padding == 0 (the shipped HiFi-GAN configs),
    so output rows map 1:1 to input rows.  Returns (qs, placements) where
    placements[i] lists (j, b, a): original kernel tap j lands in block rows
    b·C_in:(b+1)·C_in, cols a·C_out:(a+1)·C_out of folded tap q = qs[i]."""
    from openvoice_tpu.nn.conv import _transpose_phase_groups

    assert k - u - 2 * padding == 0, "tail fusion needs out_len == T·u configs"
    groups = _transpose_phase_groups(k, u, k - 1 - padding)
    fold_out = fold_in * u
    per_q: dict[int, list[tuple[int, int, int]]] = {}
    for a in range(fold_out):
        p_req, t_off = a % u, a // u
        for delta, pairs in groups.items():
            for p, j in pairs:
                if p != p_req:
                    continue
                q, b = divmod(t_off + delta, fold_in)
                per_q.setdefault(q, []).append((j, b, a))
    qs = sorted(per_q)
    return qs, [per_q[q] for q in qs]


def fold_post_taps(k: int, fold: int):
    """Folded tap structure of the final 'same' conv (C→1, kernel k): tap j
    at output phase a reads folded row q, phase b, with
    (q, b) = divmod(a + j - (k-1)//2, fold).  Returns (qs, placements) with
    placements[i] = [(j, b, a), ...]: w[j,:,0] lands in rows b·C:(b+1)·C,
    column a."""
    c0 = (k - 1) // 2
    per_q: dict[int, list[tuple[int, int, int]]] = {}
    for a in range(fold):
        for j in range(k):
            q, b = divmod(a + j - c0, fold)
            per_q.setdefault(q, []).append((j, b, a))
    qs = sorted(per_q)
    return qs, [per_q[q] for q in qs]


def pack_tail_weights(
    up: dict,
    resblocks,
    post_w,
    kernel_sizes,
    dilation_sizes,
    *,
    stride: int,
    up_padding: int,
    fold: int,
    dtype=jnp.bfloat16,
    host: bool = False,
):
    """Stack the whole decoder tail — transposed-conv upsample, MRF
    resblocks (folded by `fold`), final conv — as [n_taps, 128, 128]
    matrices in kernel execution order, plus [1 + n_convs, 128] biases
    (row 0 = upsample bias, tiled).

    up: {"w": [k_up, C_in, C_out], "b": [C_out]} pre-flipped ConvTranspose1d
    params (ckpt/torch_import.py layout); post_w: [k_post, C_out, 1], or
    None for a middle-stage up+MRF fusion (no final conv — post_qs returns
    None).  Returns (w_all, b_all, up_qs, mrf_meta, post_qs).

    host=True: numpy packing for one-time cache building (see
    pack_stage_weights).
    """
    k_up, c_in, c_out = up["w"].shape
    fold_in = fold // stride
    lanes = fold * c_out
    assert fold_in * c_in == lanes, "input and output layouts must both fill the lanes"
    xp = np if host else jnp
    cvt = (lambda a: np.asarray(jax.device_get(a))) if host else (lambda a: a)

    def place(placed, block_of):
        m = xp.zeros((lanes, lanes), dtype)
        for j, b_ph, a in placed:
            rs, re, cs, ce, val = block_of(j, b_ph, a)
            if host:
                m[rs:re, cs:ce] = np.asarray(val, dtype)
            else:
                m = m.at[rs:re, cs:ce].set(val.astype(dtype))
        return m

    up_w = cvt(up["w"])
    taps = []
    up_qs, placements = fold_transpose_taps(k_up, stride, up_padding, fold_in)
    for placed in placements:
        taps.append(place(
            placed,
            lambda j, b_ph, a: (b_ph * c_in, (b_ph + 1) * c_in,
                                a * c_out, (a + 1) * c_out, up_w[j]),
        ))

    w_mrf, b_mrf, mrf_meta = pack_stage_weights(
        resblocks, kernel_sizes, dilation_sizes, dtype=dtype, fold=fold, host=host
    )
    w_mrf_list = list(cvt(w_mrf)) if host else list(w_mrf)
    taps.extend(w_mrf_list)

    post_qs = None
    if post_w is not None:
        post_h = cvt(post_w)  # [k_post, C_out, 1]
        post_qs, placements = fold_post_taps(post_h.shape[0], fold)
        for placed in placements:
            taps.append(place(
                placed,
                lambda j, b_ph, a: (b_ph * c_out, (b_ph + 1) * c_out,
                                    a, a + 1, post_h[j, :, :1]),
            ))

    up_b = xp.tile(xp.asarray(cvt(up["b"]), dtype), fold)[None]
    if host:
        b_all = jnp.asarray(np.concatenate([up_b, cvt(b_mrf)], axis=0))
        w_all = jnp.asarray(np.stack(taps))
    else:
        b_all = jnp.concatenate([up_b, b_mrf], axis=0)
        w_all = jnp.stack(taps)
    return w_all, b_all, tuple(up_qs), mrf_meta, (
        tuple(post_qs) if post_qs is not None else None
    )


def _lrelu(x, slope=0.1):
    # max/min formulation — the VPU lacks bf16 compares ("target does not
    # support this comparison"), but bf16 max/min lower fine
    return jnp.maximum(x, 0) + jnp.minimum(x, 0) * jnp.asarray(slope, x.dtype)


def _run_branches(x0, mask, meta, n_branches, conv, bias, interleave: bool):
    """The MRF branch chains shared by both kernels.  conv(xt, ci, br) issues
    conv ci's tap-matmuls off branch br's slack buffer and returns the f32
    accumulator; bias(ci) returns the conv's bias row.

    interleave=False runs each branch's chain to completion in turn (the
    per-conv VPU epilogue — lrelu ×2, mask, bias-add, cast ≈ 7 VPU passes on
    the [ext, 128] tile — is then serialized with that same branch's next
    tap-matmuls, because each conv feeds the next).

    interleave=True issues the independent branch chains round-robin
    (b0c0, b1c0, b2c0, b0c1, …): branch i's epilogue has no data dependence
    on branch j's matmuls, so with per-branch slack buffers the VPU epilogue
    dual-issues under the other branches' MXU work.  Per-branch float ops and
    the final (b0 + b1) + b2 accumulation order are identical to the
    sequential path, so results are bit-identical.
    """
    convs_per_branch = len(meta) // n_branches
    dt = x0.dtype
    if not interleave:
        acc = jnp.zeros(x0.shape, jnp.float32)
        ci = 0
        for br in range(n_branches):
            xb = x0
            for _pair in range(convs_per_branch // 2):
                xt = _lrelu(xb) * mask
                y = conv(xt, ci, br)
                xt = _lrelu((y + bias(ci)).astype(dt)) * mask
                ci += 1
                y2 = conv(xt, ci, br)
                xb = xb + (y2 + bias(ci)).astype(dt)
                ci += 1
            acc = acc + (xb * mask).astype(jnp.float32)
        return acc / n_branches
    xb = [x0] * n_branches
    for pair in range(convs_per_branch // 2):
        cis = [br * convs_per_branch + 2 * pair for br in range(n_branches)]
        ys = [
            conv(_lrelu(xb[br]) * mask, cis[br], br) for br in range(n_branches)
        ]
        y2s = [
            conv(_lrelu((ys[br] + bias(cis[br])).astype(dt)) * mask,
                 cis[br] + 1, br)
            for br in range(n_branches)
        ]
        xb = [
            xb[br] + (y2s[br] + bias(cis[br] + 1)).astype(dt)
            for br in range(n_branches)
        ]
    acc = jnp.zeros(x0.shape, jnp.float32)
    for br in range(n_branches):
        acc = acc + (xb[br] * mask).astype(jnp.float32)
    return acc / n_branches


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
    interleave: bool,
    n_slack: int,
):
    if stream:
        xbuf, *xsls, sem, wbuf, wsem = scratch
    else:
        xbuf, *xsls, sem = scratch
    assert len(xsls) == n_slack
    b_idx = pl.program_id(0)
    i = pl.program_id(1)
    ext = tile + 2 * halo
    lanes = xbuf.shape[1]

    # zero the slack margins once per tile: tap slices read them as the
    # 'same'-conv zero padding (contamination stays inside the halo margin,
    # same argument as the roll formulation this replaces).  One SEPARATE
    # slack buffer per interleaved branch — separate memrefs, so Mosaic's
    # dependency analysis can't alias branch i's store with branch j's loads.
    for xsl in xsls:
        xsl[:halo, :] = jnp.zeros((halo, lanes), xsl.dtype)
        xsl[halo + ext:, :] = jnp.zeros((halo, lanes), xsl.dtype)

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

    # static (tap0, n_taps) range of each conv in the stacked weights
    ranges = []
    t0 = 0
    for shifts in meta:
        ranges.append((t0, len(shifts)))
        t0 += len(shifts)

    # conv EXECUTION order: ascending sequentially; round-robin over the
    # branch chains when interleaving (must match _run_branches)
    if interleave:
        cpb = len(meta) // n_branches
        # _run_branches issues all three first-convs of a pair, THEN the
        # three second-convs: b0c0 b1c0 b2c0 b0c1 b1c1 b2c1 …
        exec_order = [
            br * cpb + 2 * pair + half
            for pair in range(cpb // 2)
            for half in (0, 1)
            for br in range(n_branches)
        ]
    else:
        exec_order = list(range(len(meta)))
    exec_pos = {ci: k for k, ci in enumerate(exec_order)}

    def w_dma(slot: int, k: int):
        tap0, n = ranges[exec_order[k]]
        return pltpu.make_async_copy(
            w_ref.at[pl.ds(tap0, n)], wbuf.at[slot, pl.ds(0, n)], wsem.at[slot]
        )

    n_slots = wbuf.shape[0] if stream else 0
    if stream:
        for ahead in range(min(n_slots - 1, len(meta))):
            w_dma(ahead % n_slots, ahead).start()

    def conv(xt, ci, br):
        # accumulating tap-matmuls off the slack buffer: one store of xt,
        # then per-tap STATIC slices — cheaper than per-tap rolls, which
        # also round-trip bf16 through f32.  (A lane-concat variant —
        # [E, k·C] × [k·C, C] in one matmul — was tried and abandoned:
        # Mosaic takes 20+ min to compile the wide concats at production
        # shapes, an unacceptable per-bucket serving cost.)
        if stream:
            # multi-buffered per-conv weight slices HBM→VMEM: n_slots-1 convs
            # are prefetched ahead IN EXECUTION ORDER; slot s is refilled
            # only after its previous reader's matmuls were issued
            # (in-order), so no race.
            k = exec_pos[ci]
            if k + n_slots - 1 < len(meta):
                w_dma((k + n_slots - 1) % n_slots, k + n_slots - 1).start()
            w_dma(k % n_slots, k).wait()
            weights, base = wbuf.at[k % n_slots], 0
        else:
            weights, base = w_ref, ranges[ci][0]
        xsl = xsls[br if interleave else 0]
        xsl[halo: halo + ext, :] = xt
        y = jnp.zeros((ext, xt.shape[1]), jnp.float32)
        for off, s in enumerate(meta[ci]):
            y = y + jnp.dot(
                xsl[halo + s: halo + s + ext, :], weights[base + off],
                preferred_element_type=jnp.float32,
            )
        return y

    # masking order mirrors apply_resblock1 exactly: lrelu → ·mask → conv
    # for both convs of each pair, residual add, branch output ·mask
    out = _run_branches(
        x0, mask, meta, n_branches, conv, lambda ci: b_ref[ci], interleave
    ).astype(acc_dtype)
    out_ref[0] = out[halo: halo + tile]


@partial(jax.jit, static_argnames=(
    "kernel_sizes", "dilation_sizes", "fold", "interleave", "interpret"
))
def fused_mrf_stage(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    w_all: jnp.ndarray,
    b_all: jnp.ndarray,
    *,
    kernel_sizes: tuple,
    dilation_sizes: tuple,
    fold: int = 1,
    interleave: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: [B, T, C] → mean of ResBlock1 branches, [B, T, C].

    lengths: [B] true sample counts at this stage's rate (masking semantics
    of nn/hifigan.py).  w_all/b_all must be packed with the same `fold`
    (pack_stage_weights).  fold=r packs r samples into the lane dim —
    use r = 128//C for C < 128; weights larger than ~6 MB are streamed
    from HBM per branch automatically.

    interleave=None auto-selects: branch chains are issued round-robin
    (see _run_branches) when the stage runs at exactly 128 lanes with
    VMEM-resident weights — the n_branches slack buffers cost ~1 MB VMEM
    at 128 lanes, which the streamed C=256 stage doesn't have.
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
    n_branches = len(kernel_sizes)
    if interleave is None:
        # 128-lane resident stages interleave.  The streamed C=256 stage was
        # TRIED with interleaved prefetch (r3, bench_interleave.py: 0.947 →
        # 1.013 ms, a 6.5% REGRESSION — the extra slack buffers cost VMEM
        # that the double-buffered weight slots need) and stays sequential.
        interleave = (not stream) and c_pad == 128 and n_branches > 1
    interleave = interleave and n_branches > 1
    n_slack = n_branches if interleave else 1

    scratch = [
        pltpu.VMEM((tile + 2 * halo, c_pad), x.dtype),
        # one slack buffer per interleaved branch, as SEPARATE memrefs
        *[pltpu.VMEM((tile + 4 * halo, c_pad), x.dtype) for _ in range(n_slack)],
        pltpu.SemaphoreType.DMA,
    ]
    if stream:
        scratch += [
            pltpu.VMEM((3, max_conv_taps, c_pad, c_pad), w_all.dtype),
            pltpu.SemaphoreType.DMA((3,)),
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
            n_branches=n_branches,
            meta=meta,
            acc_dtype=x.dtype,
            fold=fold,
            c_orig=c,
            stream=stream,
            interleave=interleave,
            n_slack=n_slack,
        ),
        out_shape=jax.ShapeDtypeStruct((bb, t_pad, c_pad), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(lengths.astype(jnp.int32), x_hbm, w_all, b_all)
    out = out[:, :tr, :cf]
    if fold > 1:
        out = out.reshape(b, tr * fold, c)
    return out[:, :t, :]


def _tail_kernel(
    len_ref,     # [B] int32 in SMEM: true OUTPUT sample lengths
    x_ref,       # [B, rows_pad + 2H, 128] HBM, fold_in layout of the up input
    w_ref,       # [n_taps, 128, 128] VMEM: up taps, mrf taps, post taps
    b_ref,       # [1 + n_convs, 128] VMEM: row 0 = up bias (tiled)
    out_ref,     # [1, tile, fold] VMEM block: folded audio samples
    *scratch,    # xbuf, n_slack slack buffers, sem
    tile: int,
    halo: int,
    n_branches: int,
    up_qs: tuple,
    meta: tuple,
    post_qs: tuple,
    stride: int,
    fold: int,
    c_orig: int,
    acc_dtype,
    interleave: bool,
):
    """Fused decoder tail: lrelu → ConvTranspose1d upsample → MRF resblocks
    → lrelu(0.01) → final conv → tanh, all on one VMEM-resident tile.  The
    up input (fold/stride × stride·c_orig) and the MRF stage
    (fold × c_orig) both fill exactly 128 lanes with output rows mapping
    1:1 to input rows, so every op is a shifted tap-matmul."""
    xbuf, *xsls, sem = scratch
    b_idx = pl.program_id(0)
    i = pl.program_id(1)
    ext = tile + 2 * halo
    lanes = xbuf.shape[1]
    fold_in = fold // stride
    c_in = lanes // fold_in

    dma = pltpu.make_async_copy(x_ref.at[b_idx, pl.ds(i * tile, ext), :], xbuf, sem)
    dma.start()
    dma.wait()

    # slack margins = the 'same'-conv zero padding for the static tap slices
    # (one SEPARATE buffer per interleaved branch — separate memrefs keep
    # Mosaic from aliasing branch i's store with branch j's loads; the
    # upsample and post convs use buffer 0)
    for xsl in xsls:
        xsl[:halo, :] = jnp.zeros((halo, lanes), xsl.dtype)
        xsl[halo + ext:, :] = jnp.zeros((halo, lanes), xsl.dtype)

    row = jax.lax.broadcasted_iota(jnp.int32, (ext, 1), 0) + i * tile - halo
    lane = jax.lax.broadcasted_iota(jnp.int32, (ext, lanes), 1)
    len_out = len_ref[b_idx]
    pos_in = row * fold_in + lane // c_in
    mask_in = ((pos_in >= 0) & (pos_in < len_out // stride)).astype(xbuf.dtype)
    pos = row * fold + lane // c_orig
    mask = ((pos >= 0) & (pos < len_out)).astype(xbuf.dtype)

    ranges = []
    t0 = 0
    tap_counts = [len(up_qs)] + [len(m) for m in meta]
    if post_qs is not None:
        tap_counts.append(len(post_qs))
    for n in tap_counts:
        ranges.append((t0, n))
        t0 += n

    def taps(xt, ci, qs, sb=0):
        tap0 = ranges[ci][0]
        xsl = xsls[sb]
        xsl[halo: halo + ext, :] = xt
        y = jnp.zeros((ext, lanes), jnp.float32)
        for off, q in enumerate(qs):
            y = y + jnp.dot(
                xsl[halo + q: halo + q + ext, :], w_ref[tap0 + off],
                preferred_element_type=jnp.float32,
            )
        return y

    # upsample: lrelu on the (already masked) input, phase tap-matmuls, bias
    xin = _lrelu(xbuf[:]) * mask_in
    x0 = ((taps(xin, 0, up_qs) + b_ref[0]).astype(xbuf.dtype)) * mask

    mrf = _run_branches(
        x0, mask, meta, n_branches,
        lambda xt, ci, br: taps(xt, 1 + ci, meta[ci], br if interleave else 0),
        lambda ci: b_ref[1 + ci],
        interleave,
    )
    n_convs = len(meta)

    if post_qs is None:
        # up+MRF fusion for a middle stage: emit the folded MRF mean
        out_ref[0] = mrf.astype(acc_dtype)[halo: halo + tile]
        return
    # final activation uses torch's default slope 0.01 (models.py:287), then
    # the bias-free conv_post and tanh (models.py:288-291)
    ym = _lrelu(mrf.astype(xbuf.dtype), slope=0.01)
    audio = jnp.tanh(taps(ym, 1 + n_convs, post_qs))
    out_ref[0] = audio[halo: halo + tile, : out_ref.shape[-1]].astype(acc_dtype)


@partial(jax.jit, static_argnames=(
    "kernel_sizes", "dilation_sizes", "stride", "fold", "up_qs", "mrf_meta",
    "post_qs", "interleave", "interpret",
))
def fused_tail_stage(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    w_all: jnp.ndarray,
    b_all: jnp.ndarray,
    *,
    kernel_sizes: tuple,
    dilation_sizes: tuple,
    stride: int,
    fold: int,
    up_qs: tuple,
    mrf_meta: tuple,
    post_qs: tuple | None,
    interleave: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused decoder tail.  x: [B, T_in, C_in] input of an upsample stage
    (after the previous MRF stage); lengths: [B] true OUTPUT sample counts
    (= input lengths · stride).

    post_qs set (last stage): lrelu → ConvTranspose1d → MRF → lrelu(0.01) →
    conv_post → tanh — returns [B, T_in·stride, 1] audio.  post_qs=None
    (middle stage, C_out·fold = 128 and fold % stride == 0): lrelu →
    ConvTranspose1d → MRF — returns [B, T_in·stride, C_out] activations.

    Weights from pack_tail_weights with the same static metadata.  The
    XLA-path equivalent (nn/hifigan.py) runs lrelu → conv_transpose1d →
    mask → 3 ResBlocks (mean) [→ lrelu(0.01) → conv_post → tanh]; at
    C_out < 128 those ops are lane-starved (a [T, 1]-shaped conv_post
    output uses 1 of 128 lanes) and cost ~1.2 ms of the 6.8 ms serving
    decoder on v5e — fused and folded they are ~0.1 ms of matmuls.
    """
    b, t_in, c_in = x.shape
    fold_in = fold // stride
    lanes = fold_in * c_in
    assert lanes == 128, "tail fusion requires the folded input to fill 128 lanes"
    c_orig = c_in // stride

    t_f = -(-t_in // fold_in) * fold_in
    if t_f != t_in:
        x = jnp.pad(x, ((0, 0), (0, t_f - t_in), (0, 0)))
    xf = x.reshape(b, t_f // fold_in, lanes)
    rows = xf.shape[1]

    halo = (
        folded_stage_halo(kernel_sizes, dilation_sizes, fold)
        + max(abs(q) for q in up_qs)
        + (max(abs(q) for q in post_qs) if post_qs is not None else 0)
    )
    halo = -(-halo // 4) * 4
    tile = _tile_rows(128, kind="tail")
    n_branches = len(kernel_sizes)
    interleave = interleave and n_branches > 1
    n_slack = n_branches if interleave else 1
    n_tiles = -(-rows // tile)
    rows_pad = n_tiles * tile
    x_hbm = jnp.pad(xf, ((0, 0), (halo, halo + (rows_pad - rows)), (0, 0)))

    out_w = fold if post_qs is not None else 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, out_w), lambda i, j, len_ref: (i, j, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * halo, 128), x.dtype),
            # per-branch slack buffers as separate memrefs (all weights are
            # VMEM-resident at 128 lanes, so the extra ~1 MB fits)
            *[pltpu.VMEM((tile + 4 * halo, 128), x.dtype) for _ in range(n_slack)],
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        partial(
            _tail_kernel,
            tile=tile,
            halo=halo,
            n_branches=n_branches,
            up_qs=up_qs,
            meta=mrf_meta,
            post_qs=post_qs,
            stride=stride,
            fold=fold,
            c_orig=c_orig,
            acc_dtype=x.dtype,
            interleave=interleave,
        ),
        out_shape=jax.ShapeDtypeStruct((b, rows_pad, out_w), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(lengths.astype(jnp.int32), x_hbm, w_all, b_all)
    if post_qs is not None:
        return out[:, :rows, :].reshape(b, rows * fold, 1)[:, : t_in * stride]
    return out[:, :rows, :].reshape(b, rows * fold, c_orig)[:, : t_in * stride]
