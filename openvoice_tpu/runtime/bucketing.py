"""Length bucketing: the static-shape answer to the reference's fully dynamic
sequence lengths (SURVEY.md §5.7).

Each distinct padded length is one compiled XLA program; bucketing bounds the
number of programs while wasting at most `growth-1` of the compute on padding.
Masks make padded frames semantically inert (the reference is already
mask-correct everywhere, so padding is exact, not approximate).
"""

from __future__ import annotations

import math
from typing import Sequence

DEFAULT_BUCKETS: tuple[int, ...] = (64, 128, 192, 256, 384, 512, 768, 1024, 1536, 2048, 3072, 4096)

# Finer, lane-aligned table for the batch planner: rounding waste is bounded
# by the step ratio — ≤ 20% everywhere above 512 and ≤ 12.5% above 1024 (vs
# 50% at the top of DEFAULT_BUCKETS; below 512 the ratio is coarser but the
# absolute waste is ≤ 64 frames).  Finer buckets mean more compiled
# programs, so this table is for long-running batch consumers (the serving
# batcher, batch benchmarks) where compiles amortize; one-off API calls keep
# the coarse table.  Starts at 128: a 64-frame convert graph measures ~2.1×
# SLOWER than a 128-frame one on v5e (sub-minimum-tile stages), so tiny
# buckets are a trap, not a saving.
FINE_BUCKETS: tuple[int, ...] = (
    tuple(range(128, 513, 64)) + tuple(range(640, 2049, 128)) + tuple(range(2304, 4097, 256))
)


def round_up_to_bucket(n: int, buckets: Sequence[int] = DEFAULT_BUCKETS, growth: float = 1.5) -> int:
    """Smallest bucket ≥ n; beyond the table, grow geometrically (×growth
    rounded to a multiple of 128 — lane-aligned)."""
    for b in buckets:
        if n <= b:
            return b
    b = buckets[-1]
    while b < n:
        b = int(math.ceil(b * growth / 128.0)) * 128
    return b


def pad_to_bucket(arr, axis: int, buckets: Sequence[int] = DEFAULT_BUCKETS):
    """Pad `arr` along `axis` up to its bucket; returns (padded, orig_len)."""
    import numpy as np

    n = arr.shape[axis]
    b = round_up_to_bucket(n, buckets)
    if b == n:
        return arr, n
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, b - n)
    return np.pad(np.asarray(arr), pad), n


def allowed_batch_sizes(max_batch: int) -> tuple[int, ...]:
    """Batch sizes the planner may emit for a given cap: powers of 2 up to
    max_batch, plus max_batch itself.  One compiled program per
    (bucket, size) pair, so the set stays small."""
    sizes = []
    b = 1
    while b < max_batch:
        sizes.append(b)
        b *= 2
    sizes.append(max_batch)
    return tuple(sizes)


def plan_groups(
    lengths: Sequence[int],
    *,
    max_batch: int = 8,
    batch_sizes: Sequence[int] | None = None,
    fixed_cost_frames: int = 96,
    buckets: Sequence[int] = FINE_BUCKETS,
) -> list[tuple[list[int], int, int]]:
    """Cost-optimal partition of utterances into padded batch groups.

    The decoder is MXU-bound, so a group's device time is ≈ proportional to
    `padded_batch · bucket(max_len)` plus a fixed dispatch cost; padding —
    both frame padding to the bucket and row padding to the next allowed
    batch size — is pure waste that masks make semantically inert but not
    free.  The reference has no batching at all (batch=1 Python loop,
    api.py:80-92, api.py:141-160); naive sorted-chunks-of-max_batch grouping
    (our previous scheme) wastes ~34% on a multilingual length mix.  This
    planner minimizes

        Σ_groups  padded_batch · bucket(max_len) + fixed_cost_frames

    by dynamic programming over the length-sorted order (optimal groups are
    contiguous in sorted order because group cost depends only on its max
    length and size).  Batch sizes are restricted to `batch_sizes` (default
    `allowed_batch_sizes(max_batch)`: powers of 2 plus max_batch; rows
    padded up, fully masked) so the number of distinct compiled
    (bucket, batch) programs stays bounded.

    Returns [(indices_into_lengths, bucket, padded_batch), ...].
    `fixed_cost_frames` is the per-dispatch overhead expressed in
    single-utterance frame equivalents (measured ~0.5-0.6 ms per dispatch at
    ~6.5 µs/frame·utt on v5e serving mode → default 96).
    """
    n = len(lengths)
    if n == 0:
        return []
    if batch_sizes is None:
        allowed = list(allowed_batch_sizes(max_batch))
    else:
        allowed = sorted(b for b in batch_sizes if b <= max_batch) or [max_batch]
    order = sorted(range(n), key=lambda i: lengths[i])

    def row_pad(k: int) -> int:
        for b in allowed:
            if b >= k:
                return b
        raise ValueError(f"group size {k} exceeds largest allowed batch {allowed[-1]}")

    max_k = min(allowed[-1], n)
    # DP over sorted prefix: cost[i] = min over last-group size k
    cost = [math.inf] * (n + 1)
    cut = [0] * (n + 1)
    cost[0] = 0.0
    for i in range(1, n + 1):
        bk = round_up_to_bucket(lengths[order[i - 1]], buckets)
        for k in range(1, min(max_k, i) + 1):
            c = cost[i - k] + row_pad(k) * bk + fixed_cost_frames
            if c < cost[i]:
                cost[i] = c
                cut[i] = k
    groups: list[tuple[list[int], int, int]] = []
    i = n
    while i > 0:
        k = cut[i]
        idx = [order[j] for j in range(i - k, i)]
        bk = round_up_to_bucket(lengths[order[i - 1]], buckets)
        groups.append((idx, bk, row_pad(k)))
        i -= k
    groups.reverse()
    return groups
