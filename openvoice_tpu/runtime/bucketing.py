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
