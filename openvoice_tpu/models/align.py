"""Masking + monotonic-alignment helpers (reference: commons.py:121-142).

Static-shape formulations: every function takes a padded max length and
returns masked results, which is what keeps the TTS graph jittable per
length bucket (SURVEY.md §7.3 hard part #1).
"""

from __future__ import annotations

import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """lengths: [B] → bool [B, max_length]."""
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def generate_path(duration: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Durations → monotonic alignment matrix (commons.py:128-142).

    duration: [B, T_x] (integral frame counts per token)
    mask:     [B, T_y, T_x] attention mask
    returns   [B, T_y, T_x] 0/1 path where path[:, t_y, t_x] = 1 iff frame t_y
    is produced by token t_x.
    """
    t_y = mask.shape[1]
    cum = jnp.cumsum(duration, axis=-1)  # [B, T_x]
    pos = jnp.arange(t_y, dtype=cum.dtype)  # [T_y]
    # path_cum[b, tx, ty] = ty < cum[b, tx]
    path = (pos[None, None, :] < cum[:, :, None]).astype(mask.dtype)  # [B, T_x, T_y]
    # differentiate along tx: token tx owns frames [cum[tx-1], cum[tx])
    path = path - jnp.pad(path, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    return jnp.swapaxes(path, 1, 2) * mask
