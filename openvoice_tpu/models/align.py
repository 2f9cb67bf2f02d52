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


def subsequent_mask(length: int) -> jnp.ndarray:
    """Causal [1, 1, T, T] lower-triangular mask (commons.py:95-97)."""
    return jnp.tril(jnp.ones((length, length), jnp.float32))[None, None]


def rand_gumbel(rng, shape) -> jnp.ndarray:
    """Overflow-protected Gumbel samples (commons.py:37-41): uniforms are
    squeezed into [1e-5, 0.99999] before the double log."""
    import jax

    u = jax.random.uniform(rng, shape) * 0.99998 + 0.00001
    return -jnp.log(-jnp.log(u))


def timing_signal_1d(
    length: int, channels: int, min_timescale: float = 1.0,
    max_timescale: float = 1.0e4,
) -> jnp.ndarray:
    """Sinusoidal positional signal [1, length, channels] (commons.py:67-81;
    channels-last here).  Layout matches the reference's: the first half of
    the channel axis is sin, the second half cos."""
    position = jnp.arange(length, dtype=jnp.float32)
    num_timescales = channels // 2
    log_inc = (
        jnp.log(jnp.float32(max_timescale) / jnp.float32(min_timescale))
        / jnp.maximum(num_timescales - 1, 1)
    )
    inv_timescales = min_timescale * jnp.exp(
        jnp.arange(num_timescales, dtype=jnp.float32) * -log_inc
    )
    scaled = position[None, :] * inv_timescales[:, None]  # [C/2, T]
    signal = jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=0)  # [2·(C/2), T]
    signal = jnp.pad(signal, ((0, channels % 2), (0, 0)))
    return jnp.swapaxes(signal, 0, 1)[None]  # [1, T, C]


def add_timing_signal_1d(x: jnp.ndarray, min_timescale: float = 1.0,
                         max_timescale: float = 1.0e4) -> jnp.ndarray:
    """x: [B, T, C] + sinusoidal positions (commons.py:84-87)."""
    return x + timing_signal_1d(x.shape[1], x.shape[2], min_timescale,
                                max_timescale).astype(x.dtype)


def cat_timing_signal_1d(x: jnp.ndarray, min_timescale: float = 1.0,
                         max_timescale: float = 1.0e4) -> jnp.ndarray:
    """x: [B, T, C] concat sinusoidal positions on channels (commons.py:90-92)."""
    sig = timing_signal_1d(x.shape[1], x.shape[2], min_timescale, max_timescale)
    return jnp.concatenate([x, jnp.broadcast_to(sig, x.shape).astype(x.dtype)], axis=-1)
