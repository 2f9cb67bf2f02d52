"""Tone-color (speaker-embedding) reference encoder
(reference: models.py:301-364).

Spectrogram [B, T, n_freq] → LayerNorm → 6× strided Conv2d+ReLU → GRU over
time → hidden state at the true last step → Linear → tone-color vector.

TPU design: convs run in NHWC (freq on lanes); the GRU is a `lax.scan` whose
per-step math is two small matmuls.  Unlike the reference (which processes
each clip at its exact length, one at a time — api.py:122-131), this encoder
is *length-aware*: a batch of clips padded to one bucket runs as a single
graph, with masks re-zeroing padded frames after every conv (conv biases
break zero propagation) and the GRU state gathered at each clip's true final
step.  Result is bit-identical to the per-clip reference computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from openvoice_tpu.nn.conv import conv2d, linear, layer_norm


def gru_cell(x_t: jnp.ndarray, h: jnp.ndarray, p: dict) -> jnp.ndarray:
    """Torch GRU gate order (r, z, n):
    r = σ(W_ir x + b_ir + W_hr h + b_hr); z likewise;
    n = tanh(W_in x + b_in + r * (W_hn h + b_hn)); h' = (1-z)·n + z·h.
    Weights stored pre-transposed: w_ih [in, 3H], w_hh [H, 3H].
    """
    hdim = h.shape[-1]
    gi = linear(x_t, p["w_ih"], p["b_ih"])  # [B, 3H]
    gh = linear(h, p["w_hh"], p["b_hh"])
    r = jax.nn.sigmoid(gi[..., :hdim] + gh[..., :hdim])
    z = jax.nn.sigmoid(gi[..., hdim : 2 * hdim] + gh[..., hdim : 2 * hdim])
    n = jnp.tanh(gi[..., 2 * hdim :] + r * gh[..., 2 * hdim :])
    return (1.0 - z) * n + z * h


def apply_gru_last(params: dict, x: jnp.ndarray, lengths: jnp.ndarray | None) -> jnp.ndarray:
    """x: [B, T, D] → hidden state at step lengths-1 per batch element [B, H]."""
    hdim = params["w_hh"].shape[0]
    h0 = jnp.zeros((x.shape[0], hdim), dtype=x.dtype)

    def step(h, x_t):
        h_new = gru_cell(x_t, h, params)
        return h_new, h_new

    _, hs = jax.lax.scan(step, h0, jnp.swapaxes(x, 0, 1))  # hs: [T, B, H]
    if lengths is None:
        return hs[-1]
    idx = jnp.clip(lengths - 1, 0, hs.shape[0] - 1)  # [B]
    return jnp.take_along_axis(
        jnp.swapaxes(hs, 0, 1), idx[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]


def reduced_length(length, n_convs: int = 6):
    """Time/freq reduction of the stride-2 conv stack: L → (L-1)//2 + 1 per
    layer (models.py:361-364 with k=3, s=2, p=1)."""
    for _ in range(n_convs):
        length = (length - 1) // 2 + 1
    return length


def apply_reference_encoder(
    params: dict,
    spec_btf: jnp.ndarray,
    lengths: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """spec_btf: [B, T, n_freq] linear magnitudes (+ optional true frame
    lengths [B]) → [B, gin_channels].

    Matches ReferenceEncoder.forward (models.py:339-359); with `lengths`,
    padded frames are masked so a bucket-padded batch reproduces the exact
    per-clip computation.
    """
    x = spec_btf
    if params.get("layernorm") is not None:
        x = layer_norm(x, params["layernorm"]["gamma"], params["layernorm"]["beta"])

    t = x.shape[1]
    if lengths is not None:
        mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(x.dtype)  # [B, T]
        x = x * mask[..., None]
        cur_len = lengths
    else:
        mask = None
        cur_len = None

    x = x[..., None]  # [B, T, F, 1] NHWC
    for cp in params["convs"]:
        x = conv2d(x, cp["w"], cp["b"], stride=(2, 2), padding=(1, 1))
        x = jax.nn.relu(x)
        if cur_len is not None:
            cur_len = (cur_len - 1) // 2 + 1
            m = (jnp.arange(x.shape[1])[None, :] < cur_len[:, None]).astype(x.dtype)
            x = x * m[:, :, None, None]
    # [B, T', F', C] → [B, T', C·F'] matching torch's [N,T,C,F]→[N,T,C*F] view
    b, t_r, f_r, c = x.shape
    x = jnp.swapaxes(x, 2, 3).reshape(b, t_r, c * f_r)
    h = apply_gru_last(params["gru"], x, cur_len)  # [B, 128]
    return linear(h, params["proj"]["w"], params["proj"]["b"])  # [B, gin]
