"""Transformer encoder with windowed relative-position attention
(reference: attentions.py:37-465).

The reference materializes relative logits via a pad/reshape trick
(attentions.py:361-396).  Here the banded structure is expressed directly:

    scores[t, s] += q[t] · E_k[s - t + w]   for |s - t| <= w, else 0
    out[t]      += Σ_r p[t, t + r - w] · E_v[r]

computed with one [B,H,T,2w+1] einsum plus a gather — no (2T-1)-wide
intermediate, same numerics (the reference zero-pads embeddings outside the
window, so out-of-window relative logits are exactly 0).

Layout [B, T, C]; QKV/output projections are 1×1 convs in the reference ⇒
plain matmuls here.  Attention math in float32.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from openvoice_tpu.nn.conv import conv1d, layer_norm, linear


def _rel_to_abs_indices(t: int, window: int) -> tuple[np.ndarray, np.ndarray]:
    """idx[t,s] = clip(s-t+w, 0, 2w); valid[t,s] = |s-t| <= w."""
    pos = np.arange(t)
    rel = pos[None, :] - pos[:, None]  # s - t
    valid = np.abs(rel) <= window
    idx = np.clip(rel + window, 0, 2 * window)
    return idx.astype(np.int32), valid


def multi_head_attention(
    params: dict,
    x: jnp.ndarray,
    c: jnp.ndarray,
    attn_mask: jnp.ndarray | None,
    n_heads: int,
    window_size: int | None = None,
    proximal_bias: bool = False,
) -> jnp.ndarray:
    """x (queries): [B, T, C]; c (keys/values): [B, S, C].

    proximal_bias adds −log1p(|t−s|) to the self-attention scores
    (attentions.py:398-407) — an option of the reference's Decoder stack.
    """
    b, t, channels = x.shape
    s = c.shape[1]
    dk = channels // n_heads

    q = linear(x, params["q"]["w"], params["q"]["b"])
    k = linear(c, params["k"]["w"], params["k"]["b"])
    v = linear(c, params["v"]["w"], params["v"]["b"])

    # [B, T, C] → [B, H, T, dk]  (matches torch view(b, h, dk, t).transpose)
    def split(z, length):
        return jnp.transpose(z.reshape(b, length, n_heads, dk), (0, 2, 1, 3))

    # note: torch reshapes [b, d, t] as (b, h, dk, t) — channel-major split;
    # in [B,T,C] the same head split is C → (H, dk) which matches because the
    # qkv conv weights are imported in full [C, C] form.
    q, k, v = split(q, t), split(k, s), split(v, s)

    scale = 1.0 / math.sqrt(dk)
    scores = jnp.einsum("bhtd,bhsd->bhts", q * scale, k, precision=None)

    if window_size is not None:
        assert t == s, "relative attention requires self-attention"
        emb_k = params["emb_rel_k"]  # [2w+1, dk] (heads shared)
        q_rel = jnp.einsum("bhtd,rd->bhtr", q * scale, emb_k, precision=None)
        idx, valid = _rel_to_abs_indices(t, window_size)
        gathered = jnp.take_along_axis(
            q_rel[:, :, :, :], jnp.asarray(idx)[None, None, :, :], axis=-1
        )
        scores = scores + jnp.where(jnp.asarray(valid)[None, None], gathered, 0.0)

    if proximal_bias:
        assert t == s, "proximal bias requires self-attention"
        pos = jnp.arange(t, dtype=jnp.float32)
        diff = pos[None, :] - pos[:, None]
        scores = scores + (-jnp.log1p(jnp.abs(diff)))[None, None].astype(scores.dtype)

    if attn_mask is not None:
        scores = jnp.where(attn_mask == 0, -1e4, scores)

    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", p, v, precision=None)

    if window_size is not None:
        emb_v = params["emb_rel_v"]  # [2w+1, dk]
        idx, valid = _rel_to_abs_indices(t, window_size)
        # p_band[b,h,t,r] = p[b,h,t, t+r-w] (0 when out of range)
        src = np.arange(t)[:, None] + np.arange(2 * window_size + 1)[None, :] - window_size
        band_valid = (src >= 0) & (src < t)
        src_idx = np.clip(src, 0, t - 1).astype(np.int32)
        p_band = jnp.take_along_axis(p, jnp.asarray(src_idx)[None, None], axis=-1)
        p_band = jnp.where(jnp.asarray(band_valid)[None, None], p_band, 0.0)
        out = out + jnp.einsum("bhtr,rd->bhtd", p_band, emb_v, precision=None)

    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, t, channels)
    return linear(out, params["o"]["w"], params["o"]["b"])


def apply_ffn(params: dict, x: jnp.ndarray, x_mask: jnp.ndarray, kernel_size: int,
              causal: bool = False) -> jnp.ndarray:
    """Conv FFN with torch-style asymmetric same padding
    (attentions.py:439-465): pad_l=(k-1)//2, pad_r=k//2; causal=True pads
    (k-1, 0) — the Decoder-stack option (attentions.py:424-431)."""
    def pad(z):
        if kernel_size == 1:
            return z
        if causal:
            return jnp.pad(z, ((0, 0), (kernel_size - 1, 0), (0, 0)))
        return jnp.pad(z, ((0, 0), ((kernel_size - 1) // 2, kernel_size // 2), (0, 0)))

    x = conv1d(pad(x * x_mask), params["conv1"]["w"], params["conv1"]["b"])
    x = jax.nn.relu(x)
    x = conv1d(pad(x * x_mask), params["conv2"]["w"], params["conv2"]["b"])
    return x * x_mask


def apply_encoder(
    params: dict,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    n_heads: int,
    kernel_size: int,
    window_size: int = 4,
    g: jnp.ndarray | None = None,
    cond_layer_idx: int | None = None,
) -> jnp.ndarray:
    """Relative-attention encoder stack (attentions.py:104-121).

    x: [B, T, C]; x_mask: [B, T, 1].
    """
    attn_mask = (x_mask[:, None, :, 0:1] * x_mask[:, None, None, :, 0]).astype(x.dtype)
    # attn_mask: [B, 1, T, T]
    x = x * x_mask
    for i, lp in enumerate(params["layers"]):
        if cond_layer_idx is not None and i == cond_layer_idx and g is not None:
            x = (x + linear(g, params["spk_emb"]["w"], params["spk_emb"]["b"])) * x_mask
        y = multi_head_attention(lp["attn"], x, x, attn_mask, n_heads, window_size)
        x = layer_norm(x + y, lp["norm1"]["gamma"], lp["norm1"]["beta"])
        y = apply_ffn(lp["ffn"], x, x_mask, kernel_size)
        x = layer_norm(x + y, lp["norm2"]["gamma"], lp["norm2"]["beta"])
    return x * x_mask
