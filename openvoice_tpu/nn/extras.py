"""Auxiliary blocks for full reference-inventory parity (SURVEY.md §2.1
C10i/C10j and the attentions.Decoder stack).

The reference ships these but never instantiates them in any released
config (`ConvReluNorm` modules.py:32-81, `TransformerCouplingLayer`
modules.py:519-581 — with an unreachable spline tail after its return,
modules.py:583-598 — and `attentions.Decoder` attentions.py:124-207).
They are implemented here as working, tested components rather than dead
code: the transformer coupling is the VITS2-style flow (a drop-in
alternative to the WN coupling for training new models), and the decoder
stack enables any-future autoregressive text path.

All functions follow the house style: pure functions over param pytrees,
[B, T, C] layout, explicit masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from openvoice_tpu.nn.attention import apply_encoder, apply_ffn, multi_head_attention
from openvoice_tpu.nn.conv import conv1d, layer_norm


# ---------------------------------------------------------------------------
# ConvReluNorm (modules.py:32-81)
# ---------------------------------------------------------------------------

def init_conv_relu_norm(rng, in_channels: int, hidden_channels: int,
                        out_channels: int, kernel_size: int, n_layers: int) -> dict:
    from openvoice_tpu.models.synthesizer import _conv_init, _ln_init

    assert n_layers > 1
    keys = jax.random.split(rng, n_layers + 1)
    convs = [_conv_init(keys[0], kernel_size, in_channels, hidden_channels)]
    norms = [_ln_init(hidden_channels)]
    for i in range(n_layers - 1):
        convs.append(_conv_init(keys[1 + i], kernel_size, hidden_channels, hidden_channels))
        norms.append(_ln_init(hidden_channels))
    # zero-init residual projection: the block is the identity at init
    proj = _conv_init(keys[-1], 1, hidden_channels, out_channels, zero=True)
    return {"convs": convs, "norms": norms, "proj": proj}


def apply_conv_relu_norm(params: dict, x: jnp.ndarray, x_mask: jnp.ndarray) -> jnp.ndarray:
    """n× [conv(k, same) → LayerNorm → relu] + zero-init residual proj."""
    x_org = x
    for conv, norm in zip(params["convs"], params["norms"]):
        k = conv["w"].shape[0]
        x = conv1d(x * x_mask, conv["w"], conv["b"], padding=k // 2)
        x = layer_norm(x, norm["gamma"], norm["beta"])
        x = jax.nn.relu(x)
    x = x_org + conv1d(x, params["proj"]["w"], params["proj"]["b"])
    return x * x_mask


# ---------------------------------------------------------------------------
# TransformerCouplingLayer (modules.py:519-581) — VITS2-style flow
# ---------------------------------------------------------------------------

def init_transformer_coupling_layer(
    rng, channels: int, hidden_channels: int, filter_channels: int,
    kernel_size: int, n_layers: int, n_heads: int, window_size: int = 4,
    gin_channels: int = 0,
) -> dict:
    from openvoice_tpu.models.synthesizer import _attn_layer_init, _conv_init, _linear_init

    assert channels % 2 == 0
    half = channels // 2
    keys = jax.random.split(rng, n_layers + 3)
    enc_layers = [
        _attn_layer_init(keys[i], hidden_channels, filter_channels, n_heads,
                         kernel_size, window_size)
        for i in range(n_layers)
    ]
    enc = {"layers": enc_layers}
    if gin_channels:
        # mid-stack speaker conditioning (VITS2 isflow encoder,
        # attentions.py:63-75: speaker added before layer cond_layer_idx)
        enc["spk_emb"] = _linear_init(keys[-3], gin_channels, hidden_channels)
    return {
        "pre": _conv_init(keys[-2], 1, half, hidden_channels),
        "enc": enc,
        # zero-init post: the coupling is the identity at init (flow-safe)
        "post": _conv_init(keys[-1], 1, hidden_channels, half, zero=True),
    }


def apply_transformer_coupling_layer(
    params: dict,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    *,
    n_heads: int,
    kernel_size: int,
    window_size: int = 4,
    g: jnp.ndarray | None = None,
    reverse: bool = False,
):
    """Mean-only affine coupling with a transformer context network.

    x: [B, T, C]; returns (y, logdet) forward (logdet = 0 for mean-only),
    y alone in reverse — same contract as nn/flows.apply_coupling_layer.
    """
    half = x.shape[-1] // 2
    x0, x1 = x[..., :half], x[..., half:]
    h = conv1d(x0, params["pre"]["w"], params["pre"]["b"]) * x_mask
    if g is not None:
        assert "spk_emb" in params["enc"], (
            "conditioned coupling needs init_transformer_coupling_layer("
            "gin_channels=...)"
        )
        n_enc = len(params["enc"]["layers"])
        assert n_enc >= 3, "VITS2 conditioning injects before layer 2 (n_layers >= 3)"
    h = apply_encoder(
        params["enc"], h, x_mask,
        n_heads=n_heads, kernel_size=kernel_size, window_size=window_size,
        g=g, cond_layer_idx=2 if g is not None else None,
    )
    m = conv1d(h, params["post"]["w"], params["post"]["b"]) * x_mask
    if not reverse:
        y = jnp.concatenate([x0, (m + x1) * x_mask], axis=-1)
        return y, jnp.zeros(x.shape[0], dtype=x.dtype)
    return jnp.concatenate([x0, (x1 - m) * x_mask], axis=-1)


# ---------------------------------------------------------------------------
# Decoder stack (attentions.py:124-207): causal self-attn + cross-attn + FFN
# ---------------------------------------------------------------------------

def init_decoder(rng, hidden: int, filter_channels: int, n_heads: int,
                 kernel_size: int, n_layers: int) -> dict:
    from openvoice_tpu.models.synthesizer import _linear_init, _ln_init

    layers = []
    keys = jax.random.split(rng, n_layers)
    for i in range(n_layers):
        k = jax.random.split(keys[i], 10)
        def attn(base):
            return {
                "q": _linear_init(base[0], hidden, hidden),
                "k": _linear_init(base[1], hidden, hidden),
                "v": _linear_init(base[2], hidden, hidden),
                "o": _linear_init(base[3], hidden, hidden),
            }
        from openvoice_tpu.models.synthesizer import _conv_init

        layers.append({
            "self_attn": attn(k[0:4]),
            "norm0": _ln_init(hidden),
            "cross_attn": attn(k[4:8]),
            "norm1": _ln_init(hidden),
            "ffn": {
                "conv1": _conv_init(k[8], kernel_size, hidden, filter_channels),
                "conv2": _conv_init(k[9], kernel_size, filter_channels, hidden),
            },
            "norm2": _ln_init(hidden),
        })
    return {"layers": layers}


def apply_decoder(
    params: dict,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    h: jnp.ndarray,
    h_mask: jnp.ndarray,
    *,
    n_heads: int,
    kernel_size: int,
    proximal_bias: bool = False,
) -> jnp.ndarray:
    """x: [B, T, C] decoder input; h: [B, S, C] encoder output.

    Self-attention is causal (subsequent mask, commons.py:95-97), the FFN
    is causally padded, cross-attention masks on h's validity.
    """
    from openvoice_tpu.models.align import subsequent_mask

    t = x.shape[1]
    causal = subsequent_mask(t).astype(x.dtype)  # [1, 1, T, T]
    self_mask = causal * (x_mask[:, None, :, 0:1] * x_mask[:, None, None, :, 0])
    cross_mask = (x_mask[:, None, :, 0:1] * h_mask[:, None, None, :, 0]).astype(x.dtype)

    x = x * x_mask
    for lp in params["layers"]:
        y = multi_head_attention(lp["self_attn"], x, x, self_mask, n_heads,
                                 proximal_bias=proximal_bias)
        x = layer_norm(x + y, lp["norm0"]["gamma"], lp["norm0"]["beta"])
        y = multi_head_attention(lp["cross_attn"], x, h, cross_mask, n_heads)
        x = layer_norm(x + y, lp["norm1"]["gamma"], lp["norm1"]["beta"])
        y = apply_ffn(lp["ffn"], x, x_mask, kernel_size, causal=True)
        x = layer_norm(x + y, lp["norm2"]["gamma"], lp["norm2"]["beta"])
    return x * x_mask
