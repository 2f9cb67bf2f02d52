"""Normalizing-flow building blocks (reference: modules.py:84-516).

All in [B, T, C] layout.  The channel `Flip` becomes a last-axis reverse;
couplings split the channel (lane) axis in half, which keeps both halves
lane-aligned for 192-channel models (96 = 0.75·128 — XLA pads; the fused
Pallas coupling kernel re-packs).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from openvoice_tpu.nn.conv import conv1d, layer_norm
from openvoice_tpu.nn.wavenet import apply_wn
from openvoice_tpu.nn.transforms import piecewise_rational_quadratic_transform


# ---------------------------------------------------------------------------
# DDSConv — dilated depth-separable stack (modules.py:84-130)
# ---------------------------------------------------------------------------

def apply_ddsconv(
    params: dict, x: jnp.ndarray, x_mask: jnp.ndarray, g: jnp.ndarray | None = None
) -> jnp.ndarray:
    """x: [B, T, C]; per layer: depthwise dilated conv → LN → GELU → 1x1 → LN
    → GELU → residual."""
    if g is not None:
        x = x + g
    channels = x.shape[-1]
    for i, lp in enumerate(params["layers"]):
        k = lp["sep"]["w"].shape[0]
        dilation = k**i  # reference: dilation = kernel_size**i (modules.py:102)
        pad = (k * dilation - dilation) // 2
        y = conv1d(x * x_mask, lp["sep"]["w"], lp["sep"]["b"], padding=pad, dilation=dilation, groups=channels)
        y = layer_norm(y, lp["norm1"]["gamma"], lp["norm1"]["beta"])
        y = jax.nn.gelu(y, approximate=False)
        y = conv1d(y, lp["pw"]["w"], lp["pw"]["b"])
        y = layer_norm(y, lp["norm2"]["gamma"], lp["norm2"]["beta"])
        y = jax.nn.gelu(y, approximate=False)
        x = x + y
    return x * x_mask


# ---------------------------------------------------------------------------
# Scalar flows (modules.py:363-399)
# ---------------------------------------------------------------------------

def log_flow(x: jnp.ndarray, x_mask: jnp.ndarray, reverse: bool = False):
    if not reverse:
        y = jnp.log(jnp.clip(x, min=1e-5)) * x_mask
        logdet = jnp.sum(-y, axis=(1, 2))
        return y, logdet
    return jnp.exp(x) * x_mask


def flip_flow(x: jnp.ndarray, reverse: bool = False):
    y = x[..., ::-1]
    if not reverse:
        return y, jnp.zeros(x.shape[0], dtype=x.dtype)
    return y


def elementwise_affine(params: dict, x: jnp.ndarray, x_mask: jnp.ndarray, reverse: bool = False):
    m, logs = params["m"], params["logs"]  # [C]
    if not reverse:
        y = (m + jnp.exp(logs) * x) * x_mask
        logdet = jnp.sum(logs * x_mask, axis=(1, 2))
        return y, logdet
    return (x - m) * jnp.exp(-logs) * x_mask


# ---------------------------------------------------------------------------
# ConvFlow — spline coupling (modules.py:459-516)
# ---------------------------------------------------------------------------

def apply_conv_flow(
    params: dict,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    g: jnp.ndarray | None = None,
    reverse: bool = False,
    num_bins: int = 10,
    tail_bound: float = 5.0,
):
    half = x.shape[-1] // 2
    x0, x1 = x[..., :half], x[..., half:]
    h = conv1d(x0, params["pre"]["w"], params["pre"]["b"])
    h = apply_ddsconv(params["dds"], h, x_mask, g=g)
    h = conv1d(h, params["proj"]["w"], params["proj"]["b"]) * x_mask  # [B,T,half*(3K-1)]

    b, t = x.shape[0], x.shape[1]
    h = h.reshape(b, t, half, 3 * num_bins - 1)
    filter_channels = params["pre"]["w"].shape[-1]
    denom = math.sqrt(filter_channels)
    uw = h[..., :num_bins] / denom
    uh = h[..., num_bins : 2 * num_bins] / denom
    ud = h[..., 2 * num_bins :]

    x1_new, logabsdet = piecewise_rational_quadratic_transform(
        x1, uw, uh, ud, inverse=reverse, tails="linear", tail_bound=tail_bound
    )
    y = jnp.concatenate([x0, x1_new], axis=-1) * x_mask
    if not reverse:
        logdet = jnp.sum(logabsdet * x_mask, axis=(1, 2))
        return y, logdet
    return y


# ---------------------------------------------------------------------------
# Residual (affine) coupling — the converter's flow (modules.py:402-456)
# ---------------------------------------------------------------------------

def apply_coupling_layer(
    params: dict,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    g: jnp.ndarray | None = None,
    reverse: bool = False,
    mean_only: bool = True,
    wn_stack: tuple | None = None,
):
    half = x.shape[-1] // 2
    x0, x1 = x[..., :half], x[..., half:]
    h = conv1d(x0, params["pre"]["w"], params["pre"]["b"]) * x_mask
    h = apply_wn(params["wn"], h, x_mask, g=g, stacked=wn_stack)
    stats = conv1d(h, params["post"]["w"], params["post"]["b"]) * x_mask
    if mean_only:
        m, logs = stats, jnp.zeros_like(stats)
    else:
        m, logs = stats[..., :half], stats[..., half:]

    if not reverse:
        x1 = (m + x1 * jnp.exp(logs)) * x_mask
        y = jnp.concatenate([x0, x1], axis=-1)
        logdet = jnp.sum(logs, axis=(1, 2))
        return y, logdet
    x1 = (x1 - m) * jnp.exp(-logs) * x_mask
    return jnp.concatenate([x0, x1], axis=-1)


def apply_coupling_block(
    params: dict,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    g: jnp.ndarray | None = None,
    reverse: bool = False,
    wn_stacks: list | None = None,
) -> jnp.ndarray:
    """4× [coupling(mean_only) + flip]; reverse runs the chain backwards
    (models.py:367-397).  wn_stacks: optional per-layer pre-packed WN weight
    tuples (see apply_wn), parallel to params["layers"]."""
    layers = params["layers"]
    stacks = wn_stacks if wn_stacks is not None else [None] * len(layers)
    if not reverse:
        for lp, st in zip(layers, stacks):
            x, _ = apply_coupling_layer(lp, x, x_mask, g=g, reverse=False, wn_stack=st)
            x, _ = flip_flow(x, reverse=False)
    else:
        for lp, st in zip(reversed(layers), reversed(stacks)):
            x = flip_flow(x, reverse=True)
            x = apply_coupling_layer(lp, x, x_mask, g=g, reverse=True, wn_stack=st)
    return x
