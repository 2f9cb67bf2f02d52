"""Duration predictors (reference: models.py:60-180).

* `apply_duration_predictor` — deterministic conv regressor (models.py:60-100).
* `apply_sdp_reverse` — StochasticDurationPredictor inference path
  (models.py:172-180): reversed spline flows map noise → log-durations.
  The flow sequence is static (EA, 4×[ConvFlow, Flip]); the reverse chain
  drops the first ConvFlow exactly as the reference does (models.py:174,
  "remove a useless vflow").
* `apply_sdp_forward` — training NLL path (models.py:144-171).

RNG is explicit: callers pass noise or a PRNG key (the reference's
torch.randn at models.py:175 becomes a threaded key).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from openvoice_tpu.nn.conv import conv1d, layer_norm
from openvoice_tpu.nn.flows import (
    apply_conv_flow,
    apply_ddsconv,
    elementwise_affine,
    flip_flow,
    log_flow,
)


def apply_duration_predictor(
    params: dict,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    g: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """x: [B, T, C] (caller stops gradients — torch.detach at models.py:87)."""
    if g is not None and params.get("cond") is not None:
        x = x + conv1d(g, params["cond"]["w"], params["cond"]["b"])
    k = params["conv1"]["w"].shape[0]
    x = conv1d(x * x_mask, params["conv1"]["w"], params["conv1"]["b"], padding=k // 2)
    x = jax.nn.relu(x)
    x = layer_norm(x, params["norm1"]["gamma"], params["norm1"]["beta"])
    x = conv1d(x * x_mask, params["conv2"]["w"], params["conv2"]["b"], padding=k // 2)
    x = jax.nn.relu(x)
    x = layer_norm(x, params["norm2"]["gamma"], params["norm2"]["beta"])
    x = conv1d(x * x_mask, params["proj"]["w"], params["proj"]["b"])
    return x * x_mask


def _sdp_context(params: dict, x: jnp.ndarray, x_mask: jnp.ndarray, g: jnp.ndarray | None) -> jnp.ndarray:
    x = conv1d(x, params["pre"]["w"], params["pre"]["b"])
    if g is not None and params.get("cond") is not None:
        x = x + conv1d(g, params["cond"]["w"], params["cond"]["b"])
    x = apply_ddsconv(params["convs"], x, x_mask)
    return conv1d(x, params["proj"]["w"], params["proj"]["b"]) * x_mask


def apply_sdp_reverse(
    params: dict,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    g: jnp.ndarray | None = None,
    noise_scale: float = 1.0,
    noise: jnp.ndarray | None = None,
    rng: jax.Array | None = None,
) -> jnp.ndarray:
    """→ logw [B, T, 1]."""
    ctx = _sdp_context(params, x, x_mask, g)
    b, t = x.shape[0], x.shape[1]
    if noise is None:
        if rng is None:
            raise ValueError("apply_sdp_reverse needs `noise` or `rng`")
        noise = jax.random.normal(rng, (b, t, 2), dtype=x.dtype)
    z = noise * noise_scale

    cfs = params["flows"]["conv_flows"]  # [CF0..CF3]; CF0 unused in reverse
    for cf in (cfs[3], cfs[2], cfs[1]):
        z = flip_flow(z, reverse=True)
        z = apply_conv_flow(cf, z, x_mask, g=ctx, reverse=True)
    z = flip_flow(z, reverse=True)
    z = elementwise_affine(params["flows"]["ea"], z, x_mask, reverse=True)
    logw = z[..., 0:1]
    return logw


def apply_sdp_forward(
    params: dict,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    w: jnp.ndarray,
    g: jnp.ndarray | None,
    rng: jax.Array,
) -> jnp.ndarray:
    """Training NLL (models.py:144-171). w: ground-truth durations [B, T, 1].

    Returns nll + logq per batch element [B].
    """
    ctx = _sdp_context(params, x, x_mask, g)
    b, t = x.shape[0], x.shape[1]

    # posterior flows over (u, nu)
    h_w = conv1d(w, params["post_pre"]["w"], params["post_pre"]["b"])
    h_w = apply_ddsconv(params["post_convs"], h_w, x_mask)
    h_w = conv1d(h_w, params["post_proj"]["w"], params["post_proj"]["b"]) * x_mask

    e_q = jax.random.normal(rng, (b, t, 2), dtype=x.dtype) * x_mask
    z_q = e_q
    logdet_tot_q = jnp.zeros(b, dtype=x.dtype)
    pg = ctx + h_w
    z_q, ld = elementwise_affine(params["post_flows"]["ea"], z_q, x_mask, reverse=False)
    logdet_tot_q += ld
    for cf in params["post_flows"]["conv_flows"]:
        z_q, ld = apply_conv_flow(cf, z_q, x_mask, g=pg, reverse=False)
        logdet_tot_q += ld
        z_q, ld = flip_flow(z_q, reverse=False)
        logdet_tot_q += ld

    z_u, z1 = z_q[..., 0:1], z_q[..., 1:2]
    u = jax.nn.sigmoid(z_u) * x_mask
    z0 = (w - u) * x_mask
    logdet_tot_q += jnp.sum(
        (jax.nn.log_sigmoid(z_u) + jax.nn.log_sigmoid(-z_u)) * x_mask, axis=(1, 2)
    )
    logq = (
        jnp.sum(-0.5 * (math.log(2 * math.pi) + jnp.square(e_q)) * x_mask, axis=(1, 2))
        - logdet_tot_q
    )

    logdet_tot = jnp.zeros(b, dtype=x.dtype)
    z0, ld = log_flow(z0, x_mask, reverse=False)
    logdet_tot += ld
    z = jnp.concatenate([z0, z1], axis=-1)
    z, ld = elementwise_affine(params["flows"]["ea"], z, x_mask, reverse=False)
    logdet_tot += ld
    for cf in params["flows"]["conv_flows"]:
        z, ld = apply_conv_flow(cf, z, x_mask, g=ctx, reverse=False)
        logdet_tot += ld
        z, ld = flip_flow(z, reverse=False)
        logdet_tot += ld
    nll = (
        jnp.sum(0.5 * (math.log(2 * math.pi) + jnp.square(z)) * x_mask, axis=(1, 2))
        - logdet_tot
    )
    return nll + logq
