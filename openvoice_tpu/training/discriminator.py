"""HiFi-GAN/VITS discriminators for adversarial converter training.

New capability (the reference ships no training code — SURVEY.md §2). The
architecture follows the recipe the reference checkpoints were trained with:
a multi-period discriminator bank (periods 2,3,5,7,11) plus one multi-scale
(waveform) discriminator, LSGAN objectives (training/losses.py).

TPU design notes:
* Channels-last layouts throughout — period discriminators fold the waveform
  into [B, T/p, p, 1] and run (5,1)-kernel Conv2d stacks, which XLA tiles as
  implicit GEMMs on the MXU; the period axis rides the lane dimension.
* Grouped 1D convs in the scale discriminator map to
  `feature_group_count` — no torch-style weight-norm at train time; we train
  plain kernels (weight-norm is an optimization trick, not a semantics
  requirement, and its reparametrization costs an extra multiply per step on
  TPU for no quality gain at these widths).
* All structure (periods, strides, groups) is static Python — pytrees hold
  arrays only, so the whole D step jits once per shape bucket.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from openvoice_tpu.nn.conv import conv1d, conv2d

LRELU_SLOPE = 0.1
PERIODS: tuple[int, ...] = (2, 3, 5, 7, 11)

# DiscriminatorP conv ladder: (out_channels); kernel (5,1), stride (3,1)
_P_CHANNELS = (32, 128, 512, 1024)
# DiscriminatorS ladder: (out, kernel, stride, groups, padding)
_S_LADDER = (
    (128, 15, 1, 1, 7),
    (128, 41, 2, 4, 20),
    (256, 41, 2, 16, 20),
    (512, 41, 4, 16, 20),
    (1024, 41, 4, 16, 20),
    (1024, 41, 1, 16, 20),
    (1024, 5, 1, 1, 2),
)


def _lrelu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


def _conv_init(rng, shape) -> dict:
    w = jax.random.normal(rng, shape) * 0.01
    return {"w": w, "b": jnp.zeros((shape[-1],))}


def init_period_discriminator(rng: jax.Array) -> dict:
    keys = jax.random.split(rng, len(_P_CHANNELS) + 2)
    convs = []
    cin = 1
    for i, cout in enumerate(_P_CHANNELS):
        convs.append(_conv_init(keys[i], (5, 1, cin, cout)))
        cin = cout
    convs.append(_conv_init(keys[-2], (5, 1, cin, 1024)))
    post = _conv_init(keys[-1], (3, 1, 1024, 1))
    return {"convs": convs, "post": post}


def init_scale_discriminator(rng: jax.Array) -> dict:
    keys = jax.random.split(rng, len(_S_LADDER) + 1)
    convs = []
    cin = 1
    for i, (cout, k, _s, g, _p) in enumerate(_S_LADDER):
        convs.append(_conv_init(keys[i], (k, cin // g, cout)))
        cin = cout
    post = _conv_init(keys[-1], (3, cin, 1))
    return {"convs": convs, "post": post}


def init_discriminators(rng: jax.Array) -> dict:
    keys = jax.random.split(rng, len(PERIODS) + 1)
    return {
        "scale": init_scale_discriminator(keys[0]),
        "periods": [init_period_discriminator(k) for k in keys[1:]],
    }


def apply_period_discriminator(
    params: dict, audio: jnp.ndarray, period: int
) -> tuple[jnp.ndarray, list[jnp.ndarray]]:
    """audio: [B, T] → (logits [B, T', 1], feature maps)."""
    b, t = audio.shape
    pad = (-t) % period
    x = jnp.pad(audio, ((0, 0), (0, pad)), mode="reflect" if pad and t > 1 else "constant")
    x = x.reshape(b, (t + pad) // period, period, 1)  # [B, T/p, p, 1]
    fmaps = []
    for i, c in enumerate(params["convs"]):
        stride = (3, 1) if i < len(params["convs"]) - 1 else (1, 1)
        x = _lrelu(conv2d(x, c["w"], c["b"], stride=stride, padding=(2, 0)))
        fmaps.append(x)
    x = conv2d(x, params["post"]["w"], params["post"]["b"], padding=(1, 0))
    fmaps.append(x)
    return x.reshape(b, -1), fmaps


def apply_scale_discriminator(
    params: dict, audio: jnp.ndarray
) -> tuple[jnp.ndarray, list[jnp.ndarray]]:
    """audio: [B, T] → (logits [B, T'], feature maps)."""
    x = audio[..., None]  # [B, T, 1]
    fmaps = []
    for c, (cout, k, s, g, p) in zip(params["convs"], _S_LADDER):
        x = _lrelu(conv1d(x, c["w"], c["b"], stride=s, padding=p, groups=g))
        fmaps.append(x)
    x = conv1d(x, params["post"]["w"], params["post"]["b"], padding=1)
    fmaps.append(x)
    return x.reshape(x.shape[0], -1), fmaps


def apply_discriminators(
    params: dict, audio: jnp.ndarray
) -> tuple[list[jnp.ndarray], list[list[jnp.ndarray]]]:
    """Run every sub-discriminator. audio: [B, T]."""
    logits, fmaps = [], []
    lo, f = apply_scale_discriminator(params["scale"], audio)
    logits.append(lo)
    fmaps.append(f)
    for p_params, period in zip(params["periods"], PERIODS):
        lo, f = apply_period_discriminator(p_params, audio, period)
        logits.append(lo)
        fmaps.append(f)
    return logits, fmaps
