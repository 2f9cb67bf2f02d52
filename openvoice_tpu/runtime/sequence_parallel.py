"""Sequence (context) parallelism for long-utterance conversion.

The reference processes an entire utterance on one device in one pass
(api.py:150-154) — activation memory grows O(T) in the flow/posterior stacks
and O(T·256) at audio rate in the vocoder, which caps utterance length on a
single chip.  Here the *time* axis is sharded across the mesh's ``model``
axis (SURVEY.md §5.7): every stage of the convert graph (WN posterior, the
4+4 coupling flows, the HiFi-GAN upsampler) is a finite-receptive-field
convolution stack, so each shard only needs a bounded **halo** of neighbor
frames to compute its chunk exactly.

Design — redundant-halo, one exchange total:
* Each shard ``ppermute``-pulls ``halo`` frames from its left and right ICI
  neighbors ONCE (two collective-permutes over the whole graph), then runs
  the complete convert stack locally on the extended chunk and crops.  With
  ``halo ≥`` the graph's total receptive field (≈114 frames for the shipped
  configs: enc_q 16·2 + flows 2·4·4·2 + vocoder ≈ 18), the cropped result is
  *bit-identical* to the single-device graph — every conv sees the same
  inputs, and boundary shards see the same zero padding because ppermute
  fills absent ring sources with zeros, exactly the implicit zero padding of
  a 'SAME' conv at the sequence edge.
* The frame mask is rebuilt per shard from *global* frame indices, so
  per-layer masking (WN residual masks, vocoder mask repeats) matches the
  unsharded graph everywhere, including inside halos.
* Redundant compute is 2·halo/(T/n) — ~6% at T=16k frames on 8 shards —
  traded for a single pair of ICI transfers instead of per-layer exchanges
  (26+ convs would otherwise each need one).

Cited reference behavior: voice_conversion call stack models.py:492-499;
receptive fields from modules.py:133-210 (WN k=5, dil 1) and
models.py:224-298 (HiFi-GAN kernels).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from openvoice_tpu.config import SynthesizerConfig
from openvoice_tpu.models.synthesizer import voice_conversion_masked


def required_halo(cfg: SynthesizerConfig) -> int:
    """Total receptive-field halo (frames) of the convert graph, from config.

    Per dilated conv the one-sided halo is (k-1)/2 · dilation; stages add.
    The vocoder's sample-rate halos are divided back to frame units by the
    cumulative upsample factor and rounded up.
    """
    wn = lambda k, layers: (k - 1) // 2 * layers  # dilation_rate 1 everywhere
    h = wn(cfg.enc_q_kernel_size, cfg.enc_q_layers)
    h += 2 * cfg.flow_n_flows * wn(cfg.flow_kernel_size, cfg.flow_wn_layers)
    # vocoder: conv_pre k7 pad 3 at frame rate, then per-stage resblock halos
    dec = 3.0
    up = 1
    for i, u in enumerate(cfg.upsample_rates):
        up *= u
        stage = 0
        for k, dils in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            stage = max(stage, sum((k - 1) // 2 * d + (k - 1) // 2 for d in dils))
        dec += stage / up
    dec += 3.0 / up  # conv_post k7
    return int(h + dec + 1)


def _halo_exchange(x: jnp.ndarray, axis_name: str, halo: int, n: int) -> jnp.ndarray:
    """[B, T_loc, C] → [B, halo + T_loc + halo, C]; ring-edge shards receive
    zeros (= the implicit zero padding of the unsharded conv)."""
    send_right = [(i, i + 1) for i in range(n - 1)]
    send_left = [(i + 1, i) for i in range(n - 1)]
    left = lax.ppermute(x[:, -halo:, :], axis_name, send_right)
    right = lax.ppermute(x[:, :halo, :], axis_name, send_left)
    return jnp.concatenate([left, x, right], axis=1)


def voice_conversion_sp(
    params: dict,
    cfg: SynthesizerConfig,
    spec: jnp.ndarray,
    spec_lengths: jnp.ndarray,
    g_src: jnp.ndarray,
    g_tgt: jnp.ndarray,
    tau: float,
    noise: jnp.ndarray,
    *,
    mesh: Mesh,
    axis: str = "model",
    halo: int | None = None,
) -> jnp.ndarray:
    """Sequence-parallel tone conversion: time axis sharded over ``axis``.

    spec: [B, T, n_freq], noise: [B, T, inter] — T must divide by the axis
    size, and T/n must be ≥ halo.  Returns audio [B, T·upsample, 1] sharded
    along time on the same axis.
    """
    n = mesh.shape[axis]
    t = spec.shape[1]
    if t % n:
        raise ValueError(f"T={t} not divisible by {axis} axis size {n}")
    t_loc = t // n
    if halo is None:
        halo = required_halo(cfg)
    if t_loc < halo:
        raise ValueError(f"shard length {t_loc} < halo {halo}; use fewer shards")
    up = cfg.upsample_factor

    def local_fn(p, spec_l, noise_l, lengths, gs, gt):
        idx = lax.axis_index(axis)
        ext_spec = _halo_exchange(spec_l, axis, halo, n)
        ext_noise = _halo_exchange(noise_l, axis, halo, n)
        pos = idx * t_loc - halo + jnp.arange(t_loc + 2 * halo)
        mask = (
            (pos[None, :] >= 0) & (pos[None, :] < lengths[:, None])
        ).astype(spec_l.dtype)[..., None]
        audio = voice_conversion_masked(
            p, cfg, ext_spec, mask, gs, gt, tau, ext_noise
        )
        return audio[:, halo * up : (halo + t_loc) * up]

    sharded = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(None, axis, None), P(), P(), P()),
        out_specs=P(None, axis, None),
        check_vma=False,
    )
    return sharded(params, spec, noise, spec_lengths, g_src, g_tgt)
