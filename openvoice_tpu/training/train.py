"""Sharded training step for the tone-color converter stack.

New capability (the reference ships no training code).  One jitted step:
posterior encode → flow → random-slice decode (VITS-style segment slicing
bounds vocoder cost) → mel L1 + prior KL → adam update, compiled under a
("data", "model") mesh: batch DP over `data`, wide channels TP over `model`
(runtime/mesh.py rules).  GSPMD inserts the gradient all-reduces.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from openvoice_tpu.audio.mel import mel_filterbank
from openvoice_tpu.audio.stft import stft_basis
from openvoice_tpu.config import SynthesizerConfig
from openvoice_tpu.models import synthesizer as S
from openvoice_tpu.models.align import sequence_mask
from openvoice_tpu.nn.flows import apply_coupling_block
from openvoice_tpu.nn.hifigan import apply_generator
from openvoice_tpu.training import losses as L


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_optimizer(lr: float = 2e-4, b1: float = 0.8, b2: float = 0.99) -> optax.GradientTransformation:
    """AdamW with the HiFi-GAN/VITS betas."""
    return optax.adamw(lr, b1=b1, b2=b2, weight_decay=0.01)


def init_train_state(rng: jax.Array, cfg: SynthesizerConfig, lr: float = 2e-4) -> TrainState:
    params = S.init_synthesizer(rng, cfg)
    opt = make_optimizer(lr)
    return TrainState(params=params, opt_state=opt.init(params), step=jnp.zeros((), jnp.int32))


def _mel_from_audio_frames(audio_bt: jnp.ndarray, cfg: SynthesizerConfig, num_mels: int = 80) -> jnp.ndarray:
    """[B, T_samples] → [B, frames, mels] log-mel, differentiable, jit-safe."""
    n_fft, hop = cfg.filter_length, cfg.hop_length
    pad = (n_fft - hop) // 2
    x = jnp.pad(audio_bt, ((0, 0), (pad, pad)), mode="reflect")
    t = x.shape[-1]
    n_frames = (t - n_fft) // hop + 1
    idx = (jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]).astype(jnp.int32)
    frames = jnp.take(x, idx, axis=-1)
    basis = jnp.asarray(stft_basis(n_fft, cfg.win_length))
    proj = jnp.dot(frames, basis, precision=jax.lax.Precision.HIGHEST)
    n_freq = n_fft // 2 + 1
    mag = jnp.sqrt(proj[..., :n_freq] ** 2 + proj[..., n_freq:] ** 2 + 1e-6)
    mel_fb = jnp.asarray(mel_filterbank(cfg.sampling_rate, n_fft, num_mels, 0.0, None))
    mel = jnp.einsum("btf,mf->btm", mag, mel_fb, precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.clip(mel, min=1e-5))


def _slice_segments(x: jnp.ndarray, starts: jnp.ndarray, seg: int) -> jnp.ndarray:
    """Per-batch dynamic slice [B, T, C] → [B, seg, C] (commons.py:48-54)."""
    def one(xi, si):
        return jax.lax.dynamic_slice_in_dim(xi, si, seg, axis=0)

    return jax.vmap(one)(x, starts)


def converter_loss(
    params: dict,
    cfg: SynthesizerConfig,
    spec: jnp.ndarray,        # [B, T, n_freq]
    audio: jnp.ndarray,       # [B, T*hop] target waveform
    spec_lengths: jnp.ndarray,
    g: jnp.ndarray,           # [B, 1, gin] speaker embedding (self-recon)
    rng: jax.Array,
    segment_frames: int = 32,
    c_mel: float = 45.0,
    c_kl: float = 1.0,
):
    """Self-reconstruction objective: enc_q → flow → (slice) → dec."""
    b, t = spec.shape[0], spec.shape[1]
    mask = sequence_mask(spec_lengths, t)[..., None].astype(spec.dtype)
    k_noise, k_slice = jax.random.split(rng)
    noise = jax.random.normal(k_noise, (b, t, cfg.inter_channels), spec.dtype)

    g_enc = jnp.zeros_like(g) if cfg.zero_g else g
    z, m_q, logs_q = S.posterior_encode(params, cfg, spec, mask, g_enc, 1.0, noise)
    z_p = apply_coupling_block(params["flow"], z, mask, g=g, reverse=False)

    # VITS random segment slicing (commons.py:57-64): bound decoder FLOPs
    max_start = jnp.maximum(spec_lengths - segment_frames, 1)
    starts = (jax.random.uniform(k_slice, (b,)) * max_start).astype(jnp.int32)
    z_slice = _slice_segments(z, starts, segment_frames)
    audio_hat = apply_generator(
        params["dec"], z_slice,
        resblock_kind=cfg.resblock,
        resblock_dilation_sizes=cfg.resblock_dilation_sizes,
        upsample_rates=cfg.upsample_rates,
        upsample_kernel_sizes=cfg.upsample_kernel_sizes,
        g=g_enc,
    )[..., 0]  # [B, seg*upsample]

    audio_2d = audio.reshape(b, -1)
    target = _slice_segments(
        audio_2d[..., None], starts * cfg.hop_length, segment_frames * cfg.upsample_factor
    )[..., 0]

    mel_hat = _mel_from_audio_frames(audio_hat, cfg)
    mel_ref = _mel_from_audio_frames(target, cfg)

    loss_mel = L.mel_l1(mel_hat, mel_ref)
    loss_kl = L.kl_to_standard_normal(z_p, m_q, logs_q, mask)
    total = c_mel * loss_mel + c_kl * loss_kl
    return total, {"mel": loss_mel, "kl": loss_kl}


def _generator_forward(
    params: dict,
    cfg: SynthesizerConfig,
    spec: jnp.ndarray,
    audio: jnp.ndarray,
    spec_lengths: jnp.ndarray,
    g: jnp.ndarray,
    rng: jax.Array,
    segment_frames: int,
):
    """Shared enc_q → flow → slice → dec forward for the GAN losses.

    Returns (audio_hat [B, seg·up], target [B, seg·up], z_p, m_q, logs_q, mask).
    """
    b, t = spec.shape[0], spec.shape[1]
    mask = sequence_mask(spec_lengths, t)[..., None].astype(spec.dtype)
    k_noise, k_slice = jax.random.split(rng)
    noise = jax.random.normal(k_noise, (b, t, cfg.inter_channels), spec.dtype)

    g_enc = jnp.zeros_like(g) if cfg.zero_g else g
    z, m_q, logs_q = S.posterior_encode(params, cfg, spec, mask, g_enc, 1.0, noise)
    z_p = apply_coupling_block(params["flow"], z, mask, g=g, reverse=False)

    max_start = jnp.maximum(spec_lengths - segment_frames, 1)
    starts = (jax.random.uniform(k_slice, (b,)) * max_start).astype(jnp.int32)
    z_slice = _slice_segments(z, starts, segment_frames)
    audio_hat = apply_generator(
        params["dec"], z_slice,
        resblock_kind=cfg.resblock,
        resblock_dilation_sizes=cfg.resblock_dilation_sizes,
        upsample_rates=cfg.upsample_rates,
        upsample_kernel_sizes=cfg.upsample_kernel_sizes,
        g=g_enc,
    )[..., 0]
    target = _slice_segments(
        audio.reshape(b, -1)[..., None],
        starts * cfg.hop_length,
        segment_frames * cfg.upsample_factor,
    )[..., 0]
    return audio_hat, target, z_p, m_q, logs_q, mask


class GanTrainState(NamedTuple):
    gen: TrainState
    disc: TrainState


def init_gan_train_state(
    rng: jax.Array, cfg: SynthesizerConfig, lr: float = 2e-4
) -> GanTrainState:
    from openvoice_tpu.training.discriminator import init_discriminators

    k_g, k_d = jax.random.split(rng)
    gen = init_train_state(k_g, cfg, lr)
    d_params = init_discriminators(k_d)
    opt = make_optimizer(lr)
    disc = TrainState(params=d_params, opt_state=opt.init(d_params), step=jnp.zeros((), jnp.int32))
    return GanTrainState(gen=gen, disc=disc)


@partial(jax.jit, static_argnames=("cfg", "segment_frames"), donate_argnums=(0,))
def gan_train_step(
    state: GanTrainState,
    cfg: SynthesizerConfig,
    spec: jnp.ndarray,
    audio: jnp.ndarray,
    spec_lengths: jnp.ndarray,
    g: jnp.ndarray,
    rng: jax.Array,
    segment_frames: int = 32,
    c_mel: float = 45.0,
    c_kl: float = 1.0,
    c_fm: float = 2.0,
    lr: float = 2e-4,
) -> tuple[GanTrainState, dict]:
    """One full adversarial step (discriminator update, then generator update),
    following the HiFi-GAN/VITS alternating-Adam recipe in a single jitted
    graph.  The discriminator sees a stop-gradiented fake for its update; the
    generator pass recomputes the forward inside its own grad so XLA can
    rematerialize instead of storing two activation sets.  `lr` is traced —
    pass the same value used at init (adam state is lr-invariant, so any
    schedule can be driven from the caller without recompiling)."""
    from openvoice_tpu.training import discriminator as D

    opt = make_optimizer(lr)

    # ---- discriminator update (fake detached) ----
    audio_hat, target, _, _, _, _ = _generator_forward(
        state.gen.params, cfg, spec, audio, spec_lengths, g, rng, segment_frames
    )
    fake = jax.lax.stop_gradient(audio_hat)

    def d_loss_fn(d_params):
        logits_real, _ = D.apply_discriminators(d_params, target)
        logits_fake, _ = D.apply_discriminators(d_params, fake)
        return L.discriminator_adv_loss(logits_real, logits_fake)

    d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.disc.params)
    d_updates, d_opt = opt.update(d_grads, state.disc.opt_state, state.disc.params)
    d_params = optax.apply_updates(state.disc.params, d_updates)
    new_disc = TrainState(params=d_params, opt_state=d_opt, step=state.disc.step + 1)

    # ---- generator update (through the updated discriminator) ----
    def g_loss_fn(g_params):
        a_hat, tgt, z_p, m_q, logs_q, mask = _generator_forward(
            g_params, cfg, spec, audio, spec_lengths, g, rng, segment_frames
        )
        mel_hat = _mel_from_audio_frames(a_hat, cfg)
        mel_ref = _mel_from_audio_frames(tgt, cfg)
        loss_mel = L.mel_l1(mel_hat, mel_ref)
        loss_kl = L.kl_to_standard_normal(z_p, m_q, logs_q, mask)
        logits_real, fmaps_real = D.apply_discriminators(d_params, tgt)
        logits_fake, fmaps_fake = D.apply_discriminators(d_params, a_hat)
        loss_adv = L.generator_adv_loss(logits_fake)
        loss_fm = L.feature_matching_loss(
            jax.tree.map(jax.lax.stop_gradient, fmaps_real), fmaps_fake
        )
        total = c_mel * loss_mel + c_kl * loss_kl + loss_adv + c_fm * loss_fm
        return total, {"mel": loss_mel, "kl": loss_kl, "adv": loss_adv, "fm": loss_fm}

    (g_loss, g_metrics), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
        state.gen.params
    )
    g_updates, g_opt = opt.update(g_grads, state.gen.opt_state, state.gen.params)
    g_params = optax.apply_updates(state.gen.params, g_updates)
    new_gen = TrainState(params=g_params, opt_state=g_opt, step=state.gen.step + 1)

    metrics = dict(g_metrics, gen_total=g_loss, disc=d_loss)
    return GanTrainState(gen=new_gen, disc=new_disc), metrics


@partial(jax.jit, static_argnames=("cfg", "segment_frames"), donate_argnums=(0,))
def train_step(
    state: TrainState,
    cfg: SynthesizerConfig,
    spec: jnp.ndarray,
    audio: jnp.ndarray,
    spec_lengths: jnp.ndarray,
    g: jnp.ndarray,
    rng: jax.Array,
    segment_frames: int = 32,
    lr: float = 2e-4,
) -> tuple[TrainState, dict]:
    """One optimizer step.  Under a mesh, in/out shardings follow the arrays'
    placements (shard_params + batch_sharding); GSPMD handles collectives.
    `lr` is traced — pass the value used at init (or a schedule's output)."""
    opt = make_optimizer(lr)

    def loss_fn(p):
        return converter_loss(p, cfg, spec, audio, spec_lengths, g, rng,
                              segment_frames=segment_frames)

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = TrainState(params=new_params, opt_state=new_opt, step=state.step + 1)
    metrics = dict(metrics, total=loss)
    return new_state, metrics
