"""Training subsystem tests: loss finiteness, parameter updates, GAN step.

The reference ships no training code (SURVEY.md §4 — no tests, no training),
so these validate our new-capability VITS-recipe trainer end to end on a tiny
config: one jitted step must run, produce finite losses, and actually move
the parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvoice_tpu.config import SynthesizerConfig
from openvoice_tpu.training import train as T
from openvoice_tpu.training import discriminator as D

TINY = SynthesizerConfig(
    n_speakers=0, zero_g=True,
    spec_channels=129, filter_length=256, hop_length=64, win_length=256,
    inter_channels=64, hidden_channels=64,
    upsample_initial_channel=128, upsample_rates=(4, 4, 4), upsample_kernel_sizes=(8, 8, 8),
    resblock_kernel_sizes=(3, 7), resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
    gin_channels=64,
)

B, T_FRAMES = 2, 48
SEG = 16


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    spec = np.abs(rng.standard_normal((B, T_FRAMES, TINY.spec_channels))).astype(np.float32)
    audio = (rng.standard_normal((B, T_FRAMES * TINY.hop_length)) * 0.1).astype(np.float32)
    lens = np.array([T_FRAMES, T_FRAMES - 8], np.int32)
    g = rng.standard_normal((B, 1, TINY.gin_channels)).astype(np.float32) * 0.1
    return jnp.asarray(spec), jnp.asarray(audio), jnp.asarray(lens), jnp.asarray(g)


def test_converter_loss_finite():
    state = T.init_train_state(jax.random.PRNGKey(0), TINY)
    spec, audio, lens, g = _batch()
    total, metrics = T.converter_loss(
        state.params, TINY, spec, audio, lens, g, jax.random.PRNGKey(1),
        segment_frames=SEG,
    )
    assert np.isfinite(float(total))
    assert np.isfinite(float(metrics["mel"])) and np.isfinite(float(metrics["kl"]))


def test_train_step_updates_params():
    state = T.init_train_state(jax.random.PRNGKey(0), TINY)
    before = float(jnp.sum(jnp.abs(state.params["enc_q"]["pre"]["w"])))
    spec, audio, lens, g = _batch()
    state2, metrics = T.train_step(state, TINY, spec, audio, lens, g, jax.random.PRNGKey(1))
    after = float(jnp.sum(jnp.abs(state2.params["enc_q"]["pre"]["w"])))
    assert after != before
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["total"]))


def test_discriminator_shapes():
    params = D.init_discriminators(jax.random.PRNGKey(0))
    audio = jnp.asarray(np.random.default_rng(0).standard_normal((B, 1024)), jnp.float32)
    logits, fmaps = D.apply_discriminators(params, audio)
    assert len(logits) == 1 + len(D.PERIODS)
    assert len(fmaps) == len(logits)
    for lo in logits:
        assert lo.shape[0] == B and lo.ndim == 2
        assert bool(jnp.isfinite(lo).all())


def test_gan_train_step():
    state = T.init_gan_train_state(jax.random.PRNGKey(0), TINY)
    spec, audio, lens, g = _batch()
    g_before = float(jnp.sum(jnp.abs(state.gen.params["dec"]["conv_pre"]["w"])))
    d_before = float(jnp.sum(jnp.abs(state.disc.params["scale"]["convs"][0]["w"])))
    state2, metrics = T.gan_train_step(
        state, TINY, spec, audio, lens, g, jax.random.PRNGKey(1), segment_frames=SEG
    )
    for k in ("mel", "kl", "adv", "fm", "gen_total", "disc"):
        assert np.isfinite(float(metrics[k])), k
    assert float(jnp.sum(jnp.abs(state2.gen.params["dec"]["conv_pre"]["w"]))) != g_before
    assert float(jnp.sum(jnp.abs(state2.disc.params["scale"]["convs"][0]["w"]))) != d_before
