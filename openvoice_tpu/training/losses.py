"""Training losses for the converter stack.

The reference ships no training code (SURVEY.md §2 — inference only), so this
subsystem is a new capability following the VITS recipe the architecture was
trained with: posterior/flow/decoder optimized with mel reconstruction +
prior KL (+ adversarial terms via training/discriminator.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def kl_to_standard_normal(
    z_p: jnp.ndarray, m_q: jnp.ndarray, logs_q: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """KL(q(z|x) ‖ N(0, I)) evaluated on the flow-mapped latent.

    The converter's coupling flow is volume-preserving (mean-only couplings:
    logdet ≡ 0, modules.py:445-451), so the posterior entropy term uses
    logs_q directly while the cross-entropy uses z_p.
    """
    # E_q[-log p(z_p)] - H[q]  (up to constants), masked mean per frame
    ce = 0.5 * jnp.square(z_p)
    ent = logs_q + 0.5
    kl = jnp.sum((ce - ent) * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return kl


def mel_l1(mel_hat: jnp.ndarray, mel_ref: jnp.ndarray) -> jnp.ndarray:
    """L1 over log-mels (the VITS/HiFi-GAN reconstruction term)."""
    return jnp.mean(jnp.abs(mel_hat - mel_ref))


def feature_matching_loss(fmaps_real, fmaps_fake) -> jnp.ndarray:
    total = 0.0
    n = 0
    for fr, ff in zip(fmaps_real, fmaps_fake):
        for r, f in zip(fr, ff):
            total = total + jnp.mean(jnp.abs(r - f))
            n += 1
    return total / max(n, 1)


def generator_adv_loss(disc_fake_outputs) -> jnp.ndarray:
    """LSGAN generator loss: E[(D(G(x)) - 1)^2]."""
    total = 0.0
    for d in disc_fake_outputs:
        total = total + jnp.mean(jnp.square(d - 1.0))
    return total / max(len(disc_fake_outputs), 1)


def discriminator_adv_loss(disc_real_outputs, disc_fake_outputs) -> jnp.ndarray:
    """LSGAN discriminator loss: E[(D(x)-1)^2] + E[D(G(x))^2]."""
    total = 0.0
    for dr, df in zip(disc_real_outputs, disc_fake_outputs):
        total = total + jnp.mean(jnp.square(dr - 1.0)) + jnp.mean(jnp.square(df))
    return total / max(len(disc_real_outputs), 1)
