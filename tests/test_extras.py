"""Auxiliary-block parity: ConvReluNorm (modules.py:32-81),
TransformerCouplingLayer (modules.py:519-581), attentions.Decoder
(attentions.py:124-207), proximal bias (attentions.py:398-407), and the
commons.py helpers (timing signals, subsequent_mask, rand_gumbel).

These are dead code in the reference (never instantiated by a shipped
config) — here they are working components with behavior tests; the
timing-signal/Gumbel helpers are checked against the torch oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvoice_tpu.models.align import (
    add_timing_signal_1d,
    cat_timing_signal_1d,
    rand_gumbel,
    subsequent_mask,
    timing_signal_1d,
)
from openvoice_tpu.nn.extras import (
    apply_conv_relu_norm,
    apply_decoder,
    apply_transformer_coupling_layer,
    init_conv_relu_norm,
    init_decoder,
    init_transformer_coupling_layer,
)


def test_conv_relu_norm_identity_at_init_and_masks():
    rng = jax.random.PRNGKey(0)
    p = init_conv_relu_norm(rng, 16, 32, 16, kernel_size=5, n_layers=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 40, 16))
    lengths = jnp.asarray([40, 25])
    mask = (jnp.arange(40)[None, :, None] < lengths[:, None, None]).astype(jnp.float32)
    y = apply_conv_relu_norm(p, x * mask, mask)
    # zero-init residual proj → identity at init (modules.py:76-77)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x * mask), atol=1e-6)
    # masked region stays zero after perturbing the proj
    p["proj"]["w"] = jnp.ones_like(p["proj"]["w"]) * 0.1
    y = apply_conv_relu_norm(p, x * mask, mask)
    assert np.abs(np.asarray(y)[1, 25:]).max() == 0.0


def test_transformer_coupling_roundtrip():
    """Forward then reverse must invert exactly (flow property), including
    with a perturbed (non-zero) post projection."""
    rng = jax.random.PRNGKey(0)
    p = init_transformer_coupling_layer(rng, channels=32, hidden_channels=48,
                                        filter_channels=96, kernel_size=3,
                                        n_layers=2, n_heads=2)
    p["post"]["w"] = jax.random.normal(jax.random.PRNGKey(5), p["post"]["w"].shape) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 32))
    mask = jnp.ones((2, 24, 1))
    y, logdet = apply_transformer_coupling_layer(
        p, x, mask, n_heads=2, kernel_size=3, reverse=False)
    assert logdet.shape == (2,)  # mean-only → zero logdet
    np.testing.assert_allclose(np.asarray(logdet), 0.0)
    x_back = apply_transformer_coupling_layer(
        p, y, mask, n_heads=2, kernel_size=3, reverse=True)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-5)
    # first half passes through unchanged (coupling structure)
    np.testing.assert_allclose(np.asarray(y[..., :16]), np.asarray(x[..., :16]))


def test_decoder_causality():
    """Output at position t must not depend on inputs at positions > t."""
    rng = jax.random.PRNGKey(0)
    p = init_decoder(rng, hidden=32, filter_channels=64, n_heads=2,
                     kernel_size=3, n_layers=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 20, 32))
    h = jax.random.normal(jax.random.PRNGKey(2), (1, 12, 32))
    ones_x = jnp.ones((1, 20, 1))
    ones_h = jnp.ones((1, 12, 1))
    y0 = apply_decoder(p, x, ones_x, h, ones_h, n_heads=2, kernel_size=3)
    x2 = x.at[:, 15:].set(99.0)  # perturb the future
    y1 = apply_decoder(p, x2, ones_x, h, ones_h, n_heads=2, kernel_size=3)
    np.testing.assert_allclose(np.asarray(y0[:, :15]), np.asarray(y1[:, :15]), atol=1e-5)
    assert np.abs(np.asarray(y0[:, 15:]) - np.asarray(y1[:, 15:])).max() > 1e-3
    # proximal-bias variant still runs and is finite
    y2 = apply_decoder(p, x, ones_x, h, ones_h, n_heads=2, kernel_size=3,
                       proximal_bias=True)
    assert np.isfinite(np.asarray(y2)).all()


def test_timing_signal_matches_torch_oracle():
    torch = pytest.importorskip("torch")
    import math

    def ref_signal(length, channels, min_timescale=1.0, max_timescale=1.0e4):
        # commons.py:67-81 semantics
        position = torch.arange(length, dtype=torch.float)
        num_timescales = channels // 2
        log_inc = math.log(max_timescale / min_timescale) / (num_timescales - 1)
        inv = min_timescale * torch.exp(
            torch.arange(num_timescales, dtype=torch.float) * -log_inc)
        scaled = position.unsqueeze(0) * inv.unsqueeze(1)
        signal = torch.cat([torch.sin(scaled), torch.cos(scaled)], 0)
        signal = torch.nn.functional.pad(signal, [0, 0, 0, channels % 2])
        return signal.view(1, channels, length)

    for length, channels in [(17, 8), (33, 7)]:
        ref = ref_signal(length, channels).numpy()  # [1, C, T]
        got = np.asarray(timing_signal_1d(length, channels))  # [1, T, C]
        np.testing.assert_allclose(got[0].T, ref[0], atol=1e-5)

    x = np.random.default_rng(0).standard_normal((2, 17, 8)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(add_timing_signal_1d(jnp.asarray(x)))[0].T,
        x[0].T + ref_signal(17, 8).numpy()[0], atol=1e-5)
    assert cat_timing_signal_1d(jnp.asarray(x)).shape == (2, 17, 16)


def test_subsequent_mask_and_gumbel():
    m = np.asarray(subsequent_mask(5))
    assert m.shape == (1, 1, 5, 5)
    assert (m == np.tril(np.ones((5, 5)))).all()
    g = np.asarray(rand_gumbel(jax.random.PRNGKey(0), (10000,)))
    assert np.isfinite(g).all()
    # Gumbel(0,1) mean is the Euler–Mascheroni constant ≈ 0.5772
    assert abs(g.mean() - 0.5772) < 0.05


def test_transformer_coupling_conditioned():
    """Speaker-conditioned coupling (gin_channels > 0): mid-stack g
    injection, round-trip inversion still exact."""
    rng = jax.random.PRNGKey(0)
    p = init_transformer_coupling_layer(rng, channels=32, hidden_channels=48,
                                        filter_channels=96, kernel_size=3,
                                        n_layers=3, n_heads=2, gin_channels=16)
    p["post"]["w"] = jax.random.normal(jax.random.PRNGKey(5), p["post"]["w"].shape) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 32))
    g = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 16))
    mask = jnp.ones((2, 24, 1))
    y, _ = apply_transformer_coupling_layer(
        p, x, mask, n_heads=2, kernel_size=3, g=g, reverse=False)
    x_back = apply_transformer_coupling_layer(
        p, y, mask, n_heads=2, kernel_size=3, g=g, reverse=True)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-5)
    # conditioning actually changes the transform
    y0, _ = apply_transformer_coupling_layer(
        p, x, mask, n_heads=2, kernel_size=3, g=g * 0.0, reverse=False)
    assert np.abs(np.asarray(y) - np.asarray(y0)).max() > 1e-4
