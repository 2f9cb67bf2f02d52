"""Fused coupling-block kernel vs the unfused XLA path (interpret mode).

The kernel absorbs the inter-coupling channel Flips into its packed pre/post
matrices; these tests pin that algebra (both directions), the masking
semantics on padded batches, and fwd∘rev self-inversion.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvoice_tpu.config import SynthesizerConfig, V2_CONVERTER_CONFIG
from openvoice_tpu.models.synthesizer import init_synthesizer
from openvoice_tpu.nn.flows import apply_coupling_block
from openvoice_tpu.ops.coupling_pallas import (
    coupling_g_stack,
    fused_coupling_block,
    pack_coupling_block,
)

import dataclasses

CFG = dataclasses.replace(
    V2_CONVERTER_CONFIG,
    inter_channels=64,
    hidden_channels=64,
    spec_channels=65,
    upsample_rates=(4, 4),
    upsample_kernel_sizes=(8, 8),
    upsample_initial_channel=32,
    gin_channels=32,
)


@pytest.fixture(scope="module")
def setup():
    params = init_synthesizer(jax.random.PRNGKey(3), CFG)
    flow = params["flow"]
    rng = np.random.default_rng(7)
    b, t, c = 2, 64, CFG.inter_channels
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    lengths = jnp.asarray([t, 41], jnp.int32)
    mask = (jnp.arange(t)[None, :, None] < lengths[:, None, None]).astype(jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, 1, CFG.gin_channels)).astype(np.float32))
    return flow, x * mask, mask, lengths, g


@pytest.mark.parametrize("reverse", [False, True])
def test_fused_matches_xla(setup, reverse):
    flow, x, mask, lengths, g = setup
    ref = apply_coupling_block(flow, x, mask, g=g, reverse=reverse)

    packed = pack_coupling_block(flow, CFG.hidden_channels, reverse=reverse,
                                 dtype=jnp.float32)
    g_all = coupling_g_stack(flow, g, reverse=reverse, dtype=jnp.float32)
    k = flow["layers"][0]["wn"]["in"][0]["w"].shape[0]
    got = fused_coupling_block(x, lengths, packed, g_all, kernel_size=k,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_fused_roundtrip_inversion(setup):
    flow, x, mask, lengths, g = setup
    k = flow["layers"][0]["wn"]["in"][0]["w"].shape[0]
    pf = pack_coupling_block(flow, CFG.hidden_channels, reverse=False, dtype=jnp.float32)
    pr = pack_coupling_block(flow, CFG.hidden_channels, reverse=True, dtype=jnp.float32)
    gf = coupling_g_stack(flow, g, reverse=False, dtype=jnp.float32)
    gr = coupling_g_stack(flow, g, reverse=True, dtype=jnp.float32)
    y = fused_coupling_block(x, lengths, pf, gf, kernel_size=k, interpret=True)
    back = fused_coupling_block(y, lengths, pr, gr, kernel_size=k, interpret=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-3, rtol=1e-3)


def test_masked_rows_zero(setup):
    flow, x, mask, lengths, g = setup
    k = flow["layers"][0]["wn"]["in"][0]["w"].shape[0]
    pf = pack_coupling_block(flow, CFG.hidden_channels, reverse=False, dtype=jnp.float32)
    gf = coupling_g_stack(flow, g, reverse=False, dtype=jnp.float32)
    y = fused_coupling_block(x, lengths, pf, gf, kernel_size=k, interpret=True)
    assert np.all(np.asarray(y)[1, 41:, :] == 0.0)
