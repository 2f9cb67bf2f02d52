"""Fused WaveNet-stack kernel vs the XLA path (interpret mode — kernel-golden
test per SURVEY.md §4 item 1; reference block: modules.py:133-210)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvoice_tpu.nn.wavenet import apply_wn
from openvoice_tpu.ops.wn_pallas import fused_wn_stack, stack_wn_params
from openvoice_tpu.nn.conv import conv1d


def _wn_params(rng, hidden, n_layers, k, gin):
    p = {"in": [], "res_skip": [], "cond": None}
    for i in range(n_layers):
        p["in"].append({
            "w": jnp.asarray(rng.standard_normal((k, hidden, 2 * hidden)).astype(np.float32)) * 0.07,
            "b": jnp.asarray(rng.standard_normal(2 * hidden).astype(np.float32)) * 0.07,
        })
        out = 2 * hidden if i < n_layers - 1 else hidden
        p["res_skip"].append({
            "w": jnp.asarray(rng.standard_normal((1, hidden, out)).astype(np.float32)) * 0.07,
            "b": jnp.asarray(rng.standard_normal(out).astype(np.float32)) * 0.07,
        })
    if gin:
        p["cond"] = {
            "w": jnp.asarray(rng.standard_normal((1, gin, 2 * hidden * n_layers)).astype(np.float32)) * 0.07,
            "b": jnp.asarray(rng.standard_normal(2 * hidden * n_layers).astype(np.float32)) * 0.07,
        }
    return p


@pytest.mark.parametrize("n_layers,gin,t", [(16, 32, 256), (4, 0, 96), (3, 16, 120)])
def test_fused_wn_matches_xla(n_layers, gin, t):
    hidden, k = 64, 5
    rng = np.random.default_rng(n_layers * 100 + t)
    params = _wn_params(rng, hidden, n_layers, k, gin)
    b = 2
    x = jnp.asarray(rng.standard_normal((b, t, hidden)).astype(np.float32)) * 0.5
    lengths = jnp.asarray([t, max(t - 37, 8)], jnp.int32)
    mask = (jnp.arange(t)[None, :, None] < lengths[:, None, None]).astype(jnp.float32)
    x = x * mask
    g = (jnp.asarray(rng.standard_normal((b, 1, gin)).astype(np.float32)) if gin else None)

    ref = np.asarray(apply_wn(params, x, mask, g=g))

    w_in, b_in, w_rs, b_rs = stack_wn_params(params, hidden)
    if g is not None:
        g_all = conv1d(g, params["cond"]["w"], params["cond"]["b"])
        g_stack = g_all.reshape(b, n_layers, 2 * hidden)
    else:
        g_stack = jnp.zeros((b, n_layers, 2 * hidden), jnp.float32)
    out = np.asarray(
        fused_wn_stack(x, lengths, w_in, b_in, g_stack, w_rs, b_rs,
                       kernel_size=k, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)
