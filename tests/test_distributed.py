"""Distributed tests on the virtual 8-device CPU mesh (SURVEY.md §4 item 3):
sharded vs single-device outputs must agree.

Sequence parallelism correctness is exact by construction (redundant halo ≥
total receptive field ⇒ every conv sees identical inputs), so the tolerance
here is float-reassociation-level, not "close enough".
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvoice_tpu.config import SynthesizerConfig
from openvoice_tpu.models import synthesizer as S
from openvoice_tpu.runtime.mesh import make_mesh
from openvoice_tpu.runtime import sequence_parallel as SP

TINY = SynthesizerConfig(
    n_speakers=0, zero_g=True,
    spec_channels=65, filter_length=128, hop_length=32, win_length=128,
    inter_channels=32, hidden_channels=32,
    upsample_initial_channel=64, upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    gin_channels=32,
    enc_q_layers=4, flow_n_flows=2, flow_wn_layers=2,
)

B, T = 2, 256


@pytest.fixture(scope="module")
def setup():
    params = S.init_synthesizer(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(0)
    spec = jnp.asarray(np.abs(rng.standard_normal((B, T, TINY.spec_channels))).astype(np.float32))
    lens = jnp.asarray([T, T - 37], jnp.int32)
    g_src = jnp.asarray(rng.standard_normal((B, 1, TINY.gin_channels)).astype(np.float32) * 0.2)
    g_tgt = jnp.asarray(rng.standard_normal((B, 1, TINY.gin_channels)).astype(np.float32) * 0.2)
    noise = jnp.asarray(rng.standard_normal((B, T, TINY.inter_channels)).astype(np.float32))
    return params, spec, lens, g_src, g_tgt, noise


def test_required_halo_reasonable():
    h = SP.required_halo(TINY)
    assert 8 < h < T // 4, h
    # full-size config: enc_q 32 + flows 64 + vocoder tail
    from openvoice_tpu.config import V2_CONVERTER_CONFIG
    assert 96 < SP.required_halo(V2_CONVERTER_CONFIG) < 160


def test_sequence_parallel_matches_single_device(setup):
    params, spec, lens, g_src, g_tgt, noise = setup
    ref, _ = S.voice_conversion(params, TINY, spec, lens, g_src, g_tgt, 0.3, noise)

    mesh = make_mesh(8, data=2, model=4)
    out = SP.voice_conversion_sp(
        params, TINY, spec, lens, g_src, g_tgt, 0.3, noise,
        mesh=mesh, axis="model",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_sequence_parallel_rejects_short_shards(setup):
    params, spec, lens, g_src, g_tgt, noise = setup
    mesh = make_mesh(8, data=1, model=8)
    with pytest.raises(ValueError, match="halo"):
        SP.voice_conversion_sp(
            params, TINY, spec[:, :64], lens, g_src, g_tgt, 0.3, noise[:, :64],
            mesh=mesh, axis="model", halo=60,
        )


def test_tensor_parallel_generator_matches_single_device(setup):
    """Channel-sharded HiFi-GAN inference (TP): params placed via the
    runtime/mesh.py param rules, forward jitted over a {data:2, model:4}
    mesh, output must equal the single-device result.  Proves the
    param_spec rules work outside the training step (VERDICT r1 §2.3)."""
    from functools import partial

    from openvoice_tpu.nn.hifigan import apply_generator
    from openvoice_tpu.runtime.mesh import batch_sharding, params_shardings, shard_params

    params, spec, lens, g_src, g_tgt, noise = setup
    rng = np.random.default_rng(5)
    z = jnp.asarray(rng.standard_normal((B, T, TINY.inter_channels)).astype(np.float32))

    fwd = partial(
        apply_generator,
        resblock_kind=TINY.resblock,
        resblock_dilation_sizes=TINY.resblock_dilation_sizes,
        upsample_rates=TINY.upsample_rates,
        upsample_kernel_sizes=TINY.upsample_kernel_sizes,
    )
    ref = fwd(params["dec"], z, g=g_tgt)

    mesh = make_mesh(8, data=2, model=4)
    sharded = shard_params(params, mesh)["dec"]
    # the rules must actually shard the wide decoder tensors on this mesh
    specs = params_shardings(params, mesh)["dec"]
    assert specs["conv_pre"]["w"].spec == jax.sharding.PartitionSpec(None, None, "model")
    assert specs["ups"][0]["w"].spec == jax.sharding.PartitionSpec(None, "model", None)

    z_sh = jax.device_put(z, batch_sharding(mesh))
    g_sh = jax.device_put(g_tgt, batch_sharding(mesh))
    out = jax.jit(fwd)(sharded, z_sh, g=g_sh)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_tensor_parallel_voice_conversion_matches_single_device(setup):
    """Full convert graph with TP-sharded params + DP-sharded batch on the
    8-device virtual mesh: the GSPMD-partitioned graph must reproduce the
    single-device numerics."""
    params, spec, lens, g_src, g_tgt, noise = setup
    ref, _ = S.voice_conversion(params, TINY, spec, lens, g_src, g_tgt, 0.3, noise)

    from openvoice_tpu.runtime.mesh import batch_sharding, shard_params

    mesh = make_mesh(8, data=2, model=4)
    sharded = shard_params(params, mesh)
    bs = batch_sharding(mesh)
    args = [jax.device_put(a, bs) for a in (spec, lens, g_src, g_tgt, noise)]
    out, _ = jax.jit(
        lambda p, s, l, gs, gt, n: S.voice_conversion(p, TINY, s, l, gs, gt, 0.3, n)
    )(sharded, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_streaming_matches_one_shot():
    """Blockwise streaming conversion (runtime/streaming.py) must equal the
    one-shot graph: interior chunks see identical neighbor frames, edge
    chunks identical zero padding, noise sliced at global positions."""
    from openvoice_tpu.runtime.streaming import voice_conversion_streaming

    rng = np.random.default_rng(11)
    B, T = 2, 200
    params = S.init_synthesizer(jax.random.PRNGKey(0), TINY)
    spec = jnp.asarray(np.abs(rng.standard_normal((B, T, TINY.spec_channels))).astype(np.float32))
    g_src = jnp.asarray(rng.standard_normal((B, 1, TINY.gin_channels)).astype(np.float32) * 0.2)
    g_tgt = jnp.asarray(rng.standard_normal((B, 1, TINY.gin_channels)).astype(np.float32) * 0.2)
    noise = jnp.asarray(rng.standard_normal((B, T, TINY.inter_channels)).astype(np.float32))
    lens = jnp.asarray([T, T - 57], jnp.int32)

    ref, _ = S.voice_conversion(params, TINY, spec, lens, g_src, g_tgt, 0.3, noise)
    h = SP.required_halo(TINY)
    got = voice_conversion_streaming(
        params, TINY, spec, lens, g_src, g_tgt, 0.3, noise,
        chunk_frames=64, halo=h,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)
