"""Fused MRF ResBlock-stage kernel vs the unfused XLA path (interpret mode —
kernel-golden test per SURVEY.md §4 item 1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvoice_tpu.nn.hifigan import apply_resblock1
from openvoice_tpu.ops.mrf_pallas import fused_mrf_stage, pack_stage_weights, stage_halo

KS = (3, 7, 11)
DILS = ((1, 3, 5), (1, 3, 5), (1, 3, 5))


def _random_resblocks(rng, c):
    out = []
    for k in KS:
        out.append({
            "convs1": [
                {"w": jnp.asarray(rng.standard_normal((k, c, c)).astype(np.float32)) * 0.05,
                 "b": jnp.asarray(rng.standard_normal(c).astype(np.float32)) * 0.05}
                for _ in range(3)
            ],
            "convs2": [
                {"w": jnp.asarray(rng.standard_normal((k, c, c)).astype(np.float32)) * 0.05,
                 "b": jnp.asarray(rng.standard_normal(c).astype(np.float32)) * 0.05}
                for _ in range(3)
            ],
        })
    return out


def _xla_mrf(resblocks, x, mask):
    acc = None
    for rb, d in zip(resblocks, DILS):
        r = apply_resblock1(rb, x, d, mask)
        acc = r if acc is None else acc + r
    return acc / len(resblocks)


def test_stage_halo():
    # k=11, dils (1,3,5): 5·(1+1) + 5·(3+1) + 5·(5+1) = 60
    assert stage_halo(KS, DILS) == 60


@pytest.mark.parametrize("c,t", [(64, 2500), (32, 1024), (128, 3000)])
def test_fused_matches_xla(c, t):
    rng = np.random.default_rng(c + t)
    resblocks = _random_resblocks(rng, c)
    b = 2
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32)) * 0.5
    lengths = jnp.asarray([t, max(t - 321, 8)], jnp.int32)
    mask = (jnp.arange(t)[None, :, None] < lengths[:, None, None]).astype(jnp.float32)
    x = x * mask

    ref = np.asarray(_xla_mrf(resblocks, x, mask))
    w_all, b_all, _ = pack_stage_weights(resblocks, KS, DILS, dtype=jnp.float32)
    out = np.asarray(
        fused_mrf_stage(
            x, lengths, w_all, b_all,
            kernel_sizes=KS, dilation_sizes=DILS, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize(
    "c,t,fold",
    [
        (32, 1030, 4),   # non-multiple t exercises fold padding
        (64, 2500, 2),
        (16, 512, 8),
    ],
)
def test_folded_matches_xla(c, t, fold):
    """Time-folded variant: [T, C] packed as [T/r, r·C] with block-structured
    folded weights must match the unfused masked path exactly."""
    rng = np.random.default_rng(7 * c + t)
    resblocks = _random_resblocks(rng, c)
    b = 2
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32)) * 0.5
    lengths = jnp.asarray([t, max(t - 157, 8)], jnp.int32)
    mask = (jnp.arange(t)[None, :, None] < lengths[:, None, None]).astype(jnp.float32)
    x = x * mask

    ref = np.asarray(_xla_mrf(resblocks, x, mask))
    w_all, b_all, _ = pack_stage_weights(resblocks, KS, DILS, dtype=jnp.float32, fold=fold)
    out = np.asarray(
        fused_mrf_stage(
            x, lengths, w_all, b_all,
            kernel_sizes=KS, dilation_sizes=DILS, fold=fold, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_streamed_weights_match_xla():
    """Weight-streaming path (stacked weights > VMEM budget → branch DMA
    from HBM) must match the resident-weights path bit-for-bit.  C=192 keeps
    the test fast while crossing the 6 MB f32 streaming threshold."""
    c, t = 192, 1500
    rng = np.random.default_rng(99)
    resblocks = _random_resblocks(rng, c)
    x = jnp.asarray(rng.standard_normal((1, t, c)).astype(np.float32)) * 0.5
    lengths = jnp.asarray([t - 93], jnp.int32)
    mask = (jnp.arange(t)[None, :, None] < lengths[:, None, None]).astype(jnp.float32)
    x = x * mask

    ref = np.asarray(_xla_mrf(resblocks, x, mask))
    w_all, b_all, _ = pack_stage_weights(resblocks, KS, DILS, dtype=jnp.float32)
    assert w_all.size * 4 > 6 * 1024 * 1024  # crosses the streaming threshold
    out = np.asarray(
        fused_mrf_stage(
            x, lengths, w_all, b_all,
            kernel_sizes=KS, dilation_sizes=DILS, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_fused_tail_matches_xla():
    """Fused decoder tail (lrelu → ConvTranspose1d → MRF → lrelu(0.01) →
    conv_post → tanh) vs the unfused XLA ops, shipped V2 tail shape
    (u=2, k_up=4, C 64→32, fold 4)."""
    from openvoice_tpu.nn.conv import conv1d, conv_transpose1d
    from openvoice_tpu.ops.mrf_pallas import fused_tail_stage, pack_tail_weights

    c_in, c_out, u, k_up = 64, 32, 2, 4
    t_in = 640
    rng = np.random.default_rng(5)
    resblocks = _random_resblocks(rng, c_out)
    up = {
        "w": jnp.asarray(rng.standard_normal((k_up, c_in, c_out)).astype(np.float32)) * 0.1,
        "b": jnp.asarray(rng.standard_normal(c_out).astype(np.float32)) * 0.1,
    }
    post_w = jnp.asarray(rng.standard_normal((7, c_out, 1)).astype(np.float32)) * 0.1

    b = 2
    x = jnp.asarray(rng.standard_normal((b, t_in, c_in)).astype(np.float32)) * 0.5
    lengths_in = jnp.asarray([t_in, t_in - 111], jnp.int32)
    mask_in = (jnp.arange(t_in)[None, :, None] < lengths_in[:, None, None]).astype(jnp.float32)
    x = x * mask_in

    # XLA reference: exactly the apply_generator tail sequence
    xt = jax.nn.leaky_relu(x, 0.1)
    y = conv_transpose1d(xt, up["w"], up["b"], stride=u, padding=(k_up - u) // 2)
    mask = jnp.repeat(mask_in, u, axis=1)
    y = y * mask
    acc = None
    for rb, d in zip(resblocks, DILS):
        r = apply_resblock1(rb, y, d, mask)
        acc = r if acc is None else acc + r
    z = jax.nn.leaky_relu(acc / len(resblocks), 0.01)
    ref = np.asarray(jnp.tanh(conv1d(z, post_w, None, padding=3)))

    fold = 128 // c_out
    w_all, b_all, up_qs, mrf_meta, post_qs = pack_tail_weights(
        up, resblocks, post_w, KS, DILS,
        stride=u, up_padding=(k_up - u) // 2, fold=fold, dtype=jnp.float32,
    )
    out = np.asarray(
        fused_tail_stage(
            x, lengths_in * u, w_all, b_all,
            kernel_sizes=KS, dilation_sizes=DILS, stride=u, fold=fold,
            up_qs=up_qs, mrf_meta=mrf_meta, post_qs=post_qs, interpret=True,
        )
    )
    assert out.shape == (b, t_in * u, 1)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_fused_up_mrf_middle_stage_matches_xla():
    """Middle-stage fusion (post_qs=None): lrelu → ConvTranspose1d → MRF,
    emitting [B, T·u, C_out] activations."""
    from openvoice_tpu.nn.conv import conv_transpose1d
    from openvoice_tpu.ops.mrf_pallas import fused_tail_stage, pack_tail_weights

    c_in, c_out, u, k_up = 128, 64, 2, 4
    t_in = 400
    rng = np.random.default_rng(9)
    resblocks = _random_resblocks(rng, c_out)
    up = {
        "w": jnp.asarray(rng.standard_normal((k_up, c_in, c_out)).astype(np.float32)) * 0.1,
        "b": jnp.asarray(rng.standard_normal(c_out).astype(np.float32)) * 0.1,
    }
    b = 2
    x = jnp.asarray(rng.standard_normal((b, t_in, c_in)).astype(np.float32)) * 0.5
    lengths_in = jnp.asarray([t_in, t_in - 83], jnp.int32)
    mask_in = (jnp.arange(t_in)[None, :, None] < lengths_in[:, None, None]).astype(jnp.float32)
    x = x * mask_in

    xt = jax.nn.leaky_relu(x, 0.1)
    y = conv_transpose1d(xt, up["w"], up["b"], stride=u, padding=(k_up - u) // 2)
    mask = jnp.repeat(mask_in, u, axis=1)
    y = y * mask
    ref = np.asarray(_xla_mrf(resblocks, y, mask))

    fold = 128 // c_out
    w_all, b_all, up_qs, mrf_meta, post_qs = pack_tail_weights(
        up, resblocks, None, KS, DILS,
        stride=u, up_padding=(k_up - u) // 2, fold=fold, dtype=jnp.float32,
    )
    assert post_qs is None
    out = np.asarray(
        fused_tail_stage(
            x, lengths_in * u, w_all, b_all,
            kernel_sizes=KS, dilation_sizes=DILS, stride=u, fold=fold,
            up_qs=up_qs, mrf_meta=mrf_meta, post_qs=None, interpret=True,
        )
    )
    assert out.shape == (b, t_in * u, c_out)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_interleaved_branches_bit_identical():
    """The round-robin branch-interleaved issue order (per-branch slack
    buffers, VPU epilogues dual-issuing under other branches' tap-matmuls)
    must be BIT-identical to the sequential order — same per-branch float
    ops, same (b0 + b1) + b2 accumulation."""
    from openvoice_tpu.ops.mrf_pallas import fused_tail_stage, pack_tail_weights

    rng = np.random.default_rng(31)
    c, t, fold = 64, 1500, 2
    resblocks = _random_resblocks(rng, c)
    x = jnp.asarray(rng.standard_normal((1, t, c)).astype(np.float32)) * 0.5
    lengths = jnp.asarray([t - 77], jnp.int32)
    mask = (jnp.arange(t)[None, :, None] < lengths[:, None, None]).astype(jnp.float32)
    x = x * mask

    w_all, b_all, _ = pack_stage_weights(resblocks, KS, DILS, dtype=jnp.float32, fold=fold)
    outs = [
        np.asarray(fused_mrf_stage(
            x, lengths, w_all, b_all, kernel_sizes=KS, dilation_sizes=DILS,
            fold=fold, interleave=ilv, interpret=True,
        ))
        for ilv in (False, True)
    ]
    np.testing.assert_array_equal(outs[0], outs[1])

    # streamed variant (weights > VMEM budget → per-conv HBM prefetch): the
    # prefetch order follows the interleaved execution order, results stay
    # bit-identical to the sequential order
    c, t = 192, 900
    resblocks = _random_resblocks(rng, c)
    x = jnp.asarray(rng.standard_normal((1, t, c)).astype(np.float32)) * 0.5
    lengths = jnp.asarray([t - 41], jnp.int32)
    w_all, b_all, _ = pack_stage_weights(resblocks, KS, DILS, dtype=jnp.float32)
    assert w_all.size * 4 > 6 * 1024 * 1024
    outs = [
        np.asarray(fused_mrf_stage(
            x, lengths, w_all, b_all, kernel_sizes=KS, dilation_sizes=DILS,
            interleave=ilv, interpret=True,
        ))
        for ilv in (False, True)
    ]
    np.testing.assert_array_equal(outs[0], outs[1])

    # tail kernel: shipped last-stage shape (u=2, C 64→32, fold 4)
    c_in, c_out, u, k_up = 64, 32, 2, 4
    resblocks = _random_resblocks(rng, c_out)
    up = {
        "w": jnp.asarray(rng.standard_normal((k_up, c_in, c_out)).astype(np.float32)) * 0.1,
        "b": jnp.asarray(rng.standard_normal(c_out).astype(np.float32)) * 0.1,
    }
    post_w = jnp.asarray(rng.standard_normal((7, c_out, 1)).astype(np.float32)) * 0.1
    t_in = 512
    x = jnp.asarray(rng.standard_normal((1, t_in, c_in)).astype(np.float32)) * 0.5
    fold = 128 // c_out
    w_all, b_all, up_qs, mrf_meta, post_qs = pack_tail_weights(
        up, resblocks, post_w, KS, DILS,
        stride=u, up_padding=(k_up - u) // 2, fold=fold, dtype=jnp.float32,
    )
    outs = [
        np.asarray(fused_tail_stage(
            x, jnp.asarray([t_in * u - 33], jnp.int32), w_all, b_all,
            kernel_sizes=KS, dilation_sizes=DILS, stride=u, fold=fold,
            up_qs=up_qs, mrf_meta=mrf_meta, post_qs=post_qs,
            interleave=ilv, interpret=True,
        ))
        for ilv in (False, True)
    ]
    np.testing.assert_array_equal(outs[0], outs[1])


def test_pack_host_matches_inline():
    """Host-side (numpy) cache packing must produce the same stacked tensors
    as the in-graph (jnp) packing for both stage and tail weights."""
    from openvoice_tpu.ops.mrf_pallas import pack_stage_weights, pack_tail_weights

    rng = np.random.default_rng(21)
    c_in, c_out, u, k_up = 128, 64, 2, 4
    resblocks = _random_resblocks(rng, c_out)
    up = {
        "w": jnp.asarray(rng.standard_normal((k_up, c_in, c_out)).astype(np.float32)),
        "b": jnp.asarray(rng.standard_normal(c_out).astype(np.float32)),
    }
    post_w = jnp.asarray(rng.standard_normal((7, c_out, 1)).astype(np.float32))

    for fold in (1, 2):
        w_j, b_j, meta_j = pack_stage_weights(resblocks, KS, DILS, dtype=jnp.float32, fold=fold)
        w_h, b_h, meta_h = pack_stage_weights(resblocks, KS, DILS, dtype=jnp.float32,
                                              fold=fold, host=True)
        assert meta_j == meta_h
        np.testing.assert_array_equal(np.asarray(w_j), np.asarray(w_h))
        np.testing.assert_array_equal(np.asarray(b_j), np.asarray(b_h))

    for pw in (post_w, None):
        out_j = pack_tail_weights(up, resblocks, pw, KS, DILS, stride=u,
                                  up_padding=1, fold=2, dtype=jnp.float32)
        out_h = pack_tail_weights(up, resblocks, pw, KS, DILS, stride=u,
                                  up_padding=1, fold=2, dtype=jnp.float32, host=True)
        assert out_j[2:] == out_h[2:]  # static metadata identical
        np.testing.assert_array_equal(np.asarray(out_j[0]), np.asarray(out_h[0]))
        np.testing.assert_array_equal(np.asarray(out_j[1]), np.asarray(out_h[1]))
