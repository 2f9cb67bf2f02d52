"""Length bucketing + batch planning (runtime/bucketing.py).

The reference has no batching at all (batch=1 Python loops,
/root/reference/openvoice/api.py:80-92 and api.py:141-160); bucketing and
the group planner are new TPU-side components, so they get their own unit
coverage: table semantics, DP optimality against brute force, and the
masked inertness of planner-introduced padding rows through the full
conversion graph.
"""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvoice_tpu.runtime.bucketing import (
    DEFAULT_BUCKETS,
    FINE_BUCKETS,
    allowed_batch_sizes,
    pad_to_bucket,
    plan_groups,
    round_up_to_bucket,
)


def test_round_up_basic():
    assert round_up_to_bucket(1) == DEFAULT_BUCKETS[0]
    assert round_up_to_bucket(64) == 64
    assert round_up_to_bucket(65) == 128
    for b in DEFAULT_BUCKETS:
        assert round_up_to_bucket(b) == b


def test_round_up_beyond_table_is_lane_aligned_and_monotone():
    prev = 0
    for n in range(4097, 20000, 997):
        b = round_up_to_bucket(n)
        assert b >= n
        assert b % 128 == 0
        assert b >= prev
        prev = b


def test_fine_buckets_are_lane_aligned_and_bounded_growth():
    assert all(b % 64 == 0 for b in FINE_BUCKETS)
    for a, b in zip(FINE_BUCKETS, FINE_BUCKETS[1:]):
        assert b > a
        if a >= 256:  # absolute waste at the bottom of the table is tiny
            assert b / a <= 1.25 + 1e-9  # rounding waste stays bounded


def test_pad_to_bucket_roundtrip():
    x = np.arange(2 * 100 * 3, dtype=np.float32).reshape(2, 100, 3)
    padded, n = pad_to_bucket(x, axis=1)
    assert n == 100
    assert padded.shape == (2, round_up_to_bucket(100), 3)
    np.testing.assert_array_equal(padded[:, :100], x)
    assert not padded[:, 100:].any()


def _plan_cost(plan, fixed):
    return sum(pb * bucket + fixed for _, bucket, pb in plan)


def _brute_force_cost(lengths, max_batch, batch_sizes, fixed, buckets):
    """Min cost over every partition into groups of size ≤ max_batch (group
    membership unrestricted — validates the planner's sorted-contiguity
    argument too)."""
    n = len(lengths)
    best = [float("inf")] * (1 << n)
    best[0] = 0.0
    allowed = sorted(b for b in batch_sizes if b <= max_batch)

    def row_pad(k):
        return next(b for b in allowed if b >= k)

    # iterate subsets; for each, peel off one group containing the lowest set bit
    for mask in range(1, 1 << n):
        low = (mask & -mask).bit_length() - 1
        rest = mask & ~(1 << low)
        # all subgroups of `rest` joined with `low`
        sub = rest
        while True:
            group = sub | (1 << low)
            k = bin(group).count("1")
            if k <= max_batch:
                mx = max(lengths[i] for i in range(n) if group & (1 << i))
                c = best[mask & ~group] + row_pad(k) * round_up_to_bucket(mx, buckets) + fixed
                if c < best[mask]:
                    best[mask] = c
            if sub == 0:
                break
            sub = (sub - 1) & rest
    return best[(1 << n) - 1]


@pytest.mark.parametrize("seed", range(4))
def test_plan_groups_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(10, 1200, size=7).tolist()
    kw = dict(max_batch=4, batch_sizes=(1, 2, 4), fixed_cost_frames=64)
    plan = plan_groups(lengths, **kw)
    got = _plan_cost(plan, 64)
    want = _brute_force_cost(lengths, 4, (1, 2, 4), 64, FINE_BUCKETS)
    assert got == pytest.approx(want)


def test_plan_groups_structure():
    lengths = [100, 700, 120, 90, 710, 95, 105, 130]
    plan = plan_groups(lengths, max_batch=4)
    covered = sorted(i for idx, _, _ in plan for i in idx)
    assert covered == list(range(len(lengths)))  # exact partition
    for idx, bucket, padded_batch in plan:
        assert padded_batch >= len(idx)
        assert padded_batch in (1, 2, 4)
        assert bucket >= max(lengths[i] for i in idx)
        assert bucket in FINE_BUCKETS or bucket % 128 == 0
    # similar lengths cluster together: the two ~700s share a group
    g_long = [idx for idx, _, _ in plan if 1 in idx][0]
    assert 4 in g_long


def test_allowed_batch_sizes():
    assert allowed_batch_sizes(8) == (1, 2, 4, 8)
    assert allowed_batch_sizes(1) == (1,)
    # non-pow2 and >8 caps are honored, not silently clipped
    assert allowed_batch_sizes(6) == (1, 2, 4, 6)
    assert allowed_batch_sizes(16) == (1, 2, 4, 8, 16)


def test_plan_groups_honors_large_max_batch():
    plan = plan_groups([100] * 16, max_batch=16)
    assert len(plan) == 1
    idx, _, padded_batch = plan[0]
    assert len(idx) == 16 and padded_batch == 16


def test_plan_groups_empty_and_single():
    assert plan_groups([]) == []
    (idx, bucket, pb), = plan_groups([300])
    assert idx == [0] and bucket == round_up_to_bucket(300, FINE_BUCKETS) and pb == 1


def test_zero_length_rows_are_inert():
    """Planner row padding sends length-0 rows through the graph; they must
    not change real rows' outputs (prefix-mask semantics everywhere)."""
    from openvoice_tpu.config import SynthesizerConfig
    from openvoice_tpu.models import synthesizer as S

    cfg = SynthesizerConfig(
        n_speakers=0, zero_g=True,
        spec_channels=65, filter_length=128, hop_length=32, win_length=128,
        inter_channels=32, hidden_channels=32,
        upsample_initial_channel=64, upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        gin_channels=32,
        enc_q_layers=4, flow_n_flows=2, flow_wn_layers=2,
    )
    params = S.init_synthesizer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    t = 128
    spec1 = np.abs(rng.standard_normal((1, t, cfg.spec_channels))).astype(np.float32)
    g = rng.standard_normal((1, 1, cfg.gin_channels)).astype(np.float32) * 0.2
    noise1 = rng.standard_normal((1, t, cfg.inter_channels)).astype(np.float32)

    audio1, _ = S.voice_conversion(
        params, cfg, jnp.asarray(spec1), jnp.asarray([t], jnp.int32),
        jnp.asarray(g), jnp.asarray(g), 0.3, jnp.asarray(noise1),
    )

    # same request + one zero-length padding row
    spec2 = np.concatenate([spec1, np.zeros_like(spec1)], axis=0)
    noise2 = np.concatenate([noise1, rng.standard_normal((1, t, cfg.inter_channels)).astype(np.float32)], axis=0)
    g2 = np.concatenate([g, np.zeros_like(g)], axis=0)
    audio2, _ = S.voice_conversion(
        params, cfg, jnp.asarray(spec2), jnp.asarray([t, 0], jnp.int32),
        jnp.asarray(g2), jnp.asarray(g2), 0.3, jnp.asarray(noise2),
    )
    np.testing.assert_allclose(
        np.asarray(audio2)[0], np.asarray(audio1)[0], rtol=0, atol=1e-5
    )
