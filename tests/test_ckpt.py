"""Checkpoint IO tests: npz and orbax round trips, resume step discovery."""

import numpy as np
import pytest

import jax

from openvoice_tpu.ckpt import native_io as CIO
from openvoice_tpu.config import SynthesizerConfig
from openvoice_tpu.models import synthesizer as S

TINY = SynthesizerConfig(
    n_speakers=0, zero_g=True,
    spec_channels=65, filter_length=128, hop_length=32, win_length=128,
    inter_channels=32, hidden_channels=32,
    upsample_initial_channel=64, upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    gin_channels=32, enc_q_layers=4, flow_n_flows=2, flow_wn_layers=2,
)


def _assert_trees_equal(a, b):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.fixture(scope="module")
def params():
    return S.init_synthesizer(jax.random.PRNGKey(0), TINY)


def test_npz_roundtrip(params, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("npz") / "params.npz")
    CIO.save_npz(path, params)
    restored = CIO.load_npz(path)
    _assert_trees_equal(params, restored)


def test_orbax_roundtrip(params, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("orbax") / "ckpt")
    CIO.save_checkpoint(d, params)
    restored = CIO.load_checkpoint(d, template=params)
    _assert_trees_equal(params, restored)


def test_step_management(params, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("steps"))
    assert CIO.latest_step(d) is None
    CIO.save_checkpoint(d, {"w": np.ones(3)}, step=10)
    CIO.save_checkpoint(d, {"w": np.full(3, 2.0)}, step=20)
    assert CIO.latest_step(d) == 20
    restored = CIO.load_checkpoint(f"{d}/step_20")
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.full(3, 2.0))


def test_npz_tolerates_none_gaps(tmp_path_factory):
    import numpy as np
    path = str(tmp_path_factory.mktemp("gaps") / "t.npz")
    tree = {"xs": [np.ones(2), None, np.full(2, 3.0)], "cond": None}
    CIO.save_npz(path, tree)
    restored = CIO.load_npz(path)
    assert len(restored["xs"]) == 2  # None leaf dropped, order kept
    np.testing.assert_array_equal(restored["xs"][1], np.full(2, 3.0))
