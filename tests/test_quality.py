"""Cloning-quality metric harness (training/quality.py): behavioral
thresholds for MCD and SE-cosine.  The recorded before/after numbers on
real audio come from benchmarks/train_real_demo.py (docs/BENCH.md)."""

import numpy as np
import pytest

from openvoice_tpu.training.quality import cosine, mcd, mel_cepstra, se_cosine

SR = 22050


def _clip(freq: float, seconds: float = 1.5, noise: float = 0.0, seed: int = 0):
    t = np.arange(int(seconds * SR)) / SR
    x = 0.3 * np.sin(2 * np.pi * freq * t)
    if noise:
        x = x + noise * np.random.default_rng(seed).standard_normal(len(t))
    return np.clip(x, -1, 1).astype(np.float32)


def test_mcd_identity_is_zero():
    x = _clip(220, noise=0.02)
    assert mcd(x, x, SR) == 0.0


def test_mcd_monotone_in_distortion():
    x = _clip(220)
    d_small = mcd(x, np.clip(x + 0.01 * _clip(900), -1, 1), SR)
    d_large = mcd(x, np.clip(x + 0.2 * _clip(900), -1, 1), SR)
    assert 0 < d_small < d_large


def test_mcd_discriminates_speakers_better_than_noise_floor():
    """Different spectral content (different 'speaker') must register far
    above a tiny-perturbation floor."""
    a, b = _clip(220, noise=0.02), _clip(520, noise=0.02, seed=3)
    floor = mcd(a, np.clip(a + 0.005 * np.random.default_rng(1)
                           .standard_normal(len(a)).astype(np.float32), -1, 1), SR)
    assert mcd(a, b, SR) > 3 * floor


def test_mcd_truncates_length_mismatch_and_rejects_empty():
    x = _clip(220)
    # trailing mismatch → frame truncation; only the boundary frames differ
    # (reflect padding sees different tails), so the distortion stays tiny
    assert mcd(x, x[: len(x) - 700], SR) < 1.5
    with pytest.raises(ValueError):
        mcd(x[:10], x[:10], SR)


def test_mel_cepstra_shape():
    c = mel_cepstra(_clip(220), SR, n_mcc=13)
    assert c.ndim == 2 and c.shape[1] == 13 and len(c) > 50


def test_cosine_basics():
    a = np.array([1.0, 0.0]); b = np.array([0.0, 1.0])
    assert cosine(a, a) == pytest.approx(1.0)
    assert cosine(a, -a) == pytest.approx(-1.0)
    assert cosine(a, b) == pytest.approx(0.0)
    assert cosine(a, np.zeros(2)) == 0.0


@pytest.fixture(scope="module")
def tiny_converter():
    from openvoice_tpu.api import ToneColorConverter
    from tests._elastic_child import TINY

    conv = ToneColorConverter(cfg=TINY, enable_watermark=False)
    conv.init_random()
    return conv


def test_se_cosine_self_is_one_and_orders_speakers(tiny_converter):
    """A clip is maximally similar to its OWN embedding, and a same-'speaker'
    clip (same timbre, different take) scores above a different one —
    the ordering the cloning metric relies on."""
    conv = tiny_converter
    a1 = _clip(220, noise=0.03, seed=1)
    a2 = _clip(220, noise=0.03, seed=2)   # same timbre, different noise take
    b = _clip(620, noise=0.03, seed=3)    # different timbre
    se_a1 = conv._se_from_audio_batch([a1])
    assert se_cosine(conv, a1, se_a1) == pytest.approx(1.0, abs=1e-5)
    same = se_cosine(conv, a2, se_a1)
    other = se_cosine(conv, b, se_a1)
    assert same > other, (same, other)
