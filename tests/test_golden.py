"""Checked-in golden fixtures (SURVEY.md §4 item 4): pinned-weight,
noise-free outputs of the two flagship graphs, regenerated only on a
deliberate numerics change.  Catches silent cross-round regressions that
relative tests (jax-vs-torch with shared FRESH weights) cannot — e.g. an
RNG-order change in init, a kernel rewrite that drifts, or an altered
default someone forgot was checkpoint-contract.

Regenerate (and justify in the commit message) with:
    python tests/_regen_golden.py
"""

import numpy as np

from tests._regen_golden import GOLDEN_DIR, convert_case, tts_case


def test_golden_convert_audio():
    audio = convert_case()
    ref = np.load(GOLDEN_DIR / "convert_audio_tiny.npy")
    assert audio.shape == ref.shape
    np.testing.assert_allclose(audio, ref, atol=2e-5, rtol=1e-4)


def test_golden_tts_audio():
    audio = tts_case()
    ref = np.load(GOLDEN_DIR / "tts_audio_tiny.npy")
    assert audio.shape == ref.shape
    np.testing.assert_allclose(audio, ref, atol=2e-5, rtol=1e-4)
