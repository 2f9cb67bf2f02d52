"""Pallas kernel tests (interpreter mode on the CPU backend; the same
kernels compile and run on real TPU — verified on v5e, see bench logs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvoice_tpu.audio.stft import _reflect_pad_1d, linear_spectrogram
from openvoice_tpu.ops.stft_pallas import stft_magnitude_pallas


@pytest.mark.parametrize("t_samples", [5000, 40961])
def test_pallas_stft_matches_xla(t_samples):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, t_samples)) * 0.3).astype(np.float32)
    padded = _reflect_pad_1d(jnp.asarray(x), (1024 - 256) // 2)
    ref = np.asarray(linear_spectrogram(jnp.asarray(x), 1024, 256, 1024))  # [B,F,T]
    out = np.asarray(stft_magnitude_pallas(padded, 1024, 256, 1024, interpret=True))
    assert out.shape == (2, ref.shape[2], ref.shape[1])
    np.testing.assert_allclose(out.transpose(0, 2, 1), ref, atol=1e-4)


def test_pallas_stft_win_shorter():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((1, 9000)) * 0.3).astype(np.float32)
    padded = _reflect_pad_1d(jnp.asarray(x), (1024 - 256) // 2)
    ref = np.asarray(linear_spectrogram(jnp.asarray(x), 1024, 256, 800))
    out = np.asarray(stft_magnitude_pallas(padded, 1024, 256, 800, interpret=True))
    np.testing.assert_allclose(out.transpose(0, 2, 1), ref, atol=1e-4)
