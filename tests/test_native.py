"""Native C++ audio runtime vs the Python reference implementations."""

import numpy as np
import pytest

from openvoice_tpu.audio import io as aio
from openvoice_tpu.audio import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built (cmake -S native -B native/build)"
)


def test_wav_roundtrip_native(tmp_path):
    rng = np.random.default_rng(0)
    x = np.clip(rng.standard_normal(22050) * 0.3, -0.999, 0.999).astype(np.float32)
    p = str(tmp_path / "n.wav")
    native.wav_write(p, x, 22050)
    y, sr = native.wav_read(p)
    assert sr == 22050
    np.testing.assert_allclose(x, y, atol=1.0 / 16000)


def test_wav_cross_compat(tmp_path):
    """C++ writer ↔ Python reader and vice versa."""
    rng = np.random.default_rng(1)
    x = np.clip(rng.standard_normal(8000) * 0.5, -0.999, 0.999).astype(np.float32)
    p1 = str(tmp_path / "a.wav")
    native.wav_write(p1, x, 16000)
    y1, sr1 = aio.read_wav(p1)
    assert sr1 == 16000
    np.testing.assert_allclose(x, y1, atol=1.0 / 16000)

    p2 = str(tmp_path / "b.wav")
    aio.write_wav(p2, x, 16000)
    y2, sr2 = native.wav_read(p2)
    assert sr2 == 16000
    np.testing.assert_allclose(x, y2, atol=1.0 / 16000)


def test_native_resample_matches_scipy():
    sr0, sr1 = 44100, 22050
    t = np.arange(sr0) / sr0
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    y_native = native.resample(x, sr0, sr1)
    y_py = aio.resample(x, sr0, sr1)
    assert abs(len(y_native) - len(y_py)) <= 1
    n = min(len(y_native), len(y_py))
    # same passband content; interior agreement is tight
    np.testing.assert_allclose(y_native[100 : n - 100], y_py[100 : n - 100], atol=5e-3)


def test_native_vad_matches_python():
    from openvoice_tpu.pipeline.se_extractor import energy_vad as py_vad

    sr = 16000
    t = np.arange(sr) / sr
    tone = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    audio = np.concatenate([np.zeros(2 * sr, np.float32), tone, np.zeros(2 * sr, np.float32)])
    segs_native = native.energy_vad(audio, sr)
    segs_py = py_vad(audio, sr)
    assert segs_native == segs_py


def test_prefetch_loader(tmp_path):
    rng = np.random.default_rng(2)
    paths = []
    for i in range(5):
        x = (rng.standard_normal(44100) * 0.2).astype(np.float32)
        p = str(tmp_path / f"clip{i}.wav")
        aio.write_wav(p, x, 44100, subtype="float32")
        paths.append(p)

    loader = native.PrefetchLoader(n_threads=3, target_sr=22050)
    try:
        for p in paths:
            loader.submit(p)
        got = []
        for _ in paths:
            ticket, clip = loader.next()
            assert clip is not None
            assert abs(len(clip) - 22050) <= 2  # resampled to half rate
            got.append(ticket)
        assert got == sorted(got), "clips must arrive in submission order"
    finally:
        loader.close()


def test_prefetch_loader_error_isolated(tmp_path):
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"garbage")
    good = str(tmp_path / "good.wav")
    aio.write_wav(good, np.zeros(1000, np.float32), 22050)

    loader = native.PrefetchLoader(n_threads=1, target_sr=22050)
    try:
        loader.submit(bad)
        loader.submit(good)
        t0, clip0 = loader.next()
        assert clip0 is None  # decode error reported, not fatal
        t1, clip1 = loader.next()
        assert clip1 is not None and len(clip1) == 1000
    finally:
        loader.close()


def test_mp3_reports_unsupported_cleanly():
    rc_expected = ValueError
    with pytest.raises(rc_expected):
        from openvoice_tpu.audio import native as n

        # decode of a non-mp3 file errors; the full decoder lands separately
        import tempfile, os

        with tempfile.NamedTemporaryFile(suffix=".mp3", delete=False) as f:
            f.write(b"\x00" * 100)
            path = f.name
        try:
            lib = n._load()
            import ctypes

            buf = ctypes.POINTER(ctypes.c_float)()
            sr = ctypes.c_int(0)
            ch = ctypes.c_int(0)
            rc = lib.ovt_mp3_decode(path.encode(), ctypes.byref(buf), ctypes.byref(sr), ctypes.byref(ch))
            if rc < 0:
                raise ValueError(f"mp3 decode failed cleanly ({rc})")
        finally:
            os.unlink(path)


def test_mp3_encode_decode_roundtrip(tmp_path):
    """lame encode → mpg123 decode: length bounded by codec delay/flush
    padding, and the tone's spectral peak is preserved at 128 kbps."""
    from openvoice_tpu.audio.mp3 import encoder_available, read_mp3, write_mp3

    if not encoder_available():
        pytest.skip("libmp3lame not available")

    sr = 22050
    t = np.arange(3 * sr) / sr
    x = (0.3 * np.sin(2 * np.pi * 220 * t) + 0.1 * np.sin(2 * np.pi * 880 * t)).astype(
        np.float32
    )
    p = str(tmp_path / "rt.mp3")
    write_mp3(p, x, sr, kbps=128)
    y, sr2 = read_mp3(p)
    assert sr2 == sr
    # decoder output = input + encoder delay + flush padding (< 4608 = 4 granules)
    assert len(x) <= len(y) <= len(x) + 4608
    assert abs(float(np.sqrt((y**2).mean())) - float(np.sqrt((x**2).mean()))) < 0.02
    spec = np.abs(np.fft.rfft(y[: 2 * sr]))
    freqs = np.fft.rfftfreq(2 * sr, 1.0 / sr)
    peak = freqs[int(np.argmax(spec))]
    assert abs(peak - 220.0) < 2.0


def test_mp3_encode_stereo_and_bad_args(tmp_path):
    from openvoice_tpu.audio.mp3 import encoder_available, read_mp3, write_mp3

    if not encoder_available():
        pytest.skip("libmp3lame not available")

    sr = 22050
    rng = np.random.default_rng(0)
    x = np.clip(rng.standard_normal((sr, 2)) * 0.1, -1, 1).astype(np.float32)
    p = str(tmp_path / "st.mp3")
    write_mp3(p, x, sr, kbps=96)
    y, sr2 = read_mp3(p)
    assert sr2 == sr and y.ndim == 2 and y.shape[1] == 2
    with pytest.raises(ValueError):
        write_mp3(str(tmp_path / "bad.mp3"), x, sr, kbps=-5)


def test_mp3_effective_kbps_table():
    """The advertised bitrate is the MPEG-table clamp, not the request
    (lame silently clamps: 192 @ 22.05 kHz → 160 — ADVICE r4)."""
    from openvoice_tpu.audio.mp3 import effective_kbps

    assert effective_kbps(22050, 192) == 160   # MPEG-2 ceiling
    assert effective_kbps(22050, 320) == 160
    assert effective_kbps(22050, 128) == 128
    assert effective_kbps(22050, 100) == 96    # round down to table entry
    assert effective_kbps(44100, 192) == 192   # MPEG-1 table allows it
    assert effective_kbps(44100, 20) == 32     # below table → minimum
    assert effective_kbps(16000, 4) == 8
    with pytest.raises(ValueError):
        effective_kbps(22050, 0)


def test_ogg_encode_decode_roundtrip(tmp_path):
    """vorbisenc encode → vorbisfile decode: Vorbis is sample-exact in
    length (no codec delay) and preserves the tone's spectral peak."""
    from openvoice_tpu.audio.ogg import available, read_ogg, write_ogg

    if not available():
        pytest.skip("system vorbis libraries not available")
    sr = 22050
    t = np.arange(3 * sr) / sr
    x = (0.3 * np.sin(2 * np.pi * 220 * t) + 0.1 * np.sin(2 * np.pi * 880 * t)).astype(
        np.float32
    )
    p = str(tmp_path / "rt.ogg")
    write_ogg(p, x, sr, quality=0.4)
    y, sr2 = read_ogg(p)
    assert sr2 == sr and len(y) == len(x)
    assert abs(float(np.sqrt((y**2).mean())) - float(np.sqrt((x**2).mean()))) < 0.02
    spec = np.abs(np.fft.rfft(y[: 2 * sr]))
    peak = np.fft.rfftfreq(2 * sr, 1.0 / sr)[int(np.argmax(spec))]
    assert abs(peak - 220.0) < 2.0
    # stereo + load_audio dispatch
    st = np.stack([x, -x], axis=1)
    p2 = str(tmp_path / "st.ogg")
    write_ogg(p2, st, sr, quality=0.2)
    w, _ = read_ogg(p2)
    assert w.ndim == 2 and w.shape == st.shape
    from openvoice_tpu.audio import load_audio

    z, zr = load_audio(p, sr=16000)
    assert zr == 16000 and z.ndim == 1
