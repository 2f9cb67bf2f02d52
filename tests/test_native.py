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


# ---------------------------------------------------------------------------
# FLAC (from-scratch codec, native/src/flac.cc — no system library)
# ---------------------------------------------------------------------------


def _pcm16(x: np.ndarray) -> np.ndarray:
    """llround-matching PCM16 quantizer (half away from zero)."""
    v = np.clip(x, -1, 1).astype(np.float64) * 32767.0
    return (np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)) / 32768.0).astype(
        np.float32
    )


def _flac_or_skip():
    from openvoice_tpu.audio import flac

    if not flac.available():
        pytest.skip("native lib not built")
    return flac


def test_flac_roundtrip_lossless_mono(tmp_path):
    """FLAC is lossless: decode returns exactly the PCM16 quantization of
    the input.  Signal mixes silence (CONSTANT subframes), tones (LPC), and
    noise (FIXED/verbatim-ish) so every encoder predictor class is hit."""
    flac = _flac_or_skip()
    sr = 22050
    rng = np.random.default_rng(5)
    t = np.arange(5 * sr) / sr
    x = np.clip(
        0.3 * np.sin(2 * np.pi * 220 * t) + 0.15 * np.sin(2 * np.pi * 733 * t)
        + 0.05 * rng.standard_normal(len(t)), -1, 1,
    ).astype(np.float32)
    x[:5000] = 0.0
    p = str(tmp_path / "m.flac")
    flac.write_flac(p, x, sr)
    y, sr2 = flac.read_flac(p)
    assert sr2 == sr and y.shape == x.shape
    np.testing.assert_array_equal(y, _pcm16(x))
    # and it actually compresses vs raw PCM16
    import os as _os

    assert _os.path.getsize(p) < 2 * len(x)


def test_flac_roundtrip_stereo_and_odd_lengths(tmp_path):
    flac = _flac_or_skip()
    sr = 16000
    rng = np.random.default_rng(6)
    for n in (1, 15, 100, 4096, 4097, 10000):
        x = np.clip(0.2 * rng.standard_normal((n, 2)), -1, 1).astype(np.float32)
        p = str(tmp_path / f"s{n}.flac")
        flac.write_flac(p, x, sr)
        y, sr2 = flac.read_flac(p)
        assert sr2 == sr and y.shape == x.shape, n
        np.testing.assert_array_equal(y, _pcm16(x))


def test_flac_tonal_compression(tmp_path):
    """A pure tone must compress hard (LPC predictor working): < 60% of
    PCM16 size."""
    flac = _flac_or_skip()
    sr = 22050
    t = np.arange(4 * sr) / sr
    x = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "tone.flac")
    flac.write_flac(p, x, sr)
    import os as _os

    assert _os.path.getsize(p) < 0.6 * 2 * len(x)
    y, _ = flac.read_flac(p)
    np.testing.assert_array_equal(y, _pcm16(x))


class _FlacBits:
    """MSB-first bit writer for hand-crafting spec-surface FLAC streams."""

    def __init__(self):
        self.bytes_ = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, v, bits):
        self.acc = (self.acc << bits) | (int(v) & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.bytes_.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8

    def unary(self, q):
        for _ in range(q):
            self.w(0, 1)
        self.w(1, 1)

    def align(self):
        if self.n:
            self.w(0, 8 - self.n)


def _crc8(data):
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data):
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _zigzag(v):
    return -2 * v - 1 if v < 0 else 2 * v


def test_flac_decodes_spec_surface_features(tmp_path):
    """Decoder robustness on a hand-crafted stream using features our
    encoder never emits: mid/side and left/side decorrelation, VERBATIM
    subframes, wasted bits, Rice2 (5-bit param) residuals, partition order
    2, escape partitions, and the 8-bit blocksize-at-end header code.
    Ground truth is constructed sample-exactly in the test."""
    flac = _flac_or_skip()
    rng = np.random.default_rng(9)
    bs = 64
    left1 = rng.integers(-2000, 2000, bs).astype(np.int64)
    right1 = rng.integers(-2000, 2000, bs).astype(np.int64)
    # frame 2: left constant (with wasted bits), right slow ramp
    left2 = np.full(bs, 0x0123 << 2, np.int64)
    right2 = (np.arange(bs) * 3 - 50).astype(np.int64)

    b = _FlacBits()
    b.bytes_ += b"fLaC"
    # STREAMINFO: last block, type 0, len 34
    b.w(1, 1); b.w(0, 7); b.w(34, 24)
    b.w(bs, 16); b.w(bs, 16); b.w(0, 24); b.w(0, 24)
    b.w(44100, 20); b.w(1, 3); b.w(15, 5); b.w(2 * bs, 36)
    for _ in range(16):
        b.w(0, 8)

    def frame_header(ch_assign, frame_no):
        start = len(b.bytes_)
        b.w(0x3FFE, 14); b.w(0, 1); b.w(0, 1)
        b.w(6, 4)            # blocksize: 8-bit at end
        b.w(9, 4)            # 44.1 kHz
        b.w(ch_assign, 4)
        b.w(4, 3); b.w(0, 1)  # 16-bit, reserved
        b.w(frame_no, 8)      # UTF-8 (< 0x80)
        b.w(bs - 1, 8)        # blocksize - 1
        b.w(_crc8(b.bytes_[start:]), 8)
        return start

    # ---- frame 1: mid/side; mid = VERBATIM, side = FIXED-1 + Rice2 po=2
    mid = (left1 + right1) >> 1
    side = left1 - right1
    start = frame_header(10, 0)
    b.w(0, 1); b.w(1, 6); b.w(0, 1)          # VERBATIM, no wasted
    for v in mid:
        b.w(int(v), 16)
    b.w(0, 1); b.w(0x08 | 1, 6); b.w(0, 1)   # FIXED order 1 (side: 17 bit)
    b.w(int(side[0]), 17)
    res = np.diff(side)                       # residuals for i >= 1
    b.w(1, 2)                                 # method 1: Rice2
    b.w(2, 4)                                 # partition order 2 → 4 × 16
    idx = 0
    for p in range(4):
        count = 16 - (1 if p == 0 else 0)
        chunk = res[idx : idx + count]
        idx += count
        if p == 2:                            # escape partition: raw 15-bit
            b.w(31, 5); b.w(15, 5)
            for v in chunk:
                b.w(int(v), 15)
        else:
            k = 4
            b.w(k, 5)
            for v in chunk:
                z = _zigzag(int(v))
                b.unary(z >> k)
                b.w(z & ((1 << k) - 1), k)
    b.align()
    b.w(_crc16(b.bytes_[start:]), 16)

    # ---- frame 2: left/side; left = CONSTANT with 2 wasted bits,
    #              side = FIXED-0 (verbatim-via-residual) Rice po=0
    side2 = left2 - right2
    start = frame_header(8, 1)
    b.w(0, 1); b.w(0, 6)                      # CONSTANT
    b.w(1, 1); b.unary(1)                     # wasted flag, k-1=1 → k=2
    b.w(0x0123, 14)                           # 16-2 bits
    b.w(0, 1); b.w(0x08 | 0, 6); b.w(0, 1)    # FIXED order 0 (17 bit)
    b.w(0, 2); b.w(0, 4)                      # Rice, po=0
    k = 6
    b.w(k, 4)
    for v in side2:
        z = _zigzag(int(v))
        b.unary(z >> k)
        b.w(z & ((1 << k) - 1), k)
    b.align()
    b.w(_crc16(b.bytes_[start:]), 16)

    p = str(tmp_path / "crafted.flac")
    open(p, "wb").write(bytes(b.bytes_))
    y, sr = flac.read_flac(p)
    assert sr == 44100 and y.shape == (2 * bs, 2)
    got = np.round(y * 32768.0).astype(np.int64)
    np.testing.assert_array_equal(got[:bs, 0], left1)
    np.testing.assert_array_equal(got[:bs, 1], right1)
    np.testing.assert_array_equal(got[bs:, 0], left2)
    np.testing.assert_array_equal(got[bs:, 1], right2)


def test_flac_rejects_corrupt_input(tmp_path):
    flac = _flac_or_skip()
    sr = 8000
    x = np.clip(0.2 * np.random.default_rng(0).standard_normal(9000), -1, 1).astype(
        np.float32
    )
    p = str(tmp_path / "ok.flac")
    flac.write_flac(p, x, sr)
    blob = bytearray(open(p, "rb").read())
    # not-a-flac
    bad = str(tmp_path / "bad.flac")
    open(bad, "wb").write(b"RIFF" + bytes(blob[4:]))
    with pytest.raises(ValueError):
        flac.read_flac(bad)
    # bit flip inside a frame → CRC catches it
    flipped = bytearray(blob)
    flipped[len(flipped) // 2] ^= 0x40
    open(bad, "wb").write(bytes(flipped))
    with pytest.raises(ValueError):
        flac.read_flac(bad)
    # truncation mid-frame
    open(bad, "wb").write(bytes(blob[: len(blob) - len(blob) // 3]))
    with pytest.raises(ValueError):
        flac.read_flac(bad)
    with pytest.raises(ValueError):
        flac.read_flac(str(tmp_path / "missing.flac"))


def test_flac_load_audio_dispatch(tmp_path):
    """load_audio accepts .flac like the reference's librosa path does
    (reference api.py:144): decode → mono mixdown → resample."""
    flac = _flac_or_skip()
    from openvoice_tpu.audio.io import load_audio

    sr = 22050
    t = np.arange(2 * sr) / sr
    x = np.stack(
        [0.3 * np.sin(2 * np.pi * 220 * t), 0.3 * np.sin(2 * np.pi * 330 * t)], axis=1
    ).astype(np.float32)
    p = str(tmp_path / "d.flac")
    flac.write_flac(p, x, sr)
    a, asr = load_audio(p, sr=16000)
    assert asr == 16000 and a.ndim == 1
    assert abs(len(a) - 2 * 16000) <= 2


# ---------------------------------------------------------------------------
# m4a/aac via system ffmpeg (optional separate lib, native/src/ffdec.cc)
# ---------------------------------------------------------------------------


def _ffdec_or_skip():
    from openvoice_tpu.audio import ffdec

    if not ffdec.available():
        pytest.skip("libovt_ffdec not built (system ffmpeg missing)")
    return ffdec


def test_m4a_encode_decode_roundtrip(tmp_path):
    """AAC-in-m4a encode → decode: length within codec delay/padding, tone
    spectral peak preserved at 96 kbps."""
    ffdec = _ffdec_or_skip()
    sr = 22050
    t = np.arange(3 * sr) / sr
    x = (0.3 * np.sin(2 * np.pi * 220 * t) + 0.1 * np.sin(2 * np.pi * 880 * t)).astype(
        np.float32
    )
    p = str(tmp_path / "rt.m4a")
    ffdec.write_m4a(p, x, sr, kbps=96)
    y, sr2 = ffdec.read_any(p)
    assert sr2 == sr
    assert abs(len(y) - len(x)) < 8192  # aac encoder delay + flush padding
    spec = np.abs(np.fft.rfft(y[sr : 2 * sr]))
    freqs = np.fft.rfftfreq(sr, 1.0 / sr)
    assert abs(freqs[int(np.argmax(spec))] - 220.0) < 2.0


def test_m4a_stereo_load_audio_and_bad_input(tmp_path):
    ffdec = _ffdec_or_skip()
    from openvoice_tpu.audio.io import load_audio

    sr = 22050
    t = np.arange(sr) / sr
    xs = np.stack(
        [0.3 * np.sin(2 * np.pi * 220 * t), 0.3 * np.sin(2 * np.pi * 330 * t)], axis=1
    ).astype(np.float32)
    p = str(tmp_path / "s.m4a")
    ffdec.write_m4a(p, xs, sr)
    y, sr2 = ffdec.read_any(p)
    assert sr2 == sr and y.ndim == 2 and y.shape[1] == 2
    a, asr = load_audio(p, sr=16000)  # dispatch + mono mixdown + resample
    assert asr == 16000 and a.ndim == 1
    bad = str(tmp_path / "bad.m4a")
    open(bad, "wb").write(b"\x00" * 256)
    with pytest.raises(ValueError):
        ffdec.read_any(bad)
    with pytest.raises(ValueError):
        ffdec.write_m4a(str(tmp_path / "x.m4a"), xs, sr, kbps=-1)


def test_ffdec_cross_decodes_native_codec_output(tmp_path):
    """The universal decoder agrees with the dedicated codecs on their own
    files (independent implementations of the mp3 bitstream path)."""
    ffdec = _ffdec_or_skip()
    from openvoice_tpu.audio.mp3 import encoder_available, read_mp3, write_mp3

    if not encoder_available():
        pytest.skip("libmp3lame not available")
    sr = 22050
    t = np.arange(2 * sr) / sr
    x = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    p = str(tmp_path / "x.mp3")
    write_mp3(p, x, sr, kbps=128)
    y_native, _ = read_mp3(p)
    y_ff, ffsr = ffdec.read_any(p)
    assert ffsr == sr
    # both decoders see the same signal; allow delay-alignment wiggle
    n = min(len(y_native), len(y_ff))
    corr = np.corrcoef(y_native[:n], y_ff[:n])[0, 1]
    assert corr > 0.98, corr


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
