"""Demo: watermark abuse-chain robustness, measured live with REAL codecs.

Embeds an 8-char message (reference framing, api.py:162-201), runs each
documented abuse (docs/QA.md) — PCM16, resample round-trip, re-gain, pads,
head trims, real mp3 (in-repo lame encoder), real Opus (system libopus),
and combination chains — and prints whether the detector recovers the
message.  The reference's wavmark robustness bar is api.py:105-109.

Usage:
  python demos/demo_watermark_robustness.py [--audio path.wav|.mp3]

Default input is the bundled reference demo clip when present, else a
synthetic speech-shaped host.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from openvoice_tpu.pipeline import watermark as wm

MESSAGE = "@MyShell"
SR = 22050
DEFAULT_CLIP = "/root/reference/resources/demo_speaker0.mp3"


def speechlike(n: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(n)
    spec = np.fft.rfft(x)
    freqs = np.fft.rfftfreq(n, 1.0 / SR)
    spec *= 1.0 / (1.0 + (freqs / 500.0) ** 1.5)
    x = np.fft.irfft(spec, n)
    env = 0.4 + 0.6 * np.abs(np.sin(2 * np.pi * np.arange(n) / SR * 3.1))
    x = x * env
    return (0.15 * x / np.sqrt(np.mean(x**2))).astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--audio", default=DEFAULT_CLIP)
    args = ap.parse_args()

    if os.path.exists(args.audio):
        from openvoice_tpu.audio import load_audio

        host, _ = load_audio(args.audio, sr=SR)
        host = np.asarray(host, np.float32)
        src = args.audio
    else:
        host = speechlike(16 * 16000)
        src = "synthetic speech-shaped noise"
    marked = wm.add_watermark(host, MESSAGE)
    dist = marked - host
    print(f"host: {src} ({len(host)/SR:.1f} s)")
    print(f"embedding distortion: {20*np.log10(np.sqrt(np.mean(dist**2))):.1f} dBFS rms")

    from openvoice_tpu.audio.io import resample

    abuses: list[tuple[str, np.ndarray | None]] = [
        ("untouched", marked),
        ("PCM16 round-trip", (np.round(np.clip(marked, -1, 1) * 32767) / 32767).astype(np.float32)),
        ("22.05→16→22.05 kHz resample", np.ascontiguousarray(
            resample(resample(marked, SR, 16000), 16000, SR), np.float32)[: len(marked)]),
        ("0.6× re-gain", (marked * 0.6).astype(np.float32)),
        ("1.7× re-gain", (marked * 1.7).astype(np.float32)),
        ("8000-sample leading pad", np.concatenate([np.zeros(8000, np.float32), marked])),
        ("1 s head trim", marked[SR:]),
        ("3 s head trim", marked[3 * SR :]),
    ]

    try:
        from openvoice_tpu.audio import native
        from openvoice_tpu.audio.mp3 import encoder_available, read_mp3, write_mp3

        if native.available() and encoder_available():
            import tempfile

            for kbps in (128, 64):
                fd, path = tempfile.mkstemp(suffix=".mp3")
                os.close(fd)
                write_mp3(path, marked, SR, kbps=kbps)
                y, _ = read_mp3(path)
                os.unlink(path)
                abuses.append((f"REAL mp3 {kbps} kbps", np.asarray(y, np.float32)))
        else:
            abuses.append(("REAL mp3 (encoder not built)", None))
    except Exception as exc:  # noqa: BLE001 — demo degrades per-abuse
        abuses.append((f"REAL mp3 (error: {exc})", None))

    try:
        from openvoice_tpu.audio import opus

        if opus.available():
            for kbps in (128, 64):
                abuses.append(
                    (f"REAL Opus {kbps} kbps (incl. 24 kHz pair)",
                     opus.opus_roundtrip(marked, SR, kbps=kbps))
                )
        else:
            abuses.append(("REAL Opus (libopus missing)", None))
    except Exception as exc:  # noqa: BLE001
        abuses.append((f"REAL Opus (error: {exc})", None))

    try:
        from openvoice_tpu.audio import ogg

        if ogg.available():
            import tempfile

            for q in (0.4, 0.0):
                fd, path = tempfile.mkstemp(suffix=".ogg")
                os.close(fd)
                ogg.write_ogg(path, marked, SR, quality=q)
                y, _ = ogg.read_ogg(path)
                os.unlink(path)
                abuses.append((f"REAL Ogg/Vorbis q{q}", np.asarray(y, np.float32)))
        else:
            abuses.append(("REAL Ogg/Vorbis (libs missing)", None))
    except Exception as exc:  # noqa: BLE001
        abuses.append((f"REAL Ogg/Vorbis (error: {exc})", None))

    try:
        from openvoice_tpu.audio import ffdec

        if ffdec.available():
            import tempfile

            for kbps in (96, 32):
                fd, path = tempfile.mkstemp(suffix=".m4a")
                os.close(fd)
                ffdec.write_m4a(path, marked, SR, kbps=kbps)
                y, _ = ffdec.read_any(path)
                os.unlink(path)
                abuses.append((f"REAL AAC/m4a {kbps} kbps", np.asarray(y, np.float32)))
        else:
            abuses.append(("REAL AAC/m4a (ffmpeg libs missing)", None))
    except Exception as exc:  # noqa: BLE001
        abuses.append((f"REAL AAC/m4a (error: {exc})", None))

    # combination chain: mp3 + re-gain + PCM16 + pad
    try:
        from openvoice_tpu.audio.mp3 import encoder_available, read_mp3, write_mp3

        if encoder_available():
            import tempfile

            fd, path = tempfile.mkstemp(suffix=".mp3")
            os.close(fd)
            write_mp3(path, marked, SR, kbps=128)
            y, _ = read_mp3(path)
            os.unlink(path)
            y = np.asarray(y, np.float32) * 0.85
            y = (np.round(np.clip(y, -1, 1) * 32767) / 32767).astype(np.float32)
            abuses.append(("mp3-128 + 0.85× + PCM16 + 300-pad",
                           np.concatenate([np.zeros(300, np.float32), y])))
        else:
            abuses.append(("mp3 combination chain (encoder not built)", None))
    except Exception as exc:  # noqa: BLE001
        abuses.append((f"mp3 combination chain (error: {exc})", None))

    print(f"{'abuse':42s} decoded")
    for name, audio in abuses:
        if audio is None:
            print(f"{name:42s} (skipped)")
            continue
        got = wm.detect_watermark(audio, 2)
        ok = "OK " if got == MESSAGE else "FAIL"
        print(f"{name:42s} {ok} {got!r}")


if __name__ == "__main__":
    main()
