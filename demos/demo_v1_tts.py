"""Demo: V1 base-speaker TTS + style control + tone conversion
(parallels demo_part1.ipynb / demo_part2.ipynb).

Usage:
  python demos/demo_v1_tts.py \
      --tts-ckpt checkpoints/base_speakers/EN/checkpoint.pth \
      --tts-config checkpoints/base_speakers/EN/config.json \
      --converter-ckpt checkpoints/converter/checkpoint.pth \
      --converter-config checkpoints/converter/config.json \
      --text "Did you ever hear a folk tale about a giant turtle?" \
      --speaker default --reference resources/example_reference.mp3 \
      --output outputs/demo_v1.wav
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tts-ckpt", default=None)
    ap.add_argument("--tts-config", default=None)
    ap.add_argument("--converter-ckpt", default=None)
    ap.add_argument("--converter-config", default=None)
    ap.add_argument("--text", default="Hello from the TPU native voice cloning framework.")
    ap.add_argument("--speaker", default="default")
    ap.add_argument("--language", default="English")
    ap.add_argument("--speed", type=float, default=1.0)
    ap.add_argument("--reference", default=None, help="target speaker recording")
    ap.add_argument("--output", default="outputs/demo_v1.wav")
    ap.add_argument("--parity", action="store_true",
                    help="full-f32 decode (checkpoint-parity mode; ~5 min on\n"
                         "first run for XLA compiles, ~2 min warm via the\n"
                         "persistent compile cache — bf16 serving mode is\n"
                         "the default, as in the served app)")
    args = ap.parse_args()

    import time as _time

    _t0 = _time.perf_counter()
    _last = [_t0]

    def _mark(stage: str) -> None:
        now = _time.perf_counter()
        print(f"[{now - _t0:7.1f}s] {stage} (+{now - _last[0]:.1f}s)")
        _last[0] = now

    from openvoice_tpu.api import BaseSpeakerTTS, ToneColorConverter
    from openvoice_tpu.config import V1_CONVERTER_CONFIG, v1_base_tts_config
    from openvoice_tpu.pipeline.se_extractor import get_se
    from openvoice_tpu.text import default_symbols

    if args.tts_config:
        tts = BaseSpeakerTTS(config_path=args.tts_config)
    else:
        tts = BaseSpeakerTTS(cfg=v1_base_tts_config(len(default_symbols)))
    if args.tts_ckpt:
        tts.load_ckpt(args.tts_ckpt)
    else:
        print("NOTE: no TTS checkpoint — random weights (smoke test)")
        tts.init_random(0)

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    tmp_path = os.path.join(os.path.dirname(args.output) or ".", "tmp_tts.wav")
    _mark("models constructed")
    print("synthesizing...")
    tts.tts_batched(args.text, tmp_path, args.speaker, language=args.language,
                    speed=args.speed, fast=not args.parity)
    _mark("TTS synthesis done")
    print(f"wrote base audio to {tmp_path}")

    if args.reference:
        if args.converter_config:
            conv = ToneColorConverter(config_path=args.converter_config)
        else:
            conv = ToneColorConverter(cfg=V1_CONVERTER_CONFIG)
        if args.converter_ckpt:
            conv.load_ckpt(args.converter_ckpt)
        else:
            conv.init_random(0)
        _mark("converter constructed")
        src_se, _ = get_se(tmp_path, conv, target_dir="processed")
        tgt_se, _ = get_se(args.reference, conv, target_dir="processed")
        _mark("speaker embeddings extracted")
        conv.convert(tmp_path, src_se, tgt_se, output_path=args.output, message="@MyShell")
        _mark("tone conversion done")
        print(f"wrote converted audio to {args.output}")
    else:
        import shutil

        shutil.copyfile(tmp_path, args.output)
        print(f"no --reference: wrote base TTS audio to {args.output}")


if __name__ == "__main__":
    main()
