"""Demo: the r4 fused text→cloned-audio chains — staged vs fused vs
single-dispatch vs streaming (no reference counterpart; the reference runs
the staged flow only, openvoice_app.py:131-141).

Usage (random weights by default; pass checkpoints like demo_v1_tts.py):
  python demos/demo_fused_chain.py --text "..." --output-dir outputs/
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tts-ckpt", default=None)
    ap.add_argument("--tts-config", default=None)
    ap.add_argument("--converter-ckpt", default=None)
    ap.add_argument("--converter-config", default=None)
    ap.add_argument("--text", default=(
        "This sentence was synthesized and converted on a tensor processing "
        "unit in a single compiled graph. A second sentence streams in "
        "right behind the first one without waiting for the whole text."
    ))
    ap.add_argument("--output-dir", default="outputs")
    args = ap.parse_args()

    from openvoice_tpu.api import (
        BaseSpeakerTTS,
        ToneColorConverter,
        tts_convert_batched,
        tts_convert_single_dispatch,
        tts_convert_stream,
    )
    from openvoice_tpu.audio.io import write_wav
    from openvoice_tpu.config import V2_CONVERTER_CONFIG, v1_base_tts_config
    from openvoice_tpu.text import default_symbols

    if args.tts_config:
        tts = BaseSpeakerTTS(config_path=args.tts_config)
        tts.load_ckpt(args.tts_ckpt)
    else:
        tts = BaseSpeakerTTS(cfg=v1_base_tts_config(len(default_symbols)))
        tts.init_random(0)
        print("(random TTS weights — pass --tts-ckpt for real speech)")
    if args.converter_config:
        conv = ToneColorConverter(config_path=args.converter_config)
        conv.load_ckpt(args.converter_ckpt)
    else:
        conv = ToneColorConverter(cfg=V2_CONVERTER_CONFIG)
        conv.init_random(1)

    rng = np.random.default_rng(0)
    src_se = rng.standard_normal((1, conv.cfg.gin_channels, 1)).astype(np.float32)
    tgt_se = rng.standard_normal((1, conv.cfg.gin_channels, 1)).astype(np.float32)
    os.makedirs(args.output_dir, exist_ok=True)

    # two-stage fused: decode+STFT+convert per frame bucket
    t0 = time.perf_counter()
    fused = tts_convert_batched(
        tts, conv, args.text, 0, src_se, tgt_se, fast=True)
    print(f"fused:           {len(fused)/conv.cfg.sampling_rate:.2f}s audio "
          f"in {time.perf_counter()-t0:.2f}s wall (warm-up incl. compiles)")

    # single dispatch: the whole chain in one graph per token bucket
    t0 = time.perf_counter()
    single = tts_convert_single_dispatch(
        tts, conv, args.text, 0, src_se, tgt_se, fast=True)
    print(f"single-dispatch: {len(single)/conv.cfg.sampling_rate:.2f}s audio "
          f"in {time.perf_counter()-t0:.2f}s wall")

    # streaming: audio arrives sentence by sentence
    t0 = time.perf_counter()
    chunks = []
    for k, chunk in enumerate(tts_convert_stream(
            tts, conv, args.text, 0, src_se, tgt_se, fast=True)):
        print(f"stream chunk {k}: {len(chunk)/conv.cfg.sampling_rate:.2f}s "
              f"at +{time.perf_counter()-t0:.2f}s")
        chunks.append(chunk)

    write_wav(os.path.join(args.output_dir, "demo_chain_single.wav"),
              single, conv.cfg.sampling_rate)
    write_wav(os.path.join(args.output_dir, "demo_chain_stream.wav"),
              np.concatenate(chunks), conv.cfg.sampling_rate)
    print(f"wrote {args.output_dir}/demo_chain_single.wav and _stream.wav")


if __name__ == "__main__":
    main()
