"""Real-audio adversarial training on real hardware.

Builds a tiny dataset from the bundled reference recordings (mp3 → wav via
the native decoder), then drives the actual training loop
(training/loop.py::train — data pipeline → jitted GAN step → checkpoint)
at full V2 converter dimensions for a recorded number of steps.  This is
the "training works on real audio, on the real chip" record: the smoke
tests use random tensors and the learn-tests use tiny dims on CPU.

Usage: python benchmarks/train_real_demo.py [--steps 40] [--adversarial]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--segment-frames", type=int, default=192)
    ap.add_argument("--mel-only", action="store_true",
                    help="mel+KL warmup objective instead of the GAN step")
    ap.add_argument("--data", default="/tmp/ovt_train_demo")
    args = ap.parse_args()

    import numpy as np

    import jax

    from openvoice_tpu.audio.io import load_audio, write_wav
    from openvoice_tpu.config import V2_CONVERTER_CONFIG as cfg
    from openvoice_tpu.training import train as T
    from openvoice_tpu.training.loop import train

    # --- tiny real dataset from the bundled recordings --------------------
    res = "/root/reference/resources"
    spk = os.path.join(args.data, "spk0")
    os.makedirs(spk, exist_ok=True)
    n_wavs = 0
    for name in ("example_reference.mp3", "demo_speaker0.mp3",
                 "demo_speaker1.mp3", "demo_speaker2.mp3"):
        src = os.path.join(res, name)
        if not os.path.exists(src):
            continue
        dst = os.path.join(spk, name.replace(".mp3", ".wav"))
        if not os.path.exists(dst):
            audio, sr = load_audio(src, sr=cfg.sampling_rate)
            write_wav(dst, audio, sr)
        n_wavs += 1
    if n_wavs == 0:
        print(json.dumps({"metric": "train_real_demo", "skipped": "no resources"}))
        return

    losses: list[dict] = []

    class _Capture:
        """Wrap the loop's metric printing by sampling the returned state's
        step metrics via log hook — the loop prints; we also re-run the
        loss on a fixed probe batch before/after for a clean delta."""

    t0 = time.perf_counter()
    state = train(
        args.data, cfg,
        steps=args.steps, batch_size=args.batch,
        segment_frames=args.segment_frames,
        adversarial=not args.mel_only, log_every=max(1, args.steps // 8),
        seed=0,
    )
    wall = time.perf_counter() - t0

    # fixed-probe loss before vs after: re-evaluate converter_loss with the
    # final params on one deterministic batch, against a fresh-init model
    from openvoice_tpu.training.data import ConverterDataset

    ds = ConverterDataset(args.data, cfg, args.batch, args.segment_frames, seed=123)
    spec, audio, lengths, g = next(iter(ds))
    import jax.numpy as jnp

    probe = jax.jit(T.converter_loss, static_argnames=("cfg", "segment_frames"))
    key = jax.random.PRNGKey(7)
    params_final = state.gen.params if hasattr(state, "gen") else state.params
    params_init = T.init_train_state(jax.random.PRNGKey(0), cfg).params
    l_init, m_init = probe(params_init, cfg, jnp.asarray(spec), jnp.asarray(audio),
                           jnp.asarray(lengths), jnp.asarray(g), key)
    l_fin, m_fin = probe(params_final, cfg, jnp.asarray(spec), jnp.asarray(audio),
                         jnp.asarray(lengths), jnp.asarray(g), key)

    # --- cloning-quality metrics (VERDICT r4 next #7): convert a probe
    # clip toward a target speaker with the INIT vs the TRAINED params and
    # measure (a) SE-cosine of the converted audio vs the target SE —
    # through the TRAINED model's own ref_enc, one fixed yardstick for both
    # —  and (b) frame-aligned MCD vs the source (content distortion).
    from openvoice_tpu.api import ToneColorConverter
    from openvoice_tpu.training.quality import mcd, se_cosine

    src_clip, _ = load_audio(os.path.join(spk, "example_reference.wav"),
                             sr=cfg.sampling_rate)
    tgt_clip, _ = load_audio(os.path.join(spk, "demo_speaker0.wav"),
                             sr=cfg.sampling_rate)
    src_clip = src_clip[: 6 * cfg.sampling_rate]
    tgt_clip = tgt_clip[: 6 * cfg.sampling_rate]

    meter = ToneColorConverter(cfg=cfg, enable_watermark=False)  # yardstick
    meter.params = params_final
    quality = {}
    for tag, params in (("init", params_init), ("final", params_final)):
        conv = ToneColorConverter(cfg=cfg, enable_watermark=False)
        conv.params = params
        src_se = conv._se_from_audio_batch([src_clip])[None, :, None]
        tgt_se = conv._se_from_audio_batch([tgt_clip])[None, :, None]
        out = conv.convert(src_clip, src_se, tgt_se, tau=0.0, message="")
        quality[f"se_cos_tgt_{tag}"] = round(
            se_cosine(meter, out, meter._se_from_audio_batch([tgt_clip])), 4)
        quality[f"mcd_src_{tag}"] = round(mcd(out, src_clip[: len(out)],
                                              cfg.sampling_rate), 2)
    quality["se_cos_src_vs_tgt"] = round(
        se_cosine(meter, src_clip, meter._se_from_audio_batch([tgt_clip])), 4)

    print(json.dumps({
        "metric": "train_real_demo",
        **quality,
        "backend": jax.default_backend(),
        "adversarial": not args.mel_only,
        "steps": args.steps, "batch": args.batch,
        "segment_frames": args.segment_frames,
        "n_wav_files": n_wavs,
        "n_segments": len(ds.segments),
        "wall_s": round(wall, 1),
        "probe_loss_init": round(float(l_init), 3),
        "probe_loss_final": round(float(l_fin), 3),
        "probe_mel_init": round(float(m_init["mel"]), 3),
        "probe_mel_final": round(float(m_fin["mel"]), 3),
        "improved": bool(float(l_fin) < float(l_init)),
    }))


if __name__ == "__main__":
    main()
