"""Command-line tools.

  python -m openvoice_tpu.tools convert-ckpt  <ckpt.pth> <out_dir> [--config c.json | --preset v2]
  python -m openvoice_tpu.tools serve         [--config c.json --ckpt x] [--port 7860]
  python -m openvoice_tpu.tools train         <data_root> [--steps N --ckpt-dir d ...]
  python -m openvoice_tpu.tools extract-se    <audio> [--out se.npy]
"""

from __future__ import annotations

import argparse
import sys


def _load_cfg(args):
    from openvoice_tpu.config import (
        V1_CONVERTER_CONFIG,
        V2_CONVERTER_CONFIG,
        v1_base_tts_config,
    )
    from openvoice_tpu.text import default_symbols

    presets = {
        "v1-tts": v1_base_tts_config(len(default_symbols)),
        "v1": V1_CONVERTER_CONFIG,
        "v2": V2_CONVERTER_CONFIG,
    }
    if getattr(args, "config", None):
        from openvoice_tpu.api import ToneColorConverter

        return ToneColorConverter(config_path=args.config).cfg
    return presets[getattr(args, "preset", "v2")]


def cmd_convert_ckpt(args) -> int:
    from openvoice_tpu.ckpt.native_io import convert_torch_checkpoint

    path = convert_torch_checkpoint(args.ckpt, args.out_dir, _load_cfg(args))
    print(f"converted → {path}")
    return 0


def cmd_serve(args) -> int:
    from openvoice_tpu.api import ToneColorConverter
    from openvoice_tpu.serve.server import VoiceService, serve

    if args.config:
        conv = ToneColorConverter(config_path=args.config)
    else:
        conv = ToneColorConverter(cfg=_load_cfg(args))
    if args.ckpt:
        if args.ckpt.endswith(".pth"):
            conv.load_ckpt(args.ckpt)
        else:
            from openvoice_tpu.ckpt.native_io import load_checkpoint

            conv.init_random()
            conv.params = load_checkpoint(args.ckpt, template=conv.params)
    else:
        print("[serve] no checkpoint — random weights", file=sys.stderr)
        conv.init_random()
    svc = VoiceService(conv, max_batch=args.batch)
    httpd = serve(svc, host=args.host, port=args.port)
    print(f"serving on http://{args.host}:{httpd.server_address[1]}")
    try:
        import threading

        threading.Event().wait()
    except KeyboardInterrupt:
        svc.close()
        httpd.shutdown()
    return 0


def cmd_train(args) -> int:
    from openvoice_tpu.runtime.multihost import initialize
    from openvoice_tpu.training.loop import train

    topo = initialize()
    print(f"[train] process {topo.process_id}/{topo.num_processes}, "
          f"{topo.global_device_count} devices")
    train(
        args.data_root,
        _load_cfg(args),
        steps=args.steps,
        batch_size=args.batch,
        segment_frames=args.segment_frames,
        adversarial=not args.no_gan,
        ckpt_dir=args.ckpt_dir,
    )
    return 0


def cmd_extract_se(args) -> int:
    import numpy as np

    from openvoice_tpu.api import ToneColorConverter

    if args.config:
        conv = ToneColorConverter(config_path=args.config)
    else:
        conv = ToneColorConverter(cfg=_load_cfg(args))
    if args.ckpt:
        conv.load_ckpt(args.ckpt)
    else:
        conv.init_random()
    se = conv.extract_se_from_file(args.audio, vad=not args.no_vad)
    out = args.out or "se.npy"
    np.save(out, se)
    print(f"SE {se.shape} → {out}")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="openvoice_tpu.tools")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("convert-ckpt", help="torch .pth → native orbax checkpoint")
    p.add_argument("ckpt")
    p.add_argument("out_dir")
    p.add_argument("--config")
    p.add_argument("--preset", default="v2", choices=["v1", "v2", "v1-tts"])
    p.set_defaults(fn=cmd_convert_ckpt)

    p = sub.add_parser("serve", help="start the HTTP serving tier")
    p.add_argument("--config")
    p.add_argument("--ckpt")
    p.add_argument("--preset", default="v2", choices=["v1", "v2"])
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--batch", type=int, default=8)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("train", help="train the converter stack")
    p.add_argument("data_root")
    p.add_argument("--config")
    p.add_argument("--preset", default="v2", choices=["v1", "v2"])
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--segment-frames", type=int, default=128)
    p.add_argument("--no-gan", action="store_true")
    p.add_argument("--ckpt-dir")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("extract-se", help="speaker embedding from reference audio")
    p.add_argument("audio")
    p.add_argument("--config")
    p.add_argument("--ckpt")
    p.add_argument("--preset", default="v2", choices=["v1", "v2"])
    p.add_argument("--out")
    p.add_argument("--no-vad", action="store_true")
    p.set_defaults(fn=cmd_extract_se)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
