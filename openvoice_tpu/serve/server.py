"""HTTP serving tier (the reference's Gradio app equivalent,
openvoice_app.py — gradio is not in this image, so the demo UI is a small
stdlib HTTP app with the same request semantics and guard rails).

Endpoints:
  POST /convert   {audio_b64 | audio_path, src_se?, tgt_ref_path?, tau?}
  POST /tts       {text, speaker, language, speed}   (V1 base TTS loaded)
  POST /clone     {text, src_se, tgt_se | tgt_ref_path, mode: fused|single}
                  — the full text→cloned-audio chain via the fused dispatches
  GET  /healthz   liveness
  GET  /metrics   JSON metrics snapshot (latency, RTF, audio-seconds)

Audio-bearing responses take an optional `format`: "f32" (default, exact),
"pcm16", "wav", or "mp3" (+ optional `kbps`, in-repo lame encoder); unknown
formats / absent encoder are 400s.

Error handling mirrors the app's [ERROR] strings (openvoice_app.py:42-120)
with structured codes; every request is isolated (SURVEY.md §5.3).
"""

from __future__ import annotations

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from openvoice_tpu.runtime.profiler import METRICS


class VoiceService:
    """Bundles converter (+ optional TTS) behind the batcher."""

    def __init__(self, converter, tts_model=None, max_batch: int = 8):
        from openvoice_tpu.serve.batcher import ConvertBatcher

        self.converter = converter
        self.tts_model = tts_model
        self.batcher = ConvertBatcher(converter._require_params(), converter.cfg, max_batch=max_batch)
        self.batcher.start()

    def close(self) -> None:
        self.batcher.stop()

    # ------------------------------------------------------------------

    def convert_audio(self, audio: np.ndarray, src_se, tgt_se, tau: float = 0.3, seed: int = 0) -> np.ndarray:
        from openvoice_tpu.serve.batcher import ConvertRequest

        # PCM fast path: the STFT runs inside the batched serving graph, so
        # the request carries raw samples (int16 on the wire, ~16× fewer
        # host→device bytes than the old spectrogram round-trip)
        req = ConvertRequest(
            audio=np.asarray(audio, np.float32),
            g_src=np.asarray(src_se, np.float32).reshape(-1),
            g_tgt=np.asarray(tgt_se, np.float32).reshape(-1),
            tau=tau,
            seed=seed,
        )
        fut = self.batcher.submit(req)
        out = fut.result(timeout=120)
        if self.converter.enable_watermark:
            out = self.converter.add_watermark(out, "default")
        return out


_FORMATS = ("f32", "pcm16", "wav", "mp3")


def encode_response_audio(out: np.ndarray, sr: int, fmt: str, kbps: int = 128) -> dict:
    """Audio payload for a JSON response in the requested wire format.

    f32 (default, exact), pcm16 (2 bytes/sample), wav (PCM16 container), or
    mp3 (lossy, `kbps` CBR via the in-repo lame encoder — raises a clear
    ValueError when the encoder isn't built/present, mapped to a 400).
    The reference app hands Gradio a (sr, ndarray) tuple and lets the UI
    encode (openvoice_app.py:141); here the wire format is explicit."""
    out = np.asarray(out, np.float32)
    if fmt == "f32":
        return {"encoding": "f32", "audio_b64": base64.b64encode(out.tobytes()).decode()}
    if fmt == "pcm16":
        pcm = (np.clip(out, -1.0, 1.0) * 32767.0).astype(np.int16)
        return {"encoding": "pcm16", "audio_b64": base64.b64encode(pcm.tobytes()).decode()}
    import os
    import tempfile

    if fmt == "wav":
        from openvoice_tpu.audio.io import write_wav

        fd, path = tempfile.mkstemp(suffix=".wav")
        os.close(fd)
        try:
            write_wav(path, out, sr)
            with open(path, "rb") as f:
                blob = f.read()
        finally:
            os.unlink(path)
        return {"encoding": "wav", "audio_b64": base64.b64encode(blob).decode()}
    if fmt == "mp3":
        from openvoice_tpu.audio.mp3 import encoder_available, write_mp3

        if not encoder_available():
            raise ValueError(
                "[ERROR] mp3 output unavailable: native encoder not built "
                "(cmake --build native/build) or libmp3lame missing"
            )
        fd, path = tempfile.mkstemp(suffix=".mp3")
        os.close(fd)
        try:
            # the payload reports the EFFECTIVE bitrate: lame clamps requests
            # outside the MPEG table for this sample rate (192 @ 22.05 kHz
            # encodes at 160), so echoing the request would misreport
            eff = write_mp3(path, out, sr, kbps=kbps)
            with open(path, "rb") as f:
                blob = f.read()
        finally:
            os.unlink(path)
        return {"encoding": "mp3", "kbps": eff, "audio_b64": base64.b64encode(blob).decode()}
    raise ValueError(f"[ERROR] unknown format {fmt!r}: expected one of {_FORMATS}")


def _guard_text(text: str) -> str | None:
    """Length guards matching the served demo (openvoice_app.py:97-114)."""
    if len(text) < 2:
        return "[ERROR] Please give a longer prompt text"
    if len(text) > 200:
        return (
            "[ERROR] Text length limited to 200 characters for this demo; "
            "please try shorter text"
        )
    return None


def make_handler(service: VoiceService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok"})
            elif self.path == "/metrics":
                self._json(200, METRICS.snapshot())
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
            except (ValueError, json.JSONDecodeError):
                self._json(400, {"error": "[ERROR] invalid JSON body"})
                return

            try:
                if self.path == "/convert":
                    self._convert(req)
                elif self.path == "/tts":
                    self._tts(req)
                elif self.path == "/clone":
                    self._clone(req)
                else:
                    self._json(404, {"error": "not found"})
            except Exception as exc:  # noqa: BLE001 — per-request isolation
                METRICS.add("request_failures")
                self._json(500, {"error": f"[ERROR] {exc}"})

        def _send_audio(self, req, out: np.ndarray, sr: int) -> None:
            """200 with the audio in the requested wire format, or a 400
            for an unknown format / unavailable encoder."""
            fmt = req.get("format", "f32")
            try:
                # TypeError too: a JSON null/list kbps is client error (400),
                # not a server fault (500)
                payload = encode_response_audio(
                    out, sr, fmt, kbps=int(req.get("kbps", 128))
                )
            except (ValueError, TypeError) as exc:
                self._json(400, {"error": f"[ERROR] {exc}"})
                return
            self._json(
                200,
                {"sample_rate": sr, "num_samples": int(out.shape[0]), **payload},
            )

        def _load_request_audio(self, req) -> np.ndarray:
            from openvoice_tpu.audio.io import load_audio

            sr = service.converter.cfg.sampling_rate
            if "audio_b64" in req:
                from openvoice_tpu.audio.io import read_wav
                import struct  # noqa: F401

                raw = base64.b64decode(req["audio_b64"])
                tmp = io.BytesIO(raw)
                import tempfile, os

                with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
                    f.write(tmp.read())
                    path = f.name
                try:
                    audio, _ = load_audio(path, sr=sr)
                finally:
                    os.unlink(path)
                return audio
            if "audio_path" in req:
                audio, _ = load_audio(req["audio_path"], sr=sr)
                return audio
            raise ValueError("missing audio_b64 or audio_path")

        def _convert(self, req) -> None:
            audio = self._load_request_audio(req)
            if "src_se" in req:
                src_se = np.asarray(req["src_se"], np.float32)
            else:
                src_se = service.converter._se_from_audio_batch([audio])
            if "tgt_se" in req:
                tgt_se = np.asarray(req["tgt_se"], np.float32)
            elif "tgt_ref_path" in req:
                tgt_se = np.asarray(
                    service.converter.extract_se_from_file(req["tgt_ref_path"])
                ).reshape(-1)
            else:
                raise ValueError("missing tgt_se or tgt_ref_path")
            out = service.convert_audio(
                audio, src_se, tgt_se, tau=float(req.get("tau", 0.3)),
                seed=int(req.get("seed", 0)),
            )
            self._send_audio(req, np.asarray(out, np.float32),
                             service.converter.cfg.sampling_rate)

        def _clone(self, req) -> None:
            """The full text→cloned-audio chain through the fused dispatches
            (api.tts_convert_batched / tts_convert_single_dispatch):
            {"text", "speaker"?, "language"?, "tgt_se"|"tgt_ref_path",
             "src_se", "tau"?, "seed"?, "mode": "fused"|"single"}.
            Malformed requests are 400s; only genuine faults reach the 500
            handler."""
            import time as _time

            if service.tts_model is None:
                raise ValueError("no base TTS model loaded")
            text = req.get("text", "")
            err = _guard_text(text)
            if err:
                self._json(400, {"error": err})
                return
            mode = req.get("mode", "fused")
            if mode not in ("fused", "single"):
                self._json(400, {"error": (
                    f"[ERROR] unknown mode {mode!r}: expected 'fused' or "
                    "'single' (the two paths draw noise differently — a "
                    "silent fallback would change the audio)"
                )})
                return
            if "tgt_se" in req:
                tgt_se = np.asarray(req["tgt_se"], np.float32)
            elif "tgt_ref_path" in req:
                tgt_se = np.asarray(
                    service.converter.extract_se_from_file(req["tgt_ref_path"])
                ).reshape(-1)
            else:
                self._json(400, {"error": "[ERROR] missing tgt_se or tgt_ref_path"})
                return
            if "src_se" not in req:
                self._json(400, {"error": (
                    "[ERROR] missing src_se (the fused chain needs the base "
                    "speaker's SE; use /tts + /convert to derive it)"
                )})
                return
            src_se = np.asarray(req["src_se"], np.float32)
            from openvoice_tpu.api import (
                tts_convert_batched,
                tts_convert_single_dispatch,
            )

            fn = tts_convert_single_dispatch if mode == "single" else tts_convert_batched
            t0 = _time.perf_counter()
            out = fn(
                service.tts_model, service.converter, text,
                req.get("speaker", "default"), src_se, tgt_se,
                language=req.get("language", "English"),
                speed=float(req.get("speed", 1.0)),
                tau=float(req.get("tau", 0.3)),
                seed=int(req.get("seed", 0)),
            )
            sr = service.converter.cfg.sampling_rate
            METRICS.add("audio_seconds", len(out) / sr)
            METRICS.observe("request_latency", _time.perf_counter() - t0)
            self._send_audio(req, np.asarray(out, np.float32), sr)

        def _tts(self, req) -> None:
            if service.tts_model is None:
                raise ValueError("no base TTS model loaded")
            text = req.get("text", "")
            err = _guard_text(text)
            if err:
                self._json(400, {"error": err})
                return
            # bucketed-batch path: sentences batch per token/frame bucket
            # instead of looping (same output as .tts() for the same seed)
            audio = service.tts_model.tts_batched(
                text, None, req.get("speaker", "default"),
                language=req.get("language", "English"),
                speed=float(req.get("speed", 1.0)),
            )
            self._send_audio(req, np.asarray(audio, np.float32),
                             service.tts_model.cfg.sampling_rate)

    return Handler


def serve(service: VoiceService, host: str = "127.0.0.1", port: int = 7860) -> ThreadingHTTPServer:
    """Start the HTTP server in a background thread; returns the server."""
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd
