"""HTTP serving-tier endpoint tests: /tts, /convert, /clone, /metrics
(serve/server.py — previously only the batcher beneath it was covered)."""

import base64
import json
import urllib.request

import numpy as np
import pytest

from openvoice_tpu.config import SynthesizerConfig

TINY_TTS = SynthesizerConfig(
    n_vocab=100, n_speakers=4, zero_g=False,
    spec_channels=129, filter_length=256, hop_length=64, win_length=256,
    inter_channels=64, hidden_channels=64, filter_channels=128,
    n_heads=2, n_layers=2,
    upsample_initial_channel=128, upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    gin_channels=64, enc_q_layers=4, flow_n_flows=2, flow_wn_layers=2,
)
# converter hop == TTS upsample factor (16) so /clone's fused chain works
TINY_CONV = SynthesizerConfig(
    n_speakers=0, zero_g=True,
    spec_channels=33, filter_length=64, hop_length=16, win_length=64,
    inter_channels=64, hidden_channels=64,
    upsample_initial_channel=128, upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    gin_channels=64, enc_q_layers=4, flow_n_flows=2, flow_wn_layers=2,
)


@pytest.fixture(scope="module")
def server():
    from openvoice_tpu.api import BaseSpeakerTTS, ToneColorConverter
    from openvoice_tpu.serve.server import VoiceService, serve

    tts = BaseSpeakerTTS(cfg=TINY_TTS)
    tts.init_random(0)
    conv = ToneColorConverter(cfg=TINY_CONV, enable_watermark=False)
    conv.init_random(1)
    svc = VoiceService(conv, tts_model=tts, max_batch=4)
    httpd = serve(svc, port=0)
    yield httpd.server_address[1], svc
    httpd.shutdown()
    svc.close()


def _post(port: int, path: str, body: dict, timeout: float = 300.0) -> tuple[int, dict]:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _audio_from(resp: dict) -> np.ndarray:
    out = np.frombuffer(base64.b64decode(resp["audio_b64"]), np.float32)
    assert len(out) == resp["num_samples"]
    return out


def test_tts_endpoint(server):
    port, _ = server
    code, resp = _post(port, "/tts", {"text": "hello there my friend"})
    assert code == 200, resp
    out = _audio_from(resp)
    assert out.size > 0 and np.isfinite(out).all()
    assert resp["sample_rate"] == TINY_TTS.sampling_rate


def test_convert_endpoint(server, tmp_path):
    from openvoice_tpu.audio.io import save_wav

    port, svc = server
    sr = TINY_CONV.sampling_rate
    rng = np.random.default_rng(0)
    wav_path = str(tmp_path / "src.wav")
    save_wav(wav_path, (rng.standard_normal(sr) * 0.1).astype(np.float32), sr)
    tgt_se = rng.standard_normal(TINY_CONV.gin_channels).astype(np.float32)
    code, resp = _post(port, "/convert", {
        "audio_path": wav_path, "tgt_se": tgt_se.tolist(), "tau": 0.0,
    })
    assert code == 200, resp
    out = _audio_from(resp)
    assert out.size > 0 and np.isfinite(out).all()


def test_clone_endpoint_fused_and_single(server):
    port, _ = server
    rng = np.random.default_rng(1)
    src = rng.standard_normal(TINY_CONV.gin_channels).astype(np.float32)
    tgt = rng.standard_normal(TINY_CONV.gin_channels).astype(np.float32)
    body = {
        "text": "hello there my good friend",
        "src_se": src.tolist(), "tgt_se": tgt.tolist(),
        "tau": 0.3, "seed": 5,
    }
    code, fused = _post(port, "/clone", dict(body, mode="fused"))
    assert code == 200, fused
    a_fused = _audio_from(fused)
    assert a_fused.size > 0 and np.isfinite(a_fused).all()
    code, single = _post(port, "/clone", dict(body, mode="single"))
    assert code == 200, single
    a_single = _audio_from(single)
    assert a_single.size > 0 and np.isfinite(a_single).all()


def test_clone_endpoint_guards(server):
    """Malformed requests are 400-class client errors (not 500s that
    pollute fault metrics and invite retries of permanently-bad requests)."""
    port, _ = server
    code, resp = _post(port, "/clone", {"text": "x"})
    assert code == 400 and resp["error"].startswith("[ERROR]")
    code, resp = _post(port, "/clone", {"text": "hello there friend"})
    assert code == 400 and "tgt_se" in resp["error"]
    rng = np.random.default_rng(2)
    tgt = rng.standard_normal(TINY_CONV.gin_channels).astype(np.float32)
    code, resp = _post(port, "/clone", {
        "text": "hello there friend", "tgt_se": tgt.tolist(),
    })
    assert code == 400 and "src_se" in resp["error"]
    # unknown mode is rejected, never a silent fallback (the paths draw
    # noise differently)
    src = rng.standard_normal(TINY_CONV.gin_channels).astype(np.float32)
    code, resp = _post(port, "/clone", {
        "text": "hello there friend", "tgt_se": tgt.tolist(),
        "src_se": src.tolist(), "mode": "Single",
    })
    assert code == 400 and "unknown mode" in resp["error"]


def test_clone_endpoint_records_metrics(server):
    from openvoice_tpu.runtime.profiler import METRICS

    port, _ = server
    before = METRICS.snapshot()["counters"].get("audio_seconds", 0)
    rng = np.random.default_rng(3)
    src = rng.standard_normal(TINY_CONV.gin_channels).astype(np.float32)
    tgt = rng.standard_normal(TINY_CONV.gin_channels).astype(np.float32)
    code, resp = _post(port, "/clone", {
        "text": "hello there my friend",
        "src_se": src.tolist(), "tgt_se": tgt.tolist(),
    })
    assert code == 200
    after = METRICS.snapshot()["counters"].get("audio_seconds", 0)
    assert after > before


def test_unknown_endpoint(server):
    port, _ = server
    code, resp = _post(port, "/nope", {})
    assert code == 404


def test_metrics_endpoint(server):
    port, _ = server
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics", timeout=30) as r:
        snap = json.loads(r.read())
    assert "counters" in snap


def test_tts_response_formats(server, tmp_path):
    """The `format` field selects the wire encoding: f32 (default), pcm16,
    wav container, mp3 (in-repo lame encoder).  All four carry the same
    audio; unknown formats and unavailable encoders are 400s, not 500s."""
    port, svc = server
    body = {"text": "hello there my friend"}
    code, f32 = _post(port, "/tts", body)
    assert code == 200 and f32.get("encoding", "f32") == "f32"
    ref = np.frombuffer(base64.b64decode(f32["audio_b64"]), np.float32)

    code, pcm = _post(port, "/tts", dict(body, format="pcm16"))
    assert code == 200 and pcm["encoding"] == "pcm16"
    pcm_arr = np.frombuffer(base64.b64decode(pcm["audio_b64"]), np.int16)
    assert pcm_arr.shape == ref.shape
    np.testing.assert_allclose(pcm_arr / 32767.0, ref, atol=1.5 / 32767.0)

    code, wav = _post(port, "/tts", dict(body, format="wav"))
    assert code == 200 and wav["encoding"] == "wav"
    p = tmp_path / "resp.wav"
    p.write_bytes(base64.b64decode(wav["audio_b64"]))
    from openvoice_tpu.audio.io import read_wav

    wav_arr, sr = read_wav(str(p))
    assert sr == wav["sample_rate"] and wav_arr.shape == ref.shape

    code, resp = _post(port, "/tts", dict(body, format="flac"))
    assert code == 400 and "unknown format" in resp["error"]


def test_tts_response_mp3(server, tmp_path):
    from openvoice_tpu.audio import native
    from openvoice_tpu.audio.mp3 import encoder_available

    if not (native.available() and encoder_available()):
        pytest.skip("mp3 encoder not available")
    port, svc = server
    code, resp = _post(port, "/tts", {"text": "hello there my friend", "format": "mp3", "kbps": 96})
    assert code == 200 and resp["encoding"] == "mp3" and resp["kbps"] == 96
    p = tmp_path / "resp.mp3"
    p.write_bytes(base64.b64decode(resp["audio_b64"]))
    from openvoice_tpu.audio.mp3 import read_mp3

    arr, sr = read_mp3(str(p))
    assert sr == resp["sample_rate"]
    # decoder output = samples + codec delay/flush padding
    assert resp["num_samples"] <= len(arr) <= resp["num_samples"] + 4608
