"""BASELINE config 5 composed end-to-end (VERDICT r4 next #1): a LIVE
request stream — arriving over time through a real HTTP tier — served by a
2-process lock-step world that loses a host mid-stream, relaunches shrunk,
and completes EVERY request with audio equal to single-process truth."""

import base64
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np
import pytest

import jax

from tests._elastic_child import TINY

N_REQUESTS = 10
N_FRAMES_CHOICES = (16, 20, 24)  # one shared 64-frame bucket → one compile


def _request_payload(i: int, rng: np.random.Generator) -> dict:
    nf = N_FRAMES_CHOICES[i % len(N_FRAMES_CHOICES)]
    return {
        "spec": np.abs(rng.standard_normal((nf, TINY.spec_channels))).astype(np.float32),
        "g_src": rng.standard_normal(TINY.gin_channels).astype(np.float32),
        "g_tgt": rng.standard_normal(TINY.gin_channels).astype(np.float32),
        "tau": 0.3,
        "seed": 900 + i,
    }


def _truth(params, req: dict) -> np.ndarray:
    """Single-device truth.  The service's noise fill is prefix-equal per
    request (serve/distributed.py), so truth is bucket-independent — use
    the per-request bucket."""
    import jax.numpy as jnp

    from openvoice_tpu.models import synthesizer as S
    from openvoice_tpu.runtime.bucketing import round_up_to_bucket

    nf = int(req["spec"].shape[0])
    bucket = round_up_to_bucket(nf)
    spec = np.zeros((1, bucket, TINY.spec_channels), np.float32)
    spec[0, :nf] = req["spec"]
    noise = np.zeros((1, bucket, TINY.inter_channels), np.float32)
    noise[0, :nf] = np.random.default_rng(int(req["seed"])).standard_normal(
        (nf, TINY.inter_channels)).astype(np.float32)
    audio, _ = S.voice_conversion_jit(
        params, TINY, jnp.asarray(spec), jnp.asarray([nf]),
        jnp.asarray(req["g_src"])[None, None], jnp.asarray(req["g_tgt"])[None, None],
        jnp.full((1, 1, 1), float(req["tau"]), np.float32), jnp.asarray(noise),
    )
    return np.asarray(audio)[0, : nf * TINY.upsample_factor, 0]


def _clean_env():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return env


def test_live_worklog_append_and_stop(tmp_path):
    from openvoice_tpu.serve.elastic_live import LiveWorkLog

    log = LiveWorkLog(str(tmp_path))
    rng = np.random.default_rng(0)
    ids = [log.append_request(_request_payload(i, rng)) for i in range(4)]
    assert ids == [0, 1, 2, 3]
    assert log.request_ids() == ids
    assert log.live_pending_ids() == ids
    back = log.load_request(2)
    assert int(back["seed"]) == 902
    log.mark_done(1, np.ones(3, np.float32))
    assert log.live_pending_ids() == [0, 2, 3]
    assert not log.stop_requested()
    log.signal_stop()
    assert log.stop_requested()


def test_live_worklog_concurrent_feeders_unique_ids(tmp_path):
    from openvoice_tpu.serve.elastic_live import LiveWorkLog

    log = LiveWorkLog(str(tmp_path))
    rng = np.random.default_rng(1)
    payload = _request_payload(0, rng)
    got: list[int] = []
    lock = threading.Lock()

    def feed():
        for _ in range(8):
            i = log.append_request(payload)
            with lock:
                got.append(i)

    threads = [threading.Thread(target=feed) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(got) == list(range(32))  # no collisions, no gaps


def test_live_stream_http_death_mid_stream_completes_all(tmp_path):
    """The spec sentence, whole: requests arrive OVER TIME via HTTP into a
    2-process lock-step world; a worker dies mid-stream (hard exit after
    completing 2 requests); the LiveSupervisor relaunches a shrunk world;
    every request — submitted before, during, and after the failure —
    completes with audio equal to single-process truth."""
    from openvoice_tpu.models import synthesizer as S
    from openvoice_tpu.serve.elastic_live import (
        ElasticConvertClient,
        LiveSupervisor,
        LiveWorkLog,
        serve_elastic,
    )

    state = str(tmp_path / "state")
    log = LiveWorkLog(state)
    params = jax.tree.map(np.asarray, S.init_synthesizer(jax.random.PRNGKey(0), TINY))
    log.write_params(params)
    marker = str(tmp_path / "die.marker")

    def cmd(coordinator, world, pid):
        return [
            sys.executable, "-m", "tests._elastic_live_child",
            state, coordinator or "none", str(world), str(pid),
            f"1:2:{marker}",  # process 1 dies after completing 2 requests
        ]

    sup = LiveSupervisor(state, cmd, world=2, max_restarts=3, env=_clean_env())
    result: dict = {}
    sup_thread = threading.Thread(
        target=lambda: result.update(ok=sup.run(timeout_s=540)), daemon=True
    )
    sup_thread.start()

    client = ElasticConvertClient(state, TINY)
    httpd = serve_elastic(client)
    port = httpd.server_address[1]

    rng = np.random.default_rng(42)
    payloads = [_request_payload(i, rng) for i in range(N_REQUESTS)]
    responses: list = [None] * N_REQUESTS
    errors: list = []

    def post(i: int) -> None:
        p = payloads[i]
        body = json.dumps({
            "spec_b64": base64.b64encode(p["spec"].tobytes()).decode(),
            "n_frames": int(p["spec"].shape[0]),
            "src_se": p["g_src"].tolist(),
            "tgt_se": p["g_tgt"].tolist(),
            "tau": p["tau"], "seed": p["seed"], "timeout": 500,
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/convert", data=body,
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=520) as r:
                payload = json.loads(r.read())
            responses[i] = np.frombuffer(
                base64.b64decode(payload["audio_b64"]), np.float32
            )
        except Exception as exc:  # noqa: BLE001 — surfaced by the assert below
            errors.append((i, repr(exc)))

    # the live stream: one request every 0.4 s — the injected death (after
    # 2 completions on worker 1) lands while later requests are still
    # ARRIVING, which is the whole point of this test
    threads = []
    try:
        for i in range(N_REQUESTS):
            t = threading.Thread(target=post, args=(i,), daemon=True)
            t.start()
            threads.append(t)
            time.sleep(0.4)
        for t in threads:
            t.join(timeout=540)
        assert not errors, errors
        assert all(r is not None for r in responses)

        # drain and stop the world
        log.signal_stop()
        sup_thread.join(timeout=120)
        assert result.get("ok"), f"supervisor failed: {sup.history}"
    finally:
        httpd.shutdown()

    # the death actually happened, and a shrunk relaunch ran
    assert os.path.exists(marker), "fault injection never fired"
    assert len(sup.history) >= 2, sup.history
    assert sup.history[0]["world"] == 2
    assert any(rc not in (0,) for rc in sup.history[0]["rcs"]), sup.history[0]
    assert sup.history[1]["world"] == 1, sup.history[1]

    # every request's audio equals single-process truth
    for i, p in enumerate(payloads):
        truth = _truth(params, p)
        got = responses[i]
        assert got.shape == truth.shape, i
        np.testing.assert_allclose(got, truth, atol=2e-5, err_msg=f"request {i}")
