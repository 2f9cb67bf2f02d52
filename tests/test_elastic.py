"""Elastic recovery tests (SURVEY.md §5.3): a host is ACTUALLY killed with
SIGKILL mid-stream, the failure is detected via collective timeout, and the
shrunk world restarts the in-flight batch — every request completes with
output equal to single-process truth."""

import os
import subprocess
import sys
import time

import numpy as np
import pytest

import jax

from openvoice_tpu.runtime.elastic import EX_TEMPFAIL, Supervisor, WorkLog

from tests._elastic_child import TINY

N_REQUESTS = 8


def _make_requests(rng: np.random.Generator) -> list[dict]:
    reqs = []
    for i in range(N_REQUESTS):
        nf = 16 + 4 * (i % 3)
        reqs.append({
            "spec": np.abs(rng.standard_normal((nf, TINY.spec_channels))).astype(np.float32),
            "n_frames": nf,
            "g_src": rng.standard_normal(TINY.gin_channels).astype(np.float32),
            "g_tgt": rng.standard_normal(TINY.gin_channels).astype(np.float32),
            "tau": 0.3,
            "seed": 500 + i,
        })
    return reqs


def _truth(params, req: dict) -> np.ndarray:
    """Single-device truth with the spec-path host-noise semantics the
    service pins (bucket = the one the service derives from the request
    pool: all n_frames ≤ 24 → first bucket)."""
    import jax.numpy as jnp

    from openvoice_tpu.models import synthesizer as S
    from openvoice_tpu.runtime.bucketing import round_up_to_bucket

    nf = int(req["n_frames"])
    bucket = round_up_to_bucket(max(16 + 4 * (i % 3) for i in range(N_REQUESTS)))
    spec = np.zeros((1, bucket, TINY.spec_channels), np.float32)
    spec[0, :nf] = req["spec"]
    noise = np.random.default_rng(int(req["seed"])).standard_normal(
        (bucket, TINY.inter_channels)).astype(np.float32)[None]
    audio, _ = S.voice_conversion_jit(
        params, TINY, jnp.asarray(spec), jnp.asarray([nf]),
        jnp.asarray(req["g_src"])[None, None], jnp.asarray(req["g_tgt"])[None, None],
        jnp.full((1, 1, 1), float(req["tau"]), np.float32), jnp.asarray(noise),
    )
    return np.asarray(audio)[0, : nf * TINY.upsample_factor, 0]


@pytest.fixture()
def worklog(tmp_path):
    from openvoice_tpu.models import synthesizer as S

    log = WorkLog(str(tmp_path))
    params = jax.tree.map(np.asarray, S.init_synthesizer(jax.random.PRNGKey(0), TINY))
    log.write_params(params)
    log.write_requests(_make_requests(np.random.default_rng(42)))
    return log, params


def _worker_cmd_factory(state_dir: str, round_sleep: float = 0.0):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def cmd(coordinator, world, pid):
        return [
            sys.executable, "-m", "tests._elastic_child",
            state_dir, coordinator or "none", str(world), str(pid),
            str(round_sleep),
        ]

    return cmd, repo


def _clean_env():
    return {k: v for k, v in os.environ.items()
            if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}


def test_worklog_roundtrip(tmp_path):
    log = WorkLog(str(tmp_path))
    reqs = _make_requests(np.random.default_rng(0))
    log.write_requests(reqs)
    back = log.load_requests()
    assert len(back) == N_REQUESTS
    np.testing.assert_array_equal(back[3]["spec"], reqs[3]["spec"])
    assert log.pending_ids() == list(range(N_REQUESTS))
    log.mark_done(2, np.ones(5, np.float32))
    assert log.pending_ids() == [i for i in range(N_REQUESTS) if i != 2]
    np.testing.assert_array_equal(log.load_result(2), np.ones(5, np.float32))


def test_elastic_kill_one_host_mid_stream(worklog, tmp_path):
    """kill -9 one worker of a 2-process world mid-stream; the Supervisor
    detects the dead world, relaunches shrunk (1 process), and the batch
    completes — every request's audio equals single-process truth."""
    log, params = worklog
    cmd, repo = _worker_cmd_factory(str(tmp_path), round_sleep=0.6)
    env = _clean_env()
    env["PYTHONPATH"] = repo

    from openvoice_tpu.runtime.elastic import _free_port

    coordinator = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            cmd(coordinator, 2, pid), cwd=repo, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    # wait until real work has completed (first done marker), then kill
    # worker 1 with SIGKILL — a genuine dead host, mid-stream
    deadline = time.monotonic() + 240
    while not log.done_ids():
        if time.monotonic() > deadline:
            for p in procs:
                p.kill()
            outs = [p.communicate()[0] for p in procs]
            pytest.fail("no request completed before kill:\n" + "\n".join(outs))
        if any(p.poll() is not None for p in procs):
            outs = [p.communicate()[0] if p.poll() is not None else "" for p in procs]
            pytest.fail("worker exited before kill:\n" + "\n".join(outs))
        time.sleep(0.05)
    procs[1].kill()  # SIGKILL

    rcs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        rcs.append(p.returncode)
    assert rcs[1] == -9  # the injected death
    # survivor: voluntary EX_TEMPFAIL via heartbeat, or the XLA fatal —
    # either way it did NOT exit clean, and work is pending
    assert rcs[0] != 0
    pending_before = log.pending_ids(N_REQUESTS)
    assert pending_before, "kill landed after all work finished — widen round_sleep"

    # recovery: shrunk world (starts at the surviving host count)
    sup = Supervisor(str(tmp_path), cmd, world=1, max_restarts=2, env=env)
    assert sup.run(timeout_s=300), f"recovery failed: {sup.history}"
    assert not log.pending_ids(N_REQUESTS)

    # every request — including those in flight at the kill — has output
    # equal to single-process truth
    reqs = log.load_requests()
    for i, req in enumerate(reqs):
        out = log.load_result(i)
        truth = _truth(params, req)
        assert out.shape == truth.shape
        np.testing.assert_allclose(out, truth, atol=2e-5)


def test_elastic_three_process_world_shrinks_by_one(worklog, tmp_path):
    """r4 review regression for the shrink policy: one injected death in a
    3-process world (which fatally cascades to the peers) must relaunch a
    TWO-process world — not collapse to 1 — and the shrunk world completes
    every request with correct outputs.  The whole lifecycle runs under the
    Supervisor, using worker_main's die_after_round fault injection."""
    log, params = worklog
    marker = str(tmp_path / "die.marker")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def cmd(coordinator, world, pid):
        return [
            sys.executable, "-m", "tests._elastic_child",
            str(tmp_path), coordinator or "none", str(world), str(pid),
            "0.0", f"2:0:{marker}",  # process 2 dies after round 0, once
        ]

    env = _clean_env()
    env["PYTHONPATH"] = repo
    sup = Supervisor(str(tmp_path), cmd, world=3, max_restarts=3, env=env)
    assert sup.run(timeout_s=500), f"recovery failed: {sup.history}"

    # attempt 1: world 3, process 2 died (rc 9 or -9), peers cascaded;
    # attempt 2: world 2 (shrunk by ONE), completes
    assert len(sup.history) >= 2, sup.history
    assert sup.history[0]["world"] == 3
    assert any(rc not in (0, EX_TEMPFAIL) for rc in sup.history[0]["rcs"])
    assert sup.history[1]["world"] == 2, sup.history[1]
    assert os.path.exists(marker)  # the injection actually fired

    assert not log.pending_ids(N_REQUESTS)
    reqs = log.load_requests()
    for i, req in enumerate(reqs):
        np.testing.assert_allclose(log.load_result(i), _truth(params, req), atol=2e-5)


def _make_training_data(root) -> None:
    """root/<speaker>/clip.wav — enough 64-sample segments for batch 4."""
    import os as _os

    from openvoice_tpu.audio.io import write_wav

    rng = np.random.default_rng(7)
    for spk in ("spk0", "spk1"):
        d = os.path.join(str(root), spk)
        _os.makedirs(d, exist_ok=True)
        t = np.arange(4000) / TINY.sampling_rate
        x = (0.3 * np.sin(2 * np.pi * (220 if spk == "spk0" else 330) * t)
             + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
        write_wav(os.path.join(d, "clip.wav"), x, TINY.sampling_rate)


def _probe_loss(state_template, ckpt_path) -> float:
    """Deterministic mel+KL loss of a checkpointed state on a fixed batch."""
    import jax.numpy as jnp

    from openvoice_tpu.ckpt import native_io as CIO
    from openvoice_tpu.training import train as T

    state = CIO.load_checkpoint(ckpt_path, template=state_template)
    rng = np.random.default_rng(123)
    spec = np.abs(rng.standard_normal((4, 16, TINY.spec_channels))).astype(np.float32)
    audio = (rng.standard_normal((4, 16 * TINY.hop_length)) * 0.1).astype(np.float32)
    lens = np.full(4, 16, np.int32)
    g = np.zeros((4, 1, TINY.gin_channels), np.float32)
    total, _ = T.converter_loss(
        state.params, TINY, jnp.asarray(spec), jnp.asarray(audio),
        jnp.asarray(lens), jnp.asarray(g), jax.random.PRNGKey(5),
        segment_frames=16,
    )
    return float(total)


def test_elastic_training_death_resumes_from_checkpoint(tmp_path):
    """VERDICT r4 next #2: a training worker of a 2-process world dies
    mid-run (hard exit after step 6); the TrainSupervisor relaunches a
    world that RESUMES from the latest checkpoint (step 4, ckpt_every=4)
    and reaches the target step count with finite losses — and the final
    state's probe loss is at or below the pre-kill checkpoint's."""
    from openvoice_tpu.ckpt import native_io as CIO
    from openvoice_tpu.runtime.elastic import TrainSupervisor

    data_root = tmp_path / "data"
    ckpt_dir = str(tmp_path / "ckpt")
    _make_training_data(data_root)
    marker = str(tmp_path / "die.marker")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    target = 20

    def cmd(coordinator, world, pid):
        return [
            sys.executable, "-m", "tests._elastic_train_child",
            str(data_root), ckpt_dir, coordinator or "none",
            str(world), str(pid), str(target),
            f"1:6:{marker}",  # process 1 dies after step 6, once
        ]

    env = _clean_env()
    env["PYTHONPATH"] = repo
    sup = TrainSupervisor(ckpt_dir, target, cmd, world=2, max_restarts=3, env=env)
    assert sup.run(timeout_s=600), f"elastic training failed: {sup.history}"

    assert os.path.exists(marker), "fault injection never fired"
    # attempt 1 died (injected 9 + peer EX_TEMPFAIL/fatal); a relaunch ran
    assert len(sup.history) >= 2, sup.history
    assert any(rc not in (0,) for rc in sup.history[0]["rcs"]), sup.history[0]
    final = CIO.latest_step(ckpt_dir)
    assert final is not None and final >= target

    # the relaunch RESUMED: the pre-kill checkpoint exists and training
    # improved (probe loss monotone-ish: final <= pre-kill, small slack)
    from openvoice_tpu.training import train as T

    template = T.init_train_state(jax.random.PRNGKey(0), TINY, lr=2e-3)
    pre_kill = _probe_loss(template, f"{ckpt_dir}/step_4")
    final_loss = _probe_loss(template, f"{ckpt_dir}/step_{final}")
    assert np.isfinite(pre_kill) and np.isfinite(final_loss)
    assert final_loss <= pre_kill * 1.02, (pre_kill, final_loss)


def test_supervisor_full_run_no_failure(worklog, tmp_path):
    """Happy path: a 2-process world completes the whole WorkLog with zero
    restarts; results equal single-process truth."""
    log, params = worklog
    cmd, repo = _worker_cmd_factory(str(tmp_path))
    env = _clean_env()
    env["PYTHONPATH"] = repo
    sup = Supervisor(str(tmp_path), cmd, world=2, max_restarts=1, env=env)
    assert sup.run(timeout_s=300), f"run failed: {sup.history}"
    assert sup.restarts == 0
    assert not log.pending_ids(N_REQUESTS)
    reqs = log.load_requests()
    for i, req in enumerate(reqs):
        np.testing.assert_allclose(log.load_result(i), _truth(params, req), atol=2e-5)
