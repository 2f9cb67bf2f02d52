"""Serving tier tests: batcher grouping, failure isolation, HTTP endpoints."""

import json
import time
import urllib.request

import numpy as np
import pytest

import jax

from openvoice_tpu.config import SynthesizerConfig
from openvoice_tpu.models import synthesizer as S
from openvoice_tpu.serve.batcher import ConvertBatcher, ConvertRequest

TINY = SynthesizerConfig(
    n_speakers=0, zero_g=True,
    spec_channels=129, filter_length=256, hop_length=64, win_length=256,
    inter_channels=64, hidden_channels=64,
    upsample_initial_channel=128, upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
    resblock_kernel_sizes=(3, 7), resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
    gin_channels=64,
)


@pytest.fixture(scope="module")
def batcher():
    params = S.init_synthesizer(jax.random.PRNGKey(0), TINY)
    b = ConvertBatcher(params, TINY, max_batch=4, max_wait_ms=20)
    b.start()
    yield b
    b.stop()


def _req(n_frames, seed=0):
    rng = np.random.default_rng(seed)
    return ConvertRequest(
        spec=np.abs(rng.standard_normal((n_frames, TINY.spec_channels))).astype(np.float32),
        n_frames=n_frames,
        g_src=rng.standard_normal(TINY.gin_channels).astype(np.float32),
        g_tgt=rng.standard_normal(TINY.gin_channels).astype(np.float32),
        tau=0.0,
        seed=seed,
    )


def test_batcher_single(batcher):
    fut = batcher.submit(_req(50))
    audio = fut.result(timeout=300)
    assert audio.shape == (50 * TINY.upsample_factor,)
    assert np.isfinite(audio).all()


def test_batcher_groups_and_batches(batcher):
    futs = [batcher.submit(_req(40 + i, seed=i)) for i in range(8)]
    outs = [f.result(timeout=300) for f in futs]
    for i, out in enumerate(outs):
        assert out.shape == ((40 + i) * TINY.upsample_factor,)


def test_batcher_result_independent_of_batchmates(batcher):
    """A request's audio must not depend on what it was batched with."""
    solo = batcher.submit(_req(48, seed=7)).result(timeout=300)
    futs = [batcher.submit(_req(48, seed=s)) for s in (7, 8, 9, 10)]
    batched = futs[0].result(timeout=300)
    np.testing.assert_allclose(solo, batched, atol=2e-5)


def test_pcm_fast_path_matches_spec_path(batcher):
    """The PCM fast path (int16 upload, in-graph STFT, device-side noise)
    must produce the same audio as the spectrogram path at tau=0 (where the
    noise draw is inert) for the same waveform."""
    from openvoice_tpu.api import _spec_from_audio, _spec_btf
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    wave = (rng.standard_normal(48 * TINY.hop_length) * 0.1).astype(np.float32)
    # match what the PCM path actually uploads: int16-quantized samples
    wave = np.round(np.clip(wave, -1, 1) * 32767.0).astype(np.int16) / np.float32(32767.0)
    g_s = rng.standard_normal(TINY.gin_channels).astype(np.float32)
    g_t = rng.standard_normal(TINY.gin_channels).astype(np.float32)

    pcm_out = batcher.submit(ConvertRequest(
        audio=wave, g_src=g_s, g_tgt=g_t, tau=0.0, seed=3,
    )).result(timeout=300)

    padded, n_frames = _spec_from_audio(wave.astype(np.float32), TINY)
    spec = np.asarray(_spec_btf(
        jnp.asarray(padded)[None], TINY.filter_length, TINY.hop_length,
        TINY.win_length,
    ))[0, :n_frames]
    spec_out = batcher.submit(ConvertRequest(
        spec=spec, n_frames=n_frames, g_src=g_s, g_tgt=g_t, tau=0.0, seed=3,
    )).result(timeout=300)

    assert pcm_out.shape == spec_out.shape
    # int16 wire quantization on the output bounds the difference
    np.testing.assert_allclose(pcm_out, spec_out, atol=3e-4)


def test_pcm_fast_path_deterministic_per_seed(batcher):
    """Device-side noise: same seed → identical audio; different seed →
    different audio (tau>0 makes the draw live)."""
    rng = np.random.default_rng(12)
    wave = (rng.standard_normal(40 * TINY.hop_length) * 0.1).astype(np.float32)
    g_s = rng.standard_normal(TINY.gin_channels).astype(np.float32)
    g_t = rng.standard_normal(TINY.gin_channels).astype(np.float32)

    mk = lambda seed: batcher.submit(ConvertRequest(
        audio=wave, g_src=g_s, g_tgt=g_t, tau=0.4, seed=seed,
    )).result(timeout=300)
    a1, a2, b = mk(5), mk(5), mk(6)
    np.testing.assert_array_equal(a1, a2)
    assert np.max(np.abs(a1 - b)) > 1e-4


def test_seed_semantics_per_path(batcher):
    """Pins the documented per-path noise semantics at tau>0 (batcher.py
    ConvertRequest): the spec path keeps ToneColorConverter.convert's
    host-rng stream (np.random.default_rng(seed)) exactly, while the PCM
    path's device-side PRNGKey(seed) stream is deterministic but different
    — the same seed legitimately yields different audio across paths."""
    from openvoice_tpu.api import _spec_from_audio, _spec_btf
    import jax.numpy as jnp

    rng = np.random.default_rng(31)
    wave = (rng.standard_normal(48 * TINY.hop_length) * 0.1).astype(np.float32)
    wave = np.round(np.clip(wave, -1, 1) * 32767.0).astype(np.int16) / np.float32(32767.0)
    g_s = rng.standard_normal(TINY.gin_channels).astype(np.float32)
    g_t = rng.standard_normal(TINY.gin_channels).astype(np.float32)
    tau, seed = 0.4, 17

    padded, n_frames = _spec_from_audio(wave.astype(np.float32), TINY)
    spec = np.asarray(_spec_btf(
        jnp.asarray(padded)[None], TINY.filter_length, TINY.hop_length,
        TINY.win_length,
    ))[0, :n_frames]

    spec_out = batcher.submit(ConvertRequest(
        spec=spec, n_frames=n_frames, g_src=g_s, g_tgt=g_t, tau=tau, seed=seed,
    )).result(timeout=300)
    pcm_out = batcher.submit(ConvertRequest(
        audio=wave, g_src=g_s, g_tgt=g_t, tau=tau, seed=seed,
    )).result(timeout=300)

    # (a) spec path == direct host-noise convert (the converter.convert
    # semantics), up to int16 wire quantization
    noise = np.random.default_rng(seed).standard_normal(
        (n_frames, TINY.inter_channels)).astype(np.float32)
    direct, _ = S.voice_conversion_jit(
        batcher.params, TINY, jnp.asarray(spec)[None],
        jnp.asarray([n_frames]), jnp.asarray(g_s)[None, None],
        jnp.asarray(g_t)[None, None],
        jnp.full((1, 1, 1), tau, np.float32), jnp.asarray(noise)[None],
    )
    direct = np.asarray(direct)[0, : n_frames * TINY.upsample_factor, 0]
    np.testing.assert_allclose(spec_out, direct, atol=3e-4)

    # (b) PCM path: same shape, deterministic (covered elsewhere), but a
    # DIFFERENT stream — the documented compatibility break
    assert pcm_out.shape == spec_out.shape
    assert np.max(np.abs(pcm_out - spec_out)) > 1e-3


def test_mesh_data_parallel_batcher_matches_single_device():
    """A batcher built over a ('data','model') mesh shards every dispatched
    batch across the data axis (GSPMD partitions the unchanged graph);
    results must match the single-device batcher for the same requests."""
    from openvoice_tpu.runtime.mesh import make_mesh

    if jax.device_count() < 4:
        pytest.skip("needs the 8-virtual-device CPU backend")
    params = S.init_synthesizer(jax.random.PRNGKey(0), TINY)
    mesh = make_mesh(4, data=4, model=1)

    b_single = ConvertBatcher(params, TINY, max_batch=4, max_wait_ms=10)
    b_mesh = ConvertBatcher(params, TINY, max_batch=4, max_wait_ms=10, mesh=mesh)
    b_single.start()
    b_mesh.start()
    try:
        reqs = [(48, 3), (48, 4), (52, 5), (40, 6), (40, 7)]
        singles = [b_single.submit(_req(n, seed=s)).result(timeout=300)
                   for n, s in reqs]
        futs = [b_mesh.submit(_req(n, seed=s)) for n, s in reqs]
        for (n, s), single, fut in zip(reqs, singles, futs):
            sharded = fut.result(timeout=300)
            assert sharded.shape == single.shape
            np.testing.assert_allclose(sharded, single, atol=5e-5)

        # PCM path under the mesh too (device-side per-seed noise)
        rng = np.random.default_rng(21)
        wave = (rng.standard_normal(48 * TINY.hop_length) * 0.1).astype(np.float32)
        g_s = rng.standard_normal(TINY.gin_channels).astype(np.float32)
        g_t = rng.standard_normal(TINY.gin_channels).astype(np.float32)
        one = b_single.submit(ConvertRequest(
            audio=wave, g_src=g_s, g_tgt=g_t, tau=0.0, seed=9)).result(timeout=300)
        two = b_mesh.submit(ConvertRequest(
            audio=wave, g_src=g_s, g_tgt=g_t, tau=0.0, seed=9)).result(timeout=300)
        np.testing.assert_allclose(two, one, atol=5e-4)
    finally:
        b_single.stop()
        b_mesh.stop()


def test_distributed_convert_service_single_process():
    """Lock-step DistributedConvertService (the multi-process serving tier,
    exercised for real in tests/_multiproc_child.py) degrades to a correct
    single-process data-parallel service on the virtual mesh."""
    import jax.numpy as jnp

    from openvoice_tpu.runtime.bucketing import round_up_to_bucket
    from openvoice_tpu.runtime.mesh import make_mesh
    from openvoice_tpu.serve.distributed import DistRequest, DistributedConvertService

    if jax.device_count() < 4:
        pytest.skip("needs the 8-virtual-device CPU backend")
    params = S.init_synthesizer(jax.random.PRNGKey(0), TINY)
    svc = DistributedConvertService(params, TINY, make_mesh(4, data=4, model=1))
    rng = np.random.default_rng(3)
    reqs = [
        DistRequest(
            spec=np.abs(rng.standard_normal((nf, TINY.spec_channels))).astype(np.float32),
            n_frames=nf,
            g_src=rng.standard_normal(TINY.gin_channels).astype(np.float32),
            g_tgt=rng.standard_normal(TINY.gin_channels).astype(np.float32),
            tau=0.3, seed=40 + i,
        )
        for i, nf in enumerate([40, 48, 56])
    ]
    outs = svc.convert_round(reqs)
    assert len(outs) == 3
    bucket = round_up_to_bucket(max(r.n_frames for r in reqs))
    for r, out in zip(reqs, outs):
        spec = np.zeros((1, bucket, TINY.spec_channels), np.float32)
        spec[0, : r.n_frames] = r.spec
        noise = np.random.default_rng(r.seed).standard_normal(
            (bucket, TINY.inter_channels)).astype(np.float32)[None]
        audio, _ = S.voice_conversion_jit(
            params, TINY, jnp.asarray(spec), jnp.asarray([r.n_frames]),
            jnp.asarray(r.g_src)[None, None], jnp.asarray(r.g_tgt)[None, None],
            jnp.full((1, 1, 1), r.tau, np.float32), jnp.asarray(noise),
        )
        truth = np.asarray(audio)[0, : r.n_frames * TINY.upsample_factor, 0]
        np.testing.assert_allclose(out, truth, atol=2e-5)
    assert svc.convert_round([]) == []


def test_distributed_convert_service_model_axis_dedupes_replica_shards():
    """r4 review regression: with model parallel > 1, every data-shard row
    range appears once per model-axis device in addressable_shards; the
    readback must dedupe by row range or later requests get earlier rows'
    audio."""
    import jax.numpy as jnp

    from openvoice_tpu.runtime.bucketing import round_up_to_bucket
    from openvoice_tpu.runtime.mesh import make_mesh
    from openvoice_tpu.serve.distributed import DistRequest, DistributedConvertService

    if jax.device_count() < 4:
        pytest.skip("needs the 8-virtual-device CPU backend")
    params = S.init_synthesizer(jax.random.PRNGKey(0), TINY)
    svc = DistributedConvertService(params, TINY, make_mesh(4, data=2, model=2))
    rng = np.random.default_rng(5)
    reqs = [
        DistRequest(
            spec=np.abs(rng.standard_normal((40 + 4 * i, TINY.spec_channels))).astype(np.float32),
            n_frames=40 + 4 * i,
            g_src=rng.standard_normal(TINY.gin_channels).astype(np.float32),
            g_tgt=rng.standard_normal(TINY.gin_channels).astype(np.float32),
            tau=0.3, seed=50 + i,
        )
        for i in range(4)
    ]
    outs = svc.convert_round(reqs)
    bucket = round_up_to_bucket(max(r.n_frames for r in reqs))
    for r, out in zip(reqs, outs):
        spec = np.zeros((1, bucket, TINY.spec_channels), np.float32)
        spec[0, : r.n_frames] = r.spec
        noise = np.zeros((1, bucket, TINY.inter_channels), np.float32)
        noise[0, : r.n_frames] = np.random.default_rng(r.seed).standard_normal(
            (r.n_frames, TINY.inter_channels)).astype(np.float32)
        audio, _ = S.voice_conversion_jit(
            params, TINY, jnp.asarray(spec), jnp.asarray([r.n_frames]),
            jnp.asarray(r.g_src)[None, None], jnp.asarray(r.g_tgt)[None, None],
            jnp.full((1, 1, 1), r.tau, np.float32), jnp.asarray(noise),
        )
        truth = np.asarray(audio)[0, : r.n_frames * TINY.upsample_factor, 0]
        np.testing.assert_allclose(out, truth, atol=2e-5)


def test_256_stream_with_fault_injection():
    """BASELINE config 5 as a test: a 256-utterance concurrent stream with a
    fault injected mid-stream.  Every request must complete — converted
    audio of the right shape, or an isolated error for the poisoned batch
    only — and tail latency stays bounded (no hang, no lost future)."""
    import threading

    from openvoice_tpu.models import synthesizer as SY
    from openvoice_tpu.runtime.profiler import METRICS

    params = SY.init_synthesizer(jax.random.PRNGKey(1), TINY)
    b = ConvertBatcher(params, TINY, max_batch=8, max_wait_ms=10)

    real = SY.voice_conversion_jit
    calls = {"n": 0}

    def poisoned(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 3:  # one mid-stream device failure
            raise RuntimeError("injected fault: device unavailable")
        return real(*args, **kwargs)

    SY.voice_conversion_jit = poisoned
    try:
        b.start()
        n_req, n_threads = 256, 8
        lengths = [(48, 56, 64)[i % 3] for i in range(n_req)]
        futs: list = [None] * n_req

        def submitter(tid: int):
            for i in range(tid, n_req, n_threads):
                futs[i] = b.submit(_req(lengths[i], seed=i))
                time.sleep(0.001)

        threads = [threading.Thread(target=submitter, args=(t,)) for t in range(n_threads)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        ok, failed, latencies = 0, 0, []
        for i, f in enumerate(futs):
            try:
                audio = f.result(timeout=600)
                assert audio.shape == (lengths[i] * TINY.upsample_factor,)
                assert np.isfinite(audio).all()
                ok += 1
            except RuntimeError as exc:
                assert "injected fault" in str(exc)
                failed += 1
            latencies.append(time.perf_counter() - t0)
    finally:
        SY.voice_conversion_jit = real
        b.stop()

    assert ok + failed == n_req  # no lost requests
    assert 0 < failed <= 8  # exactly the poisoned batch, isolated
    assert ok >= n_req - 8
    p99 = sorted(latencies)[int(0.99 * n_req)]
    assert p99 < 300.0, f"p99 {p99:.1f}s — stream stalled"
    snap = METRICS.snapshot()
    assert snap["counters"].get("batch_failures", 0) >= 1


def test_metrics_flow(batcher):
    from openvoice_tpu.runtime.profiler import METRICS

    snap = METRICS.snapshot()
    assert snap["counters"].get("audio_seconds", 0) > 0
    assert "request_latency" in snap["latency"]
