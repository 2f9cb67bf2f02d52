"""Training input-pipeline tests: dataset scan/windowing, batch iteration,
global-batch assembly over the virtual mesh."""

import numpy as np
import pytest

import jax

from openvoice_tpu.config import SynthesizerConfig
from openvoice_tpu.training.data import ConverterDataset, make_global_batch, scan_dataset

TINY = SynthesizerConfig(
    n_speakers=0, zero_g=True,
    spec_channels=129, filter_length=256, hop_length=64, win_length=256,
    inter_channels=64, hidden_channels=64,
    upsample_initial_channel=128, upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    gin_channels=64, enc_q_layers=4, flow_n_flows=2, flow_wn_layers=2,
)


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    from openvoice_tpu.audio.io import save_wav

    root = tmp_path_factory.mktemp("ds")
    sr = TINY.sampling_rate
    rng = np.random.default_rng(0)
    for speaker, n_files in (("alice", 2), ("bob", 1)):
        d = root / speaker
        d.mkdir()
        for i in range(n_files):
            audio = (rng.standard_normal(3 * sr) * 0.1).astype(np.float32)
            save_wav(str(d / f"utt{i}.wav"), audio, sr)
    return str(root)


def test_scan_windows_and_speakers(dataset_dir):
    segs = scan_dataset(dataset_dir, TINY, segment_frames=64,
                        process_index=0, process_count=1)
    assert segs
    speakers = {s.speaker for s in segs}
    assert speakers == {"alice", "bob"}
    # 3 s at 22.05 kHz / hop 64 ≈ 1033 frames → 16 non-overlapping 64-frame windows/file
    per_file = (3 * TINY.sampling_rate - 64 * TINY.hop_length) // (64 * TINY.hop_length) + 1
    assert len(segs) == 3 * per_file


def test_process_sharding_partitions(dataset_dir):
    all_segs = scan_dataset(dataset_dir, TINY, 64, process_index=0, process_count=1)
    s0 = scan_dataset(dataset_dir, TINY, 64, process_index=0, process_count=2)
    s1 = scan_dataset(dataset_dir, TINY, 64, process_index=1, process_count=2)
    assert len(s0) + len(s1) == len(all_segs)
    assert {x.path for x in s0}.isdisjoint({x.path for x in s1})


def test_batch_iteration_shapes(dataset_dir):
    ds = ConverterDataset(dataset_dir, TINY, batch_size=4, segment_frames=64)
    spec, audio, lengths, g = next(iter(ds))
    assert spec.shape == (4, 64, TINY.spec_channels)
    assert audio.shape == (4, 64 * TINY.hop_length)
    assert lengths.tolist() == [64] * 4
    assert g.shape == (4, 1, TINY.gin_channels)
    assert np.isfinite(spec).all() and (spec >= 0).all()


def test_prefetch_iterator_matches_direct(dataset_dir):
    """PrefetchIterator yields the same batches in the same order as
    iterating directly (background thread, bounded queue), and propagates
    worker exceptions to the consumer."""
    import pytest

    from openvoice_tpu.training.data import PrefetchIterator

    ds1 = ConverterDataset(dataset_dir, TINY, batch_size=2, segment_frames=64, seed=5)
    ds2 = ConverterDataset(dataset_dir, TINY, batch_size=2, segment_frames=64, seed=5)
    direct = list(iter(ds1))
    fetched = list(PrefetchIterator(iter(ds2), depth=2))
    assert len(direct) == len(fetched) > 0
    for a, b in zip(direct, fetched):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def boom():
        yield 1
        raise RuntimeError("worker died")

    it = PrefetchIterator(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="worker died"):
        next(it)


def test_prefetch_iterator_close_stops_worker():
    """Abandoning the iterator early must not leak the worker thread: the
    worker blocks on the bounded queue, close() unblocks and joins it."""
    from openvoice_tpu.training.data import PrefetchIterator

    def endless():
        i = 0
        while True:
            yield i
            i += 1

    it = PrefetchIterator(endless(), depth=2)
    assert next(it) == 0  # worker is alive and producing
    it.close()
    assert not it._thread.is_alive()
    it.close()  # idempotent

    # context-manager form used by training.loop.train
    with PrefetchIterator(endless(), depth=2) as it2:
        assert next(it2) == 0
    assert not it2._thread.is_alive()


def test_prefetch_iterator_slow_consumer_gets_stop_iteration():
    """Deadlock regression (hit on TPU, r5): with a fast producer the queue
    is FULL when iteration ends; the done marker used to be dropped
    (put_nowait), leaving a drained consumer blocked on get() forever.
    A slow consumer must still receive StopIteration."""
    import threading
    import time as _time

    from openvoice_tpu.training.data import PrefetchIterator

    got: list[int] = []
    finished = threading.Event()

    def consume():
        it = PrefetchIterator(iter(range(8)), depth=2)
        for x in it:  # slower than the producer by construction
            got.append(x)
            _time.sleep(0.05)
        finished.set()

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    assert finished.wait(timeout=10.0), "consumer deadlocked after drain"
    assert got == list(range(8))


def test_loop_train_checkpoint_resume_and_on_step(dataset_dir, tmp_path):
    """training.loop.train direct (in-process) coverage: periodic
    checkpoints land, a second call RESUMES from latest_step instead of
    restarting, and the on_step hook fires for exactly the steps run."""
    from openvoice_tpu.ckpt import native_io as CIO
    from openvoice_tpu.training.loop import train

    ckpt = str(tmp_path / "ck")
    seen: list[int] = []
    train(dataset_dir, TINY, steps=5, batch_size=2, segment_frames=24,
          adversarial=False, ckpt_dir=ckpt, ckpt_every=2, log_every=0,
          on_step=lambda s, m: seen.append(s))
    assert seen == [1, 2, 3, 4, 5]
    assert CIO.latest_step(ckpt) == 5  # final save on exit

    seen2: list[int] = []
    train(dataset_dir, TINY, steps=8, batch_size=2, segment_frames=24,
          adversarial=False, ckpt_dir=ckpt, ckpt_every=2, log_every=0,
          on_step=lambda s, m: seen2.append(s))
    assert seen2 == [6, 7, 8]  # resumed, not restarted
    assert CIO.latest_step(ckpt) == 8


def test_train_step_consumes_batches(dataset_dir):
    from openvoice_tpu.training.train import init_train_state, train_step
    import jax.numpy as jnp

    ds = ConverterDataset(dataset_dir, TINY, batch_size=2, segment_frames=64)
    state = init_train_state(jax.random.PRNGKey(0), TINY)
    spec, audio, lengths, g = next(iter(ds))
    state, metrics = train_step(
        state, TINY, jnp.asarray(spec), jnp.asarray(audio),
        jnp.asarray(lengths), jnp.asarray(g), jax.random.PRNGKey(1),
    )
    assert np.isfinite(float(metrics["total"]))


def test_make_global_batch(dataset_dir):
    from openvoice_tpu.runtime.mesh import make_mesh

    mesh = make_mesh(8, data=8, model=1)
    local = np.ones((8, 3), np.float32)
    arr = make_global_batch(local, mesh)
    assert arr.shape == (8, 3)
    assert not arr.is_fully_replicated
