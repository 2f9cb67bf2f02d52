"""Training input pipeline (new capability — the reference ships no
training code, SURVEY.md §2).

Host-side: scan a directory of wav files per speaker, window them into
fixed-frame training segments, compute linear spectrograms with the same
front end the models consume (audio/stft.py semantics = mel_processing.py:40-75),
and yield device-ready batches.  Multi-host: each process reads only its
own shard of the file list (round-robin by process index) and
`make_global_batch` assembles a globally-sharded array over the mesh's
data axis via `jax.make_array_from_process_local_data` — the TPU-native
replacement for a distributed data loader.

Speaker embeddings for self-reconstruction training come from the model's
own reference encoder (extract_se per speaker directory, cached), matching
how the converter is conditioned at inference.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

import numpy as np

import jax
import jax.numpy as jnp

from openvoice_tpu.audio.io import load_audio
from openvoice_tpu.config import SynthesizerConfig


@dataclass(frozen=True)
class Segment:
    path: str
    start: int       # sample offset
    frames: int      # spectrogram frames
    speaker: str


def scan_dataset(
    root: str,
    cfg: SynthesizerConfig,
    segment_frames: int = 128,
    hop_segments: int | None = None,
    process_index: int | None = None,
    process_count: int | None = None,
) -> list[Segment]:
    """root/<speaker>/*.wav → windowed segment index, sharded by process.

    Segments are `segment_frames` spectrogram frames (= frames·hop samples),
    stepped by `hop_segments` frames (default: non-overlapping).
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    step = (hop_segments or segment_frames) * cfg.hop_length
    seg_samples = segment_frames * cfg.hop_length

    files: list[tuple[str, str]] = []
    for speaker in sorted(os.listdir(root)):
        sdir = os.path.join(root, speaker)
        if not os.path.isdir(sdir):
            continue
        for f in sorted(os.listdir(sdir)):
            if f.lower().endswith((".wav", ".mp3")):
                files.append((os.path.join(sdir, f), speaker))

    from openvoice_tpu.audio.io import wav_num_samples

    segments: list[Segment] = []
    for idx, (path, speaker) in enumerate(files):
        if idx % pc != pi:  # per-host shard of the file list
            continue
        # window count needs only the length — read it from the WAV header
        # rather than decoding the entire corpus at scan time
        if path.lower().endswith(".wav"):
            length = wav_num_samples(path, target_sr=cfg.sampling_rate)
        else:
            length = len(load_audio(path, sr=cfg.sampling_rate)[0])
        n = (length - seg_samples) // step + 1 if length >= seg_samples else 0
        for j in range(n):
            segments.append(Segment(path, j * step, segment_frames, speaker))
    return segments


class ConverterDataset:
    """Iterates (spec, audio, lengths, g) batches for converter training."""

    def __init__(
        self,
        root: str,
        cfg: SynthesizerConfig,
        batch_size: int,
        segment_frames: int = 128,
        seed: int = 0,
        converter=None,
    ):
        self.cfg = cfg
        self.batch_size = batch_size
        self.segment_frames = segment_frames
        self.segments = scan_dataset(root, cfg, segment_frames)
        if not self.segments:
            raise ValueError(f"no trainable segments under {root}")
        self._rng = np.random.default_rng(seed + jax.process_index())
        self._audio_cache: dict[str, np.ndarray] = {}
        self._se_cache: dict[str, np.ndarray] = {}
        self._converter = converter

    def _audio(self, path: str) -> np.ndarray:
        if path not in self._audio_cache:
            while len(self._audio_cache) > 256:  # evict oldest, not everything
                self._audio_cache.pop(next(iter(self._audio_cache)))
            self._audio_cache[path] = load_audio(path, sr=self.cfg.sampling_rate)[0]
        return self._audio_cache[path]

    def _speaker_se(self, speaker: str, example_path: str) -> np.ndarray:
        """Per-speaker embedding from the model's own ref_enc (cached);
        zeros when no converter is wired in (zero_g-style training)."""
        if speaker not in self._se_cache:
            if self._converter is None:
                self._se_cache[speaker] = np.zeros(self.cfg.gin_channels, np.float32)
            else:
                se = self._converter.extract_se_from_file(example_path)
                self._se_cache[speaker] = np.asarray(se).reshape(-1)
        return self._se_cache[speaker]

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
        from openvoice_tpu.api import _spec_from_audio
        from openvoice_tpu.audio.stft import host_spectrogram

        cfg = self.cfg
        order = self._rng.permutation(len(self.segments))
        for i in range(0, len(order) - self.batch_size + 1, self.batch_size):
            batch = [self.segments[j] for j in order[i : i + self.batch_size]]
            seg_samples = self.segment_frames * cfg.hop_length
            audio = np.zeros((len(batch), seg_samples), np.float32)
            g = np.zeros((len(batch), 1, cfg.gin_channels), np.float32)
            for bi, seg in enumerate(batch):
                a = self._audio(seg.path)
                audio[bi] = a[seg.start : seg.start + seg_samples]
                g[bi, 0] = self._speaker_se(seg.speaker, seg.path)
            # host numpy STFT (same padding/framing as inference): the old
            # device _spec_btf here was a BLOCKING device round trip per
            # batch (~0.5 s through the dispatch tunnel — dominated the
            # measured train-loop wall at 9.5 ms device steps)
            spec = np.stack([
                host_spectrogram(
                    _spec_from_audio(audio[bi], cfg)[0],
                    cfg.filter_length, cfg.hop_length, cfg.win_length,
                )[: self.segment_frames]
                for bi in range(len(batch))
            ])
            lengths = np.full((len(batch),), self.segment_frames, np.int32)
            yield spec, audio, lengths, g


class PrefetchIterator:
    """Background-thread batch prefetch: host batch prep (audio slicing,
    numpy STFT, SE lookup) overlaps the device step instead of serializing
    with it.  `depth` bounds host memory (batches in flight)."""

    def __init__(self, iterable, depth: int = 4):
        import queue as _queue
        import threading as _threading

        self._q: "_queue.Queue" = _queue.Queue(maxsize=depth)
        self._done = object()
        self._err: list[BaseException] = []
        self._stop = _threading.Event()

        def worker() -> None:
            try:
                for item in iterable:
                    # bounded put would block forever if the consumer exits
                    # early; poll the stop flag so close() can unblock us
                    while not self._stop.is_set():
                        try:
                            self._q.put(item, timeout=0.1)
                            break
                        except _queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except BaseException as e:  # noqa: BLE001 — re-raised on the consumer
                self._err.append(e)
            finally:
                # the done marker must be DELIVERED, not best-effort: with a
                # fast producer the queue is typically FULL when iteration
                # ends, and a dropped marker deadlocks the consumer on
                # get() after it drains the last batch (hit in practice on
                # TPU, where the device step is slower than batch prep) —
                # so block (stop-aware) until there is room
                while not self._stop.is_set():
                    try:
                        self._q.put(self._done, timeout=0.1)
                        break
                    except _queue.Full:
                        continue

        self._thread = _threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def close(self) -> None:
        """Stop the worker and release in-flight batches; idempotent.  Call
        when abandoning the iterator before exhaustion (early train() exit)."""
        self._stop.set()
        while True:
            try:
                self._q.get_nowait()
            except Exception:
                break
        self._thread.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            if self._err:
                raise self._err[0]
            raise StopIteration
        return item


def make_global_batch(local_batch: np.ndarray, mesh, spec=None):
    """Host-local batch shard → one global jax.Array sharded over `data`.

    Every host calls this with its own local batch; the result behaves like
    a single [global_batch, ...] array for pjit'd train_step.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, spec if spec is not None else P("data"))
    return jax.make_array_from_process_local_data(sharding, local_batch)
