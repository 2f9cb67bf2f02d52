"""Whisper-mode segmentation tests with a fake ASR backend (no weights)."""

import numpy as np

from openvoice_tpu.pipeline.whisper_seg import (
    AsrSegment,
    make_segmenter,
    split_audio_whisper,
)

SR = 16000


class FakeSegmenter:
    def __init__(self, segments):
        self._segments = segments

    def transcribe(self, audio, sr):
        return self._segments


def test_filters_by_duration_and_text():
    audio = np.random.default_rng(0).standard_normal(SR * 30).astype(np.float32)
    segs = [
        AsrSegment(0.0, 1.0, "too short dur"),          # < 1.5 s → dropped
        AsrSegment(1.0, 4.0, "keep me"),                # kept
        AsrSegment(4.0, 26.0, "way too long segment"),  # > 20 s → dropped
        AsrSegment(26.0, 29.0, "x"),                    # text < 2 chars → dropped
        AsrSegment(29.0, 29.9, ""),                     # both → dropped
    ]
    out = split_audio_whisper(audio, SR, FakeSegmenter(segs))
    assert len(out) == 1
    assert len(out[0]) == 3 * SR


def test_overlapping_segments_clamped():
    audio = np.zeros(SR * 10, np.float32)
    segs = [
        AsrSegment(0.0, 5.0, "first"),
        AsrSegment(3.0, 9.0, "second overlaps"),  # start clamped to 5.0
    ]
    out = split_audio_whisper(audio, SR, FakeSegmenter(segs))
    assert len(out) == 2
    assert len(out[1]) == 4 * SR  # 5.0 → 9.0


def test_end_clamped_to_audio_length():
    audio = np.zeros(SR * 5, np.float32)
    segs = [AsrSegment(1.0, 99.0, "runs past the end")]
    out = split_audio_whisper(audio, SR, FakeSegmenter(segs))
    assert len(out) == 1
    assert len(out[0]) == 4 * SR


def test_make_segmenter_degrades_without_weights():
    # no cached whisper weights in this image → None, callers use VAD
    assert make_segmenter(prefer_whisper=False) is None
    seg = make_segmenter(prefer_whisper=True)
    assert seg is None or hasattr(seg, "transcribe")
