"""Streaming transcription tests."""
import numpy as np
import pytest

from audio_processor_tpu.pipeline.streaming import StreamingTranscriber
from audio_processor_tpu.pipeline.transcribe import Transcriber


@pytest.fixture(scope="module")
def streamer():
    t = Transcriber.random_init("test", compute_dtype="float32", max_new_tokens=6)
    return StreamingTranscriber(t)


def test_streaming_emits_on_window_boundaries(streamer, rng):
    sr = 16000
    segs = []
    # 70 s fed in ragged 7 s blocks -> two full windows + 10 s flush
    for i in range(10):
        block = rng.normal(0, 0.1, 7 * sr).astype(np.float32)
        segs.extend(streamer.feed(block))
    n_after_feed = len(segs)
    segs.extend(streamer.flush())
    # timestamps are global and monotonic across windows
    starts = [s["start"] for s in segs]
    assert starts == sorted(starts)
    for s in segs:
        assert 0 <= s["start"] <= s["end"] <= 70.5
    assert streamer._emitted_s == pytest.approx(70.0, abs=0.01)
    # flush handled the 10 s tail (may or may not add segments; state reset)
    assert len(streamer._buffer) == 0
    assert n_after_feed <= len(segs)


def test_streaming_flush_ignores_tiny_tail(streamer, rng):
    st = StreamingTranscriber(streamer.transcriber)
    list(st.feed(rng.normal(0, 0.1, 1000).astype(np.float32)))
    assert list(st.flush()) == []
