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


class _ScriptedTranscriber:
    """transcribe() returns the next scripted segment list per call."""

    def __init__(self, script):
        self.script = list(script)
        self.calls = []

    def transcribe(self, audio, **kw):
        self.calls.append(len(audio))
        return {"segments": self.script.pop(0)}


def _seg(a, b, text):
    return {"start": a, "end": b, "text": text}


def test_local_agreement_emits_on_second_sighting():
    """Low-latency mode: a segment is emitted once two consecutive partial
    decodes agree on it exactly — before the 30 s window completes."""
    from audio_processor_tpu.pipeline.streaming import StreamingTranscriber

    t = _ScriptedTranscriber([
        # partial decode 1 (4 s buffer): one closed + one trailing segment
        [_seg(0.0, 1.5, "hello"), _seg(1.5, 4.0, "wor")],
        # partial decode 2 (8 s buffer): agrees on "hello", new trailing
        [_seg(0.0, 1.5, "hello"), _seg(1.5, 6.2, "world of"), _seg(6.2, 8.0, "str")],
    ])
    st = StreamingTranscriber(t, partial_step_s=4.0)
    out = []
    for _ in range(2):
        out += list(st.feed(np.zeros(4 * 16_000, np.float32)))
    assert out == [{"start": 0.0, "end": 1.5, "text": "hello"}]
    assert len(t.calls) == 2  # one decode per partial step


def test_local_agreement_never_confirms_trailing_segment():
    from audio_processor_tpu.pipeline.streaming import StreamingTranscriber

    t = _ScriptedTranscriber([
        [_seg(0.0, 4.0, "same")],
        [_seg(0.0, 4.0, "same"), _seg(4.0, 8.0, "tail")],
    ])
    st = StreamingTranscriber(t, partial_step_s=4.0)
    out = []
    for _ in range(2):
        out += list(st.feed(np.zeros(4 * 16_000, np.float32)))
    # "same" was the TRAILING segment of decode 1, so its first sighting
    # doesn't count; decode 2 sees it non-trailing + agreed -> emitted
    assert out == [{"start": 0.0, "end": 4.0, "text": "same"}]


def test_window_completion_emits_rest_without_duplicates():
    from audio_processor_tpu.pipeline.streaming import StreamingTranscriber

    t = _ScriptedTranscriber([
        [_seg(0.0, 5.0, "early"), _seg(5.0, 15.0, "tail")],
        [_seg(0.0, 5.0, "early"), _seg(5.0, 15.0, "middle"), _seg(15.0, 29.0, "t")],
        # the FULL 30 s window decode
        [_seg(0.0, 5.0, "early"), _seg(5.0, 15.0, "middle"), _seg(15.0, 29.5, "late")],
        # first partial decode of the NEXT window
        [_seg(0.0, 2.0, "next"), _seg(2.0, 12.0, "t")],
    ])
    st = StreamingTranscriber(t, partial_step_s=12.0)
    out = []
    for _ in range(3):  # 3 x 12 s: partial, partial, window(30)+carry 6 s
        out += list(st.feed(np.zeros(12 * 16_000, np.float32)))
    texts = [s["text"] for s in out]
    assert texts == ["early", "middle", "late", ], texts
    # next-window partial times are offset by the finalised 30 s
    out += list(st.feed(np.zeros(12 * 16_000, np.float32)))
    assert t.calls[-1] == 18 * 16_000  # 6 s carry + 12 s new


def test_boundary_resegmentation_never_loses_text():
    """If the full-window decode merges segments across the partial-
    confirmed boundary, the unemitted words still come out (the old
    tuple-based dedup dropped the whole merged segment)."""
    from audio_processor_tpu.pipeline.streaming import StreamingTranscriber

    t = _ScriptedTranscriber([
        [_seg(0.0, 5.0, "hello world"), _seg(5.0, 9.0, "tail")],
        [_seg(0.0, 5.0, "hello world"), _seg(5.0, 14.0, "how are"), _seg(14.0, 19.0, "t")],
        # full 30 s window RESEGMENTS into one merged segment
        [_seg(0.0, 12.0, "hello world how are you")],
    ])
    st = StreamingTranscriber(t, partial_step_s=10.0)
    out = list(st.feed(np.zeros(10 * 16_000, np.float32)))
    assert out == []
    out = list(st.feed(np.zeros(10 * 16_000, np.float32)))
    assert [s["text"] for s in out] == ["hello world"]
    out = list(st.feed(np.zeros(10 * 16_000, np.float32)))
    # only the UNEMITTED words emit, with the merged segment's times
    assert out == [{"start": 0.0, "end": 12.0, "text": "how are you"}]


def test_agreement_survives_timestamp_jitter():
    """Word-string agreement: a one-quantum timestamp shift between
    decodes (routine as the padded context grows) must not block
    confirmation (tuple-exact matching confirmed nothing)."""
    from audio_processor_tpu.pipeline.streaming import StreamingTranscriber

    t = _ScriptedTranscriber([
        [_seg(0.0, 3.98, "hello"), _seg(3.98, 4.0, "t")],
        [_seg(0.0, 4.0, "hello"), _seg(4.0, 7.9, "more"), _seg(7.9, 8.0, "t")],
    ])
    st = StreamingTranscriber(t, partial_step_s=4.0)
    out = list(st.feed(np.zeros(4 * 16_000, np.float32)))
    out += list(st.feed(np.zeros(4 * 16_000, np.float32)))
    assert [s["text"] for s in out] == ["hello"]
    assert out[0]["end"] == 4.0  # times from the latest decode


def test_flush_tiny_tail_resets_window_state():
    from audio_processor_tpu.pipeline.streaming import StreamingTranscriber

    t = _ScriptedTranscriber([
        [_seg(0.0, 1.0, "a"), _seg(1.0, 2.0, "t")],
        [_seg(0.0, 1.0, "a"), _seg(1.0, 2.2, "b"), _seg(2.2, 2.4, "t")],
    ])
    st = StreamingTranscriber(t, partial_step_s=1.0)
    list(st.feed(np.zeros(16_000, np.float32)))
    out = list(st.feed(np.zeros(int(1.4 * 16_000), np.float32)))
    assert [s["text"] for s in out] == ["a"]
    st._buffer = np.zeros(100, np.float32)  # sub-0.5 s tail
    list(st.flush())
    assert st._emitted_words == [] and st._prev_words == []
    assert st._partial_mark == 0


def test_single_segment_local_agreement_confirms():
    """Continuous speech usually decodes as ONE segment; agreement spans
    the whole hypothesis, so two consecutive decodes agreeing on a word
    prefix emit it before the window closes (excluding the trailing
    segment confirmed nothing until 30 s in the common case)."""
    from audio_processor_tpu.pipeline.streaming import StreamingTranscriber

    t = _ScriptedTranscriber([
        [_seg(0.0, 4.0, "hello world")],
        [_seg(0.0, 8.0, "hello world how are")],
    ])
    st = StreamingTranscriber(t, partial_step_s=4.0)
    out = list(st.feed(np.zeros(4 * 16_000, np.float32)))
    assert out == []  # first sighting: nothing to agree with yet
    out = list(st.feed(np.zeros(4 * 16_000, np.float32)))
    assert [s["text"] for s in out] == ["hello world"]


def test_feed_buffers_eagerly_without_consuming_result():
    """feed() is NOT a lazy generator: the block lands in the buffer even
    when the caller ignores the return value (window mode returns [] for
    ~30 s, so discarding it is a natural call pattern)."""
    from audio_processor_tpu.pipeline.streaming import StreamingTranscriber

    t = _ScriptedTranscriber([])
    st = StreamingTranscriber(t)
    st.feed(np.zeros(1000, np.float32))  # result deliberately discarded
    assert len(st._buffer) == 1000


def test_source_rate_buffering_one_resample_per_window():
    """Non-16k input buffers at the SOURCE rate and windows cut in the
    raw timeline resample whole — one contiguous resample per window,
    not one per mic callback block (per-block FIR edges + per-block ceil
    drift)."""
    from audio_processor_tpu.pipeline.streaming import StreamingTranscriber

    sr = 32_000
    t = _ScriptedTranscriber([[_seg(0.0, 5.0, "x"), _seg(5.0, 30.0, "y")]])
    st = StreamingTranscriber(t, sample_rate=sr)
    # 30 s of raw audio in ragged 0.7 s blocks
    fed = 0
    while fed < 30 * sr:
        n = min(int(0.7 * sr), 30 * sr - fed)
        st.feed(np.zeros(n, np.float32))
        fed += n
    assert len(t.calls) == 1  # exactly one decode at the window boundary
    assert abs(t.calls[0] - 480_000) <= 2  # resampled to ~30 s @ 16 k
    assert st._emitted_s == 30.0  # clock advances by RAW duration


def test_flush_discarded_tail_advances_clock():
    """A sub-0.5 s tail dropped by flush still advances the global clock:
    audio fed afterwards is stamped at the true stream time."""
    from audio_processor_tpu.pipeline.streaming import StreamingTranscriber

    t = _ScriptedTranscriber([[_seg(0.0, 1.0, "later")]])
    st = StreamingTranscriber(t)
    st.feed(np.zeros(int(0.4 * 16_000), np.float32))
    assert st.flush() == []
    assert st._emitted_s == pytest.approx(0.4)
    # next full window's segments are offset by the discarded tail
    out = st.feed(np.zeros(30 * 16_000, np.float32))
    assert out[0]["start"] == pytest.approx(0.4)
