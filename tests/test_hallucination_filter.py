"""hallucination_silence_threshold (openai-whisper's word-timestamp-gated
hallucination skip, inherited by the reference via whisper.transcribe
defaults at app/services/audio_processor.py:1076).

Behaviour tests mirror openai's rule: a segment whose words are anomalous
(low probability / implausible durations) AND which is bounded by silence
longer than the threshold on both sides is dropped, along with its words.
"""
import numpy as np
import pytest

from audio_processor_tpu.pipeline.transcribe import (
    Transcriber,
    _is_segment_anomaly,
    _word_anomaly_score,
    filter_hallucinations,
)


def w(word, start, end, p):
    return {"word": word, "start": start, "end": end, "probability": p}


def seg(start, end, text):
    return {"start": start, "end": end, "text": text}


GOOD = dict(p=0.9)


def good_words(t0, words, dur=0.3, gap=0.05, p=0.9):
    out, t = [], t0
    for word in words:
        out.append(w(word, round(t, 3), round(t + dur, 3), p))
        t += dur + gap
    return out


# -- scoring ---------------------------------------------------------------

def test_word_anomaly_score_matches_openai_rules():
    assert _word_anomaly_score(w("ok", 0.0, 0.5, 0.9)) == 0.0
    assert _word_anomaly_score(w("ok", 0.0, 0.5, 0.1)) == 1.0  # improbable
    # too short: (0.133 - 0.05) * 15 = 1.245
    assert _word_anomaly_score(w("ok", 0.0, 0.05, 0.9)) == pytest.approx(1.245)
    # too long: 3.0 - 2.0 = 1.0
    assert _word_anomaly_score(w("ok", 0.0, 3.0, 0.9)) == pytest.approx(1.0)


def test_segment_anomaly_thresholds():
    assert not _is_segment_anomaly(good_words(0.0, ["a", "b", "c"]))
    # every word improbable -> score == len(words) -> anomaly
    assert _is_segment_anomaly(good_words(0.0, ["a", "b", "c"], p=0.01))
    # punctuation-only "words" are ignored
    assert not _is_segment_anomaly([w(".", 0.0, 0.01, 0.01)])
    assert not _is_segment_anomaly([])


# -- the filter ------------------------------------------------------------

def test_hallucination_surrounded_by_silence_is_dropped():
    words = (
        good_words(0.0, ["hello", "there"])
        + good_words(20.0, ["ghost", "words"], p=0.01)
        + good_words(40.0, ["real", "speech"])
    )
    segments = [
        seg(0.0, 1.0, "hello there"),
        seg(20.0, 20.7, "ghost words"),
        seg(40.0, 41.0, "real speech"),
    ]
    ks, kw_ = filter_hallucinations(segments, words, 2.0, 60.0)
    assert [s["text"] for s in ks] == ["hello there", "real speech"]
    assert [x["word"] for x in kw_] == ["hello", "there", "real", "speech"]


def test_anomaly_without_silence_is_kept():
    # same anomalous segment but contiguous with real speech on both sides
    words = (
        good_words(0.0, ["hello", "there"])
        + good_words(1.2, ["ghost", "words"], p=0.01)
        + good_words(2.2, ["real", "speech"])
    )
    segments = [
        seg(0.0, 1.1, "hello there"),
        seg(1.2, 1.9, "ghost words"),
        seg(2.2, 3.2, "real speech"),
    ]
    ks, _ = filter_hallucinations(segments, words, 2.0, 60.0)
    assert len(ks) == 3


def test_adjacent_anomalies_count_as_silence_after():
    # two anomalous segments in a row: the first's "silence after" is
    # satisfied by the second being an anomaly (openai's rule)
    words = (
        good_words(0.0, ["real"])
        + good_words(10.0, ["ga"], p=0.01)
        + good_words(10.8, ["gb"], p=0.01)
        + good_words(30.0, ["more"])
    )
    segments = [
        seg(0.0, 0.4, "real"),
        seg(10.0, 10.4, "ga"),
        seg(10.8, 11.2, "gb"),
        seg(30.0, 30.4, "more"),
    ]
    ks, _ = filter_hallucinations(segments, words, 2.0, 60.0)
    assert [s["text"] for s in ks] == ["real", "more"]


def test_trailing_anomaly_near_recording_end_is_dropped():
    words = good_words(0.0, ["real"]) + good_words(58.5, ["tail"], p=0.01)
    segments = [seg(0.0, 0.4, "real"), seg(58.5, 59.0, "tail")]
    ks, _ = filter_hallucinations(segments, words, 2.0, 60.0)
    assert [s["text"] for s in ks] == ["real"]


def test_empty_inputs():
    assert filter_hallucinations([], [], 2.0, 60.0) == ([], [])


# -- wiring ----------------------------------------------------------------

def test_threshold_requires_word_timestamps():
    with pytest.raises(ValueError, match="word_timestamps"):
        Transcriber.random_init(
            "tiny", hallucination_silence_threshold=2.0
        )


def test_cli_flag_requires_word_timestamps(tmp_path):
    import wave

    from audio_processor_tpu import cli

    path = str(tmp_path / "a.wav")
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(np.zeros(16000, np.int16).tobytes())
    with pytest.raises(SystemExit):
        cli.main(
            ["transcribe", path, "--hallucination-silence-threshold", "2.0"]
        )
