"""WER / DER scorer tests."""
import numpy as np
import pytest

from audio_processor_tpu.utils.metrics import (
    diarization_error_rate,
    normalize_text,
    word_error_rate,
)


def test_normalize():
    assert normalize_text("Hello, World!  it's FINE.") == ["hello", "world", "it's", "fine"]


def test_wer_exact_and_known_cases():
    assert word_error_rate("a b c", "a b c") == 0.0
    assert word_error_rate("a b c", "a x c") == pytest.approx(1 / 3)
    assert word_error_rate("a b c", "a b") == pytest.approx(1 / 3)  # deletion
    assert word_error_rate("a b c", "a b c d") == pytest.approx(1 / 3)  # insertion
    assert word_error_rate("", "") == 0.0
    assert word_error_rate("a", "") == 1.0
    # punctuation/case insensitive
    assert word_error_rate("Hello world.", "hello, WORLD") == 0.0


def test_der_perfect_and_label_permutation():
    ref = [
        {"start": 0.0, "end": 5.0, "speaker": "A"},
        {"start": 5.0, "end": 10.0, "speaker": "B"},
    ]
    hyp_same = [
        {"start": 0.0, "end": 5.0, "speaker": "X"},
        {"start": 5.0, "end": 10.0, "speaker": "Y"},
    ]
    assert diarization_error_rate(ref, hyp_same, collar_s=0.0) == 0.0
    # swapped labels still perfect (optimal mapping)
    hyp_swap = [
        {"start": 0.0, "end": 5.0, "speaker": "Y"},
        {"start": 5.0, "end": 10.0, "speaker": "X"},
    ]
    assert diarization_error_rate(ref, hyp_swap, collar_s=0.0) == 0.0


def test_der_miss_and_false_alarm():
    ref = [{"start": 0.0, "end": 10.0, "speaker": "A"}]
    hyp_half = [{"start": 0.0, "end": 5.0, "speaker": "A"}]
    der = diarization_error_rate(ref, hyp_half, collar_s=0.0)
    assert der == pytest.approx(0.5, abs=0.02)  # 50% missed

    hyp_extra = [
        {"start": 0.0, "end": 10.0, "speaker": "A"},
        {"start": 10.0, "end": 15.0, "speaker": "B"},
    ]
    der2 = diarization_error_rate(ref, hyp_extra, collar_s=0.0)
    assert der2 == pytest.approx(0.5, abs=0.02)  # 50% false alarm


def test_der_confusion():
    ref = [
        {"start": 0.0, "end": 5.0, "speaker": "A"},
        {"start": 5.0, "end": 10.0, "speaker": "B"},
    ]
    # hyp assigns everything to one speaker: B's half becomes confusion
    hyp = [{"start": 0.0, "end": 10.0, "speaker": "Z"}]
    der = diarization_error_rate(ref, hyp, collar_s=0.0)
    assert der == pytest.approx(0.5, abs=0.02)


def test_der_collar_forgives_boundaries():
    ref = [{"start": 0.0, "end": 10.0, "speaker": "A"}]
    hyp = [{"start": 0.2, "end": 9.8, "speaker": "A"}]  # slightly shrunk
    strict = diarization_error_rate(ref, hyp, collar_s=0.0)
    forgiving = diarization_error_rate(ref, hyp, collar_s=0.25)
    assert strict > 0.0
    assert forgiving == 0.0


def test_der_empty_cases():
    assert diarization_error_rate([], []) == 0.0
    assert diarization_error_rate([], [{"start": 0, "end": 1, "speaker": "A"}]) == float("inf")
