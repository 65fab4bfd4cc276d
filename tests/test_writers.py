"""Subtitle/transcript writers: golden-string gates for the formats
openai-whisper CLI users expect (utils/writers.py)."""
import pytest

from audio_processor_tpu.utils import writers

SEGS = [
    {"start": 0.0, "end": 2.5, "text": " Hello there. "},
    {"start": 2.5, "end": 3661.07, "text": "Second segment"},
]


def test_srt_golden():
    assert writers.to_srt(SEGS) == (
        "1\n00:00:00,000 --> 00:00:02,500\nHello there.\n"
        "\n"
        "2\n00:00:02,500 --> 01:01:01,070\nSecond segment\n"
    )


def test_vtt_golden_hours_only_when_needed():
    assert writers.to_vtt(SEGS) == (
        "WEBVTT\n"
        "\n"
        "00:00.000 --> 00:02.500\nHello there.\n"
        "\n"
        "00:02.500 --> 01:01:01.070\nSecond segment\n"
    )


def test_tsv_golden_integer_milliseconds():
    assert writers.to_tsv(SEGS) == (
        "start\tend\ttext\n"
        "0\t2500\tHello there.\n"
        "2500\t3661070\tSecond segment\n"
    )


def test_txt():
    assert writers.to_txt(SEGS) == "Hello there.\nSecond segment\n"


def test_negative_start_clamps_to_zero():
    srt = writers.to_srt([{"start": -0.4, "end": 1.0, "text": "x"}])
    assert "00:00:00,000 --> 00:00:01,000" in srt


def test_unknown_format_raises():
    with pytest.raises(ValueError, match="unknown format"):
        writers.format_segments(SEGS, "lrc")


def test_format_segments_dispatch():
    assert writers.format_segments(SEGS, "srt") == writers.to_srt(SEGS)
