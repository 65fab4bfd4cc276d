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


# --- word-level subtitle options (openai SubtitlesWriter semantics) --------

WSEGS = [
    {"start": 0.0, "end": 2.0, "text": " Hello world", "words": [
        {"word": "Hello", "start": 0.0, "end": 1.0},
        {"word": " world", "start": 1.0, "end": 2.0},
    ]},
    {"start": 2.0, "end": 4.0, "text": " Second bit", "words": [
        {"word": "Second", "start": 2.0, "end": 3.0},
        {"word": " bit", "start": 3.0, "end": 4.0},
    ]},
]


def test_word_mode_preserves_segments_by_default():
    # with word timings and no wrap options, one cue per segment
    assert writers.to_srt(WSEGS) == (
        "1\n00:00:00,000 --> 00:00:02,000\nHello world\n"
        "\n"
        "2\n00:00:02,000 --> 00:00:04,000\nSecond bit\n"
    )


def test_highlight_words_underlines_each_word():
    cues = list(writers._iterate_cues(WSEGS, highlight_words=True))
    assert cues == [
        (0.0, 1.0, "<u>Hello</u> world"),
        (1.0, 2.0, "Hello <u>world</u>"),
        (2.0, 3.0, "<u>Second</u> bit"),
        (3.0, 4.0, "Second <u>bit</u>"),
    ]


def test_max_words_per_line_splits_cues():
    cues = list(writers._iterate_cues(WSEGS, max_words_per_line=1))
    assert [text for _, _, text in cues] == ["Hello", "world", "Second", "bit"]


def test_max_line_width_and_count_wrap_and_split():
    # width 10 forces a line break inside segment 1; line_count 2 forces a
    # new cue at the third word (openai's iterate_subtitles rules)
    cues = list(
        writers._iterate_cues(WSEGS, max_line_width=10, max_line_count=2)
    )
    assert cues == [
        (0.0, 2.0, "Hello\nworld"),
        (2.0, 4.0, "Second bit"),
    ]


def test_segment_cue_escapes_arrow():
    srt = writers.to_srt([{"start": 0.0, "end": 1.0, "text": "a --> b"}])
    assert "a -> b" in srt


def test_empty_words_segment_still_emits_text():
    """A segment whose words list came out empty (the word-midpoint
    matcher can miss near window edges) must still emit its text as a
    plain cue — not vanish from srt/vtt output."""
    segments = [
        {"start": 0.0, "end": 1.0, "text": " first",
         "words": [{"word": " first", "start": 0.0, "end": 1.0}]},
        {"start": 1.0, "end": 2.0, "text": " orphaned", "words": []},
        {"start": 2.0, "end": 3.0, "text": " last",
         "words": [{"word": " last", "start": 2.0, "end": 3.0}]},
    ]
    srt = writers.to_srt(segments)
    assert "orphaned" in srt
    # cue order is preserved
    assert srt.index("first") < srt.index("orphaned") < srt.index("last")
    vtt = writers.to_vtt(segments)
    assert "orphaned" in vtt
