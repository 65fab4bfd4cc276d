"""Transcript output writers: txt / srt / vtt / tsv / json.

The reference consumes transcripts programmatically (Notion/Gemini), but
the engine it ships is openai-whisper, whose CLI users rely on the
standard subtitle formats (whisper's --output_format).  These are the
same behavioural contracts re-implemented first-party:

  * srt: 1-indexed cues, `HH:MM:SS,mmm --> HH:MM:SS,mmm`, blank-line
    separated
  * vtt: `WEBVTT` header, `MM:SS.mmm` timestamps (hours only when needed)
  * tsv: integer-millisecond `start\tend\ttext` rows with a header line
  * txt: one segment's text per line

Segments are the pipeline's `{"start": s, "end": s, "text": str}` dicts
(the same schema the fusion stage consumes, reference:
app/services/audio_processor.py:1114-1119).
"""
from __future__ import annotations


def _timestamp(seconds: float, *, always_hours: bool, decimal: str) -> str:
    ms = max(0, round(seconds * 1000.0))
    hours, ms = divmod(ms, 3_600_000)
    minutes, ms = divmod(ms, 60_000)
    secs, ms = divmod(ms, 1000)
    hours_part = f"{hours:02d}:" if always_hours or hours > 0 else ""
    return f"{hours_part}{minutes:02d}:{secs:02d}{decimal}{ms:03d}"


def to_txt(segments: list[dict]) -> str:
    return "\n".join(seg["text"].strip() for seg in segments) + "\n"


def to_srt(segments: list[dict]) -> str:
    out = []
    for i, seg in enumerate(segments, start=1):
        start = _timestamp(seg["start"], always_hours=True, decimal=",")
        end = _timestamp(seg["end"], always_hours=True, decimal=",")
        out.append(f"{i}\n{start} --> {end}\n{seg['text'].strip()}\n")
    return "\n".join(out)


def to_vtt(segments: list[dict]) -> str:
    out = ["WEBVTT\n"]
    for seg in segments:
        start = _timestamp(seg["start"], always_hours=False, decimal=".")
        end = _timestamp(seg["end"], always_hours=False, decimal=".")
        out.append(f"{start} --> {end}\n{seg['text'].strip()}\n")
    return "\n".join(out)


def to_tsv(segments: list[dict]) -> str:
    rows = ["start\tend\ttext"]
    for seg in segments:
        rows.append(
            f"{round(seg['start'] * 1000)}\t{round(seg['end'] * 1000)}\t"
            f"{seg['text'].strip()}"
        )
    return "\n".join(rows) + "\n"


FORMATTERS = {"txt": to_txt, "srt": to_srt, "vtt": to_vtt, "tsv": to_tsv}


def format_segments(segments: list[dict], fmt: str) -> str:
    try:
        return FORMATTERS[fmt](segments)
    except KeyError:
        raise ValueError(
            f"unknown format {fmt!r}; expected one of {sorted(FORMATTERS)}"
        ) from None
