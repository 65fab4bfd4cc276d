"""Streaming transcription: feed audio incrementally, collect segments.

A capability the reference lacks entirely (its UI uploads whole files).
Design point for TPU: windows are finalised and decoded as fixed 30 s
chunks (static shapes, the compiled batch-1 program is reused for every
window), so streaming costs no recompiles and no dynamic shapes — latency
is bounded by the window length plus one decode (~tens of ms).

    st = StreamingTranscriber(transcriber)            # window mode, or
    st = StreamingTranscriber(transcriber, partial_step_s=2.0)  # low-latency
    for block in microphone():          # arbitrary-size float32 blocks
        for seg in st.feed(block):
            print(seg)                   # finalised {start, end, text}
    for seg in st.flush():               # final partial window
        print(seg)
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Iterator

import numpy as np

from ..ops import frontend

CHUNK = frontend.N_SAMPLES  # 480_000 samples / 30 s


def _segment_words(segments: list[dict]) -> list[tuple[str, float, float]]:
    """Flatten segments into (word, seg_start, seg_end) triples — words
    carry their source segment's times (caption-grade approximation)."""
    out = []
    for seg in segments:
        for w in seg["text"].split():
            out.append((w, seg["start"], seg["end"]))
    return out


def _common_word_prefix(a: list, b: list) -> int:
    """Length of the longest common WORD-string prefix of two word lists."""
    n = 0
    for (wa, *_), (wb, *_) in zip(a, b):
        if wa != wb:
            break
        n += 1
    return n


@dataclass
class StreamingTranscriber:
    """Window-mode by default; set partial_step_s > 0 for LOW-LATENCY mode.

    Low-latency mode decodes the GROWING window every partial_step_s
    seconds of new audio and emits the longest WORD prefix two
    consecutive decodes agree on — the LocalAgreement policy streaming
    ASR systems use (whisper_streaming et al.) to trade extra compute
    for sub-window latency.  Agreement is on word STRINGS, not
    timestamps: Whisper's timestamps jitter a quantum as the padded
    context grows, so tuple-exact matching would never confirm anything.
    The decode still runs the ONE compiled batch-1 program (the partial
    buffer zero-pads to the fixed 30 s window — no recompiles, no
    dynamic shapes).  Window completion re-decodes the full window and
    emits everything past the already-emitted word prefix, so boundary
    resegmentation can briefly duplicate a word but can never LOSE text.
    Emitted times are the source segment's (caption-grade).
    """

    transcriber: Any  # pipeline.transcribe.Transcriber
    sample_rate: int = 16_000
    partial_step_s: float = 0.0  # 0 = window mode
    _buffer: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))
    _emitted_s: float = 0.0  # global time already finalised (window starts)
    _partial_mark: int = 0  # buffer samples at the last partial decode
    _prev_words: list = field(default_factory=list)
    _emitted_words: list = field(default_factory=list)  # this window's output

    def feed(self, samples: np.ndarray) -> Iterator[dict]:
        """Append audio; yield segments as they finalise."""
        if self.sample_rate != 16_000:
            import jax.numpy as jnp

            samples = np.asarray(
                frontend.resample(jnp.asarray(samples, jnp.float32), self.sample_rate)
            )
        self._buffer = np.concatenate([self._buffer, np.asarray(samples, np.float32)])
        while len(self._buffer) >= CHUNK:
            window, self._buffer = self._buffer[:CHUNK], self._buffer[CHUNK:]
            yield from self._decode_window(window)
        if self.partial_step_s > 0 and (
            len(self._buffer) - self._partial_mark
            >= int(self.partial_step_s * 16_000)
        ):
            yield from self._partial_decode()

    def flush(self) -> Iterator[dict]:
        """Decode whatever remains (zero-padded to the window length)."""
        if len(self._buffer) >= int(0.5 * 16_000):  # ignore sub-0.5 s tails
            window = self._buffer
            self._buffer = np.zeros(0, np.float32)
            yield from self._decode_window(window)
        else:
            self._buffer = np.zeros(0, np.float32)
            self._reset_window_state()

    def _reset_window_state(self) -> None:
        self._partial_mark = 0
        self._prev_words = []
        self._emitted_words = []

    def _segments_of(self, audio: np.ndarray) -> list[dict]:
        out = self.transcriber.transcribe(
            audio, remove_silence=False, sample_rate=16_000
        )
        return out["segments"]

    def _emit_words(self, words: list[tuple[str, float, float]]) -> Iterator[dict]:
        """Group consecutive words sharing a source segment -> one dict."""
        i = 0
        while i < len(words):
            j = i
            while (
                j + 1 < len(words)
                and words[j + 1][1:] == words[i][1:]  # same source segment
            ):
                j += 1
            _, s, e = words[i]
            yield {
                "start": round(s + self._emitted_s, 3),
                "end": round(e + self._emitted_s, 3),
                "text": " ".join(w for w, *_ in words[i : j + 1]),
            }
            i = j + 1

    def _partial_decode(self) -> Iterator[dict]:
        """LocalAgreement: emit the word prefix two decodes agree on."""
        self._partial_mark = len(self._buffer)
        segs = self._segments_of(self._buffer)
        # the trailing segment's extent is an artefact of where the buffer
        # happens to stop — exclude it from what can be confirmed
        cur = _segment_words(segs[:-1])
        agreed = _common_word_prefix(self._prev_words, cur)
        # an empty slice when nothing new is agreed (or when a past
        # emission ran ahead of the current agreement — the window
        # finalise resolves that divergence)
        fresh = cur[len(self._emitted_words) : agreed]
        yield from self._emit_words(fresh)
        self._emitted_words.extend(fresh)
        self._prev_words = _segment_words(segs)

    def _decode_window(self, window: np.ndarray) -> Iterator[dict]:
        """Finalise a full window: emit everything past the emitted prefix.

        If the full-window decode resegmented and disagrees with what the
        partials emitted, emission restarts at the divergence point —
        duplication is possible there, text loss is not.
        """
        words = _segment_words(self._segments_of(window))
        agreed = _common_word_prefix(self._emitted_words, words)
        yield from self._emit_words(words[agreed:])
        self._emitted_s += len(window) / 16_000.0
        self._reset_window_state()
