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


@dataclass
class StreamingTranscriber:
    """Window-mode by default; set partial_step_s > 0 for LOW-LATENCY mode.

    Low-latency mode decodes the GROWING window every partial_step_s
    seconds of new audio and emits a segment as soon as two consecutive
    decodes agree on it exactly — the "local agreement" policy streaming
    ASR systems use to trade a little extra compute for sub-window
    latency (the decode still runs the ONE compiled batch-1 program:
    the partial buffer is zero-padded to the fixed 30 s window, so no
    recompiles and no dynamic shapes).  Unconfirmed trailing segments
    stay pending; window completion finalises everything decoded from
    the full window.
    """

    transcriber: Any  # pipeline.transcribe.Transcriber
    sample_rate: int = 16_000
    partial_step_s: float = 0.0  # 0 = window mode
    _buffer: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))
    _emitted_s: float = 0.0  # global time already finalised (window starts)
    _partial_mark: int = 0  # buffer samples at the last partial decode
    _prev_partial: list = field(default_factory=list)
    _confirmed_end_s: float = 0.0  # window-local time already emitted

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
            self._partial_mark = 0
            self._prev_partial = []
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
        self._partial_mark = 0
        self._prev_partial = []

    def _segments_of(self, audio: np.ndarray) -> list[dict]:
        out = self.transcriber.transcribe(
            audio, remove_silence=False, sample_rate=16_000
        )
        return out["segments"]

    def _partial_decode(self) -> Iterator[dict]:
        """Local agreement: emit segments two consecutive decodes agree on."""
        self._partial_mark = len(self._buffer)
        segs = self._segments_of(self._buffer)
        prev = {(s["start"], s["end"], s["text"]) for s in self._prev_partial}
        # never confirm the final segment of a partial decode — its end is
        # an artefact of where the buffer happens to stop
        for seg in segs[:-1]:
            key = (seg["start"], seg["end"], seg["text"])
            if key in prev and seg["start"] >= self._confirmed_end_s:
                self._confirmed_end_s = seg["end"]
                yield {
                    "start": round(seg["start"] + self._emitted_s, 3),
                    "end": round(seg["end"] + self._emitted_s, 3),
                    "text": seg["text"],
                }
        self._prev_partial = segs

    def _decode_window(self, window: np.ndarray) -> Iterator[dict]:
        for seg in self._segments_of(window):
            if seg["start"] < self._confirmed_end_s:
                continue  # already emitted by a partial decode
            yield {
                "start": round(seg["start"] + self._emitted_s, 3),
                "end": round(seg["end"] + self._emitted_s, 3),
                "text": seg["text"],
            }
        self._emitted_s += len(window) / 16_000.0
        self._confirmed_end_s = 0.0
