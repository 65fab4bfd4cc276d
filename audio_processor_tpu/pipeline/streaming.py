"""Streaming transcription: feed audio incrementally, collect segments.

A capability the reference lacks entirely (its UI uploads whole files).
Design point for TPU: windows are finalised and decoded as fixed 30 s
chunks (static shapes, the compiled batch-1 program is reused for every
window), so streaming costs no recompiles and no dynamic shapes — latency
is bounded by the window length plus one decode (~tens of ms).

    st = StreamingTranscriber(transcriber)
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
    transcriber: Any  # pipeline.transcribe.Transcriber
    sample_rate: int = 16_000
    _buffer: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))
    _emitted_s: float = 0.0  # global time already finalised

    def feed(self, samples: np.ndarray) -> Iterator[dict]:
        """Append audio; yield segments for every completed 30 s window."""
        if self.sample_rate != 16_000:
            import jax.numpy as jnp

            samples = np.asarray(
                frontend.resample(jnp.asarray(samples, jnp.float32), self.sample_rate)
            )
        self._buffer = np.concatenate([self._buffer, np.asarray(samples, np.float32)])
        while len(self._buffer) >= CHUNK:
            window, self._buffer = self._buffer[:CHUNK], self._buffer[CHUNK:]
            yield from self._decode_window(window)

    def flush(self) -> Iterator[dict]:
        """Decode whatever remains (zero-padded to the window length)."""
        if len(self._buffer) >= int(0.5 * 16_000):  # ignore sub-0.5 s tails
            window = self._buffer
            self._buffer = np.zeros(0, np.float32)
            yield from self._decode_window(window)
        else:
            self._buffer = np.zeros(0, np.float32)

    def _decode_window(self, window: np.ndarray) -> Iterator[dict]:
        out = self.transcriber.transcribe(
            window, remove_silence=False, sample_rate=16_000
        )
        for seg in out["segments"]:
            yield {
                "start": round(seg["start"] + self._emitted_s, 3),
                "end": round(seg["end"] + self._emitted_s, 3),
                "text": seg["text"],
            }
        self._emitted_s += len(window) / 16_000.0
