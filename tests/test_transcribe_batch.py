"""Cross-request batched transcription (Transcriber.transcribe_batch).

Windows from several independent recordings pack into SHARED decode
slabs; every per-file result must match what per-file transcribe()
returns (a window's decode depends only on its own audio).  The
reference has no batching of any kind — one sequential
whisper.transcribe per job (reference:
app/services/audio_processor.py:1076); this is the TPU-shaped design
(fill the batch axis) applied across requests.
"""
import numpy as np
import pytest

from audio_processor_tpu.pipeline.transcribe import Transcriber


@pytest.fixture(scope="module")
def t():
    return Transcriber.random_init(
        "test", compute_dtype="float32", max_new_tokens=8
    )


def _comparable(res: dict) -> dict:
    # rtf_x measures wall time (shared across a batch) — everything else
    # must be identical
    return {k: v for k, v in res.items() if k != "rtf_x"}


def _mixed_files(rng) -> list[np.ndarray]:
    sr = 16_000
    tone = (
        0.3 * np.sin(2 * np.pi * 330 * np.arange(5 * sr) / sr)
    ).astype(np.float32)
    a35 = rng.normal(0, 0.1, 35 * sr).astype(np.float32)
    a61 = rng.normal(0, 0.1, 61 * sr).astype(np.float32)
    return [tone, a35, a61]


def test_batch_empty(t):
    assert t.transcribe_batch([]) == []


def test_batch_matches_sequential(t, rng):
    """Three files of different lengths (1/2/3 windows) in one shared
    slab: every per-file result identical to the sequential path."""
    files = _mixed_files(rng)
    batch = t.transcribe_batch(files, remove_silence=False)
    seq = [t.transcribe(f, remove_silence=False) for f in files]
    assert len(batch) == len(seq) == 3
    for b, s in zip(batch, seq):
        assert _comparable(b) == _comparable(s)


def test_batch_single_file(t, rng):
    audio = rng.normal(0, 0.1, 35 * 16_000).astype(np.float32)
    (batch,) = t.transcribe_batch([audio], remove_silence=False)
    seq = t.transcribe(audio, remove_silence=False)
    assert _comparable(batch) == _comparable(seq)


def test_batch_with_silence_removal(t, rng):
    """Per-file silence trim + TimeMap: original-timeline stamps survive
    the shared slab."""
    sr = 16_000
    burst = rng.normal(0, 0.3, 2 * sr).astype(np.float32)
    a = np.zeros(20 * sr, np.float32)
    a[2 * sr : 4 * sr] = burst
    a[15 * sr : 17 * sr] = burst
    b = np.zeros(12 * sr, np.float32)
    b[6 * sr : 8 * sr] = burst
    batch = t.transcribe_batch([a, b])
    seq = [t.transcribe(a), t.transcribe(b)]
    for got, want in zip(batch, seq):
        assert _comparable(got) == _comparable(want)
    assert batch[0]["duration"] == pytest.approx(20.0, abs=0.01)
    assert batch[1]["duration"] == pytest.approx(12.0, abs=0.01)


def test_batch_fallback_conditioned(rng):
    """condition_on_previous_text needs per-file rolling context inside
    the slab -> transcribe_batch falls back to sequential calls with
    identical results."""
    tc = Transcriber.random_init(
        "test", compute_dtype="float32", max_new_tokens=6,
        condition_on_previous_text=True,
    )
    audio = rng.normal(0, 0.1, 35 * 16_000).astype(np.float32)
    (batch,) = tc.transcribe_batch([audio], remove_silence=False)
    seq = tc.transcribe(audio, remove_silence=False)
    assert _comparable(batch) == _comparable(seq)


def test_batch_word_timestamps(speech_like_audio, rng):
    """word_timestamps rides the shared slabs: per-file encoder states
    are re-gathered from the batch slabs for the alignment pass."""
    tw = Transcriber.random_init(
        "test", compute_dtype="float32", max_new_tokens=6,
        word_timestamps=True, no_speech_threshold=None,
    )
    other = rng.normal(0, 0.1, 35 * 16_000).astype(np.float32)
    batch = tw.transcribe_batch(
        [speech_like_audio, other], remove_silence=False
    )
    seq = [
        tw.transcribe(speech_like_audio, remove_silence=False),
        tw.transcribe(other, remove_silence=False),
    ]
    for b, s in zip(batch, seq):
        assert _comparable(b) == _comparable(s)
    assert "words" in batch[0] and "words" in batch[1]


def test_batch_language_detection_groups(speech_like_audio, rng):
    """Multilingual model, no pinned language: each file gets its OWN
    voted language (batched detection mirrors the per-file voting)."""
    t = Transcriber.random_init(
        "tiny", compute_dtype="float32", max_new_tokens=4,
        no_speech_threshold=None,
    )
    a1 = speech_like_audio[: 16_000 * 3]
    a2 = rng.normal(0, 0.15, 3 * 16_000).astype(np.float32)
    batch = t.transcribe_batch([a1, a2], remove_silence=False)
    seq = [
        t.transcribe(a1, remove_silence=False),
        t.transcribe(a2, remove_silence=False),
    ]
    assert [b.get("language") for b in batch] == [
        s.get("language") for s in seq
    ]
    for b, s in zip(batch, seq):
        assert _comparable(b) == _comparable(s)


def test_batch_on_segment_streams_per_file(t, rng):
    """on_segment(file_idx, seg) fires as each window drains, with the
    same segments the final per-file results carry."""
    files = [
        rng.normal(0, 0.1, 10 * 16_000).astype(np.float32),
        rng.normal(0, 0.1, 35 * 16_000).astype(np.float32),
    ]
    live: dict[int, list[dict]] = {0: [], 1: []}
    outs = t.transcribe_batch(
        files, remove_silence=False,
        on_segment=lambda fi, seg: live[fi].append(seg),
    )
    for fi, out in enumerate(outs):
        want = [
            (s["start"], s["end"], s["text"]) for s in out["segments"]
        ]
        got = sorted((s["start"], s["end"], s["text"]) for s in live[fi])
        assert got == sorted(want)


def test_path_inputs(t, rng, tmp_path):
    """openai's transcribe(audio: str) convention: a file path decodes
    through the ingest stack and matches the array call exactly; paths
    and arrays mix freely in transcribe_batch (the reference passes
    PATHS to its engines, audio_processor.py:1076,1105).

    The comparison array is the DECODED wav (write_wav quantizes to
    16-bit PCM, so comparing against the pre-write float array would
    hinge on quantization-insensitive decodes — coincidence, not
    contract)."""
    from audio_processor_tpu.pipeline import ingest
    from audio_processor_tpu.utils import wavio

    audio = rng.normal(0, 0.1, 5 * 16_000).astype(np.float32)
    p = tmp_path / "clip.wav"
    wavio.write_wav(str(p), audio, 16_000)
    decoded = ingest.load_audio(str(p))

    from_path = t.transcribe(str(p))
    from_array = t.transcribe(decoded)
    assert _comparable(from_path) == _comparable(from_array)

    batch = t.transcribe_batch([str(p), decoded])
    assert _comparable(batch[0]) == _comparable(batch[1])
