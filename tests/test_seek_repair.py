"""Seek-based window advance (openai-whisper's transcribe-loop rewind).

The reference inherits whisper's sequential seek loop: when a decode ends
with text trailing after the last closed timestamp pair, seek rewinds to
that pair's end and the straddling speech is re-decoded in the next window
(reference: app/services/audio_processor.py:1076 via whisper.transcribe).
This repo keeps the batched grid decode and repairs straddling boundaries
in one extra patch slab (pipeline/transcribe._apply_seek_repair).  Decode
outputs are mocked so the splice semantics are pinned exactly.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from audio_processor_tpu.models.whisper import decode as decode_lib
from audio_processor_tpu.models.whisper.config import get_config
from audio_processor_tpu.pipeline.transcribe import CHUNK_SAMPLES, Transcriber

ST = decode_lib.SpecialTokens.for_config(get_config("tiny"))


def ts(seconds: float) -> int:
    return ST.timestamp_begin + int(round(seconds / 0.02))


def row(*toks, width=32) -> np.ndarray:
    out = np.full(width, ST.eot, np.int32)
    out[: len(toks)] = toks
    return out


A, B, C, D = 97, 98, 99, 100  # 'a'..'d' under ByteTokenizer


# -- helper semantics -------------------------------------------------------

def test_seek_consumed_clean_ending_advances_full_window():
    # "<|0|> a <|10|>" — ends on a timestamp: no rewind
    c, r = decode_lib.seek_consumed(row(ts(0), A, ts(10)), ST)
    assert (c, r) == (30.0, False)


def test_seek_consumed_trailing_text_rewinds_to_last_closed_pair():
    # "<|0|> a <|10|><|10|> b" — 'b' trails unclosed: rewind to 10 s
    c, r = decode_lib.seek_consumed(row(ts(0), A, ts(10), ts(10), B), ST)
    assert r and c == pytest.approx(10.0)


def test_seek_consumed_pair_ending_rewinds():
    """"<|0|> a <|12|><|12|>" then EOT — openai's loop rewinds to 12 s
    (timestamp_tokens[-2:] == [True, True] is NOT single_timestamp_ending,
    so seek advances only to the pair); treating it as a clean full-window
    consume silently skipped the 12-30 s speech."""
    c, r = decode_lib.seek_consumed(row(ts(0), A, ts(12), ts(12)), ST)
    assert r and c == pytest.approx(12.0)
    # dangling next-start ("<|12|><|14|>"): openai rewinds to the FIRST of
    # the pair (tokens[last_slice - 1] — the close of the last segment),
    # so [12, 14) is re-decoded rather than skipped
    c, r = decode_lib.seek_consumed(row(ts(0), A, ts(12), ts(14)), ST)
    assert r and c == pytest.approx(12.0)
    # degenerate pair at 0 s or at the window end never rewinds
    c, r = decode_lib.seek_consumed(row(ts(0), ts(0)), ST)
    assert (c, r) == (30.0, False)
    c, r = decode_lib.seek_consumed(row(ts(0), A, ts(30), ts(30)), ST)
    assert (c, r) == (30.0, False)


def test_seek_consumed_no_closed_pair_never_rewinds():
    c, r = decode_lib.seek_consumed(row(ts(0), A, B), ST)
    assert (c, r) == (30.0, False)
    c, r = decode_lib.seek_consumed(row(A, B), ST)  # no timestamps at all
    assert (c, r) == (30.0, False)
    c, r = decode_lib.seek_consumed(row(), ST)  # empty row
    assert (c, r) == (30.0, False)


def test_truncate_row_after_seek_drops_straddler_tokens():
    out = decode_lib.truncate_row_after_seek(
        row(ts(0), A, ts(10), ts(10), B), ST
    )
    np.testing.assert_array_equal(out[:3], [ts(0), A, ts(10)])
    assert (out[3:] == ST.eot).all()


def test_drop_segments_before_cuts_consumed_head():
    r = row(ts(0), A, ts(2), ts(2.5), B, ts(5))
    out = decode_lib.drop_segments_before(r, ST, 2.2)
    np.testing.assert_array_equal(out[:3], [ts(2.5), B, ts(5)])
    assert (out[3:] == ST.eot).all()
    # cut consumes everything -> all EOT
    out = decode_lib.drop_segments_before(r, ST, 20.0)
    assert (out == ST.eot).all()


def test_keep_closed_segments_before():
    r = row(ts(0), A, ts(22.5), ts(22.5), B, ts(28))
    out, end = decode_lib.keep_closed_segments_before(r, ST, 20.0)
    assert end == pytest.approx(22.5)
    np.testing.assert_array_equal(out[:3], [ts(0), A, ts(22.5)])
    assert (out[3:] == ST.eot).all()
    out, end = decode_lib.keep_closed_segments_before(r, ST, -1.0)
    assert end is None and (out == ST.eot).all()


# -- end-to-end splice through transcribe() ---------------------------------

def make_mock_transcriber(decode_script):
    """Transcriber whose encode/decode are mocked; decode_script is a list
    of (B, T) token matrices returned per _run_decode call."""
    t = Transcriber.random_init(
        "tiny", language=0, no_speech_threshold=None, enable_fallback=False
    )
    t._frontend_encode = lambda p, chunks: jnp.zeros(
        (chunks.shape[0], 4, 8), jnp.float32
    )
    calls = []

    def fake_run_decode(audio_states, temperature=0.0, seed=0,
                        first_row_prompt=False):
        i = len(calls)
        calls.append(audio_states.shape[0])
        toks = decode_script[i]
        b = audio_states.shape[0]
        full = np.full((b, toks.shape[1]), ST.eot, np.int32)
        full[: len(toks)] = toks
        return decode_lib.DecodeResult(
            tokens=jnp.asarray(full),
            lengths=jnp.asarray((full != ST.eot).sum(-1), jnp.int32),
            sum_logprob=jnp.zeros((b,), jnp.float32),
            no_speech_prob=jnp.zeros((b,), jnp.float32),
        )

    t._run_decode = fake_run_decode
    return t, calls


def test_straddling_word_comes_out_as_one_segment():
    """A 'word' spanning t=30 s: grid pass splits it; seek repair re-decodes
    from the last closed timestamp and yields ONE segment crossing 30 s."""
    grid = np.stack([
        # window 0: closed "a" [0,10], then 'b' trailing unclosed (straddle)
        row(ts(0), A, ts(10), ts(10), B),
        # window 1: "c" at [2.5,5] local = [32.5,35] global
        row(ts(2.5), C, ts(5)),
    ])
    # patch at 10 s: "d" closed [0,22.5] local = [10,32.5] global
    patch = row(ts(0), D, ts(22.5))[None, :]
    t, calls = make_mock_transcriber([grid, patch])
    audio = np.zeros(60 * 16_000, np.float32)
    audio[::100] = 0.1  # keep trim_silence from eating the recording
    out = t.transcribe(audio, remove_silence=False)
    segs = out["segments"]
    assert [s["text"] for s in segs] == ["a", "d", "c"]
    assert segs[1]["start"] == pytest.approx(10.0, abs=0.05)
    assert segs[1]["end"] == pytest.approx(32.5, abs=0.05)  # crosses 30 s
    assert segs[2]["start"] == pytest.approx(32.5, abs=0.05)
    assert len(calls) == 2 and calls[1] >= 1  # exactly one patch decode


def test_patch_overlap_drops_consumed_head_of_next_window():
    """When the patch consumes into window 1, window 1's overlapped leading
    segment is dropped (no duplicated text)."""
    grid = np.stack([
        row(ts(0), A, ts(10), ts(10), B),
        # window 1: TWO segments; the first [0,2] global [30,32] is covered
        # by the patch (which reaches 32.5) and must be dropped
        row(ts(0), B, ts(2), ts(2.5), C, ts(5)),
    ])
    patch = row(ts(0), D, ts(22.5))[None, :]
    t, calls = make_mock_transcriber([grid, patch])
    audio = np.zeros(60 * 16_000, np.float32)
    out = t.transcribe(audio, remove_silence=False)
    assert [s["text"] for s in out["segments"]] == ["a", "d", "c"]


def test_no_straddle_means_no_patch_decode():
    grid = np.stack([
        row(ts(0), A, ts(10)),          # clean single-timestamp ending
        row(ts(0), B, ts(5)),           # clean single-timestamp ending
    ])
    t, calls = make_mock_transcriber([grid])
    audio = np.zeros(60 * 16_000, np.float32)
    out = t.transcribe(audio, remove_silence=False)
    assert len(calls) == 1
    assert [s["text"] for s in out["segments"]] == ["a", "b"]


def test_pair_ending_triggers_patch_decode():
    """A window ending on a CONSECUTIVE timestamp pair re-decodes from the
    pair (openai's non-single_timestamp_ending rewind): speech between
    the pair and the window edge is recovered instead of skipped."""
    grid = np.stack([
        # window 0: "a" [0,10], then a bare pair at 12 s — the model
        # stopped mid-window; 12-30 s was never transcribed
        row(ts(0), A, ts(10), ts(12), ts(12)),
        row(ts(2.5), C, ts(5)),
    ])
    # patch at 12 s: "d" closed [0,20.5] local = [12,32.5] global
    patch = row(ts(0), D, ts(20.5))[None, :]
    t, calls = make_mock_transcriber([grid, patch])
    audio = np.zeros(60 * 16_000, np.float32)
    out = t.transcribe(audio, remove_silence=False)
    segs = out["segments"]
    assert [s["text"] for s in segs] == ["a", "d", "c"]
    assert segs[1]["start"] == pytest.approx(12.0, abs=0.05)
    assert segs[1]["end"] == pytest.approx(32.5, abs=0.05)
    assert len(calls) == 2


def test_final_window_pair_ending_repaired():
    """The LAST window rewinds too (openai's loop has no special case for
    it): a pair ending mid-final-window re-decodes the remaining audio
    instead of silently dropping it."""
    grid = np.stack([
        row(ts(0), B, ts(10)),                     # clean window 0
        row(ts(0), A, ts(10), ts(12), ts(12)),     # final: stopped at 42 s
    ])
    # patch from 42 s: "d" closed [0,15] local = [42,57] global
    patch = row(ts(0), D, ts(15))[None, :]
    t, calls = make_mock_transcriber([grid, patch])
    audio = np.zeros(60 * 16_000, np.float32)
    out = t.transcribe(audio, remove_silence=False)
    segs = out["segments"]
    assert [s["text"] for s in segs] == ["b", "a", "d"]
    assert segs[2]["start"] == pytest.approx(42.0, abs=0.05)
    assert segs[2]["end"] == pytest.approx(57.0, abs=0.05)
    assert len(calls) == 2


def test_final_window_pair_at_eof_not_patched():
    """A final-window rewind point at/after the audio's real end has
    nothing to recover — no patch decode runs."""
    grid = np.stack([
        row(ts(0), B, ts(10)),
        row(ts(0), A, ts(5), ts(12), ts(12)),   # audio ends at 41.5 s
    ])
    t, calls = make_mock_transcriber([grid])
    audio = np.zeros(int(41.5 * 16_000), np.float32)
    out = t.transcribe(audio, remove_silence=False)
    assert [s["text"] for s in out["segments"]] == ["b", "a"]
    assert len(calls) == 1


def test_silent_patch_just_drops_hallucinated_tail():
    grid = np.stack([
        row(ts(0), A, ts(10), ts(10), B),   # straddle candidate
        row(ts(2.5), C, ts(5)),
    ])
    patch = row()[None, :]  # patch decodes to nothing (silence)
    t, calls = make_mock_transcriber([grid, patch])
    audio = np.zeros(60 * 16_000, np.float32)
    out = t.transcribe(audio, remove_silence=False)
    # 'b' (the unclosed tail) is gone; window 1 untouched
    assert [s["text"] for s in out["segments"]] == ["a", "c"]


def test_seek_repair_off_keeps_grid_behaviour():
    grid = np.stack([
        row(ts(0), A, ts(10), ts(10), B),
        row(ts(2.5), C, ts(5)),
    ])
    t, calls = make_mock_transcriber([grid])
    t.seek_repair = False
    audio = np.zeros(60 * 16_000, np.float32)
    out = t.transcribe(audio, remove_silence=False)
    assert len(calls) == 1
    # trailing 'b' is kept as an unclosed segment (old behaviour)
    assert [s["text"] for s in out["segments"]] == ["a", "b", "c"]


def test_retry_subbatches_capped_by_best_of():
    """The quality-fallback retry expands each row best_of-fold inside the
    decode — _collect_slab must sub-batch so bucket * best_of never
    exceeds max_chunk_batch (whisper-medium's cache OOMs past 48 rows;
    48 * 5 would be fatal)."""
    t = Transcriber.random_init(
        "tiny", language=0, no_speech_threshold=None, enable_fallback=True,
        best_of=4, temperature_ladder=(0.2,),
    )
    t.max_chunk_batch = 8
    calls = []

    def fake_run_decode(audio_states, temperature=0.0, seed=0,
                        first_row_prompt=False):
        calls.append((audio_states.shape[0], temperature))
        b = audio_states.shape[0]
        toks = np.full((b, 8), ts(0), np.int32)  # quality-passing rows
        toks[:, 1] = 97
        toks[:, 2] = ts(1)
        return decode_lib.DecodeResult(
            tokens=jnp.asarray(toks),
            lengths=jnp.full((b,), 3, jnp.int32),
            sum_logprob=jnp.zeros((b,), jnp.float32),
            no_speech_prob=jnp.zeros((b,), jnp.float32),
        )

    t._run_decode = fake_run_decode
    # force every row of an 8-row slab to fail the first gate once
    orig_failed = t._failed_rows
    state = {"first": True}

    def failing_once(result, tokens, n_real):
        if state["first"]:
            state["first"] = False
            return np.ones(n_real, bool)
        return np.zeros(n_real, bool)

    t._failed_rows = failing_once
    del orig_failed
    states = jnp.zeros((8, 4, 8), jnp.float32)
    first = fake_run_decode(states)
    t._collect_slab(first, states, 8)
    retry_calls = [c for c in calls if c[1] > 0]
    assert retry_calls, "no retry dispatched"
    # max_chunk_batch=8, best_of=4 -> sub-batches of <= 2 rows
    assert all(b <= 2 for b, _ in retry_calls), retry_calls
    assert sum(b for b, _ in retry_calls) >= 8  # every failed row retried


def test_base_temperature_samples_from_the_start():
    """temperature=0.4 (openai's single-float temperature option): ONE
    decode at 0.4 with NO retry rungs (openai wraps a float as
    [temperature]); an explicit ladder keeps its rungs above the base
    (openai's tuple form with a custom start)."""
    t = Transcriber.random_init(
        "tiny", language=0, no_speech_threshold=None, enable_fallback=False,
        temperature=0.4,
    )
    assert t._ladder == ()
    explicit = Transcriber.random_init(
        "tiny", language=0, no_speech_threshold=None, enable_fallback=False,
        temperature=0.4, temperature_ladder=(0.2, 0.6, 1.0),
    )
    assert explicit._ladder == (0.6, 1.0)
    # an explicit ladder that happens to EQUAL the default is still the
    # tuple form — its higher rungs run (the not-passed None sentinel is
    # what selects the no-retry float semantics)
    explicit_default = Transcriber.random_init(
        "tiny", language=0, no_speech_threshold=None, enable_fallback=False,
        temperature=0.4, temperature_ladder=(0.2, 0.4, 0.6, 0.8, 1.0),
    )
    assert explicit_default._ladder == (0.6, 0.8, 1.0)
    calls = []

    def fake_run_decode(audio_states, temperature=None, seed=0,
                        first_row_prompt=False):
        if temperature is None:
            temperature = t.temperature
        calls.append(temperature)
        b = audio_states.shape[0]
        return decode_lib.DecodeResult(
            tokens=jnp.full((b, 8), ST.eot, jnp.int32),
            lengths=jnp.zeros((b,), jnp.int32),
            sum_logprob=jnp.zeros((b,), jnp.float32),
            no_speech_prob=jnp.zeros((b,), jnp.float32),
        )

    t._run_decode = fake_run_decode
    t._frontend_encode = lambda p, chunks: jnp.zeros(
        (chunks.shape[0], 4, 8), jnp.float32
    )
    audio = np.zeros(35 * 16_000, np.float32)
    t.transcribe(audio, remove_silence=False)
    assert calls == [0.4]


def test_negative_temperature_rejected():
    with pytest.raises(ValueError, match="temperature"):
        Transcriber.random_init("tiny", temperature=-0.1)


def test_word_timestamps_include_patch_windows(monkeypatch):
    """word_timestamps=True + seek repair: the patch window's words join
    the grid windows' words in time order (patch states are retained and
    aligned)."""
    from audio_processor_tpu.models.whisper import align

    grid = np.stack([
        row(ts(0), A, ts(10), ts(10), B),
        row(ts(2.5), C, ts(5)),
    ])
    patch = row(ts(0), D, ts(22.5))[None, :]
    t, calls = make_mock_transcriber([grid, patch])
    t.word_timestamps = True

    def fake_word_timestamps(params, cfg, states, rows, st, dec, offsets,
                             with_probabilities=False, **_kw):
        out = []
        for r, off in zip(np.asarray(rows), np.asarray(offsets)):
            text = [int(x) for x in r if int(x) < st.eot]
            out.append(
                [{"word": dec([tok]), "start": float(off), "end": float(off) + 0.5}
                 for tok in text]
            )
        return out

    monkeypatch.setattr(align, "word_timestamps", fake_word_timestamps)
    audio = np.zeros(60 * 16_000, np.float32)
    out = t.transcribe(audio, remove_silence=False)
    words = [w["word"] for w in out["words"]]
    # 'b' was truncated from window 0; 'd' (the patch) lands between 'a'
    # (offset 0) and 'c' (offset 30) because its offset is 10 s
    assert words == ["a", "d", "c"], out["words"]
    starts = [w["start"] for w in out["words"]]
    assert starts == sorted(starts)
