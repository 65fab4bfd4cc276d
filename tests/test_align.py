"""Word-timestamp alignment tests (DTW + cross-attention map shapes)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_processor_tpu.models.whisper import align, decode, model
from audio_processor_tpu.models.whisper.config import WhisperConfig
from audio_processor_tpu.models.whisper.tokenizer import ByteTokenizer

CFG = WhisperConfig(
    name="align-test", n_mels=80, n_audio_ctx=48, n_audio_state=64,
    n_audio_head=2, n_audio_layer=2, n_vocab=512, n_text_ctx=32,
    n_text_state=64, n_text_head=2, n_text_layer=2,
)


def test_dtw_diagonal_identity():
    m = np.eye(6) * 0.9 + 0.01
    starts = align.dtw_path(m)
    assert (starts == np.arange(6)).all()


def test_dtw_monotonic_on_random():
    rng = np.random.default_rng(0)
    m = rng.uniform(0.01, 1.0, (10, 40))
    starts = align.dtw_path(m)
    assert (np.diff(starts) >= 0).all()
    assert 0 <= starts[0] and starts[-1] <= 39


def test_cross_attention_map_shape_and_norm():
    params = model.init_params(CFG, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(0, 1, (2, CFG.n_audio_ctx, 64)), jnp.float32)
    tokens = jnp.asarray(rng.integers(0, 200, (2, 7)), jnp.int32)
    m = np.asarray(align.cross_attention_map(params, CFG, tokens, audio))
    assert m.shape == (2, 7, CFG.n_audio_ctx)
    # mean of softmaxes: rows sum to ~1
    np.testing.assert_allclose(m.sum(-1), 1.0, atol=1e-4)


def test_alignment_heads_mask_changes_map():
    """cfg.alignment_heads selects exactly those heads: the masked map must
    equal the mean of the selected heads' maps from the all-heads pass."""
    import dataclasses

    params = model.init_params(CFG, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(0, 1, (1, CFG.n_audio_ctx, 64)), jnp.float32)
    tokens = jnp.asarray(rng.integers(0, 200, (1, 5)), jnp.int32)

    pairs = ((0, 1), (1, 0))
    cfg_h = dataclasses.replace(CFG, alignment_heads=pairs)
    masked = np.asarray(align.cross_attention_map(params, cfg_h, tokens, audio))
    all_maps = np.asarray(
        align.all_head_attention_maps(params, CFG, tokens, audio)
    )  # (L, B, H, T, Ta)
    expect = (all_maps[0, :, 1] + all_maps[1, :, 0]) / 2.0
    np.testing.assert_allclose(masked, expect, atol=1e-5)
    # and it differs from the layer-mean fallback
    fallback = np.asarray(align.cross_attention_map(params, CFG, tokens, audio))
    assert not np.allclose(masked, fallback, atol=1e-6)


def test_calibrate_alignment_heads():
    """The calibrator returns top-k (layer, head) pairs ranked by DTW-path
    mass, valid for the config, and is deterministic."""
    params = model.init_params(CFG, jax.random.PRNGKey(0))
    st = decode.SpecialTokens.for_config(CFG)
    rng = np.random.default_rng(1)
    audio = jnp.asarray(rng.normal(0, 1, (1, CFG.n_audio_ctx, 64)), jnp.float32)
    tok = ByteTokenizer()
    ids = tok.encode("calibrate these heads")
    rows = np.full((1, len(ids) + 2), st.eot, np.int64)
    rows[0, : len(ids)] = ids
    pairs = align.calibrate_alignment_heads(params, CFG, audio, rows, st, top_k=2)
    assert len(pairs) == 2
    for layer, head in pairs:
        assert 0 <= layer < CFG.n_text_layer
        assert 0 <= head < CFG.n_text_head
    assert pairs == align.calibrate_alignment_heads(
        params, CFG, audio, rows, st, top_k=2
    )
    # measured heads plug into the serving path
    import dataclasses

    cfg_h = dataclasses.replace(CFG, alignment_heads=pairs)
    words = align.word_timestamps(
        params, cfg_h, audio, rows, st, tok.decode, np.array([0.0])
    )
    assert [w["word"] for w in words[0]] == ["calibrate", " these", " heads"]


def test_alignment_heads_roundtrip_npz(tmp_path):
    from audio_processor_tpu.models.whisper import convert
    import dataclasses

    params = model.init_params(CFG, jax.random.PRNGKey(0))
    cfg_h = dataclasses.replace(CFG, alignment_heads=((0, 0), (1, 1)))
    path = str(tmp_path / "ck.npz")
    convert.save_params(path, params, cfg_h)
    _, cfg2 = convert.load_params(path)
    assert cfg2.alignment_heads == ((0, 0), (1, 1))
    # and without heads the field stays None
    convert.save_params(path, params, CFG)
    _, cfg3 = convert.load_params(path)
    assert cfg3.alignment_heads is None


def test_alignment_heads_from_generation_config():
    from audio_processor_tpu.models.whisper import convert

    assert convert.alignment_heads_from_generation_config(
        {"alignment_heads": [[2, 2], [3, 0]]}
    ) == ((2, 2), (3, 0))
    assert convert.alignment_heads_from_generation_config({}) is None


def test_word_timestamps_end_to_end():
    params = model.init_params(CFG, jax.random.PRNGKey(0))
    st = decode.SpecialTokens.for_config(CFG)
    tok = ByteTokenizer()
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(0, 1, (1, CFG.n_audio_ctx, 64)), jnp.float32)
    ids = tok.encode("hello world again")
    rows = np.full((1, len(ids)), st.eot, np.int64)
    rows[0, : len(ids)] = ids
    words = align.word_timestamps(
        params, CFG, audio, rows, st, tok.decode, np.array([30.0])
    )
    assert len(words) == 1
    ws = words[0]
    # openai-whisper keeps the leading space on space-delimited words
    assert [w["word"] for w in ws] == ["hello", " world", " again"]
    for w in ws:
        assert 30.0 <= w["start"] <= w["end"]
    starts = [w["start"] for w in ws]
    assert starts == sorted(starts)


def test_split_words_unicode_cjk():
    """Spaceless languages split per unicode codepoint: a CJK character's
    multi-byte token group must come out as ONE word (openai's
    split_tokens_on_unicode — byte-level tokens decode to U+FFFD until the
    codepoint completes)."""
    tok = ByteTokenizer()
    ids = list(tok.encode("你好世界"))
    words, idx = align._split_words(ids, tok.decode, "zh")
    assert words == ["你", "好", "世", "界"]
    # 3 UTF-8 bytes per character, indices partition the token list
    assert [len(g) for g in idx] == [3, 3, 3, 3]
    assert [k for g in idx for k in g] == list(range(len(ids)))


def test_split_words_space_language_and_punctuation_merge():
    tok = ByteTokenizer()
    ids = list(tok.encode("hello, world."))
    words, idx = align._split_words(ids, tok.decode, "en")
    # punctuation starts its own split-word (openai's split_tokens_on_spaces)
    assert words == ["hello", ",", " world", "."]
    merged = align._merge_punctuations(
        [{"word": w, "start": float(i), "end": float(i + 1)}
         for i, w in enumerate(words)],
        align.PREPEND_PUNCTUATIONS, align.APPEND_PUNCTUATIONS,
    )
    # appended punctuation folds into the previous word, keeping its timing
    assert [w["word"] for w in merged] == ["hello,", " world."]
    assert merged[0]["start"] == 0.0 and merged[0]["end"] == 1.0


def test_merge_punctuations_prepend():
    # opening quote attaches to the FOLLOWING word (openai's prepended set)
    words = [
        {"word": "so", "start": 0.0, "end": 1.0},
        {"word": ' "', "start": 1.0, "end": 2.0},
        {"word": "quoted", "start": 2.0, "end": 3.0},
    ]
    merged = align._merge_punctuations(
        words, align.PREPEND_PUNCTUATIONS, align.APPEND_PUNCTUATIONS
    )
    assert [w["word"] for w in merged] == ["so", ' "quoted']
    # base word keeps its own timing/probability fields
    assert merged[1]["start"] == 2.0


def test_word_timestamps_cjk_language():
    """End-to-end: language='zh' yields per-codepoint words with monotone
    timings and full-sentence punctuation merged."""
    params = model.init_params(CFG, jax.random.PRNGKey(0))
    st = decode.SpecialTokens.for_config(CFG)
    tok = ByteTokenizer()
    ids = tok.encode("你好世界。")
    rows = np.full((1, len(ids)), st.eot, np.int64)
    rows[0, : len(ids)] = ids
    words = align.word_timestamps(
        params, CFG, audio_states=jnp.zeros((1, CFG.n_audio_ctx, 64), jnp.float32),
        token_rows=rows, st=st, decode_text=tok.decode,
        chunk_offsets_s=np.array([0.0]), language="zh",
    )[0]
    assert [w["word"] for w in words] == ["你", "好", "世", "界。"]
    starts = [w["start"] for w in words]
    assert starts == sorted(starts)


def test_word_timestamps_with_probabilities():
    """with_probabilities attaches a per-word mean token probability from
    the same teacher-forced pass (feeds the hallucination anomaly score)."""
    params = model.init_params(CFG, jax.random.PRNGKey(0))
    st = decode.SpecialTokens.for_config(CFG)
    tok = ByteTokenizer()
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(0, 1, (1, CFG.n_audio_ctx, 64)), jnp.float32)
    ids = tok.encode("hello world")
    rows = np.full((1, len(ids)), st.eot, np.int64)
    rows[0, : len(ids)] = ids
    plain = align.word_timestamps(
        params, CFG, audio, rows, st, tok.decode, np.array([0.0])
    )[0]
    withp = align.word_timestamps(
        params, CFG, audio, rows, st, tok.decode, np.array([0.0]),
        with_probabilities=True,
    )[0]
    assert all("probability" not in w for w in plain)
    assert [w["word"] for w in withp] == [w["word"] for w in plain]
    assert [(w["start"], w["end"]) for w in withp] == [
        (w["start"], w["end"]) for w in plain
    ]  # probabilities must not perturb the alignment itself
    for w in withp:
        assert 0.0 <= w["probability"] <= 1.0


def test_median_filter_removes_spikes():
    x = np.zeros((2, 30), np.float32)
    x[:, 10] = 5.0  # isolated spike
    y = align._median_filter(x, 7)
    assert y.shape == x.shape
    assert (y[:, 10] == 0.0).all()
    # identity when the axis is too short to reflect-pad (openai's guard)
    short = np.ones((2, 5), np.float32)
    assert (align._median_filter(short, 7) == short).all()


def test_word_stamps_respect_content_frames():
    """openai crops the attention matrix to the window's REAL content
    frames before DTW (num_frames//2), so no word can be stamped into the
    zero-padding past the audio — including the LAST word's end, which now
    comes from the eot row's aligned frame instead of a fixed tail."""
    params = model.init_params(CFG, jax.random.PRNGKey(0))
    st = decode.SpecialTokens.for_config(CFG)
    tok = ByteTokenizer()
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(0, 1, (1, CFG.n_audio_ctx, 64)), jnp.float32)
    ids = tok.encode("hello world again")
    rows = np.full((1, len(ids)), st.eot, np.int64)
    rows[0, : len(ids)] = ids
    nf = 12
    words = align.word_timestamps(
        params, CFG, audio, rows, st, tok.decode, np.array([0.0]),
        content_frames=np.array([nf]),
    )[0]
    limit = nf * align.AUDIO_FRAME_S
    for w in words:
        assert 0.0 <= w["start"] <= w["end"] <= limit + 1e-6, w


def test_probabilities_normalise_over_text_vocab():
    """vocab_cap=st.eot (openai's logits[..., :eot] softmax): restricting
    the softmax support can only RAISE each text token's probability vs
    the full-vocab softmax."""
    params = model.init_params(CFG, jax.random.PRNGKey(0))
    st = decode.SpecialTokens.for_config(CFG)
    rng = np.random.default_rng(1)
    audio = jnp.asarray(rng.normal(0, 1, (1, CFG.n_audio_ctx, 64)), jnp.float32)
    tokens = jnp.asarray(rng.integers(0, 200, (1, 6)), jnp.int32)
    _, full = align.cross_attention_map_and_probs(params, CFG, tokens, audio)
    _, capped = align.cross_attention_map_and_probs(
        params, CFG, tokens, audio, vocab_cap=st.eot
    )
    full, capped = np.asarray(full)[0], np.asarray(capped)[0]
    assert (capped[1:] >= full[1:] - 1e-6).all()


def test_batch_padding_matches_unpadded_rows():
    """The power-of-two batch bucket (compile-count cap) must not change
    any real row's words."""
    params = model.init_params(CFG, jax.random.PRNGKey(0))
    st = decode.SpecialTokens.for_config(CFG)
    tok = ByteTokenizer()
    rng = np.random.default_rng(0)
    audio3 = jnp.asarray(rng.normal(0, 1, (3, CFG.n_audio_ctx, 64)), jnp.float32)
    ids = tok.encode("pad me")
    rows3 = np.full((3, len(ids)), st.eot, np.int64)
    rows3[:, : len(ids)] = ids
    got3 = align.word_timestamps(
        params, CFG, audio3, rows3, st, tok.decode, np.zeros(3),
        with_probabilities=True,
    )  # batch 3 -> padded to 4
    got1 = align.word_timestamps(
        params, CFG, audio3[:1], rows3[:1], st, tok.decode, np.zeros(1),
        with_probabilities=True,
    )  # batch 1 -> no padding
    assert [w["word"] for w in got3[0]] == [w["word"] for w in got1[0]]
    for a, b in zip(got3[0], got1[0]):
        assert abs(a["start"] - b["start"]) < 1e-6
        assert abs(a["probability"] - b["probability"]) < 1e-4
