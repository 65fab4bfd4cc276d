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
    assert [w["word"] for w in ws] == ["hello", "world", "again"]
    for w in ws:
        assert 30.0 <= w["start"] <= w["end"]
    starts = [w["start"] for w in ws]
    assert starts == sorted(starts)
