"""Unit tests for the vectorised Whisper sampling rules
(decode.apply_logit_rules) — each rule checked in isolation."""
import numpy as np
import jax.numpy as jnp
import pytest

from audio_processor_tpu.models.whisper import decode
from audio_processor_tpu.models.whisper.config import WhisperConfig

CFG = WhisperConfig(
    name="rules", n_mels=80, n_audio_ctx=16, n_audio_state=32,
    n_audio_head=2, n_audio_layer=1, n_vocab=64, n_text_ctx=16,
    n_text_state=32, n_text_head=2, n_text_layer=1,
)
ST = decode.SpecialTokens.for_config(CFG)
V = CFG.n_vocab
TB = ST.timestamp_begin


def _apply(logits, **kw):
    defaults = dict(
        step=jnp.int32(1),
        last_token=jnp.asarray([1]),
        penultimate_token=jnp.asarray([2]),
        max_ts_token=jnp.asarray([TB - 1]),  # sentinel: no timestamp sampled yet
        suppress_mask=None,
        use_timestamps=True,
    )
    defaults.update(kw)
    return np.asarray(decode.apply_logit_rules(jnp.asarray(logits), ST, **defaults))


def _flat():
    return np.zeros((1, V), np.float32)


def test_static_suppress_list():
    mask = np.zeros(V, bool)
    mask[5] = True
    out = _apply(_flat(), suppress_mask=jnp.asarray(mask), use_timestamps=False)
    assert out[0, 5] == -np.inf
    assert np.isfinite(out[0, 6])


def test_first_sample_must_be_timestamp_and_capped():
    out = _apply(_flat(), step=jnp.int32(0))
    assert np.isinf(out[0, : TB]).all()  # all text suppressed
    assert np.isfinite(out[0, TB])
    # cap: timestamps past tb+50 suppressed (vocab too small to reach here,
    # so check via a config-independent index if available)
    cap = TB + 51
    if cap < V:
        assert out[0, cap] == -np.inf


def test_after_two_timestamps_forces_text():
    out = _apply(
        _flat(),
        step=jnp.int32(3),
        last_token=jnp.asarray([TB + 5]),
        penultimate_token=jnp.asarray([TB + 5]),
        max_ts_token=jnp.asarray([TB + 5]),
    )
    assert np.isinf(out[0, TB:]).all()  # no more timestamps
    assert np.isfinite(out[0, 1])  # text allowed


def test_after_single_timestamp_forces_timestamp_or_eot():
    logits = _flat()
    # give EOT dominant mass so the force-timestamp-by-probability rule
    # (which, like openai's, may mask EOT when timestamp mass wins) stays out
    logits[0, ST.eot] = 10.0
    out = _apply(
        logits,
        step=jnp.int32(3),
        last_token=jnp.asarray([TB + 5]),
        penultimate_token=jnp.asarray([1]),  # text
        max_ts_token=jnp.asarray([TB + 5]),
    )
    assert np.isinf(out[0, : ST.eot]).all()  # text suppressed
    assert np.isfinite(out[0, ST.eot])
    # openai allows re-sampling the SAME timestamp after a lone timestamp —
    # that is exactly how the contiguous <|t|><|t|> boundary pair forms —
    # but nothing below it
    assert np.isfinite(out[0, TB + 5])
    assert out[0, TB + 4] == -np.inf


def test_monotonic_floor_after_text():
    out = _apply(
        _flat(),
        step=jnp.int32(4),
        last_token=jnp.asarray([7]),  # text token
        penultimate_token=jnp.asarray([TB + 9]),
        max_ts_token=jnp.asarray([TB + 9]),
    )
    # after text, the next timestamp must be STRICTLY greater than the max
    # seen (openai's zero-length-segment guard)
    assert out[0, TB + 9] == -np.inf
    assert np.isfinite(out[0, TB + 10])


def test_no_floor_before_first_timestamp():
    out = _apply(
        _flat(),
        step=jnp.int32(2),
        last_token=jnp.asarray([7]),
        penultimate_token=jnp.asarray([TB + 1]),  # e.g. the forced initial ts
        max_ts_token=jnp.asarray([TB + 1]),
    )
    # floor after text = max_ts + 1: the opening timestamp cannot repeat as
    # a close (zero-length segment), but the next slot can
    assert out[0, TB + 1] == -np.inf
    assert np.isfinite(out[0, TB + 2])
    # sentinel tb-1 with text last: nothing below tb suppressed by the floor
    out2 = _apply(
        _flat(),
        step=jnp.int32(0),
        last_token=jnp.asarray([1]),
        penultimate_token=jnp.asarray([2]),
        max_ts_token=jnp.asarray([TB - 1]),
    )
    assert np.isfinite(out2[0, TB])  # <|0.00|> available at the first sample


def test_no_timestamps_token_suppressed_in_timestamp_mode():
    out = _apply(_flat(), step=jnp.int32(3))
    assert out[0, ST.no_timestamps] == -np.inf


def test_suppress_blank_at_first_sample():
    out = _apply(
        _flat(), step=jnp.int32(0), use_timestamps=False, space_blank_id=3
    )
    assert out[0, 3] == -np.inf
    assert out[0, ST.eot] == -np.inf
    out1 = _apply(
        _flat(), step=jnp.int32(1), use_timestamps=False, space_blank_id=3
    )
    assert np.isfinite(out1[0, 3])


def test_force_timestamp_when_ts_mass_dominates():
    logits = _flat()
    logits[0, TB:] = 3.0  # huge total timestamp mass
    out = _apply(
        logits,
        step=jnp.int32(3),
        last_token=jnp.asarray([1]),
        penultimate_token=jnp.asarray([2]),
    )
    assert np.isinf(out[0, :TB][np.isfinite(logits[0, :TB])]).all()


def test_build_suppress_mask_covers_specials_and_symbols():
    from audio_processor_tpu.models.whisper.tokenizer import ByteTokenizer

    tok = ByteTokenizer()
    mask = decode.build_suppress_mask(tok, ST)
    assert mask.shape == (V,)
    # specials always suppressed (openai's SuppressTokens tail)
    for t in (ST.sot, ST.translate, ST.transcribe, ST.startoflm,
              ST.startofprev, ST.no_speech):
        assert mask[t]
    # EOT and timestamps never statically suppressed
    assert not mask[ST.eot]
    assert not mask[TB]
    # a non-speech symbol byte inside the vocab range is suppressed
    assert mask[ord("#")]
    # basic punctuation (kept by openai's list) stays legal — note ","/"."
    # collide with special ids in this deliberately tiny 64-token vocab
    assert not mask[ord("!")]


def test_space_blank_token_id():
    from audio_processor_tpu.models.whisper.tokenizer import ByteTokenizer

    assert decode.space_blank_token_id(ByteTokenizer(), ST) == 32


def test_suppress_tokens_option_semantics():
    """openai DecodingOptions.suppress_tokens: None / [-1] = default
    non-speech set; explicit ids REPLACE it (specials always suppressed);
    -1 inside a list mixes the default set back in."""
    import numpy as np

    from audio_processor_tpu.models.whisper import decode as dl
    from audio_processor_tpu.pipeline.transcribe import Transcriber

    t_def = Transcriber.random_init("test", max_new_tokens=4)
    default_mask = np.asarray(t_def._suppress_mask)
    st = t_def.special

    t_none = Transcriber.random_init(
        "test", max_new_tokens=4, suppress_tokens=[-1]
    )
    np.testing.assert_array_equal(np.asarray(t_none._suppress_mask), default_mask)

    t_ids = Transcriber.random_init(
        "test", max_new_tokens=4, suppress_tokens=[7, 9]
    )
    m = np.asarray(t_ids._suppress_mask)
    assert m[7] and m[9]
    assert m[st.sot] and m[st.no_speech]  # specials always suppressed
    # a default-set symbol NOT in the list is no longer suppressed
    sym = np.flatnonzero(default_mask)
    free = [i for i in sym if i not in (7, 9) and i < st.sot - 10]
    if free:
        assert not m[free[0]]

    t_mix = Transcriber.random_init(
        "test", max_new_tokens=4, suppress_tokens=[-1, 7]
    )
    m2 = np.asarray(t_mix._suppress_mask)
    assert m2[7]
    assert (m2 | default_mask == m2).all()  # superset of the default set


def test_max_initial_timestamp_index_custom_and_none():
    """openai's max_initial_timestamp: a custom cap moves the boundary;
    None removes it entirely (DecodingOptions allows both)."""
    out = _apply(_flat(), step=jnp.int32(0), max_initial_timestamp_index=2)
    assert np.isfinite(out[0, TB])
    assert np.isfinite(out[0, TB + 2])
    assert out[0, TB + 3] == -np.inf
    out = _apply(_flat(), step=jnp.int32(0), max_initial_timestamp_index=None)
    assert np.isfinite(out[0, TB:]).all()  # every timestamp legal
    assert np.isinf(out[0, :TB]).all()  # text still forced off at step 0
