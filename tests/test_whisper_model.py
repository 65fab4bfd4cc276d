"""Whisper architecture parity vs torch/transformers (random weights).

No pretrained checkpoints exist in this image, so parity is established the
strong way: instantiate a random-init HF WhisperModel, convert its weights
through convert.from_hf_state_dict, and require logit agreement.  That pins
every architectural choice (attention scaling, GELU variant, LN placement,
conv padding, positional embeddings) without network access (SURVEY.md §7
'hard parts' #2).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_processor_tpu.models.whisper import convert, decode, model
from audio_processor_tpu.models.whisper.config import WhisperConfig, get_config

CFG = WhisperConfig(
    name="parity",
    n_mels=80,
    n_audio_ctx=96,
    n_audio_state=64,
    n_audio_head=2,
    n_audio_layer=2,
    n_vocab=1024,
    n_text_ctx=64,
    n_text_state=64,
    n_text_head=2,
    n_text_layer=2,
)


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers import WhisperConfig as HFConfig, WhisperModel

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=CFG.n_vocab,
        num_mel_bins=CFG.n_mels,
        encoder_layers=CFG.n_audio_layer,
        encoder_attention_heads=CFG.n_audio_head,
        decoder_layers=CFG.n_text_layer,
        decoder_attention_heads=CFG.n_text_head,
        d_model=CFG.n_audio_state,
        max_source_positions=CFG.n_audio_ctx,
        max_target_positions=CFG.n_text_ctx,
        encoder_ffn_dim=4 * CFG.n_audio_state,
        decoder_ffn_dim=4 * CFG.n_text_state,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=3,
        suppress_tokens=[],
        begin_suppress_tokens=[],
    )
    hf = WhisperModel(hf_cfg).eval()
    params = convert.from_hf_state_dict(hf.state_dict(), CFG)
    return hf, params


@pytest.fixture(scope="module")
def mel(rng):
    return rng.normal(0, 1, (2, CFG.n_mels, 2 * CFG.n_audio_ctx)).astype(np.float32)


def test_encoder_parity(hf_pair, mel):
    import torch

    hf, params = hf_pair
    with torch.no_grad():
        ref = hf.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    ours = np.asarray(model.encode(params, CFG, jnp.asarray(mel)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_decoder_parity(hf_pair, mel, rng):
    import torch

    hf, params = hf_pair
    tokens = rng.integers(0, CFG.n_vocab, (2, 7)).astype(np.int32)
    with torch.no_grad():
        enc = hf.encoder(torch.from_numpy(mel)).last_hidden_state
        ref = hf.decoder(
            input_ids=torch.from_numpy(tokens.astype(np.int64)),
            encoder_hidden_states=enc,
        ).last_hidden_state.numpy()
        # project to logits with tied embeddings, as our decode_logits does
        ref_logits = ref @ hf.decoder.embed_tokens.weight.detach().numpy().T

    audio = model.encode(params, CFG, jnp.asarray(mel))
    ours = np.asarray(model.decode_logits(params, CFG, jnp.asarray(tokens), audio))
    np.testing.assert_allclose(ours, ref_logits, atol=3e-3)


def test_cached_decode_matches_teacher_forced(hf_pair, mel, rng):
    """Prefill + single-token cached steps == full teacher-forced pass."""
    _, params = hf_pair
    tokens = jnp.asarray(rng.integers(0, CFG.n_vocab, (2, 6)).astype(np.int32))
    audio = model.encode(params, CFG, jnp.asarray(mel))

    full = model.decode_logits(params, CFG, tokens, audio)

    cache = decode.init_cache(params, CFG, audio, max_len=16)
    # prefill first 3 tokens, then step one-by-one
    logits_a, cache = decode.decoder_forward_cached(
        params, CFG, tokens[:, :3], cache, jnp.int32(0)
    )
    outs = [logits_a]
    for t in range(3, 6):
        step_logits, cache = decode.decoder_forward_cached(
            params, CFG, tokens[:, t : t + 1], cache, jnp.int32(t)
        )
        outs.append(step_logits)
    cached = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(full), atol=2e-4)


def test_greedy_decode_runs_and_terminates(hf_pair, mel):
    _, params = hf_pair
    st = decode.SpecialTokens.for_config(CFG)
    audio = model.encode(params, CFG, jnp.asarray(mel))
    res = decode.greedy_decode(
        params,
        CFG,
        audio,
        sot_sequence=tuple(st.sot_sequence()),
        max_new_tokens=12,
        use_timestamps=True,
    )
    toks = np.asarray(res.tokens)
    assert toks.shape == (2, 12)
    # first sampled token must be a timestamp (rule 5)
    assert (toks[:, 0] >= st.timestamp_begin).all()
    assert np.asarray(res.no_speech_prob).shape == (2,)


def test_greedy_decode_deterministic(hf_pair, mel):
    _, params = hf_pair
    st = decode.SpecialTokens.for_config(CFG)
    audio = model.encode(params, CFG, jnp.asarray(mel))
    kw = dict(sot_sequence=tuple(st.sot_sequence()), max_new_tokens=8)
    a = decode.greedy_decode(params, CFG, audio, **kw)
    b = decode.greedy_decode(params, CFG, audio, **kw)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))


def test_int8_cross_kv_matches_float(hf_pair, mel):
    """Quantised cross-KV decode must track the float path closely."""
    _, params = hf_pair
    st = decode.SpecialTokens.for_config(CFG)
    audio = model.encode(params, CFG, jnp.asarray(mel))
    kw = dict(sot_sequence=tuple(st.sot_sequence()), max_new_tokens=10)
    a = decode.greedy_decode(params, CFG, audio, quantize_cross_kv=False, **kw)
    b = decode.greedy_decode(params, CFG, audio, quantize_cross_kv=True, **kw)
    # random-weight logits are near-uniform (worst case for quantisation);
    # still require the decoded streams to mostly agree
    agreement = (np.asarray(a.tokens) == np.asarray(b.tokens)).mean()
    assert agreement >= 0.7, agreement

    # direct logit comparison on one cached step
    cache_f = decode.init_cache(params, CFG, audio, max_len=4)
    cache_q = decode.init_cache(params, CFG, audio, max_len=4, quantize_cross_kv=True)
    toks = jnp.full((audio.shape[0], 1), st.sot, jnp.int32)
    lf, _ = decode.decoder_forward_cached(params, CFG, toks, cache_f, jnp.int32(0))
    lq, _ = decode.decoder_forward_cached(params, CFG, toks, cache_q, jnp.int32(0))
    rel = np.abs(np.asarray(lf) - np.asarray(lq)).max() / np.abs(np.asarray(lf)).max()
    assert rel < 0.05, rel
    assert cache_q.cross_k.dtype == jnp.int8


def test_kernel_layout_decode_matches_standard_int8(hf_pair, mel):
    """Pallas kernel-layout path (reference twin on CPU) == standard int8."""
    _, params = hf_pair
    st = decode.SpecialTokens.for_config(CFG)
    audio = model.encode(params, CFG, jnp.asarray(mel))
    kw = dict(sot_sequence=tuple(st.sot_sequence()), max_new_tokens=8,
              quantize_cross_kv=True)
    a = decode.greedy_decode(params, CFG, audio, use_pallas_kernel=False, **kw)
    b = decode.greedy_decode(params, CFG, audio, use_pallas_kernel=True, **kw)
    agreement = (np.asarray(a.tokens) == np.asarray(b.tokens)).mean()
    assert agreement >= 0.9, agreement


def test_int8_decoder_weights_track_float(hf_pair, mel):
    from audio_processor_tpu.models.whisper import quantize

    _, params = hf_pair
    qparams = quantize.quantize_decoder(params)
    # encoder untouched
    assert "w" in params["encoder"]["blocks"]["fc1"]
    assert "w8" in qparams["decoder"]["blocks"]["fc1"]
    assert qparams["decoder"]["blocks"]["fc1"]["w8"].dtype == jnp.int8

    audio = model.encode(params, CFG, jnp.asarray(mel))
    toks = jnp.asarray(np.random.default_rng(0).integers(0, CFG.n_vocab, (2, 5)), jnp.int32)
    lf = np.asarray(model.decode_logits(params, CFG, toks, audio))
    lq = np.asarray(model.decode_logits(qparams, CFG, toks, audio))
    rel = np.abs(lf - lq).max() / np.abs(lf).max()
    assert rel < 0.05, rel

    # greedy decode still runs on the quantized tree
    st = decode.SpecialTokens.for_config(CFG)
    res = decode.greedy_decode(
        qparams, CFG, audio, sot_sequence=tuple(st.sot_sequence()), max_new_tokens=6
    )
    assert np.asarray(res.tokens).shape == (2, 6)


def test_pallas_decode_attention_kernel_interpret():
    """The kernel itself (interpret mode) vs its jnp twin."""
    from audio_processor_tpu.ops.pallas import decode_attention as da

    rng = np.random.default_rng(0)
    b, tq, h, dh, tpad, valid = 2, 3, 2, 64, 128, 100
    q = jnp.asarray(rng.normal(0, 1, (b, tq, h, dh)).astype(np.float32))
    k8 = jnp.asarray(rng.integers(-127, 128, (b, h, dh, tpad)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (b, h, tpad, dh)), jnp.int8)
    ref = np.asarray(da.cross_attention_int8_reference(q, k8, v8, valid_len=valid))
    out = np.asarray(
        da.cross_attention_int8(q, k8, v8, valid_len=valid, interpret=True)
    )
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_beam_decode_runs_and_beats_greedy_score(hf_pair, mel):
    _, params = hf_pair
    st = decode.SpecialTokens.for_config(CFG)
    audio = model.encode(params, CFG, jnp.asarray(mel))
    kw = dict(sot_sequence=tuple(st.sot_sequence()), max_new_tokens=8)
    greedy = decode.greedy_decode(params, CFG, audio, **kw)
    beam = decode.beam_decode(params, CFG, audio, beam_size=3, **kw)
    assert beam.tokens.shape == greedy.tokens.shape
    toks = np.asarray(beam.tokens)
    assert (toks[:, 0] >= st.timestamp_begin).all()  # rule 5 holds per beam
    # beam-search total logprob must be >= greedy's (it explores a superset)
    g = np.asarray(greedy.sum_logprob)
    b = np.asarray(beam.sum_logprob)
    assert (b >= g - 1e-3).all(), (b, g)


def test_beam_decode_deterministic(hf_pair, mel):
    _, params = hf_pair
    st = decode.SpecialTokens.for_config(CFG)
    audio = model.encode(params, CFG, jnp.asarray(mel))
    kw = dict(sot_sequence=tuple(st.sot_sequence()), beam_size=3, max_new_tokens=6)
    a = decode.beam_decode(params, CFG, audio, **kw)
    b = decode.beam_decode(params, CFG, audio, **kw)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))


def test_beam_no_speech_prob_matches_greedy(hf_pair, mel):
    """The no-speech gate must fire identically under beam search.

    openai's DecodingTask reads P(<|nospeech|>) from the prefill logits at
    the <|sot|> slot regardless of decoder, so beam and greedy must report
    the same probability (previously beam returned zeros, silently
    disabling transcribe's silence gate for beam_size>0)."""
    _, params = hf_pair
    st = decode.SpecialTokens.for_config(CFG)
    audio = model.encode(params, CFG, jnp.asarray(mel))
    kw = dict(sot_sequence=tuple(st.sot_sequence()), max_new_tokens=6)
    greedy = decode.greedy_decode(params, CFG, audio, **kw)
    beam = decode.beam_decode(params, CFG, audio, beam_size=3, **kw)
    g = np.asarray(greedy.no_speech_prob)
    b = np.asarray(beam.no_speech_prob)
    assert (g > 0).all()  # softmax output: a real probability, not zeros
    np.testing.assert_allclose(b, g, rtol=1e-5, atol=1e-6)

    # prompted variant: beam agrees with prompted-greedy at the same slot
    rows, lens = decode.build_prompt_rows(
        [[7, 8, 9], []], tuple(st.sot_sequence()), st, 3
    )
    pg = decode.prompted_greedy_decode(
        params, CFG, audio, jnp.asarray(rows), jnp.asarray(lens),
        sot_len=len(st.sot_sequence()), max_new_tokens=6,
    )
    pb = decode.beam_decode(
        params, CFG, audio, beam_size=3,
        prompt_tokens=jnp.asarray(rows), prompt_lens=jnp.asarray(lens), **kw,
    )
    np.testing.assert_allclose(
        np.asarray(pb.no_speech_prob), np.asarray(pg.no_speech_prob),
        rtol=1e-5, atol=1e-6,
    )


def test_best_of_picks_argmax_avg_logprob(hf_pair, mel):
    """best_of=G at T>0 must equal manually sampling G copies per element
    (same seed -> same noise stream) and taking the best by avg logprob —
    openai's best_of ranker (whisper.transcribe defaults best_of=5 on
    every fallback rung, inherited by the reference)."""
    _, params = hf_pair
    st = decode.SpecialTokens.for_config(CFG)
    audio = model.encode(params, CFG, jnp.asarray(mel))
    g = 4
    kw = dict(
        sot_sequence=tuple(st.sot_sequence()), max_new_tokens=8,
        temperature=0.7, rng_seed=3,
    )
    picked = decode.greedy_decode(params, CFG, audio, best_of=g, **kw)
    # oracle: identical expanded batch through the same sampler
    manual = decode.greedy_decode(
        params, CFG, jnp.repeat(audio, g, axis=0), **kw
    )
    toks = np.asarray(manual.tokens).reshape(2, g, -1)
    lens = np.asarray(manual.lengths).reshape(2, g)
    sums = np.asarray(manual.sum_logprob).reshape(2, g)
    best = (sums / np.maximum(lens, 1)).argmax(-1)
    for i in range(2):
        np.testing.assert_array_equal(
            np.asarray(picked.tokens)[i], toks[i, best[i]]
        )
        np.testing.assert_allclose(
            np.asarray(picked.sum_logprob)[i], sums[i, best[i]], atol=1e-5
        )
    # determinism + T=0 ignores best_of (no silent behaviour change)
    again = decode.greedy_decode(params, CFG, audio, best_of=g, **kw)
    np.testing.assert_array_equal(
        np.asarray(picked.tokens), np.asarray(again.tokens)
    )
    base = decode.greedy_decode(
        params, CFG, audio, sot_sequence=tuple(st.sot_sequence()),
        max_new_tokens=8,
    )
    with_bo = decode.greedy_decode(
        params, CFG, audio, sot_sequence=tuple(st.sot_sequence()),
        max_new_tokens=8, best_of=g,
    )
    np.testing.assert_array_equal(
        np.asarray(base.tokens), np.asarray(with_bo.tokens)
    )


def test_detect_language(hf_pair, mel):
    _, params = hf_pair
    audio = model.encode(params, CFG, jnp.asarray(mel))
    idx, probs = decode.detect_language(params, CFG, audio)
    st = decode.SpecialTokens.for_config(CFG)
    assert idx.shape == (2,)
    assert probs.shape == (2, st.num_languages)
    np.testing.assert_allclose(np.asarray(probs).sum(axis=-1), 1.0, atol=1e-5)


def test_special_token_layout_matches_whisper():
    st = decode.SpecialTokens.for_config(get_config("small"))
    assert st.eot == 50257
    assert st.sot == 50258
    assert st.translate == 50358
    assert st.transcribe == 50359
    assert st.no_speech == 50362
    assert st.no_timestamps == 50363
    assert st.timestamp_begin == 50364
    st3 = decode.SpecialTokens.for_config(get_config("large-v3"))
    assert st3.timestamp_begin == 50365

    st_en = decode.SpecialTokens.for_config(get_config("tiny.en"))
    assert st_en.eot == 50256
    assert st_en.timestamp_begin == 50363


def test_tokens_to_segments():
    st = decode.SpecialTokens.for_config(CFG)
    tb = st.timestamp_begin
    from audio_processor_tpu.models.whisper.tokenizer import ByteTokenizer

    tok = ByteTokenizer()
    hello = tok.encode("hello")
    world = tok.encode(" world")
    rows = np.array(
        [
            [tb + 0] + hello + [tb + 50, tb + 50] + world + [tb + 100, st.eot],
        ],
        dtype=np.int32,
    )
    segs = decode.tokens_to_segments(rows, st, np.array([30.0]), tok.decode)
    assert len(segs) == 2
    assert segs[0]["text"] == "hello"
    assert abs(segs[0]["start"] - 30.0) < 1e-6
    assert abs(segs[0]["end"] - 31.0) < 1e-6
    assert segs[1]["text"] == "world"
    assert abs(segs[1]["start"] - 31.0) < 1e-6
    assert abs(segs[1]["end"] - 32.0) < 1e-6


def test_npz_roundtrip(hf_pair, tmp_path):
    _, params = hf_pair
    p = str(tmp_path / "model.npz")
    convert.save_params(p, params, CFG)
    params2, cfg2 = convert.load_params(p)
    assert cfg2.n_audio_state == CFG.n_audio_state
    leaves1 = jax.tree.leaves(params)
    leaves2 = jax.tree.leaves(params2)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bpe_tokenizer_roundtrip(tmp_path):
    """Build a tiny GPT2-style vocab covering all bytes + a few merges."""
    import json

    from audio_processor_tpu.models.whisper.tokenizer import (
        BPETokenizer,
        _bytes_to_unicode,
    )

    chars = sorted(_bytes_to_unicode().values())
    vocab = {c: i for i, c in enumerate(chars)}
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o")]
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    vp, mp = str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt")
    with open(vp, "w") as f:
        json.dump(vocab, f)
    with open(mp, "w") as f:
        f.write("#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges))

    tok = BPETokenizer.from_vocab_files(vp, mp)
    ids = tok.encode("hello hello")
    assert tok.decode(ids) == "hello hello"
    assert vocab["hello"] in ids
    # non-ascii text roundtrips through the byte table
    assert tok.decode(tok.encode("héllo ✓")) == "héllo ✓"


# ---------------------------------------------------------------------------
# int4 nibble-packed cross-KV (decode-attention kernel v2)
# ---------------------------------------------------------------------------

def test_int4_pack_reference_matches_dequantized_float():
    """The packed int4 attention (jnp twin) must EXACTLY equal float
    attention over the dequantised int4 values with the same mask —
    packing/unpacking and the de-interleaved time order lose nothing."""
    from audio_processor_tpu.ops.pallas import decode_attention as da

    rng = np.random.default_rng(0)
    b, tq, h, dh, tpad, valid = 2, 2, 3, 64, 256, 200
    q = jnp.asarray(rng.normal(0, 1, (b, tq, h, dh)).astype(np.float32))
    k_vals = rng.integers(-7, 8, (b, h, dh, tpad)).astype(np.int8)
    v_vals = rng.integers(-7, 8, (b, h, tpad, dh)).astype(np.int8)
    k4, v4 = da.pack_int4_time(jnp.asarray(k_vals), jnp.asarray(v_vals))
    assert k4.shape == (b, h, dh, tpad // 2)
    assert v4.shape == (b, h, tpad // 2, dh)

    got = np.asarray(da.cross_attention_int4_reference(q, k4, v4, valid_len=valid))
    # float oracle over the SAME integer values, original time order
    import math as _math

    scores = np.einsum("bqhd,bhdt->bhqt", np.asarray(q), k_vals.astype(np.float32))
    scores /= _math.sqrt(dh)
    scores[..., valid:] = -1e30
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bhqt,bhtd->bqhd", p, v_vals.astype(np.float32))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_int4_kernel_interpret_matches_reference():
    from audio_processor_tpu.ops.pallas import decode_attention as da

    rng = np.random.default_rng(1)
    b, tq, h, dh, tpad, valid = 2, 3, 2, 64, 256, 190
    q = jnp.asarray(rng.normal(0, 1, (b, tq, h, dh)).astype(np.float32))
    k_vals = jnp.asarray(rng.integers(-7, 8, (b, h, dh, tpad)), jnp.int8)
    v_vals = jnp.asarray(rng.integers(-7, 8, (b, h, tpad, dh)), jnp.int8)
    k4, v4 = da.pack_int4_time(k_vals, v_vals)
    ref = np.asarray(da.cross_attention_int4_reference(q, k4, v4, valid_len=valid))
    out = np.asarray(da.cross_attention_int4(q, k4, v4, valid_len=valid, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_int4_stacked_kernel_interpret_matches_reference():
    """The stacked-cache kernel (layer id via scalar prefetch) must read
    exactly the selected layer: parity vs the per-layer reference twin for
    EVERY layer of a stacked cache."""
    from audio_processor_tpu.ops.pallas import decode_attention as da

    rng = np.random.default_rng(2)
    n_layers, b, tq, h, dh, tpad, valid = 3, 2, 1, 2, 64, 256, 190
    q = jnp.asarray(rng.normal(0, 1, (b, tq, h, dh)).astype(np.float32))
    k_vals = jnp.asarray(rng.integers(-7, 8, (n_layers, b, h, dh, tpad)), jnp.int8)
    v_vals = jnp.asarray(rng.integers(-7, 8, (n_layers, b, h, tpad, dh)), jnp.int8)
    k4, v4 = da.pack_int4_time(k_vals, v_vals)
    for layer in range(n_layers):
        ref = np.asarray(
            da.cross_attention_int4_reference(
                q, k4[layer], v4[layer], valid_len=valid
            )
        )
        out = np.asarray(
            da.cross_attention_int4_stacked(
                q, k4, v4, jnp.int32(layer), valid_len=valid, interpret=True
            )
        )
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_int4_cross_kv_decode_tracks_int8(hf_pair, mel):
    """kv_bits=4 end-to-end greedy decode stays close to the int8 path."""
    _, params = hf_pair
    st = decode.SpecialTokens.for_config(CFG)
    audio = model.encode(params, CFG, jnp.asarray(mel))
    kw = dict(sot_sequence=tuple(st.sot_sequence()), max_new_tokens=8,
              quantize_cross_kv=True)
    a = decode.greedy_decode(params, CFG, audio, **kw)
    b = decode.greedy_decode(params, CFG, audio, kv_bits=4, **kw)
    assert b.tokens.shape == a.tokens.shape
    # logit-level check on the prefill step: int4 attention error stays
    # bounded (random weights = worst case; real activations are smoother)
    cache8 = decode.init_cache(params, CFG, audio, max_len=4, quantize_cross_kv=True)
    cache4 = decode.init_cache(
        params, CFG, audio, max_len=4, quantize_cross_kv=True,
        kernel_layout=True, kv_bits=4,
    )
    toks = jnp.full((audio.shape[0], 1), st.sot, jnp.int32)
    l8, _ = decode.decoder_forward_cached(params, CFG, toks, cache8, jnp.int32(0))
    l4, _ = decode.decoder_forward_cached(
        params, CFG, toks, cache4, jnp.int32(0), kv_bits=4
    )
    rel = np.abs(np.asarray(l8) - np.asarray(l4)).max() / np.abs(np.asarray(l8)).max()
    assert rel < 0.15, rel
    # packed: two times per byte over the 128-padded time axis
    tpad = -(-CFG.n_audio_ctx // 128) * 128
    assert cache4.cross_k.shape[-1] * 2 == tpad
    assert cache4.cross_k.dtype == jnp.int8


def test_int8_self_kv_tracks_float(hf_pair, mel):
    """Per-token int8 self-KV cache: logits track the float-cache path."""
    _, params = hf_pair
    st = decode.SpecialTokens.for_config(CFG)
    audio = model.encode(params, CFG, jnp.asarray(mel))
    kw = dict(sot_sequence=tuple(st.sot_sequence()), max_new_tokens=8)
    a = decode.greedy_decode(params, CFG, audio, **kw)
    b = decode.greedy_decode(params, CFG, audio, quantize_self_kv=True, **kw)
    assert b.tokens.shape == a.tokens.shape
    agreement = (np.asarray(a.tokens) == np.asarray(b.tokens)).mean()
    assert agreement >= 0.7, agreement

    # cached-step logit parity: prefill 4 tokens through both cache kinds
    toks = jnp.asarray(
        np.random.default_rng(3).integers(0, CFG.n_vocab, (2, 4)), jnp.int32
    )
    cf = decode.init_cache(params, CFG, audio, max_len=8)
    cq = decode.init_cache(params, CFG, audio, max_len=8, quantize_self_kv=True)
    lf, _ = decode.decoder_forward_cached(params, CFG, toks, cf, jnp.int32(0))
    lq, _ = decode.decoder_forward_cached(
        params, CFG, toks, cq, jnp.int32(0), compute_dtype=jnp.float32
    )
    rel = np.abs(np.asarray(lf) - np.asarray(lq)).max() / np.abs(np.asarray(lf)).max()
    assert rel < 0.05, rel
    assert cq.self_k.dtype == jnp.int8
    assert cq.self_k_scale.shape == (CFG.n_text_layer, 2, 8, CFG.n_text_head, 1)


def test_beam_with_empty_prompt_rows_matches_plain_beam(hf_pair, mel):
    """Prompted beam with bare-sot rows must decode token-identically to
    the uniform-prompt beam path (the prompt machinery is invisible when
    there is nothing to prompt)."""
    _, params = hf_pair
    st = decode.SpecialTokens.for_config(CFG)
    audio = model.encode(params, CFG, jnp.asarray(mel))
    sot_seq = tuple(st.sot_sequence())
    kw = dict(sot_sequence=sot_seq, beam_size=2, max_new_tokens=6)
    plain = decode.beam_decode(params, CFG, audio, **kw)
    rows, lens = decode.build_prompt_rows(
        [[] for _ in range(audio.shape[0])], sot_seq, st, 4
    )
    prompted = decode.beam_decode(
        params, CFG, audio, prompt_tokens=jnp.asarray(rows),
        prompt_lens=jnp.asarray(lens), **kw,
    )
    np.testing.assert_array_equal(
        np.asarray(plain.tokens), np.asarray(prompted.tokens)
    )


def test_beam_prompt_changes_only_the_prompted_row(hf_pair, mel):
    _, params = hf_pair
    st = decode.SpecialTokens.for_config(CFG)
    audio = model.encode(params, CFG, jnp.asarray(mel))
    sot_seq = tuple(st.sot_sequence())
    kw = dict(sot_sequence=sot_seq, beam_size=2, max_new_tokens=6)
    rows0, lens0 = decode.build_prompt_rows(
        [[5, 6, 7]] + [[] for _ in range(audio.shape[0] - 1)], sot_seq, st, 4
    )
    a = decode.beam_decode(
        params, CFG, audio, prompt_tokens=jnp.asarray(rows0),
        prompt_lens=jnp.asarray(lens0), **kw,
    )
    plain = decode.beam_decode(params, CFG, audio, **kw)
    ta, tp = np.asarray(a.tokens), np.asarray(plain.tokens)
    # unprompted rows decode identically; the prompted row (random weights
    # are hyper-sensitive to context) must differ
    np.testing.assert_array_equal(ta[1:], tp[1:])
    assert not np.array_equal(ta[0], tp[0])


def test_build_prompt_rows_zero_ctx_tokens():
    """ctx_tokens=0 must drop ALL history ([-0:] would keep everything and
    overflow the allocated row) — the row degrades to the bare sot seq."""
    from audio_processor_tpu.models.whisper import decode as decode_lib

    st = decode_lib.SpecialTokens.for_config(CFG)
    sot_seq = tuple(st.sot_sequence(language=0))
    rows, lens = decode_lib.build_prompt_rows(
        [[5, 6, 7], []], sot_seq, st, ctx_tokens=0
    )
    assert rows.shape == (2, 1 + 0 + len(sot_seq))
    assert (rows[0, -len(sot_seq):] == np.asarray(sot_seq)).all()
    assert lens[0] == len(sot_seq) and lens[1] == len(sot_seq)


def test_beam_suppresses_blank_first_token():
    """openai's SuppressBlank applies under beam search too: with
    timestamp rules off (without_timestamps), the first sampled token can
    still never be ' ' or EOT."""
    from audio_processor_tpu.models.whisper import decode as decode_lib
    from audio_processor_tpu.models.whisper import model as model_lib

    st = decode_lib.SpecialTokens.for_config(CFG)
    blank_id = 7  # arbitrary stand-in for the ' ' token id
    for seed in range(3):
        params = model_lib.init_params(CFG, jax.random.PRNGKey(seed))
        rng = np.random.default_rng(seed)
        audio = jnp.asarray(
            rng.normal(0, 1, (2, CFG.n_audio_ctx, CFG.n_audio_state)),
            jnp.float32,
        )
        res = decode_lib.beam_decode(
            params, CFG, audio,
            sot_sequence=tuple(st.sot_sequence(language=0)),
            beam_size=2, max_new_tokens=4, use_timestamps=False,
            space_blank_id=blank_id,
        )
        first = np.asarray(res.tokens)[:, 0]
        assert (first != blank_id).all() and (first != st.eot).all()


def test_conv_bias_keeps_compute_dtype():
    """The f32 conv bias must not promote bf16 activations back to f32 —
    that silently ran the whole encoder in f32 under compute_dtype=bf16
    with f32-stored params."""
    params = model.init_params(CFG, jax.random.PRNGKey(0))
    mel = jnp.zeros((1, CFG.n_mels, 2 * CFG.n_audio_ctx), jnp.float32)
    states = model.encode(params, CFG, mel, compute_dtype=jnp.bfloat16)
    assert states.dtype == jnp.bfloat16


def test_beam_int8_self_kv_tracks_float(hf_pair, mel):
    """beam_decode honors quantize_self_kv (it used to silently ignore
    it): tokens track the float-cache beam, and the beam-switch cache
    reorder permutes the per-token scales together with the int8 values
    (mismatched scales would dequantise with another beam's magnitudes)."""
    _, params = hf_pair
    st = decode.SpecialTokens.for_config(CFG)
    audio = model.encode(params, CFG, jnp.asarray(mel))
    kw = dict(sot_sequence=tuple(st.sot_sequence()), beam_size=3,
              max_new_tokens=8)
    a = decode.beam_decode(params, CFG, audio, **kw)
    b = decode.beam_decode(params, CFG, audio, quantize_self_kv=True, **kw)
    assert b.tokens.shape == a.tokens.shape
    agreement = (np.asarray(a.tokens) == np.asarray(b.tokens)).mean()
    assert agreement >= 0.7, agreement
