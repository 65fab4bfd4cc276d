"""Word-timestamp parity against an independent torch+numpy port of
openai-whisper's find_alignment.

The reference gets word timestamps from whisper's word_timestamps=True
option (app/services/audio_processor.py:1076 — transcribe kwargs pass
through to whisper's DecodingTask).  Greedy/beam decode already have
token-exact torch oracles (test_parity_generate.py, test_parity_beam.py);
this gives the alignment chain the same treatment: the oracle re-implements
whisper/timing.py's published algorithm — per-alignment-head qk softmax
over the content-frame crop, torch.std_mean(unbiased=False) z-score over
the token axis, width-7 median filter, heads-mean, dtw_cpu with its exact
strict-inequality tie-breaking, jump-time word boundaries from
split_to_word_tokens, and merge_punctuations — over the SAME random-init
HF model our params are converted from, and align.word_timestamps must
match word-for-word: identical strings, identical start/end times,
matching probabilities.  Covers space-delimited AND spaceless (zh)
languages and batched rows of different lengths (the width/batch
power-of-two padding must be invisible).

Both sides consume one shared random audio_states tensor so the gate
isolates the alignment algorithm itself (encoder parity is pinned in
test_whisper_model.py and decode parity in test_parity_generate.py).
"""
import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from audio_processor_tpu.models.whisper import align, convert, decode
from audio_processor_tpu.models.whisper.config import WhisperConfig
from audio_processor_tpu.models.whisper.tokenizer import ByteTokenizer

ALIGNMENT_HEADS = ((0, 1), (1, 0), (1, 1))
CFG = WhisperConfig(
    name="alignparity",
    n_mels=80,
    n_audio_ctx=96,
    n_audio_state=64,
    n_audio_head=2,
    n_audio_layer=2,
    n_vocab=1024,
    n_text_ctx=96,
    n_text_state=64,
    n_text_head=2,
    n_text_layer=2,
    alignment_heads=ALIGNMENT_HEADS,
)
ST = decode.SpecialTokens.for_config(CFG)
SOT_SEQ = (ST.sot, 5, 7)  # multi-token prefix: exercises the row offset
TA = 48  # encoder positions fed to the aligner
TOK = ByteTokenizer()


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers import WhisperConfig as HFConfig, WhisperModel

    torch.manual_seed(23)
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
    # eager attention: sdpa cannot return the cross-attention weights the
    # oracle reads (HF returns None for cross_attentions under sdpa)
    hf_cfg._attn_implementation = "eager"
    hf = WhisperModel(hf_cfg).eval()
    params = convert.from_hf_state_dict(hf.state_dict(), CFG)
    return hf, params


# ---------------------------------------------------------------------------
# Oracle: independent numpy port of whisper/timing.py + tokenizer splitting
# ---------------------------------------------------------------------------

def _oracle_decode(ids):
    """decode_with_timestamps stand-in for the byte tokenizer: raw bytes
    for text ids, an explicit marker for the terminator (openai renders
    specials as <|...|> strings)."""
    ids = [int(i) for i in ids]
    text = TOK.decode([i for i in ids if i < 256])
    if any(i >= ST.eot for i in ids):
        text += "<|eot|>"
    return text


def _oracle_median_filter(x, width):
    """openai median_filter: reflect-pad running median along the last
    axis; identity when shape[-1] <= width // 2."""
    pad = width // 2
    if x.shape[-1] <= pad:
        return x
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    win = np.lib.stride_tricks.sliding_window_view(xp, width, axis=-1)
    return np.median(win, axis=-1)


def _oracle_dtw(x):
    """openai dtw_cpu + backtrace, verbatim semantics: float32 cost
    accumulation, diagonal/down only on STRICT improvement (ties fall
    through to the right step), boundary-overridden backtrace to (0,0).
    Returns (text_indices, time_indices) — the full path."""
    n, m = x.shape
    cost = np.full((n + 1, m + 1), np.inf, np.float32)
    trace = -np.ones((n + 1, m + 1), np.float32)
    cost[0, 0] = 0.0
    for j in range(1, m + 1):
        for i in range(1, n + 1):
            c0 = cost[i - 1, j - 1]
            c1 = cost[i - 1, j]
            c2 = cost[i, j - 1]
            if c0 < c1 and c0 < c2:
                c, t = c0, 0
            elif c1 < c0 and c1 < c2:
                c, t = c1, 1
            else:
                c, t = c2, 2
            cost[i, j] = x[i - 1, j - 1] + c
            trace[i, j] = t
    i, j = n, m
    trace[0, :] = 2
    trace[:, 0] = 1
    result = []
    while i > 0 or j > 0:
        result.append((i - 1, j - 1))
        if trace[i, j] == 0:
            i -= 1
            j -= 1
        elif trace[i, j] == 1:
            i -= 1
        else:
            j -= 1
    result = np.array(result)[::-1]
    return result[:, 0], result[:, 1]


def _oracle_split_tokens_on_unicode(tokens):
    """openai tokenizer.split_tokens_on_unicode."""
    decoded_full = _oracle_decode(tokens)
    replacement_char = "�"
    words, word_tokens = [], []
    current_tokens = []
    unicode_offset = 0
    for token in tokens:
        current_tokens.append(token)
        decoded = _oracle_decode(current_tokens)
        if replacement_char not in decoded or (
            unicode_offset + decoded.index(replacement_char)
            < len(decoded_full)
            and decoded_full[unicode_offset + decoded.index(replacement_char)]
            == replacement_char
        ):
            words.append(decoded)
            word_tokens.append(current_tokens)
            current_tokens = []
            unicode_offset += len(decoded)
    return words, word_tokens


def _oracle_split_to_word_tokens(tokens, language):
    """openai tokenizer.split_to_word_tokens."""
    import string

    if language in {"zh", "ja", "th", "lo", "my", "yue"}:
        return _oracle_split_tokens_on_unicode(tokens)
    subwords, subword_tokens_list = _oracle_split_tokens_on_unicode(tokens)
    words, word_tokens = [], []
    for subword, subword_tokens in zip(subwords, subword_tokens_list):
        special = subword_tokens[0] >= ST.eot
        with_space = subword.startswith(" ")
        punctuation = subword.strip() in string.punctuation
        if special or with_space or punctuation or len(words) == 0:
            words.append(subword)
            word_tokens.append(subword_tokens)
        else:
            words[-1] = words[-1] + subword
            word_tokens[-1].extend(subword_tokens)
    return words, word_tokens


def _oracle_merge_punctuations(alignment, prepended, appended):
    """openai timing.merge_punctuations, ported onto dicts."""
    i = len(alignment) - 2
    j = len(alignment) - 1
    while i >= 0:
        previous = alignment[i]
        following = alignment[j]
        if previous["word"].startswith(" ") and previous["word"].strip() in prepended:
            following["word"] = previous["word"] + following["word"]
            previous["word"] = ""
        else:
            j = i
        i -= 1
    i, j = 0, 1
    while j < len(alignment):
        previous = alignment[i]
        following = alignment[j]
        if not previous["word"].endswith(" ") and following["word"] in appended:
            previous["word"] = previous["word"] + following["word"]
            following["word"] = ""
        else:
            i = j
        j += 1
    return [w for w in alignment if w["word"]]


def _oracle_find_alignment(hf, audio_row, text, nf, language, offset_s):
    """whisper/timing.py find_alignment + add_word_timestamps boundary
    logic, over HF torch cross-attentions.  audio_row: (Ta, d) numpy."""
    import torch

    tokens = [*SOT_SEQ, ST.no_timestamps, *text, ST.eot]
    with torch.no_grad():
        out = hf.decoder(
            input_ids=torch.tensor([tokens], dtype=torch.long),
            encoder_hidden_states=torch.from_numpy(audio_row[None]),
            output_attentions=True,
        )
        logits = (
            out.last_hidden_state[0] @ hf.decoder.embed_tokens.weight.T
        ).numpy()
        # HF cross_attentions are softmax over the FULL key axis; openai
        # softmaxes the qk crop — identical after crop+renormalise
        cross = [a[0].numpy() for a in out.cross_attentions]  # L x (H,T,Ta)

    sampled_logits = logits[len(SOT_SEQ) :, : ST.eot]
    e = np.exp(sampled_logits - sampled_logits.max(-1, keepdims=True))
    token_probs = e / e.sum(-1, keepdims=True)
    text_token_probs = token_probs[np.arange(len(text)), text]

    weights = np.stack(
        [cross[_l][_h] for _l, _h in ALIGNMENT_HEADS]
    ).astype(np.float64)  # (K, T, Ta)
    weights = weights[:, :, :nf]
    weights = weights / weights.sum(-1, keepdims=True)
    mean = weights.mean(-2, keepdims=True)
    std = weights.std(-2, keepdims=True)  # unbiased=False
    weights = (weights - mean) / std
    weights = _oracle_median_filter(weights, 7)

    matrix = weights.mean(axis=0)[len(SOT_SEQ) : -1]
    text_indices, time_indices = _oracle_dtw(-matrix.astype(np.float32))

    words, word_tokens = _oracle_split_to_word_tokens(
        list(text) + [ST.eot], language
    )
    word_boundaries = np.pad(
        np.cumsum([len(t) for t in word_tokens[:-1]]), (1, 0)
    )
    jumps = np.pad(
        np.diff(text_indices), (1, 0), constant_values=1
    ).astype(bool)
    jump_times = time_indices[jumps] * align.AUDIO_FRAME_S
    start_times = jump_times[word_boundaries[:-1]]
    end_times = jump_times[word_boundaries[1:]]
    word_probabilities = [
        float(np.mean(text_token_probs[i:j]))
        for i, j in zip(word_boundaries[:-1], word_boundaries[1:])
    ]
    alignment = [
        {
            "word": word,
            "start": round(offset_s + start, 3),
            "end": round(offset_s + end, 3),
            "probability": prob,
        }
        for word, start, end, prob in zip(
            words, start_times, end_times, word_probabilities
        )
    ]
    return _oracle_merge_punctuations(
        alignment, align.PREPEND_PUNCTUATIONS, align.APPEND_PUNCTUATIONS
    )


# ---------------------------------------------------------------------------
# The gates
# ---------------------------------------------------------------------------

def _run_both(hf, params, texts, language, offsets, content_frames, rng):
    b = len(texts)
    audio = rng.normal(0, 1, (b, TA, CFG.n_audio_state)).astype(np.float32)
    width = max(len(t) for t in texts) + 1
    rows = np.full((b, width), ST.eot, np.int64)
    for i, t in enumerate(texts):
        rows[i, : len(t)] = t
    ours = align.word_timestamps(
        params,
        CFG,
        jnp.asarray(audio),
        rows,
        ST,
        TOK.decode,
        np.asarray(offsets, np.float64),
        with_probabilities=True,
        language=language,
        sot_sequence=SOT_SEQ,
        content_frames=np.asarray(content_frames, np.int64),
    )
    oracle = [
        _oracle_find_alignment(
            hf, audio[i], texts[i], int(content_frames[i]), language,
            float(offsets[i]),
        )
        if texts[i]
        else []
        for i in range(b)
    ]
    return ours, oracle


def _assert_word_parity(ours, oracle):
    assert len(ours) == len(oracle)
    for row_ours, row_ref in zip(ours, oracle):
        assert [w["word"] for w in row_ours] == [w["word"] for w in row_ref]
        for w_ours, w_ref in zip(row_ours, row_ref):
            assert w_ours["start"] == pytest.approx(w_ref["start"], abs=1e-9), (
                w_ours,
                w_ref,
            )
            assert w_ours["end"] == pytest.approx(w_ref["end"], abs=1e-9)
            assert w_ours["probability"] == pytest.approx(
                w_ref["probability"], abs=2e-4
            )


def test_word_timestamps_match_openai_port_english(hf_pair, rng):
    """Space-delimited path: punctuation-heavy batched rows of different
    lengths (power-of-two width/batch padding must be invisible), per-row
    content-frame crops, nonzero chunk offsets."""
    hf, params = hf_pair
    texts = [
        TOK.encode(' Hello, world! "Quoted" (parens) done.'),
        TOK.encode(" a much longer second row - with 'marks' and: stops."),
        TOK.encode(" tail"),
    ]
    ours, oracle = _run_both(
        hf, params, texts, None, [0.0, 30.0, 57.5], [TA, 40, 33], rng
    )
    _assert_word_parity(ours, oracle)


def test_word_timestamps_match_openai_port_cjk(hf_pair, rng):
    """Spaceless (zh) path: every codepoint is a word, multi-byte UTF-8
    splits across byte tokens (U+FFFD grouping), fullwidth punctuation
    merges per append/prepend rules."""
    hf, params = hf_pair
    texts = [
        TOK.encode("你好，世界。谢谢"),
        TOK.encode("（测试）对齐！"),
    ]
    ours, oracle = _run_both(
        hf, params, texts, "zh", [12.0, 0.0], [44, TA], rng
    )
    _assert_word_parity(ours, oracle)


def test_word_timestamps_empty_row_in_batch(hf_pair, rng):
    """An all-EOT row rides the batch without disturbing its neighbours."""
    hf, params = hf_pair
    texts = [TOK.encode(" one two"), []]
    ours, oracle = _run_both(
        hf, params, texts, None, [0.0, 0.0], [TA, TA], rng
    )
    assert ours[1] == []
    _assert_word_parity(ours, oracle)


def test_dtw_tie_breaking_matches_openai_on_plateaus():
    """Quantised cost surfaces force ties; the strict-inequality fallthrough
    to the right step must match openai's dtw_cpu exactly — on the python
    DP and (when built) the native C++ kernel, which dtw_path_from_cost
    dispatches to first."""
    rng = np.random.default_rng(3)
    for trial in range(8):
        cost = np.round(
            rng.uniform(0, 1, (9, 25)) * 4
        ).astype(np.float32) / 4.0  # heavy ties
        text_idx, time_idx = _oracle_dtw(cost)
        jumps = np.pad(np.diff(text_idx), (1, 0), constant_values=1).astype(
            bool
        )
        expect_starts = time_idx[jumps]
        got = align.dtw_path_from_cost(cost)
        np.testing.assert_array_equal(got, expect_starts, err_msg=f"trial {trial}")


def test_native_dtw_matches_python_dp():
    """Native kernel vs the pure-python DP on tie-heavy inputs (skipped if
    the .so isn't built)."""
    from audio_processor_tpu.native import audio_io

    if not audio_io.available():
        pytest.skip("native audio_io not built")
    rng = np.random.default_rng(11)
    for _ in range(5):
        cost = np.round(rng.uniform(0, 1, (12, 30)) * 3).astype(np.float32) / 3.0
        native = audio_io.dtw(cost)
        # force the python path by shadowing availability
        t, ta = cost.shape
        acc = np.full((t + 1, ta + 1), np.inf, np.float32)
        acc[0, 0] = 0.0
        trace = np.zeros((t + 1, ta + 1), np.int8)
        for i in range(1, t + 1):
            row = cost[i - 1]
            for j in range(1, ta + 1):
                c0, c1, c2 = acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1]
                if c0 < c1 and c0 < c2:
                    best, step = c0, 0
                elif c1 < c0 and c1 < c2:
                    best, step = c1, 1
                else:
                    best, step = c2, 2
                acc[i, j] = row[j - 1] + best
                trace[i, j] = step
        i, j = t, ta
        starts = np.zeros(t, np.int64)
        while i > 0 and j > 0:
            starts[i - 1] = j - 1
            step = trace[i, j]
            if step == 0:
                i, j = i - 1, j - 1
            elif step == 1:
                i -= 1
            else:
                j -= 1
        np.testing.assert_array_equal(native, starts)


def test_per_head_maps_match_all_head_pass(hf_pair, rng):
    """alignment_head_maps' scatter-written (K, B, T, Ta) stack must equal
    the corresponding slices of the calibration all-maps pass — pins the
    per-layer slot/head indexing (incl. layers contributing 0 or 2 heads)."""
    _, params = hf_pair
    audio = jnp.asarray(
        rng.normal(0, 1, (2, TA, CFG.n_audio_state)), jnp.float32
    )
    tokens = jnp.asarray(rng.integers(0, 200, (2, 9)), jnp.int32)
    maps, _ = align.alignment_head_maps(params, CFG, tokens, audio)
    all_maps = np.asarray(
        align.all_head_attention_maps(
            params, dataclasses.replace(CFG, alignment_heads=None), tokens,
            audio,
        )
    )  # (L, B, H, T, Ta)
    for k, (l, h) in enumerate(ALIGNMENT_HEADS):
        np.testing.assert_allclose(
            np.asarray(maps)[k], all_maps[l, :, h], atol=1e-5,
            err_msg=f"head slot {k} = layer {l} head {h}",
        )
