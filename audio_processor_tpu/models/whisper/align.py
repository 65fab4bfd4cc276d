"""Word-level timestamps via cross-attention alignment + DTW.

openai-whisper's word_timestamps=True recipe, rebuilt for this stack: run
the decoder teacher-forced over the decoded tokens while accumulating a
weighted cross-attention map — over the checkpoint's ALIGNMENT HEADS when
cfg.alignment_heads is set (openai ships a per-checkpoint (layer, head)
mask; convert.load_params restores it from the .npz sidecar and
calibrate_alignment_heads below measures one for any checkpoint), else
the MEAN over the last half of the layers (the standard fallback).  The
accumulator stays (B, T_text, T_audio) — small — instead of
materialising all L*H maps; the monotonic token->frame path comes from
dynamic time warping on the host, and token spans split into words.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .config import WhisperConfig
from .decode import SpecialTokens
from .model import (
    Params,
    _merge_heads,
    _split_heads,
    layer_norm,
    linear,
    mlp,
    self_attention,
)

AUDIO_FRAME_S = 0.02  # one encoder position = 20 ms

# openai-whisper's word-merge defaults (whisper/transcribe.py
# prepend_punctuations / append_punctuations): opening quotes/brackets
# attach to the FOLLOWING word, closing marks to the PRECEDING one
PREPEND_PUNCTUATIONS = "\"'“¿([{-"
APPEND_PUNCTUATIONS = "\"'.。,，!！?？:：”)]}、"
# languages written without spaces: words = unicode codepoints, exactly
# openai's split_tokens_on_unicode path (whisper/tokenizer.py
# split_to_word_tokens) — critical for the reference's Chinese meetings
# (zh prompts throughout app/services/audio_processor.py)
_SPACELESS_LANGUAGES = frozenset({"zh", "ja", "th", "lo", "my", "yue"})
_ASCII_PUNCTUATION = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"


def _split_tokens_on_unicode(
    toks: list[int], decode_text
) -> tuple[list[str], list[list[int]]]:
    """Group BPE tokens into complete unicode units.

    A multi-byte codepoint (every CJK character) spans several byte-level
    BPE tokens; decoding a partial group yields U+FFFD.  Tokens accumulate
    until the decoded string carries no replacement char — unless the FULL
    decode really contains U+FFFD at that offset (openai's
    split_tokens_on_unicode disambiguation).  Returns (subwords,
    index-groups into ``toks``)."""
    decoded_full = decode_text(toks)
    rc = "�"
    subwords: list[str] = []
    sub_idx: list[list[int]] = []
    cur: list[int] = []
    cur_idx: list[int] = []
    unicode_offset = 0
    for k, tok in enumerate(toks):
        cur.append(tok)
        cur_idx.append(k)
        decoded = decode_text(cur)
        complete = rc not in decoded
        if not complete:
            at = unicode_offset + decoded.index(rc)
            complete = at < len(decoded_full) and decoded_full[at] == rc
        if complete:
            subwords.append(decoded)
            sub_idx.append(cur_idx)
            cur, cur_idx = [], []
            unicode_offset += len(decoded)
    return subwords, sub_idx


def _split_words(
    toks: list[int], decode_text, language: str | None
) -> tuple[list[str], list[list[int]]]:
    """openai's split_to_word_tokens: unicode units for spaceless
    languages, else space/punctuation-boundary grouping."""
    subwords, sub_idx = _split_tokens_on_unicode(toks, decode_text)
    if language in _SPACELESS_LANGUAGES:
        return subwords, sub_idx
    words: list[str] = []
    word_idx: list[list[int]] = []
    for sw, si in zip(subwords, sub_idx):
        if not words or sw.startswith(" ") or sw.strip() in _ASCII_PUNCTUATION:
            words.append(sw)
            word_idx.append(list(si))
        else:
            words[-1] += sw
            word_idx[-1].extend(si)
    return words, word_idx


def _merge_punctuations(
    words: list[dict], prepended: str, appended: str
) -> list[dict]:
    """openai's merge_punctuations (whisper/timing.py): opening marks fold
    into the next word, closing marks into the previous one.  The base
    word keeps its own start/end/probability (the punctuation's timing is
    dropped) — identical to openai, which merges only word+tokens."""
    i, j = len(words) - 2, len(words) - 1
    while i >= 0:
        prev, following = words[i], words[j]
        if prev["word"].startswith(" ") and prev["word"].strip() in prepended:
            following["word"] = prev["word"] + following["word"]
            prev["word"] = ""
        else:
            j = i
        i -= 1
    i, j = 0, 1
    while j < len(words):
        prev, following = words[i], words[j]
        if not prev["word"].endswith(" ") and following["word"] in appended:
            prev["word"] = prev["word"] + following["word"]
            following["word"] = ""
        else:
            i = j
        j += 1
    return [w for w in words if w["word"]]


def _teacher_forced_scan(
    params: Params,
    cfg: WhisperConfig,
    tokens: jnp.ndarray,  # (B, T)
    audio_states: jnp.ndarray,  # (B, Ta, d)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shared teacher-forced decoder pass.

    Returns (final hidden states (B, T, d), weighted cross-attention
    accumulator (B, T, Ta)).  cfg.alignment_heads set -> mean over exactly
    those (layer, head) pairs (openai's per-checkpoint alignment mask);
    None -> mean over ALL heads of the last half of the decoder layers
    (the standard fallback)."""
    p = params["decoder"]
    b, t = tokens.shape
    x = p["token_emb"][tokens].astype(jnp.float32)
    x = x + p["pos_emb"][:t].astype(jnp.float32)
    causal = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)
    audio_states = audio_states.astype(jnp.float32)

    # static (L, H) per-head weights, normalised to sum to 1
    w = np.zeros((cfg.n_text_layer, cfg.n_text_head), np.float32)
    if cfg.alignment_heads:
        for layer, head in cfg.alignment_heads:
            w[layer, head] = 1.0
    else:
        w[cfg.n_text_layer // 2 :, :] = 1.0
    head_w = jnp.asarray(w / max(w.sum(), 1.0))

    def block_fn(carry, scanned):
        x, acc = carry
        bp, w_l = scanned  # w_l: (H,) this layer's head weights
        x, probs = _decoder_block(bp, cfg, x, audio_states, causal)
        return (x, acc + jnp.einsum("h,bhqk->bqk", w_l, probs)), None

    acc0 = jnp.zeros((b, t, audio_states.shape[1]), jnp.float32)
    (x, acc), _ = jax.lax.scan(block_fn, (x, acc0), (p["blocks"], head_w))
    return x, acc


def _decoder_block(bp, cfg, x, audio_states, causal):
    """One teacher-forced decoder block -> (x_next, cross-attention probs
    (B, H, T, Ta)).  The ONE definition both the serving accumulator scan
    and the calibration all-maps scan run — calibration must measure the
    exact maps word_timestamps serves."""
    # the ONE self-attention definition (model.self_attention) — a local
    # clone here would silently drift when model.py's attention changes
    x = x + self_attention(
        bp["attn"], layer_norm(bp["attn_ln"], x), cfg.n_text_head, causal
    )

    xa = layer_norm(bp["cross_attn_ln"], x)
    qx = _split_heads(linear(bp["cross_attn"]["q"], xa), cfg.n_text_head)
    kx = _split_heads(linear(bp["cross_attn"]["k"], audio_states), cfg.n_text_head)
    vx = _split_heads(linear(bp["cross_attn"]["v"], audio_states), cfg.n_text_head)
    dh = qx.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", qx, kx) / math.sqrt(dh)
    probs = jax.nn.softmax(scores, axis=-1)  # (B, H, T, Ta)
    ox = jnp.einsum("bhqk,bkhd->bqhd", probs, vx)
    x = x + linear(bp["cross_attn"]["out"], _merge_heads(ox))
    x = x + mlp(bp, layer_norm(bp["mlp_ln"], x))
    return x, probs


@partial(jax.jit, static_argnames=("cfg",))
def cross_attention_map(
    params: Params,
    cfg: WhisperConfig,
    tokens: jnp.ndarray,  # (B, T)
    audio_states: jnp.ndarray,  # (B, Ta, d)
) -> jnp.ndarray:
    """Teacher-forced pass -> weighted cross-attention (B, T, Ta)."""
    _, acc = _teacher_forced_scan(params, cfg, tokens, audio_states)
    return acc


@partial(jax.jit, static_argnames=("cfg", "vocab_cap"))
def cross_attention_map_and_probs(
    params: Params,
    cfg: WhisperConfig,
    tokens: jnp.ndarray,  # (B, T)
    audio_states: jnp.ndarray,  # (B, Ta, d)
    vocab_cap: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cross_attention_map plus per-token probabilities (B, T).

    probs[:, i] = P(tokens[i] | tokens[:i], audio) from the same teacher-
    forced pass (position 0 gets 1.0 — no prefix).  vocab_cap restricts the
    softmax to the first ``vocab_cap`` logits — openai's find_alignment
    normalises over the TEXT vocabulary only (``logits[..., :eot]``), which
    word_timestamps passes here.  These feed openai's word_anomaly_score
    for hallucination_silence_threshold.
    """
    p = params["decoder"]
    x, acc = _teacher_forced_scan(params, cfg, tokens, audio_states)
    probs = _token_probs_from_hidden(p, x, tokens, vocab_cap)
    return acc, probs


def _token_probs_from_hidden(p, x, tokens, vocab_cap):
    """Final decoder hidden states -> per-position next-token probabilities
    (B, T): probs[:, i] = P(tokens[i] | tokens[:i], audio); position 0 gets
    1.0 (no prefix).  Shared by the pooled and per-alignment-head passes."""
    xn = layer_norm(p["ln"], x)
    emb = p["token_emb"].astype(jnp.float32)  # (V, d)
    if vocab_cap is not None:
        emb = emb[:vocab_cap]
    b = tokens.shape[0]

    # scan position-by-position: the full (B, T, V) logits tensor would be
    # ~6 GB at slab 128 / whisper vocab; one (B, V) slice at a time is
    # ~26 MB and XLA pipelines the scanned matmuls
    def step(_, inp):
        h, tok = inp  # h: (B, d) hidden at pos i; tok: (B,) token at i+1
        lp = jax.nn.log_softmax(h @ emb.T, axis=-1)
        idx = jnp.minimum(tok, emb.shape[0] - 1)  # pad rows: unused values
        return None, jnp.take_along_axis(
            lp, idx[:, None].astype(jnp.int32), axis=-1
        )[:, 0]
    _, nxt = jax.lax.scan(
        step, None,
        (jnp.swapaxes(xn[:, :-1], 0, 1), jnp.swapaxes(tokens[:, 1:], 0, 1)),
    )  # (T-1, B)
    return jnp.concatenate(
        [jnp.ones((b, 1), jnp.float32), jnp.exp(nxt).T], axis=1
    )


@partial(jax.jit, static_argnames=("cfg", "vocab_cap", "want_probs"))
def alignment_head_maps(
    params: Params,
    cfg: WhisperConfig,
    tokens: jnp.ndarray,  # (B, T)
    audio_states: jnp.ndarray,  # (B, Ta, d)
    vocab_cap: int | None = None,
    want_probs: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray | None]:
    """Teacher-forced pass -> PER-alignment-head cross-attention maps
    (K, B, T, Ta) in cfg.alignment_heads order, plus optional per-token
    probabilities (B, T).

    openai's find_alignment normalises (z-score) and median-filters EACH
    alignment head's map separately and only then means across heads
    (whisper/timing.py) — a nonlinear per-head chain the pooled
    cross_attention_map accumulator cannot reproduce.  This pass keeps the
    K selected maps separate (K is small — openai ships 6-10 pairs per
    checkpoint) so word_timestamps can run openai's exact order; layers
    scan with a (K+1)-slot carry where each layer scatter-writes its
    selected heads (slot K is a dummy for layers with fewer selections).
    """
    if not cfg.alignment_heads:
        raise ValueError("alignment_head_maps requires cfg.alignment_heads")
    p = params["decoder"]
    b, t = tokens.shape
    x = p["token_emb"][tokens].astype(jnp.float32)
    x = x + p["pos_emb"][:t].astype(jnp.float32)
    causal = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)
    audio_states = audio_states.astype(jnp.float32)

    heads = tuple(cfg.alignment_heads)
    k_sel = len(heads)
    per_layer: list[list[tuple[int, int]]] = [
        [(slot, h) for slot, (l, h) in enumerate(heads) if l == li]
        for li in range(cfg.n_text_layer)
    ]
    kmax = max((len(v) for v in per_layer), default=0) or 1
    slot_arr = np.full((cfg.n_text_layer, kmax), k_sel, np.int32)  # K = dummy
    head_arr = np.zeros((cfg.n_text_layer, kmax), np.int32)
    for li, v in enumerate(per_layer):
        for jj, (slot, h) in enumerate(v):
            slot_arr[li, jj] = slot
            head_arr[li, jj] = h

    def block_fn(carry, scanned):
        x, maps = carry
        bp, slots, hs = scanned
        x, probs = _decoder_block(bp, cfg, x, audio_states, causal)
        for jj in range(kmax):  # static unroll (kmax is tiny)
            sel = jax.lax.dynamic_index_in_dim(
                probs, hs[jj], axis=1, keepdims=False
            )  # (B, T, Ta)
            maps = jax.lax.dynamic_update_slice(
                maps, sel[None], (slots[jj], 0, 0, 0)
            )
        return (x, maps), None

    maps0 = jnp.zeros(
        (k_sel + 1, b, t, audio_states.shape[1]), jnp.float32
    )
    (x, maps), _ = jax.lax.scan(
        block_fn,
        (x, maps0),
        (p["blocks"], jnp.asarray(slot_arr), jnp.asarray(head_arr)),
    )
    maps = maps[:k_sel]
    if not want_probs:
        return maps, None
    return maps, _token_probs_from_hidden(p, x, tokens, vocab_cap)


@partial(jax.jit, static_argnames=("cfg",))
def all_head_attention_maps(
    params: Params,
    cfg: WhisperConfig,
    tokens: jnp.ndarray,  # (B, T)
    audio_states: jnp.ndarray,  # (B, Ta, d)
) -> jnp.ndarray:
    """Teacher-forced pass -> EVERY head's cross-attention (L, B, H, T, Ta).

    Calibration-only (materialises all maps — use small B/T); the serving
    path uses cross_attention_map's running accumulator instead."""
    p = params["decoder"]
    b, t = tokens.shape
    x = p["token_emb"][tokens].astype(jnp.float32)
    x = x + p["pos_emb"][:t].astype(jnp.float32)
    causal = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)
    audio_states = audio_states.astype(jnp.float32)

    def block_fn(x, bp):
        return _decoder_block(bp, cfg, x, audio_states, causal)

    _, maps = jax.lax.scan(block_fn, x, p["blocks"])
    return maps  # (L, B, H, T, Ta)


def calibrate_alignment_heads(
    params: Params,
    cfg: WhisperConfig,
    audio_states: jnp.ndarray,  # (B, Ta, d) calibration utterance(s)
    token_rows: np.ndarray,  # (B, T) decoded text tokens, EOT-padded
    st: SpecialTokens,
    top_k: int = 6,
    sot_sequence: tuple[int, ...] | None = None,
) -> tuple[tuple[int, int], ...]:
    """Measure which (layer, head) pairs track the audio timeline.

    openai-whisper ships hand-derived per-checkpoint alignment-head masks;
    this derives an equivalent mask for ANY checkpoint from one decoded
    calibration utterance: each head's map is scored by the mean
    probability mass it places along its own monotonic DTW path (diffuse
    or non-monotonic heads score low), averaged over batch rows, and the
    top_k heads win.  Feed the result to dataclasses.replace(cfg,
    alignment_heads=...) or convert.save_params for persistence.

    The teacher-forced rows are rebuilt as ``[*sot_sequence,
    <|notimestamps|>, *text, <|eot|>]`` — the EXACT layout
    word_timestamps serves — so the measured maps are the served maps
    (raw decode rows carry timestamps and no prefix, which would shift
    every position and score different attention than serving uses).
    Pass the generation ``sot_sequence`` for full parity.
    """
    prefix = list(sot_sequence) if sot_sequence else [st.sot]
    prefix.append(st.no_timestamps)
    texts = [
        [int(tok) for tok in row if tok < st.eot] for row in token_rows
    ]
    b = len(texts)
    width = len(prefix) + max((len(x) for x in texts), default=0) + 1
    forced = np.full((b, width), st.eot, np.int64)
    for i, text in enumerate(texts):
        forced[i, : len(prefix)] = prefix
        forced[i, len(prefix) : len(prefix) + len(text)] = text
    maps = np.asarray(
        all_head_attention_maps(
            params, cfg, jnp.asarray(forced, jnp.int32), audio_states
        )
    )  # (L, B, H, T, Ta)
    n_layers, _, n_heads = maps.shape[:3]
    lo = len(prefix)
    scores = np.zeros((n_layers, n_heads), np.float64)
    counts = np.zeros((n_layers, n_heads), np.int64)
    for row_i in range(b):
        text_pos = list(range(lo, lo + len(texts[row_i])))
        if len(text_pos) < 2:
            continue
        for l in range(n_layers):
            for h in range(n_heads):
                m = maps[l, row_i, h][text_pos]  # (n_text, Ta)
                m = m / np.maximum(m.sum(-1, keepdims=True), 1e-9)
                path = dtw_path(m)
                scores[l, h] += float(
                    np.mean(m[np.arange(len(text_pos)), path])
                )
                counts[l, h] += 1
    scores = scores / np.maximum(counts, 1)
    flat = np.argsort(scores, axis=None)[::-1][:top_k]
    pairs = sorted((int(i // n_heads), int(i % n_heads)) for i in flat)
    return tuple(pairs)


def _median_filter(x: np.ndarray, width: int) -> np.ndarray:
    """openai's median_filter (whisper/timing.py): odd-width running median
    along the last axis with reflect padding.  Identity when the axis is
    too short to reflect-pad — openai's early-return is
    ``shape[-1] <= pad_width`` (= width // 2), NOT <= width: a 4-7 frame
    micro-chunk still gets filtered."""
    if width <= 1 or x.shape[-1] <= width // 2:
        return x
    pad = width // 2
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    win = np.lib.stride_tricks.sliding_window_view(xp, width, axis=-1)
    return np.median(win, axis=-1)


def dtw_path(matrix: np.ndarray) -> np.ndarray:
    """Monotonic alignment through a (T_text, T_audio) similarity matrix
    of attention weights: DTW on the -log cost surface."""
    return dtw_path_from_cost(-np.log(np.maximum(matrix, 1e-9)))


def dtw_path_from_cost(cost: np.ndarray) -> np.ndarray:
    """Monotonic alignment through a (T_text, T_audio) COST matrix.

    Returns for each text row the audio column where it starts (the
    standard backtrace of whisper's DTW; openai feeds the negated
    normalised attention matrix directly, word_timestamps below does the
    same).  Uses the native C++ kernel when built (the python DP is
    ~1 s/row on this host); both produce identical paths.

    The decision rule and accumulator dtype replicate openai-whisper's
    dtw_cpu (whisper/timing.py) bit-exactly: float32 accumulation,
    diagonal/down steps only when STRICTLY cheaper than both alternatives,
    otherwise a right step — openai's comparison chain falls through to
    the right-step branch on ties, and word boundaries inherit that exact
    path shape (tests/test_parity_align.py pins it against a numpy port
    of dtw_cpu)."""
    try:
        from ...native import audio_io

        if audio_io.available():
            return audio_io.dtw(cost)  # wrapper casts to float32
    except Exception:  # noqa: BLE001 — fall back to python DP
        pass
    t, ta = cost.shape
    cost = cost.astype(np.float32)
    acc = np.full((t + 1, ta + 1), np.inf, np.float32)
    acc[0, 0] = 0.0
    trace = np.zeros((t + 1, ta + 1), np.int8)
    for i in range(1, t + 1):
        row = cost[i - 1]
        for j in range(1, ta + 1):
            c0 = acc[i - 1, j - 1]  # diagonal
            c1 = acc[i - 1, j]  # down (next token, same frame)
            c2 = acc[i, j - 1]  # right (same token, next frame)
            if c0 < c1 and c0 < c2:
                best, step = c0, 0
            elif c1 < c0 and c1 < c2:
                best, step = c1, 1
            else:
                best, step = c2, 2
            acc[i, j] = row[j - 1] + best
            trace[i, j] = step
    # backtrace
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
    return starts


def word_timestamps(
    params: Params,
    cfg: WhisperConfig,
    audio_states: jnp.ndarray,  # (B, Ta, d)
    token_rows: np.ndarray,  # (B, T) decoded text tokens, EOT-padded
    st: SpecialTokens,
    decode_text,
    chunk_offsets_s: np.ndarray,
    with_probabilities: bool = False,
    language: str | None = None,
    prepend_punctuations: str = PREPEND_PUNCTUATIONS,
    append_punctuations: str = APPEND_PUNCTUATIONS,
    sot_sequence: tuple[int, ...] | None = None,
    content_frames: np.ndarray | None = None,
) -> list[list[dict]]:
    """Per chunk: [{"word", "start", "end"}] in the global timeline.

    openai's find_alignment recipe (whisper/timing.py): the decoder is
    teacher-forced over ``[*sot_sequence, <|notimestamps|>, *text,
    <|eot|>]`` (same positional encodings openai aligns under), the
    attention matrix is cropped to the chunk's REAL content frames
    (``content_frames`` per row — openai's num_frames//2 crop) and row-
    renormalised (softmax over the crop), z-scored per frame column
    (openai's std/mean over the token axis), median-filtered (width 7)
    along frames, and DTW'd on the negated matrix cropped to openai's
    row window ``matrix[len(sot_sequence):-1]`` — rows [<|notimestamps|>,
    *text], i.e. row k is the position PREDICTING text[k].  The final row
    (the one predicting <|eot|>) rides the DTW so the LAST word's end
    comes from the alignment (openai's jump_times at the final boundary),
    not a fixed tail.

    When ``cfg.alignment_heads`` is set (every converted openai
    checkpoint), the chain is openai's EXACTLY: each selected head's map
    is z-scored and median-filtered separately and the heads are averaged
    last (alignment_head_maps) — tests/test_parity_align.py pins
    word-for-word identity against an independent torch+numpy port of
    find_alignment.  Only the calibration fallback (alignment_heads=None,
    no openai equivalent) pools the head mean on-device first (O(B·T·Ta)
    memory) and normalises the pooled matrix.

    Word boundaries follow openai-whisper exactly: tokens group into
    complete unicode units, then into space-delimited words — except for
    spaceless languages (zh/ja/th/lo/my/yue, selected via ``language``),
    where each codepoint is a word — and punctuation merges into its
    neighbour per prepend/append_punctuations.  As in openai, the emitted
    ``word`` text keeps its leading space for space-delimited languages.

    with_probabilities=True adds "probability" (mean per-token probability
    from the same teacher-forced pass, normalised over the text vocabulary
    exactly as openai's ``logits[..., :eot]``) — the signal openai's
    hallucination_silence_threshold anomaly score consumes."""
    b, t = token_rows.shape
    if t == 0:
        return [[] for _ in range(b)]
    prefix = list(sot_sequence) if sot_sequence else [st.sot]
    prefix.append(st.no_timestamps)
    texts = [
        [int(tok) for tok in token_rows[i] if tok < st.eot] for i in range(b)
    ]
    width = len(prefix) + max((len(x) for x in texts), default=0) + 1
    # bucket the token width too: width is a traced shape of the jitted
    # teacher-forced scan, and every distinct max text length would
    # otherwise recompile the program once per slab.  Power-of-two bucket
    # capped at the decoder context (extra rows are EOT under the causal
    # mask — rows at/below the terminator are unaffected).
    bucket = 1 << max(0, width - 1).bit_length()
    if cfg.n_text_ctx:
        bucket = min(bucket, cfg.n_text_ctx)
    width = max(width, bucket)
    forced = np.full((b, width), st.eot, np.int64)
    for i, text in enumerate(texts):
        forced[i, : len(prefix)] = prefix
        forced[i, len(prefix) : len(prefix) + len(text)] = text
        # position len(prefix)+len(text) stays eot: the terminator row
    # pad the batch to a power-of-two bucket (EOT rows + zero states) so
    # arbitrary tail/patch-slab sizes reuse one compiled program instead
    # of compiling the full teacher-forced scan per distinct count
    b_pad = 1 << max(0, (b - 1)).bit_length()
    if b_pad != b:
        forced = np.concatenate(
            [forced, np.full((b_pad - b, width), st.eot, forced.dtype)],
            axis=0,
        )
        audio_states = jnp.concatenate(
            [audio_states,
             jnp.zeros((b_pad - b,) + audio_states.shape[1:],
                       audio_states.dtype)], axis=0,
        )
    tok_dev = jnp.asarray(forced, jnp.int32)
    per_head = bool(cfg.alignment_heads)
    if per_head:
        # openai's exact order: each alignment head is z-scored and
        # median-filtered separately, heads mean LAST (see
        # alignment_head_maps) — K separate maps come back to the host
        maps, probs_dev = alignment_head_maps(
            params, cfg, tok_dev, audio_states,
            vocab_cap=st.eot, want_probs=with_probabilities,
        )
        attn = np.asarray(maps)[:, :b]  # (K, b, T, Ta)
        tok_probs = (
            np.asarray(probs_dev)[:b] if with_probabilities else None
        )
    elif with_probabilities:
        attn, tok_probs = cross_attention_map_and_probs(
            params, cfg, tok_dev, audio_states, vocab_cap=st.eot
        )
        attn, tok_probs = np.asarray(attn)[:b], np.asarray(tok_probs)[:b]
    else:
        attn = np.asarray(
            cross_attention_map(params, cfg, tok_dev, audio_states)
        )[:b]
        tok_probs = None
    n_audio = attn.shape[-1]
    out: list[list[dict]] = []
    for row_i in range(b):
        text = texts[row_i]
        if not text:
            out.append([])
            continue
        # text rows + the terminator eot row (its aligned frame is the
        # last word's end boundary, exactly openai's final jump time)
        lo = len(prefix)
        nf = n_audio
        if content_frames is not None:
            nf = max(2, min(n_audio, int(content_frames[row_i])))
        # per-frame z-score statistics come from the FULL fed token axis
        # (prefix rows included, exactly openai's std_mean BEFORE its row
        # crop — the prefix rows' early-frame mass shifts the per-column
        # stats).  Width-bucket EOT padding rows stay out of the stats.
        if per_head:
            w = attn[:, row_i, : lo + len(text) + 1, :nf]  # (K, rows, nf)
        else:
            w = attn[row_i][None, : lo + len(text) + 1, :nf]
        # crop + renormalise == softmax over the content frames only
        w = w / np.maximum(w.sum(-1, keepdims=True), 1e-9)
        mean = w.mean(axis=-2, keepdims=True)
        # openai's torch.std_mean(unbiased=False); the 1e-9 clamp guards a
        # constant column (openai would emit nan there)
        std = np.maximum(w.std(axis=-2, keepdims=True), 1e-9)
        w = _median_filter((w - mean) / std, 7)
        # openai's row window is matrix[len(sot_sequence):-1] =
        # [<|notimestamps|>, *text]: row k is the position PREDICTING
        # text[k] (query = the token BEFORE it); the final row (query =
        # last text token) predicts <|eot|> and carries the last word's
        # end boundary.
        m = w.mean(axis=0)[lo - 1 : lo + len(text)]
        starts = dtw_path_from_cost(-m)
        offset = float(chunk_offsets_s[row_i])
        # openai's split: unicode units -> (language-dependent) words;
        # indices in word_idx are positions into text/starts
        word_strs, word_idx = _split_words(text, decode_text, language)
        words: list[dict] = []
        for wi, (wstr, kidx) in enumerate(zip(word_strs, word_idx)):
            start_f = float(starts[kidx[0]])
            if wi + 1 < len(word_idx):
                end_f = float(starts[word_idx[wi + 1][0]])
            else:
                end_f = float(starts[len(text)])  # the eot row's frame
            w = {
                "word": wstr,
                "start": round(offset + start_f * AUDIO_FRAME_S, 3),
                "end": round(offset + end_f * AUDIO_FRAME_S, 3),
            }
            if tok_probs is not None:
                w["probability"] = float(
                    np.mean(tok_probs[row_i][[lo + k for k in kidx]])
                )
            words.append(w)
        out.append(
            _merge_punctuations(words, prepend_punctuations, append_punctuations)
        )
    return out
