"""Batched KV-cache autoregressive decode for Whisper, fully on-device.

Replaces openai-whisper's torch decode loop (the reference's HOT LOOP #1,
SURVEY.md §3.2 step 4c; reference: app/services/audio_processor.py:1056-1098).

TPU-first design:
  * The whole decode — prefill + token loop + logit rules — runs inside ONE
    jit region built on lax.while_loop; there is no host sync per token.
  * KV caches are preallocated (L, B, T_max, H, Dh) arrays updated with
    dynamic_update_slice; layers are scanned (stacked params) so compile
    time is depth-independent.
  * Long audio scales over the BATCH axis (30 s chunks decoded in parallel)
    rather than the sequence axis (SURVEY.md §5.7) — shard the batch with
    pjit over the data axis of the mesh (parallel/sharding.py).
  * Whisper's timestamp/suppress sampling rules are implemented as
    vectorised logit masks, not Python branching.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import WhisperConfig
from .model import (
    Params,
    _merge_heads,
    _split_heads,
    layer_norm,
    linear,
    mlp,
)

NEG_INF = float("-inf")


# ---------------------------------------------------------------------------
# Special-token layout (derived from vocab size — no vocab file needed)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class SpecialTokens:
    """Whisper special-token ids, derived from the vocabulary size.

    Multilingual vocab (>=51865): text tokens end at 50257 (GPT-2 vocab),
    then eot, sot, language tokens, task tokens, timestamps.  The .en models
    are shifted down by one (50256-base).
    """

    eot: int
    sot: int
    lang_begin: int
    num_languages: int
    translate: int
    transcribe: int
    startoflm: int
    startofprev: int
    no_speech: int
    no_timestamps: int
    timestamp_begin: int
    n_vocab: int

    @classmethod
    def for_config(cls, cfg: WhisperConfig) -> "SpecialTokens":
        if cfg.n_vocab >= 51865:
            eot = 50257
            num_languages = cfg.n_vocab - 51765 - 1  # 99 (v2) or 100 (v3)
        elif cfg.n_vocab == 51864:
            eot = 50256
            num_languages = 99
        else:  # tiny test vocabs: reserve the tail of the vocab
            num_languages = 2
            eot = cfg.n_vocab - (num_languages + 10 + 16)
        sot = eot + 1
        lang_begin = sot + 1
        translate = lang_begin + num_languages
        transcribe = translate + 1
        startoflm = transcribe + 1
        startofprev = startoflm + 1
        no_speech = startofprev + 1
        no_timestamps = no_speech + 1
        timestamp_begin = no_timestamps + 1
        return cls(
            eot=eot,
            sot=sot,
            lang_begin=lang_begin,
            num_languages=num_languages,
            translate=translate,
            transcribe=transcribe,
            startoflm=startoflm,
            startofprev=startofprev,
            no_speech=no_speech,
            no_timestamps=no_timestamps,
            timestamp_begin=timestamp_begin,
            n_vocab=cfg.n_vocab,
        )

    def sot_sequence(
        self, language: int | None = None, task: str = "transcribe",
        timestamps: bool = True,
    ) -> list[int]:
        seq = [self.sot]
        if self.n_vocab >= 51865:
            seq.append(self.lang_begin if language is None else self.lang_begin + language)
            seq.append(self.transcribe if task == "transcribe" else self.translate)
        if not timestamps:
            seq.append(self.no_timestamps)
        return seq


# ---------------------------------------------------------------------------
# Standard suppress list (openai-whisper's SuppressTokens default)
# ---------------------------------------------------------------------------

# Symbols whose tokens are suppressed to avoid non-speech annotations like
# "♪♪♪" or "[DAVID]" while keeping basic punctuation — the same list
# openai-whisper's tokenizer.non_speech_tokens builds.
_NON_SPEECH_SYMBOLS = list('"#()*+/:;<=>@[\\]^_`{|}~「」『』') + (
    "<< >> <<< >>> -- --- -( -[ (' (\" (( )) ((( ))) [[ ]] {{ }} ♪♪ ♪♪♪".split()
)
_MISC_SYMBOLS = set("♩♪♫♬♭♮♯")


def non_speech_token_ids(tokenizer) -> list[int]:
    """Token ids of non-speech annotation symbols (openai's list).

    Single-token symbols are suppressed directly; multi-token ones only for
    the miscellaneous music symbols (safe to kill their first byte).  " -"
    and " '" contribute their first token so hyphens/quotes can't START a
    word but remain legal inside one.
    """
    ids: set[int] = set()
    for prefix in (" -", " '"):
        toks = tokenizer.encode(prefix)
        if toks:
            ids.add(toks[0])
    for symbol in _NON_SPEECH_SYMBOLS + list(_MISC_SYMBOLS):
        for variant in (symbol, " " + symbol):
            toks = tokenizer.encode(variant)
            if len(toks) == 1:
                ids.add(toks[0])
            elif toks and symbol in _MISC_SYMBOLS:
                ids.add(toks[0])
    return sorted(ids)


def always_suppressed_specials(st: SpecialTokens) -> list[int]:
    """The special ids openai suppresses REGARDLESS of the user's
    suppress_tokens option (whisper.decoding._get_suppress_tokens)."""
    return [st.sot, st.translate, st.transcribe, st.startoflm,
            st.startofprev, st.no_speech]


def build_suppress_mask(tokenizer, st: SpecialTokens) -> np.ndarray:
    """(V,) bool mask of always-suppressed ids: openai-whisper's default
    SuppressTokens = non-speech symbols + sot/task/lm/prev/nospeech specials.

    The reference inherits exactly this via whisper.transcribe's defaults
    (reference: app/services/audio_processor.py:1076)."""
    mask = np.zeros(st.n_vocab, bool)
    for t in always_suppressed_specials(st) + non_speech_token_ids(tokenizer):
        if 0 <= t < st.n_vocab:
            mask[t] = True
    return mask


def space_blank_token_id(tokenizer, st: SpecialTokens) -> int | None:
    """Id of the " " token for the SuppressBlank rule (first sample)."""
    toks = tokenizer.encode(" ")
    if toks and 0 <= toks[0] < st.n_vocab:
        return int(toks[0])
    return None


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------

class Cache(NamedTuple):
    self_k: jnp.ndarray  # (L, B, T_max, H, Dh) — int8 when self-quantised
    self_v: jnp.ndarray
    cross_k: jnp.ndarray  # (L, B, T_audio, H, Dh) — int8 when quantised
    cross_v: jnp.ndarray
    cross_k_scale: jnp.ndarray | None = None  # (L, B, 1, H, Dh)
    cross_v_scale: jnp.ndarray | None = None
    # per-TOKEN self-cache scales (L, B, T_max, H, 1): quantisation is over
    # the channel axis at write time, so the scale folds after the QK^T
    # matmul (K) and into the probs (V) — zero extra matmuls
    self_k_scale: jnp.ndarray | None = None
    self_v_scale: jnp.ndarray | None = None


def precompute_cross_attn(
    params: Params, cfg: WhisperConfig, audio_states: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """K/V over encoder states for every decoder layer: (L, B, Ta, H, Dh)."""
    blocks = params["decoder"]["blocks"]

    def layer_kv(_, bp):
        k = _split_heads(linear(bp["cross_attn"]["k"], audio_states), cfg.n_text_head)
        v = _split_heads(linear(bp["cross_attn"]["v"], audio_states), cfg.n_text_head)
        return None, (k, v)

    _, (ks, vs) = jax.lax.scan(layer_kv, None, blocks)
    return ks, vs


def _quantize_kv(x: jnp.ndarray, bits: int = 8) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(layer, batch, head, channel) symmetric int8/int4 over time.

    The scale folds back losslessly: into q for K (scores = (q*scale)·k8)
    and after the probs matmul for V (out = (p·v8)*scale), so dequant costs
    nothing extra — the win is halved (int8) or quartered (int4) HBM
    traffic on the decode loop's dominant stream (the cross-attention
    cache: L*B*1500*d bytes per step).
    """
    qmax = 127.0 if bits == 8 else 7.0
    amax = jnp.max(jnp.abs(x), axis=2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / qmax
    q = jnp.clip(jnp.round(x / scale), -qmax, qmax).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def init_cache(
    params: Params,
    cfg: WhisperConfig,
    audio_states: jnp.ndarray,
    max_len: int,
    dtype=jnp.float32,
    quantize_cross_kv: bool = False,
    kernel_layout: bool = False,
    kv_bits: int = 8,
    quantize_self_kv: bool = False,
) -> Cache:
    """kernel_layout=True stores the int8 cross cache transposed+padded for
    the fused Pallas decode-attention kernel: K as (L,B,H,Dh,Tpad) so the
    long axis sits on the 128-lane dim, V as (L,B,H,Tpad,Dh).

    kv_bits=4 (kernel_layout only) nibble-packs two int4 values per byte in
    the de-interleaved time order the int4 kernel expects — half the int8
    stream's bytes on the decode loop's dominant HBM term."""
    b = audio_states.shape[0]
    h, dh = cfg.n_text_head, cfg.n_text_state // cfg.n_text_head
    shape = (cfg.n_text_layer, b, max_len, h, dh)
    if quantize_self_kv:
        self_k = jnp.zeros(shape, jnp.int8)
        self_v = jnp.zeros(shape, jnp.int8)
        self_scales = dict(
            self_k_scale=jnp.zeros(shape[:-1] + (1,), jnp.float32),
            self_v_scale=jnp.zeros(shape[:-1] + (1,), jnp.float32),
        )
    else:
        self_k = jnp.zeros(shape, dtype)
        self_v = jnp.zeros(shape, dtype)
        self_scales = {}
    ck, cv = precompute_cross_attn(params, cfg, audio_states.astype(dtype))
    if quantize_cross_kv:
        bits = kv_bits if kernel_layout else 8
        ck8, ks = _quantize_kv(ck.astype(jnp.float32), bits=bits)
        cv8, vs = _quantize_kv(cv.astype(jnp.float32), bits=bits)
        if kernel_layout:
            ta = ck8.shape[2]
            pad = (-ta) % 128
            ck8 = jnp.transpose(ck8, (0, 1, 3, 4, 2))  # (L,B,H,Dh,Ta)
            ck8 = jnp.pad(ck8, ((0, 0),) * 4 + ((0, pad),))
            cv8 = jnp.transpose(cv8, (0, 1, 3, 2, 4))  # (L,B,H,Ta,Dh)
            cv8 = jnp.pad(cv8, ((0, 0),) * 3 + ((0, pad), (0, 0)))
            if bits == 4:
                from ...ops.pallas import decode_attention as da

                ck8, cv8 = da.pack_int4_time(ck8, cv8)
        return Cache(
            self_k=self_k,
            self_v=self_v,
            cross_k=ck8,
            cross_v=cv8,
            cross_k_scale=ks,
            cross_v_scale=vs,
            **self_scales,
        )
    return Cache(
        self_k=self_k,
        self_v=self_v,
        cross_k=ck.astype(dtype),
        cross_v=cv.astype(dtype),
        **self_scales,
    )


# ---------------------------------------------------------------------------
# Cached decoder forward (prefill with T>1, or single-step with T=1)
# ---------------------------------------------------------------------------

def _cached_attention(
    q, k_cache, v_cache, t_valid, min_valid=None, k_scale=None, v_scale=None
):
    """q (B,T,H,Dh) against a (B,T_max,H,Dh) cache; positions >= t_valid masked.

    t_valid: (T,) absolute position of each query token + 1 (how much of the
    cache it may see) — implements causality inside the prefill window too.
    min_valid: optional (B,) first visible cache position per row — masks
    out left-padding in prompted decode (rows with different prompt
    lengths share one padded cache).
    k_scale/v_scale: optional (B, T_max, H, 1) per-token int8 dequant
    scales; K's folds into the scores after QK^T, V's into the probs —
    the int8 cache streams at half the bytes with no extra matmuls.
    """
    dh = q.shape[-1]
    kc = k_cache if k_scale is None else k_cache.astype(q.dtype)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, kc, preferred_element_type=jnp.float32
    ) * (1.0 / math.sqrt(dh))
    if k_scale is not None:
        # (B, T_max, H, 1) -> (B, H, 1, T_max) broadcast over queries
        scores = scores * jnp.transpose(k_scale[..., 0], (0, 2, 1))[:, :, None, :]
    pos = jnp.arange(k_cache.shape[1])
    mask = pos[None, :] < t_valid[:, None]  # (T, T_max)
    if min_valid is None:
        scores = jnp.where(mask[None, None], scores, NEG_INF)
    else:
        # padding queries must still see THEMSELVES: a fully-masked row
        # softmaxes to NaN, and 0-prob x NaN v-entries poison every later
        # layer's attention sum for the real tokens too.  Real tokens sit
        # at positions >= min_valid, so the self-term changes nothing for
        # them; pad outputs are garbage-but-finite and never read.
        self_vis = (pos[None, :] == (t_valid - 1)[:, None])[None]  # (1,T,Tmax)
        vis = (pos[None, None, :] >= min_valid[:, None, None]) | self_vis
        scores = jnp.where((mask[None] & vis)[:, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    if v_scale is not None:
        probs = probs * jnp.transpose(v_scale[..., 0], (0, 2, 1))[:, :, None, :]
        vc = v_cache.astype(q.dtype)
    else:
        vc = v_cache
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(q.dtype), vc,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def decoder_forward_cached(
    params: Params,
    cfg: WhisperConfig,
    tokens: jnp.ndarray,  # (B, T)
    cache: Cache,
    pos: jnp.ndarray,  # scalar int: write offset into the cache
    pos_offset: jnp.ndarray | None = None,  # (B,) per-row logical offset
    min_valid: jnp.ndarray | None = None,  # (B,) first visible cache slot
    kv_bits: int = 8,  # cross-cache precision when kernel-layout quantized
    compute_dtype=None,  # activation dtype; required when self-KV is int8
    tp_mesh=None,  # model-parallel Mesh: int4 kernel runs per-shard
    kernel_layout: bool | None = None,  # static: cross cache in kernel layout
    logit_positions: tuple[int, ...] | None = None,
) -> tuple[jnp.ndarray, Cache]:
    """Run the decoder over T new tokens, appending K/V to the cache at pos.

    Returns (logits (B, T, V), updated cache).  Layers are scanned; the
    carry is the hidden stream, the scanned xs are the stacked layer params
    plus that layer's cache slabs.

    pos_offset/min_valid support LEFT-padded per-row prompts (prompted
    decode): a row whose real tokens start at physical slot `pad` gets
    positional embeddings indexed from 0 at that slot (pos_offset=pad) and
    never attends to the padding (min_valid=pad).

    kernel_layout: whether the quantized cross cache is stored in the
    Pallas kernel layout (init_cache's kernel_layout) — the decode impls
    pass the same static flag they gave init_cache.  None falls back to
    shape inference (axis 2 == heads), which is unambiguous for real
    configs (Ta=1500 != H) but can misread toy configs where Ta == H.

    logit_positions: prefill optimisation — unembed ONLY these (static,
    negative-ok) token positions instead of all T.  The prompt prefill
    reads just the sot slot and the last position; materialising the full
    (B, T, V) float32 logits for a long conditioned prompt is a multi-GB
    transient XLA does not narrow away.
    """
    p = params["decoder"]
    b, t = tokens.shape
    quantized_self = cache.self_k_scale is not None
    if compute_dtype is not None:
        dtype = jnp.dtype(compute_dtype)
    elif quantized_self:
        # int8 self cache carries no activation dtype; fall back to the
        # (unquantized) cross cache's dtype
        dtype = (
            cache.cross_k.dtype
            if cache.cross_k.dtype != jnp.int8
            else jnp.float32
        )
    else:
        dtype = cache.self_k.dtype
    x = p["token_emb"][tokens].astype(dtype)
    if pos_offset is None:
        x = x + jax.lax.dynamic_slice_in_dim(p["pos_emb"], pos, t, axis=0).astype(dtype)
    else:
        pos_ids = jnp.maximum(
            pos + jnp.arange(t)[None, :] - pos_offset[:, None], 0
        )  # (B, T) logical positions
        x = x + jnp.take(p["pos_emb"], pos_ids, axis=0).astype(dtype)

    t_valid = pos + jnp.arange(t) + 1  # each new token sees cache[: pos+i+1]
    quantized = cache.cross_k_scale is not None
    if kernel_layout is None:
        # legacy shape inference: axis 2 is heads only in kernel layout
        # (Ta != H for real configs; impls pass the flag explicitly)
        kernel_layout = quantized and cache.cross_k.shape[2] == cfg.n_text_head
    kernel_layout = quantized and kernel_layout
    blocks = p["blocks"]

    # fori_loop over layers with IN-PLACE cache writes.  A scan with the
    # caches as xs/ys re-materialises the whole self-cache every decode
    # step (measured ~10 ms/step extra at max_len=320, batch 64); carrying
    # the (L, ...) arrays through fori lets XLA alias them and write only
    # the (B, t, H, Dh) slab per layer.
    def take(tree, l):
        return jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, l, 0, keepdims=False), tree
        )

    def _quantize_token(xnew):
        """Per-token symmetric int8 over the channel axis: (B,t,H,Dh) ->
        (int8 values, (B,t,H,1) scales)."""
        amax = jnp.max(jnp.abs(xnew.astype(jnp.float32)), axis=-1, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        q8 = jnp.clip(jnp.round(xnew.astype(jnp.float32) / scale), -127, 127)
        return q8.astype(jnp.int8), scale

    def body(l, carry):
        x, sk_all, sv_all, sks_all, svs_all = carry
        bp = take(blocks, l)
        # --- causal self-attention against the running cache
        xn = layer_norm(bp["attn_ln"], x)
        q = _split_heads(linear(bp["attn"]["q"], xn), cfg.n_text_head)
        k_new = _split_heads(linear(bp["attn"]["k"], xn), cfg.n_text_head)
        v_new = _split_heads(linear(bp["attn"]["v"], xn), cfg.n_text_head)
        zero = jnp.int32(0)
        if quantized_self:
            k_store, k_sc = _quantize_token(k_new)
            v_store, v_sc = _quantize_token(v_new)
            sks_all = jax.lax.dynamic_update_slice(
                sks_all, k_sc[None], (l, zero, pos, zero, zero)
            )
            svs_all = jax.lax.dynamic_update_slice(
                svs_all, v_sc[None], (l, zero, pos, zero, zero)
            )
        else:
            k_store = k_new.astype(dtype)
            v_store = v_new.astype(dtype)
        sk_all = jax.lax.dynamic_update_slice(
            sk_all, k_store[None], (l, zero, pos, zero, zero)
        )
        sv_all = jax.lax.dynamic_update_slice(
            sv_all, v_store[None], (l, zero, pos, zero, zero)
        )
        sk = jax.lax.dynamic_index_in_dim(sk_all, l, 0, keepdims=False)
        sv = jax.lax.dynamic_index_in_dim(sv_all, l, 0, keepdims=False)
        if quantized_self:
            sks = jax.lax.dynamic_index_in_dim(sks_all, l, 0, keepdims=False)
            svs = jax.lax.dynamic_index_in_dim(svs_all, l, 0, keepdims=False)
            o = _cached_attention(
                q, sk, sv, t_valid, min_valid, k_scale=sks, v_scale=svs
            )
        else:
            o = _cached_attention(q, sk, sv, t_valid, min_valid)
        x = x + linear(bp["attn"]["out"], _merge_heads(o))
        # --- cross-attention against precomputed encoder K/V
        xa = layer_norm(bp["cross_attn_ln"], x)
        qx = _split_heads(linear(bp["cross_attn"]["q"], xa), cfg.n_text_head)
        if quantized:
            # fold K's dequant scale into q, V's after the probs matmul —
            # the int8 cache streams at half the bytes, zero extra FLOPs
            ks = jax.lax.dynamic_index_in_dim(cache.cross_k_scale, l, 0, keepdims=False)
            vs = jax.lax.dynamic_index_in_dim(cache.cross_v_scale, l, 0, keepdims=False)
            qx = qx * ks.astype(qx.dtype)
            if kernel_layout:
                from ...ops.pallas import decode_attention as da

                on_tpu = jax.default_backend() == "tpu"
                # off-TPU the real kernels can still run through the Pallas
                # interpreter (APTPU_KERNEL_INTERPRET=1) — the driver's
                # multichip dryrun uses this to certify the production
                # shard_map TP kernel path on the virtual CPU mesh instead
                # of silently swapping in the jnp reference
                interp = (not on_tpu) and da.interpret_requested()
                if kv_bits == 4 and (on_tpu or interp):
                    # stacked-cache kernel: the layer id rides scalar
                    # prefetch, so NO per-layer copy of K/V materialises.
                    # On a model-parallel mesh the kernel runs per-shard
                    # (heads on the model axis) via shard_map — GSPMD has
                    # no partitioning rule for pallas_call and would
                    # all-gather the head-sharded cache otherwise.
                    if tp_mesh is not None:
                        ox = da.cross_attention_int4_stacked_tp(
                            tp_mesh, qx, cache.cross_k, cache.cross_v, l,
                            valid_len=cfg.n_audio_ctx, interpret=interp,
                        )
                    else:
                        ox = da.cross_attention_int4_stacked(
                            qx, cache.cross_k, cache.cross_v, l,
                            valid_len=cfg.n_audio_ctx, interpret=interp,
                        )
                else:
                    ck = jax.lax.dynamic_index_in_dim(
                        cache.cross_k, l, 0, keepdims=False
                    )
                    cv = jax.lax.dynamic_index_in_dim(
                        cache.cross_v, l, 0, keepdims=False
                    )
                    if kv_bits == 4:
                        fn = da.cross_attention_int4_reference
                    else:
                        fn = (
                            da.cross_attention_int8
                            if on_tpu
                            else da.cross_attention_int8_reference
                        )
                    ox = fn(qx, ck, cv, valid_len=cfg.n_audio_ctx)
                ox = ox.astype(x.dtype)
            else:
                ck = jax.lax.dynamic_index_in_dim(cache.cross_k, l, 0, keepdims=False)
                cv = jax.lax.dynamic_index_in_dim(cache.cross_v, l, 0, keepdims=False)
                full = jnp.full((t,), ck.shape[1])
                ox = _cached_attention(qx, ck.astype(x.dtype), cv.astype(x.dtype), full)
            ox = ox * vs.astype(ox.dtype)
        else:
            ck = jax.lax.dynamic_index_in_dim(cache.cross_k, l, 0, keepdims=False)
            cv = jax.lax.dynamic_index_in_dim(cache.cross_v, l, 0, keepdims=False)
            full = jnp.full((t,), ck.shape[1])
            ox = _cached_attention(qx, ck, cv, full)
        x = x + linear(bp["cross_attn"]["out"], _merge_heads(ox))
        # --- MLP
        x = x + mlp(bp, layer_norm(bp["mlp_ln"], x))
        return (x, sk_all, sv_all, sks_all, svs_all)

    x, new_sk, new_sv, new_sks, new_svs = jax.lax.fori_loop(
        0, cfg.n_text_layer, body,
        (x, cache.self_k, cache.self_v, cache.self_k_scale, cache.self_v_scale),
    )
    if logit_positions is not None:
        # gather the needed hidden rows BEFORE the unembedding matmul
        x = x[:, [q % t for q in logit_positions]]
    x = layer_norm(p["ln"], x)
    logits = jnp.dot(
        x, p["token_emb"].T.astype(x.dtype), preferred_element_type=jnp.float32
    )
    return logits.astype(jnp.float32), Cache(
        new_sk, new_sv, cache.cross_k, cache.cross_v,
        cache.cross_k_scale, cache.cross_v_scale,
        new_sks, new_svs,
    )


# ---------------------------------------------------------------------------
# Logit rules (vectorised ApplyTimestampRules / SuppressBlank / SuppressTokens)
# ---------------------------------------------------------------------------

def apply_logit_rules(
    logits: jnp.ndarray,  # (B, V) float32
    st: SpecialTokens,
    *,
    step: jnp.ndarray,  # scalar: tokens sampled so far (0 at first sample)
    last_token: jnp.ndarray,  # (B,)
    penultimate_token: jnp.ndarray,  # (B,)
    max_ts_token: jnp.ndarray,  # (B,) highest timestamp sampled so far (or tb-1)
    suppress_mask: jnp.ndarray | None,  # (V,) bool — True = suppress
    use_timestamps: bool,
    max_initial_timestamp_index: int | None = 50,
    space_blank_id: int | None = None,
) -> jnp.ndarray:
    """All Whisper sampling constraints as one vectorised mask pass.

    max_initial_timestamp_index: openai's max_initial_timestamp option in
    index form (seconds / 0.02 precision; the default 50 = 1.0 s).  None
    disables the cap, as openai's DecodingOptions allows.
    """
    v = logits.shape[-1]
    vocab_ids = jnp.arange(v)
    tb = st.timestamp_begin

    # 1. static suppress list (non-speech symbols, sot/notimestamps/...)
    if suppress_mask is not None:
        logits = jnp.where(suppress_mask[None, :], NEG_INF, logits)

    # 2. suppress blank at the first sample: " " and EOT
    if space_blank_id is not None:
        blank = (vocab_ids == space_blank_id) | (vocab_ids == st.eot)
        logits = jnp.where((step == 0) & blank[None, :], NEG_INF, logits)

    if not use_timestamps:
        return logits

    is_ts = vocab_ids >= tb  # (V,)
    last_was_ts = last_token >= tb
    penult_was_ts = (step < 2) | (penultimate_token >= tb)

    # 2b. <|notimestamps|> is never legal in timestamp mode (openai's
    #     ApplyTimestampRules masks it unconditionally)
    logits = jnp.where((vocab_ids == st.no_timestamps)[None, :], NEG_INF, logits)

    # 3. ts-pairing: after <ts> <ts> force text; after text <ts> force ts/EOT
    mask_ts = last_was_ts & penult_was_ts  # cannot sample another timestamp
    mask_text = last_was_ts & ~penult_was_ts  # must sample timestamp or EOT
    text_ids = (vocab_ids < st.eot)
    logits = jnp.where(mask_ts[:, None] & is_ts[None, :], NEG_INF, logits)
    logits = jnp.where(mask_text[:, None] & text_ids[None, :], NEG_INF, logits)

    # 4. timestamps are non-decreasing: callers pass max_ts_token = tb - 1
    #    until the first timestamp is sampled (no floor then).  openai's
    #    ApplyTimestampRules allows re-sampling the SAME timestamp when the
    #    last token was a lone timestamp (that is how the contiguous
    #    <|t|><|t|> segment-boundary pair forms) and requires strictly
    #    greater otherwise (preventing zero-length segments).
    lone_ts = last_was_ts & ~penult_was_ts
    floor = jnp.where(lone_ts, max_ts_token, max_ts_token + 1)
    below = vocab_ids[None, :] < floor[:, None]
    logits = jnp.where(below & is_ts[None, :], NEG_INF, logits)

    # 5. first sample must be a timestamp, capped at max_initial_timestamp
    first = step == 0
    logits = jnp.where(first & ~is_ts[None, :], NEG_INF, logits)
    if max_initial_timestamp_index is not None:
        too_late = vocab_ids > tb + max_initial_timestamp_index
        logits = jnp.where(first & too_late[None, :], NEG_INF, logits)

    # 6. if total timestamp probability beats the best text token, force ts
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ts_lp = jax.nn.logsumexp(jnp.where(is_ts[None, :], logprobs, NEG_INF), axis=-1)
    max_text_lp = jnp.max(jnp.where(is_ts[None, :], NEG_INF, logprobs), axis=-1)
    force_ts = ts_lp > max_text_lp
    logits = jnp.where(force_ts[:, None] & ~is_ts[None, :], NEG_INF, logits)
    return logits


# ---------------------------------------------------------------------------
# Greedy decode loop
# ---------------------------------------------------------------------------

class DecodeResult(NamedTuple):
    tokens: jnp.ndarray  # (B, max_new) int32, EOT-padded
    lengths: jnp.ndarray  # (B,) number of valid tokens (excluding EOT)
    sum_logprob: jnp.ndarray  # (B,)
    no_speech_prob: jnp.ndarray  # (B,) P(no_speech) at the SOT position


def _sample_loop(
    params: Params,
    cfg: WhisperConfig,
    st: SpecialTokens,
    cache: Cache,
    last_logits: jnp.ndarray,  # (B, V) logits for the first sample
    *,
    start_pos,  # physical cache slot of the first sampled token
    max_new_tokens: int,
    use_timestamps: bool,
    suppress_mask,
    space_blank_id,
    temperature: float,
    rng_seed: int,
    last_init: jnp.ndarray,  # (B,)
    penult_init: jnp.ndarray,  # (B,)
    pos_offset: jnp.ndarray | None = None,
    min_valid: jnp.ndarray | None = None,
    kv_bits: int = 8,
    compute_dtype=None,
    max_initial_ts_index: int | None = 50,
    tp_mesh=None,
    kernel_layout: bool = False,
):
    """The greedy/sampling while_loop shared by plain and prompted decode.

    Returns (tokens (B, max_new), lengths, sum_logprob).
    """
    b = last_logits.shape[0]
    tb = st.timestamp_begin

    # Loop-INVARIANT state (the big cross-attention caches + scales) stays
    # OUT of the while_loop carry — closed over instead — so XLA never has
    # to thread multi-GB buffers through the loop state; only the mutable
    # self-cache slabs ride the carry.
    cross = (cache.cross_k, cache.cross_v, cache.cross_k_scale, cache.cross_v_scale)

    class LoopState(NamedTuple):
        step: jnp.ndarray
        self_k: jnp.ndarray
        self_v: jnp.ndarray
        self_ks: jnp.ndarray | None  # per-token int8 scales (or None)
        self_vs: jnp.ndarray | None
        logits: jnp.ndarray  # (B, V) logits for the next sample
        tokens: jnp.ndarray  # (B, max_new_tokens)
        last: jnp.ndarray  # (B,)
        penult: jnp.ndarray  # (B,)
        max_ts: jnp.ndarray  # (B,)
        finished: jnp.ndarray  # (B,) bool
        sum_logprob: jnp.ndarray  # (B,)
        key: jnp.ndarray  # PRNG key (sampling mode only)

    init = LoopState(
        step=jnp.int32(0),
        self_k=cache.self_k,
        self_v=cache.self_v,
        self_ks=cache.self_k_scale,
        self_vs=cache.self_v_scale,
        logits=last_logits,
        tokens=jnp.full((b, max_new_tokens), st.eot, jnp.int32),
        last=last_init.astype(jnp.int32),
        penult=penult_init.astype(jnp.int32),
        max_ts=jnp.full((b,), tb - 1, jnp.int32),
        finished=jnp.zeros((b,), bool),
        sum_logprob=jnp.zeros((b,), jnp.float32),
        key=jax.random.PRNGKey(rng_seed),
    )

    def cond(s: LoopState):
        return (s.step < max_new_tokens) & ~jnp.all(s.finished)

    def body(s: LoopState):
        masked = apply_logit_rules(
            s.logits,
            st,
            step=s.step,
            last_token=s.last,
            penultimate_token=s.penult,
            max_ts_token=s.max_ts,
            suppress_mask=suppress_mask,
            use_timestamps=use_timestamps,
            max_initial_timestamp_index=max_initial_ts_index,
            space_blank_id=space_blank_id,
        )
        if temperature > 0:
            key, subkey = jax.random.split(s.key)
            next_tok = jax.random.categorical(
                subkey, masked / temperature, axis=-1
            ).astype(jnp.int32)
        else:
            key = s.key
            next_tok = jnp.argmax(masked, axis=-1).astype(jnp.int32)
        logprob = jnp.take_along_axis(
            jax.nn.log_softmax(masked, axis=-1), next_tok[:, None], axis=-1
        )[:, 0]
        next_tok = jnp.where(s.finished, st.eot, next_tok)
        now_finished = s.finished | (next_tok == st.eot)
        sum_lp = s.sum_logprob + jnp.where(s.finished, 0.0, logprob)

        tokens = jax.lax.dynamic_update_slice_in_dim(
            s.tokens, next_tok[:, None], s.step, axis=1
        )
        new_max_ts = jnp.where(
            (next_tok >= tb) & ~s.finished, jnp.maximum(s.max_ts, next_tok), s.max_ts
        )

        step_cache = Cache(
            s.self_k, s.self_v, *cross,
            self_k_scale=s.self_ks, self_v_scale=s.self_vs,
        )
        logits, new_cache = decoder_forward_cached(
            params, cfg, next_tok[:, None], step_cache, start_pos + s.step,
            pos_offset=pos_offset, min_valid=min_valid, kv_bits=kv_bits,
            compute_dtype=compute_dtype, tp_mesh=tp_mesh,
            kernel_layout=kernel_layout,
        )
        return LoopState(
            step=s.step + 1,
            self_k=new_cache.self_k,
            self_v=new_cache.self_v,
            self_ks=new_cache.self_k_scale,
            self_vs=new_cache.self_v_scale,
            logits=logits[:, -1],
            tokens=tokens,
            last=next_tok,
            penult=s.last,
            max_ts=new_max_ts,
            finished=now_finished,
            sum_logprob=sum_lp,
            key=key,
        )

    final = jax.lax.while_loop(cond, body, init)
    lengths = jnp.sum(final.tokens != st.eot, axis=-1)
    return final.tokens, lengths, final.sum_logprob


_GREEDY_STATIC_ARGNAMES = (
    "cfg", "max_new_tokens", "use_timestamps", "sot_sequence", "dtype_name",
    "space_blank_id", "quantize_cross_kv", "temperature", "use_pallas_kernel",
    "kv_bits", "quantize_self_kv", "best_of", "max_initial_ts_index",
    "tp_mesh",
)


def _rank_groups(tokens, lengths, sum_logprob, no_speech_prob, b, g):
    """Select the best of g independent sampling candidates per element by
    average logprob — openai's MaximumLikelihoodRanker over a best_of
    group (whisper.transcribe defaults best_of=5 whenever temperature>0,
    so the reference's fallback rungs pick the best of five samples, not
    one — app/services/audio_processor.py:1076)."""
    tokens = tokens.reshape(b, g, -1)
    lengths = lengths.reshape(b, g)
    sum_logprob = sum_logprob.reshape(b, g)
    avg = sum_logprob / jnp.maximum(lengths, 1).astype(jnp.float32)
    best = jnp.argmax(avg, axis=-1)  # (B,)
    take = lambda x: jnp.take_along_axis(  # noqa: E731
        x, best.reshape(b, *([1] * (x.ndim - 1))), axis=1
    )[:, 0]
    return DecodeResult(
        tokens=take(tokens),
        lengths=take(lengths),
        sum_logprob=take(sum_logprob),
        no_speech_prob=no_speech_prob.reshape(b, g)[:, 0],
    )


def _greedy_decode_impl(
    params: Params,
    cfg: WhisperConfig,
    audio_states: jnp.ndarray,  # (B, Ta, d) encoder output
    *,
    sot_sequence: tuple[int, ...],
    max_new_tokens: int = 224,
    use_timestamps: bool = True,
    suppress_mask: jnp.ndarray | None = None,
    space_blank_id: int | None = None,
    dtype_name: str = "float32",
    quantize_cross_kv: bool = False,
    use_pallas_kernel: bool = False,
    kv_bits: int = 8,
    quantize_self_kv: bool = False,
    temperature: float = 0.0,
    rng_seed: int = 0,
    best_of: int = 1,
    max_initial_ts_index: int | None = 50,
    tp_mesh=None,
) -> DecodeResult:
    """Batched greedy/sampling decode with Whisper rules, one jit region.

    temperature == 0 -> argmax; > 0 -> categorical sampling (used by the
    quality-gated fallback ladder in pipeline.transcribe, mirroring
    openai-whisper's temperature retry that the reference relies on).
    best_of > 1 at temperature > 0 samples that many independent
    candidates per element (rows ride the batch axis) and returns the
    best by average logprob — openai's best_of, defaulted to 5 by
    whisper.transcribe on every fallback rung.

    The loop is a lax.while_loop that exits as soon as every row has hit
    EOT — decisive for RTFx since typical 30 s segments need ~40-120 tokens,
    far fewer than the 224 cap.
    """
    st = SpecialTokens.for_config(cfg)
    dtype = jnp.dtype(dtype_name)
    b0 = audio_states.shape[0]
    group = best_of if (best_of > 1 and temperature > 0) else 1
    if group > 1:
        audio_states = jnp.repeat(audio_states, group, axis=0)
    b = audio_states.shape[0]
    prompt_len = len(sot_sequence)
    max_len = prompt_len + max_new_tokens

    kernel_layout = quantize_cross_kv and (use_pallas_kernel or kv_bits == 4)
    cache = init_cache(
        params, cfg, audio_states, max_len, dtype=dtype,
        quantize_cross_kv=quantize_cross_kv,
        kernel_layout=kernel_layout,
        kv_bits=kv_bits,
        quantize_self_kv=quantize_self_kv,
    )
    kv_bits_eff = kv_bits if kernel_layout else 8

    # --- prefill the SOT sequence (unembed only the sot slot + last —
    # full-width prefill logits are a large dead transient)
    prompt = jnp.tile(jnp.asarray(sot_sequence, jnp.int32)[None, :], (b, 1))
    logits, cache = decoder_forward_cached(
        params, cfg, prompt, cache, jnp.int32(0), kv_bits=kv_bits_eff,
        compute_dtype=dtype, tp_mesh=tp_mesh, kernel_layout=kernel_layout,
        logit_positions=(0, -1),
    )
    sot_probs = jax.nn.softmax(logits[:, 0], axis=-1)
    no_speech_prob = sot_probs[:, st.no_speech] if st.no_speech < cfg.n_vocab else jnp.zeros((b,))
    last_logits = logits[:, 1]

    tokens, lengths, sum_logprob = _sample_loop(
        params, cfg, st, cache, last_logits,
        start_pos=jnp.int32(prompt_len),
        max_new_tokens=max_new_tokens,
        use_timestamps=use_timestamps,
        suppress_mask=suppress_mask,
        space_blank_id=space_blank_id,
        temperature=temperature,
        rng_seed=rng_seed,
        last_init=jnp.full((b,), sot_sequence[-1], jnp.int32),
        penult_init=jnp.full((b,), sot_sequence[0], jnp.int32),
        kv_bits=kv_bits_eff,
        compute_dtype=dtype,
        max_initial_ts_index=max_initial_ts_index,
        tp_mesh=tp_mesh,
        kernel_layout=kernel_layout,
    )
    if group > 1:
        return _rank_groups(
            tokens, lengths, sum_logprob, no_speech_prob, b0, group
        )
    return DecodeResult(
        tokens=tokens,
        lengths=lengths,
        sum_logprob=sum_logprob,
        no_speech_prob=no_speech_prob,
    )


# NOTE on buffer donation: donating audio_states (donate_argnames) is a
# no-op for this program — XLA donation only aliases inputs to OUTPUTS, and
# the decode outputs (token ids, scalars) are tiny, so the runtime warns
# "donated buffers were not usable".  The real ~300 MB/slab HBM win is the
# caller dropping its reference to audio_states right after dispatch so the
# buffer frees when the decode completes (pipeline/transcribe does this
# when no retry/alignment pass needs the states).
greedy_decode = jax.jit(
    _greedy_decode_impl, static_argnames=_GREEDY_STATIC_ARGNAMES
)


# ---------------------------------------------------------------------------
# Prompted greedy decode (condition_on_previous_text support)
# ---------------------------------------------------------------------------

def _prompted_greedy_impl(
    params: Params,
    cfg: WhisperConfig,
    audio_states: jnp.ndarray,  # (B, Ta, d)
    prompt_tokens: jnp.ndarray,  # (B, P) int32, LEFT-padded, suffix = sot seq
    prompt_lens: jnp.ndarray,  # (B,) number of real tokens (right-aligned)
    *,
    sot_len: int,  # length of the trailing sot sequence (same for all rows)
    max_new_tokens: int = 224,
    use_timestamps: bool = True,
    suppress_mask: jnp.ndarray | None = None,
    space_blank_id: int | None = None,
    dtype_name: str = "float32",
    quantize_cross_kv: bool = False,
    use_pallas_kernel: bool = False,
    kv_bits: int = 8,
    quantize_self_kv: bool = False,
    temperature: float = 0.0,
    rng_seed: int = 0,
    best_of: int = 1,
    max_initial_ts_index: int | None = 50,
    tp_mesh=None,
) -> DecodeResult:
    """Greedy decode with PER-ROW prompts: openai-whisper's
    condition_on_previous_text mechanism (<|startofprev|> + previous-window
    text + sot sequence), batched.  best_of as in greedy_decode (openai
    applies it to prompted fallback rungs identically).

    Rows are left-padded to a common length P so one compiled program
    serves every prompt mix; padding is invisible (attention floor) and
    positional embeddings start at each row's first real token, exactly as
    if it were decoded alone.  The reference inherits this conditioning by
    default from whisper.transcribe (reference:
    app/services/audio_processor.py:1076); pipeline/transcribe exposes it
    as the hybrid window-group mode.
    """
    st = SpecialTokens.for_config(cfg)
    dtype = jnp.dtype(dtype_name)
    b0 = audio_states.shape[0]
    group = best_of if (best_of > 1 and temperature > 0) else 1
    if group > 1:
        audio_states = jnp.repeat(audio_states, group, axis=0)
        prompt_tokens = jnp.repeat(prompt_tokens, group, axis=0)
        prompt_lens = jnp.repeat(prompt_lens, group, axis=0)
    b, p_len = prompt_tokens.shape
    max_len = p_len + max_new_tokens

    kernel_layout = quantize_cross_kv and (use_pallas_kernel or kv_bits == 4)
    cache = init_cache(
        params, cfg, audio_states, max_len, dtype=dtype,
        quantize_cross_kv=quantize_cross_kv,
        kernel_layout=kernel_layout,
        kv_bits=kv_bits,
        quantize_self_kv=quantize_self_kv,
    )
    kv_bits_eff = kv_bits if kernel_layout else 8
    pad_len = (p_len - prompt_lens).astype(jnp.int32)  # (B,)

    logits, cache = decoder_forward_cached(
        params, cfg, prompt_tokens.astype(jnp.int32), cache, jnp.int32(0),
        pos_offset=pad_len, min_valid=pad_len, kv_bits=kv_bits_eff,
        compute_dtype=dtype, tp_mesh=tp_mesh, kernel_layout=kernel_layout,
        logit_positions=(p_len - sot_len, -1),
    )
    # every row's suffix is the same sot sequence -> <|sot|> sits at a
    # fixed physical slot; no-speech prob reads the logits AT that slot
    sot_probs = jax.nn.softmax(logits[:, 0], axis=-1)
    no_speech_prob = (
        sot_probs[:, st.no_speech]
        if st.no_speech < cfg.n_vocab
        else jnp.zeros((b,))
    )

    tokens, lengths, sum_logprob = _sample_loop(
        params, cfg, st, cache, logits[:, 1],
        start_pos=jnp.int32(p_len),
        max_new_tokens=max_new_tokens,
        use_timestamps=use_timestamps,
        suppress_mask=suppress_mask,
        space_blank_id=space_blank_id,
        temperature=temperature,
        rng_seed=rng_seed,
        last_init=prompt_tokens[:, -1],
        penult_init=prompt_tokens[:, -2] if p_len >= 2 else prompt_tokens[:, -1],
        pos_offset=pad_len,
        min_valid=pad_len,
        kv_bits=kv_bits_eff,
        compute_dtype=dtype,
        max_initial_ts_index=max_initial_ts_index,
        tp_mesh=tp_mesh,
        kernel_layout=kernel_layout,
    )
    if group > 1:
        return _rank_groups(
            tokens, lengths, sum_logprob, no_speech_prob, b0, group
        )
    return DecodeResult(
        tokens=tokens,
        lengths=lengths,
        sum_logprob=sum_logprob,
        no_speech_prob=no_speech_prob,
    )


prompted_greedy_decode = jax.jit(
    _prompted_greedy_impl,
    static_argnames=(
        "cfg", "sot_len", "max_new_tokens", "use_timestamps", "dtype_name",
        "space_blank_id", "quantize_cross_kv", "use_pallas_kernel",
        "kv_bits", "quantize_self_kv", "temperature", "best_of",
        "max_initial_ts_index", "tp_mesh",
    ),
)


def build_prompt_rows(
    histories: list[list[int]],  # per-row previous-window TEXT tokens
    sot_sequence: tuple[int, ...],
    st: SpecialTokens,
    ctx_tokens: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Assemble left-padded prompt rows for prompted_greedy_decode.

    Row layout: [eot pad ...][<|startofprev|>][last <=ctx_tokens history
    tokens][sot sequence].  Empty history -> just the sot sequence (the
    prompted program then behaves exactly like plain greedy_decode, which
    test_parity_prompted pins).  openai truncates the prompt to the last
    n_text_ctx//2-1 tokens; ctx_tokens is the static equivalent here.
    """
    sot = list(sot_sequence)
    p_len = 1 + ctx_tokens + len(sot)
    rows = np.full((len(histories), p_len), st.eot, np.int32)
    lens = np.zeros(len(histories), np.int32)
    for i, hist in enumerate(histories):
        # guard ctx_tokens=0: [-0:] is the FULL list, which would overflow
        # the p_len allocation (same -0 quirk _carry_hists guards)
        text = [t for t in hist if t < st.eot]
        ctx = text[-ctx_tokens:] if ctx_tokens else []
        real = ([st.startofprev] + ctx if ctx else []) + sot
        rows[i, p_len - len(real):] = real
        lens[i] = len(real)
    return rows, lens


# ---------------------------------------------------------------------------
# Beam-search decode
# ---------------------------------------------------------------------------

@partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "beam_size", "sot_sequence", "dtype_name",
        "use_timestamps", "quantize_cross_kv", "use_pallas_kernel", "kv_bits",
        "patience", "max_initial_ts_index", "space_blank_id", "tp_mesh",
        "quantize_self_kv",
    ),
)
def beam_decode(
    params: Params,
    cfg: WhisperConfig,
    audio_states: jnp.ndarray,  # (B, Ta, d)
    *,
    sot_sequence: tuple[int, ...],
    beam_size: int = 5,
    max_new_tokens: int = 224,
    use_timestamps: bool = True,
    suppress_mask: jnp.ndarray | None = None,
    length_penalty: float | None = None,
    patience: float = 1.0,
    dtype_name: str = "float32",
    quantize_cross_kv: bool = False,
    use_pallas_kernel: bool = False,
    kv_bits: int = 8,
    prompt_tokens: jnp.ndarray | None = None,  # (B, P) LEFT-padded rows
    prompt_lens: jnp.ndarray | None = None,  # (B,) real tokens per row
    max_initial_ts_index: int | None = 50,
    space_blank_id: int | None = None,
    tp_mesh=None,
    quantize_self_kv: bool = False,
) -> DecodeResult:
    """Batched beam search with openai-whisper's BeamSearchDecoder
    semantics, fully on-device (one jit region).

    Beams ride the batch axis: the cache holds B*K live rows; each step
    takes the top 2K of the K*V candidate scores per element, routes
    EOT-ending candidates into a FINISHED set (capacity K, never evicted —
    whisper's finished_sequences merge with patience=1), and keeps the
    best K non-EOT candidates as the live beams, reordering the cache rows
    with a gather.  The loop exits once every element holds K finished
    hypotheses (whisper's is_done); elements still short at the token cap
    are topped up from the live beams by raw score (whisper's finalize).
    The winner is ranked by sum_logprob / length for length_penalty=None
    (whisper's MaximumLikelihoodRanker default) or the Google-NMT
    ((5+len)/6)**penalty form otherwise.  Semantic deltas vs the exact
    openai implementation, both unreachable corner cases here: no
    candidate dict-dedup (live beams are always distinct sequences — a
    duplicate child requires a duplicate parent), and per-step candidates
    come from a flat top-2K rather than per-beam top-(K+1) merges (proven
    equivalent: a beam can place at most one EOT among its candidates, so
    the top-K non-EOT sets coincide).  Oracle-tested token-exact against
    an independent torch port of whisper's decoder loop in
    tests/test_parity_beam.py (reference engine:
    app/services/audio_processor.py:1076).

    prompt_tokens/prompt_lens (build_prompt_rows output) replace the
    uniform sot prefill with per-row <|startofprev|> prompts — openai's
    initial_prompt under beam search.  Padding stays invisible exactly as
    in prompted_greedy_decode (per-row pos_offset + min_valid); pad
    lengths are per batch ELEMENT so the beam cache-row reorder (which
    only permutes beams within an element) leaves them invariant.
    """
    st = SpecialTokens.for_config(cfg)
    dtype = jnp.dtype(dtype_name)
    b, ta, d = audio_states.shape
    k = beam_size
    # whisper's patience: collect round(K * patience) finished hypotheses
    # before stopping (max_candidates); the ranker still sees them all
    m_fin = max(1, int(round(k * patience)))
    cap = max(k, m_fin)  # buffer width (finalize may top up to K)
    prompted = prompt_tokens is not None
    prompt_len = prompt_tokens.shape[1] if prompted else len(sot_sequence)
    max_len = prompt_len + max_new_tokens

    # expand audio to (B*K, Ta, d): beams of one element share encoder rows
    audio_rep = jnp.repeat(audio_states, k, axis=0)
    kernel_layout = quantize_cross_kv and (use_pallas_kernel or kv_bits == 4)
    cache = init_cache(
        params, cfg, audio_rep, max_len, dtype=dtype,
        quantize_cross_kv=quantize_cross_kv,
        kernel_layout=kernel_layout,
        kv_bits=kv_bits,
        quantize_self_kv=quantize_self_kv,
    )
    kv_bits_eff = kv_bits if kernel_layout else 8

    if prompted:
        prompt = jnp.repeat(prompt_tokens.astype(jnp.int32), k, axis=0)
        pad_len = jnp.repeat(
            (prompt_len - prompt_lens).astype(jnp.int32), k, axis=0
        )  # (B*K,)
        row_kw = dict(pos_offset=pad_len, min_valid=pad_len)
    else:
        prompt = jnp.tile(
            jnp.asarray(sot_sequence, jnp.int32)[None, :], (b * k, 1)
        )
        row_kw = {}
    sot_slot = prompt_len - len(sot_sequence)
    logits, cache = decoder_forward_cached(
        params, cfg, prompt, cache, jnp.int32(0), kv_bits=kv_bits_eff,
        compute_dtype=dtype, tp_mesh=tp_mesh, kernel_layout=kernel_layout,
        logit_positions=(sot_slot, -1), **row_kw,
    )
    first_logits = logits[:, 1]  # (B*K, V)
    # P(<|nospeech|>) at the <|sot|> slot, exactly as the greedy paths
    # compute it (openai's no_speech gate applies identically under beam
    # search — DecodingTask._main_loop reads it from the prefill
    # regardless of decoder).  Beams are identical at prefill; beam 0's
    # row represents the element.
    sot_probs = jax.nn.softmax(logits[:, 0].astype(jnp.float32), axis=-1)
    no_speech_prob = (
        sot_probs[:, st.no_speech]
        if st.no_speech < cfg.n_vocab
        else jnp.zeros((b * k,), jnp.float32)
    ).reshape(b, k)[:, 0]

    tb = st.timestamp_begin

    class BeamState(NamedTuple):
        step: jnp.ndarray
        cache: Cache
        logits: jnp.ndarray        # (B*K, V) next-step logits for LIVE beams
        tokens: jnp.ndarray        # (B, K, max_new) live-beam tokens
        scores: jnp.ndarray        # (B, K) live cumulative logprob
        last: jnp.ndarray          # (B, K)
        penult: jnp.ndarray        # (B, K)
        max_ts: jnp.ndarray        # (B, K)
        fin_tokens: jnp.ndarray    # (B, K, max_new) finished hypotheses
        fin_scores: jnp.ndarray    # (B, K) raw sum logprob (incl. EOT)
        fin_lengths: jnp.ndarray   # (B, K) text length (excl. EOT)
        fin_count: jnp.ndarray     # (B,) slots used

    init_scores = jnp.tile(
        jnp.where(jnp.arange(k) == 0, 0.0, NEG_INF)[None, :], (b, 1)
    )  # only beam 0 is live initially (identical prompts — openai gets the
    # same effect from its candidate dict collapsing identical sequences)

    if prompted:
        last0 = jnp.repeat(prompt_tokens[:, -1], k).reshape(b, k)
        pen_src = prompt_tokens[:, -2] if prompt_len >= 2 else prompt_tokens[:, -1]
        penult0 = jnp.repeat(pen_src, k).reshape(b, k)
    else:
        last0 = jnp.full((b, k), sot_sequence[-1], jnp.int32)
        penult0 = jnp.full((b, k), sot_sequence[0], jnp.int32)
    init = BeamState(
        step=jnp.int32(0),
        cache=cache,
        logits=first_logits,
        tokens=jnp.full((b, k, max_new_tokens), st.eot, jnp.int32),
        scores=init_scores.astype(jnp.float32),
        last=last0.astype(jnp.int32),
        penult=penult0.astype(jnp.int32),
        max_ts=jnp.full((b, k), tb - 1, jnp.int32),
        fin_tokens=jnp.full((b, cap, max_new_tokens), st.eot, jnp.int32),
        fin_scores=jnp.full((b, cap), NEG_INF, jnp.float32),
        fin_lengths=jnp.zeros((b, cap), jnp.int32),
        fin_count=jnp.zeros((b,), jnp.int32),
    )

    def cond(s: BeamState):
        # whisper's is_done: every element holds max_candidates finished
        return (s.step < max_new_tokens) & ~jnp.all(s.fin_count >= m_fin)

    def body(s: BeamState):
        v = s.logits.shape[-1]
        masked = apply_logit_rules(
            s.logits,
            st,
            step=s.step,
            last_token=s.last.reshape(-1),
            penultimate_token=s.penult.reshape(-1),
            max_ts_token=s.max_ts.reshape(-1),
            suppress_mask=suppress_mask,
            use_timestamps=use_timestamps,
            max_initial_timestamp_index=max_initial_ts_index,
            space_blank_id=space_blank_id,
        )
        logprobs = jax.nn.log_softmax(masked, axis=-1).reshape(b, k, v)
        cand = s.scores[:, :, None] + logprobs  # (B, K, V)
        flat = cand.reshape(b, k * v)
        # top 2K: at most one EOT candidate per live beam, so this always
        # contains >= K non-EOT continuations AND every EOT candidate that
        # could outrank the K-th non-EOT one (whisper's per-beam
        # top-(K+1) merge selects the identical sets — see docstring)
        top2, idx2 = jax.lax.top_k(flat, 2 * k)  # (B, 2K), score-desc
        tok2 = (idx2 % v).astype(jnp.int32)
        src2 = idx2 // v
        is_eot2 = tok2 == st.eot

        # --- live-beam selection: first K non-EOT candidates in score order
        pos = jnp.arange(2 * k)[None, :]
        sel_key = jnp.where(is_eot2, 2 * k + pos, pos)  # non-EOT first
        order = jnp.argsort(sel_key, axis=-1)[:, :k]  # (B, K) positions
        next_tok = jnp.take_along_axis(tok2, order, axis=1)
        src_beam = jnp.take_along_axis(src2, order, axis=1)
        new_scores = jnp.take_along_axis(top2, order, axis=1)

        def gather_beam(x):  # x: (B, K, ...)
            return jnp.take_along_axis(
                x, src_beam.reshape(b, k, *([1] * (x.ndim - 2))), axis=1
            )

        tokens = gather_beam(s.tokens)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, next_tok[:, :, None], s.step, axis=2
        )
        last = next_tok
        penult = gather_beam(s.last[..., None])[..., 0]
        max_ts = gather_beam(s.max_ts[..., None])[..., 0]
        max_ts = jnp.where(next_tok >= tb, jnp.maximum(max_ts, next_tok), max_ts)

        # --- finished-set insertion (whisper: EOT candidates ranked above
        # the K-th saved non-EOT join finished_sequences, first-come slots,
        # never evicted, capacity K)
        noneot_before = jnp.cumsum(~is_eot2, axis=-1) - (~is_eot2)  # exclusive
        qual = is_eot2 & (noneot_before < k)
        eot_rank = jnp.cumsum(qual, axis=-1) - qual  # exclusive, in order
        slot = s.fin_count[:, None] + eot_rank  # (B, 2K)
        take_it = qual & (slot < m_fin)
        slot = jnp.where(take_it, slot, cap)  # cap = drop sentinel

        # finished hypothesis tokens: the source beam's buffer — position
        # `step` is still EOT there, which is exactly the terminator
        cand_tokens = jnp.take_along_axis(
            s.tokens, src2[:, :, None], axis=1
        )  # (B, 2K, max_new)

        def scatter_rows(buf, cand, slots):
            # buf (K, ...), cand (2K, ...), slots (2K,) with k = drop
            return buf.at[slots].set(cand, mode="drop")

        fin_tokens = jax.vmap(scatter_rows)(s.fin_tokens, cand_tokens, slot)
        fin_scores = jax.vmap(scatter_rows)(s.fin_scores, top2, slot)
        fin_lengths = jax.vmap(scatter_rows)(
            s.fin_lengths, jnp.broadcast_to(s.step, (b, 2 * k)), slot
        )
        fin_count = jnp.minimum(
            m_fin, s.fin_count + jnp.sum(take_it, axis=-1, dtype=jnp.int32)
        )

        # reorder cache rows: flat row index = b_idx * K + src_beam.
        # The int8 self-cache's per-token scales are row state too — a
        # beam switch that permuted values but not scales would dequantise
        # with another beam's magnitudes.
        row_idx = (jnp.arange(b)[:, None] * k + src_beam).reshape(-1)  # (B*K,)
        reorder = lambda a: (  # noqa: E731
            None if a is None else jnp.take(a, row_idx, axis=1)
        )
        cache = Cache(
            reorder(s.cache.self_k), reorder(s.cache.self_v),
            s.cache.cross_k, s.cache.cross_v,
            s.cache.cross_k_scale, s.cache.cross_v_scale,
            self_k_scale=reorder(s.cache.self_k_scale),
            self_v_scale=reorder(s.cache.self_v_scale),
        )

        step_tok = next_tok.reshape(b * k, 1)
        logits, cache = decoder_forward_cached(
            params, cfg, step_tok, cache, prompt_len + s.step,
            kv_bits=kv_bits_eff, compute_dtype=dtype, tp_mesh=tp_mesh,
            kernel_layout=kernel_layout, **row_kw,
        )
        return BeamState(
            step=s.step + 1,
            cache=cache,
            logits=logits[:, -1],
            tokens=tokens,
            scores=new_scores,
            last=last,
            penult=penult,
            max_ts=max_ts,
            fin_tokens=fin_tokens,
            fin_scores=fin_scores,
            fin_lengths=fin_lengths,
            fin_count=fin_count,
        )

    final = jax.lax.while_loop(cond, body, init)

    # whisper's finalize: elements short of K finished hypotheses top up
    # from the live beams by raw score (EOT appended implicitly — the
    # token buffers are EOT-padded past `step`), WITHOUT adding an EOT
    # logprob to the sum
    live_order = jnp.argsort(-final.scores, axis=-1)  # (B, K) score-desc
    live_tokens = jnp.take_along_axis(
        final.tokens, live_order[:, :, None], axis=1
    )
    live_scores = jnp.take_along_axis(final.scores, live_order, axis=1)
    # top up ONLY elements short of K (whisper finalize); sentinel = cap
    fill_slot = final.fin_count[:, None] + jnp.arange(k)[None, :]
    fill_slot = jnp.where(fill_slot < k, fill_slot, cap)

    def scatter_fill(buf, cand, slots):
        return buf.at[slots].set(cand, mode="drop")

    fin_tokens = jax.vmap(scatter_fill)(final.fin_tokens, live_tokens, fill_slot)
    fin_scores = jax.vmap(scatter_fill)(final.fin_scores, live_scores, fill_slot)
    fin_lengths = jax.vmap(scatter_fill)(
        final.fin_lengths,
        jnp.broadcast_to(final.step, (b, k)).astype(jnp.int32),
        fill_slot,
    )

    # whisper's MaximumLikelihoodRanker: avg logprob (length_penalty=None)
    # or the Google-NMT ((5+len)/6)**penalty normalisation
    lengths_f = jnp.maximum(fin_lengths, 1).astype(jnp.float32)
    if length_penalty is None:
        norm = lengths_f
    else:
        norm = ((5.0 + lengths_f) / 6.0) ** length_penalty
    best = jnp.argmax(fin_scores / norm, axis=-1)  # (B,)
    take = lambda x: jnp.take_along_axis(  # noqa: E731
        x, best.reshape(b, *([1] * (x.ndim - 1))), axis=1
    )[:, 0]
    return DecodeResult(
        tokens=take(fin_tokens),
        lengths=take(fin_lengths),
        sum_logprob=take(fin_scores),
        no_speech_prob=no_speech_prob,
    )


# ---------------------------------------------------------------------------
# Language detection (openai-whisper's detect_language equivalent)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",))
def detect_language(
    params: Params, cfg: WhisperConfig, audio_states: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One decoder step on <|sot|>; returns (lang_index (B,), probs (B, n_lang)).

    lang_index is relative to SpecialTokens.lang_begin (i.e. an index into
    tokenizer.WHISPER_LANGUAGES).
    """
    st = SpecialTokens.for_config(cfg)
    b = audio_states.shape[0]
    cache = init_cache(params, cfg, audio_states, max_len=1)
    sot = jnp.full((b, 1), st.sot, jnp.int32)
    logits, _ = decoder_forward_cached(params, cfg, sot, cache, jnp.int32(0))
    lang_logits = jax.lax.dynamic_slice_in_dim(
        logits[:, 0], st.lang_begin, st.num_languages, axis=-1
    )
    probs = jax.nn.softmax(lang_logits, axis=-1)
    return jnp.argmax(probs, axis=-1), probs


# ---------------------------------------------------------------------------
# Seek semantics (openai-whisper's transcribe-loop window advance)
# ---------------------------------------------------------------------------

def seek_consumed(
    row: np.ndarray, st: SpecialTokens, chunk_length_s: float = 30.0
) -> tuple[float, bool]:
    """How much of a 30 s window this decode actually CONSUMED.

    openai-whisper's transcribe loop advances ``seek`` by the full window
    only when the decode ends cleanly; when text trails after the last
    closed timestamp pair it rewinds to that pair's end and re-decodes the
    straddling speech in the next window (whisper/transcribe.py seek logic,
    inherited by the reference via whisper_model.transcribe at
    app/services/audio_processor.py:1076).  Returns
    ``(consumed_seconds, rewound)``:

      * clean ending (last non-EOT token is a timestamp, or no closed
        segment exists at all) -> (chunk_length_s, False)
      * trailing unclosed text after >=1 closed segment ->
        (last closed end timestamp, True) — the trailing tokens are the
        straddler to re-decode from there.
    """
    toks = [int(t) for t in row if int(t) != st.eot]
    if not toks:
        return chunk_length_s, False
    if toks[-1] >= st.timestamp_begin:
        if len(toks) >= 2 and toks[-2] >= st.timestamp_begin:
            # CONSECUTIVE-timestamp ending: openai's loop rewinds seek to
            # the FIRST timestamp of the pair (single_timestamp_ending is
            # False for a [True, True] tail, so the else-branch advances
            # only to tokens[last_slice - 1] — the close of the last
            # emitted segment).  For a true pair both are equal; for a
            # dangling next-start (<|12|><|14|>) the first is the one
            # openai uses, so audio in [12, 14) is re-decoded, not skipped.
            consumed = (toks[-2] - st.timestamp_begin) * 0.02
            if consumed <= 0.0 or consumed >= chunk_length_s:
                return chunk_length_s, False
            return consumed, True
        return chunk_length_s, False  # single-timestamp ending: clean
    last_closed_end = None
    cur_start = None
    trailing_text = False
    for t in toks:
        if t >= st.timestamp_begin:
            if cur_start is None:
                cur_start = t
            else:
                last_closed_end = t
                cur_start = None
            trailing_text = False
        elif t < st.eot:
            trailing_text = True
    if last_closed_end is None or not trailing_text:
        return chunk_length_s, False
    consumed = (last_closed_end - st.timestamp_begin) * 0.02
    if consumed <= 0.0:
        return chunk_length_s, False  # degenerate: never rewind to 0
    return consumed, True


def truncate_row_after_seek(
    row: np.ndarray, st: SpecialTokens
) -> np.ndarray:
    """Drop the trailing unclosed text a rewound window re-decodes.

    Returns a copy of ``row`` with every token after the last CLOSED
    timestamp pair replaced by EOT (the straddling speech is owned by the
    patch window that re-decodes it — keeping both would duplicate text).
    """
    out = np.asarray(row).copy()
    last_close_idx = None
    cur_start = None
    for i, t in enumerate(int(x) for x in out):
        if t == st.eot:
            break
        if t >= st.timestamp_begin:
            if cur_start is None:
                cur_start = i
            else:
                last_close_idx = i
                cur_start = None
    if last_close_idx is not None:
        out[last_close_idx + 1:] = st.eot
    return out


def keep_closed_segments_before(
    row: np.ndarray, st: SpecialTokens, cut_s: float
) -> tuple[np.ndarray, float | None]:
    """Keep only the CLOSED segments that start (window-local) before
    ``cut_s``; truncate everything after the last of them.

    Returns ``(new_row, last_end_s)`` where last_end_s is the kept
    content's final closing timestamp (None when nothing qualifies — the
    returned row is then all-EOT).  Used to trim a seek-repair patch
    window to the span it owns, so the following grid window keeps the
    rest.
    """
    out = np.asarray(row).copy()
    cur_start = None
    last_keep_idx = None
    last_end_s = None
    for i, t in enumerate(int(x) for x in out):
        if t == st.eot:
            break
        if t >= st.timestamp_begin:
            if cur_start is None:
                cur_start = (t - st.timestamp_begin) * 0.02
            else:
                if cur_start < cut_s:
                    last_keep_idx = i
                    last_end_s = (t - st.timestamp_begin) * 0.02
                cur_start = None
    if last_keep_idx is None:
        return np.full_like(out, st.eot), None
    out[last_keep_idx + 1:] = st.eot
    return out, last_end_s


def drop_segments_before(
    row: np.ndarray, st: SpecialTokens, cut_s: float
) -> np.ndarray:
    """Drop a row's leading segments that START (window-local) before
    ``cut_s`` — their speech was already consumed by a preceding patch
    window.  Keeps everything from the first segment at/after the cut."""
    out = np.asarray(row).copy()
    toks = [int(t) for t in out]
    cur_start_idx = None
    keep_from = None
    for i, t in enumerate(toks):
        if t == st.eot:
            break
        if t >= st.timestamp_begin:
            if cur_start_idx is None:
                cur_start_idx = i
                if (t - st.timestamp_begin) * 0.02 >= cut_s:
                    keep_from = i
                    break
            else:
                cur_start_idx = None
    if keep_from is None:
        return np.full_like(out, st.eot)
    kept = out[keep_from:]
    res = np.full_like(out, st.eot)
    res[: len(kept)] = kept
    return res


# ---------------------------------------------------------------------------
# Token sequence -> timestamped segments (host-side, tiny)
# ---------------------------------------------------------------------------

def tokens_to_segments(
    token_rows: np.ndarray,  # (B, T) decoded rows (EOT-padded)
    st: SpecialTokens,
    chunk_offsets_s: np.ndarray,  # (B,) start time of each 30 s chunk
    decode_text,  # callable: list[int] -> str
    chunk_length_s: float = 30.0,
    chunk_durations_s: np.ndarray | None = None,  # (B,) actual audio seconds
    row_meta: list[dict] | None = None,  # (B,) per-window decode metadata
) -> list[dict]:
    """Parse timestamp tokens into Whisper-schema segments.

    Output rows carry openai-whisper's full segment schema: "start",
    "end", "text", "seek" (the window's offset in openai's 100 frames/s
    units), "tokens" (the segment's token slice INCLUDING its timestamp
    tokens, window-relative — exactly what openai's new_segment emits),
    plus, when ``row_meta`` is given, the per-WINDOW decode metadata
    openai attaches to every segment of the window: "temperature",
    "avg_logprob", "compression_ratio", "no_speech_prob".  The "start" /
    "end" / "text" subset is the shape the reference's fusion loop
    consumes (reference: app/services/audio_processor.py:1114-1119).

    A trailing segment with no closing timestamp token ends at the chunk's
    ACTUAL audio duration (openai-whisper's segment_duration fallback), not
    at the padded 30 s boundary — without this the final chunk of every
    recording gets a systematically stretched end stamp.
    """
    if chunk_durations_s is None:
        chunk_durations_s = np.full(len(token_rows), chunk_length_s)
    if row_meta is None:
        row_meta = [{}] * len(token_rows)
    segments: list[dict] = []
    for row, offset, chunk_dur, meta in zip(
        token_rows, chunk_offsets_s, chunk_durations_s, row_meta
    ):
        toks = [int(t) for t in row if int(t) != st.eot]
        seek = int(round(float(offset) * 100.0))  # openai frame units
        cur_start = None
        cur_text: list[int] = []
        cur_toks: list[int] = []
        last_end = 0.0
        for t in toks:
            if t >= st.timestamp_begin:
                ts = (t - st.timestamp_begin) * 0.02
                if cur_start is None:
                    cur_start = ts
                    cur_toks = [t]
                else:
                    text = decode_text(cur_text).strip()
                    if text:
                        segments.append(
                            {
                                "seek": seek,
                                "start": float(offset + cur_start),
                                "end": float(offset + ts),
                                "text": text,
                                "tokens": cur_toks + [t],
                                **meta,
                            }
                        )
                    last_end = ts
                    cur_start = None
                    cur_text = []
                    cur_toks = []
            elif t < st.eot:
                if cur_start is None:  # no-timestamp decode: one big segment
                    cur_start = last_end
                cur_text.append(t)
                cur_toks.append(t)
        if cur_text:
            text = decode_text(cur_text).strip()
            if text:
                # cur_start is always set before cur_text gains a token
                # (the elif above); no falsy-0.0 fallback — it would both
                # be unreachable and silently rewrite a legitimate 0.0
                start = cur_start
                # clamp keeps end > start even when the unclosed segment
                # opens exactly at chunk_length_s (a max-timestamp token
                # followed by text): zero-length segments degrade fusion
                end = min(
                    max(float(chunk_dur), start + 0.02),
                    max(chunk_length_s, start + 0.02),
                )
                segments.append(
                    {
                        "seek": seek,
                        "start": float(offset + start),
                        "end": float(offset + end),
                        "text": text,
                        "tokens": list(cur_toks),
                        **meta,
                    }
                )
    return segments
