"""End-to-end transcription: audio -> speaker-less timestamped segments.

Replaces the reference's whisper_model.transcribe() call and its
model-size-fallback retry ladder (reference:
app/services/audio_processor.py:1053-1101).  Long audio scales over the
BATCH axis: the recording is cut into 30 s windows that run through
log-mel + encoder + KV-cache decode in fixed-size slabs (default 128
windows — the measured throughput sweet spot), sharded over the mesh's
data axis (SURVEY.md §7 stage 3).

Slabs keep HBM bounded for arbitrarily long meetings, reuse ONE compiled
program after the first (short clips bucket to powers of two), and are
pipelined: decode dispatch is async with two slabs in flight, so host-side
slab assembly overlaps device compute.
"""
from __future__ import annotations

import logging
import math
import os
import threading
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from . import ingest
from ..models.whisper import decode as decode_lib
from ..models.whisper import model as model_lib
from ..models.whisper.config import WhisperConfig, get_config
from ..models.whisper.tokenizer import ByteTokenizer
from ..ops import frontend
from ..parallel import mesh as mesh_lib
from ..utils import timestamps as timestamps_lib
from ..utils.timestamps import TimeMap

logger = logging.getLogger(__name__)

CHUNK_SAMPLES = frontend.N_SAMPLES  # 480_000 = 30 s @ 16 kHz

# openai's default retry rungs ((0, .2, .4, .6, .8, 1) minus the 0 base)
DEFAULT_TEMPERATURE_LADDER = (0.2, 0.4, 0.6, 0.8, 1.0)


# openai-whisper's punctuation set for the hallucination anomaly score
# (whisper/transcribe.py `punctuation`): pure-punctuation "words" carry no
# evidence either way and are excluded from the score
_PUNCTUATION = "\"'“¿([{-\"'.。,，!！?？:：”)]}、"


def _word_anomaly_score(word: dict) -> float:
    """openai-whisper's word_anomaly_score: improbable or implausibly
    short/long words score high (whisper/transcribe.py)."""
    probability = word.get("probability", 0.0)
    duration = word["end"] - word["start"]
    score = 0.0
    if probability < 0.15:
        score += 1.0
    if duration < 0.133:
        score += (0.133 - duration) * 15
    if duration > 2.0:
        score += duration - 2.0
    return score


def _is_segment_anomaly(seg_words: list[dict]) -> bool:
    """openai-whisper's is_segment_anomaly over a segment's words."""
    words = [w for w in seg_words if w["word"] not in _PUNCTUATION][:8]
    if not words:
        return False
    score = sum(_word_anomaly_score(w) for w in words)
    return score >= 3 or score + 0.01 >= len(words)


def filter_hallucinations(
    segments: list[dict],
    words: list[dict],
    threshold: float,
    total_duration: float,
) -> tuple[list[dict], list[dict]]:
    """openai's hallucination_silence_threshold, adapted to the batched grid.

    The sequential engine skips over silent gaps longer than ``threshold``
    when the adjacent segment looks like a hallucination (low word
    probabilities / implausible word durations — whisper/transcribe.py's
    is_segment_anomaly; the reference inherits the surrounding defaults at
    app/services/audio_processor.py:1076).  Here the decision runs as a
    post-pass on the final timeline: an anomalous segment bounded by
    silence (or by another anomaly) on BOTH sides is dropped, together
    with its words.  Returns (segments, words) filtered.
    """
    if not segments:
        return segments, words

    def words_in(seg: dict | None) -> list[dict]:
        if seg is None:
            return []
        return [
            w for w in words
            if seg["start"] - 0.05 <= (w["start"] + w["end"]) / 2 <= seg["end"] + 0.05
        ]

    anomalous = [_is_segment_anomaly(words_in(s)) for s in segments]
    kept: list[dict] = []
    dropped_spans: list[tuple[float, float]] = []
    for si, seg in enumerate(segments):
        if not anomalous[si]:
            kept.append(seg)
            continue
        prev_end = kept[-1]["end"] if kept else 0.0
        nxt = segments[si + 1] if si + 1 < len(segments) else None
        next_start = nxt["start"] if nxt is not None else total_duration
        silence_before = (
            seg["start"] - prev_end > threshold or seg["start"] < threshold
        )
        silence_after = (
            next_start - seg["end"] > threshold
            # openai grants end-proximity with a FIXED 2.0 s window
            # (whisper/transcribe.py window_end_time rule), not the
            # threshold — a large threshold must not delete a real final
            # sentence that more speech follows closely
            or total_duration - seg["end"] < 2.0
            or (nxt is not None and anomalous[si + 1])
        )
        if silence_before and silence_after:
            dropped_spans.append((seg["start"], seg["end"]))
        else:
            kept.append(seg)
    if not dropped_spans:
        return segments, words
    kept_words = [
        w for w in words
        if not any(
            s - 0.05 <= (w["start"] + w["end"]) / 2 <= e + 0.05
            for s, e in dropped_spans
        )
    ]
    return kept, kept_words


def _f32_to_i16(x: np.ndarray) -> np.ndarray:
    """Float32 [-1, 1] audio -> int16, the wire dtype shipped to HBM.

    One definition for every slab/patch assembly site — the grid windows
    and the seek-repair patch windows must quantise identically."""
    return np.clip(x * 32768.0, -32768, 32767).astype(np.int16)


def _bucket(n: int, max_bucket: int = 64) -> int:
    """Round a chunk count up to the next power of two (compile-count cap).

    Above max_bucket, round to multiples of max_bucket instead so a 3-hour
    recording doesn't allocate a 512-chunk batch for 380 chunks.
    """
    if n >= max_bucket:
        return -(-n // max_bucket) * max_bucket
    return 1 << max(0, n - 1).bit_length()


@dataclass
class Transcriber:
    """Holds params + compiled programs for one Whisper variant.

    Thread-safe for inference (params are immutable; jit handles reentrancy).
    """

    params: Any
    cfg: WhisperConfig
    tokenizer: Any = field(default_factory=ByteTokenizer)
    language: int | None = None  # language token index, None = first language
    compute_dtype: str = "bfloat16"
    # parameter STORAGE dtype.  "auto" stores params in compute_dtype when
    # that isn't float32: the compute casts weights to compute_dtype at
    # every use anyway, so f32 storage only doubles the per-step weight
    # stream and the resident param HBM (measured +2.4% RTFx and half the
    # param footprint at whisper-small).  Set None to keep params exactly
    # as loaded (e.g. for f32 parity runs).
    weights_dtype: str | None = "auto"
    max_new_tokens: int = 224
    mesh: Any = None  # jax.sharding.Mesh or None for single-device
    quantize_cross_kv: bool = True  # quantized cross-attention cache
    # nibble-packed int4 cross-KV via the Pallas kernel: halves the decode
    # loop's dominant HBM stream vs int8 — measured 8.68 ms/step vs
    # 12.37 ms (XLA int8) at batch 64 whisper-small on v5e, a 30% step-time
    # win (ops/pallas/decode_attention.py).  Per-(head,channel) scales keep
    # the quantisation error bounded (logit gate in test_whisper_model);
    # set 8 to fall back to the int8 path
    cross_kv_bits: int = 4
    # per-token int8 SELF-attention cache.  Measured a net LOSS on the v5e
    # (1762 -> 1721 RTFx at 96 tokens, 911 -> 831 at 224: write-time
    # quantisation + scale folds cost more than the halved stream saves,
    # since XLA already fuses the bf16 convert into the matmul) — kept
    # OFF; opt-in for memory-constrained configs where the bf16 self cache
    # itself is the HBM problem
    quantize_self_kv: bool = False
    # independent sampling candidates per chunk whenever a decode runs at
    # T>0 (fallback rungs, and every pass when a base `temperature` is
    # set); the best by avg logprob wins (openai's best_of —
    # whisper.transcribe defaults it to 5).  Batch caps account for the
    # expansion via the derived _slab_cap/_retry_cap properties (the
    # declared max_chunk_batch is never rewritten).
    best_of: int = 5
    beam_size: int = 0  # 0 = greedy; >0 = beam at T=0, sampling retries at T>0
    # whisper's beam patience (Kasai et al.): keep searching until
    # round(beam_size * patience) finished hypotheses are collected
    patience: float = 1.0
    # beam ranking normalisation: None = avg logprob (whisper's default),
    # a float = the Google-NMT ((5+len)/6)**penalty form — openai's
    # length_penalty option verbatim
    length_penalty: float | None = None
    # BASE decode temperature (openai's temperature option when given a
    # single float): 0 = deterministic; >0 samples from the start, with
    # best_of candidates.  openai's float form means ONE decode, no
    # retries; pass an explicit temperature_ladder to keep rungs above a
    # non-zero base (openai's tuple form).  See __post_init__.
    temperature: float = 0.0
    # (openai decode_with_fallback: the quality-gate ladder applies to
    # beam rungs too, and its T>0 retries always use sampling)
    # quality-gated temperature fallback (openai-whisper's retry heuristic,
    # which the reference depends on implicitly via model.transcribe):
    # rows with avg logprob < logprob_threshold OR gzip compression ratio >
    # compression_ratio_threshold are re-decoded at increasing temperature.
    # None disables either check (openai's optional_float thresholds).
    # temperature_ladder None = openai's plain-float temperature form:
    # the default (0.2 ... 1.0) retry ladder when temperature == 0, NO
    # retries when it is non-zero.  An explicit tuple = openai's tuple
    # form: its rungs above the base temperature run.
    temperature_ladder: tuple[float, ...] | None = None
    logprob_threshold: float | None = -1.0
    compression_ratio_threshold: float | None = 2.4
    enable_fallback: bool = True
    # drop chunks Whisper itself flags as silence: P(<|nospeech|>) above the
    # threshold AND below-threshold avg logprob (openai-whisper's gate)
    no_speech_threshold: float | None = 0.6
    # openai's suppress_tokens option: None or [-1] = the default
    # non-speech set; a list of ids = exactly those ids (include -1 to add
    # the default set on top) — whisper.DecodingOptions semantics
    suppress_tokens: list[int] | None = None
    # cross-attention DTW word alignment (openai word_timestamps=True).
    # Word boundaries are language-aware exactly as openai's: spaceless
    # languages (zh/ja/th/lo/my/yue) split per unicode codepoint, others
    # on spaces, with punctuation merged into its neighbour via the two
    # option strings below (openai's prepend/append_punctuations).
    word_timestamps: bool = False
    prepend_punctuations: str = "\"'“¿([{-"
    append_punctuations: str = "\"'.。,，!！?？:：”)]}、"
    # openai's hallucination_silence_threshold (seconds): drop anomalous
    # segments (low word probability / implausible word durations) that sit
    # next to silence longer than this.  Requires word_timestamps=True,
    # exactly as openai-whisper does.
    hallucination_silence_threshold: float | None = None
    # fused Pallas log-mel kernel instead of the XLA-fused jnp frontend
    use_pallas_frontend: bool = False
    # fused Pallas encoder self-attention (ops/pallas/encoder_attention).
    # Default OFF: measured 684 ms vs XLA's 501 ms per 128-chunk encode
    # slab on v5e (docs/performance.md "encoder attention probe") — XLA
    # already fuses this pattern well and the kernel's Dh=64 contraction
    # underuses the MXU.  Kept as an A/B lever; only takes effect on a
    # TPU backend (no CPU lowering worth using, and no VJP — training
    # never routes through here)
    use_pallas_encoder_attn: bool = False
    # chunks per device pass: long meetings process in equal slabs so HBM
    # stays bounded and every slab reuses ONE compiled program.  None =
    # auto: 128 (the measured v5e sweet spot for whisper-small with the
    # v3.1 kernel + compute-dtype params — 2284 -> 2622 RTFx vs 64; 192
    # exceeds the 16 GB HBM) or 48 for >= 1024-d models, whose caches OOM
    # at 64+.  An explicit value is always honoured.
    max_chunk_batch: int | None = None
    # "transcribe" or "translate" (X->English): whisper's task token, the
    # same switch openai-whisper exposes as transcribe(task=...)
    task: str = "transcribe"
    # openai-whisper's initial_prompt: text fed as <|startofprev|> context
    # for the FIRST window, kept through that window's temperature-ladder
    # retries (as openai does); with condition_on_previous_text it also
    # seeds the first group's rolling context and persists naturally.
    initial_prompt: str | None = None
    # openai-whisper's carry_initial_prompt: re-prepend the initial_prompt
    # tokens to EVERY window's <|startofprev|> context (not just the
    # first), trimming the rolling history to what still fits — openai's
    # `initial_prompt_tokens + all_tokens[nignored:]` window prompt.  The
    # carried part survives prompt_reset_on_temperature, exactly as
    # openai's nignored = max(len(initial_prompt_tokens), ...) does.
    carry_initial_prompt: bool = False
    # openai-whisper's DecodingOptions.prefix: text appended AFTER the sot
    # sequence in the prefill, so the decode CONTINUES from it (vs the
    # prompt, which precedes the sot as <|startofprev|> context).  Like
    # openai, the prefix tokens sit before sample_begin and never reach
    # the output, the first sampled token is still forced to a timestamp,
    # and the token count is capped at openai's max_prefix_len =
    # n_text_ctx // 2 - sample_len.  Applies to every window (whisper's
    # transcribe loop passes its DecodingOptions unchanged per window).
    prefix: str | None = None
    # auto language detection on the first chunk (multilingual models with
    # no pinned language — whisper's detect_language behaviour)
    auto_language: bool = True
    # openai-whisper's condition_on_previous_text, as the HYBRID window-
    # group mode: windows are conditioned on the previous window's text
    # WITHIN groups of condition_group_size consecutive windows, while
    # groups decode in parallel across the batch — trading the reference
    # engine's fully-sequential chaining for batch parallelism (group
    # boundaries lose conditioning; everything inside a group matches
    # openai's behaviour).  Works with greedy or beam decoding.  The
    # temperature ladder applies in greedy mode: failed rows retry
    # compacted, keeping their prompt up to T=0.5 and dropping it above
    # (openai's prompt_reset_on_temperature rule); beam has no ladder.
    condition_on_previous_text: bool = False
    condition_group_size: int = 8
    condition_ctx_tokens: int = 48
    # openai-whisper's seek-based window advance, adapted to the batched
    # grid: when a window's decode ends with text trailing after its last
    # closed timestamp pair, that speech straddles the 30 s boundary (the
    # sequential reference engine would REWIND seek to the last closed
    # timestamp and re-decode — whisper/transcribe.py's seek loop,
    # inherited by the reference at app/services/audio_processor.py:1076).
    # Here the batched first pass stays untouched; all straddling
    # boundaries are then re-cut at their last closed timestamp and
    # re-decoded together in ONE extra patch slab, whose segments replace
    # the discarded tail of window i and the overlapped head of window
    # i+1.  Cost is one additional bounded decode (only when straddles
    # exist), keeping the throughput of the grid decode.
    seek_repair: bool = True
    # openai's without_timestamps: decode with <|notimestamps|> appended to
    # the sot sequence and the timestamp rules off — each window comes out
    # as ONE segment spanning its real audio (openai's segment_duration
    # fallback, which tokens_to_segments already implements for
    # timestamp-less rows).  Seek repair is moot: with no timestamps openai's
    # own seek loop advances whole 30 s windows, exactly this batched grid.
    without_timestamps: bool = False
    # openai's max_initial_timestamp (seconds): cap on the first sampled
    # timestamp token per window (DecodingOptions default 1.0); None
    # removes the cap.
    max_initial_timestamp: float | None = 1.0

    def __post_init__(self):
        if self.task not in ("transcribe", "translate"):
            raise ValueError(f"task must be transcribe|translate, got {self.task!r}")
        if self.hallucination_silence_threshold is not None and not self.word_timestamps:
            raise ValueError(
                "hallucination_silence_threshold requires word_timestamps=True "
                "(the anomaly score reads word probabilities/durations — same "
                "constraint as openai-whisper)"
            )
        if self.temperature < 0:
            raise ValueError(f"temperature must be >= 0, got {self.temperature}")
        # openai's index form: seconds / 0.02 timestamp precision
        self._max_initial_ts_index = (
            None if self.max_initial_timestamp is None
            else int(round(self.max_initial_timestamp / 0.02))
        )
        # effective fallback rungs.  openai's temperature option: a single
        # FLOAT means exactly one decode at that temperature (no retries —
        # `[temperature] if isinstance(temperature, (int, float)) else
        # temperature`), while the default tuple (0, .2, .4, .6, .8, 1)
        # is the retry ladder.  The None sentinel (not passed) keeps the
        # float semantics; an explicitly supplied ladder keeps its rungs
        # above the base even when it happens to EQUAL the default.
        if self.temperature_ladder is None:
            self._ladder = (
                () if self.temperature > 0 else DEFAULT_TEMPERATURE_LADDER
            )
        else:
            self._ladder = tuple(
                t for t in self.temperature_ladder if t > self.temperature
            )
        self.special = decode_lib.SpecialTokens.for_config(self.cfg)
        if self.language is not None and (
            self.language >= self.special.num_languages
        ):
            raise ValueError(
                f"language index {self.language} is out of range for this "
                f"model's {self.special.num_languages}-language vocabulary "
                "(e.g. 'yue' needs a large-v3 checkpoint)"
            )
        if self.max_chunk_batch is None:
            # medium/large caches exceed the v5e's 16 GB HBM at batch 64+
            # (measured: medium wants 18.8 GB at 64); 48 fits with room
            self.max_chunk_batch = 48 if self.cfg.n_audio_state >= 1024 else 128
        wd = self.weights_dtype
        if wd == "auto":
            wd = None if self.compute_dtype == "float32" else self.compute_dtype
        if wd is not None and jnp.dtype(wd) != jnp.float32:
            target = jnp.dtype(wd)
            self.params = jax.tree.map(
                lambda x: x.astype(target)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                self.params,
            )
        # tensor-parallel serving: distribute the params over the mesh's
        # model axis (Megatron specs, parallel/sharding.py) — without this
        # a model_parallel mesh silently ran data-parallel-only with
        # replicated weights.  Runs AFTER the storage-dtype cast so the
        # host->device transfer ships bf16, not f32-then-cast.  Under TP
        # the int4 cross-KV Pallas kernel runs PER-SHARD (heads on the
        # model axis) via shard_map — decode passes tp_mesh down so GSPMD
        # never has to partition a pallas_call (it can't, and would
        # all-gather the head-sharded cache).
        self._tp_mesh = None
        if (
            self.mesh is not None
            and dict(self.mesh.shape).get(mesh_lib.MODEL_AXIS, 1) > 1
        ):
            from ..parallel import sharding as sharding_lib

            self.params = sharding_lib.shard_params(self.params, self.mesh)
            tp = dict(self.mesh.shape)[mesh_lib.MODEL_AXIS]
            if self.cross_kv_bits == 4:
                if self.cfg.n_text_head % tp == 0:
                    self._tp_mesh = self.mesh
                else:
                    logger.info(
                        "model-parallel mesh: %d heads do not shard over "
                        "tp=%d — falling back to the XLA int8 cross-KV "
                        "path", self.cfg.n_text_head, tp,
                    )
                    self.cross_kv_bits = 8
        # DecodingOptions.prefix -> token ids once (static across windows);
        # openai's cap: max_prefix_len = n_ctx // 2 - sample_len
        self._prefix_tokens: list[int] = []
        if self.prefix:
            toks = [
                int(t)
                for t in self.tokenizer.encode(" " + self.prefix.strip())
                if int(t) < self.special.eot
            ]
            max_prefix_len = self.cfg.n_text_ctx // 2 - self.max_new_tokens
            if max_prefix_len > 0:
                # openai's cap — at the default sample_len (n_ctx//2) it is
                # 0 and openai's `prefix_tokens[-0:]` keeps EVERYTHING (the
                # -0 == 0 slice quirk), so a non-positive cap must not trim
                toks = toks[-max_prefix_len:]
            # hard safety openai lacks: positions past n_text_ctx silently
            # clamp to the last positional embedding here (jnp.take clips),
            # so the prefill + generation budget must fit
            sot_len = len(self.special.sot_sequence(language=0))
            hard = self.cfg.n_text_ctx - self.max_new_tokens - sot_len - 1
            if hard <= 0:
                raise ValueError(
                    f"max_new_tokens={self.max_new_tokens} leaves no room "
                    f"for a prefix within n_text_ctx={self.cfg.n_text_ctx}"
                )
            self._prefix_tokens = toks[-hard:]
        # openai prepends a space and keeps the last n_text_ctx//2 - 1
        # tokens; additionally cap so prompt + sot + max_new_tokens fits
        # n_text_ctx (positions past it would silently clamp to the last
        # positional embedding — jnp.take clips, it doesn't error)
        self._initial_prompt_tokens: list[int] = []
        if self.initial_prompt:
            toks = self.tokenizer.encode(" " + self.initial_prompt.strip())
            sot_len = len(self.special.sot_sequence(language=0)) + len(
                self._prefix_tokens
            )
            cap = min(
                self.cfg.n_text_ctx // 2 - 1,
                self.cfg.n_text_ctx - self.max_new_tokens - sot_len - 1,
            )
            if cap <= 0:
                raise ValueError(
                    f"max_new_tokens={self.max_new_tokens} leaves no room "
                    f"for an initial_prompt within n_text_ctx="
                    f"{self.cfg.n_text_ctx}"
                )
            self._initial_prompt_tokens = [
                int(t) for t in toks if int(t) < self.special.eot
            ][-cap:]
        # per-call detected language.  THREAD-LOCAL: the server shares one
        # Transcriber across max_workers job threads (runtime/services.py),
        # and a plain attribute would let job B's reset clobber job A's
        # detected language mid-transcription (wrong language token AND a
        # recompile from the changed sot sequence).  Each job runs wholly
        # on one worker thread, so TLS gives per-call isolation for free.
        self._lang_tls = threading.local()
        # openai-whisper's default SuppressTokens (non-speech symbols +
        # sot/task/prev/nospeech specials) and SuppressBlank — the rules the
        # reference gets implicitly from whisper.transcribe.  The
        # suppress_tokens option refines it with DecodingOptions semantics:
        # a plain id list REPLACES the default set; -1 in the list mixes
        # the default set back in.
        if self.suppress_tokens is None or list(self.suppress_tokens) == [-1]:
            mask = decode_lib.build_suppress_mask(self.tokenizer, self.special)
        else:
            ids = [int(t) for t in self.suppress_tokens]
            if -1 in ids:
                mask = decode_lib.build_suppress_mask(
                    self.tokenizer, self.special
                )
                ids = [t for t in ids if t >= 0]
            else:
                mask = np.zeros(self.special.n_vocab, bool)
                for t in decode_lib.always_suppressed_specials(self.special):
                    if 0 <= t < self.special.n_vocab:
                        mask[t] = True
            for t in ids:
                if 0 <= t < self.special.n_vocab:
                    mask[t] = True
        self._suppress_mask = jnp.asarray(mask)
        self._space_blank_id = decode_lib.space_blank_token_id(
            self.tokenizer, self.special
        )

        # ONE jit for dequant -> log-mel -> encoder.  Audio ships to the
        # device as int16 (its native bit depth): halves the host->HBM
        # transfer, which dominates wall time behind a tunnelled TPU.
        def _fe(p, chunks_i16):
            audio = chunks_i16.astype(jnp.float32) / 32768.0
            if self.use_pallas_frontend and jax.default_backend() == "tpu":
                from ..ops.pallas.mel_kernel import log_mel_pallas

                mel = log_mel_pallas(audio, n_mels=self.cfg.n_mels)
            else:
                mel = frontend.log_mel_spectrogram(audio, n_mels=self.cfg.n_mels)
            return model_lib.encode(
                p, self.cfg, mel, compute_dtype=jnp.dtype(self.compute_dtype),
                fused_attn=(
                    self.use_pallas_encoder_attn
                    and jax.default_backend() == "tpu"
                ),
            )

        self._frontend_encode = jax.jit(_fe)

    @property
    def _slab_cap(self) -> int:
        """Effective chunk-slab cap for device decodes.

        A base temperature > 0 makes EVERY decode sample with best_of
        candidates — the expansion happens inside the decode (jnp.repeat),
        so the cap shrinks to keep rows x best_of within the HBM budget
        max_chunk_batch encodes.  Derived (never written back to
        max_chunk_batch): dataclasses.replace() re-runs __post_init__, and
        an in-place division would compound on every replace.
        """
        if self.temperature > 0 and self.best_of > 1:
            return max(1, self.max_chunk_batch // self.best_of)
        return self.max_chunk_batch

    @property
    def _retry_cap(self) -> int:
        """Sub-batch cap for quality-fallback re-decodes: retry rungs all
        sample at T>0, so rows expand best_of-fold inside the decode
        regardless of the base temperature."""
        return max(1, self.max_chunk_batch // max(1, self.best_of))

    def _sot_seq(self, lang: int | None) -> tuple[int, ...]:
        """Static prefill sequence: sot tokens + DecodingOptions.prefix
        tokens (openai's _get_initial_tokens layout — sample_begin sits
        past the prefix, so prefix text never reaches the output; prompt
        rows built around this sequence keep the openai ordering
        <|startofprev|> + prompt + sot + prefix)."""
        return tuple(
            self.special.sot_sequence(
                language=lang, task=self.task,
                timestamps=not self.without_timestamps,
            )
        ) + tuple(self._prefix_tokens)

    @property
    def _active_language(self) -> int | None:
        return getattr(self._lang_tls, "value", None)

    @_active_language.setter
    def _active_language(self, v: int | None) -> None:
        self._lang_tls.value = v

    def warmup(self, n_chunks: int | None = None) -> float:
        """Compile the decode programs this instance will serve, now.

        Decode programs are jitted with the option set as static args, so
        the first real request otherwise pays the full compile (minutes on
        a cold TPU) on its request thread.  Transcribes ``n_chunks`` 30-s
        windows of synthetic audio (default: one full production slab) so
        the frontend/encoder, language detection, and the slab-bucket
        decode program all land in the jit cache — and, via the persistent
        compilation cache, on disk.  Returns the wall seconds spent.
        """
        import time as _time

        if n_chunks is None:
            n_chunks = self._slab_cap
        t0 = _time.monotonic()
        sr = 16_000
        t = np.arange(n_chunks * CHUNK_SAMPLES, dtype=np.float32) / sr
        # low-amplitude tone, not zeros: survives the silence trim so the
        # decode path actually runs
        audio = (0.1 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
        self.transcribe(audio, remove_silence=False)
        took = _time.monotonic() - t0
        logger.info(
            "warmup: %d-chunk slab compiled+decoded in %.1f s", n_chunks, took
        )
        return took

    # -- factory ------------------------------------------------------------

    @classmethod
    def random_init(
        cls, name: str = "tiny", seed: int = 0, **kw
    ) -> "Transcriber":
        """Random-weight instance (tests/benches; no checkpoints in image).

        The temperature-fallback ladder is disabled by default here:
        random-weight output always fails the quality gate, which would
        trigger one fresh decode compile per ladder rung for nothing.
        """
        kw.setdefault("enable_fallback", False)
        cfg = get_config(name)
        params = model_lib.init_params(cfg, jax.random.PRNGKey(seed))
        return cls(params=params, cfg=cfg, **kw)

    @classmethod
    def from_npz(
        cls, path: str, tokenizer=None, tokenizer_path: str | None = None, **kw
    ) -> "Transcriber":
        """Load a converted checkpoint as a servable Transcriber.

        Tokenizer resolution (first hit wins): explicit ``tokenizer``
        object > ``tokenizer_path`` / APTPU_TOKENIZER_PATH asset file >
        the vocab embedded in the .npz at convert time > ByteTokenizer
        with a LOUD warning (real weights + byte tokenizer = garbage text;
        the reference never hits this state because whisper.load_model
        bundles both — reference: app/services/audio_processor.py:863).
        """
        import os

        from ..models.whisper import convert
        from ..models.whisper.tokenizer import load_tokenizer_file

        params, cfg = convert.load_params(path)
        if tokenizer is None:
            tok_path = tokenizer_path or os.environ.get("APTPU_TOKENIZER_PATH")
            if tok_path:
                tokenizer = load_tokenizer_file(tok_path)
            else:
                tokenizer = convert.load_tokenizer(path)
                if tokenizer is None:
                    logger.warning(
                        "%s has no embedded tokenizer and no tokenizer asset "
                        "was given (--tokenizer / APTPU_TOKENIZER_PATH) — "
                        "falling back to the byte tokenizer.  If these are "
                        "real Whisper weights the transcripts WILL be "
                        "garbage; re-convert with --tokenizer to embed the "
                        "vocab.",
                        path,
                    )
                    tokenizer = ByteTokenizer()
        return cls(params=params, cfg=cfg, tokenizer=tokenizer, **kw)

    # -- chunking -----------------------------------------------------------

    def _failed_rows(self, result, tokens: np.ndarray, n_real: int) -> np.ndarray:
        """Quality gate per chunk: low avg logprob or repetitive output."""
        # openai divides by len(tokens)+1 with NO floor: an instant-EOT
        # row gets sum/1, keeping its full (bad) magnitude for the gate
        lengths = np.asarray(result.lengths)[:n_real]
        avg_lp = np.asarray(result.sum_logprob)[:n_real] / (lengths + 1)
        # None disables either check (openai's optional thresholds)
        if self.logprob_threshold is None:
            failed = np.zeros(n_real, bool)
        else:
            failed = avg_lp < self.logprob_threshold
        if self.compression_ratio_threshold is not None:
            for i in range(n_real):
                failed[i] |= (
                    self._row_compression_ratio(tokens[i])
                    > self.compression_ratio_threshold
                )
        if self.no_speech_threshold is not None:
            # openai's decode_with_fallback exemption: a window whisper
            # itself flags as no-speech NEVER retries (needs_fallback =
            # False) — it will be gated to silence, and running the ladder
            # both wastes rungs x best_of decodes and can launder a lucky
            # high-temperature sample past the silence gate as text
            nsp = np.asarray(result.no_speech_prob)[:n_real]
            failed &= ~(nsp > self.no_speech_threshold)
        return failed

    def _silent_rows(self, nsp: np.ndarray, avg_lp: np.ndarray) -> np.ndarray:
        """openai's skip rule: silence iff no_speech_prob is high, UNLESS
        the decode is confident (avg_logprob above logprob_threshold —
        with logprob_threshold=None the confidence override is off)."""
        silent = nsp > self.no_speech_threshold
        if self.logprob_threshold is not None:
            silent &= ~(avg_lp > self.logprob_threshold)
        return silent

    def _beam_decode(self, audio_states, sot_seq, rows=None, lens=None):
        """One beam_decode invocation with the Transcriber-derived kwargs
        (three call sites share it: plain, initial_prompt, conditioned)."""
        kw = {}
        if rows is not None:
            kw = dict(
                prompt_tokens=jnp.asarray(rows), prompt_lens=jnp.asarray(lens)
            )
        return decode_lib.beam_decode(
            self.params,
            self.cfg,
            audio_states,
            sot_sequence=sot_seq,
            beam_size=self.beam_size,
            patience=self.patience,
            length_penalty=self.length_penalty,
            max_new_tokens=self.max_new_tokens,
            use_timestamps=not self.without_timestamps,
            max_initial_ts_index=self._max_initial_ts_index,
            suppress_mask=self._suppress_mask,
            space_blank_id=self._space_blank_id,
            dtype_name=self.compute_dtype,
            quantize_cross_kv=self.quantize_cross_kv,
            kv_bits=self.cross_kv_bits,
            tp_mesh=self._tp_mesh,
            quantize_self_kv=self.quantize_self_kv,
            **kw,
        )

    def _carry_hists(self, hists: list[list[int]]) -> list[list[int]]:
        """carry_initial_prompt under conditioning: prepend the initial
        prompt to each row's rolling context, trimming the context tail to
        what fits in condition_ctx_tokens (openai clips all_tokens the
        same way against n_text_ctx // 2 - 1)."""
        ipt = self._initial_prompt_tokens
        if not (self.carry_initial_prompt and ipt):
            return hists
        budget = max(0, self.condition_ctx_tokens - len(ipt))
        return [ipt + (h[-budget:] if budget else []) for h in hists]

    def _run_decode(
        self,
        audio_states,
        temperature: float | None = None,
        seed: int = 0,
        first_row_prompt: bool = False,
    ):
        """Dispatch one slab's decode (ASYNC — result holds device arrays).

        first_row_prompt=True routes through the prompted program with the
        initial_prompt tokens as row 0's <|startofprev|> context (the slab
        holding the meeting's first window); rows with no prompt decode
        identically to plain greedy (pinned by test_parity_prompted).
        temperature=None means the configured BASE temperature.
        """
        if temperature is None:
            temperature = self.temperature
        lang = self._active_language if self._active_language is not None else self.language
        sot_seq = self._sot_seq(lang)
        carry = self.carry_initial_prompt and bool(self._initial_prompt_tokens)
        if (first_row_prompt or carry) and self._initial_prompt_tokens:
            b = audio_states.shape[0]
            # carry_initial_prompt: EVERY window gets the prompt (openai
            # re-prepends it per decode call); else only the meeting's
            # first window (row 0 of the first slab)
            per_row = (
                [self._initial_prompt_tokens] * b
                if carry
                else [self._initial_prompt_tokens] + [[]] * (b - 1)
            )
            rows, lens = decode_lib.build_prompt_rows(
                per_row,
                sot_seq,
                self.special,
                len(self._initial_prompt_tokens),
            )
            if self.beam_size > 0 and temperature == 0:
                return self._beam_decode(audio_states, sot_seq, rows, lens)
            return decode_lib.prompted_greedy_decode(
                self.params,
                self.cfg,
                audio_states,
                jnp.asarray(rows),
                jnp.asarray(lens),
                sot_len=len(sot_seq),
                max_new_tokens=self.max_new_tokens,
                use_timestamps=not self.without_timestamps,
                max_initial_ts_index=self._max_initial_ts_index,
                suppress_mask=self._suppress_mask,
                space_blank_id=self._space_blank_id,
                dtype_name=self.compute_dtype,
                quantize_cross_kv=self.quantize_cross_kv,
                kv_bits=self.cross_kv_bits,
                tp_mesh=self._tp_mesh,
                quantize_self_kv=self.quantize_self_kv,
                temperature=temperature,
                rng_seed=seed,
                best_of=self.best_of,
            )
        if self.beam_size > 0 and temperature == 0:
            return self._beam_decode(audio_states, sot_seq)
        return decode_lib.greedy_decode(
            self.params,
            self.cfg,
            audio_states,
            sot_sequence=sot_seq,
            max_new_tokens=self.max_new_tokens,
            use_timestamps=not self.without_timestamps,
            max_initial_ts_index=self._max_initial_ts_index,
            suppress_mask=self._suppress_mask,
            space_blank_id=self._space_blank_id,
            dtype_name=self.compute_dtype,
            quantize_cross_kv=self.quantize_cross_kv,
            kv_bits=self.cross_kv_bits,
            tp_mesh=self._tp_mesh,
            quantize_self_kv=self.quantize_self_kv,
            temperature=temperature,
            rng_seed=seed,
            best_of=self.best_of,
        )

    def _row_compression_ratio(self, tokens_row) -> float:
        """openai's zlib compression_ratio over one window's decoded text."""
        import zlib

        text_toks = [int(t) for t in tokens_row if int(t) < self.special.eot]
        if not text_toks:
            return 0.0
        raw = self.tokenizer.decode(text_toks).encode("utf-8")
        return (
            round(len(raw) / max(len(zlib.compress(raw)), 1), 4) if raw else 0.0
        )

    def _collect_slab(
        self, result, audio_states, n_real: int, first_slab: bool = False
    ) -> tuple[np.ndarray, dict]:
        """Sync one slab's decode to host and apply the quality gates.

        Returns (tokens, meta) — meta holds the per-WINDOW decode stats
        openai attaches to every segment (avg_logprob / no_speech_prob /
        compression_ratio / temperature), tracking the accepting decode
        through retries.
        """
        tokens = np.array(result.tokens)[:n_real]  # writable copy
        lengths0 = np.asarray(result.lengths)[:n_real]
        meta = {
            "avg_logprob": np.asarray(result.sum_logprob)[:n_real]
            / (lengths0 + 1),
            "no_speech_prob": np.asarray(result.no_speech_prob)[:n_real]
            .astype(np.float64),
            "temperature": np.full(n_real, self.temperature, np.float64),
        }
        if self.enable_fallback:
            # openai keeps initial_prompt through its per-window temperature
            # retries; idx is ascending so the meeting's first window
            # (original row 0) compacts to retry row 0 — exactly where the
            # prompted program applies the prompt
            def redecode(sub_states, part, temp, lo):
                return self._run_decode(
                    sub_states, temp, seed=int(temp * 10),
                    first_row_prompt=bool(
                        first_slab and lo == 0 and part[0] == 0
                    ),
                )

            self._quality_retry(
                result, tokens, n_real, audio_states, meta, redecode,
                "quality fallback",
            )

        # no-speech gate: a chunk is silence iff nospeech prob is high AND
        # the decode was low-confidence (both conditions, as openai-whisper).
        # Gate on the ACCEPTING decode's stats (meta tracks retries) — a
        # window salvaged by a fallback rung must not be blanked for the
        # base decode's bad logprob (openai gates on the final
        # decode_result of decode_with_fallback).
        if self.no_speech_threshold is not None:
            silent = self._silent_rows(
                meta["no_speech_prob"], meta["avg_logprob"]
            )
            tokens[silent] = self.special.eot
        # ratio of the ACCEPTING decode's text, computed once here (the
        # finalize pass reads it from meta instead of re-decoding rows)
        meta["compression_ratio"] = np.asarray(
            [self._row_compression_ratio(r) for r in tokens], np.float64
        )
        return tokens, meta

    def _quality_retry(
        self, result, tokens, n_real, states, meta, redecode, label
    ) -> None:
        """Compacted temperature-ladder retries (openai's
        decode_with_fallback), the ONE loop both the parallel and the
        conditioned paths run: gather only the failed rows (padded to a
        power-of-two bucket for compile-count hygiene) instead of
        re-decoding the whole slab — one bad chunk in a 64-row slab costs
        a 1-row decode per rung, not 64.  ``meta`` arrays track the
        ACCEPTING decode's stats in place; ``redecode(sub_states, part,
        temp, lo)`` dispatches one padded sub-batch.

        best_of expands every retry row best_of-fold inside the decode
        (T>0 rungs) — _retry_cap keeps bucket x best_of within the
        HBM-tuned slab budget (medium's cache OOMs past 48 rows).
        """
        failed = self._failed_rows(result, tokens, n_real)
        for temp in self._ladder:
            if not failed.any():
                break
            idx = np.flatnonzero(failed)
            retry_cap = self._retry_cap
            logger.info(
                "%s: %d/%d chunks re-decoding at T=%.1f "
                "(sub-batches of <=%d x best_of=%d)",
                label, len(idx), n_real, temp, retry_cap, self.best_of,
            )
            failed[:] = False
            for lo in range(0, len(idx), retry_cap):
                part = idx[lo : lo + retry_cap]
                bucket = min(_bucket(len(part)), retry_cap)
                if self.mesh is not None:
                    # shard_map'ed TP kernel + dp sharding need the batch
                    # divisible by the data axis (main slabs are rounded
                    # the same way)
                    bucket = mesh_lib.round_up_batch(bucket, self.mesh)
                pad_idx = np.zeros(bucket, np.int64)
                pad_idx[: len(part)] = part
                sub_states = jnp.take(states, jnp.asarray(pad_idx), axis=0)
                retry = redecode(sub_states, part, temp, lo)
                retry_tokens = np.array(retry.tokens)[: len(part)]
                tokens[part] = retry_tokens
                r_len = np.asarray(retry.lengths)[: len(part)]
                meta["avg_logprob"][part] = (
                    np.asarray(retry.sum_logprob)[: len(part)] / (r_len + 1)
                )
                meta["no_speech_prob"][part] = np.asarray(
                    retry.no_speech_prob
                )[: len(part)]
                meta["temperature"][part] = temp
                refailed = self._failed_rows(retry, retry_tokens, len(part))
                failed[part[refailed]] = True

    # -- seek-based window advance (boundary-straddle repair) ----------------

    def _apply_seek_repair(self, tokens: np.ndarray, n_chunks: int, audio):
        """Re-cut and re-decode boundary-straddling windows in one pass.

        For every window whose decode trails unclosed text after its last
        closed timestamp pair (openai's rewind condition — see
        decode.seek_consumed), a patch window starting at that timestamp is
        decoded; its segments replace the discarded tail of window i and
        the overlapped head of window i+1.  All patches batch into ONE
        extra slab decode, preserving the grid decode's throughput.

        Mutates ``tokens`` rows in place; returns (tokens, patches) where
        patches is None or {"tokens","offsets","durations"[,"states"]}
        for _finalize to merge.
        """
        if not self.seek_repair or self.without_timestamps or n_chunks < 1:
            return tokens, None
        content_s = len(audio) / 16_000.0
        bounds: list[tuple[int, float]] = []
        for i in range(n_chunks):
            consumed, rewound = decode_lib.seek_consumed(
                tokens[i], self.special
            )
            if not (rewound and 1.0 <= consumed <= 29.0):
                continue
            if i == n_chunks - 1 and i * 30.0 + consumed >= content_s - 0.2:
                continue  # final window: nothing left past the rewind point
            bounds.append((i, consumed))
        if not bounds:
            return tokens, None
        logger.info(
            "seek repair: %d/%d windows straddle a 30 s boundary — "
            "re-decoding one patch slab", len(bounds), n_chunks,
        )
        keep_states = self.word_timestamps
        patch_rows: list[np.ndarray] = []
        patch_meta: list[dict] | dict = []
        patch_states: list[tuple[Any, int]] = []
        cap = self._slab_cap
        for lo in range(0, len(bounds), cap):
            batch = bounds[lo : lo + cap]
            bucket = min(_bucket(len(batch)), cap)
            if self.mesh is not None:
                bucket = mesh_lib.round_up_batch(bucket, self.mesh)
            arr = np.zeros((bucket, CHUNK_SAMPLES), np.int16)
            for j, (i, c) in enumerate(batch):
                s0 = i * CHUNK_SAMPLES + int(round(c * 16_000))
                piece = audio[s0 : s0 + CHUNK_SAMPLES]
                arr[j, : len(piece)] = _f32_to_i16(piece)
            dev = jnp.asarray(arr)
            if self.mesh is not None:
                dev = jax.device_put(dev, mesh_lib.data_sharding(self.mesh))
            states = self._frontend_encode(self.params, dev)
            result = self._run_decode(states)
            ptoks, pmeta = self._collect_slab(result, states, len(batch))
            patch_rows.append(ptoks)
            patch_meta.append(pmeta)
            if keep_states:
                patch_states.append((states, len(batch)))
        patch_tokens = np.concatenate(patch_rows, axis=0)
        patch_meta = {
            k: np.concatenate([m[k] for m in patch_meta])
            for k in patch_meta[0]
        }

        kept_rows, kept_offsets, kept_durations, kept_idx = [], [], [], []
        for j, (i, c) in enumerate(bounds):
            offset = i * 30.0 + c
            # window i+1's start, patch-local; the FINAL window has no
            # successor, so every closed patch segment is kept
            boundary_local = 30.0 - c if i + 1 < n_chunks else 30.0
            row = patch_tokens[j]
            trimmed, last_end_local = decode_lib.keep_closed_segments_before(
                row, self.special, boundary_local
            )
            if last_end_local is None:
                if any(int(t) < self.special.eot for t in row):
                    # no closed segment before the boundary: the whole
                    # patch is one long straddler — take it as-is (its
                    # unclosed tail ends at the patch window edge)
                    trimmed = np.asarray(row).copy()
                    last_end_local = min(30.0, max(content_s - offset, 0.02))
                else:
                    # patch gated to silence: window i's trailing text was
                    # hallucination next to the boundary — just drop it
                    tokens[i] = decode_lib.truncate_row_after_seek(
                        tokens[i], self.special
                    )
                    continue
            tokens[i] = decode_lib.truncate_row_after_seek(
                tokens[i], self.special
            )
            taken_end_global = offset + last_end_local
            next_start = (i + 1) * 30.0
            if i + 1 < n_chunks and taken_end_global > next_start + 0.1:
                tokens[i + 1] = decode_lib.drop_segments_before(
                    tokens[i + 1], self.special, taken_end_global - next_start
                )
            kept_rows.append(trimmed)
            kept_offsets.append(offset)
            kept_durations.append(min(30.0, max(content_s - offset, 0.02)))
            kept_idx.append(j)
        if not kept_rows:
            return tokens, None
        kept = np.asarray(kept_idx)
        patches: dict[str, Any] = {
            "tokens": np.stack(kept_rows),
            "offsets": np.asarray(kept_offsets, np.float64),
            "durations": np.asarray(kept_durations, np.float64),
            "meta": {k: v[kept] for k, v in patch_meta.items()},
        }
        if keep_states:
            all_states = jnp.concatenate(
                [s[:n] for s, n in patch_states], axis=0
            )
            patches["states"] = jnp.take(
                all_states, jnp.asarray(kept_idx), axis=0
            )
        return tokens, patches

    # -- language detection ---------------------------------------------------

    @staticmethod
    def _voting_k(n_chunks: int) -> int:
        """Number of leading chunks that vote on the language: the largest
        power of two <= min(n_chunks, 8) (power of two keeps the
        detect-language program count bounded)."""
        kk = max(1, min(n_chunks, 8))
        return 1 << (kk.bit_length() - 1)

    @staticmethod
    def _vote_language(
        audio: np.ndarray, ids: list[int], probs: np.ndarray
    ) -> int:
        """Average the per-chunk language distributions of the
        speech-bearing voter chunks and return the winning index."""
        rms = np.array(
            [
                float(
                    np.sqrt(
                        np.mean(
                            np.square(
                                audio[ci * CHUNK_SAMPLES : (ci + 1) * CHUNK_SAMPLES],
                                dtype=np.float64,
                            )
                        )
                        + 1e-12
                    )
                )
                for ci in ids
            ]
        )
        # -54 dBFS absolute floor AND within 20 dB of the loudest chunk
        voters = np.flatnonzero((rms >= 2e-3) & (rms >= 0.1 * rms.max()))
        if voters.size == 0:
            voters = np.array([int(rms.argmax())])
        mean_probs = np.asarray(probs)[voters].mean(axis=0)
        return int(mean_probs.argmax())

    def _detect_language_voting(
        self, audio: np.ndarray, audio_states, chunk_ids: list[int]
    ) -> int:
        """Detect language by VOTING over the first several speech-bearing
        chunks instead of blindly trusting chunk 0 (a meeting that opens
        with music/silence pinned the wrong language for the whole job —
        round-1 review weak #4).  Chunks whose RMS energy is near-silence
        are excluded from the vote; the per-chunk language distributions
        of the rest are averaged."""
        k = self._voting_k(len(chunk_ids))
        ids = chunk_ids[:k]
        _, probs = decode_lib.detect_language(
            self.params, self.cfg, audio_states[:k]
        )
        return self._vote_language(audio, ids, np.asarray(probs))

    # -- conditioned (window-group) decoding ---------------------------------

    def _chunk_slab(self, audio: np.ndarray, chunk_ids: list[int], bucket: int):
        """Assemble an int16 (bucket, CHUNK_SAMPLES) slab for given chunks."""
        return self._chunk_slab_pairs(
            [audio], [(0, ci) for ci in chunk_ids], bucket
        )

    def _chunk_slab_pairs(
        self,
        audios: list[np.ndarray],
        pairs: list[tuple[int, int]],
        bucket: int,
    ):
        """Assemble an int16 (bucket, CHUNK_SAMPLES) slab whose rows come
        from SEVERAL recordings: each pair is (audio index, chunk index).
        The multi-file generalisation of _chunk_slab (same quantisation,
        same sharding) for cross-request batched serving."""
        chunk_arr = np.zeros((bucket, CHUNK_SAMPLES), np.int16)
        for j, (fi, ci) in enumerate(pairs):
            piece = audios[fi][ci * CHUNK_SAMPLES : (ci + 1) * CHUNK_SAMPLES]
            chunk_arr[j, : len(piece)] = _f32_to_i16(piece)
        chunks_dev = jnp.asarray(chunk_arr)
        if self.mesh is not None:
            chunks_dev = jax.device_put(
                chunks_dev, mesh_lib.data_sharding(self.mesh)
            )
        return chunks_dev

    def _transcribe_conditioned(
        self, audio: np.ndarray, n_chunks: int, progress=None,
        on_segment=None, time_map=None,
    ) -> tuple[np.ndarray, list, dict]:
        """Window-group conditioned decode (see condition_on_previous_text).

        Round r decodes window r of EVERY group in one batch, prompted with
        <|startofprev|> + the group's accumulated text (openai's prompt
        mechanism, reference: whisper.transcribe defaults inherited at
        app/services/audio_processor.py:1076).  G rounds total, so wall
        time ~G sequential decodes of batch ceil(n_chunks/G).
        """
        g_size = max(1, self.condition_group_size)
        n_groups = math.ceil(n_chunks / g_size)
        token_rows = np.full(
            (n_chunks, self.max_new_tokens), self.special.eot, np.int32
        )
        chunk_meta = {
            "avg_logprob": np.zeros(n_chunks, np.float64),
            "no_speech_prob": np.zeros(n_chunks, np.float64),
            "compression_ratio": np.zeros(n_chunks, np.float64),
            "temperature": np.full(n_chunks, self.temperature, np.float64),
        }
        histories: list[list[int]] = [[] for _ in range(n_groups)]
        # initial_prompt seeds the first group's rolling context (openai
        # keeps it in all_tokens, so it persists under conditioning) —
        # except under carry_initial_prompt, where _carry_hists prepends it
        # to every prompt instead (openai skips the initial tokens from
        # all_tokens via nignored to avoid doubling them)
        if not self.carry_initial_prompt:
            histories[0] = list(self._initial_prompt_tokens)
        # word_timestamps: rounds visit chunks in scattered order, so the
        # encoder states are RETAINED on device per sub-batch and
        # re-ordered into chunk order at the end for the alignment pass
        kept_states: list[tuple[list[int], Any]] = []

        for r in range(g_size):
            chunk_ids = [
                g * g_size + r for g in range(n_groups) if g * g_size + r < n_chunks
            ]
            if not chunk_ids:
                break
            bucket = min(_bucket(len(chunk_ids)), self._slab_cap)
            if self.mesh is not None:
                bucket = mesh_lib.round_up_batch(bucket, self.mesh)
            # NOTE: groups beyond max_chunk_batch decode in sub-batches
            for lo in range(0, len(chunk_ids), bucket):
                ids = chunk_ids[lo : lo + bucket]
                states = self._frontend_encode(
                    self.params, self._chunk_slab(audio, ids, bucket)
                )
                if (
                    r == 0
                    and lo == 0
                    and self.auto_language
                    and self.language is None
                    and self.cfg.is_multilingual
                ):
                    self._active_language = self._detect_language_voting(
                        audio, states, ids
                    )
                lang = (
                    self._active_language
                    if self._active_language is not None
                    else self.language
                )
                sot_seq = self._sot_seq(lang)
                hists = [histories[ci // g_size] for ci in ids]

                def run_prompted(sub_states, sub_hists, temp, seed):
                    n_pad = sub_states.shape[0] - len(sub_hists)
                    sub_hists = self._carry_hists(sub_hists)
                    max_ctx = self.condition_ctx_tokens
                    if self.carry_initial_prompt:
                        max_ctx = max(max_ctx, len(self._initial_prompt_tokens))
                    rows, lens = decode_lib.build_prompt_rows(
                        sub_hists + [[]] * n_pad, sot_seq, self.special,
                        max_ctx,
                    )
                    if self.beam_size > 0 and temp == 0:
                        return self._beam_decode(sub_states, sot_seq, rows, lens)
                    return decode_lib.prompted_greedy_decode(
                        self.params,
                        self.cfg,
                        sub_states,
                        jnp.asarray(rows),
                        jnp.asarray(lens),
                        sot_len=len(sot_seq),
                        max_new_tokens=self.max_new_tokens,
                        use_timestamps=not self.without_timestamps,
                        max_initial_ts_index=self._max_initial_ts_index,
                        suppress_mask=self._suppress_mask,
                        space_blank_id=self._space_blank_id,
                        dtype_name=self.compute_dtype,
                        quantize_cross_kv=self.quantize_cross_kv,
                        kv_bits=self.cross_kv_bits,
                        tp_mesh=self._tp_mesh,
                        quantize_self_kv=self.quantize_self_kv,
                        temperature=temp,
                        rng_seed=seed,
                        best_of=self.best_of,
                    )

                # openai's prompt_reset_on_temperature: above T=0.5 the
                # rolling context is dropped — for the base temperature too
                base_hists = (
                    hists if self.temperature <= 0.5 else [[] for _ in hists]
                )
                result = run_prompted(states, base_hists, self.temperature, 0)
                n_real = len(ids)
                tokens = np.array(result.tokens)[:n_real]
                lengths = np.asarray(result.lengths)[:n_real]
                avg_lp = np.asarray(result.sum_logprob)[:n_real] / (lengths + 1)
                nsp = np.asarray(result.no_speech_prob)[:n_real].astype(
                    np.float64
                )
                row_temp = np.full(n_real, self.temperature, np.float64)

                if self.enable_fallback:
                    # same quality gate + compacted retry as the parallel
                    # path (ONE shared loop); conditioning stops above
                    # T=0.5, matching openai-whisper's
                    # prompt_reset_on_temperature.  Beam rows that fail
                    # retry through SAMPLING at T>0 — the exact
                    # decode_with_fallback ladder openai runs
                    def redecode(sub_states, part, temp, lo2):
                        sub_hists = [
                            hists[i] if temp <= 0.5 else [] for i in part
                        ]
                        return run_prompted(
                            sub_states, sub_hists, temp, int(temp * 10)
                        )

                    retry_meta = {
                        "avg_logprob": avg_lp,
                        "no_speech_prob": nsp,
                        "temperature": row_temp,
                    }
                    self._quality_retry(
                        result, tokens, n_real, states, retry_meta,
                        redecode, "conditioned fallback",
                    )

                if self.no_speech_threshold is not None:
                    # gate on the accepting decode's stats (nsp/avg_lp
                    # track retries), as the parallel path does
                    silent = self._silent_rows(nsp, avg_lp)
                    tokens[silent] = self.special.eot
                for j, ci in enumerate(ids):
                    token_rows[ci] = tokens[j]
                    chunk_meta["avg_logprob"][ci] = avg_lp[j]
                    chunk_meta["no_speech_prob"][ci] = nsp[j]
                    chunk_meta["compression_ratio"][ci] = (
                        self._row_compression_ratio(tokens[j])
                    )
                    chunk_meta["temperature"][ci] = row_temp[j]
                    text_toks = [
                        int(t) for t in tokens[j] if int(t) < self.special.eot
                    ]
                    histories[ci // g_size].extend(text_toks)
                if on_segment is not None:
                    self._emit_live_segments(
                        on_segment, tokens[: len(ids)],
                        np.asarray(ids, np.float64),
                        len(audio) / 16_000.0, time_map,
                    )
                if self.word_timestamps:
                    kept_states.append((ids, states))
            if progress:
                progress(0.1 + 0.8 * (r + 1) / g_size)

        states_per_slab: list[Any] = []
        if self.word_timestamps and kept_states:
            order_ids = np.concatenate([np.asarray(ids) for ids, _ in kept_states])
            all_states = jnp.concatenate(
                [s[: len(ids)] for ids, s in kept_states], axis=0
            )
            all_states = jnp.take(
                all_states, jnp.asarray(np.argsort(order_ids)), axis=0
            )  # back into chunk order
            slab = min(_bucket(n_chunks), self._slab_cap)
            if self.mesh is not None:
                slab = mesh_lib.round_up_batch(slab, self.mesh)
            states_per_slab = [
                all_states[lo : lo + slab] for lo in range(0, n_chunks, slab)
            ]
        return token_rows, states_per_slab, chunk_meta

    # -- main entry ---------------------------------------------------------

    def _emit_live_segments(
        self, on_segment, token_rows, window_idx, content_s, time_map
    ) -> None:
        """Parse the given windows' tokens and stream their segments to the
        on_segment callback in original-timeline stamps (openai's verbose
        print, emitted as each window's decode lands)."""
        offs = np.asarray(window_idx, np.float64) * 30.0
        durs = np.clip(content_s - offs, 0.0, 30.0)
        for seg in decode_lib.tokens_to_segments(
            token_rows, self.special, offs, self.tokenizer.decode,
            chunk_durations_s=durs,
        ):
            on_segment(
                {
                    **seg,
                    "start": round(time_map.to_original(seg["start"]), 3),
                    "end": round(time_map.to_original(seg["end"]), 3),
                }
            )

    def detect_language(
        self,
        audio: "np.ndarray | str | os.PathLike",
        sample_rate: int = 16_000,
    ) -> dict:
        """openai's ``model.detect_language`` surface on the first 30 s.

        Returns {"language": iso_code, "probabilities": {code: p, ...}}
        sorted by probability (openai returns (tokens, prob-dict); the
        reference never calls it directly but inherits auto-detection via
        whisper.transcribe — app/services/audio_processor.py:1076).
        """
        if not self.cfg.is_multilingual:
            raise ValueError(
                "detect_language requires a multilingual model "
                "(this config has no language tokens)"
            )
        # path inputs: only the first 30 s window is scored, so bound the
        # decode instead of paying a whole-file decode for the probe
        audio, sample_rate = ingest.load_if_path(audio, sample_rate, max_s=30.0)
        audio = np.asarray(audio, np.float32)
        if sample_rate != 16_000:
            audio = np.asarray(
                frontend.resample(jnp.asarray(audio), sample_rate)
            )
        states = self._frontend_encode(
            self.params, self._chunk_slab(audio, [0], 1)
        )
        _, probs = decode_lib.detect_language(self.params, self.cfg, states)
        probs = np.asarray(probs)[0]
        from ..models.whisper.tokenizer import (
            WHISPER_LANGUAGES,
            WHISPER_LANGUAGES_V3,
        )

        # large-v3 models carry 100 language tokens (incl. "yue") — pick
        # the table by the model's token count, as _language_code does
        langs = (
            WHISPER_LANGUAGES_V3
            if self.special.num_languages >= 100
            else WHISPER_LANGUAGES
        )
        pairs = sorted(
            zip(langs[: len(probs)], probs.tolist()),
            key=lambda kv: -kv[1],
        )
        return {"language": pairs[0][0], "probabilities": dict(pairs)}

    def transcribe(
        self,
        audio: "np.ndarray | str | os.PathLike",
        *,
        sample_rate: int = 16_000,
        remove_silence: bool = True,
        clip_timestamps: list[tuple[float, float]] | None = None,
        time_map: TimeMap | None = None,
        progress: Callable[[float], None] | None = None,
        on_segment: Callable[[dict], None] | None = None,
    ) -> dict:
        """Full transcription of arbitrary-length mono audio.

        ``audio`` may also be a file path (str/PathLike), decoded through
        the ingest stack — openai's ``transcribe(audio: str | ndarray)``
        convention, which the reference uses with a path
        (app/services/audio_processor.py:1076).

        on_segment: live segment stream (openai-whisper's verbose=True
        printing, audio_processor.py:1076 inherits it) — called with each
        {"start","end","text"} as its decode window drains, original-
        timeline stamps, BEFORE seek repair / word alignment / the
        hallucination filter touch the final list.  Windows arrive in
        batch order (conditioned mode completes them round-by-round, so
        late groups may emit earlier windows); the returned "segments"
        list stays the canonical ordered result.

        Returns {"text", "segments": [{start, end, text}], "duration",
        "rtf_x"} with timestamps in the ORIGINAL timeline even when silence
        was removed (reference's advertised-but-missing feature,
        README.md:17 vs audio_processor.py:305-314).

        clip_timestamps: openai-whisper's option — transcribe only within
        the given (start, end) second ranges; timestamps still come out in
        the original recording's timeline (clips stack with silence
        trimming via interval composition).
        """
        import time as _time

        t0 = _time.perf_counter()
        audio, sample_rate = ingest.load_if_path(audio, sample_rate)
        self._active_language = None  # re-detected per call
        duration_s = len(audio) / sample_rate

        if sample_rate != 16_000:
            audio = np.asarray(frontend.resample(jnp.asarray(audio), sample_rate))

        if clip_timestamps and time_map is not None:
            raise ValueError(
                "clip_timestamps cannot be combined with an explicit "
                "time_map — compose the clips into the map instead"
            )
        if time_map is None:
            clip_map = None
            if clip_timestamps:
                clips = []
                for s, e in clip_timestamps:
                    s2 = min(max(0.0, float(s)), duration_s)
                    e2 = min(max(0.0, float(e)), duration_s)
                    if e2 > s2:
                        clips.append((s2, e2))
                if not clips:
                    raise ValueError(
                        f"clip_timestamps {clip_timestamps!r} selects no "
                        f"audio within the {duration_s:.1f}s recording"
                    )
                clip_map = TimeMap(clips)
                audio = np.concatenate(
                    [
                        audio[int(s * 16_000): int(e * 16_000)]
                        for s, e in clips
                    ]
                    or [np.zeros(0, np.float32)]
                )
            if remove_silence and len(audio) > 2 * 16_000:
                audio, intervals = frontend.trim_silence_host(audio)
                if clip_map is not None:
                    intervals = timestamps_lib.compose_intervals(
                        clip_map, intervals
                    )
                time_map = TimeMap(intervals)
            elif clip_map is not None:
                time_map = clip_map
            else:
                time_map = TimeMap.identity(duration_s)

        # slab-wise: long meetings process in fixed-size slabs so HBM stays
        # bounded and every slab after the first reuses the compiled program
        n_chunks = max(1, math.ceil(len(audio) / CHUNK_SAMPLES))
        slab = min(_bucket(n_chunks), self._slab_cap)
        if self.mesh is not None:
            slab = mesh_lib.round_up_batch(slab, self.mesh)

        if self.condition_on_previous_text:
            tokens, cond_states, chunk_meta = self._transcribe_conditioned(
                audio, n_chunks, progress,
                on_segment=on_segment, time_map=time_map,
            )
            tokens, patches = self._apply_seek_repair(tokens, n_chunks, audio)
            return self._finalize(
                tokens, n_chunks, duration_s, time_map, t0, progress,
                states_per_slab=cond_states, slab=slab, audio=audio,
                patches=patches, chunk_meta=chunk_meta,
            )

        token_rows: list[np.ndarray] = []
        meta_rows: list[dict] = []
        states_per_slab: list[Any] = []  # kept only for word alignment
        n_slabs = math.ceil(n_chunks / slab)
        in_flight: list[tuple[Any, Any, int, bool]] = []  # (result, states, real, first)
        # drop the encoder-state reference right after decode dispatch when
        # nothing downstream re-reads it (no temperature retries, no word
        # alignment): frees ~300 MB/slab of HBM at whisper-small batch 64
        # instead of holding it across the 2-deep decode pipeline.  (XLA
        # input donation can't do this — see note at decode.greedy_decode.)
        keep_states = (
            self.enable_fallback or self.word_timestamps or self.beam_size > 0
        )

        content_s = len(audio) / 16_000.0
        drained = [0]  # windows drained so far (live-segment offsets)

        def drain_one():
            result, states, real, first = in_flight.pop(0)
            toks, meta = self._collect_slab(result, states, real, first_slab=first)
            token_rows.append(toks)
            meta_rows.append(meta)
            if self.word_timestamps:
                states_per_slab.append(states)
            if on_segment is not None:
                self._emit_live_segments(
                    on_segment, toks,
                    drained[0] + np.arange(real, dtype=np.float64),
                    content_s, time_map,
                )
            drained[0] += real

        for si in range(n_slabs):
            lo = si * slab
            real = min(slab, n_chunks - lo)
            audio_states = self._frontend_encode(
                self.params,
                self._chunk_slab(audio, list(range(lo, lo + real)), slab),
            )
            if (
                si == 0
                and self.auto_language
                and self.language is None
                and self.cfg.is_multilingual
            ):
                self._active_language = self._detect_language_voting(
                    audio, audio_states, list(range(real))
                )
            # dispatch decode ASYNC and keep <=2 slabs in flight: the host
            # builds slab i+1 while the device decodes slab i (hides this
            # VM's jittery host time behind stable device time)
            in_flight.append(
                (
                    self._run_decode(audio_states, first_row_prompt=(si == 0)),
                    audio_states if keep_states else None,
                    real,
                    si == 0,
                )
            )
            del audio_states
            if len(in_flight) >= 2:
                drain_one()
            if progress:
                progress(0.1 + 0.8 * (si + 1) / n_slabs)
        while in_flight:
            drain_one()

        tokens = np.concatenate(token_rows, axis=0)
        chunk_meta = {
            k: np.concatenate([m[k] for m in meta_rows])
            for k in meta_rows[0]
        }
        tokens, patches = self._apply_seek_repair(tokens, n_chunks, audio)
        return self._finalize(
            tokens, n_chunks, duration_s, time_map, t0, progress,
            states_per_slab=states_per_slab, slab=slab, audio=audio,
            patches=patches, chunk_meta=chunk_meta,
        )

    # -- cross-request batched transcription ---------------------------------

    def _detect_languages_batch(
        self, audios: list[np.ndarray], n_chunks_per: list[int]
    ) -> tuple[list[int], dict[tuple[int, int], tuple[Any, int]]]:
        """Per-file language detection for a batch of recordings in shared
        encode+detect slabs (the batched counterpart of
        _detect_language_voting — same voter chunks, same RMS voting
        rule, one detect program call per slab instead of per file).

        Returns (languages, state_bank): state_bank maps (file, chunk) ->
        (slab states array, row) for every voter chunk encoded here, so
        the decode loop can REUSE these encoder rows instead of paying the
        encode twice (for 1-2-window clips — the dynamic-batching serving
        profile — the voter rows ARE the decode rows).
        """
        rows: list[tuple[int, int]] = []
        spans: list[tuple[int, int]] = []  # (first row, k) per file
        for fi, n in enumerate(n_chunks_per):
            # vote over the same chunks the single-file path sees: its
            # detection states come from the FIRST decode slab, so the
            # voter pool is capped by the slab, not just by 8
            slab_f = min(_bucket(n), self._slab_cap)
            if self.mesh is not None:
                slab_f = mesh_lib.round_up_batch(slab_f, self.mesh)
            k = self._voting_k(min(n, slab_f))
            spans.append((len(rows), k))
            rows += [(fi, ci) for ci in range(k)]
        cap = self._slab_cap
        prob_parts: list[np.ndarray] = []
        state_bank: dict[tuple[int, int], tuple[Any, int]] = {}
        for lo in range(0, len(rows), cap):
            part = rows[lo : lo + cap]
            bucket = min(_bucket(len(part)), cap)
            if self.mesh is not None:
                bucket = mesh_lib.round_up_batch(bucket, self.mesh)
            padded = part + [part[-1]] * (bucket - len(part))
            states = self._frontend_encode(
                self.params, self._chunk_slab_pairs(audios, padded, bucket)
            )
            _, probs = decode_lib.detect_language(self.params, self.cfg, states)
            prob_parts.append(np.asarray(probs)[: len(part)])
            for j, pair in enumerate(part):
                state_bank[pair] = (states, j)
        all_probs = np.concatenate(prob_parts, axis=0)
        return [
            self._vote_language(
                audios[fi], list(range(k)), all_probs[lo : lo + k]
            )
            for fi, (lo, k) in enumerate(spans)
        ], state_bank

    @property
    def supports_shared_slabs(self) -> bool:
        """True when transcribe_batch can pack several files into shared
        decode slabs.  False when an option needs per-file decode state
        INSIDE the slab — rolling conditioning context, or a first-window-
        only initial_prompt — making transcribe_batch fall back to
        sequential per-file calls (servers use this to skip coalescing
        such option sets: serialising N requests under one decode slot
        would only ADD latency)."""
        return not (
            self.condition_on_previous_text
            or (bool(self._initial_prompt_tokens)
                and not self.carry_initial_prompt)
        )

    @staticmethod
    def _gather_state_rows(
        bank: dict[tuple[int, int], tuple[Any, int]],
        pairs: list[tuple[int, int]],
        bucket: int,
    ):
        """Assemble a (bucket, ...) encoder-states slab from banked rows
        (row values are identical to a fresh encode — the encoder is
        row-independent), padding with the first row."""
        uniq: list[Any] = []
        offsets: dict[int, int] = {}
        rows: list[int] = []
        for pair in pairs:
            src, r = bank[pair]
            if id(src) not in offsets:
                offsets[id(src)] = sum(int(s.shape[0]) for s in uniq)
                uniq.append(src)
            rows.append(offsets[id(src)] + r)
        rows += [rows[0]] * (bucket - len(rows))
        all_states = uniq[0] if len(uniq) == 1 else jnp.concatenate(uniq, axis=0)
        return jnp.take(all_states, jnp.asarray(rows), axis=0)

    def transcribe_batch(
        self,
        audios: "list[np.ndarray | str | os.PathLike]",
        *,
        sample_rate: int = 16_000,
        remove_silence: bool = True,
        on_segment: Callable[[int, dict], None] | None = None,
    ) -> list[dict]:
        """Transcribe SEVERAL independent recordings in SHARED decode slabs.

        Cross-request dynamic batching for the many-small-files serving
        profile (the /v1 OpenAI surface): 30 s windows from every file
        pack into the same fixed-size slabs the single-file path uses, so
        N concurrent short uploads cost ~one slab decode instead of N
        under-filled ones.  Per-file semantics are unchanged — each file
        keeps its own silence-trim TimeMap, voted language, seek repair
        and finalize; a window's decode depends only on its own audio, so
        each result matches what transcribe() returns for that file alone
        (rtf_x reports the file's share of the shared batch wall time).
        Files whose detected/pinned languages differ decode in separate
        per-language sub-batches (the sot sequence is a static argument
        of the compiled decode).

        word_timestamps rides the shared slabs too (encoder states are
        retained per slab and re-gathered per file for the alignment
        pass), and on_segment — called as on_segment(file_idx, segment)
        as each window's decode drains — gives per-file live streaming.
        Falls back to sequential per-file transcribe() calls when an
        option needs per-file decode state INSIDE the slab: rolling
        conditioning context, or a first-window-only initial_prompt.

        The reference serves every request through one sequential
        whisper.transcribe call per job (reference:
        app/services/audio_processor.py:1076) — there is no batching of
        any kind to mirror; this is the TPU-shaped design (fill the MXU's
        batch dimension) applied across requests.
        """
        import time as _time

        t0 = _time.perf_counter()
        if not audios:
            return []
        if not self.supports_shared_slabs:
            return [
                self.transcribe(
                    a, sample_rate=sample_rate, remove_silence=remove_silence,
                    on_segment=(
                        (lambda seg, fi=fi: on_segment(fi, seg))
                        if on_segment is not None else None
                    ),
                )
                for fi, a in enumerate(audios)
            ]

        # per-file preprocessing — exactly the transcribe() head
        trimmed: list[np.ndarray] = []
        time_maps: list[TimeMap] = []
        durations_s: list[float] = []
        n_chunks_per: list[int] = []
        for audio in audios:
            audio, sr = ingest.load_if_path(audio, sample_rate)
            audio = np.asarray(audio, np.float32)
            duration_s = len(audio) / sr
            if sr != 16_000:
                audio = np.asarray(
                    frontend.resample(jnp.asarray(audio), sr)
                )
            if remove_silence and len(audio) > 2 * 16_000:
                audio, intervals = frontend.trim_silence_host(audio)
                time_map = TimeMap(intervals)
            else:
                time_map = TimeMap.identity(duration_s)
            trimmed.append(audio)
            time_maps.append(time_map)
            durations_s.append(duration_s)
            n_chunks_per.append(max(1, math.ceil(len(audio) / CHUNK_SAMPLES)))

        detect = (
            self.auto_language
            and self.language is None
            and self.cfg.is_multilingual
        )
        state_bank: dict[tuple[int, int], tuple[Any, int]] = {}
        langs: list[int | None]
        if detect:
            langs, state_bank = self._detect_languages_batch(
                trimmed, n_chunks_per
            )
        else:
            langs = [None] * len(trimmed)

        # group windows by resolved language (group key None = pinned /
        # non-multilingual: _run_decode falls through to self.language)
        pairs_by_lang: dict[int | None, list[tuple[int, int]]] = {}
        for fi, n in enumerate(n_chunks_per):
            pairs_by_lang.setdefault(langs[fi], []).extend(
                (fi, ci) for ci in range(n)
            )

        eot = self.special.eot
        rows_by_file: list[list[np.ndarray | None]] = [
            [None] * n for n in n_chunks_per
        ]
        meta_keys = (
            "avg_logprob", "no_speech_prob", "temperature", "compression_ratio"
        )
        meta_by_file = [
            {k: np.zeros(n, np.float64) for k in meta_keys}
            for n in n_chunks_per
        ]
        keep_states = (
            self.enable_fallback or self.beam_size > 0 or self.word_timestamps
        )
        # word alignment needs each file's encoder states in chunk order:
        # shared slabs are retained (device) with their pair lists and
        # re-gathered per file after the decode loops
        kept_slab_states: list[tuple[Any, list[tuple[int, int]]]] = []

        for lang, pairs in pairs_by_lang.items():
            self._active_language = lang
            slab = min(_bucket(len(pairs)), self._slab_cap)
            if self.mesh is not None:
                slab = mesh_lib.round_up_batch(slab, self.mesh)
            in_flight: list[tuple[Any, Any, list[tuple[int, int]]]] = []

            def drain_one():
                result, states, batch_pairs = in_flight.pop(0)
                toks, meta = self._collect_slab(
                    result, states, len(batch_pairs), first_slab=False
                )
                for j, (fi, ci) in enumerate(batch_pairs):
                    rows_by_file[fi][ci] = toks[j]
                    for k in meta_keys:
                        meta_by_file[fi][k][ci] = meta[k][j]
                if self.word_timestamps:
                    kept_slab_states.append((states, batch_pairs))
                if on_segment is not None:
                    # live segments per file as its windows drain (the
                    # single-file path's on_segment, keyed by file index)
                    by_file: dict[int, list[int]] = {}
                    for j, (fi, _) in enumerate(batch_pairs):
                        by_file.setdefault(fi, []).append(j)
                    for fi, js in by_file.items():
                        self._emit_live_segments(
                            lambda seg, fi=fi: on_segment(fi, seg),
                            toks[js],
                            np.asarray(
                                [batch_pairs[j][1] for j in js], np.float64
                            ),
                            len(trimmed[fi]) / 16_000.0,
                            time_maps[fi],
                        )

            for lo in range(0, len(pairs), slab):
                batch_pairs = pairs[lo : lo + slab]
                if state_bank and all(p in state_bank for p in batch_pairs):
                    # every row of this slab was already encoded by the
                    # language-detection pass (short clips: the voter rows
                    # ARE the decode rows) — gather instead of re-encoding
                    audio_states = self._gather_state_rows(
                        state_bank, batch_pairs, slab
                    )
                else:
                    audio_states = self._frontend_encode(
                        self.params,
                        self._chunk_slab_pairs(trimmed, batch_pairs, slab),
                    )
                # same 2-deep host/device pipelining as transcribe()
                in_flight.append(
                    (
                        self._run_decode(audio_states),
                        audio_states if keep_states else None,
                        batch_pairs,
                    )
                )
                del audio_states
                if len(in_flight) >= 2:
                    drain_one()
            while in_flight:
                drain_one()

        # per-file tail: seek repair + finalize, exactly the single-file path
        results: list[dict] = []
        for fi, rows in enumerate(rows_by_file):
            self._active_language = langs[fi]
            width = max(int(np.shape(r)[0]) for r in rows)
            tokens = np.full((len(rows), width), eot, np.int32)
            for ci, r in enumerate(rows):
                tokens[ci, : np.shape(r)[0]] = r
            states_per_slab: list[Any] = []
            if self.word_timestamps:
                # gather this file's rows (chunk order) from the retained
                # shared slabs; a file's windows are contiguous within a
                # language group so parts arrive ci-ascending
                parts = []
                for states, batch_pairs in kept_slab_states:
                    idx = [
                        j for j, (f, _) in enumerate(batch_pairs) if f == fi
                    ]
                    if idx:
                        parts.append(
                            (
                                batch_pairs[idx[0]][1],
                                jnp.take(states, jnp.asarray(idx), axis=0),
                            )
                        )
                parts.sort(key=lambda p: p[0])
                states_per_slab = [
                    jnp.concatenate([s for _, s in parts], axis=0)
                ]
            tokens, patches = self._apply_seek_repair(
                tokens, n_chunks_per[fi], trimmed[fi]
            )
            results.append(
                self._finalize(
                    tokens, n_chunks_per[fi], durations_s[fi], time_maps[fi],
                    t0, None, states_per_slab=states_per_slab,
                    slab=max(1, n_chunks_per[fi]), audio=trimmed[fi],
                    patches=patches, chunk_meta=meta_by_file[fi],
                )
            )
        return results

    def _finalize(
        self, tokens, n_chunks, duration_s, time_map, t0, progress,
        *, states_per_slab, slab, audio, patches=None, chunk_meta=None,
    ) -> dict:
        """Shared tail: tokens -> segments -> (words) -> result dict."""
        import time as _time

        offsets = np.arange(n_chunks, dtype=np.float64) * 30.0
        # actual audio seconds per chunk (the last one is usually short) —
        # bounds unclosed trailing segments to real content, not 30 s
        content_s = len(audio) / 16_000.0
        durations = np.clip(content_s - offsets, 0.0, 30.0)
        all_rows, all_offsets, all_durations = tokens, offsets, durations
        all_meta = chunk_meta
        if patches is not None:
            # seek-repair patch windows join the grid windows; segments
            # re-sort into time order below
            all_rows = np.concatenate([tokens[:n_chunks], patches["tokens"]])
            all_offsets = np.concatenate([offsets, patches["offsets"]])
            all_durations = np.concatenate([durations, patches["durations"]])
            if chunk_meta is not None:
                all_meta = {
                    k: np.concatenate([chunk_meta[k][:n_chunks],
                                       patches["meta"][k]])
                    for k in chunk_meta
                }

        # per-window metadata rides every segment of the window (openai's
        # new_segment attaches result.avg_logprob & co per window); the
        # compression ratio was computed once at collection time
        row_meta = None
        if all_meta is not None:
            row_meta = [
                {
                    "temperature": float(all_meta["temperature"][i]),
                    "avg_logprob": float(all_meta["avg_logprob"][i]),
                    "compression_ratio": float(
                        all_meta["compression_ratio"][i]
                    ),
                    "no_speech_prob": float(all_meta["no_speech_prob"][i]),
                }
                for i in range(len(all_rows))
            ]

        segments = decode_lib.tokens_to_segments(
            all_rows, self.special, all_offsets, self.tokenizer.decode,
            chunk_durations_s=all_durations, row_meta=row_meta,
        )
        segments.sort(key=lambda s: (s["start"], s["end"]))
        # map trimmed-timeline stamps back to the original recording
        for seg in segments:
            seg["start"] = round(time_map.to_original(seg["start"]), 3)
            seg["end"] = round(time_map.to_original(seg["end"]), 3)

        words = None
        if self.word_timestamps:
            from ..models.whisper import align
            from ..models.whisper.align import AUDIO_FRAME_S

            # openai's word dicts always carry "probability" (the same
            # teacher-forced pass produces it; the hallucination filter
            # merely consumes it).  The teacher-forced rows carry the SAME
            # sot sequence generation used (openai's find_alignment), and
            # the attention matrix crops to each window's real content
            # frames (openai's num_frames//2 crop).
            lang = (
                self._active_language
                if self._active_language is not None
                else self.language
            )
            word_kw = dict(
                with_probabilities=True,
                language=self._language_code(),
                prepend_punctuations=self.prepend_punctuations,
                append_punctuations=self.append_punctuations,
                sot_sequence=self._sot_seq(lang),
            )
            per_chunk = []
            for si, slab_states in enumerate(states_per_slab):
                lo = si * slab
                real = min(slab, n_chunks - lo)
                per_chunk.extend(
                    align.word_timestamps(
                        self.params,
                        self.cfg,
                        slab_states[:real],
                        tokens[lo : lo + real],
                        self.special,
                        self.tokenizer.decode,
                        offsets[lo : lo + real],
                        content_frames=np.ceil(
                            durations[lo : lo + real] / AUDIO_FRAME_S
                        ),
                        **word_kw,
                    )
                )
            if patches is not None and "states" in patches:
                per_chunk.extend(
                    align.word_timestamps(
                        self.params,
                        self.cfg,
                        patches["states"],
                        patches["tokens"],
                        self.special,
                        self.tokenizer.decode,
                        patches["offsets"],
                        content_frames=np.ceil(
                            patches["durations"] / AUDIO_FRAME_S
                        ),
                        **word_kw,
                    )
                )
            words = [
                {
                    **w,
                    "start": round(time_map.to_original(w["start"]), 3),
                    "end": round(time_map.to_original(w["end"]), 3),
                }
                for chunk_words in per_chunk
                for w in chunk_words
            ]
            words.sort(key=lambda w: (w["start"], w["end"]))
            if self.hallucination_silence_threshold is not None:
                segments, words = filter_hallucinations(
                    segments, words,
                    self.hallucination_silence_threshold, duration_s,
                )
            # openai attaches words per segment (segment["words"]) — the
            # subtitle writers' word modes consume that shape; each word
            # goes to the first segment containing its midpoint
            wi = 0
            for seg in segments:
                seg_words: list[dict] = []
                while wi < len(words):
                    mid = (words[wi]["start"] + words[wi]["end"]) / 2
                    if mid < seg["start"] - 0.05:
                        wi += 1  # orphan (before this segment): flat list only
                    elif mid <= seg["end"] + 0.05:
                        seg_words.append(words[wi])
                        wi += 1
                    else:
                        break
                seg["words"] = seg_words

        # openai's running segment id, assigned on the FINAL list (after
        # the hallucination filter, so ids stay contiguous)
        for i, seg in enumerate(segments):
            seg["id"] = i

        elapsed = _time.perf_counter() - t0
        if progress:
            progress(1.0)
        out = {
            "text": " ".join(s["text"] for s in segments),
            "segments": segments,
            "duration": duration_s,
            "rtf_x": duration_s / max(elapsed, 1e-9),
        }
        lang_code = self._language_code()
        if lang_code is not None:
            out["language"] = lang_code
        if words is not None:
            out["words"] = words
        return out

    def _language_code(self) -> str | None:
        """ISO code of the active (detected or pinned) language, if any."""
        lang = (
            self._active_language
            if self._active_language is not None
            else self.language
        )
        if lang is None or not self.cfg.is_multilingual:
            return None
        from ..models.whisper.tokenizer import WHISPER_LANGUAGES, WHISPER_LANGUAGES_V3

        langs = (
            WHISPER_LANGUAGES_V3
            if self.special.num_languages >= 100
            else WHISPER_LANGUAGES
        )
        return langs[lang] if 0 <= lang < len(langs) else None
