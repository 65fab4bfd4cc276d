"""BPE tokenizer parity against the REAL tiktoken library.

The reference inherits tokenisation from openai-whisper's tiktoken vocabs
(reference: app/services/audio_processor.py:1076 via whisper.transcribe).
No pretrained rank file can enter this image (zero egress), so parity is
established the strong way available offline: train a byte-level BPE vocab
in-test, hand the identical ranks to (a) tiktoken.Encoding — the engine
openai-whisper uses — and (b) our BPETokenizer via the .tiktoken file
format, and require EXACT token-id agreement over a diverse corpus.  That
pins the merge semantics (result-rank, leftmost-first), the GPT-2 split
pattern, and the base64 rank-file loader; a real multilingual.tiktoken then
differs only in data, not code paths.

A runnable-but-skipped gate (test_real_vocab_roundtrip) picks up a real
rank file automatically when APTPU_TIKTOKEN_PATH points at one.
"""
import base64
import os
from collections import Counter

import pytest

import tiktoken

from audio_processor_tpu.models.whisper.tokenizer import (
    _GPT2_PAT,
    _SPLIT_PATTERN,
    BPETokenizer,
)

CORPUS = (
    "The quick brown fox jumps over the lazy dog. "
    "Meeting notes: we'll discuss the Q3 roadmap, budget (USD 1,250,000) "
    "and hiring.  I'm sure they've seen it -- twice!\n"
    "会议纪要：讨论了第三季度的路线图和预算。\n"
    "Résumé of the café's naïve piñata — 'tis done.\t\t"
    "x = f(x_i) + 3.14159; // inline code\n"
    "   leading spaces and trailing   "
)

TEST_STRINGS = [
    "hello world",
    "Hello, World!",
    "  double  spaces  ",
    "we'll they've i'm don't 'tis",
    "1234567890 12,345.67",
    "混合 mixed 文本 text 123",
    "emoji 🎉🎊 test",
    "tabs\tand\nnewlines\r\n",
    "UPPERCASE lowercase MiXeD",
    "a",
    "",
    " ",
    "...!!!???",
    "snake_case camelCase kebab-case",
    "Ω≈ç√∫˜µ unicode soup",
    CORPUS,
]


def _train_bpe(corpus: str, n_merges: int = 200) -> dict[bytes, int]:
    """Minimal byte-level BPE trainer (greedy most-frequent-pair), emitting
    a tiktoken-style ranks dict: 256 single bytes + merges in train order."""
    words = [m.encode("utf-8") for m in _SPLIT_PATTERN.findall(corpus)]
    ranks: dict[bytes, int] = {bytes([b]): b for b in range(256)}
    # each word as a list of byte-tokens
    seqs = [[bytes([b]) for b in w] for w in words]
    for _ in range(n_merges):
        counts: Counter = Counter()
        for seq in seqs:
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] += 1
        if not counts:
            break
        (a, b), freq = counts.most_common(1)[0]
        if freq < 2:
            break
        merged = a + b
        ranks[merged] = len(ranks)
        new_seqs = []
        for seq in seqs:
            out, i = [], 0
            while i < len(seq):
                if i < len(seq) - 1 and seq[i] == a and seq[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs.append(out)
        seqs = new_seqs
    return ranks


@pytest.fixture(scope="module")
def rank_pair(tmp_path_factory):
    ranks = _train_bpe(CORPUS)
    # write the openai .tiktoken format: base64(token) <space> rank
    path = tmp_path_factory.mktemp("vocab") / "test.tiktoken"
    with open(path, "wb") as f:
        for tok, rank in ranks.items():
            f.write(base64.b64encode(tok) + b" " + str(rank).encode() + b"\n")
    ours = BPETokenizer.from_tiktoken(str(path))
    ref = tiktoken.Encoding(
        name="parity-test",
        pat_str=_GPT2_PAT,
        mergeable_ranks=ranks,
        special_tokens={},
    )
    return ours, ref


def test_encode_matches_tiktoken_exactly(rank_pair):
    ours, ref = rank_pair
    for s in TEST_STRINGS:
        assert ours.encode(s) == ref.encode(s), f"mismatch on {s!r}"


def test_decode_roundtrip_matches_tiktoken(rank_pair):
    ours, ref = rank_pair
    for s in TEST_STRINGS:
        ids = ref.encode(s)
        assert ours.decode(ids) == ref.decode(ids) == s


def test_split_pattern_is_gpt2(rank_pair):
    # the split regex itself must agree with the GPT-2 pattern tiktoken
    # compiles — a '\\w'-style approximation breaks " abc123" into
    # different pre-tokens and every downstream id shifts
    pieces = _SPLIT_PATTERN.findall(" abc123 déjà-vu 42nd")
    assert pieces == [" abc", "123", " déjà", "-", "vu", " 42", "nd"]


def test_real_vocab_roundtrip():
    """Gate for a REAL whisper rank file (multilingual.tiktoken/gpt2.tiktoken):
    runs automatically when APTPU_TIKTOKEN_PATH is set, skips otherwise."""
    path = os.environ.get("APTPU_TIKTOKEN_PATH")
    if not path or not os.path.exists(path):
        pytest.skip("no real tiktoken rank file in this image (zero egress)")
    ranks = {}
    with open(path, "rb") as f:
        for line in f:
            if line.strip():
                tok, rank = line.split()
                ranks[base64.b64decode(tok)] = int(rank)
    ours = BPETokenizer.from_tiktoken(path)
    ref = tiktoken.Encoding(
        name="whisper-real", pat_str=_GPT2_PAT, mergeable_ranks=ranks,
        special_tokens={},
    )
    for s in TEST_STRINGS:
        assert ours.encode(s) == ref.encode(s)


def test_language_index_unknown_model_resolves_v3_codes():
    """num_languages=None (model not loaded yet, CLI/env parse time):
    every valid whisper code resolves via the v3 table — the first 99
    indices are identical in both registries, so the index is correct for
    v2 models too; 'yue' resolves to 99 and the Transcriber validates it
    against the loaded model's language count."""
    import pytest

    from audio_processor_tpu.models.whisper.tokenizer import language_index

    assert language_index("en", num_languages=None) == 0
    assert language_index("yue", num_languages=None) == 99
    assert language_index("en", num_languages=None) == language_index(
        "en", num_languages=99
    )
    # strict per-model validation when the count IS known
    with pytest.raises(ValueError):
        language_index("yue", num_languages=99)
    assert language_index("yue", num_languages=100) == 99
    with pytest.raises(ValueError):
        language_index("klingon", num_languages=None)


def test_stdlib_fallback_pattern_keeps_underscores():
    """The `re` fallback pre-tokenizer must not DELETE characters: '_' is
    a \\w word char excluded from both the letter and punctuation
    classes, so the old pattern silently dropped it (snake_case prompts
    corrupted before reaching the model)."""
    import re

    from audio_processor_tpu.models.whisper import tokenizer as tok_mod

    pat = re.compile(
        r"""'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+|\s+(?!\S)|\s+""",
        re.UNICODE,
    )
    text = "rename speaker_map to file_id; x_3 = 7"
    assert "".join(pat.findall(text)) == text
    # every char of arbitrary text must be covered (nothing deleted)
    for sample in ("__init__", "a_b c-d", "_", "e.g._test_", "1_000"):
        assert "".join(pat.findall(sample)) == sample


def test_load_tokenizer_file_hf_tokenizer_json(tmp_path):
    """HF tokenizer.json (the file checkpoint repos ship most visibly)
    loads directly; an unrecognized JSON shape raises a clear error
    instead of an unhashable-type TypeError."""
    import json

    from audio_processor_tpu.models.whisper.tokenizer import (
        BPETokenizer, load_tokenizer_file,
    )

    # a tiny byte-level vocab: single printable chars + one merge
    vocab = {chr(c): i for i, c in enumerate(range(33, 127))}
    vocab["ab"] = len(vocab)
    tj = tmp_path / "tokenizer.json"
    tj.write_text(json.dumps({
        "version": "1.0",
        "model": {"type": "BPE", "vocab": vocab, "merges": ["a b"]},
    }))
    t = load_tokenizer_file(str(tj))
    assert isinstance(t, BPETokenizer)
    assert t.vocab["ab"] == len(vocab) - 1
    assert t.ranks[("a", "b")] == 0

    bad = tmp_path / "weird.json"
    bad.write_text(json.dumps({"added_tokens": [{"id": 1}]}))
    with pytest.raises(ValueError, match="unsupported JSON tokenizer"):
        load_tokenizer_file(str(bad))


def test_config_num_languages_delegates_to_special_tokens():
    """cfg.num_languages shares the SpecialTokens derivation — the naive
    vocab arithmetic returned -50741 for the toy 'test' config."""
    from audio_processor_tpu.models.whisper.config import get_config
    from audio_processor_tpu.models.whisper.decode import SpecialTokens

    for name in ("test", "tiny", "tiny.en", "large-v3"):
        cfg = get_config(name)
        assert cfg.num_languages == SpecialTokens.for_config(cfg).num_languages
        assert cfg.num_languages > 0


def test_convert_handles_torch_bf16_tensors():
    """bf16-saved fine-tunes convert (numpy can't represent torch bf16;
    _t upcasts before .numpy())."""
    import numpy as np
    import torch

    from audio_processor_tpu.models.whisper.convert import _t

    x = torch.ones((2, 3), dtype=torch.bfloat16) * 1.5
    out = _t(x)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, 1.5)
