"""Self-contained Whisper text tokenizer (byte-level BPE).

The reference gets tokenisation for free from openai-whisper; here it is
first-party so serving has no torch/tiktoken dependency.  Two loaders:

  * ``BPETokenizer.from_vocab_files(vocab.json, merges.txt)`` — HuggingFace
    GPT-2-style files shipped with every Whisper HF checkpoint.
  * ``BPETokenizer.from_tiktoken(path)`` — openai-whisper's
    ``multilingual.tiktoken`` / ``gpt2.tiktoken`` rank files
    (base64(token_bytes) <space> rank per line).

``ByteTokenizer`` is the zero-asset fallback used by tests and random-weight
benches (ids 0..255 are raw bytes).
"""
from __future__ import annotations

import base64
import functools
import json
import re
from typing import Iterable

# Whisper language registry, in lang-token order (token id = lang_begin + index).
WHISPER_LANGUAGES = (
    "en zh de es ru ko fr ja pt tr pl ca nl ar sv it id hi fi vi he uk el ms "
    "cs ro da hu ta no th ur hr bg lt la mi ml cy sk te fa lv bn sr az sl kn "
    "et mk br eu is hy ne mn bs kk sq sw gl mr pa si km sn yo so af oc ka be "
    "tg sd gu am yi lo uz fo ht ps tk nn mt sa lb my bo tl mg as tt haw ln ha "
    "ba jw su"
).split()
WHISPER_LANGUAGES_V3 = WHISPER_LANGUAGES + ["yue"]


def language_index(code: str, num_languages: int = 99) -> int:
    langs = WHISPER_LANGUAGES_V3 if num_languages >= 100 else WHISPER_LANGUAGES
    return langs.index(code)


@functools.lru_cache(maxsize=1)
def _bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte <-> printable-unicode table."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


_SPLIT_PATTERN = re.compile(
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?\w+| ?[^\s\w]+|\s+(?!\S)|\s+""",
    re.UNICODE,
)


class BPETokenizer:
    """Byte-level BPE encoder/decoder (GPT-2 family, as Whisper uses)."""

    def __init__(self, vocab: dict[str, int], merges: list[tuple[str, str]]):
        self.vocab = vocab
        self.inv_vocab = {v: k for k, v in vocab.items()}
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self.byte_enc = _bytes_to_unicode()
        self.byte_dec = {c: b for b, c in self.byte_enc.items()}
        self._cache: dict[str, list[str]] = {}

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_vocab_files(cls, vocab_path: str, merges_path: str) -> "BPETokenizer":
        with open(vocab_path, encoding="utf-8") as f:
            vocab = json.load(f)
        merges = []
        with open(merges_path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#version"):
                    continue
                a, _, b = line.partition(" ")
                merges.append((a, b))
        return cls(vocab, merges)

    @classmethod
    def from_tiktoken(cls, path: str) -> "BPETokenizer":
        """Build from an openai tiktoken rank file.

        Ranks double as merge priorities: a token's merge is the split of its
        bytes into the two highest-priority sub-tokens, recovered greedily.
        """
        ranks: dict[bytes, int] = {}
        with open(path, "rb") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                tok_b64, rank = line.split()
                ranks[base64.b64decode(tok_b64)] = int(rank)
        byte_enc = _bytes_to_unicode()

        def to_unicode(bs: bytes) -> str:
            return "".join(byte_enc[b] for b in bs)

        vocab = {to_unicode(bs): r for bs, r in ranks.items()}
        # reconstruct merges: for each multi-byte token, find the split whose
        # two halves are both tokens, with the best (lowest max) rank
        merges: list[tuple[int, tuple[str, str]]] = []
        for bs, rank in ranks.items():
            if len(bs) < 2:
                continue
            best = None
            for i in range(1, len(bs)):
                l, r = bs[:i], bs[i:]
                if l in ranks and r in ranks:
                    cand = max(ranks[l], ranks[r])
                    if best is None or cand < best[0]:
                        best = (cand, (to_unicode(l), to_unicode(r)))
            if best is not None:
                merges.append((rank, best[1]))
        merges.sort(key=lambda x: x[0])
        return cls(vocab, [m for _, m in merges])

    # -- core BPE -----------------------------------------------------------

    def _bpe(self, token: str) -> list[str]:
        if token in self._cache:
            return self._cache[token]
        word = list(token)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.ranks.get(p, float("inf")))
            if best not in self.ranks:
                break
            first, second = best
            merged, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = merged
        self._cache[token] = word
        return word

    def encode(self, text: str) -> list[int]:
        ids: list[int] = []
        for chunk in _SPLIT_PATTERN.findall(text):
            mapped = "".join(self.byte_enc[b] for b in chunk.encode("utf-8"))
            for piece in self._bpe(mapped):
                if piece in self.vocab:
                    ids.append(self.vocab[piece])
                else:  # unknown merge result: fall back to single chars
                    ids.extend(self.vocab[c] for c in piece if c in self.vocab)
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        chars = "".join(self.inv_vocab.get(int(i), "") for i in ids)
        data = bytes(self.byte_dec[c] for c in chars if c in self.byte_dec)
        return data.decode("utf-8", errors="replace")


class ByteTokenizer:
    """Zero-asset tokenizer: ids 0..255 are raw bytes (tests/benches only)."""

    def encode(self, text: str) -> list[int]:
        return list(text.encode("utf-8"))

    def decode(self, ids: Iterable[int]) -> str:
        return bytes(i for i in (int(x) for x in ids) if 0 <= i < 256).decode(
            "utf-8", errors="replace"
        )
