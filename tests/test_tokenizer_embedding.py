"""Tokenizer assets ride the checkpoint: convert embeds, serving auto-loads.

The reference never wires a tokenizer because whisper.load_model bundles
weights + vocab as one unit (reference: app/services/audio_processor.py:863).
These tests pin the equivalent contract here: a converted .npz carries its
BPE vocab, `Transcriber.from_npz` reconstructs it with zero extra flags,
env/flag overrides win, and the byte fallback is loud.
"""
import base64
import logging

import numpy as np
import pytest

from audio_processor_tpu.models.whisper import convert, model as model_lib
from audio_processor_tpu.models.whisper.config import get_config
from audio_processor_tpu.models.whisper.tokenizer import (
    BPETokenizer,
    ByteTokenizer,
    load_tokenizer_file,
)
from audio_processor_tpu.pipeline.transcribe import Transcriber

from test_parity_tokenizer import CORPUS, TEST_STRINGS, _train_bpe

TINY_TEST_CFG = dict(
    n_mels=80, n_audio_ctx=32, n_audio_state=64, n_audio_head=2,
    n_audio_layer=1, n_text_ctx=48, n_text_state=64, n_text_head=2,
    n_text_layer=1, n_vocab=51865,
)


@pytest.fixture(scope="module")
def bpe():
    ranks = _train_bpe(CORPUS)
    content = b"\n".join(
        base64.b64encode(tok) + b" " + str(rank).encode()
        for tok, rank in ranks.items()
    )
    return BPETokenizer.from_tiktoken_bytes(content)


@pytest.fixture()
def tiny_ckpt(tmp_path, bpe):
    import dataclasses
    import jax

    cfg = dataclasses.replace(get_config("tiny"), **TINY_TEST_CFG)
    params = model_lib.init_params(cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "model.npz")
    convert.save_params(path, params, cfg, tokenizer=bpe)
    return path


def test_tiktoken_bytes_roundtrip(bpe):
    clone = BPETokenizer.from_tiktoken_bytes(bpe.to_tiktoken_bytes())
    for s in TEST_STRINGS:
        assert clone.encode(s) == bpe.encode(s)
        assert clone.decode(bpe.encode(s)) == s


def test_from_npz_autoloads_embedded_tokenizer(tiny_ckpt, bpe):
    t = Transcriber.from_npz(tiny_ckpt)
    assert isinstance(t.tokenizer, BPETokenizer)
    for s in TEST_STRINGS:
        assert t.tokenizer.encode(s) == bpe.encode(s)
        assert t.tokenizer.decode(bpe.encode(s)) == s


def test_load_tokenizer_helper(tiny_ckpt, bpe, tmp_path):
    tok = convert.load_tokenizer(tiny_ckpt)
    assert tok is not None and tok.encode(CORPUS) == bpe.encode(CORPUS)
    # a checkpoint saved WITHOUT a tokenizer reports None
    import dataclasses
    import jax

    cfg = dataclasses.replace(get_config("tiny"), **TINY_TEST_CFG)
    bare = str(tmp_path / "bare.npz")
    convert.save_params(
        bare, model_lib.init_params(cfg, jax.random.PRNGKey(0)), cfg
    )
    assert convert.load_tokenizer(bare) is None


def test_env_override_beats_embedded(tiny_ckpt, tmp_path, monkeypatch):
    # the override vocab maps every byte only (no merges): distinguishable
    # from the embedded trained vocab on any multi-char merge
    content = b"\n".join(
        base64.b64encode(bytes([b])) + b" " + str(b).encode()
        for b in range(256)
    )
    ov = tmp_path / "override.tiktoken"
    ov.write_bytes(content)
    monkeypatch.setenv("APTPU_TOKENIZER_PATH", str(ov))
    t = Transcriber.from_npz(tiny_ckpt)
    assert t.tokenizer.encode("the the the") == [
        int(b) for b in b"the the the"
    ]


def test_explicit_tokenizer_path_beats_env(tiny_ckpt, tmp_path, monkeypatch, bpe):
    monkeypatch.setenv("APTPU_TOKENIZER_PATH", str(tmp_path / "missing"))
    ov = tmp_path / "flag.tiktoken"
    ov.write_bytes(bpe.to_tiktoken_bytes())
    t = Transcriber.from_npz(tiny_ckpt, tokenizer_path=str(ov))
    assert t.tokenizer.encode(CORPUS) == bpe.encode(CORPUS)


def test_byte_fallback_is_loud(tmp_path, caplog):
    import dataclasses
    import jax

    cfg = dataclasses.replace(get_config("tiny"), **TINY_TEST_CFG)
    bare = str(tmp_path / "bare.npz")
    convert.save_params(
        bare, model_lib.init_params(cfg, jax.random.PRNGKey(0)), cfg
    )
    with caplog.at_level(logging.WARNING):
        t = Transcriber.from_npz(bare)
    assert isinstance(t.tokenizer, ByteTokenizer)
    assert any("no embedded tokenizer" in r.message for r in caplog.records)


def test_hf_vocab_files_roundtrip_production_path(tmp_path, bpe):
    """Toy HF vocab.json + merges.txt -> convert-time embed -> from_npz.

    Mirrors the HF checkpoint family: vocab.json ids double as tiktoken
    ranks for every Whisper vocab, so the embedded (result-rank) form must
    reproduce the HF (merge-list) encoder exactly on covered text.
    """
    import dataclasses
    import json

    import jax

    # derive HF-format files from the trained ranks: unicode-mapped vocab
    # + merges in rank order
    from audio_processor_tpu.models.whisper.tokenizer import _bytes_to_unicode

    ranks = _train_bpe(CORPUS)
    enc = _bytes_to_unicode()
    to_u = lambda bs: "".join(enc[b] for b in bs)  # noqa: E731
    vocab = {to_u(bs): r for bs, r in ranks.items()}
    merges = []
    for bs, r in sorted(ranks.items(), key=lambda kv: kv[1]):
        if r < 256:
            continue
        # recover the training split: the two highest-priority sub-tokens
        best = None
        for cut in range(1, len(bs)):
            a, b = bs[:cut], bs[cut:]
            if a in ranks and b in ranks and ranks[a] < r and ranks[b] < r:
                key = max(ranks[a], ranks[b])
                if best is None or key < best[0]:
                    best = (key, to_u(a), to_u(b))
        assert best is not None
        merges.append(f"{best[1]} {best[2]}")
    (tmp_path / "vocab.json").write_text(
        json.dumps(vocab, ensure_ascii=False), encoding="utf-8"
    )
    (tmp_path / "merges.txt").write_text(
        "#version: toy\n" + "\n".join(merges), encoding="utf-8"
    )

    hf_tok = load_tokenizer_file(str(tmp_path / "vocab.json"))
    cfg = dataclasses.replace(get_config("tiny"), **TINY_TEST_CFG)
    path = str(tmp_path / "hf.npz")
    convert.save_params(
        path, model_lib.init_params(cfg, jax.random.PRNGKey(0)), cfg,
        tokenizer=hf_tok,
    )
    t = Transcriber.from_npz(path)
    for s in TEST_STRINGS:
        ids = t.tokenizer.encode(s)
        assert ids == bpe.encode(s)
        assert t.tokenizer.decode(ids) == s


def test_hf_directory_conversion_torch_free(tmp_path, bpe):
    """convert.load_hf_checkpoint: a save_pretrained directory converts to
    a servable .npz WITHOUT torch in our code path (safetensors + json) —
    weights logit-equal to the torch-based from_hf_state_dict, vocab
    auto-embedded, alignment heads picked up from generation_config."""
    import json

    import jax
    import jax.numpy as jnp
    import torch
    from transformers import WhisperConfig as HFConfig, WhisperModel

    from audio_processor_tpu.models.whisper.config import WhisperConfig

    torch.manual_seed(3)
    cfg = WhisperConfig(
        name="hfdir", n_mels=80, n_audio_ctx=48, n_audio_state=64,
        n_audio_head=2, n_audio_layer=2, n_vocab=1024, n_text_ctx=32,
        n_text_state=64, n_text_head=2, n_text_layer=2,
    )
    hf_cfg = HFConfig(
        vocab_size=cfg.n_vocab, num_mel_bins=cfg.n_mels,
        encoder_layers=cfg.n_audio_layer,
        encoder_attention_heads=cfg.n_audio_head,
        decoder_layers=cfg.n_text_layer,
        decoder_attention_heads=cfg.n_text_head,
        d_model=cfg.n_audio_state,
        max_source_positions=cfg.n_audio_ctx,
        max_target_positions=cfg.n_text_ctx,
        encoder_ffn_dim=4 * cfg.n_audio_state,
        decoder_ffn_dim=4 * cfg.n_text_state,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=3, suppress_tokens=[],
        begin_suppress_tokens=[],
    )
    hf = WhisperModel(hf_cfg).eval()
    d = tmp_path / "ckpt"
    hf.save_pretrained(str(d), safe_serialization=True)
    (d / "generation_config.json").write_text(
        json.dumps({"alignment_heads": [[1, 0], [1, 1]]})
    )
    # tokenizer assets beside the weights, HF style (byte-level vocab)
    from audio_processor_tpu.models.whisper.tokenizer import _bytes_to_unicode

    enc = _bytes_to_unicode()
    vocab = {enc[b]: b for b in range(256)}
    (d / "vocab.json").write_text(json.dumps(vocab, ensure_ascii=False))
    (d / "merges.txt").write_text("#version: toy\n")

    params, got_cfg, tok = convert.load_hf_checkpoint(str(d))
    assert got_cfg.n_audio_state == 64 and got_cfg.n_vocab == 1024
    assert got_cfg.alignment_heads == ((1, 0), (1, 1))
    assert tok is not None and tok.decode(tok.encode("hello")) == "hello"

    # weights equal the torch-path conversion
    ref = convert.from_hf_state_dict(hf.state_dict(), cfg)
    same = jax.tree.map(
        lambda a, b: bool(jnp.allclose(a, b, atol=1e-6)), params, ref
    )
    assert all(jax.tree.leaves(same))

    # and the full save -> from_npz round trip serves with the vocab
    out = str(tmp_path / "hf.npz")
    convert.save_params(out, params, got_cfg, tokenizer=tok)
    t = Transcriber.from_npz(out)
    assert not isinstance(t.tokenizer, ByteTokenizer)
    assert t.cfg.alignment_heads == ((1, 0), (1, 1))


def test_to_tiktoken_bytes_skips_special_markers(bpe):
    """vocab.json's ASCII '<|endoftext|>' decodes cleanly through the
    GPT-2 byte table — serialisation must still skip it (specials derive
    from the model config, never from the vocab)."""
    vocab = dict(bpe.vocab)
    eot_rank = max(vocab.values()) + 1
    vocab["<|endoftext|>"] = eot_rank
    tok = BPETokenizer(vocab, [], result_rank_merge=True)
    data = tok.to_tiktoken_bytes()
    assert b"PHxlbmRvZnRleHR8Pg" not in data  # base64("<|endoftext|>")
    clone = BPETokenizer.from_tiktoken_bytes(data)
    assert eot_rank not in clone.inv_vocab
    assert clone.encode(CORPUS) == bpe.encode(CORPUS)
