"""Checkpoint conversion: OpenAI-whisper / HuggingFace -> our param trees.

The reference downloads openai-whisper checkpoints at runtime
(reference: app/services/audio_processor.py:863).  This module converts
either checkpoint family offline into the (d_in, d_out) functional layout
used by models/whisper/model.py, and saves/loads a plain .npz so serving
never needs torch.
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np
import jax.numpy as jnp

from .config import WhisperConfig
from .model import Params


def _t(x) -> np.ndarray:
    """torch tensor / array -> float32 numpy (no torch import needed here)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu()
        if hasattr(x, "float"):
            # numpy cannot represent torch bfloat16 (TypeError: unsupported
            # ScalarType) — bf16-saved fine-tunes upcast before .numpy()
            x = x.float()
        x = x.numpy()
    return np.asarray(x, dtype=np.float32)


# ---------------------------------------------------------------------------
# HuggingFace transformers layout
# ---------------------------------------------------------------------------

def _hf_attn(sd: Mapping[str, Any], prefix: str) -> dict:
    p = {
        "q": {"w": _t(sd[f"{prefix}.q_proj.weight"]).T, "b": _t(sd[f"{prefix}.q_proj.bias"])},
        "k": {"w": _t(sd[f"{prefix}.k_proj.weight"]).T},
        "v": {"w": _t(sd[f"{prefix}.v_proj.weight"]).T, "b": _t(sd[f"{prefix}.v_proj.bias"])},
        "out": {"w": _t(sd[f"{prefix}.out_proj.weight"]).T, "b": _t(sd[f"{prefix}.out_proj.bias"])},
    }
    return p


def _hf_ln(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _hf_block(sd, prefix, cross: bool) -> dict:
    p = {
        "attn_ln": _hf_ln(sd, f"{prefix}.self_attn_layer_norm"),
        "attn": _hf_attn(sd, f"{prefix}.self_attn"),
        "mlp_ln": _hf_ln(sd, f"{prefix}.final_layer_norm"),
        "fc1": {"w": _t(sd[f"{prefix}.fc1.weight"]).T, "b": _t(sd[f"{prefix}.fc1.bias"])},
        "fc2": {"w": _t(sd[f"{prefix}.fc2.weight"]).T, "b": _t(sd[f"{prefix}.fc2.bias"])},
    }
    if cross:
        p["cross_attn_ln"] = _hf_ln(sd, f"{prefix}.encoder_attn_layer_norm")
        p["cross_attn"] = _hf_attn(sd, f"{prefix}.encoder_attn")
    return p


def _stack(blocks: list) -> dict:
    # the ONE per-layer stacking definition (jnp.stack accepts numpy
    # leaves directly; a local twin here risked drifting from model.py's
    # leading-axis convention)
    from .model import _stack_pytrees

    return _stack_pytrees(blocks)


def from_hf_state_dict(sd: Mapping[str, Any], cfg: WhisperConfig) -> Params:
    """transformers WhisperForConditionalGeneration / WhisperModel -> Params."""
    # tolerate both "model.encoder..." and "encoder..." key roots
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    enc_blocks = [
        _hf_block(sd, f"encoder.layers.{i}", cross=False)
        for i in range(cfg.n_audio_layer)
    ]
    dec_blocks = [
        _hf_block(sd, f"decoder.layers.{i}", cross=True)
        for i in range(cfg.n_text_layer)
    ]
    return {
        "encoder": {
            "conv1": {
                # torch conv1d weight (out, in, k) -> ours (k, in, out)
                "w": jnp.asarray(_t(sd["encoder.conv1.weight"]).transpose(2, 1, 0)),
                "b": jnp.asarray(_t(sd["encoder.conv1.bias"])),
            },
            "conv2": {
                "w": jnp.asarray(_t(sd["encoder.conv2.weight"]).transpose(2, 1, 0)),
                "b": jnp.asarray(_t(sd["encoder.conv2.bias"])),
            },
            "pos_emb": jnp.asarray(_t(sd["encoder.embed_positions.weight"])),
            "blocks": _stack(enc_blocks),
            "ln_post": _hf_ln(sd, "encoder.layer_norm"),
        },
        "decoder": {
            "token_emb": jnp.asarray(_t(sd["decoder.embed_tokens.weight"])),
            "pos_emb": jnp.asarray(_t(sd["decoder.embed_positions.weight"])),
            "blocks": _stack(dec_blocks),
            "ln": _hf_ln(sd, "decoder.layer_norm"),
        },
    }


# ---------------------------------------------------------------------------
# OpenAI whisper checkpoint layout (the .pt files whisper.load_model pulls)
# ---------------------------------------------------------------------------

def _oa_attn(sd, prefix):
    return {
        "q": {"w": _t(sd[f"{prefix}.query.weight"]).T, "b": _t(sd[f"{prefix}.query.bias"])},
        "k": {"w": _t(sd[f"{prefix}.key.weight"]).T},
        "v": {"w": _t(sd[f"{prefix}.value.weight"]).T, "b": _t(sd[f"{prefix}.value.bias"])},
        "out": {"w": _t(sd[f"{prefix}.out.weight"]).T, "b": _t(sd[f"{prefix}.out.bias"])},
    }


def _oa_block(sd, prefix, cross: bool):
    p = {
        "attn_ln": {"scale": _t(sd[f"{prefix}.attn_ln.weight"]), "bias": _t(sd[f"{prefix}.attn_ln.bias"])},
        "attn": _oa_attn(sd, f"{prefix}.attn"),
        "mlp_ln": {"scale": _t(sd[f"{prefix}.mlp_ln.weight"]), "bias": _t(sd[f"{prefix}.mlp_ln.bias"])},
        "fc1": {"w": _t(sd[f"{prefix}.mlp.0.weight"]).T, "b": _t(sd[f"{prefix}.mlp.0.bias"])},
        "fc2": {"w": _t(sd[f"{prefix}.mlp.2.weight"]).T, "b": _t(sd[f"{prefix}.mlp.2.bias"])},
    }
    if cross:
        p["cross_attn_ln"] = {
            "scale": _t(sd[f"{prefix}.cross_attn_ln.weight"]),
            "bias": _t(sd[f"{prefix}.cross_attn_ln.bias"]),
        }
        p["cross_attn"] = _oa_attn(sd, f"{prefix}.cross_attn")
    return p


def from_openai_state_dict(sd: Mapping[str, Any], cfg: WhisperConfig) -> Params:
    enc_blocks = [
        _oa_block(sd, f"encoder.blocks.{i}", cross=False)
        for i in range(cfg.n_audio_layer)
    ]
    dec_blocks = [
        _oa_block(sd, f"decoder.blocks.{i}", cross=True)
        for i in range(cfg.n_text_layer)
    ]
    return {
        "encoder": {
            "conv1": {
                "w": jnp.asarray(_t(sd["encoder.conv1.weight"]).transpose(2, 1, 0)),
                "b": jnp.asarray(_t(sd["encoder.conv1.bias"])),
            },
            "conv2": {
                "w": jnp.asarray(_t(sd["encoder.conv2.weight"]).transpose(2, 1, 0)),
                "b": jnp.asarray(_t(sd["encoder.conv2.bias"])),
            },
            "pos_emb": jnp.asarray(_t(sd["encoder.positional_embedding"])),
            "blocks": _stack(enc_blocks),
            "ln_post": {
                "scale": _t(sd["encoder.ln_post.weight"]),
                "bias": _t(sd["encoder.ln_post.bias"]),
            },
        },
        "decoder": {
            "token_emb": jnp.asarray(_t(sd["decoder.token_embedding.weight"])),
            "pos_emb": jnp.asarray(_t(sd["decoder.positional_embedding"])),
            "blocks": _stack(dec_blocks),
            "ln": {"scale": _t(sd["decoder.ln.weight"]), "bias": _t(sd["decoder.ln.bias"])},
        },
    }


def load_openai_checkpoint(
    path: str,
    alignment_heads: tuple[tuple[int, int], ...] | None = None,
) -> tuple[Params, WhisperConfig]:
    """Load an openai-whisper .pt checkpoint (requires torch, offline).

    alignment_heads: the checkpoint's word-timestamp head mask.  The .pt
    file itself does not carry one (openai-whisper keys its table by model
    NAME at runtime) — pass it explicitly, or measure one afterwards with
    align.calibrate_alignment_heads.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    dims = ckpt["dims"]
    cfg = WhisperConfig(
        name="converted",
        n_mels=dims["n_mels"],
        n_audio_ctx=dims["n_audio_ctx"],
        n_audio_state=dims["n_audio_state"],
        n_audio_head=dims["n_audio_head"],
        n_audio_layer=dims["n_audio_layer"],
        n_vocab=dims["n_vocab"],
        n_text_ctx=dims["n_text_ctx"],
        n_text_state=dims["n_text_state"],
        n_text_head=dims["n_text_head"],
        n_text_layer=dims["n_text_layer"],
        alignment_heads=alignment_heads,
    )
    return from_openai_state_dict(ckpt["model_state_dict"], cfg), cfg


def load_hf_checkpoint(path: str):
    """HF Whisper checkpoint DIRECTORY -> (params, cfg, tokenizer|None),
    entirely TORCH-FREE (safetensors + json).

    Reads config.json (+ generation_config.json alignment heads when
    published), model.safetensors (sharded index supported), and the
    vocab.json/merges.txt pair when present — so one call yields
    everything a servable .npz needs, mirroring whisper.load_model's
    weights+vocab bundle (reference: app/services/audio_processor.py:863)
    without a torch install anywhere in the pipeline.
    """
    import json
    import os

    from safetensors.numpy import load_file

    with open(os.path.join(path, "config.json"), encoding="utf-8") as f:
        hc = json.load(f)
    heads = None
    gen_path = os.path.join(path, "generation_config.json")
    if os.path.exists(gen_path):
        with open(gen_path, encoding="utf-8") as f:
            heads = alignment_heads_from_generation_config(json.load(f))
    cfg = WhisperConfig(
        name=os.path.basename(os.path.normpath(path)) or "hf",
        n_mels=int(hc["num_mel_bins"]),
        n_audio_ctx=int(hc["max_source_positions"]),
        n_audio_state=int(hc["d_model"]),
        n_audio_head=int(hc["encoder_attention_heads"]),
        n_audio_layer=int(hc["encoder_layers"]),
        n_vocab=int(hc["vocab_size"]),
        n_text_ctx=int(hc["max_target_positions"]),
        n_text_state=int(hc["d_model"]),
        n_text_head=int(hc["decoder_attention_heads"]),
        n_text_layer=int(hc["decoder_layers"]),
        alignment_heads=heads,
    )

    index_path = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path, encoding="utf-8") as f:
            index = json.load(f)
        sd: dict = {}
        for shard in sorted(set(index["weight_map"].values())):
            sd.update(load_file(os.path.join(path, shard)))
    else:
        sd = load_file(os.path.join(path, "model.safetensors"))
    params = from_hf_state_dict(sd, cfg)

    tokenizer = None
    vocab_path = os.path.join(path, "vocab.json")
    merges_path = os.path.join(path, "merges.txt")
    if os.path.exists(vocab_path) and os.path.exists(merges_path):
        from .tokenizer import BPETokenizer

        tokenizer = BPETokenizer.from_vocab_files(vocab_path, merges_path)
    return params, cfg, tokenizer


def alignment_heads_from_generation_config(gen_config: Mapping[str, Any]):
    """(layer, head) tuple from a HF generation_config.json dict (the
    `alignment_heads` field transformers publishes per Whisper checkpoint)."""
    heads = gen_config.get("alignment_heads")
    if not heads:
        return None
    return tuple((int(l), int(h)) for l, h in heads)


# ---------------------------------------------------------------------------
# Native .npz serialisation (serving never needs torch)
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            a = np.asarray(v)
            if a.dtype.kind == "V":  # bfloat16 -> np.savez void16: upcast
                a = np.asarray(jnp.asarray(v).astype(jnp.float32))
            out[key] = a
    return out


def _unflatten(flat: Mapping[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_params(
    path: str, params: Params, cfg: WhisperConfig, tokenizer=None
) -> None:
    """Write a servable .npz.  Pass the checkpoint's BPETokenizer to embed
    its vocab (tiktoken rank format) so serving gets weights + tokenizer as
    ONE unit — the same contract whisper.load_model gives the reference
    (reference: app/services/audio_processor.py:863).  Without it, loading
    falls back to the byte tokenizer and real weights decode to garbage.
    """
    flat = _flatten(params)
    meta = np.array(
        [cfg.n_mels, cfg.n_audio_ctx, cfg.n_audio_state, cfg.n_audio_head,
         cfg.n_audio_layer, cfg.n_vocab, cfg.n_text_ctx, cfg.n_text_state,
         cfg.n_text_head, cfg.n_text_layer],
        dtype=np.int64,
    )
    extra = {}
    if cfg.alignment_heads:
        # word-timestamp alignment-head mask rides the checkpoint (openai
        # ships these per checkpoint; align.calibrate_alignment_heads
        # measures one for converted/finetuned weights)
        extra["__alignment_heads__"] = np.asarray(cfg.alignment_heads, np.int64)
    if tokenizer is not None and hasattr(tokenizer, "to_tiktoken_bytes"):
        extra["__tokenizer__"] = np.frombuffer(
            tokenizer.to_tiktoken_bytes(), dtype=np.uint8
        )
    np.savez(path, __config__=meta, **extra, **flat)


_SIDECAR_KEYS = ("__config__", "__alignment_heads__", "__tokenizer__")


def load_tokenizer(path: str):
    """The BPETokenizer embedded in a converted .npz, or None if the
    checkpoint predates / skipped vocab embedding."""
    from .tokenizer import BPETokenizer

    with np.load(path) as z:
        if "__tokenizer__" not in z.files:
            return None
        data = z["__tokenizer__"].tobytes()
    return BPETokenizer.from_tiktoken_bytes(data)


def load_params(path: str) -> tuple[Params, WhisperConfig]:
    with np.load(path) as z:
        meta = z["__config__"]
        heads = None
        if "__alignment_heads__" in z.files:
            heads = tuple(
                (int(l), int(h)) for l, h in z["__alignment_heads__"]
            )
        flat = {k: z[k] for k in z.files if k not in _SIDECAR_KEYS}
    cfg = WhisperConfig(
        name="loaded",
        n_mels=int(meta[0]), n_audio_ctx=int(meta[1]), n_audio_state=int(meta[2]),
        n_audio_head=int(meta[3]), n_audio_layer=int(meta[4]), n_vocab=int(meta[5]),
        n_text_ctx=int(meta[6]), n_text_state=int(meta[7]), n_text_head=int(meta[8]),
        n_text_layer=int(meta[9]),
        alignment_heads=heads,
    )
    return _unflatten(flat), cfg
