"""Checkpoint conversion for the diarization stack.

* pyannote `segmentation-3.0`-family PyanNet state dicts -> our
  segmentation params (module names per pyannote.audio's published
  PyanNet/SincNet: sincnet.wav_norm1d, sincnet.conv1d.{0,1,2},
  sincnet.norm1d.{0,1,2}, lstm.weight_*_l{k}[_reverse], linear.{0,1},
  classifier).  Torch LSTM gate order (i,f,g,o) matches our cell.

* WeSpeaker-style ResNet34 speaker-embedding state dicts -> our embedding
  params (torchvision block naming: conv1/bn1, layer{1..4}.{i}.conv{1,2}/
  bn{1,2}/downsample.{0,1}, plus a final embedding Linear whose key is
  auto-detected).

Both accept {name: tensor/ndarray} mappings, so they work from
torch.load(...)['state_dict'] or from .npz archives without torch.
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np
import jax.numpy as jnp

from .embedding import EmbeddingConfig
from .segmentation import SegmentationConfig


def _t(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _strip_prefixes(sd: Mapping[str, Any]) -> dict[str, Any]:
    """Drop common wrapper prefixes (model., module.)."""
    out = {}
    for k, v in sd.items():
        for pre in ("model.", "module."):
            if k.startswith(pre):
                k = k[len(pre):]
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# PyanNet segmentation
# ---------------------------------------------------------------------------

def from_pyannet_state_dict(
    sd: Mapping[str, Any], cfg: SegmentationConfig | None = None
) -> tuple[dict, SegmentationConfig]:
    sd = _strip_prefixes(sd)
    cfg = cfg or SegmentationConfig()

    def ln(prefix):
        return {"scale": jnp.asarray(_t(sd[f"{prefix}.weight"])),
                "bias": jnp.asarray(_t(sd[f"{prefix}.bias"]))}

    lstm = []
    for k in range(cfg.lstm_layers):
        def direction(suffix):
            return {
                "wi": jnp.asarray(_t(sd[f"lstm.weight_ih_l{k}{suffix}"]).T),
                "wh": jnp.asarray(_t(sd[f"lstm.weight_hh_l{k}{suffix}"]).T),
                "bi": jnp.asarray(_t(sd[f"lstm.bias_ih_l{k}{suffix}"])),
                "bh": jnp.asarray(_t(sd[f"lstm.bias_hh_l{k}{suffix}"])),
            }

        lstm.append({"fwd": direction(""), "bwd": direction("_reverse")})

    params = {
        "wav_norm": ln("sincnet.wav_norm1d"),
        "sinc": {
            "low_hz": jnp.asarray(_t(sd["sincnet.conv1d.0.low_hz_"]).reshape(-1)),
            "band_hz": jnp.asarray(_t(sd["sincnet.conv1d.0.band_hz_"]).reshape(-1)),
        },
        "norm0": ln("sincnet.norm1d.0"),
        "conv1": {
            # torch conv1d (out, in, k) -> ours (k, in, out)
            "w": jnp.asarray(_t(sd["sincnet.conv1d.1.weight"]).transpose(2, 1, 0)),
            "b": jnp.asarray(_t(sd["sincnet.conv1d.1.bias"])),
        },
        "norm1": ln("sincnet.norm1d.1"),
        "conv2": {
            "w": jnp.asarray(_t(sd["sincnet.conv1d.2.weight"]).transpose(2, 1, 0)),
            "b": jnp.asarray(_t(sd["sincnet.conv1d.2.bias"])),
        },
        "norm2": ln("sincnet.norm1d.2"),
        "lstm": lstm,
        "linear1": {
            "w": jnp.asarray(_t(sd["linear.0.weight"]).T),
            "b": jnp.asarray(_t(sd["linear.0.bias"])),
        },
        "linear2": {
            "w": jnp.asarray(_t(sd["linear.1.weight"]).T),
            "b": jnp.asarray(_t(sd["linear.1.bias"])),
        },
        "classifier": {
            "w": jnp.asarray(_t(sd["classifier.weight"]).T),
            "b": jnp.asarray(_t(sd["classifier.bias"])),
        },
    }
    return params, cfg


# ---------------------------------------------------------------------------
# ResNet34 speaker embedding
# ---------------------------------------------------------------------------

_EMBED_LINEAR_CANDIDATES = ("seg_1", "embedding", "fc", "embed", "bottleneck")


# ---------------------------------------------------------------------------
# Native .npz serialisation for the diarization stack (torch-free serving,
# mirroring models/whisper/convert.save_params)
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif isinstance(tree, list):
        items = ((str(i), v) for i, v in enumerate(tree))
    else:
        raise TypeError(type(tree))
    for k, v in items:
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, (dict, list)):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat):
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(tree)


def save_diarizer_params(path: str, seg_params: dict, emb_params: dict) -> None:
    flat = {f"seg/{k}": v for k, v in _flatten(seg_params).items()}
    flat.update({f"emb/{k}": v for k, v in _flatten(emb_params).items()})
    np.savez(path, **flat)


def load_diarizer_params(path: str) -> tuple[dict, dict]:
    with np.load(path) as z:
        seg_flat = {k[4:]: z[k] for k in z.files if k.startswith("seg/")}
        emb_flat = {k[4:]: z[k] for k in z.files if k.startswith("emb/")}
    return _unflatten(seg_flat), _unflatten(emb_flat)


def from_resnet_state_dict(
    sd: Mapping[str, Any], cfg: EmbeddingConfig | None = None
) -> tuple[dict, EmbeddingConfig]:
    sd = _strip_prefixes(sd)
    cfg = cfg or EmbeddingConfig()

    def conv(name):
        # torch conv2d (out, in, kh, kw) -> ours (kh, kw, in, out)
        return jnp.asarray(_t(sd[f"{name}.weight"]).transpose(2, 3, 1, 0))

    def bn(name):
        return {
            "scale": jnp.asarray(_t(sd[f"{name}.weight"])),
            "bias": jnp.asarray(_t(sd[f"{name}.bias"])),
            "mean": jnp.asarray(_t(sd[f"{name}.running_mean"])),
            "var": jnp.asarray(_t(sd[f"{name}.running_var"])),
        }

    stages = []
    for si, n_blocks in enumerate(cfg.blocks, start=1):
        stage = []
        for bi in range(n_blocks):
            base = f"layer{si}.{bi}"
            block = {
                "conv1": conv(f"{base}.conv1"),
                "bn1": bn(f"{base}.bn1"),
                "conv2": conv(f"{base}.conv2"),
                "bn2": bn(f"{base}.bn2"),
            }
            if f"{base}.downsample.0.weight" in sd:
                block["down_conv"] = conv(f"{base}.downsample.0")
                block["down_bn"] = bn(f"{base}.downsample.1")
            stage.append(block)
        stages.append(stage)

    embed_key = next(
        (c for c in _EMBED_LINEAR_CANDIDATES if f"{c}.weight" in sd), None
    )
    if embed_key is None:
        raise KeyError(
            f"no embedding linear found; tried {_EMBED_LINEAR_CANDIDATES}"
        )
    params = {
        "stem_conv": conv("conv1"),
        "stem_bn": bn("bn1"),
        "stages": stages,
        "fc": {
            "w": jnp.asarray(_t(sd[f"{embed_key}.weight"]).T),
            "b": jnp.asarray(
                _t(sd[f"{embed_key}.bias"])
                if f"{embed_key}.bias" in sd
                else np.zeros(_t(sd[f"{embed_key}.weight"]).shape[0], np.float32)
            ),
        },
    }
    return params, cfg
