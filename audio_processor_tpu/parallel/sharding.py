"""Sharding rules (PartitionSpec trees) for the model families.

Tensor-parallel layout for Whisper follows the Megatron pattern mapped to
our (d_in, d_out) weight convention:

  * qkv projections: shard d_out (heads) over "model"  -> column parallel
  * attn out:        shard d_in  (heads) over "model"  -> row parallel
  * fc1:             shard d_out (hidden) over "model"
  * fc2:             shard d_in  (hidden) over "model"
  * embeddings/LN:   replicated (vocab matmul is small next to decode cost)

XLA inserts the all-reduce after row-parallel matmuls from these
annotations; nothing manual.  Stacked layer params carry a leading L axis,
so every spec below is prefixed with None for it.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def _attn_spec():
    return {
        "q": {"w": P(None, None, MODEL_AXIS), "b": P(None, MODEL_AXIS)},
        "k": {"w": P(None, None, MODEL_AXIS)},
        "v": {"w": P(None, None, MODEL_AXIS), "b": P(None, MODEL_AXIS)},
        "out": {"w": P(None, MODEL_AXIS, None), "b": P(None)},
    }


def _ln_spec():
    return {"scale": P(None), "bias": P(None)}


def _block_spec(cross: bool):
    spec = {
        "attn_ln": _ln_spec(),
        "attn": _attn_spec(),
        "mlp_ln": _ln_spec(),
        "fc1": {"w": P(None, None, MODEL_AXIS), "b": P(None, MODEL_AXIS)},
        "fc2": {"w": P(None, MODEL_AXIS, None), "b": P(None)},
    }
    if cross:
        spec["cross_attn_ln"] = _ln_spec()
        spec["cross_attn"] = _attn_spec()
    return spec


def whisper_param_spec() -> dict:
    """PartitionSpec tree matching models.whisper.model.init_params."""
    return {
        "encoder": {
            "conv1": {"w": P(), "b": P()},
            "conv2": {"w": P(), "b": P()},
            "pos_emb": P(),
            "blocks": _block_spec(cross=False),
            "ln_post": {"scale": P(), "bias": P()},
        },
        "decoder": {
            "token_emb": P(),
            "pos_emb": P(),
            "blocks": _block_spec(cross=True),
            "ln": {"scale": P(), "bias": P()},
        },
    }



def shard_params(params, mesh: Mesh, spec: dict | None = None):
    """device_put the param tree with its TP sharding over the mesh."""
    spec = spec or whisper_param_spec()
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        spec,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.device_put(params, shardings)


def param_shardings(mesh: Mesh, spec: dict | None = None):
    spec = spec or whisper_param_spec()
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        spec,
        is_leaf=lambda x: isinstance(x, P),
    )
