"""Fine-tuning support: sharded Whisper training step (dp x tp).

The reference cannot train anything — it consumes frozen upstream models.
Rebuilding the engines first-party makes fine-tuning a first-class
capability: cross-entropy over teacher-forced transcripts, AdamW, one jit
region, donated state, gradients reduced over the data axis and TP shards
over the model axis purely via sharding annotations.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.whisper import model as whisper_model
from ..models.whisper.config import WhisperConfig
from ..parallel import sharding as sharding_lib
from jax.sharding import NamedSharding, PartitionSpec as P


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class Batch(NamedTuple):
    mel: jnp.ndarray        # (B, n_mels, T_mel)
    tokens_in: jnp.ndarray  # (B, T) decoder input (sot ... )
    tokens_out: jnp.ndarray # (B, T) shifted targets
    loss_mask: jnp.ndarray  # (B, T) 1.0 on real tokens


def _decay_mask(params):
    """Decay matmul weights only: biases, LayerNorm/BatchNorm scales and
    statistics are 1-D and standard recipes exclude them (decaying a BN
    running var toward 0 monotonically amplifies activations)."""
    import jax

    return jax.tree.map(lambda p: jnp.ndim(p) >= 2, params)


def make_optimizer(lr=1e-4, weight_decay: float = 0.01) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(
            lr, b1=0.9, b2=0.98, eps=1e-6, weight_decay=weight_decay,
            mask=_decay_mask,
        ),
    )


def init_train_state(cfg: WhisperConfig, key: jax.Array, lr: float = 1e-4) -> TrainState:
    params = whisper_model.init_params(cfg, key)
    opt = make_optimizer(lr)
    return TrainState(params=params, opt_state=opt.init(params), step=jnp.int32(0))


def loss_fn(params, cfg: WhisperConfig, batch: Batch, compute_dtype=jnp.float32):
    audio = whisper_model.encode(params, cfg, batch.mel, compute_dtype=compute_dtype)
    logits = whisper_model.decode_logits(
        params, cfg, batch.tokens_in, audio, compute_dtype=compute_dtype
    ).astype(jnp.float32)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logprobs, batch.tokens_out[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(batch.loss_mask), 1.0)
    return jnp.sum(nll * batch.loss_mask) / denom


# lr is TRACED (not static): a schedule passing a new value per step must
# not retrace/recompile the whole program each step
@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def train_step(state: TrainState, cfg: WhisperConfig, batch: Batch, lr=1e-4):
    loss, grads = jax.value_and_grad(loss_fn)(state.params, cfg, batch)
    opt = make_optimizer(lr)
    updates, new_opt = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(new_params, new_opt, state.step + 1), loss


def shard_train_state(state: TrainState, mesh) -> TrainState:
    """Place params + optimizer state with the TP spec, step replicated."""
    pspec = sharding_lib.whisper_param_spec()
    params = sharding_lib.shard_params(state.params, mesh, pspec)
    opt_state = _place_opt_state(state.opt_state, mesh, pspec)
    step = jax.device_put(state.step, NamedSharding(mesh, P()))
    return TrainState(params, opt_state, step)


def _place_opt_state(opt_state, mesh, pspec):
    """Shard adam mu/nu like their params; everything else replicated."""
    flat_param_specs = jax.tree.leaves(
        pspec, is_leaf=lambda x: isinstance(x, P)
    )

    def place_like_params(subtree):
        leaves, treedef = jax.tree.flatten(subtree)
        if len(leaves) == len(flat_param_specs):
            placed = [
                jax.device_put(x, NamedSharding(mesh, s))
                for x, s in zip(leaves, flat_param_specs)
            ]
            return jax.tree.unflatten(treedef, placed)
        # loud, not silent: replicating mu/nu doubles per-device optimizer
        # memory — the exact failure sharding them exists to prevent
        import logging

        logging.getLogger(__name__).warning(
            "optimizer-state leaf count %d != param-spec count %d — "
            "mu/nu fall back to REPLICATED placement (2x f32 params per "
            "device); the optax state layout has drifted from "
            "whisper_param_spec", len(leaves), len(flat_param_specs),
        )
        return jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), subtree
        )

    def replicate(subtree):
        return jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), subtree
        )

    def place(piece):
        # optax.chain NESTS states: (EmptyState, (ScaleByAdamState, ...)) —
        # recurse through plain tuples or adamw's mu/nu never get sharded
        # (they silently replicated, 2x full f32 params per device)
        if hasattr(piece, "_fields"):  # e.g. ScaleByAdamState(count, mu, nu)
            fields = {}
            for name in piece._fields:
                val = getattr(piece, name)
                fields[name] = (
                    place_like_params(val) if name in ("mu", "nu")
                    else replicate(val)
                )
            return type(piece)(**fields)
        if isinstance(piece, (tuple, list)):
            return type(piece)(place(x) for x in piece)
        return replicate(piece)

    return place(tuple(opt_state))
