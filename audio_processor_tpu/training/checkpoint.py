"""Training checkpoint/resume (orbax-backed, with an npz fallback).

SURVEY.md §5.4: the reference has no checkpointing anywhere (jobs and
models alike).  Here train state (params + optimizer moments + step)
saves/restores atomically; serving weights export through
models.whisper.convert.save_params.
"""
from __future__ import annotations

import logging
import os
from typing import Any

import jax
import numpy as np

logger = logging.getLogger(__name__)


def save_train_state(path: str, state: Any) -> None:
    """Save a TrainState pytree. Uses orbax when importable, else npz."""
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        ckpt.save(os.path.abspath(path), state, force=True)
        ckpt.wait_until_finished()
        return
    except Exception as exc:  # noqa: BLE001 — fall back to flat npz
        logger.info("orbax unavailable (%s); using npz fallback", exc)
    flat, treedef = jax.tree.flatten(state)

    def to_np(x):
        a = np.asarray(x)
        if a.dtype.kind == "V":  # bf16 would round-trip as void16: upcast
            import jax.numpy as jnp

            a = np.asarray(jnp.asarray(x).astype(jnp.float32))
        return a

    np.savez(
        path if path.endswith(".npz") else path + ".npz",
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": to_np(x) for i, x in enumerate(flat)},
    )


def restore_train_state(path: str, template: Any) -> Any:
    """Restore into the structure of `template` (an abstract or concrete
    TrainState with matching shapes/dtypes)."""
    try:
        import orbax.checkpoint as ocp

        if os.path.isdir(path):
            ckpt = ocp.StandardCheckpointer()
            return ckpt.restore(os.path.abspath(path), template)
    except Exception as exc:  # noqa: BLE001
        logger.info("orbax restore failed (%s); trying npz", exc)
    npz_path = path if path.endswith(".npz") else path + ".npz"
    with np.load(npz_path) as z:
        leaves = [z[f"leaf_{i}"] for i in range(len(z.files) - 1)]
    flat_t, treedef = jax.tree.flatten(template)
    assert len(flat_t) == len(leaves), "checkpoint/template structure mismatch"
    import jax.numpy as jnp

    # cast each leaf back to the template's dtype (bf16 leaves were
    # upcast to f32 for the npz)
    return jax.tree.unflatten(
        treedef,
        [
            jnp.asarray(x, dtype=getattr(t, "dtype", None))
            for x, t in zip(leaves, flat_t)
        ],
    )
