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
    except ImportError as exc:
        logger.info("orbax unavailable (%s); using npz fallback", exc)
    else:
        try:
            ckpt = ocp.StandardCheckpointer()
            ckpt.save(os.path.abspath(path), state, force=True)
            ckpt.wait_until_finished()
            return
        except Exception:  # noqa: BLE001 — fall back to flat npz
            # a REAL save failure (disk full, permissions) is not
            # "unavailable": log it loudly so the npz fallback doesn't
            # mask a half-written orbax directory at `path`
            logger.exception(
                "orbax save FAILED for %s; writing npz fallback", path
            )
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
    except ImportError:
        ocp = None
    if ocp is not None and os.path.isdir(path):
        try:
            ckpt = ocp.StandardCheckpointer()
            return ckpt.restore(os.path.abspath(path), template)
        except Exception:  # noqa: BLE001
            # an orbax dir EXISTS but failed to restore — surface the real
            # error before the npz attempt turns it into a confusing
            # FileNotFoundError for an archive that never existed
            logger.exception(
                "orbax restore FAILED for existing checkpoint %s; "
                "trying npz", path,
            )
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
