"""Flat .npz (de)serialisation for list/dict param pytrees.

Shared by the trainer checkpoints (segmentation, embedding): nested
dicts/lists flatten to dotted keys under a prefix; integer-keyed dicts
restore to lists.  (convert.py modules keep their own flatteners because
their on-disk layouts are frozen compatibility contracts.)
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def flatten_tree(tree, prefix: str = "") -> dict[str, np.ndarray]:
    flat: dict[str, np.ndarray] = {}
    items = (
        tree.items() if isinstance(tree, dict)
        else ((str(i), v) for i, v in enumerate(tree))
    )
    for k, v in items:
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, (dict, list, tuple)):
            flat.update(flatten_tree(v, key))
        else:
            a = np.asarray(v)
            if a.dtype.kind == "V":  # bfloat16 -> np.savez void16: upcast
                a = np.asarray(jnp.asarray(v).astype(jnp.float32))
            flat[key] = a
    return flat


def unflatten_tree(flat: dict[str, np.ndarray]):
    tree: dict = {}
    for key, value in flat.items():
        node = tree
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(value)

    def restore_lists(t):
        """Dicts whose keys are all integers were lists before saving."""
        if not isinstance(t, dict):
            return t
        if t and all(k.isdigit() for k in t):
            return [restore_lists(t[str(i)]) for i in range(len(t))]
        return {k: restore_lists(v) for k, v in t.items()}

    return restore_lists(tree)
