"""Device-mesh construction for single-host TPU slices.

The reference has no distributed backend at all (SURVEY.md §2 'parallelism
strategies: absent'); its only concurrency is a ThreadPoolExecutor.  Here the
scaling unit is a jax.sharding.Mesh with two axes:

  * "data"  — batch-parallel decode of 30 s chunks (the workload's natural
              parallelism; long meetings scale over the batch axis).
  * "model" — tensor-parallel sharding of attention heads / MLP hidden dim
              for Whisper variants too large or too latency-sensitive for a
              single chip.

Collectives ride ICI within the slice; XLA inserts them from sharding
annotations (all_gather/reduce_scatter around the TP matmuls, psum for DP
gradient reduction in training).
"""
from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: int | None = None,
    model_parallel: int = 1,
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh over the available (or given) devices.

    model_parallel must divide the device count; the rest goes to data
    parallelism.  With one device this degenerates to a 1x1 mesh so every
    code path stays mesh-aware without special cases.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"model_parallel={model_parallel} must divide {n} devices")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding: leading axis split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def round_up_batch(n: int, mesh: Mesh) -> int:
    """Smallest batch >= n that divides evenly over the data axis."""
    d = mesh.shape[DATA_AXIS]
    return int(math.ceil(n / d) * d)
