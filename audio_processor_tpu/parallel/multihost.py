"""Multi-host (multi-process) TPU bring-up: jax.distributed + DCN-aware mesh.

The reference has no distributed backend (SURVEY.md §5.8: no NCCL/MPI, its
two gunicorn workers literally cannot see each other's jobs).  This module
is the rebuild's scale-out story:

  * every host runs one process; `initialize()` wires them into one JAX
    runtime via jax.distributed (coordinator = process 0),
  * `make_multihost_mesh()` lays the (data, model) mesh out so MODEL
    (tensor-parallel) groups stay INSIDE a host slice — collectives ride
    ICI — while DATA parallelism spans hosts over DCN, where only
    per-batch activations cross (the cheap direction),
  * the serving tier shares job state through the Redis job store
    (runtime/job_store.py), so any number of API workers on any host see
    one queue.

Bring-up smoke test (run on every host, coordinator first):

    APTPU_COORDINATOR=host0:8476 APTPU_NUM_PROCESSES=2 APTPU_PROCESS_ID=0 \
        python -m audio_processor_tpu.parallel.multihost --check

Env (all optional on Cloud TPU, where jax.distributed auto-detects):
    APTPU_COORDINATOR     coordinator_address host:port
    APTPU_NUM_PROCESSES   total process count
    APTPU_PROCESS_ID      this process's rank
"""
from __future__ import annotations

import logging
import os

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import DATA_AXIS, MODEL_AXIS

logger = logging.getLogger(__name__)

_initialized = False


def initialize(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Join the multi-process JAX runtime.  Returns True if distributed.

    Arguments fall back to APTPU_* env vars, then to jax.distributed's own
    auto-detection (TPU metadata on Cloud TPU pods).  Safe to call twice
    and safe to call single-process (no env, no args -> no-op, False).
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1

    coordinator = coordinator or os.environ.get("APTPU_COORDINATOR")
    num_str = os.environ.get("APTPU_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(num_str) if num_str else None
    )
    pid_str = os.environ.get("APTPU_PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(pid_str) if pid_str else None
    )

    if coordinator is None and num_processes is None:
        # no explicit topology: give jax.distributed's own auto-detection
        # a chance (TPU pod metadata) — without this, a Cloud TPU pod with
        # APTPU_DISTRIBUTED=1 and no APTPU_COORDINATOR silently built a
        # local-only mesh on every host (split-brain serving)
        try:
            jax.distributed.initialize()
        except Exception as exc:  # noqa: BLE001 — not a cluster: run local
            logger.info(
                "no multi-process environment detected (%s) — "
                "single-process serving", exc,
            )
            return False
        _initialized = True
        logger.info(
            "jax.distributed up (auto-detected): process %d/%d",
            jax.process_index(), jax.process_count(),
        )
        return jax.process_count() > 1

    # explicit topology must be COMPLETE: a lone APTPU_COORDINATOR (or a
    # lone APTPU_NUM_PROCESSES) would call initialize with None fields
    # and crash startup with an opaque error instead of this one
    missing = [
        name
        for name, val in (
            ("APTPU_COORDINATOR", coordinator),
            ("APTPU_NUM_PROCESSES", num_processes),
            ("APTPU_PROCESS_ID", process_id),
        )
        if val is None
    ]
    if missing:
        raise ValueError(
            "explicit multihost topology is incomplete: set "
            + ", ".join(missing)
            + " (or unset APTPU_COORDINATOR/APTPU_NUM_PROCESSES entirely "
            "for auto-detection)"
        )
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    logger.info(
        "jax.distributed up: process %d/%d, %d local + %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return True


def make_multihost_mesh(model_parallel: int = 1) -> Mesh:
    """(data, model) mesh over ALL processes' devices, DCN-aware.

    Layout rule: the MODEL axis must never cross a host boundary — TP
    collectives (all_gather/reduce_scatter around every sharded matmul)
    are latency-critical and belong on ICI; the DATA axis is outermost so
    host boundaries only carry data-parallel traffic (activations in,
    psum-of-gradients in training) over DCN.

    Single-process: identical to mesh.make_mesh (devices are already
    ICI-only).  Multi-process: devices are ordered process-major, so
    reshaping (hosts, local) keeps TP groups local; model_parallel must
    divide the LOCAL device count.
    """
    n_local = jax.local_device_count()
    if model_parallel > n_local or n_local % model_parallel != 0:
        raise ValueError(
            f"model_parallel={model_parallel} must divide the local device "
            f"count {n_local}: tensor-parallel groups must stay on one "
            "host's ICI domain"
        )
    # jax.devices() order is NOT guaranteed process-contiguous (v4+ cube
    # topologies interleave global ids across hosts): sort by
    # (process_index, id) so the reshape's model-axis rows stay within one
    # host, then ASSERT it — a silent cross-host TP row would put every
    # sharded matmul's collectives on DCN, exactly what this mesh exists
    # to prevent.
    devices = np.asarray(
        sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    )
    grid = devices.reshape(len(devices) // model_parallel, model_parallel)
    if model_parallel > 1:
        for row in grid:
            procs = {d.process_index for d in row}
            if len(procs) != 1:
                raise AssertionError(
                    f"model-parallel group spans processes {sorted(procs)}; "
                    "device numbering is not host-contiguous on this "
                    "topology — reduce model_parallel or adjust the layout"
                )
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def check() -> dict:
    """Cross-host smoke test: a psum over the data axis must see every
    device.  Returns a summary dict (also logged)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    distributed = initialize()
    mesh = make_multihost_mesh()
    n = jax.device_count()

    # one shard per device, value 1: the psum must equal the device count
    local = jnp.ones((jax.local_device_count(), 1), jnp.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(DATA_AXIS)), np.asarray(local)
    )

    @jax.jit
    def total(x):
        return jnp.sum(x)

    got = float(total(arr))
    ok = got == float(n)
    summary = {
        "distributed": distributed,
        "process": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": n,
        "mesh": dict(mesh.shape),
        "psum_expected": float(n),
        "psum_got": got,
        "ok": ok,
    }
    logger.info("multihost check: %s", summary)
    if not ok:
        raise RuntimeError(f"collective saw {got} devices, expected {n}")
    return summary


if __name__ == "__main__":
    import argparse
    import json

    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--check", action="store_true", help="run the smoke test")
    args = ap.parse_args()
    if args.check:
        print(json.dumps(check()))
