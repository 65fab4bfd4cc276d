"""Fail-fast accelerator liveness probe.

The reference's failure story is per-call retries (reference:
app/services/audio_processor.py:876-895); it never has to ask whether the
accelerator itself is alive because it runs on CPU.  A TPU deployment
does: when the device transport dies (e.g. the tunnel/relay process is
gone), every device op blocks FOREVER — the first symptom is a server
that hangs during model init with no log line and no exit code.

probe_device() runs the first trivial device op inside a watchdog thread
and turns that silent hang into a bounded, actionable startup error.
Called once from build_services() before any model parameters are
materialised on device.
"""
from __future__ import annotations

import logging
import os
import threading

logger = logging.getLogger(__name__)

# Generous by default: the first op on a cold axon tunnel can take minutes
# (worker restart after OOM is 1-3 min; first compile 1-10 min is avoided
# here because the probe op is a single scalar add).  0 disables.
DEFAULT_TIMEOUT_S = 300.0


class DeviceUnresponsiveError(RuntimeError):
    """The accelerator backend did not answer a trivial op in time."""


def _default_probe() -> str:
    import jax
    import jax.numpy as jnp
    import numpy as np

    platform = jax.devices()[0].platform
    # np.asarray is the real sync point (block_until_ready does not block
    # through some remote transports); a scalar add never hits a slow
    # compile path.
    np.asarray(jnp.ones(()) + 1)
    return platform


def probe_device(timeout_s: float | None = None, _probe=None) -> str:
    """Run one trivial op on the default backend under a deadline.

    Returns the platform name ("tpu"/"cpu"/...).  Raises
    DeviceUnresponsiveError if the op does not complete within
    ``timeout_s`` (default APTPU_DEVICE_INIT_TIMEOUT_S, else 300 s;
    0 or negative disables the check entirely).

    The hung worker thread cannot be cancelled — it is left as a daemon
    and the caller is expected to treat the error as fatal (exit), which
    is the point: a crashed startup with a clear message beats a server
    that hangs forever in model init.
    """
    if timeout_s is None:
        timeout_s = float(os.environ.get("APTPU_DEVICE_INIT_TIMEOUT_S", DEFAULT_TIMEOUT_S))
    probe = _probe or _default_probe
    if timeout_s <= 0:
        return probe()

    result: dict = {}

    def run():
        try:
            result["platform"] = probe()
        except BaseException as exc:  # noqa: BLE001 — re-raised below
            result["error"] = exc

    t = threading.Thread(target=run, name="aptpu-device-probe", daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        raise DeviceUnresponsiveError(
            f"accelerator backend did not answer a trivial op within "
            f"{timeout_s:.0f} s — the device transport is probably down "
            "(on axon boxes: check the tunnel relay process). Fix the "
            "device, deploy CPU-only with JAX_PLATFORMS=cpu, or raise/"
            "disable this check with APTPU_DEVICE_INIT_TIMEOUT_S."
        )
    if "error" in result:
        raise result["error"]
    platform = result.get("platform", "unknown")
    logger.info("device probe ok: platform=%s", platform)
    return platform
