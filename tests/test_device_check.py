"""Fail-fast device liveness probe (runtime/device_check.py).

A dead device transport (e.g. the TPU tunnel relay process gone) makes
every jax op block forever; build_services must turn that into a bounded
startup error instead of a silent hang.
"""
import time

import pytest

from audio_processor_tpu.runtime.device_check import (
    DeviceUnresponsiveError,
    probe_device,
)


def test_probe_succeeds_on_live_backend():
    # conftest forces the CPU backend: the real probe op must complete
    # quickly and report the platform.
    assert probe_device(timeout_s=60.0) == "cpu"


def test_probe_times_out_on_hung_backend():
    def hang():
        time.sleep(30)
        return "never"

    start = time.monotonic()
    with pytest.raises(DeviceUnresponsiveError) as ei:
        probe_device(timeout_s=0.2, _probe=hang)
    assert time.monotonic() - start < 5
    # actionable message: names the env knob and the CPU escape hatch
    assert "APTPU_DEVICE_INIT_TIMEOUT_S" in str(ei.value)
    assert "JAX_PLATFORMS=cpu" in str(ei.value)


def test_probe_propagates_backend_errors():
    def boom():
        raise ValueError("no devices")

    with pytest.raises(ValueError, match="no devices"):
        probe_device(timeout_s=5.0, _probe=boom)


def test_zero_timeout_disables_watchdog():
    # timeout 0 runs the probe inline (no thread) — callers that want the
    # old block-forever behaviour can have it explicitly
    assert probe_device(timeout_s=0, _probe=lambda: "inline") == "inline"


def test_env_timeout_used(monkeypatch):
    monkeypatch.setenv("APTPU_DEVICE_INIT_TIMEOUT_S", "0.2")
    with pytest.raises(DeviceUnresponsiveError):
        probe_device(_probe=lambda: time.sleep(30))
