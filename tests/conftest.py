"""Test config: force JAX onto a virtual 8-device CPU platform.

Must run before jax initialises — pytest imports conftest first, so setting
the env vars here is the standard trick for testing pjit/shard_map topologies
without TPUs (SURVEY.md §4).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize force-registers the tunnelled TPU backend with
# jax.config.update("jax_platforms", "axon,cpu"), overriding the env var —
# re-update AFTER importing jax so tests really run on the virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: repeat suite runs skip XLA compiles
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def speech_like_audio(rng):
    """10 s of synthetic 'speech': AM-modulated harmonics + noise + silences."""
    sr = 16_000
    t = np.arange(10 * sr) / sr
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.5 * t)
    sig = sum(np.sin(2 * np.pi * k * f0 * t) / k for k in range(1, 6))
    envelope = (np.sin(2 * np.pi * 1.3 * t) > -0.2).astype(np.float32)
    sig = sig * envelope * 0.3 + rng.normal(0, 0.01, len(t))
    sig[: sr // 2] = 0.0  # leading silence
    sig[-sr:] = 0.0  # trailing silence
    return sig.astype(np.float32)
