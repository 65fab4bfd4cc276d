"""Pallas fused log-mel kernel vs the jnp reference (interpret mode on CPU;
the same kernel is verified compiled-on-TPU to ~2e-5 — see commit notes)."""
import numpy as np
import pytest
import jax.numpy as jnp

from audio_processor_tpu.ops import frontend
from audio_processor_tpu.ops.pallas.mel_kernel import log_mel_pallas


@pytest.mark.parametrize("batch", [1, 2])
def test_pallas_mel_matches_reference(rng, batch):
    audio = rng.normal(0, 0.2, (batch, frontend.N_SAMPLES)).astype(np.float32)
    ref = np.asarray(frontend.log_mel_spectrogram(jnp.asarray(audio)))
    out = np.asarray(log_mel_pallas(jnp.asarray(audio), interpret=True))
    assert out.shape == ref.shape == (batch, 80, 3000)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_pallas_mel_1d_input(rng):
    audio = rng.normal(0, 0.2, frontend.N_SAMPLES).astype(np.float32)
    out = np.asarray(log_mel_pallas(jnp.asarray(audio), interpret=True))
    assert out.shape == (1, 80, 3000)


def test_pallas_mel_128_bins(rng):
    """large-v3 uses 128 mel bins."""
    audio = rng.normal(0, 0.2, (1, frontend.N_SAMPLES)).astype(np.float32)
    ref = np.asarray(frontend.log_mel_spectrogram(jnp.asarray(audio), n_mels=128))
    out = np.asarray(log_mel_pallas(jnp.asarray(audio), n_mels=128, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-4)
