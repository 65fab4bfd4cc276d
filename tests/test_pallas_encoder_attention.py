"""Equivalence tests for the fused Pallas encoder self-attention.

Interpret mode stands in for the TPU backend (same convention as
tests/test_parallel.py's int4 kernel tests); the reference is the einsum
attention the whole parity stack is pinned against
(models/whisper/model.attention).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from audio_processor_tpu.models.whisper.model import attention
from audio_processor_tpu.ops.pallas.encoder_attention import fused_self_attention


@pytest.mark.parametrize("t", [64, 50])  # divisible and tail-padded grids
def test_matches_einsum_f32(rng, t):
    b, h, dh = 2, 4, 64
    q = jnp.asarray(rng.normal(0, 1, (b, t, h, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (b, t, h, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (b, t, h, dh)).astype(np.float32))
    ref = np.asarray(attention(q, k, v))
    out = np.asarray(fused_self_attention(q, k, v, block_q=32, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_matches_einsum_bf16(rng):
    b, t, h, dh = 1, 96, 2, 64
    mk = lambda: jnp.asarray(  # noqa: E731
        rng.normal(0, 1, (b, t, h, dh)).astype(np.float32), jnp.bfloat16
    )
    q, k, v = mk(), mk(), mk()
    ref = np.asarray(attention(q, k, v), np.float32)
    out = np.asarray(
        fused_self_attention(q, k, v, block_q=32, interpret=True), np.float32
    )
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_encode_fused_matches_einsum(rng):
    """Full encoder forward with fused_attn (interpret-patched) must equal
    the production einsum encoder — the serving switch cannot drift."""
    import jax

    from audio_processor_tpu.models.whisper import model as model_lib
    from audio_processor_tpu.models.whisper.config import WhisperConfig
    from audio_processor_tpu.ops.pallas import encoder_attention as ea

    cfg = WhisperConfig(
        name="t", n_mels=80, n_audio_ctx=32, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_vocab=256, n_text_ctx=16, n_text_state=64,
        n_text_head=4, n_text_layer=1,
    )
    params = model_lib.init_params(cfg, jax.random.PRNGKey(0))
    mel = jnp.asarray(
        rng.normal(0, 1, (2, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    )
    ref = np.asarray(model_lib.encode(params, cfg, mel))

    orig = ea.fused_self_attention

    def interp(q, k, v, **kw):
        kw["interpret"] = True
        return orig(q, k, v, **kw)

    try:
        ea.fused_self_attention = interp
        out = np.asarray(model_lib.encode(params, cfg, mel, fused_attn=True))
    finally:
        ea.fused_self_attention = orig
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)
