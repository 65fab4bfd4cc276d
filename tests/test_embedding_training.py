"""Speaker-embedding AAM-softmax trainer: the cosine margins AHC clusters
on must measurably improve on synthetic speakers (hermetic, CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np

from audio_processor_tpu.models.diarization import embedding as emb
from audio_processor_tpu.training import embedding_trainer as et

CFG = emb.EmbeddingConfig(
    n_mels=24, base_channels=8, blocks=(1, 1, 1, 1), embed_dim=32, crop_s=1.0
)
F0S = (110.0, 240.0, 420.0, 640.0)


def _dataset(rng, per_speaker=6):
    crops, labels = [], []
    for spk, f0 in enumerate(F0S):
        for _ in range(per_speaker):
            crops.append(et.synth_speaker_crop(rng, f0, CFG))
            labels.append(spk)
    return np.stack(crops), np.asarray(labels, np.int32)


def test_aam_loss_decreases_and_separation_improves():
    rng = np.random.default_rng(0)
    crops, labels = _dataset(rng)
    state = et.init_train_state(CFG, len(F0S), jax.random.PRNGKey(0), lr=2e-3)
    sep0 = et.embedding_separation(state.params, CFG, crops, labels)

    first = last = None
    for step in range(60):
        idx = rng.integers(0, len(labels), 16)
        state, loss = et.train_step(
            state, CFG, jnp.asarray(crops[idx]), jnp.asarray(labels[idx]),
            lr=2e-3,
        )
        last = float(loss)
        if first is None:
            first = last
    assert last < first, (first, last)

    sep1 = et.embedding_separation(state.params, CFG, crops, labels)
    # trained embeddings separate the 4 synthetic speakers materially
    # better than random init — the signal AHC thresholds on
    assert sep1 > sep0 + 0.1, (sep0, sep1)


def test_aam_margin_penalises_target_class():
    """With the margin, the target-class logit is strictly smaller than
    the plain cosine logit (for positive cosines), so the loss is an
    upper bound on plain softmax CE."""
    rng = np.random.default_rng(1)
    crops, labels = _dataset(rng, per_speaker=2)
    state = et.init_train_state(CFG, len(F0S), jax.random.PRNGKey(1))
    a = float(
        et.aam_softmax_loss(
            state.params, state.head_w, CFG, jnp.asarray(crops),
            jnp.asarray(labels), margin=0.2,
        )
    )
    b = float(
        et.aam_softmax_loss(
            state.params, state.head_w, CFG, jnp.asarray(crops),
            jnp.asarray(labels), margin=0.0,
        )
    )
    assert a >= b - 1e-6
