"""Speaker-embedding training: AAM-softmax (ArcFace) on the ResNet34.

Completes the diarization train-to-serve story: diarization_trainer.py
covers the segmentation net (powerset loss), this covers the embedding
net whose cosine space drives AHC clustering (pipeline/diarize.py).  The
reference consumes a frozen pyannote embedding model
(app/services/audio_processor.py:885) and cannot adapt it; first-party
weights make domain adaptation (new microphones, new languages, far-field
audio) a training loop.

AAM-softmax is the standard speaker-verification objective (additive
angular margin on the target class before a scaled softmax): it directly
optimises what AHC consumes — cosine margins between speakers.  One jit
region, donated state, AdamW; data-parallel over the batch axis by
construction (pure batched ops, no cross-example state).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.diarization import embedding as emb


class EmbTrainState(NamedTuple):
    params: Any  # embedding net params
    head_w: jnp.ndarray  # (n_speakers, embed_dim) classification prototypes
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr=1e-3, weight_decay: float = 1e-4):
    from .train_step import _decay_mask

    return optax.chain(
        optax.clip_by_global_norm(3.0),
        optax.adamw(
            lr, b1=0.9, b2=0.98, eps=1e-6, weight_decay=weight_decay,
            mask=_decay_mask,
        ),
    )


def init_train_state(
    cfg: emb.EmbeddingConfig,
    n_speakers: int,
    key: jax.Array,
    lr: float = 1e-3,
) -> EmbTrainState:
    kp, kh = jax.random.split(key)
    params = emb.init_params(cfg, kp)
    head = jax.random.normal(kh, (n_speakers, cfg.embed_dim), jnp.float32)
    head = head / jnp.linalg.norm(head, axis=-1, keepdims=True)
    opt = make_optimizer(lr)
    return EmbTrainState(
        params=params,
        head_w=head,
        opt_state=opt.init((params, head)),
        step=jnp.int32(0),
    )


def aam_softmax_loss(
    params: Any,
    head_w: jnp.ndarray,
    cfg: emb.EmbeddingConfig,
    audio: jnp.ndarray,  # (B, crop_samples) float32
    labels: jnp.ndarray,  # (B,) int32 speaker ids
    *,
    margin: float = 0.2,
    scale: float = 30.0,
) -> jnp.ndarray:
    """Additive-angular-margin softmax over L2-normalised embeddings."""
    from ..ops import fbank as fbank_lib

    feats = fbank_lib.fbank(audio, n_mels=cfg.n_mels)
    e = emb.forward(params, cfg, feats)  # (B, D), unit-norm
    w = head_w / jnp.maximum(
        jnp.linalg.norm(head_w, axis=-1, keepdims=True), 1e-9
    )
    cos = e @ w.T  # (B, n_speakers) = cos(theta)
    # cos(theta + m) on the target class only
    sin = jnp.sqrt(jnp.clip(1.0 - cos**2, 1e-9, 1.0))
    cos_m = cos * math.cos(margin) - sin * math.sin(margin)
    # standard easy-margin guard: only apply the margin while cos > 0
    cos_target = jnp.where(cos > 0, cos_m, cos)
    onehot = jax.nn.one_hot(labels, head_w.shape[0])
    logits = scale * jnp.where(onehot > 0, cos_target, cos)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(onehot * logprobs, axis=-1))


@partial(
    jax.jit,
    static_argnames=("cfg", "margin", "scale"),  # lr traced: schedules
    # must not recompile per step
    donate_argnames=("state",),
)
def train_step(
    state: EmbTrainState,
    cfg: emb.EmbeddingConfig,
    audio: jnp.ndarray,
    labels: jnp.ndarray,
    lr=1e-3,
    margin: float = 0.2,
    scale: float = 30.0,
) -> tuple[EmbTrainState, jnp.ndarray]:
    def loss_fn(pw):
        p, w = pw
        return aam_softmax_loss(
            p, w, cfg, audio, labels, margin=margin, scale=scale
        )

    loss, grads = jax.value_and_grad(loss_fn)((state.params, state.head_w))
    opt = make_optimizer(lr)
    updates, opt_state = opt.update(
        grads, state.opt_state, (state.params, state.head_w)
    )
    params, head = optax.apply_updates((state.params, state.head_w), updates)
    return EmbTrainState(params, head, opt_state, state.step + 1), loss


# ---------------------------------------------------------------------------
# Hermetic synthetic speakers (training/eval data without audio assets)
# ---------------------------------------------------------------------------

def synth_speaker_crop(
    rng: np.random.Generator, speaker_f0: float, cfg: emb.EmbeddingConfig
) -> np.ndarray:
    """One crop of a synthetic 'speaker' (reuses the segmentation
    trainer's harmonic-stack voice model so the two recipes share a
    speaker identity notion)."""
    from .diarization_trainer import synth_voice

    n = cfg.crop_samples
    x = rng.normal(0, 0.003, n).astype(np.float32)
    x += synth_voice(rng, speaker_f0 * rng.uniform(0.97, 1.03), n, cfg.sample_rate)
    return x


def embedding_separation(
    params: Any, cfg: emb.EmbeddingConfig, crops: np.ndarray, labels: np.ndarray
) -> float:
    """Mean intra-speaker cosine minus mean inter-speaker cosine — the
    margin AHC actually clusters on.  Higher is better."""
    e = np.asarray(
        emb.embed_crops(params, cfg, jnp.asarray(crops))
    )
    sims = e @ e.T
    same = labels[:, None] == labels[None, :]
    off_diag = ~np.eye(len(labels), dtype=bool)
    intra = sims[same & off_diag]
    inter = sims[~same]
    if intra.size == 0 or inter.size == 0:
        # a batch where some speaker has a single crop (or only one
        # speaker) has no intra/inter pairs — 0.0, not NaN, so threshold
        # calibration consuming this never silently propagates NaN
        return 0.0
    return float(intra.mean() - inter.mean())


# ---------------------------------------------------------------------------
# Serialisation (serve with pipeline/diarize.Diarizer(emb_params=..., ...))
# ---------------------------------------------------------------------------

def save_params(
    path: str,
    params: Any,
    cfg: emb.EmbeddingConfig,
    cluster_threshold: float | None = None,
) -> None:
    """Trained embedding params + config -> one .npz.

    ``cluster_threshold`` (an AHC cosine-distance cut calibrated against
    THIS embedding space, e.g. by tools/make_bundled_diarizer.py) rides
    the checkpoint as metadata — pyannote ships its clustering threshold
    inside the pipeline config the same way."""
    from .pytree_io import flatten_tree

    flat = {f"p.{k}": v for k, v in flatten_tree(params).items()}
    for field in ("n_mels", "base_channels", "embed_dim", "sample_rate"):
        flat[f"cfg.{field}"] = np.asarray(getattr(cfg, field))
    flat["cfg.blocks"] = np.asarray(cfg.blocks)
    flat["cfg.crop_s"] = np.asarray(cfg.crop_s)
    if cluster_threshold is not None:
        flat["meta.cluster_threshold"] = np.asarray(float(cluster_threshold))
    np.savez(path, **flat)


def load_cluster_threshold(path: str) -> float | None:
    """Calibrated AHC threshold stored by save_params, if any."""
    with np.load(path) as data:
        if "meta.cluster_threshold" in data.files:
            return float(data["meta.cluster_threshold"])
    return None


def load_params(path: str) -> tuple[Any, emb.EmbeddingConfig]:
    from .pytree_io import unflatten_tree

    with np.load(path) as z:
        data = {k: z[k] for k in z.files}
    cfg = emb.EmbeddingConfig(
        n_mels=int(data["cfg.n_mels"]),
        base_channels=int(data["cfg.base_channels"]),
        blocks=tuple(int(b) for b in data["cfg.blocks"]),
        embed_dim=int(data["cfg.embed_dim"]),
        crop_s=float(data["cfg.crop_s"]),
        sample_rate=int(data["cfg.sample_rate"]),
    )
    flat = {k[2:]: data[k] for k in data if k.startswith("p.")}
    return unflatten_tree(flat), cfg
