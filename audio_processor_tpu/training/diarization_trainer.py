"""Training recipe for the TPU-native segmentation net (powerset loss).

The reference consumes pyannote's frozen segmentation checkpoint
(reference: app/services/audio_processor.py:885,1105) and has no way to
improve diarization quality.  This module adds the missing training loop
for models/diarization/segmentation_tpu: pyannote-3.1-style PERMUTATION-
INVARIANT POWERSET cross-entropy (the multilabel target is scored under
every speaker permutation and the best one trains the model — local
speaker identity within a window is arbitrary), an AdamW step in one jit
region, a synthetic-mixture generator so quality is measurable hermetically
(DER-scored test in tests/test_diarization_training.py), and an onset
calibration sweep for the binarisation threshold pipeline/diarize.py uses.
"""
from __future__ import annotations

import itertools
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.diarization import segmentation_tpu as seg

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Powerset target mapping + permutation-invariant loss
# ---------------------------------------------------------------------------

def powerset_lookup(member: np.ndarray) -> np.ndarray:
    """(2^S,) table: binary speaker-activity key -> powerset class index.

    Keys with more simultaneous speakers than any class covers (>max_
    simultaneous) map to the maximal-overlap class, so slightly noisy
    targets can't crash training.
    """
    c, s = member.shape
    lut = np.zeros(1 << s, np.int32)
    keys = (member.astype(np.int64) * (1 << np.arange(s))).sum(axis=1)
    valid = {int(k): i for i, k in enumerate(keys)}
    for key in range(1 << s):
        if key in valid:
            lut[key] = valid[key]
        else:
            bits = np.array([(key >> b) & 1 for b in range(s)], np.float32)
            overlap = member @ bits - 0.5 * member.sum(axis=1)
            lut[key] = int(np.argmax(overlap))
    return lut


def permutation_invariant_loss(
    logits: jnp.ndarray,  # (B, T, C) powerset logits
    targets: jnp.ndarray,  # (B, T, S) 0/1 multilabel speaker activity
    member: jnp.ndarray,  # (C, S)
    lut: jnp.ndarray,  # (2^S,) from powerset_lookup
) -> jnp.ndarray:
    """Mean best-permutation cross-entropy (pyannote's powerset loss).

    For every permutation of the S local speaker slots the multilabel
    target maps to a powerset class sequence; each sample trains against
    its minimum-loss permutation.
    """
    s = targets.shape[-1]
    perms = jnp.asarray(list(itertools.permutations(range(s))))  # (P, S)
    weights = jnp.asarray(1 << np.arange(s), jnp.int32)  # binary key weights

    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    def perm_loss(perm):
        permuted = targets[..., perm].astype(jnp.int32)  # (B, T, S)
        keys = (permuted * weights).sum(axis=-1)  # (B, T)
        classes = lut[keys]  # (B, T)
        nll = -jnp.take_along_axis(logprobs, classes[..., None], axis=-1)[..., 0]
        return nll.mean(axis=-1)  # (B,)

    losses = jax.vmap(perm_loss)(perms)  # (P, B)
    return jnp.min(losses, axis=0).mean()


# ---------------------------------------------------------------------------
# Train state / step
# ---------------------------------------------------------------------------

class SegTrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr=3e-4, weight_decay: float = 0.01):
    from .train_step import _decay_mask

    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(
            lr, b1=0.9, b2=0.98, eps=1e-6, weight_decay=weight_decay,
            mask=_decay_mask,
        ),
    )


def init_train_state(
    cfg: seg.TpuSegmentationConfig, key: jax.Array, lr: float = 3e-4
) -> SegTrainState:
    params = seg.init_params(cfg, key)
    opt = make_optimizer(lr)
    return SegTrainState(params=params, opt_state=opt.init(params), step=jnp.int32(0))


# lr traced: schedules must not recompile per step
@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def train_step(
    state: SegTrainState,
    cfg: seg.TpuSegmentationConfig,
    audio: jnp.ndarray,  # (B, window_samples) float32
    targets: jnp.ndarray,  # (B, num_frames, S)
    member: jnp.ndarray,
    lut: jnp.ndarray,
    lr=3e-4,
) -> tuple[SegTrainState, jnp.ndarray]:
    def loss_fn(p):
        logits = seg.forward(p, cfg, audio)
        return permutation_invariant_loss(logits, targets, member, lut)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    opt = make_optimizer(lr)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return SegTrainState(params, opt_state, state.step + 1), loss


# ---------------------------------------------------------------------------
# Synthetic mixtures (hermetic training/eval data)
# ---------------------------------------------------------------------------

def synth_voice(rng: np.random.Generator, f0: float, n: int, sr: int) -> np.ndarray:
    """A crude but spectrally distinct 'voice': harmonic stack with pitch
    wobble and syllabic amplitude modulation."""
    t = np.arange(n) / sr
    wobble = 1.0 + 0.02 * np.sin(2 * np.pi * rng.uniform(2, 5) * t)
    x = np.zeros(n)
    for h, amp in ((1, 1.0), (2, 0.6), (3, 0.4), (4, 0.25)):
        x += amp * np.sin(2 * np.pi * f0 * h * wobble * t + rng.uniform(0, 6.28))
    syllable = 0.55 + 0.45 * np.sin(2 * np.pi * rng.uniform(3, 7) * t) ** 2
    return (x * syllable * 0.25).astype(np.float32)


def synth_mixture(
    rng: np.random.Generator,
    cfg: seg.TpuSegmentationConfig,
    f0s: tuple[float, ...] = (110.0, 220.0, 400.0),
    overlap_prob: float = 0.2,
    min_turn_s: float = 0.4,
    max_turn_s: float = 1.5,
) -> tuple[np.ndarray, np.ndarray]:
    """One training window: mixed audio + (num_frames, S) activity labels."""
    n = cfg.window_samples
    sr = cfg.sample_rate
    s = cfg.num_speakers
    audio = rng.normal(0, 0.003, n).astype(np.float32)  # noise floor
    labels = np.zeros((cfg.num_frames, s), np.float32)
    frame_s = cfg.frame_step_s

    t_cursor = 0.0
    prev = -1
    while t_cursor < cfg.window_s - min_turn_s:
        spk = int(rng.integers(0, min(s, len(f0s))))
        dur = float(rng.uniform(min_turn_s, max_turn_s))
        start = t_cursor
        if prev >= 0 and spk != prev and rng.random() < overlap_prob:
            start = max(0.0, t_cursor - 0.3)  # overlap the previous turn
        end = min(start + dur, cfg.window_s)
        a, b = int(start * sr), int(end * sr)
        audio[a:b] += synth_voice(rng, f0s[spk], b - a, sr)
        fa, fb = int(start / frame_s), int(np.ceil(end / frame_s))
        labels[fa : min(fb, cfg.num_frames), spk] = 1.0
        prev = spk
        t_cursor = end + float(rng.uniform(0.0, 0.3))
    return audio, labels


def labels_to_turns(
    labels: np.ndarray, frame_s: float, prefix: str = "SPEAKER"
) -> list[dict]:
    """(T, S) activity -> [{"start","end","speaker"}] turn list."""
    turns = []
    for s in range(labels.shape[1]):
        active = labels[:, s] > 0.5
        edges = np.flatnonzero(np.diff(np.concatenate([[0], active, [0]])))
        for a, b in zip(edges[::2], edges[1::2]):
            turns.append(
                {
                    "start": float(a * frame_s),
                    "end": float(b * frame_s),
                    "speaker": f"{prefix}_{s:02d}",
                }
            )
    return turns


# ---------------------------------------------------------------------------
# Checkpoint save/load (consumed by pipeline.diarize.Diarizer)
# ---------------------------------------------------------------------------

def save_params(
    path: str,
    params: Params,
    cfg: seg.TpuSegmentationConfig,
    onset: float | None = None,
    decode: dict | None = None,
) -> None:
    """Trained segmentation params + config -> one .npz.

    ``onset`` (from calibrate_onset) rides the checkpoint as metadata so
    the serving Diarizer binarises at the calibrated threshold instead of
    the 0.5 default (pyannote ships its thresholds inside the pipeline
    config the same way).  ``decode`` may carry further calibrated
    Binarize knobs (offset / min_duration_on / min_duration_off /
    overlap_onset — see pipeline.diarize.Diarizer) the same way."""
    from .pytree_io import flatten_tree

    flat = {f"p.{k}": v for k, v in flatten_tree(params).items()}
    for field in (
        "sample_rate", "n_mels", "d_model", "n_head", "n_layer",
        "num_speakers", "max_simultaneous",
    ):
        flat[f"cfg.{field}"] = np.asarray(getattr(cfg, field))
    flat["cfg.window_s"] = np.asarray(cfg.window_s)
    if onset is not None:
        flat["meta.onset"] = np.asarray(float(onset))
    for k, v in (decode or {}).items():
        if k not in DECODE_META_KEYS:
            raise ValueError(f"unknown decode meta key {k!r}")
        if v is not None:
            flat[f"meta.{k}"] = np.asarray(float(v))
    np.savez(path, **flat)


DECODE_META_KEYS = (
    "offset", "min_duration_on", "min_duration_off", "overlap_onset",
    # pyannote-3.1's min_cluster_size (pipeline.diarize.Diarizer): long
    # meetings accumulate stray crops into spurious clusters; the
    # calibrated dissolution size rides the checkpoint like the Binarize
    # knobs (stored as float; loaded back as int below), as does the
    # meeting-length-relative min_cluster_frac
    "min_cluster_size",
    "min_cluster_frac",
)


def load_onset(path: str) -> float | None:
    """Calibrated binarisation threshold stored by save_params, if any."""
    with np.load(path) as data:
        if "meta.onset" in data.files:
            return float(data["meta.onset"])
    return None


def load_decode_meta(path: str) -> dict:
    """Calibrated Binarize knobs stored by save_params (absent keys are
    omitted, so Diarizer defaults apply)."""
    out = {}
    with np.load(path) as data:
        for k in DECODE_META_KEYS:
            if f"meta.{k}" in data.files:
                v = float(data[f"meta.{k}"])
                out[k] = int(v) if k == "min_cluster_size" else v
    return out


def load_params(path: str) -> tuple[Params, seg.TpuSegmentationConfig]:
    from .pytree_io import unflatten_tree

    with np.load(path) as z:
        data = {k: z[k] for k in z.files}
    cfg = seg.TpuSegmentationConfig(
        sample_rate=int(data["cfg.sample_rate"]),
        window_s=float(data["cfg.window_s"]),
        n_mels=int(data["cfg.n_mels"]),
        d_model=int(data["cfg.d_model"]),
        n_head=int(data["cfg.n_head"]),
        n_layer=int(data["cfg.n_layer"]),
        num_speakers=int(data["cfg.num_speakers"]),
        max_simultaneous=int(data["cfg.max_simultaneous"]),
    )
    flat = {k[2:]: data[k] for k in data if k.startswith("p.")}
    return unflatten_tree(flat), cfg


# ---------------------------------------------------------------------------
# Onset calibration (threshold hook for pipeline/diarize.Diarizer.onset)
# ---------------------------------------------------------------------------

def calibrate_onset(
    probs: np.ndarray,  # (N, T, S) predicted per-speaker probabilities
    labels: np.ndarray,  # (N, T, S) reference activity
    grid: np.ndarray | None = None,
) -> tuple[float, float]:
    """Sweep binarisation thresholds; return (best_onset, frame_error).

    The powerset loss is permutation-INVARIANT, so a trained net's local
    speaker slots need not line up with the label slots — each window's
    predictions are first aligned to the labels with a Hungarian match on
    activation overlap (without this the sweep scores slot permutations as
    errors and lands on a badly-biased threshold).  The result plugs
    straight into Diarizer(onset=...) — the reference has no calibration
    story at all (pyannote's thresholds are baked into the downloaded
    pipeline config).
    """
    from scipy.optimize import linear_sum_assignment

    if probs.shape != labels.shape:
        raise ValueError(
            f"probs {probs.shape} and labels {labels.shape} must agree — "
            "slot alignment is a permutation, not a projection"
        )
    if grid is None:
        grid = np.linspace(0.2, 0.8, 25)
    aligned = np.empty_like(probs)
    ident = np.arange(probs.shape[2], dtype=np.int64)
    for i in range(len(probs)):
        # agreement between predicted slot s and label slot l
        agree = probs[i].T @ labels[i] + (1 - probs[i]).T @ (1 - labels[i])
        rows, cols = linear_sum_assignment(-agree)
        perm = ident.copy()
        perm[cols] = rows
        aligned[i] = probs[i][:, perm]
    best = (0.5, float("inf"))
    for th in grid:
        err = float(np.mean((aligned > th) != (labels > 0.5)))
        if err < best[1]:
            best = (float(th), err)
    return best
