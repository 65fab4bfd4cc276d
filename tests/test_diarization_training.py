"""Powerset training recipe: loss correctness + DER actually improves.

VERDICT r1 item 6: the architecture-only segmentation_tpu gets its missing
training loop — these tests pin the permutation-invariant powerset loss
semantics and prove end-to-end that training reduces DER on synthetic
mixtures (the hermetic stand-in for pyannote's training corpus)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_processor_tpu.models.diarization import segmentation_tpu as seg
from audio_processor_tpu.models.diarization.segmentation import powerset_matrix
from audio_processor_tpu.training import diarization_trainer as dt
from audio_processor_tpu.utils.metrics import diarization_error_rate

CFG = seg.TpuSegmentationConfig(
    window_s=2.0, d_model=64, n_head=2, n_layer=1,
    num_speakers=3, max_simultaneous=2,
)
MEMBER = powerset_matrix(CFG)
LUT = dt.powerset_lookup(MEMBER)


def test_powerset_lookup_exact_and_overflow():
    # exact classes round-trip: key of class row -> that class
    for ci in range(MEMBER.shape[0]):
        key = int((MEMBER[ci] * (1 << np.arange(3))).sum())
        assert LUT[key] == ci
    # 3-simultaneous (invalid for max 2) maps to a maximal-overlap 2-subset
    key_all = 0b111
    cls = LUT[key_all]
    assert MEMBER[cls].sum() == 2


def test_permutation_invariance_of_loss():
    """Permuting the target speaker columns must not change the loss."""
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(0, 1, (2, 10, MEMBER.shape[0])), jnp.float32)
    targets = (rng.random((2, 10, 3)) < 0.3).astype(np.float32)
    member = jnp.asarray(MEMBER)
    lut = jnp.asarray(LUT)
    base = float(dt.permutation_invariant_loss(logits, jnp.asarray(targets), member, lut))
    for perm in ([1, 0, 2], [2, 1, 0], [1, 2, 0]):
        permuted = targets[..., perm]
        val = float(
            dt.permutation_invariant_loss(logits, jnp.asarray(permuted), member, lut)
        )
        assert val == pytest.approx(base, abs=1e-5)


def test_loss_prefers_correct_prediction():
    """CE of a one-hot-correct prediction is ~0; of a wrong one, large."""
    targets = np.zeros((1, 4, 3), np.float32)
    targets[0, :, 1] = 1.0  # speaker 1 active everywhere
    key = int((targets[0, 0] * (1 << np.arange(3))).sum())
    correct_cls = LUT[key]
    good = np.full((1, 4, MEMBER.shape[0]), -10.0, np.float32)
    good[0, :, correct_cls] = 10.0
    member, lut = jnp.asarray(MEMBER), jnp.asarray(LUT)
    lo = float(dt.permutation_invariant_loss(jnp.asarray(good), jnp.asarray(targets), member, lut))
    assert lo < 0.01
    # permutation invariance may still find a matching perm for pure
    # single-speaker classes, so compare against the empty class instead
    bad = np.full((1, 4, MEMBER.shape[0]), -10.0, np.float32)
    bad[0, :, 0] = 10.0  # predicts silence
    hi = float(dt.permutation_invariant_loss(jnp.asarray(bad), jnp.asarray(targets), member, lut))
    assert hi > 5.0


def test_synth_mixture_shapes_and_validity():
    rng = np.random.default_rng(1)
    audio, labels = dt.synth_mixture(rng, CFG)
    assert audio.shape == (CFG.window_samples,)
    assert labels.shape == (CFG.num_frames, CFG.num_speakers)
    assert labels.max() <= 1.0
    assert labels.sum() > 0  # someone spoke
    assert (labels.sum(axis=1) <= 2.0 + 1e-6).all()  # <= max_simultaneous


def test_training_reduces_loss_and_der():
    """~80 AdamW steps on synthetic mixtures must cut the powerset loss
    AND the decoded DER vs the random-init model (VERDICT r1 item 6)."""
    rng = np.random.default_rng(7)
    member, lut = jnp.asarray(MEMBER), jnp.asarray(LUT)

    def batch(n):
        xs, ys = zip(*(dt.synth_mixture(rng, CFG) for _ in range(n)))
        return jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(ys))

    state = dt.init_train_state(CFG, jax.random.PRNGKey(0), lr=1e-3)

    eval_audio, eval_labels = batch(4)

    def eval_der(params):
        probs = np.asarray(seg.segment_windows(params, CFG, eval_audio))
        total, n = 0.0, 0
        for i in range(probs.shape[0]):
            ref = dt.labels_to_turns(np.asarray(eval_labels)[i], CFG.frame_step_s, "REF")
            hyp = dt.labels_to_turns(
                (probs[i] > 0.5).astype(np.float32), CFG.frame_step_s, "HYP"
            )
            if not ref:
                continue
            der = diarization_error_rate(ref, hyp, collar_s=0.1)
            if np.isfinite(der):
                total, n = total + der, n + 1
        return total / max(n, 1)

    der_before = eval_der(state.params)

    first_loss = last_loss = None
    for step in range(80):
        xs, ys = batch(8)
        state, loss = dt.train_step(state, CFG, xs, ys, member, lut, lr=1e-3)
        if first_loss is None:
            first_loss = float(loss)
        last_loss = float(loss)

    assert last_loss < 0.6 * first_loss, (first_loss, last_loss)

    der_after = eval_der(state.params)
    # random init is near-chance; a learnable spectral task must improve
    assert der_after < der_before, (der_before, der_after)
    assert der_after < 0.8 * der_before, (der_before, der_after)


def test_calibrate_onset_finds_better_threshold():
    rng = np.random.default_rng(3)
    labels = (rng.random((4, 50, 3)) < 0.3).astype(np.float32)
    # simulated probabilities biased low: the best threshold is below 0.5
    probs = labels * rng.uniform(0.35, 0.6, labels.shape) + (1 - labels) * rng.uniform(
        0.0, 0.25, labels.shape
    )
    onset, err = dt.calibrate_onset(probs, labels)
    assert err <= float(np.mean((probs > 0.5) != (labels > 0.5)))
    assert 0.2 <= onset <= 0.8


def test_trained_checkpoint_roundtrip_serves(tmp_path, rng):
    """train -> save -> load -> Diarizer.from_tpu_segmentation -> diarize:
    the full train-to-serve loop."""
    import jax

    from audio_processor_tpu.pipeline.diarize import Diarizer

    member, lut = jnp.asarray(MEMBER), jnp.asarray(LUT)
    state = dt.init_train_state(CFG, jax.random.PRNGKey(1), lr=1e-3)
    nprng = np.random.default_rng(5)
    for _ in range(3):  # a few steps; quality is gated elsewhere
        xs, ys = zip(*(dt.synth_mixture(nprng, CFG) for _ in range(4)))
        state, _ = dt.train_step(
            state, CFG, jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(ys)),
            member, lut,
        )
    path = str(tmp_path / "seg_tpu.npz")
    dt.save_params(path, state.params, CFG)

    params2, cfg2 = dt.load_params(path)
    assert cfg2 == CFG
    chex_equal = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
        state.params, params2,
    )
    assert all(jax.tree.leaves(chex_equal))

    d = Diarizer.from_tpu_segmentation(path, window_step_s=1.0)
    audio = nprng.normal(0, 0.2, 6 * 16_000).astype(np.float32)
    turns = d.diarize(audio)
    assert isinstance(turns, list)
    for t in turns:
        assert set(t) == {"start", "end", "speaker"}


def test_build_services_detects_tpu_segmentation(tmp_path, monkeypatch):
    import jax

    from audio_processor_tpu.runtime.services import build_services

    state = dt.init_train_state(CFG, jax.random.PRNGKey(0))
    path = str(tmp_path / "seg.npz")
    dt.save_params(path, state.params, CFG)
    monkeypatch.setenv("APTPU_DIARIZER_PATH", path)
    services = build_services(
        model="test", diarization=True, with_drive=False, with_llm=False
    )
    try:
        assert services.processor.diarizer is not None
        assert services.processor.diarizer.seg_cfg == CFG
    finally:
        services.engine.shutdown(wait=False)
