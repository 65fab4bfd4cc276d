"""Diarization stack tests: segmentation shapes/powerset, embeddings,
clustering behaviour, end-to-end pipeline contract, fusion semantics."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_processor_tpu.models.diarization import clustering as cl
from audio_processor_tpu.models.diarization import embedding as emb_lib
from audio_processor_tpu.models.diarization import segmentation as seg_lib
from audio_processor_tpu.pipeline import fuse
from audio_processor_tpu.pipeline.diarize import Diarizer, _runs


# --- segmentation ----------------------------------------------------------

SEG_CFG = seg_lib.SegmentationConfig()


def test_powerset_matrix():
    m = seg_lib.powerset_matrix(SEG_CFG)
    assert m.shape == (7, 3)
    assert m[0].sum() == 0  # empty set first
    assert (m.sum(axis=1) <= 2).all()
    # all rows distinct
    assert len({tuple(r) for r in m}) == 7


def test_segmentation_shapes_and_range():
    params = seg_lib.init_params(SEG_CFG, jax.random.PRNGKey(0))
    audio = jnp.asarray(
        np.random.default_rng(0).normal(0, 0.1, (2, SEG_CFG.window_samples)),
        jnp.float32,
    )
    probs = seg_lib.segment_windows(params, SEG_CFG, audio)
    assert probs.shape == (2, SEG_CFG.num_frames, 3)
    p = np.asarray(probs)
    assert (p >= 0).all() and (p <= 1 + 1e-5).all()
    assert SEG_CFG.num_frames == 589  # pyannote-compatible frame count @10s
    assert abs(SEG_CFG.frame_step_s - 0.016875) < 1e-9


def test_sinc_filters_are_bandpass():
    params = seg_lib.init_params(SEG_CFG, jax.random.PRNGKey(0))
    filt = np.asarray(seg_lib.materialize_sinc_filters(params["sinc"], SEG_CFG))
    assert filt.shape == (SEG_CFG.sinc_kernel, 1, SEG_CFG.sinc_filters)
    # frequency response peaks inside the band, not at DC (check filters
    # whose init band sits above the kernel's ~64 Hz resolution floor)
    low, band = seg_lib._mel_init_bands(SEG_CFG.sinc_filters, SEG_CFG.sample_rate)
    resp = np.abs(np.fft.rfft(filt[:, 0, :], n=4096, axis=0))
    freqs = np.fft.rfftfreq(4096, 1 / SEG_CFG.sample_rate)
    for i in range(SEG_CFG.sinc_filters):
        center = low[i] + band[i] / 2
        if center < 500:
            continue
        peak_hz = freqs[resp[:, i].argmax()]
        assert abs(peak_hz - center) < max(band[i], 150.0)
        assert resp[0, i] < 0.1 * resp[:, i].max()  # DC well below passband


def test_tpu_segmentation_variant():
    from audio_processor_tpu.models.diarization import segmentation_tpu as st

    cfg = st.TpuSegmentationConfig(n_layer=1, d_model=64, n_head=2)
    params = st.init_params(cfg, jax.random.PRNGKey(0))
    audio = jnp.asarray(
        np.random.default_rng(0).normal(0, 0.1, (2, cfg.window_samples)), jnp.float32
    )
    probs = st.segment_windows(params, cfg, audio)
    assert probs.shape == (2, cfg.num_frames, 3)
    p = np.asarray(probs)
    assert (p >= 0).all() and (p <= 1 + 1e-5).all()
    # int16 input path
    i16 = (np.asarray(audio) * 32768).astype(np.int16)
    p2 = np.asarray(st.segment_windows(params, cfg, jnp.asarray(i16)))
    np.testing.assert_allclose(p2, p, atol=2e-3)


def test_diarizer_with_tpu_segmentation(rng):
    d = Diarizer.random_init(segmentation="tpu", window_step_s=5.0)
    audio = rng.normal(0, 0.2, 12 * 16000).astype(np.float32)
    turns = d.diarize(audio)
    for t in turns:
        assert t["speaker"].startswith("SPEAKER_")
        assert 0 <= t["start"] <= t["end"] <= 12.05


# --- embeddings ------------------------------------------------------------

EMB_CFG = emb_lib.EmbeddingConfig(blocks=(1, 1, 1, 1))  # slim for CPU tests


def test_embedding_shapes_and_norm():
    params = emb_lib.init_params(EMB_CFG, jax.random.PRNGKey(0))
    audio = jnp.asarray(
        np.random.default_rng(0).normal(0, 0.1, (2, EMB_CFG.crop_samples)), jnp.float32
    )
    emb = np.asarray(emb_lib.embed_crops(params, EMB_CFG, audio))
    assert emb.shape == (2, EMB_CFG.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)


def test_embedding_distinguishes_signals():
    params = emb_lib.init_params(EMB_CFG, jax.random.PRNGKey(0))
    t = np.arange(EMB_CFG.crop_samples) / 16000
    a = np.sin(2 * np.pi * 120 * t).astype(np.float32)
    b = np.random.default_rng(0).normal(0, 0.3, len(t)).astype(np.float32)
    emb = np.asarray(
        emb_lib.embed_crops(params, EMB_CFG, jnp.asarray(np.stack([a, a, b])))
    )
    same = emb[0] @ emb[1]
    diff = emb[0] @ emb[2]
    assert same > 0.999  # identical inputs -> identical embedding
    assert diff < same


# --- clustering ------------------------------------------------------------

def test_cluster_two_blobs():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.05, (20, 16)) + np.eye(16)[0]
    b = rng.normal(0, 0.05, (10, 16)) + np.eye(16)[1]
    labels = cl.agglomerative_cluster(np.concatenate([a, b]), threshold=0.5)
    assert labels.max() == 1
    assert (labels[:20] == labels[0]).all()
    assert (labels[20:] == labels[20]).all()
    assert labels[0] == 0  # biggest cluster gets id 0


def test_cluster_max_constraint():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (30, 8))
    labels = cl.agglomerative_cluster(x, threshold=0.01, max_clusters=3)
    assert labels.max() + 1 <= 3


def test_cluster_edge_cases():
    assert len(cl.agglomerative_cluster(np.zeros((0, 4)))) == 0
    assert (cl.agglomerative_cluster(np.ones((1, 4))) == [0]).all()


# --- end-to-end pipeline ---------------------------------------------------

def test_diarizer_contract(rng):
    d = Diarizer.random_init(window_step_s=5.0)
    d.emb_cfg = EMB_CFG
    d.emb_params = emb_lib.init_params(EMB_CFG, jax.random.PRNGKey(1))
    sr = 16000
    audio = rng.normal(0, 0.2, 12 * sr).astype(np.float32)
    turns = d.diarize(audio)
    for t in turns:
        assert set(t) == {"start", "end", "speaker"}
        assert 0 <= t["start"] <= t["end"] <= 12.05
        assert t["speaker"].startswith("SPEAKER_")
    # sorted by start time
    starts = [t["start"] for t in turns]
    assert starts == sorted(starts)


def test_diarizer_empty_on_short_audio():
    d = Diarizer.random_init()
    assert d.diarize(np.zeros(1000, np.float32)) == []


def test_diarizer_call_time_speaker_constraints(rng):
    """pyannote's pipeline(audio, num_speakers=...) surface: call-time
    constraints override the instance defaults for that call only."""
    d = Diarizer.random_init(window_step_s=5.0)
    d.emb_cfg = EMB_CFG
    d.emb_params = emb_lib.init_params(EMB_CFG, jax.random.PRNGKey(1))
    audio = rng.normal(0, 0.2, 12 * 16000).astype(np.float32)

    turns = d.diarize(audio, num_speakers=1)
    assert {t["speaker"] for t in turns} <= {"SPEAKER_00"}

    turns = d.diarize(audio, max_speakers=2)
    assert len({t["speaker"] for t in turns}) <= 2

    # instance defaults untouched by the call-time override
    assert d.min_speakers == 1 and d.max_speakers is None

    with pytest.raises(ValueError):
        d.diarize(audio, num_speakers=2, max_speakers=3)


def test_runs_helper():
    m = np.array([0, 1, 1, 0, 1, 0, 0, 1, 1, 1], bool)
    assert list(_runs(m)) == [(1, 3), (4, 5), (7, 10)]
    assert list(_runs(np.zeros(5, bool))) == []


# --- fusion ----------------------------------------------------------------

def test_fusion_max_overlap_wins():
    asr = [
        {"start": 0.0, "end": 2.0, "text": "hello"},
        {"start": 2.0, "end": 4.0, "text": "world"},
    ]
    turns = [
        {"start": 0.0, "end": 1.4, "speaker": "SPEAKER_00"},
        {"start": 1.4, "end": 4.0, "speaker": "SPEAKER_01"},
    ]
    out = fuse.fuse_segments(asr, turns)
    assert out[0]["speaker"] == "SPEAKER_00"  # 1.4 s vs 0.6 s overlap
    assert out[1]["speaker"] == "SPEAKER_01"
    assert out[0]["text"] == "hello"


def test_fusion_nearest_and_unknown():
    asr = [{"start": 10.0, "end": 11.0, "text": "late"}]
    turns = [{"start": 0.0, "end": 9.5, "speaker": "SPEAKER_00"}]
    out = fuse.fuse_segments(asr, turns)
    assert out[0]["speaker"] == "SPEAKER_00"  # within 1 s tolerance

    far = [{"start": 30.0, "end": 31.0, "text": "far"}]
    out2 = fuse.fuse_segments(far, turns)
    assert out2[0]["speaker"] == fuse.UNKNOWN


def test_fusion_no_turns():
    asr = [{"start": 0.0, "end": 1.0, "text": "x"}]
    out = fuse.fuse_segments(asr, [])
    assert out[0]["speaker"] == fuse.UNKNOWN


def test_relabel_and_format():
    segs = [
        {"speaker": "SPEAKER_00", "start": 0.0, "end": 1.0, "text": "hi"},
        {"speaker": "SPEAKER_01", "start": 1.0, "end": 2.0, "text": "yo"},
    ]
    out = fuse.relabel_speakers(segs, {"SPEAKER_00": "Alice"})
    assert out[0]["speaker"] == "Alice"
    assert out[1]["speaker"] == "SPEAKER_01"
    txt = fuse.format_transcript(out)
    assert "Alice: hi" in txt and "[00:00:00 - 00:00:01]" in txt


def test_min_cluster_size_dissolves_stray_clusters():
    """pyannote-3.1's min_cluster_size: a lone outlier crop must reassign
    to the nearest REAL speaker instead of minting a phantom one."""
    import numpy as np

    from audio_processor_tpu.models.diarization.clustering import (
        agglomerative_cluster,
    )

    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.02, (6, 16)) + np.eye(16)[0]    # speaker A x6
    b = rng.normal(0, 0.02, (5, 16)) + np.eye(16)[1]    # speaker B x5
    stray = (np.eye(16)[0] * 0.8 + np.eye(16)[5])[None]  # closer to A
    emb = np.concatenate([a, b, stray])

    plain = agglomerative_cluster(emb, threshold=0.3)
    assert plain.max() + 1 == 3  # the stray becomes its own cluster

    filtered = agglomerative_cluster(emb, threshold=0.3, min_cluster_size=3)
    assert filtered.max() + 1 == 2
    # the stray joined speaker A (same label as the a-block)
    assert filtered[-1] == filtered[0]
    # existing big clusters untouched
    assert len(set(filtered[:6])) == 1 and len(set(filtered[6:11])) == 1


def test_min_cluster_size_keeps_largest_when_all_small():
    import numpy as np

    from audio_processor_tpu.models.diarization.clustering import (
        agglomerative_cluster,
    )

    rng = np.random.default_rng(1)
    emb = np.concatenate([
        rng.normal(0, 0.02, (2, 8)) + np.eye(8)[0],
        rng.normal(0, 0.02, (1, 8)) + np.eye(8)[1],
    ])
    labels = agglomerative_cluster(emb, threshold=0.3, min_cluster_size=5)
    assert labels.max() == 0  # everything collapses onto the largest


def test_return_embeddings_form(rng):
    """pyannote's pipeline(audio, return_embeddings=True) form: one
    L2-normalised centroid per SPEAKER_XX label."""
    d = Diarizer.random_init(window_step_s=5.0)
    d.emb_cfg = EMB_CFG
    d.emb_params = emb_lib.init_params(EMB_CFG, jax.random.PRNGKey(1))
    d.onset = 0.05  # random-weight activations hover near 0.5: force turns
    audio = rng.normal(0, 0.2, 12 * 16000).astype(np.float32)
    turns, cents = d.diarize(audio, return_embeddings=True)
    assert turns, "onset too high: no turns to test against"
    plain = d.diarize(audio)
    assert turns == plain
    n_speakers = len({t["speaker"] for t in turns})
    assert cents.shape[0] >= n_speakers
    np.testing.assert_allclose(
        np.linalg.norm(cents, axis=1), 1.0, atol=1e-5
    )
    # silence: (empty, None)
    t0, c0 = d.diarize(np.zeros(1000, np.float32), return_embeddings=True)
    assert t0 == [] and c0 is None


def test_stitch_unions_same_cluster_slots():
    """Two local slots of ONE window that cluster into one speaker must
    combine by MAX, not mean — averaging a strong slot with its own weak
    leak (0.9 with 0.05) would fall below the onset and delete the turn
    (pyannote's reconstruction unions same-cluster slots)."""
    import jax.numpy as jnp

    d = Diarizer.random_init(window_step_s=10.0)
    d.emb_cfg = EMB_CFG
    d.emb_params = emb_lib.init_params(EMB_CFG, jax.random.PRNGKey(1))

    n_frames = d.seg_cfg.num_frames

    def fake_seg(params, cfg, windows):
        b = windows.shape[0]
        probs = np.zeros((b, n_frames, 3), np.float32)
        probs[:, :, 0] = 0.9   # slot 0: real speaker, the whole window
        # slot 1: the same voice leaking ABOVE onset for the first half of
        # the window only — it must become an owner, or the union branch
        # is dead and mean-vs-max is indistinguishable (the old 0.06 leak
        # never passed the active-frame gate)
        probs[:, : n_frames // 2, 1] = 0.6
        return jnp.asarray(probs)

    d.seg_fn = fake_seg
    d.min_speech_s = 0.0
    audio = np.random.default_rng(0).normal(0, 0.2, 10 * 16000).astype(np.float32)
    # force both slots into one cluster
    import audio_processor_tpu.models.diarization.clustering as cl_mod

    orig = cl_mod.agglomerative_cluster
    try:
        cl_mod.agglomerative_cluster = lambda e, **kw: np.zeros(len(e), np.int64)
        turns = d.diarize(audio)
    finally:
        cl_mod.agglomerative_cluster = orig
    # averaging the two same-cluster slots would give (0.9+0.0)/2 = 0.45
    # < onset on the second half of every window and truncate the turn;
    # the max union keeps 0.9 end to end
    assert turns, "same-cluster slot averaging deleted the speech"
    assert {t["speaker"] for t in turns} == {"SPEAKER_00"}
    assert max(t["end"] for t in turns) > 8.0, turns


def test_cluster_min_clusters_does_not_resurrect_dissolved():
    """min_clusters re-cuts BEFORE min_cluster_size dissolution: re-cutting
    afterwards from the raw linkage would re-mint the stray cluster the
    dissolution just removed."""
    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.05, (10, 16)) + np.eye(16)[0]
    b = rng.normal(0, 0.05, (8, 16)) + np.eye(16)[1]
    stray = rng.normal(0, 0.05, (2, 16)) + np.eye(16)[2]
    x = np.concatenate([a, b, stray])
    labels = cl.agglomerative_cluster(
        x, threshold=0.5, min_clusters=2, min_cluster_size=3
    )
    # two real speakers survive; the 2-crop stray is absorbed, not
    # resurrected by the min_clusters floor
    assert labels.max() + 1 == 2
    # and the floor itself still works when dissolution would undershoot
    labels2 = cl.agglomerative_cluster(
        x, threshold=0.5, min_clusters=3, min_cluster_size=3
    )
    assert labels2.max() + 1 == 3


def test_embedding_odd_mel_count():
    """init_params must size the fc input with ceil(n_mels/8) to match the
    SAME-padded stride-2 conv stack (n_mels=60 used to crash at forward)."""
    cfg = emb_lib.EmbeddingConfig(n_mels=60, blocks=(1, 1, 1, 1))
    params = emb_lib.init_params(cfg, jax.random.PRNGKey(0))
    out = emb_lib.embed_crops(
        params, cfg, jnp.zeros((1, cfg.crop_samples), jnp.float32)
    )
    assert out.shape == (1, cfg.embed_dim)


def test_diarizer_accepts_path(rng, tmp_path):
    """pyannote's pipeline("audio.wav") form — the reference's actual
    call passes a path (audio_processor.py:1105).  Compared against the
    DECODED wav (write_wav quantizes to 16-bit PCM, so the pre-write
    float array is not what the path branch sees)."""
    from audio_processor_tpu.pipeline import ingest
    from audio_processor_tpu.utils import wavio

    d = Diarizer.random_init(window_step_s=5.0)
    sr = 16_000
    audio = rng.normal(0, 0.2, 12 * sr).astype(np.float32)
    p = tmp_path / "meeting.wav"
    wavio.write_wav(str(p), audio, sr)
    decoded = ingest.load_audio(str(p), target_sr=sr)
    assert d.diarize(str(p)) == d.diarize(decoded)


def test_diarizer_path_invalid_args_fail_before_decode(tmp_path):
    """num_speakers vs min/max exclusivity raises BEFORE the path decode
    (no point paying a media decode for a guaranteed ValueError)."""
    import pytest

    d = Diarizer.random_init(window_step_s=5.0)
    missing = tmp_path / "never_written.wav"  # decode would raise OSError
    with pytest.raises(ValueError, match="num_speakers"):
        d.diarize(str(missing), num_speakers=2, min_speakers=1)


def test_min_speakers_cannot_exceed_max():
    d = Diarizer.random_init(window_step_s=5.0)
    with pytest.raises(ValueError, match="min_speakers"):
        d.diarize(np.zeros(16000, np.float32), min_speakers=4, max_speakers=2)


def test_bundled_keeps_caller_threshold_for_caller_embeddings():
    """bundled(emb_params=<user net>) must NOT adopt the bundled AHC
    threshold — it was calibrated for the BUNDLED embedding space."""
    from audio_processor_tpu.training import embedding_trainer as et

    cfg = EMB_CFG
    params = emb_lib.init_params(cfg, jax.random.PRNGKey(3))
    d = Diarizer.bundled(emb_params=params, emb_cfg=cfg)
    if d is None:
        pytest.skip("bundled assets not present")
    assert d.emb_trained
    assert d.emb_params is params
    # the instance threshold is the class default, not the bundled one
    bundled_thr = et.load_cluster_threshold(
        d.__class__.BUNDLED_EMB
        if "/" in d.__class__.BUNDLED_EMB
        else __import__("os").path.join(
            __import__("os").path.dirname(
                __import__("audio_processor_tpu.pipeline.diarize",
                           fromlist=["x"]).__file__),
            "..", "assets", d.__class__.BUNDLED_EMB)
    )
    if bundled_thr is not None and bundled_thr != Diarizer.cluster_threshold:
        assert d.cluster_threshold == Diarizer.cluster_threshold


def test_from_tpu_segmentation_inits_params_for_caller_cfg(tmp_path):
    """A caller-supplied emb_cfg must shape the random emb_params — the
    old code initialised from the DEFAULT cfg and kept the caller's,
    a latent shape mismatch."""
    from audio_processor_tpu.models.diarization import segmentation_tpu as seg_tpu
    from audio_processor_tpu.training import diarization_trainer as dt

    seg_cfg = seg_tpu.TpuSegmentationConfig(window_s=2.0, d_model=32,
                                            n_head=2, n_layer=1)
    seg_params = seg_tpu.init_params(seg_cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "seg.npz")
    dt.save_params(path, seg_params, seg_cfg)

    small = emb_lib.EmbeddingConfig(base_channels=8, blocks=(1, 1, 1, 1),
                                    embed_dim=32, crop_s=1.0)
    d = Diarizer.from_tpu_segmentation(path, emb_cfg=small)
    assert d.emb_cfg is small
    # forward must run without shape errors under the caller's cfg
    out = emb_lib.embed_crops(
        d.emb_params, d.emb_cfg,
        jnp.zeros((1, small.crop_samples), jnp.float32),
    )
    assert out.shape == (1, small.embed_dim)


def test_hard_decode_matches_powerset_argmax(rng):
    """hard_decode=True argmax-decodes the powerset per frame (pyannote's
    to_multilabel): a frame whose marginal crosses onset while the argmax
    class is 'no speech' stays silent."""
    from audio_processor_tpu.models.diarization.segmentation import (
        SegmentationConfig, powerset_matrix, segment_windows,
    )
    from audio_processor_tpu.models.diarization import segmentation as seg_mod

    cfg = SegmentationConfig()
    member = powerset_matrix(cfg)

    # craft logits where P([])=0.45, P([0])=0.25, P([0,1])=0.30: marginal
    # P(spk0)=0.55 > 0.5 but argmax is the empty class
    p = np.full(member.shape[0], 1e-6)
    idx_empty = next(i for i, row in enumerate(member) if row.sum() == 0)
    rows = [tuple(np.nonzero(r)[0].tolist()) for r in member]
    idx_s0 = rows.index((0,))
    idx_s01 = rows.index((0, 1))
    p[idx_empty], p[idx_s0], p[idx_s01] = 0.45, 0.25, 0.30
    logits = np.log(p / p.sum())

    fake_logits = np.broadcast_to(
        logits, (1, cfg.num_frames, member.shape[0])
    ).astype(np.float32)

    orig_forward = seg_mod.forward
    try:
        seg_mod.forward = lambda params, c, audio: jnp.asarray(fake_logits)
        soft = np.asarray(segment_windows({}, cfg, jnp.zeros((1, 16000))))
        hard = np.asarray(
            segment_windows({}, cfg, jnp.zeros((1, 16000)), hard=True)
        )
    finally:
        seg_mod.forward = orig_forward
    assert soft[0, 0, 0] > 0.5          # marginal crosses onset
    assert hard[0, 0].sum() == 0        # pyannote decodes silence
    assert set(np.unique(hard)) <= {0.0, 1.0}


def test_binarize_hysteresis():
    """pyannote-3.1 Binarize semantics: a region above `offset` counts
    only if it crosses `onset` somewhere; dips between offset and onset
    do NOT split a turn (the stress-split miss mode the knob targets)."""
    from audio_processor_tpu.pipeline.diarize import _binarize

    t = np.array([0.1, 0.6, 0.4, 0.45, 0.7, 0.2, 0.42, 0.44, 0.1])
    # no hysteresis: the 0.4/0.45 dip splits the turn
    assert list(_binarize(t, 0.5, 0.5, 0)) == [(1, 2), (4, 5)]
    # offset 0.35: the dip stays on; the trailing 0.42/0.44 hump never
    # crosses onset so it is NOT a region
    assert list(_binarize(t, 0.5, 0.35, 0)) == [(1, 5)]
    # min_duration_off: merge runs separated by a short gap
    t2 = np.array([0.6, 0.6, 0.1, 0.1, 0.6, 0.6])
    assert list(_binarize(t2, 0.5, 0.5, 0)) == [(0, 2), (4, 6)]
    assert list(_binarize(t2, 0.5, 0.5, 3)) == [(0, 6)]
    assert list(_binarize(np.zeros(4), 0.5, 0.3, 2)) == []
    # pyannote scan parity: a leading above-offset ramp that has not yet
    # crossed onset is NOT part of the region (the region turns on at the
    # onset crossing), while the trailing above-offset tail IS
    t3 = np.array([0.4, 0.45, 0.6, 0.4, 0.1])
    assert list(_binarize(t3, 0.5, 0.35, 0)) == [(2, 4)]


def test_decode_meta_roundtrip(tmp_path):
    """Calibrated Binarize knobs ride the segmentation checkpoint and
    become Diarizer defaults via from_tpu_segmentation (pyannote ships
    its pipeline thresholds inside the model card the same way)."""
    from audio_processor_tpu.models.diarization import segmentation_tpu as seg_tpu
    from audio_processor_tpu.training import diarization_trainer as dt

    seg_cfg = seg_tpu.TpuSegmentationConfig(window_s=2.0, d_model=32,
                                            n_head=2, n_layer=1)
    seg_params = seg_tpu.init_params(seg_cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "seg.npz")
    dt.save_params(path, seg_params, seg_cfg, onset=0.55,
                   decode={"offset": 0.3, "min_duration_off": 0.2,
                           "overlap_onset": 0.6})
    assert dt.load_decode_meta(path) == {
        "offset": 0.3, "min_duration_off": 0.2, "overlap_onset": 0.6,
    }
    d = Diarizer.from_tpu_segmentation(path)
    assert d.onset == pytest.approx(0.55)
    assert d.offset == pytest.approx(0.3)
    assert d.min_duration_off == pytest.approx(0.2)
    assert d.overlap_onset == pytest.approx(0.6)
    # explicit caller knobs still win
    d2 = Diarizer.from_tpu_segmentation(path, offset=0.1, overlap_onset=None)
    assert d2.offset == pytest.approx(0.1)
    assert d2.overlap_onset is None
    # None values are simply omitted; unknown keys are rejected
    dt.save_params(str(tmp_path / "s2.npz"), seg_params, seg_cfg,
                   decode={"offset": None})
    assert dt.load_decode_meta(str(tmp_path / "s2.npz")) == {}
    with pytest.raises(ValueError):
        dt.save_params(str(tmp_path / "s3.npz"), seg_params, seg_cfg,
                       decode={"bogus": 1.0})


def test_overlap_onset_gates_non_top_cluster():
    """A second concurrent cluster below overlap_onset is suppressed; the
    frame's top cluster is never gated, and genuinely-voiced overlap
    above the bar survives (reverb-ghost FA mode)."""
    from audio_processor_tpu.pipeline.diarize import _overlap_gate

    mean = np.array([
        [0.9, 0.55],   # ghost at 0.55: gated at overlap_onset=0.6
        [0.9, 0.65],   # genuine overlap at 0.65: survives
        [0.4, 0.45],   # 0.45 is the TOP cluster here: never gated
    ])
    gated = _overlap_gate(mean, 0.6)
    assert gated[0, 1] == 0.0
    assert gated[1, 1] == pytest.approx(0.65)
    assert gated[2, 1] == pytest.approx(0.45)
    assert gated[2, 0] == 0.0  # non-top below the bar
    assert gated[0, 0] == pytest.approx(0.9)
