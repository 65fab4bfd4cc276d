"""Train, validate, and save the BUNDLED synthetic-pretrained diarizer.

Produces audio_processor_tpu/assets/{diarizer_seg.npz, diarizer_emb.npz},
the checkpoints `Diarizer.bundled()` serves when APTPU_DIARIZER_PATH is
unset — a working out-of-the-box default in place of random weights
(round-2 review: random diarizer serving should be replaced or loud; the
reference always serves trained pyannote weights,
/root/reference/app/services/audio_processor.py:885).

Both nets train on RANDOMIZED synthetic voices (log-uniform pitch,
harmonic stacks with wobble + syllabic modulation — the same generative
model as the hermetic DER gate, tests/test_diarizer_e2e_der.py, but with
pitches resampled every batch so nothing is tuned to fixed speakers).
The script then validates end-to-end DER on held-out meetings with
UNSEEN pitches and refuses to save above the gate.

Run:  python tools/make_bundled_diarizer.py            (TPU or CPU)
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from audio_processor_tpu.models.diarization import embedding as emb_lib  # noqa: E402
from audio_processor_tpu.models.diarization import segmentation_tpu as seg_tpu  # noqa: E402
from audio_processor_tpu.models.diarization.segmentation import powerset_matrix  # noqa: E402
from audio_processor_tpu.pipeline.diarize import Diarizer  # noqa: E402
from audio_processor_tpu.training import diarization_trainer as dt  # noqa: E402
from audio_processor_tpu.training import embedding_trainer as et  # noqa: E402
from audio_processor_tpu.utils.metrics import diarization_error_rate  # noqa: E402

# compact bundled configs: ~2 MB + ~3 MB on disk — big enough to separate
# voices, small enough to commit
SEG_CFG = seg_tpu.TpuSegmentationConfig(
    window_s=6.0, d_model=128, n_head=4, n_layer=3
)
EMB_CFG = emb_lib.EmbeddingConfig(
    base_channels=16, blocks=(2, 2, 2, 2), embed_dim=128, crop_s=2.0
)
F0_LO, F0_HI = 85.0, 380.0  # human-ish fundamental range


def sample_f0s(rng, n=3, min_ratio=1.22):
    """n speaker pitches, log-uniform, pairwise-separated."""
    while True:
        f = np.sort(np.exp(rng.uniform(np.log(F0_LO), np.log(F0_HI), n)))
        if np.all(f[1:] / f[:-1] >= min_ratio):
            return tuple(float(x) for x in f)


def _reverb(rng, x, rt_s, sr=16_000):
    """Exponential-decay noise impulse response (short room tail).  RT is
    kept well under the 0.25 s DER collar so eval labels stay honest."""
    from scipy.signal import fftconvolve

    n_ir = int(3 * rt_s * sr)
    ir = rng.normal(0, 1, n_ir) * np.exp(-np.arange(n_ir) / (rt_s * sr))
    ir[0] = 1.0
    ir /= np.sqrt(np.sum(ir * ir))
    return fftconvolve(x, ir)[: len(x)].astype(np.float32)


def augment(rng, x, reverb_prob=0.5, noise=(0.002, 0.012), gain=(0.5, 1.4)):
    """Nuisance augmentation the serving nets must be invariant to:
    short reverb, variable noise floor, level variation (round-3 verdict
    next-step #1: widen the synthetic corpus beyond clean fixed-level
    mixtures)."""
    if rng.random() < reverb_prob:
        x = _reverb(rng, x, float(rng.uniform(0.03, 0.08)))
    x = x + rng.normal(0, float(rng.uniform(*noise)), len(x)).astype(np.float32)
    return (x * float(rng.uniform(*gain))).astype(np.float32)


def make_meeting(rng, f0s, duration_s=24.0, sr=16_000, noise=0.003,
                 reverb=False, gap=(0.3, 0.6)):
    """Held-out meeting: non-overlapping turns with gaps + reference turns."""
    audio = rng.normal(0, noise, int(duration_s * sr)).astype(np.float32)
    ref = []
    t, i = 0.3, 0
    while t < duration_s - 2.0:
        spk = i % len(f0s)
        dur = float(rng.uniform(1.2, 2.0))
        a, b = int(t * sr), int(min(t + dur, duration_s) * sr)
        audio[a:b] += dt.synth_voice(rng, f0s[spk], b - a, sr)
        ref.append({"start": round(t, 3), "end": round(t + dur, 3),
                    "speaker": f"REF_{spk}"})
        t += dur + float(rng.uniform(*gap))
        i += 1
    if reverb:
        audio = _reverb(rng, audio, 0.05)
    return audio, ref


def train_segmentation(rng, steps, batch, lr=1e-3):
    member = powerset_matrix(SEG_CFG)
    lut = dt.powerset_lookup(member)
    member_j, lut_j = jnp.asarray(member), jnp.asarray(lut)
    state = dt.init_train_state(SEG_CFG, jax.random.PRNGKey(0), lr=lr)
    t0 = time.time()
    for step in range(steps):
        # fresh voices every batch; 2 or 3 concurrent speakers, more
        # overlap than the old corpus, plus reverb/noise/gain nuisances
        f0s = sample_f0s(rng, n=int(rng.integers(2, 4)))
        pairs = [
            dt.synth_mixture(rng, SEG_CFG, f0s=f0s, overlap_prob=0.3)
            for _ in range(batch)
        ]
        xs = [augment(rng, x) for x, _ in pairs]
        ys = [y for _, y in pairs]
        state, loss = dt.train_step(
            state, SEG_CFG, jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(ys)),
            member_j, lut_j, lr=lr,
        )
        if step % max(1, steps // 20) == 0 or step == steps - 1:
            print(f"seg step {step:5d}  loss {float(loss):.4f}  "
                  f"({time.time() - t0:.0f}s)", flush=True)
    # calibrate the binarisation threshold on fresh held-out mixtures,
    # augmented like the training distribution (what serving will see)
    pairs = [dt.synth_mixture(rng, SEG_CFG, f0s=sample_f0s(rng))
             for _ in range(16)]
    xs = [augment(rng, x) for x, _ in pairs]
    ys = [y for _, y in pairs]
    probs = np.asarray(seg_tpu.segment_windows(
        state.params, SEG_CFG, jnp.asarray(np.stack(xs))))
    onset, err = dt.calibrate_onset(probs, np.stack(ys))
    print(f"calibrated onset {onset:.2f} (frame err {err:.3f})")
    return state.params, float(onset)


def train_embedding(rng, steps, batch, n_bank=24, lr=1e-3):
    # a bank of pitches spanning the speaking range; AAM-softmax classes
    f0_bank = np.exp(np.linspace(np.log(F0_LO), np.log(F0_HI), n_bank))
    state = et.init_train_state(EMB_CFG, n_bank, jax.random.PRNGKey(1), lr=lr)
    t0 = time.time()
    for step in range(steps):
        labels = rng.integers(0, n_bank, batch)
        crops = np.stack([
            augment(rng, et.synth_speaker_crop(rng, float(f0_bank[s]), EMB_CFG),
                    reverb_prob=0.3, noise=(0.002, 0.010))
            for s in labels
        ])
        state, loss = et.train_step(
            state, EMB_CFG, jnp.asarray(crops),
            jnp.asarray(labels, jnp.int32), lr=lr,
        )
        if step % max(1, steps // 20) == 0 or step == steps - 1:
            print(f"emb step {step:5d}  loss {float(loss):.4f}  "
                  f"({time.time() - t0:.0f}s)", flush=True)
    return state.params


def _diarizer(seg_params, onset, emb_params, thr, decode=None):
    return Diarizer(
        seg_params=seg_params, seg_cfg=SEG_CFG, seg_fn=seg_tpu.segment_windows,
        emb_params=emb_params, emb_cfg=EMB_CFG,
        window_step_s=2.0, onset=onset, cluster_threshold=thr,
        seg_trained=True, emb_trained=True, **(decode or {}),
    )


def _cal_meetings(meetings=4):
    """The calibration splits (seed DISJOINT from training and from the
    validation gates), mirroring the gate conditions: clean 3-speaker,
    stress 4-speaker/noise/reverb, and many (5-8 speakers, 60 s) — the
    round-5 gates added 5-8-speaker and long-meeting splits, so the
    knobs must be chosen under those conditions too (the 21-min split is
    left out of calibration for cost; its dominant failure mode,
    cluster overcount, is shared with `many`)."""
    rng = np.random.default_rng(424243)
    clean = [make_meeting(rng, sample_f0s(rng)) for _ in range(meetings)]
    stress = [
        make_meeting(rng, sample_f0s(rng, n=4, min_ratio=1.18), noise=0.009,
                     reverb=True, gap=(0.15, 0.4))
        for _ in range(meetings)
    ]
    many = [
        make_meeting(rng, sample_f0s(rng, n=5 + i % 4, min_ratio=1.12),
                     duration_s=60.0, noise=0.005, gap=(0.2, 0.5))
        for i in range(meetings)
    ]
    return clean, stress, many


# split gates, shared by calibration (normalisation) and validation.
# clean/stress are the round-4 verdict's bars (stress tightened 0.30 ->
# 0.25); many/long are REGRESSION gates set from measured capability of
# the synthetic bundled pair (round-5 measurement campaign: best
# observed many median 0.34-0.38, long 0.29 — a single AHC cut trades
# stress-robustness against fine many-speaker separation, so these hold
# the achieved level rather than assert pyannote-class separation,
# which assets/README.md is explicit the bundled weights are not)
CLEAN_GATE, STRESS_GATE, MANY_GATE, LONG_GATE = 0.15, 0.25, 0.40, 0.35


def _worst_gate_ratio(d, splits):
    """max(split median / split gate) over [(cases, gate), ...] — <1
    means every calibrated gate would pass."""
    meds = []
    for cases, _gate in splits:
        ders = []
        for audio, ref in cases:
            turns = d.diarize(audio)
            ders.append(diarization_error_rate(ref, turns, collar_s=0.25)
                        if turns else 1.0)
        meds.append(float(np.median(ders)))
    return max(m / g for m, (_, g) in zip(meds, splits)), meds


def calibrate_threshold(seg_params, onset, emb_params, meetings=4):
    """Sweep the AHC cosine-distance cut on held-out meetings — the
    threshold is a property of THIS embedding space (pyannote calibrates
    its pipeline threshold per-embedding-model the same way).

    Calibrates on the condition splits the validator gates (clean,
    stress, many — see _cal_meetings) and minimises the worst
    GATE-NORMALISED split median.  A clean-only sweep is degenerate
    here: synthetic voices separate so well that every cut in
    [0.30, 0.85] ties at the same DER, and the old first-best tie-break
    picked the strictest cut — which then over-clustered reverberant
    audio (6-8 clusters on 4 speakers, stress DER 0.47).  Ties within
    0.005 resolve to the MIDDLE of the plateau."""
    clean, stress, many = _cal_meetings(meetings)
    splits = [(clean, CLEAN_GATE), (stress, STRESS_GATE), (many, MANY_GATE)]
    grid = [round(float(t), 2) for t in np.arange(0.25, 0.95, 0.05)]
    scores = []
    for thr in grid:
        d = _diarizer(seg_params, onset, emb_params, thr)
        ratio, meds = _worst_gate_ratio(d, splits)
        scores.append(ratio)
        print(f"  threshold {thr:.2f}: clean {meds[0]:.3f}  "
              f"stress {meds[1]:.3f}  many {meds[2]:.3f}  "
              f"worst/gate {ratio:.3f}", flush=True)
    best = min(scores)
    plateau = [i for i, s in enumerate(scores) if s <= best + 0.005]
    pick = plateau[len(plateau) // 2]
    print(f"calibrated cluster_threshold {grid[pick]:.2f} "
          f"(worst/gate {scores[pick]:.3f}, plateau of {len(plateau)})")
    return grid[pick]


def calibrate_binarize(seg_params, onset, emb_params, thr, meetings=4):
    """Sweep the Binarize post-processing knobs (pipeline.diarize: the
    pyannote-3.1 hysteresis offset + min_duration_off, plus this
    rebuild's overlap_onset gate) on the SAME calibration meetings,
    minimising the gate-normalised worse split.  The stress split's two
    residual error modes after the threshold sweep are exactly what
    these knobs target: activation dips under a noisy floor fragment or
    delete true turns (miss -> hysteresis), and reverb/harmonic ghosts
    cross the onset as a spurious concurrent speaker (overlap FA ->
    overlap_onset)."""
    clean, stress, many = _cal_meetings(meetings)
    splits = [(clean, CLEAN_GATE), (stress, STRESS_GATE), (many, MANY_GATE)]
    grid = [
        {"offset": off, "min_duration_off": mdoff, "overlap_onset": ovl}
        for off in (None, round(onset - 0.15, 2), round(onset - 0.25, 2))
        for mdoff in (0.0, 0.3)
        for ovl in (None, 0.6, 0.7)
    ]
    best = None
    for decode in grid:
        d = _diarizer(seg_params, onset, emb_params, thr, decode)
        ratio, meds = _worst_gate_ratio(d, splits)
        print(f"  binarize {decode}: clean {meds[0]:.3f}  "
              f"stress {meds[1]:.3f}  many {meds[2]:.3f}  "
              f"worst/gate {ratio:.2f}", flush=True)
        if best is None or ratio < best[0] - 1e-9:
            best = (ratio, decode)
    print(f"calibrated binarize {best[1]} (worst/gate {best[0]:.2f})")
    return best[1]


def calibrate_mcf(seg_params, onset, emb_params, thr, decode):
    """Sweep the meeting-length-relative min_cluster_frac on two LONG
    calibration meetings (seed disjoint from training and validation).
    Long meetings accumulate stray crops into spurious clusters (round-5
    measurement: 8 clusters on 4 speakers at 21 min) — a failure mode the
    short-meeting sweeps can never see, and the absolute min_cluster_size
    cannot target without dissolving real speakers in short meetings
    (24 s gives each speaker ~4 crops).  frac * n_crops is inert on the
    short splits by construction, so this sweep composes with them."""
    rng = np.random.default_rng(515253)
    cases = [
        make_meeting(rng, sample_f0s(rng, n=4, min_ratio=1.18),
                     duration_s=1260.0, noise=0.004)
        for _ in range(2)
    ]
    best = None
    for frac in (0.0, 0.01, 0.02, 0.04):
        d = _diarizer(seg_params, onset, emb_params, thr,
                      dict(decode or {}, min_cluster_frac=frac))
        ders = []
        for audio, ref in cases:
            turns = d.diarize(audio)
            ders.append(diarization_error_rate(ref, turns, collar_s=0.25)
                        if turns else 1.0)
        med = float(np.median(ders))
        print(f"  min_cluster_frac {frac}: long median {med:.3f}", flush=True)
        if best is None or med < best[0] - 1e-9:
            best = (med, frac)
    print(f"calibrated min_cluster_frac {best[1]} (long median {best[0]:.3f})")
    decode = dict(decode or {})
    if best[1]:
        decode["min_cluster_frac"] = best[1]
    return decode


def validate(seg_params, onset, emb_params, thr, decode=None, trials=5,
             gate=CLEAN_GATE, stress_gate=STRESS_GATE, many_gate=MANY_GATE,
             long_gate=LONG_GATE,
             count_exact_gate=0.5, count_within1_gate=0.85):
    """Four held-out splits + a speaker-count gate (round-4 verdict
    next-step #5: gates were synthetic 2-4 speakers, <= a few minutes,
    single-number DER, stress scraping 0.251/0.30):
    - clean: 3-speaker meetings, median DER <= `gate`,
    - stress: 4 speakers, 3x noise floor, reverb, short gaps — TIGHTENED
      to `stress_gate`=0.25 (was 0.30),
    - many: 5-8 speakers per meeting (60 s), median <= `many_gate`,
    - long: two 21-minute 4-speaker meetings, median <= `long_gate`,
    - counts: across all trials the predicted speaker count must be
      EXACT on >= `count_exact_gate` of meetings and within +-1 on
      >= `count_within1_gate`.
    Every trial prints the NIST miss/false-alarm/confusion decomposition
    so a failure says HOW it failed (utils/metrics.py)."""
    from audio_processor_tpu.utils.metrics import diarization_error_rate_detailed

    d = _diarizer(seg_params, onset, emb_params, thr, decode)
    rng = np.random.default_rng(987654)  # held out from training rngs
    count_errs: list[int] = []
    failures: list[str] = []

    def run_split(name, cases, split_gate):
        ders = []
        for trial, (audio, ref) in enumerate(cases):
            turns = d.diarize(audio)
            det = diarization_error_rate_detailed(ref, turns, collar_s=0.25)
            der = det["der"] if turns else 1.0
            count_errs.append(abs(det["hyp_speakers"] - det["ref_speakers"]))
            print(
                f"{name} trial {trial}: DER {der:.3f} "
                f"(miss {det['miss']:.3f} fa {det['false_alarm']:.3f} "
                f"conf {det['confusion']:.3f}), "
                f"{det['hyp_speakers']}/{det['ref_speakers']} speakers",
                flush=True,
            )
            ders.append(der)
        med = float(np.median(ders))
        print(f"median {name} DER {med:.3f} (gate {split_gate})", flush=True)
        if med > split_gate:
            # run every split before failing: the full per-split picture
            # (with decompositions) is what decides retrain vs recalibrate
            failures.append(f"{name} DER {med:.3f} > {split_gate}")
        return med

    clean = [make_meeting(rng, sample_f0s(rng)) for _ in range(trials)]
    med = run_split("held-out", clean, gate)
    stress = [
        make_meeting(rng, sample_f0s(rng, n=4, min_ratio=1.18), noise=0.009,
                     reverb=True, gap=(0.15, 0.4))
        for _ in range(trials)
    ]
    run_split("stress", stress, stress_gate)
    many = [
        make_meeting(
            rng, sample_f0s(rng, n=5 + t % 4, min_ratio=1.12),
            duration_s=60.0, noise=0.005, gap=(0.2, 0.5),
        )
        for t in range(trials)
    ]
    run_split("many-speakers(5-8)", many, many_gate)
    long_ = [
        make_meeting(rng, sample_f0s(rng, n=4, min_ratio=1.18),
                     duration_s=1260.0, noise=0.004)
        for _ in range(2)
    ]
    run_split("long(21min)", long_, long_gate)

    exact = float(np.mean([e == 0 for e in count_errs]))
    within1 = float(np.mean([e <= 1 for e in count_errs]))
    print(f"speaker-count accuracy: exact {exact:.2f} "
          f"(gate {count_exact_gate}), within-1 {within1:.2f} "
          f"(gate {count_within1_gate}) over {len(count_errs)} meetings")
    if exact < count_exact_gate or within1 < count_within1_gate:
        failures.append(
            f"speaker-count accuracy exact {exact:.2f}/within-1 {within1:.2f}"
        )
    if failures:
        raise SystemExit("gates FAILED — not saving:\n  " + "\n  ".join(failures))
    return med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seg-steps", type=int, default=3000)
    ap.add_argument("--emb-steps", type=int, default=2400)
    ap.add_argument("--emb-bank", type=int, default=32,
                    help="AAM pitch-bank classes; 32 spaces adjacent "
                    "classes ~4.9%% apart in pitch — the round-5 "
                    "5-8-speaker gates sample speakers as close as 12%%, "
                    "so the embedding must discriminate finer than the "
                    "old 24-class bank's 6.7%%")
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--out-dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "audio_processor_tpu", "assets"))
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (default: whatever jax.devices() gives)")
    ap.add_argument("--cache-dir", default="/tmp/aptpu_diar_cache",
                    help="candidate params are saved here BEFORE the DER "
                    "gates, so a gate failure doesn't discard the training")
    ap.add_argument("--from-cache", action="store_true",
                    help="skip training; recalibrate + validate + save from "
                    "the candidate params a previous run cached")
    ap.add_argument("--validate-only", action="store_true",
                    help="run the validation gates against the COMMITTED "
                    "bundled assets (their saved calibration included) "
                    "and exit — no training, no saving")
    ap.add_argument("--recalibrate", action="store_true",
                    help="with --validate-only-style asset loading: rerun "
                    "the threshold+binarize calibration on the committed "
                    "assets' params, then validate and SAVE")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print(f"devices: {jax.devices()}")

    if args.validate_only or args.recalibrate:
        seg_path = os.path.join(args.out_dir, Diarizer.BUNDLED_SEG)
        emb_path = os.path.join(args.out_dir, Diarizer.BUNDLED_EMB)
        seg_params, _ = dt.load_params(seg_path)
        onset = dt.load_onset(seg_path) or 0.5
        decode = dt.load_decode_meta(seg_path)
        emb_params, _ = et.load_params(emb_path)
        thr = et.load_cluster_threshold(emb_path)
        print(f"loaded bundled assets (onset {onset}, thr {thr}, "
              f"decode {decode})")
        if args.recalibrate:
            thr = calibrate_threshold(seg_params, onset, emb_params)
            decode = calibrate_binarize(seg_params, onset, emb_params, thr)
            decode = calibrate_mcf(seg_params, onset, emb_params, thr, decode)
        validate(seg_params, onset, emb_params, thr, decode)
        if args.recalibrate:
            dt.save_params(seg_path, seg_params, SEG_CFG, onset=onset,
                           decode=decode)
            et.save_params(emb_path, emb_params, EMB_CFG,
                           cluster_threshold=thr)
            for p in (seg_path, emb_path):
                print(f"saved {p} ({os.path.getsize(p) / 1e6:.1f} MB)")
        else:
            print("validate-only: all gates passed")
        return

    cache_seg = os.path.join(args.cache_dir, "cand_seg.npz")
    cache_emb = os.path.join(args.cache_dir, "cand_emb.npz")
    if args.from_cache:
        seg_params, _ = dt.load_params(cache_seg)
        onset = dt.load_onset(cache_seg) or 0.5
        emb_params, _ = et.load_params(cache_emb)
        print(f"loaded candidate params from {args.cache_dir}")
    else:
        rng = np.random.default_rng(20260817)
        seg_params, onset = train_segmentation(rng, args.seg_steps, args.batch)
        emb_params = train_embedding(rng, args.emb_steps, max(args.batch, 32),
                                     n_bank=args.emb_bank)
        os.makedirs(args.cache_dir, exist_ok=True)
        dt.save_params(cache_seg, seg_params, SEG_CFG, onset=onset)
        et.save_params(cache_emb, emb_params, EMB_CFG)
        print(f"cached candidate params to {args.cache_dir}", flush=True)
    thr = calibrate_threshold(seg_params, onset, emb_params)
    decode = calibrate_binarize(seg_params, onset, emb_params, thr)
    decode = calibrate_mcf(seg_params, onset, emb_params, thr, decode)
    validate(seg_params, onset, emb_params, thr, decode)

    os.makedirs(args.out_dir, exist_ok=True)
    seg_path = os.path.join(args.out_dir, Diarizer.BUNDLED_SEG)
    emb_path = os.path.join(args.out_dir, Diarizer.BUNDLED_EMB)
    dt.save_params(seg_path, seg_params, SEG_CFG, onset=onset, decode=decode)
    et.save_params(emb_path, emb_params, EMB_CFG, cluster_threshold=thr)
    for p in (seg_path, emb_path):
        print(f"saved {p} ({os.path.getsize(p) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
