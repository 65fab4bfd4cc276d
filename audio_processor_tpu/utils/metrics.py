"""Quality metrics: WER and DER.

The acceptance gates in BASELINE.md are Whisper WER parity and <=1% DER
delta, so the framework ships its own scorers (the reference has no
evaluation machinery at all — SURVEY.md §4).

WER follows the standard normalise -> Levenshtein-over-words recipe.
DER follows NIST md-eval semantics on a frame grid: (false alarm + missed
+ speaker confusion) / total reference speech, with an optimal 1:1
speaker mapping (Hungarian assignment over overlap counts) and an
optional forgiveness collar around reference turn boundaries.
"""
from __future__ import annotations

import re

import numpy as np


# ---------------------------------------------------------------------------
# WER
# ---------------------------------------------------------------------------

_PUNCT_RE = re.compile(r"[^\w\s']", re.UNICODE)


def normalize_text(text: str) -> list[str]:
    """Lowercase, strip punctuation, collapse whitespace -> word list."""
    return _PUNCT_RE.sub(" ", text.lower()).split()


def word_error_rate(reference: str, hypothesis: str) -> float:
    """Levenshtein word distance / reference length."""
    ref = normalize_text(reference)
    hyp = normalize_text(hypothesis)
    if not ref:
        return 0.0 if not hyp else float("inf")
    # single-row DP
    prev = np.arange(len(hyp) + 1)
    for i, r in enumerate(ref, start=1):
        cur = np.empty(len(hyp) + 1, dtype=np.int64)
        cur[0] = i
        for j, h in enumerate(hyp, start=1):
            cur[j] = min(
                prev[j] + 1,  # deletion
                cur[j - 1] + 1,  # insertion
                prev[j - 1] + (r != h),  # substitution
            )
        prev = cur
    return float(prev[-1]) / len(ref)


# ---------------------------------------------------------------------------
# DER
# ---------------------------------------------------------------------------

def diarization_error_rate(
    reference: list[dict],
    hypothesis: list[dict],
    collar_s: float = 0.25,
    frame_s: float = 0.01,
) -> float:
    """DER between two turn lists [{"start","end","speaker"}].

    Frame-based scoring (10 ms default grid) with an optimal speaker
    mapping and a +-collar around reference boundaries excluded from
    scoring, as in the standard NIST protocol.
    """
    if not reference:
        return 0.0 if not hypothesis else float("inf")

    end = max(
        [t["end"] for t in reference] + [t["end"] for t in hypothesis] + [0.0]
    )
    n = int(np.ceil(end / frame_s)) + 1

    ref_spk = sorted({t["speaker"] for t in reference})
    hyp_spk = sorted({t["speaker"] for t in hypothesis})
    ref_m = np.zeros((n, max(len(ref_spk), 1)), bool)
    hyp_m = np.zeros((n, max(len(hyp_spk), 1)), bool)
    for t in reference:
        ref_m[int(t["start"] / frame_s) : int(np.ceil(t["end"] / frame_s)),
              ref_spk.index(t["speaker"])] = True
    for t in hypothesis:
        hyp_m[int(t["start"] / frame_s) : int(np.ceil(t["end"] / frame_s)),
              hyp_spk.index(t["speaker"])] = True

    # collar: exclude frames near reference boundaries
    score = np.ones(n, bool)
    c = int(round(collar_s / frame_s))
    if c > 0:
        for t in reference:
            for edge in (t["start"], t["end"]):
                lo = max(0, int(edge / frame_s) - c)
                hi = min(n, int(edge / frame_s) + c)
                score[lo:hi] = False

    ref_m = ref_m[score]
    hyp_m = hyp_m[score]

    # optimal 1:1 speaker mapping by overlap (Hungarian)
    overlap = ref_m.astype(np.int64).T @ hyp_m.astype(np.int64)
    from scipy.optimize import linear_sum_assignment

    ri, hi_ = linear_sum_assignment(-overlap)
    mapped_correct = np.zeros(ref_m.shape[0], np.int64)
    for r, h in zip(ri, hi_):
        mapped_correct += (ref_m[:, r] & hyp_m[:, h]).astype(np.int64)

    n_ref = ref_m.sum(axis=1)
    n_hyp = hyp_m.sum(axis=1)
    total_ref = int(n_ref.sum())
    if total_ref == 0:
        return 0.0 if n_hyp.sum() == 0 else float("inf")

    confusion_plus = np.minimum(n_ref, n_hyp) - mapped_correct
    missed = np.maximum(n_ref - n_hyp, 0)
    false_alarm = np.maximum(n_hyp - n_ref, 0)
    error = int(confusion_plus.sum() + missed.sum() + false_alarm.sum())
    return error / total_ref
