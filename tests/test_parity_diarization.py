"""Trained-weight diarization parity gate (converted pyannote checkpoints).

The hermetic suite proves the diarization stack end-to-end on synthetic
voices (tests/test_diarizer_e2e_der.py) and proves the converters are
structurally sound (tests/test_diarization_convert.py).  What neither can
prove inside a zero-egress image is BASELINE.md's acceptance gate — DER
within 1 % of `pyannote/speaker-diarization-3.1` (the engine the reference
serves, /root/reference/app/services/audio_processor.py:885,1105) on real
speech with real converted weights.

This test closes that gap the moment artifacts enter the image: point
APTPU_PARITY_DIARIZER at a case.json produced by
`python tools/verify_parity.py --prepare` on a machine with network +
HF token, and the gate hard-fails on any conversion or pipeline drift.
"""
import json
import os

import pytest


def test_real_checkpoint_der():
    """Converted pyannote-3.1 weights -> DER <= delta vs pyannote's own
    output on the same audio (pyannote's diarization is the reference
    labelling, so DER against it IS the BASELINE 'delta')."""
    case_path = os.environ.get("APTPU_PARITY_DIARIZER")
    if not case_path or not os.path.exists(case_path):
        pytest.skip(
            "no converted pyannote checkpoint in this image (zero egress); "
            "build one with tools/verify_parity.py --prepare"
        )
    with open(case_path) as f:
        case = json.load(f)

    from audio_processor_tpu.pipeline.diarize import Diarizer
    from audio_processor_tpu.pipeline.ingest import load_audio
    from audio_processor_tpu.utils.metrics import diarization_error_rate

    d = Diarizer.from_npz(case["diarizer_npz"])
    assert d.provenance == "converted"
    hyp = d.diarize(load_audio(case["wav"]))
    assert hyp, "converted diarizer produced zero turns"
    der = diarization_error_rate(case["reference_turns"], hyp)
    max_der = float(case.get("max_der", 0.01))  # BASELINE.md: <=1 % delta
    assert der <= max_der, (
        f"DER {der:.4f} vs pyannote reference exceeds the {max_der:.2%} gate"
    )
