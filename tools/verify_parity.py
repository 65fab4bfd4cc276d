#!/usr/bin/env python3
"""One-command trained-checkpoint parity runbook (WER + DER gates).

The hermetic test suite proves decode parity token-exactly on random
weights and diarization quality on synthetic voices; what it cannot prove
in a zero-egress image is parity with the *trained* engines the reference
serves — openai-whisper (audio_processor.py:863,1076) and
pyannote/speaker-diarization-3.1 (audio_processor.py:885,1105).  This
script turns those two skipped gates into a one-command pass wherever the
checkpoints can enter the machine:

    # on a machine WITH network (+ HF_TOKEN for pyannote):
    python tools/verify_parity.py --prepare --whisper tiny --pyannote 3.1 \
        --wav real_speech.wav --out parity_case/

    # then anywhere (ship parity_case/ into the image first if needed):
    python tools/verify_parity.py --out parity_case/

--prepare downloads + converts the real checkpoints and records the
reference engines' own outputs as the expected labels:
  * whisper: delegates to tools/make_parity_case.py (openai-whisper
    transcript -> case.json + converted .npz + tiktoken vocab),
  * pyannote: loads the segmentation + wespeaker-resnet34 embedding state
    dicts, converts them via models/diarization/convert, runs the real
    pyannote pipeline on the WAV, and writes diar_case.json with its turn
    list as the DER reference.

The verify step (default) runs the two env-gated tests —
tests/test_parity_generate.py::test_real_checkpoint_transcript and
tests/test_parity_diarization.py::test_real_checkpoint_der — against the
prepared cases and writes PARITY.json summarising pass/fail/skip per gate.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# ---------------------------------------------------------------------------
# prepare: download + convert (network machine only)
# ---------------------------------------------------------------------------

def _whisper_case_path(out: str, model: str) -> str:
    """Per-model case file, with the pre-round-5 single-model name as a
    fallback so existing prepared directories keep verifying."""
    case = os.path.join(out, f"case-{model}.json")
    legacy = os.path.join(out, "case.json")
    return case if os.path.exists(case) or not os.path.exists(legacy) else legacy


def _prepare_whisper(args, model: str) -> str | None:
    case = _whisper_case_path(args.out, model)
    if os.path.exists(case):
        print(f"whisper {model} case already prepared: {case}")
        return case
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_parity_case.py"),
         "--wav", args.wav, "--model", model, "--out", args.out],
    )
    case = _whisper_case_path(args.out, model)
    return case if r.returncode == 0 and os.path.exists(case) else None


def _prepare_pyannote(args) -> str | None:
    """Convert pyannote-3.1 checkpoints + capture its reference turns."""
    case = os.path.join(args.out, "diar_case.json")
    if os.path.exists(case):
        print(f"diarizer case already prepared: {case}")
        return case
    try:
        import torch
        from pyannote.audio import Pipeline
    except ImportError as e:
        print(f"prepare needs pyannote.audio + torch on this machine: {e}",
              file=sys.stderr)
        return None

    token = os.environ.get("HF_TOKEN")
    pipe = Pipeline.from_pretrained(
        f"pyannote/speaker-diarization-{args.pyannote}", use_auth_token=token
    )

    # 1. reference turns from the real pipeline (these ARE the DER labels:
    #    BASELINE's "<=1 % delta vs pyannote" scores us against its output)
    ann = pipe(args.wav)
    ref = [
        {"start": round(t.start, 3), "end": round(t.end, 3), "speaker": lbl}
        for t, _, lbl in ann.itertracks(yield_label=True)
    ]

    # 2. convert the two underlying nets into the native pack
    from audio_processor_tpu.models.diarization import convert as dconvert

    seg_sd = pipe._segmentation.model.state_dict()
    emb_sd = pipe._embedding.model_.state_dict()
    seg_params, _ = dconvert.from_pyannet_state_dict(
        {k: v.cpu().numpy() for k, v in seg_sd.items()}
    )
    emb_params, _ = dconvert.from_resnet_state_dict(
        {k: v.cpu().numpy() for k, v in emb_sd.items()}
    )
    npz = os.path.join(args.out, f"diarizer-pyannote-{args.pyannote}.npz")
    dconvert.save_diarizer_params(npz, seg_params, emb_params)

    payload = {
        "diarizer_npz": os.path.abspath(npz),
        "wav": os.path.abspath(args.wav),
        "reference_turns": ref,
        "max_der": args.max_der,
        "reference_engine": f"pyannote/speaker-diarization-{args.pyannote}",
    }
    with open(case, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {case}; set APTPU_PARITY_DIARIZER={case}")
    return case


# ---------------------------------------------------------------------------
# verify: run the gated tests, write PARITY.json
# ---------------------------------------------------------------------------

def _run_gate(test: str, env_var: str, case: str | None) -> dict:
    if not case or not os.path.exists(case):
        return {"status": "skipped", "reason": f"{env_var} case not prepared"}
    env = dict(os.environ, **{env_var: case})
    r = subprocess.run(
        [sys.executable, "-m", "pytest", test, "-q", "--no-header"],
        env=env, capture_output=True, text=True, cwd=REPO,
    )
    tail = (r.stdout.strip().splitlines() or [""])[-1]
    return {
        "status": "passed" if r.returncode == 0 else "FAILED",
        "case": os.path.abspath(case),
        "pytest": tail,
        **({} if r.returncode == 0 else {"output": r.stdout[-2000:]}),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--whisper", default="tiny,medium,large-v3-turbo",
                    help="comma-separated openai-whisper variants to gate — "
                    "the default pins the reference's serving model "
                    "(medium, audio_processor.py:863), its fallback tier, "
                    "and the large-v3-turbo family in ONE --prepare run")
    ap.add_argument("--pyannote", default="3.1",
                    help="pyannote speaker-diarization version")
    ap.add_argument("--wav", help="real speech WAV (prepare step only)")
    ap.add_argument("--out", default="parity_case",
                    help="artifact directory (cases + converted weights)")
    ap.add_argument("--max-der", type=float, default=0.01,
                    help="DER gate vs pyannote output (BASELINE: 1 %%)")
    ap.add_argument("--prepare", action="store_true",
                    help="download/convert checkpoints + capture reference "
                    "outputs (needs network, openai-whisper, pyannote.audio)")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    models = [m.strip() for m in args.whisper.split(",") if m.strip()]
    wcases = {m: _whisper_case_path(args.out, m) for m in models}
    dcase = os.path.join(args.out, "diar_case.json")

    if args.prepare:
        if not args.wav:
            ap.error("--prepare needs --wav (a real speech recording)")
        for m in models:
            wcases[m] = _prepare_whisper(args, m) or wcases[m]
        dcase = _prepare_pyannote(args) or dcase

    results = {
        f"whisper:{m}": _run_gate(
            "tests/test_parity_generate.py::test_real_checkpoint_transcript",
            "APTPU_PARITY_CHECKPOINT", wcases[m],
        )
        for m in models
    }
    results["diarization"] = _run_gate(
        "tests/test_parity_diarization.py::test_real_checkpoint_der",
        "APTPU_PARITY_DIARIZER", dcase,
    )
    out = os.path.join(REPO, "PARITY.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    print(f"wrote {out}")
    return 1 if any(r["status"] == "FAILED" for r in results.values()) else 0


if __name__ == "__main__":
    raise SystemExit(main())
