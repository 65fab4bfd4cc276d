#!/usr/bin/env python3
"""Build a trained-weight parity case for tests/test_parity_generate.py.

Run this on a machine WITH network access (the TPU bench image has zero
egress) and ship the output directory into the image, then:

    APTPU_PARITY_CHECKPOINT=<outdir>/case.json python -m pytest \
        tests/test_parity_generate.py::test_real_checkpoint_transcript

What it does:
  1. downloads an openai-whisper checkpoint (default: tiny) + the
     multilingual tiktoken rank file,
  2. converts the checkpoint with models/whisper/convert.from_openai_pt
     into the native .npz format,
  3. transcribes the given WAV with the *reference* openai-whisper
     implementation to capture the expected transcript,
  4. writes case.json referencing all artifacts.

Usage:
    python tools/make_parity_case.py --wav speech.wav --model tiny \
        --out parity_case/
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wav", required=True, help="a short speech WAV (16 kHz mono)")
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--out", default="parity_case")
    args = ap.parse_args()

    try:
        import whisper  # openai-whisper, the reference engine
    except ImportError:
        print("pip install openai-whisper first (needs network)", file=sys.stderr)
        return 1

    os.makedirs(args.out, exist_ok=True)

    # 1. reference transcription (greedy, to match our default decode)
    ref_model = whisper.load_model(args.model)
    result = ref_model.transcribe(args.wav, temperature=0.0, beam_size=None)

    # 2. the raw .pt checkpoint whisper just downloaded
    ckpt_dir = os.path.expanduser(
        os.environ.get("XDG_CACHE_HOME", "~/.cache") + "/whisper"
    )
    pt_path = os.path.join(ckpt_dir, f"{args.model}.pt")

    # 3. tiktoken rank file from the whisper package assets
    import whisper.tokenizer as wtok

    rank_src = os.path.join(
        os.path.dirname(wtok.__file__), "assets", "multilingual.tiktoken"
    )
    rank_dst = os.path.join(args.out, "multilingual.tiktoken")
    with open(rank_src, "rb") as fin, open(rank_dst, "wb") as fout:
        fout.write(fin.read())

    # 4. convert to native npz
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from audio_processor_tpu.models.whisper import convert

    npz_path = os.path.join(args.out, f"whisper-{args.model}.npz")
    params, cfg = convert.load_openai_checkpoint(pt_path)
    # embed the vocab so the .npz alone is servable (Transcriber.from_npz
    # auto-builds the BPE tokenizer from it; the sidecar rank file stays
    # as an override/debug asset)
    from audio_processor_tpu.models.whisper.tokenizer import BPETokenizer

    convert.save_params(
        npz_path, params, cfg, tokenizer=BPETokenizer.from_tiktoken(rank_dst)
    )

    case = {
        "model_npz": os.path.abspath(npz_path),
        "tokenizer": os.path.abspath(rank_dst),
        "wav": os.path.abspath(args.wav),
        "expected_text": result["text"],
        "expected_segments": [
            {"start": s["start"], "end": s["end"], "text": s["text"]}
            for s in result["segments"]
        ],
        "reference_engine": f"openai-whisper {whisper.__version__} / {args.model}",
    }
    # per-model case file (verify_parity.py gates several variants from
    # one directory); the plain case.json name stays as an alias for the
    # first/only prepared model so the documented single-model flow works
    case_path = os.path.join(args.out, f"case-{args.model}.json")
    with open(case_path, "w") as f:
        json.dump(case, f, indent=2, ensure_ascii=False)
    legacy = os.path.join(args.out, "case.json")
    if not os.path.exists(legacy):
        with open(legacy, "w") as f:
            json.dump(case, f, indent=2, ensure_ascii=False)
    print(f"wrote {case_path}; set APTPU_PARITY_CHECKPOINT={case_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
