"""Command-line tools: transcribe / diarize / convert / serve / bench.

    python -m audio_processor_tpu.cli transcribe meeting.wav
    python -m audio_processor_tpu.cli diarize meeting.wav
    python -m audio_processor_tpu.cli process meeting.wav        # full 9-stage job
    python -m audio_processor_tpu.cli convert-whisper small.pt out.npz
    python -m audio_processor_tpu.cli wer ref.txt hyp.txt

The reference has no CLI at all — everything goes through the web UI.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

from .utils.options import fallback_ladder, optional_float as _optional_float

# argparse default meaning "keep the Transcriber's own default" — needed
# because None is itself meaningful for the threshold options (openai's
# optional_float: the string "None" disables the check entirely)
_KEEP = object()


def cmd_transcribe(args) -> None:
    if not args.word_timestamps:
        # openai's CLI errors for word-level subtitle options without
        # word_timestamps rather than silently emitting plain cues —
        # validated BEFORE model init so the mistake surfaces instantly
        for flag, val in (
            ("--highlight-words", args.highlight_words),
            ("--max-line-width", args.max_line_width),
            ("--max-line-count", args.max_line_count),
            ("--max-words-per-line", args.max_words_per_line),
        ):
            if val:
                raise SystemExit(f"{flag} requires --word-timestamps")

    from .pipeline import ingest
    from .pipeline.transcribe import Transcriber

    kw = {}
    if args.language:
        from .models.whisper.tokenizer import language_index

        kw["language"] = language_index(args.language, num_languages=None)
    if args.beam:
        kw["beam_size"] = args.beam
    if args.best_of is not None:
        kw["best_of"] = args.best_of
    if args.patience is not None:
        kw["patience"] = args.patience
    if args.suppress_tokens is not None:
        kw["suppress_tokens"] = [
            int(t) for t in args.suppress_tokens.split(",") if t.strip()
        ]
    if args.temperature:
        kw["temperature"] = args.temperature
    for name in (
        "compression_ratio_threshold",
        "logprob_threshold",
        "no_speech_threshold",
    ):
        v = getattr(args, name)
        if v is not _KEEP:
            kw[name] = v
    inc = args.temperature_increment_on_fallback
    if inc is _KEEP and args.temperature:
        # openai's CLI defaults the increment to 0.2, so `--temperature
        # 0.4` there decodes with rungs (0.6, 0.8, 1.0) — NOT the API's
        # plain-float no-retry form.  Mirror the CLI default explicitly.
        inc = 0.2
    if inc is not _KEEP:
        try:
            kw["temperature_ladder"] = fallback_ladder(args.temperature, inc)
        except ValueError as e:
            raise SystemExit(f"--temperature-increment-on-fallback: {e}")
    if args.length_penalty is not None:
        kw["length_penalty"] = args.length_penalty
    if args.word_timestamps:
        kw["word_timestamps"] = True
    if args.prepend_punctuations is not None:
        kw["prepend_punctuations"] = args.prepend_punctuations
    if args.append_punctuations is not None:
        kw["append_punctuations"] = args.append_punctuations
    if args.hallucination_silence_threshold is not None:
        if not args.word_timestamps:
            raise SystemExit(
                "--hallucination-silence-threshold requires --word-timestamps"
            )
        kw["hallucination_silence_threshold"] = (
            args.hallucination_silence_threshold
        )
    if args.condition:
        kw["condition_on_previous_text"] = True
    if args.task != "transcribe":
        kw["task"] = args.task
    if args.initial_prompt:
        kw["initial_prompt"] = args.initial_prompt
    if args.carry_initial_prompt:
        kw["carry_initial_prompt"] = True
    if args.prefix:
        kw["prefix"] = args.prefix
    if args.without_timestamps:
        kw["without_timestamps"] = True
    if args.max_initial_timestamp is not None:
        kw["max_initial_timestamp"] = (
            None if args.max_initial_timestamp < 0
            else args.max_initial_timestamp
        )
    fmt = "json" if args.json else args.output_format
    if fmt == "all" and not args.output_dir:
        raise SystemExit("--output-format all requires --output-dir")
    if len(args.audio) > 1 and not args.output_dir:
        # openai's CLI writes one output file per input; interleaving
        # several transcripts on stdout helps nobody
        raise SystemExit("multiple audio inputs require --output-dir")

    if args.model_path:
        t = Transcriber.from_npz(
            args.model_path, tokenizer_path=args.tokenizer, **kw
        )
    else:
        t = Transcriber.random_init(args.model, **kw)

    from .utils import writers

    wopt = dict(  # openai's word-level subtitle options (srt/vtt only)
        highlight_words=args.highlight_words,
        max_line_width=args.max_line_width,
        max_line_count=args.max_line_count,
        max_words_per_line=args.max_words_per_line,
    )

    def render(out: dict, f: str) -> str:
        if f == "json":
            return json.dumps(out, indent=2) + "\n"
        return writers.format_segments(
            out["segments"], f, **(wopt if f in ("srt", "vtt") else {})
        )

    on_segment = None
    if args.verbose:
        from .utils.writers import _timestamp as _fmt_ts

        def on_segment(seg):  # openai's verbose timestamp form
            s = _fmt_ts(seg["start"], always_hours=True, decimal=".")
            e = _fmt_ts(seg["end"], always_hours=True, decimal=".")
            print(f"[{s} --> {e}] {seg['text']}", file=sys.stderr, flush=True)

    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)

    used_stems: dict[str, int] = {}

    def emit(path: str, out: dict) -> None:
        if args.output_dir:
            # openai's CLI file-writing mode: <output_dir>/<stem>.<fmt>,
            # every known format when --output-format all.  Same-basename
            # inputs (a.wav + a.m4a, or same name from two dirs) uniquify
            # instead of silently overwriting each other's transcripts.
            stem = os.path.splitext(os.path.basename(path))[0]
            n = used_stems.get(stem, 0)
            used_stems[stem] = n + 1
            if n:
                stem = f"{stem}.{n + 1}"
            targets = (
                ("txt", "srt", "vtt", "tsv", "json") if fmt == "all"
                else (("txt" if fmt == "text" else fmt),)
            )
            for f in targets:
                dest = os.path.join(args.output_dir, f"{stem}.{f}")
                with open(dest, "w", encoding="utf-8") as fh:
                    fh.write(render(out, f))
            print(
                f"{path}: {out['duration']:.1f}s -> "
                f"{args.output_dir}/{stem}.{{{','.join(targets)}}} "
                f"({out['rtf_x']:.1f}x realtime)",
                file=sys.stderr,
            )
        elif fmt in ("json", "srt", "vtt", "tsv", "txt"):
            print(render(out, fmt), end="")
            if fmt != "json":
                print(
                    f"-- {out['duration']:.1f}s audio, "
                    f"{out['rtf_x']:.1f}x realtime",
                    file=sys.stderr,
                )
        else:
            for seg in out["segments"]:
                print(f"[{seg['start']:8.2f} – {seg['end']:8.2f}] {seg['text']}")
            print(f"-- {out['duration']:.1f}s audio, {out['rtf_x']:.1f}x realtime",
                  file=sys.stderr)

    if len(args.audio) > 1 and not args.clip_timestamps:
        # several inputs, no per-file clip options: ONE shared-slab
        # batched decode (Transcriber.transcribe_batch) — identical
        # per-file results, far better slab occupancy for short clips.
        # --verbose rides the batch too (per-file live callback).
        # PATHS go in directly: transcribe_batch loads them one at a time
        # (pre-loading every file doubled peak host memory on long
        # multi-recording batches)
        outs = t.transcribe_batch(
            list(args.audio), remove_silence=not args.keep_silence,
            on_segment=(
                (lambda fi, seg: on_segment(
                    dict(seg, text=f"{args.audio[fi]}:{seg['text']}")))
                if on_segment is not None else None
            ),
        )
        for path, out in zip(args.audio, outs):
            emit(path, out)
        return

    for path in args.audio:
        audio = ingest.load_audio(path)
        clips = None
        if args.clip_timestamps:
            from .utils.timestamps import parse_clip_timestamps

            clips = parse_clip_timestamps(
                args.clip_timestamps, len(audio) / ingest.TARGET_SR
            )
        out = t.transcribe(
            audio, remove_silence=not args.keep_silence,
            clip_timestamps=clips, on_segment=on_segment,
        )
        emit(path, out)


def cmd_diarize(args) -> None:
    from .pipeline import ingest
    from .pipeline.diarize import Diarizer

    kw = {}
    if args.min_cluster_size:
        kw["min_cluster_size"] = args.min_cluster_size
    if args.embedding_path:
        from .training import embedding_trainer as et

        emb_params, emb_cfg = et.load_params(args.embedding_path)
        kw.update(emb_params=emb_params, emb_cfg=emb_cfg)
    if args.segmentation_path:
        d = Diarizer.from_tpu_segmentation(args.segmentation_path, **kw)
    else:
        # same default ladder as serving: bundled synthetic-pretrained
        # checkpoints before random weights (runtime/services.py)
        d = Diarizer.bundled(**kw) or Diarizer.random_init(**kw)
    audio = ingest.load_audio(args.audio)
    turns = d.diarize(
        audio,
        num_speakers=args.num_speakers,
        min_speakers=args.min_speakers,
        max_speakers=args.max_speakers,
    )
    if args.json:
        print(json.dumps(turns, indent=2))
    else:
        for t in turns:
            print(f"[{t['start']:8.2f} – {t['end']:8.2f}] {t['speaker']}")


def cmd_process(args) -> None:
    """Run the full 9-stage meeting job on a local file (no SaaS)."""
    from .pipeline import ingest  # noqa: F401 — validate decodability early
    from .pipeline.meeting import MeetingProcessor, build_failure_result
    from .pipeline.transcribe import Transcriber
    from .pipeline.diarize import Diarizer
    from .runtime.job_engine import JobEngine

    transcriber = (
        Transcriber.from_npz(args.model_path, tokenizer_path=args.tokenizer)
        if args.model_path
        else Transcriber.random_init(args.model)
    )
    diarizer = None
    if not args.no_diarization:
        diarizer = Diarizer.bundled() or Diarizer.random_init()
    proc = MeetingProcessor(transcriber=transcriber, diarizer=diarizer)
    engine = JobEngine(max_workers=1)
    engine.create_job("cli", file_id=args.audio)
    engine.submit("cli", lambda ctx: proc.process(ctx, args.audio),
                  failure_result=build_failure_result)
    import time

    while True:
        st = engine.get_job_status("cli")
        print(f"\r{st['progress']:3d}% {st.get('message','')}        ",
              end="", file=sys.stderr)
        if st["status"] in ("completed", "failed", "cancelled"):
            break
        time.sleep(0.3)
    print(file=sys.stderr)
    print(json.dumps(st, indent=2))
    engine.shutdown(wait=False)


def cmd_stream(args) -> None:
    """Simulated-real-time streaming transcription of a file.

    Feeds the recording in --block-s blocks through StreamingTranscriber
    and prints each segment the moment its 30 s window completes — the
    capability the reference lacks entirely (whole-file uploads only).
    With --realtime the feed is paced at 1x to demo live latency.
    """
    import time

    from .pipeline import ingest
    from .pipeline.streaming import StreamingTranscriber
    from .pipeline.transcribe import Transcriber

    kw = {}
    if args.language:
        from .models.whisper.tokenizer import language_index

        kw["language"] = language_index(args.language, num_languages=None)
    t = (
        Transcriber.from_npz(args.model_path, tokenizer_path=args.tokenizer, **kw)
        if args.model_path
        else Transcriber.random_init(args.model, **kw)
    )
    if args.block_s <= 0:
        sys.exit(f"--block-s must be positive, got {args.block_s}")
    st = StreamingTranscriber(t, partial_step_s=args.partial_step_s)
    audio = ingest.load_audio(args.audio)
    block = max(1, int(args.block_s * ingest.TARGET_SR))

    def emit(seg):
        print(
            f"[{seg['start']:8.2f} – {seg['end']:8.2f}] {seg['text']}",
            flush=True,
        )

    for lo in range(0, len(audio), block):
        if args.realtime:
            time.sleep(args.block_s)
        for seg in st.feed(audio[lo : lo + block]):
            emit(seg)
    for seg in st.flush():
        emit(seg)


def cmd_convert_whisper(args) -> None:
    import os
    import sys

    from .models.whisper import convert
    from .models.whisper.tokenizer import load_tokenizer_file

    if os.path.isdir(args.checkpoint):
        # HF checkpoint directory: torch-free (safetensors), vocab
        # auto-embedded from the directory's vocab.json/merges.txt
        params, cfg, tokenizer = convert.load_hf_checkpoint(args.checkpoint)
    else:
        params, cfg = convert.load_openai_checkpoint(args.checkpoint)
        tokenizer = None
    if args.tokenizer:
        tokenizer = load_tokenizer_file(args.tokenizer)
    if tokenizer is None:
        print(
            "WARNING: no tokenizer found/given — the .npz will have no "
            "embedded vocab and serving will fall back to the byte "
            "tokenizer (garbage text on real weights).  Pass the "
            "checkpoint's multilingual.tiktoken / gpt2.tiktoken (or HF "
            "vocab.json) via --tokenizer.",
            file=sys.stderr,
        )
    convert.save_params(args.out, params, cfg, tokenizer=tokenizer)
    print(f"converted {args.checkpoint} -> {args.out} ({cfg.n_audio_state}d, "
          f"{cfg.n_audio_layer}+{cfg.n_text_layer} layers"
          f"{', vocab embedded' if tokenizer else ''})")


def cmd_convert_diarizer(args) -> None:
    """pyannote segmentation + ResNet embedding checkpoints -> native .npz."""
    import torch

    from .models.diarization import convert as dconvert

    seg_sd = torch.load(args.segmentation, map_location="cpu", weights_only=False)
    if isinstance(seg_sd, dict) and "state_dict" in seg_sd:
        seg_sd = seg_sd["state_dict"]
    emb_sd = torch.load(args.embedding, map_location="cpu", weights_only=False)
    if isinstance(emb_sd, dict) and "state_dict" in emb_sd:
        emb_sd = emb_sd["state_dict"]
    seg_params, _ = dconvert.from_pyannet_state_dict(seg_sd)
    emb_params, _ = dconvert.from_resnet_state_dict(emb_sd)
    dconvert.save_diarizer_params(args.out, seg_params, emb_params)
    print(f"converted -> {args.out}")


def cmd_finetune_whisper(args) -> None:
    """Fine-tune Whisper on a manifest of (audio, transcript) pairs.

    Manifest: one JSON object per line, {"audio": "path.wav", "text": "..."}.
    The reference cannot do this at all — it consumes the frozen upstream
    model (app/services/audio_processor.py:863); rebuilding the engine
    first-party makes domain adaptation a CLI command (the STT twin of
    train-segmentation's train-to-serve loop).  Single-device here; the
    sharded dp x tp variant is training/train_step.shard_train_state.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .models.whisper import convert, decode as decode_lib, model as model_lib
    from .models.whisper.config import get_config
    from .models.whisper.tokenizer import ByteTokenizer, language_index
    from .ops import frontend
    from .pipeline import ingest
    from .training import train_step as ts

    items = []
    with open(args.manifest) as fh:
        for line in fh:
            if line.strip():
                items.append(json.loads(line))
    if not items:
        raise SystemExit("empty manifest")

    if args.model_path:
        params, cfg = convert.load_params(args.model_path)
    else:
        cfg = get_config(args.model)
        params = model_lib.init_params(cfg, jax.random.PRNGKey(args.seed))
    st = decode_lib.SpecialTokens.for_config(cfg)
    # Tokenize training text with the CHECKPOINT'S vocab — fine-tuning a
    # converted BPE checkpoint against byte ids would silently corrupt it.
    # Resolution mirrors Transcriber.from_npz: --tokenizer asset > vocab
    # embedded in the .npz > ByteTokenizer (random-init / byte models only).
    if args.tokenizer:
        from .models.whisper.tokenizer import load_tokenizer_file

        tokenizer = load_tokenizer_file(args.tokenizer)
    elif args.model_path:
        tokenizer = convert.load_tokenizer(args.model_path)
        if tokenizer is None:
            raise SystemExit(
                f"{args.model_path} has no embedded tokenizer — pass "
                "--tokenizer, or re-convert with convert-whisper --tokenizer. "
                "Refusing to fine-tune real weights against byte ids."
            )
    else:
        tokenizer = ByteTokenizer()
    lang = language_index(args.language, num_languages=None) if args.language else None
    sot_seq = st.sot_sequence(language=lang, timestamps=False)

    # host-side dataset build: 30 s mel windows + teacher-forced token rows
    n_samples = 2 * cfg.n_audio_ctx * frontend.HOP_LENGTH
    max_t = args.max_tokens
    if max_t < len(sot_seq) + 2:
        raise SystemExit(
            f"--max-tokens {max_t} cannot hold the {len(sot_seq)}-token sot "
            "sequence plus at least one text token and <|eot|>"
        )
    mels, tins, touts, masks = [], [], [], []
    for it in items:
        audio = ingest.load_audio(it["audio"])[:n_samples]
        audio = np.pad(audio, (0, n_samples - len(audio)))
        mels.append(
            np.asarray(
                frontend.log_mel_spectrogram(
                    jnp.asarray(audio), n_mels=cfg.n_mels
                )
            )
        )
        toks = [
            int(t) for t in tokenizer.encode(" " + it["text"].strip())
            if int(t) < st.eot
        ]
        seq = sot_seq + toks[: max_t - len(sot_seq) - 1] + [st.eot]
        ti = np.full(max_t, st.eot, np.int32)
        to = np.full(max_t, st.eot, np.int32)
        mk = np.zeros(max_t, np.float32)
        ti[: len(seq) - 1] = seq[:-1]
        to[: len(seq) - 1] = seq[1:]
        # loss on text + eot only, not on predicting the sot prefix
        mk[len(sot_seq) - 1 : len(seq) - 1] = 1.0
        tins.append(ti)
        touts.append(to)
        masks.append(mk)
    mels = np.stack(mels)
    tins, touts, masks = np.stack(tins), np.stack(touts), np.stack(masks)

    opt = ts.make_optimizer(args.lr)
    state = ts.TrainState(
        params=params, opt_state=opt.init(params), step=jnp.int32(0)
    )
    rng = np.random.default_rng(args.seed)
    first_loss = last_loss = None
    for step in range(args.steps):
        idx = rng.integers(0, len(items), args.batch)
        batch = ts.Batch(
            mel=jnp.asarray(mels[idx]),
            tokens_in=jnp.asarray(tins[idx]),
            tokens_out=jnp.asarray(touts[idx]),
            loss_mask=jnp.asarray(masks[idx]),
        )
        state, loss = ts.train_step(state, cfg, batch, lr=args.lr)
        last_loss = float(loss)
        if first_loss is None:
            first_loss = last_loss
        if step % max(1, args.steps // 10) == 0 or step == args.steps - 1:
            print(f"step {step:5d}  loss {last_loss:.4f}", file=sys.stderr)
    if first_loss is not None:
        print(f"loss {first_loss:.4f} -> {last_loss:.4f} over {args.steps} steps")
    else:
        print(f"no training steps ran (--steps {args.steps})", file=sys.stderr)
    if args.out:
        convert.save_params(
            args.out, jax.device_get(state.params), cfg,
            tokenizer=tokenizer if not isinstance(tokenizer, ByteTokenizer)
            else None,
        )
        print(f"saved {args.out} (serve with `transcribe --model-path {args.out}`)")


def cmd_train_segmentation(args) -> None:
    """Train the TPU-native segmentation net with the powerset loss.

    Synthetic mixtures by default (hermetic smoke-training / calibration);
    real corpora plug in by replacing the batch source."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .models.diarization import segmentation_tpu as seg
    from .models.diarization.segmentation import powerset_matrix
    from .training import diarization_trainer as dt

    cfg = seg.TpuSegmentationConfig(window_s=args.window_s)
    member = powerset_matrix(cfg)
    lut = dt.powerset_lookup(member)
    member_j, lut_j = jnp.asarray(member), jnp.asarray(lut)
    rng = np.random.default_rng(args.seed)
    state = dt.init_train_state(cfg, jax.random.PRNGKey(args.seed), lr=args.lr)

    for step in range(args.steps):
        xs, ys = zip(*(dt.synth_mixture(rng, cfg) for _ in range(args.batch)))
        state, loss = dt.train_step(
            state, cfg, jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(ys)),
            member_j, lut_j, lr=args.lr,
        )
        if step % max(1, args.steps // 10) == 0 or step == args.steps - 1:
            print(f"step {step:4d}  powerset loss {float(loss):.4f}")

    if args.out:
        dt.save_params(args.out, state.params, cfg)
        print(f"saved trained segmentation -> {args.out} "
              f"(serve with `diarize --segmentation-path {args.out}` or "
              f"Diarizer.from_tpu_segmentation)")


def cmd_train_embedding(args) -> None:
    """Train the speaker-embedding net with AAM-softmax.

    Synthetic speakers by default (hermetic smoke-training); real corpora
    plug in by replacing the crop source.  The trained cosine space is
    what AHC clusters on (pipeline/diarize.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .models.diarization import embedding as emb
    from .training import embedding_trainer as et

    cfg = emb.EmbeddingConfig(crop_s=args.crop_s)
    rng = np.random.default_rng(args.seed)
    f0s = tuple(90.0 * (1.45 ** i) for i in range(args.speakers))
    state = et.init_train_state(
        cfg, args.speakers, jax.random.PRNGKey(args.seed), lr=args.lr
    )
    for step in range(args.steps):
        labels = rng.integers(0, args.speakers, args.batch)
        crops = np.stack(
            [et.synth_speaker_crop(rng, f0s[s], cfg) for s in labels]
        )
        state, loss = et.train_step(
            state, cfg, jnp.asarray(crops), jnp.asarray(labels, jnp.int32),
            lr=args.lr,
        )
        if step % max(1, args.steps // 10) == 0 or step == args.steps - 1:
            print(f"step {step:4d}  aam loss {float(loss):.4f}")

    if args.out:
        et.save_params(args.out, state.params, cfg)
        print(f"saved trained embedding -> {args.out} "
              f"(serve with `diarize --embedding-path {args.out}`)")


def cmd_calibrate_alignment_heads(args) -> None:
    """Measure a word-timestamp alignment-head mask for a checkpoint.

    openai-whisper ships a hand-derived (layer, head) mask per official
    checkpoint; converted or fine-tuned weights have none.  This decodes
    one calibration recording, scores every cross-attention head by the
    probability mass it puts on its own monotonic DTW path
    (align.calibrate_alignment_heads), prints the winning pairs, and (with
    --write) stores them into the .npz sidecar so word_timestamps=True
    uses them automatically.
    """
    import dataclasses

    import numpy as np

    from .models.whisper import align, convert
    from .pipeline import ingest
    from .pipeline.transcribe import CHUNK_SAMPLES, Transcriber

    # weights_dtype=None: --write re-saves the .npz, and the default
    # compute-dtype cast would round the stored f32 weights to bf16
    t = Transcriber.from_npz(args.checkpoint, weights_dtype=None)
    audio = ingest.load_audio(args.audio)
    states = t._frontend_encode(t.params, t._chunk_slab(audio, [0], 1))
    result = t._run_decode(states)
    tokens = np.array(result.tokens)[:1]
    # calibrate under the SAME sot prefix serving aligns with (the mask
    # must score the maps word_timestamps will actually serve)
    lang = t._active_language if t._active_language is not None else t.language
    pairs = align.calibrate_alignment_heads(
        t.params, t.cfg, states[:1], tokens, t.special, top_k=args.top_k,
        sot_sequence=t._sot_seq(lang),
    )
    print(json.dumps({"alignment_heads": [list(p) for p in pairs]}))
    if args.write:
        cfg2 = dataclasses.replace(t.cfg, alignment_heads=pairs)
        # keep the embedded vocab through the rewrite (read BEFORE savez
        # truncates the file)
        embedded = convert.load_tokenizer(args.checkpoint)
        convert.save_params(args.checkpoint, t.params, cfg2, tokenizer=embedded)
        print(f"wrote alignment heads into {args.checkpoint}", file=sys.stderr)


def cmd_detect_language(args) -> None:
    """openai's model.detect_language on the first 30 s of a file."""
    from .pipeline import ingest
    from .pipeline.transcribe import Transcriber

    t = (
        Transcriber.from_npz(args.model_path, tokenizer_path=args.tokenizer)
        if args.model_path
        else Transcriber.random_init(args.model)
    )
    audio = ingest.load_audio(args.audio)
    out = t.detect_language(audio)
    if args.json:
        top = dict(list(out["probabilities"].items())[:10])
        print(json.dumps({"language": out["language"],
                          "probabilities": top}, indent=2))
    else:
        print(out["language"])
        for code, prob in list(out["probabilities"].items())[:5]:
            print(f"  {code}: {prob:.3f}", file=sys.stderr)


def cmd_wer(args) -> None:
    from .utils.metrics import word_error_rate

    with open(args.reference) as f:
        ref = f.read()
    with open(args.hypothesis) as f:
        hyp = f.read()
    print(f"WER: {word_error_rate(ref, hyp):.4f}")


def cmd_der(args) -> None:
    """DER between two turn-list JSON files (`cli diarize --json` shape),
    with the NIST miss/false-alarm/confusion decomposition — a single DER
    number hides HOW the diarizer fails."""
    from .utils.metrics import diarization_error_rate_detailed

    with open(args.reference) as f:
        ref = json.load(f)
    with open(args.hypothesis) as f:
        hyp = json.load(f)
    d = diarization_error_rate_detailed(ref, hyp, collar_s=args.collar)
    print(
        f"DER: {d['der']:.4f} (miss {d['miss']:.4f}, false alarm "
        f"{d['false_alarm']:.4f}, confusion {d['confusion']:.4f}; "
        f"{d['hyp_speakers']} hyp vs {d['ref_speakers']} ref speakers)"
    )


def main(argv: list[str] | None = None) -> None:
    # Honor JAX_PLATFORMS=cpu (same escape hatch as serve.py/bench.py): a
    # sitecustomize may force-select the TPU backend via jax.config, which
    # silently overrides the env var — CPU-only boxes (or a box whose TPU
    # transport is down) need the config re-set before the first jax call.
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        try:
            import jax

            jax.config.update("jax_platforms", "cpu")
        except Exception:  # noqa: BLE001 — jax absent is its own error later
            pass
    ap = argparse.ArgumentParser(prog="audio_processor_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("transcribe", help="transcribe an audio file")
    t.add_argument("audio", nargs="+",
                   help="audio file(s); several inputs need --output-dir "
                   "(openai's multi-file CLI form)")
    t.add_argument("--output-dir", dest="output_dir",
                   help="write <stem>.<fmt> files here instead of stdout "
                   "(openai's output_dir)")
    t.add_argument("--model", default="tiny")
    t.add_argument("--model-path", help=".npz converted checkpoint")
    t.add_argument("--tokenizer", help="tokenizer asset (tiktoken rank file "
                   "or HF vocab.json) overriding the checkpoint's embedded "
                   "vocab / APTPU_TOKENIZER_PATH")
    t.add_argument("--keep-silence", action="store_true")
    t.add_argument("--verbose", action="store_true",
                   help="stream segments to stderr as decode windows land "
                   "(openai's verbose=True live print)")
    t.add_argument("--json", action="store_true")
    t.add_argument("--language", help="ISO code (e.g. en, zh); default: auto-detect")
    t.add_argument("--beam", type=int, default=0, help="beam size (0 = greedy)")
    t.add_argument("--temperature", type=float, default=0.0,
                   help="decode temperature (0 = deterministic; >0 samples "
                   "from the start).  As in openai's CLI, the retry ladder "
                   "climbs from here in --temperature-increment-on-fallback "
                   "steps (default 0.2)")
    t.add_argument("--length-penalty", dest="length_penalty", type=float,
                   default=None,
                   help="beam ranking normalisation exponent (Google-NMT "
                   "form; default: plain average logprob, as openai)")
    t.add_argument("--temperature-increment-on-fallback",
                   dest="temperature_increment_on_fallback",
                   type=_optional_float, default=_KEEP, metavar="INC",
                   help="retry-ladder step from --temperature up to 1.0 "
                   "(openai's temperature_increment_on_fallback; default "
                   "0.2; 'None' = a single decode, no retries)")
    t.add_argument("--compression-ratio-threshold",
                   dest="compression_ratio_threshold",
                   type=_optional_float, default=_KEEP, metavar="R",
                   help="treat the decode as failed if the zlib compression "
                   "ratio of its text exceeds this (openai's "
                   "compression_ratio_threshold; default 2.4; 'None' = off)")
    t.add_argument("--logprob-threshold", dest="logprob_threshold",
                   type=_optional_float, default=_KEEP, metavar="LP",
                   help="treat the decode as failed if its average logprob "
                   "is below this (openai's logprob_threshold; default "
                   "-1.0; 'None' = off)")
    t.add_argument("--no-speech-threshold", dest="no_speech_threshold",
                   type=_optional_float, default=_KEEP, metavar="P",
                   help="mark a window silent when P(<|nospeech|>) exceeds "
                   "this and the decode is unconfident (openai's "
                   "no_speech_threshold; default 0.6; 'None' = off)")
    t.add_argument("--suppress-tokens", dest="suppress_tokens", default=None,
                   help="comma-separated token ids to suppress; '-1' = the "
                   "default non-speech set (openai's suppress_tokens)")
    t.add_argument("--patience", type=float, default=None,
                   help="beam patience (finished-hypothesis multiplier, "
                   "openai's patience; default 1.0)")
    t.add_argument("--best-of", dest="best_of", type=int, default=None,
                   help="independent sampling candidates on T>0 fallback "
                   "rungs, best by avg logprob (openai's best_of; default 5)")
    t.add_argument("--word-timestamps", action="store_true")
    t.add_argument("--prepend-punctuations", dest="prepend_punctuations",
                   default=None,
                   help="characters merged into the FOLLOWING word "
                   "(openai's prepend_punctuations)")
    t.add_argument("--append-punctuations", dest="append_punctuations",
                   default=None,
                   help="characters merged into the PRECEDING word "
                   "(openai's append_punctuations)")
    t.add_argument("--highlight-words", dest="highlight_words",
                   action="store_true",
                   help="srt/vtt: one cue per word with the word "
                   "<u>underlined</u> (openai's highlight_words; needs "
                   "--word-timestamps)")
    t.add_argument("--max-line-width", dest="max_line_width", type=int,
                   default=None,
                   help="srt/vtt: max characters per subtitle line "
                   "(openai's max_line_width; needs --word-timestamps)")
    t.add_argument("--max-line-count", dest="max_line_count", type=int,
                   default=None,
                   help="srt/vtt: max lines per subtitle cue "
                   "(openai's max_line_count; needs --word-timestamps)")
    t.add_argument("--max-words-per-line", dest="max_words_per_line", type=int,
                   default=None,
                   help="srt/vtt: max words per line (openai's "
                   "max_words_per_line; no effect with --max-line-width)")
    t.add_argument(
        "--hallucination-silence-threshold", type=float, default=None,
        dest="hallucination_silence_threshold", metavar="SECONDS",
        help="drop anomalous segments next to silence longer than this "
        "(openai-whisper's hallucination_silence_threshold; needs "
        "--word-timestamps)",
    )
    t.add_argument("--task", choices=("transcribe", "translate"),
                   default="transcribe",
                   help="translate = X->English (whisper's task token)")
    t.add_argument("--initial-prompt", dest="initial_prompt",
                   help="text context for the first window "
                   "(openai-whisper's initial_prompt)")
    t.add_argument("--carry-initial-prompt", dest="carry_initial_prompt",
                   action="store_true",
                   help="re-prepend --initial-prompt to EVERY window's "
                   "context (openai-whisper's carry_initial_prompt)")
    t.add_argument("--prefix",
                   help="text the decode continues FROM (appended after "
                   "the sot sequence, excluded from the output — "
                   "openai-whisper's DecodingOptions.prefix)")
    t.add_argument("--without-timestamps", dest="without_timestamps",
                   action="store_true",
                   help="decode with <|notimestamps|>; each 30 s window "
                   "becomes one segment (openai's without_timestamps)")
    t.add_argument("--max-initial-timestamp", dest="max_initial_timestamp",
                   type=float, default=None, metavar="S",
                   help="cap on the first timestamp per window in seconds "
                   "(openai's max_initial_timestamp; default 1.0; -1 = "
                   "no cap)")
    t.add_argument("--output-format", dest="output_format",
                   choices=("text", "txt", "json", "srt", "vtt", "tsv", "all"),
                   default="text", help="output format (default: readable "
                   "text on stdout; 'all' writes every format, needs "
                   "--output-dir — openai's output_format)")
    t.add_argument("--clip-timestamps", dest="clip_timestamps",
                   help="comma-separated start,end second pairs to "
                   "transcribe within (openai-whisper's clip_timestamps; "
                   "a trailing lone start runs to the end)")
    t.add_argument(
        "--condition", action="store_true",
        help="condition each window on the previous window's text "
        "(openai-whisper's condition_on_previous_text; hybrid group mode)",
    )
    t.set_defaults(fn=cmd_transcribe)

    d = sub.add_parser("diarize", help="diarize an audio file")
    d.add_argument(
        "--segmentation-path", dest="segmentation_path",
        help="trained TPU-native segmentation .npz (from train-segmentation)",
    )
    d.add_argument("audio")
    d.add_argument("--json", action="store_true")
    d.add_argument(
        "--embedding-path", dest="embedding_path",
        help="trained speaker-embedding .npz (cli train-embedding)",
    )
    d.add_argument(
        "--min-cluster-size", dest="min_cluster_size", type=int, default=0,
        help="dissolve speaker clusters with fewer crops than this "
        "(pyannote-3.1's min_cluster_size; 0 = off)",
    )
    d.add_argument(
        "--num-speakers", dest="num_speakers", type=int,
        help="exact speaker count (pyannote's num_speakers; "
        "exclusive with --min/--max-speakers)",
    )
    d.add_argument("--min-speakers", dest="min_speakers", type=int,
                   help="lower bound on the speaker count")
    d.add_argument("--max-speakers", dest="max_speakers", type=int,
                   help="upper bound on the speaker count")
    d.set_defaults(fn=cmd_diarize)

    p = sub.add_parser("process", help="full meeting pipeline on a local file")
    p.add_argument("audio")
    p.add_argument("--model", default="tiny")
    p.add_argument("--model-path")
    p.add_argument("--tokenizer", help="tokenizer asset overriding the "
                   "checkpoint's embedded vocab")
    p.add_argument("--no-diarization", action="store_true")
    p.set_defaults(fn=cmd_process)

    s = sub.add_parser(
        "stream",
        help="streaming transcription: segments print as windows complete",
    )
    s.add_argument("audio")
    s.add_argument("--model", default="tiny")
    s.add_argument("--model-path", help=".npz converted checkpoint")
    s.add_argument("--tokenizer", help="tokenizer asset override")
    s.add_argument("--language", help="ISO code; default auto-detect")
    s.add_argument("--block-s", dest="block_s", type=float, default=1.0,
                   help="feed block size in seconds (default 1.0)")
    s.add_argument("--realtime", action="store_true",
                   help="pace the feed at 1x (live-microphone demo)")
    s.add_argument("--partial-step-s", dest="partial_step_s", type=float,
                   default=0.0,
                   help="low-latency mode: re-decode the growing window "
                   "every N seconds and emit segments once two consecutive "
                   "decodes agree (local-agreement streaming; 0 = emit at "
                   "window completion only)")
    s.set_defaults(fn=cmd_stream)

    c = sub.add_parser(
        "convert-whisper",
        help="openai .pt OR HF checkpoint dir (torch-free) -> native .npz",
    )
    c.add_argument("checkpoint", help="openai .pt file, or a HF Whisper "
                   "checkpoint directory (config.json + model.safetensors; "
                   "converted without torch)")
    c.add_argument("out")
    c.add_argument("--tokenizer", help="embed this vocab (multilingual/"
                   "gpt2.tiktoken or HF vocab.json) into the .npz so "
                   "serving needs no separate asset")
    c.set_defaults(fn=cmd_convert_whisper)

    cd = sub.add_parser("convert-diarizer", help="pyannote+ResNet ckpts -> .npz")
    cd.add_argument("segmentation", help="pyannote PyanNet checkpoint (.ckpt/.pt)")
    cd.add_argument("embedding", help="ResNet34 embedding checkpoint (.pt)")
    cd.add_argument("out")
    cd.set_defaults(fn=cmd_convert_diarizer)

    ft = sub.add_parser(
        "finetune-whisper",
        help="fine-tune Whisper on a jsonl manifest of {audio, text} pairs",
    )
    ft.add_argument("manifest", help="jsonl: {\"audio\": path, \"text\": str}")
    ft.add_argument("--model", default="tiny")
    ft.add_argument("--model-path", help="start from a converted .npz")
    ft.add_argument("--tokenizer", help="tokenizer asset for the training "
                    "text (default: the checkpoint's embedded vocab)")
    ft.add_argument("--language", help="ISO code pinned into the sot sequence")
    ft.add_argument("--steps", type=int, default=200)
    ft.add_argument("--batch", type=int, default=8)
    ft.add_argument("--lr", type=float, default=1e-4)
    ft.add_argument("--max-tokens", type=int, default=128, dest="max_tokens")
    ft.add_argument("--seed", type=int, default=0)
    ft.add_argument("--out", help="save fine-tuned params to this .npz")
    ft.set_defaults(fn=cmd_finetune_whisper)

    ts = sub.add_parser(
        "train-segmentation",
        help="train the TPU-native segmentation net (powerset loss)",
    )
    ts.add_argument("--steps", type=int, default=100)
    ts.add_argument("--batch", type=int, default=8)
    ts.add_argument("--lr", type=float, default=1e-3)
    ts.add_argument("--window-s", type=float, default=10.0, dest="window_s")
    ts.add_argument("--seed", type=int, default=0)
    ts.add_argument("--out", help="save trained params to this .npz")
    ts.set_defaults(fn=cmd_train_segmentation)

    te = sub.add_parser(
        "train-embedding",
        help="train the speaker-embedding net (AAM-softmax, synthetic speakers)",
    )
    te.add_argument("--steps", type=int, default=100)
    te.add_argument("--batch", type=int, default=16)
    te.add_argument("--lr", type=float, default=1e-3)
    te.add_argument("--speakers", type=int, default=8)
    te.add_argument("--crop-s", type=float, default=3.0, dest="crop_s")
    te.add_argument("--seed", type=int, default=0)
    te.add_argument("--out", help="save trained params to this .npz")
    te.set_defaults(fn=cmd_train_embedding)

    ch = sub.add_parser(
        "calibrate-alignment-heads",
        help="measure + store a word-timestamp head mask for a checkpoint",
    )
    ch.add_argument("checkpoint", help="converted .npz checkpoint")
    ch.add_argument("audio", help="calibration recording (speech)")
    ch.add_argument("--top-k", type=int, default=6)
    ch.add_argument(
        "--write", action="store_true",
        help="store the mask into the checkpoint's sidecar",
    )
    ch.set_defaults(fn=cmd_calibrate_alignment_heads)

    dl = sub.add_parser(
        "detect-language",
        help="detect the spoken language of the first 30 s "
        "(openai's model.detect_language)",
    )
    dl.add_argument("audio")
    dl.add_argument("--model", default="tiny")
    dl.add_argument("--model-path", dest="model_path")
    dl.add_argument("--tokenizer")
    dl.add_argument("--json", action="store_true")
    dl.set_defaults(fn=cmd_detect_language)

    w = sub.add_parser("wer", help="word error rate between two text files")
    w.add_argument("reference")
    w.add_argument("hypothesis")
    w.set_defaults(fn=cmd_wer)

    de = sub.add_parser(
        "der",
        help="diarization error rate between two turn-list JSON files "
        "(the `diarize --json` shape; NIST collar protocol)",
    )
    de.add_argument("reference")
    de.add_argument("hypothesis")
    de.add_argument("--collar", type=float, default=0.25,
                    help="seconds excluded around reference boundaries")
    de.set_defaults(fn=cmd_der)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
