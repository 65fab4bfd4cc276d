"""CLI smoke tests (in-process, CPU)."""
import json

import numpy as np
import pytest

from audio_processor_tpu import cli
from audio_processor_tpu.utils import wavio


@pytest.fixture
def wav(tmp_path, rng):
    sr = 16000
    t = np.arange(6 * sr) / sr
    x = (0.3 * np.sin(2 * np.pi * 220 * t) + rng.normal(0, 0.01, len(t))).astype(
        np.float32
    )
    p = str(tmp_path / "c.wav")
    wavio.write_wav(p, x, sr)
    return p


def test_cli_wer(tmp_path, capsys):
    r = tmp_path / "ref.txt"
    h = tmp_path / "hyp.txt"
    r.write_text("the quick brown fox")
    h.write_text("the quick brown dog")
    cli.main(["wer", str(r), str(h)])
    out = capsys.readouterr().out
    assert "WER: 0.25" in out


def test_cli_der(tmp_path, capsys):
    ref = [{"start": 0.0, "end": 2.0, "speaker": "SPEAKER_00"},
           {"start": 2.0, "end": 4.0, "speaker": "SPEAKER_01"}]
    hyp = [{"start": 0.0, "end": 2.0, "speaker": "A"},
           {"start": 2.0, "end": 4.0, "speaker": "B"}]
    r = tmp_path / "ref.json"
    h = tmp_path / "hyp.json"
    r.write_text(json.dumps(ref))
    h.write_text(json.dumps(hyp))
    cli.main(["der", str(r), str(h)])
    out = capsys.readouterr().out
    assert "DER: 0.0000" in out


def test_cli_transcribe_json(wav, capsys):
    cli.main(["transcribe", wav, "--model", "test", "--json", "--keep-silence"])
    out = json.loads(capsys.readouterr().out)
    assert set(out) >= {"text", "segments", "duration"}
    assert out["duration"] == pytest.approx(6.0, abs=0.05)


def test_cli_transcribe_verbose_streams_segments(wav, capsys):
    """--verbose streams openai-style [HH:MM:SS.mmm --> ...] lines to
    stderr as windows land, alongside the normal stdout output."""
    cli.main(["transcribe", wav, "--model", "test", "--json",
              "--keep-silence", "--verbose"])
    cap = capsys.readouterr()
    out = json.loads(cap.out)
    import re

    lines = [l for l in cap.err.splitlines()
             if re.match(r"\[\d\d:\d\d:\d\d\.\d\d\d --> ", l)]
    assert len(lines) == len(out["segments"])


def test_cli_unknown_command_fails():
    with pytest.raises(SystemExit):
        cli.main(["nope"])


def test_cli_calibrate_alignment_heads(wav, tmp_path, capsys):
    """Measures a head mask from a recording and writes it into the .npz
    sidecar; a reload must carry the mask."""
    import jax

    from audio_processor_tpu.models.whisper import convert, model
    from audio_processor_tpu.models.whisper.config import get_config

    cfg = get_config("test")
    params = model.init_params(cfg, jax.random.PRNGKey(0))
    ck = str(tmp_path / "ck.npz")
    convert.save_params(ck, params, cfg)

    cli.main(["calibrate-alignment-heads", ck, wav, "--top-k", "2", "--write"])
    out = json.loads(capsys.readouterr().out)
    assert len(out["alignment_heads"]) == 2
    _, cfg2 = convert.load_params(ck)
    assert cfg2.alignment_heads == tuple(
        tuple(p) for p in out["alignment_heads"]
    )


def test_cli_transcribe_srt_output(wav, capsys):
    cli.main(["transcribe", wav, "--model", "test", "--keep-silence",
              "--output-format", "srt"])
    out = capsys.readouterr().out
    # valid SRT skeleton even when random weights produce empty/garbage text
    if out.strip():
        assert "-->" in out
        assert out.splitlines()[0].strip() == "1"


def test_cli_transcribe_initial_prompt_and_task_flags(wav, capsys):
    cli.main(["transcribe", wav, "--model", "tiny", "--keep-silence",
              "--task", "translate", "--initial-prompt", "Names: Ada, Linus",
              "--language", "en", "--json"])
    out = json.loads(capsys.readouterr().out)
    assert set(out) >= {"text", "segments", "duration"}


def test_cli_finetune_whisper(tmp_path, rng, capsys):
    """Train-to-serve loop for STT: manifest -> fine-tune -> reload."""
    sr = 16000
    manifest = tmp_path / "m.jsonl"
    lines = []
    for i, (f, text) in enumerate([(300, "alpha beta"), (700, "gamma delta")]):
        t = np.arange(2 * sr) / sr
        x = (0.4 * np.sin(2 * np.pi * f * t)).astype(np.float32)
        p = str(tmp_path / f"ft{i}.wav")
        wavio.write_wav(p, x, sr)
        lines.append(json.dumps({"audio": p, "text": text}))
    manifest.write_text("\n".join(lines))
    out = str(tmp_path / "ft.npz")
    cli.main(["finetune-whisper", str(manifest), "--model", "test",
              "--steps", "40", "--batch", "4", "--lr", "3e-3",
              "--max-tokens", "24", "--out", out])
    stdout = capsys.readouterr().out
    assert "loss" in stdout and "saved" in stdout
    first, last = stdout.split("loss ")[1].split(" over")[0].split(" -> ")
    assert float(last) < float(first)  # it actually learned something

    from audio_processor_tpu.pipeline.transcribe import Transcriber

    t2 = Transcriber.from_npz(out, max_new_tokens=4)
    from audio_processor_tpu.models.whisper.config import get_config

    ref = get_config("test")
    assert (t2.cfg.n_audio_state, t2.cfg.n_text_layer) == (
        ref.n_audio_state, ref.n_text_layer,
    )


def test_cli_train_embedding_then_serve(tmp_path, wav, capsys):
    """train-embedding -> .npz -> diarize --embedding-path serves it."""
    out = str(tmp_path / "emb.npz")
    cli.main(["train-embedding", "--steps", "3", "--batch", "4",
              "--speakers", "3", "--crop-s", "1.0", "--out", out])
    stdout = capsys.readouterr().out
    assert "aam loss" in stdout and "saved trained embedding" in stdout

    cli.main(["diarize", wav, "--json", "--embedding-path", out])
    turns = json.loads(capsys.readouterr().out)
    assert isinstance(turns, list)


def test_cli_stream_emits_segments(tmp_path, capsys):
    """`cli stream`: segments print incrementally as windows complete."""
    import wave

    import numpy as np

    from audio_processor_tpu import cli

    sr = 16_000
    path = str(tmp_path / "s.wav")
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        t = np.arange(4 * sr) / sr
        f.writeframes(
            (0.3 * np.sin(2 * np.pi * 350 * t) * 32767).astype(np.int16).tobytes()
        )
    cli.main(["stream", path, "--model", "test", "--block-s", "2.0"])
    out = capsys.readouterr().out
    # random weights: content is noise, but the streaming contract holds —
    # zero or more "[start – end] text" lines, all within the recording
    for line in out.splitlines():
        assert line.startswith("["), line


def test_cli_transcribe_new_decode_flags(wav, capsys):
    """--prefix / --without-timestamps / --max-initial-timestamp flow
    through to the Transcriber (openai DecodingOptions surface)."""
    cli.main([
        "transcribe", wav, "--model", "test", "--json", "--keep-silence",
        "--prefix", "so then", "--without-timestamps",
        "--max-initial-timestamp", "-1",
    ])
    out = json.loads(capsys.readouterr().out)
    assert "segments" in out
    for seg in out["segments"]:
        assert 0.0 <= seg["start"] <= seg["end"] <= 6.05


def test_cli_diarize_defaults_to_bundled(wav, capsys, monkeypatch):
    """No --segmentation-path -> the bundled synthetic-pretrained
    checkpoints (same default ladder as serving), not random weights."""
    from audio_processor_tpu.pipeline.diarize import Diarizer

    seen = {}
    orig = Diarizer.bundled.__func__

    def spy(cls, **kw):
        d = orig(cls, **kw)
        seen["d"] = d
        return d

    monkeypatch.setattr(Diarizer, "bundled", classmethod(spy))
    cli.main(["diarize", wav, "--json"])
    json.loads(capsys.readouterr().out)
    assert seen["d"] is not None
    assert seen["d"].provenance == "bundled-synthetic"


def test_cli_detect_language(wav, capsys):
    """detect-language prints an ISO code from the language token set."""
    cli.main(["detect-language", wav, "--model", "tiny", "--json"])
    out = json.loads(capsys.readouterr().out)
    from audio_processor_tpu.models.whisper.tokenizer import WHISPER_LANGUAGES

    assert out["language"] in WHISPER_LANGUAGES
    probs = out["probabilities"]
    assert 0 < len(probs) <= 10
    assert abs(sum(probs.values())) <= 1.0 + 1e-6


class _Captured(Exception):
    pass


def _capture_transcriber_kwargs(monkeypatch, argv):
    """Run `cli transcribe` just far enough to capture the Transcriber
    construction kwargs (no model build, no decode)."""
    from audio_processor_tpu.pipeline.transcribe import Transcriber

    seen = {}

    def spy(cls, *a, **kw):
        seen.update(kw)
        raise _Captured

    monkeypatch.setattr(
        Transcriber, "random_init", classmethod(spy), raising=True
    )
    with pytest.raises(_Captured):
        cli.main(["transcribe", "/nonexistent.wav", "--model", "test", *argv])
    return seen


def test_cli_threshold_flags_reach_transcriber(monkeypatch):
    """--compression-ratio-threshold / --logprob-threshold /
    --no-speech-threshold: floats pass through, the literal 'None'
    disables the check (openai's optional_float CLI form)."""
    kw = _capture_transcriber_kwargs(monkeypatch, [
        "--compression-ratio-threshold", "3.0",
        "--logprob-threshold", "None",
        "--no-speech-threshold", "0.5",
    ])
    assert kw["compression_ratio_threshold"] == 3.0
    assert kw["logprob_threshold"] is None
    assert kw["no_speech_threshold"] == 0.5
    # unset flags keep the Transcriber defaults (no key at all)
    kw = _capture_transcriber_kwargs(monkeypatch, [])
    for name in ("compression_ratio_threshold", "logprob_threshold",
                 "no_speech_threshold", "temperature_ladder"):
        assert name not in kw


def test_cli_temperature_increment_on_fallback(monkeypatch):
    """openai's temperature_increment_on_fallback builds the retry ladder
    (arange(temperature, 1.0, inc)); 'None' means a single decode."""
    kw = _capture_transcriber_kwargs(
        monkeypatch, ["--temperature-increment-on-fallback", "0.5"]
    )
    assert kw["temperature_ladder"] == (0.5, 1.0)
    kw = _capture_transcriber_kwargs(monkeypatch, [
        "--temperature", "0.4", "--temperature-increment-on-fallback", "0.3",
    ])
    assert kw["temperature_ladder"] == (0.7, 1.0)
    kw = _capture_transcriber_kwargs(
        monkeypatch, ["--temperature-increment-on-fallback", "None"]
    )
    assert kw["temperature_ladder"] == ()
    # openai's CLI defaults the increment to 0.2, so a bare nonzero
    # --temperature still retries up the ladder (unlike the API float form)
    kw = _capture_transcriber_kwargs(monkeypatch, ["--temperature", "0.4"])
    assert kw["temperature_ladder"] == (0.6, 0.8, 1.0)
    # a non-positive increment is an immediate CLI error, not a hang
    with pytest.raises(SystemExit):
        cli.main(["transcribe", "/nonexistent.wav", "--model", "test",
                  "--temperature-increment-on-fallback", "0"])


def test_cli_multi_file_output_dir(wav, tmp_path, capsys):
    """openai CLI form: several inputs + --output-dir writes
    <stem>.<fmt> per file; --output-format all emits every format."""
    out_dir = tmp_path / "outs"
    cli.main([
        "transcribe", wav, wav, "--model", "test", "--keep-silence",
        "--output-dir", str(out_dir), "--output-format", "all",
    ])
    stem = "c"  # wav fixture is c.wav
    for ext in ("txt", "srt", "vtt", "tsv", "json"):
        p = out_dir / f"{stem}.{ext}"
        assert p.exists() and p.stat().st_size >= 0
    data = json.loads((out_dir / f"{stem}.json").read_text())
    assert "segments" in data
    # multiple inputs without --output-dir is an instant error
    with pytest.raises(SystemExit):
        cli.main(["transcribe", wav, wav, "--model", "test"])
    # --output-format all without --output-dir too
    with pytest.raises(SystemExit):
        cli.main(["transcribe", wav, "--model", "test",
                  "--output-format", "all"])


def test_cli_multi_file_uses_batched_decode(wav, tmp_path, monkeypatch):
    """Several inputs ride ONE transcribe_batch call (shared decode
    slabs), not a per-file loop."""
    from audio_processor_tpu.pipeline.transcribe import Transcriber

    calls: list[int] = []
    orig = Transcriber.transcribe_batch

    def spy(self, audios, **kw):
        calls.append(len(audios))
        return orig(self, audios, **kw)

    monkeypatch.setattr(Transcriber, "transcribe_batch", spy)
    out_dir = tmp_path / "outs2"
    cli.main([
        "transcribe", wav, wav, wav, "--model", "test", "--keep-silence",
        "--output-dir", str(out_dir),
    ])
    assert calls == [3]
    assert (out_dir / "c.txt").exists()
