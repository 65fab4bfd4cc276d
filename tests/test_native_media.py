"""Native in-process compressed-audio decode (m4a/AAC) tests.

The product's actual input format is .m4a Drive recordings (the reference
renames processed files to `[date] Title.m4a`, audio_processor.py:
1319-1326) — round-1 review flagged that those files couldn't be processed
at all in this image (no ffmpeg binary).  These tests fabricate REAL
AAC-LC .m4a fixtures with the module's own encoder and golden-test decode
against the WAV twin of the same signal.
"""
import numpy as np
import pytest

from audio_processor_tpu.utils import wavio

media = pytest.importorskip("audio_processor_tpu.native.media")

pytestmark = pytest.mark.skipif(
    not media.available(), reason="native media library not built (no libav dev?)"
)


def _twin(tmp_path, sr=44100, seconds=4):
    """The same signal as a WAV file and an AAC-LC .m4a file."""
    t = np.arange(seconds * sr) / sr
    x = (
        0.35 * np.sin(2 * np.pi * 440 * t)
        + 0.15 * np.sin(2 * np.pi * 1200 * t)
    ).astype(np.float32)
    wav = str(tmp_path / "twin.wav")
    m4a = str(tmp_path / "twin.m4a")
    wavio.write_wav(wav, x, sr)
    media.encode_m4a(x, sr, m4a)
    return wav, m4a


def _spectrum(y, n=32768, skip=4000):
    seg = y[skip : skip + n] * np.hanning(n)
    return np.abs(np.fft.rfft(seg))


def test_m4a_decode_matches_wav_twin(tmp_path):
    from audio_processor_tpu.pipeline import ingest

    wav, m4a = _twin(tmp_path)
    ref = ingest.load_audio(wav)      # native WAV path
    got = ingest.load_audio(m4a)      # native media (codec-library) path

    # AAC is lossy + adds ~1 frame of priming delay: compare duration
    # loosely and spectra tightly
    assert abs(len(got) - len(ref)) < 0.06 * 16000  # within 60 ms
    fr, fg = _spectrum(ref), _spectrum(got)
    assert abs(int(np.argmax(fr)) - int(np.argmax(fg))) <= 2  # same tone
    # both injected tones survive the codec
    for freq in (440, 1200):
        bin_ = int(round(freq * 32768 / 16000))
        assert fg[bin_ - 4 : bin_ + 5].max() > 0.1 * fg.max()
    # comparable energy
    assert np.sqrt(np.mean(got**2)) == pytest.approx(
        np.sqrt(np.mean(ref**2)), rel=0.15
    )


def test_media_info(tmp_path):
    _, m4a = _twin(tmp_path, seconds=2)
    info = media.media_info(m4a)
    assert info["codec"] == "aac"
    assert info["sample_rate"] == 44100
    assert info["channels"] == 1
    assert 1800 <= info["duration_ms"] <= 2300


def test_decode_rejects_garbage(tmp_path):
    p = str(tmp_path / "junk.m4a")
    with open(p, "wb") as f:
        f.write(b"\x00\x01not a real mp4 container" * 10)
    with pytest.raises(ValueError):
        media.decode(p)


def test_ingest_raises_cleanly_on_undecodable(tmp_path):
    from audio_processor_tpu.pipeline import ingest

    p = str(tmp_path / "junk.m4a")
    with open(p, "wb") as f:
        f.write(b"RIFFnope")
    with pytest.raises(ValueError):
        ingest.load_audio(p)


def test_transcriber_accepts_m4a(tmp_path):
    """End-to-end: the pipeline's own ingest feeds an .m4a into the model
    stack (the reference's primary use case)."""
    from audio_processor_tpu.pipeline import ingest
    from audio_processor_tpu.pipeline.transcribe import Transcriber

    _, m4a = _twin(tmp_path, seconds=3)
    audio = ingest.load_audio(m4a)
    tr = Transcriber.random_init("test", compute_dtype="float32", max_new_tokens=4)
    out = tr.transcribe(audio, remove_silence=False)
    assert out["duration"] == pytest.approx(len(audio) / 16000, abs=0.01)


def test_stereo_mp3_style_downmix(tmp_path):
    """Multi-channel input downmixes through the same path (encode mono
    only — exercise the decoder's channel handling via a stereo WAV decoded
    through the media library)."""
    sr = 22050
    t = np.arange(2 * sr) / sr
    left = 0.4 * np.sin(2 * np.pi * 300 * t)
    right = 0.4 * np.sin(2 * np.pi * 300 * t)
    x = np.stack([left, right], axis=1).astype(np.float32)
    wav = str(tmp_path / "st.wav")
    wavio.write_wav(wav, x, sr)
    y, rate = media.decode(wav, 16000)
    assert rate == 16000
    assert abs(len(y) - 32000) < 200
    spec = _spectrum(y, n=16384, skip=2000)
    assert abs(np.argmax(spec) * 16000 / 16384 - 300) < 4


def test_bounded_decode_max_samples(tmp_path):
    """max_samples stops the demux at the cap and the prefix matches the
    full decode sample-for-sample (detect_language's 30 s probe path)."""
    wav, m4a = _twin(tmp_path, seconds=6)
    full, _ = media.decode(m4a, 16_000)
    cap = 16_000  # 1 s
    part, _ = media.decode(m4a, 16_000, max_samples=cap)
    assert len(part) == cap
    np.testing.assert_array_equal(part, full[:cap])


def test_ingest_max_s_bounds_every_decoder(tmp_path):
    """ingest.load_audio(max_s=...) returns exactly the first max_s
    seconds for WAV (native + pure-Python) and compressed inputs."""
    from audio_processor_tpu.pipeline import ingest

    wav, m4a = _twin(tmp_path, seconds=6)
    for path in (wav, m4a):
        full = ingest.load_audio(path)
        part = ingest.load_audio(path, max_s=2.0)
        assert len(part) == 2 * 16_000
        # the final filter-width of samples may differ slightly: a capped
        # decode resamples WITHOUT future context past the cut
        np.testing.assert_array_equal(part[:-16], full[: 2 * 16_000 - 16])
        np.testing.assert_allclose(
            part[-16:], full[2 * 16_000 - 16 : 2 * 16_000], atol=5e-3
        )
    # pure-Python WAV reader slices the payload pre-conversion
    x, rate = wavio.read_wav_mono(wav, max_s=2.0)
    assert len(x) == 2 * 44_100
    x_full, _ = wavio.read_wav_mono(wav)
    np.testing.assert_array_equal(x, x_full[: 2 * 44_100])
