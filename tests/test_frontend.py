"""Golden tests for the audio frontend.

The log-mel contract is validated against transformers'
WhisperFeatureExtractor (pure numpy, available offline) — the same numbers
openai-whisper's torch implementation produces and the contract Whisper
checkpoints expect (SURVEY.md §7 stage 1).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from audio_processor_tpu.ops import frontend
from audio_processor_tpu.utils import wavio
from audio_processor_tpu.utils.timestamps import TimeMap, extract_date_from_filename, format_timestamp


def test_mel_filterbank_matches_transformers():
    from transformers.audio_utils import mel_filter_bank

    ref = mel_filter_bank(
        num_frequency_bins=201,
        num_mel_filters=80,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    )  # (201, 80)
    ours = frontend.mel_filterbank(80)  # (80, 201)
    np.testing.assert_allclose(ours.T, ref, atol=1e-6)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_log_mel_matches_whisper_feature_extractor(speech_like_audio, n_mels):
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=n_mels)
    ref = fe(
        speech_like_audio, sampling_rate=16000, return_tensors="np", padding="max_length"
    )["input_features"][0]  # (n_mels, 3000)

    audio = frontend.pad_or_trim(jnp.asarray(speech_like_audio))
    ours = np.asarray(frontend.log_mel_spectrogram(audio, n_mels=n_mels))

    assert ours.shape == ref.shape == (n_mels, 3000)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_log_mel_batched(speech_like_audio):
    audio = frontend.pad_or_trim(jnp.asarray(speech_like_audio))
    batch = jnp.stack([audio, audio * 0.5])
    out = frontend.log_mel_spectrogram(batch)
    assert out.shape == (2, 80, 3000)
    single = frontend.log_mel_spectrogram(audio)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(single), atol=1e-5)


def test_resample_downsample_tone():
    sr_in, sr_out = 48000, 16000
    t = np.arange(sr_in) / sr_in
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = np.asarray(frontend.resample(jnp.asarray(tone), sr_in, sr_out))
    assert abs(len(out) - sr_out) <= 1
    # compare against scipy's polyphase resampler away from the edges
    from scipy.signal import resample_poly

    ref = resample_poly(tone, 1, 3)
    m = min(len(out), len(ref))
    err = np.abs(out[1000 : m - 1000] - ref[1000 : m - 1000])
    assert err.max() < 5e-3


def test_resample_upsample_preserves_frequency():
    sr_in, sr_out = 8000, 16000
    t = np.arange(sr_in) / sr_in
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = np.asarray(frontend.resample(jnp.asarray(tone), sr_in, sr_out))
    spec = np.abs(np.fft.rfft(out[2000:14000] * np.hanning(12000)))
    peak_hz = np.argmax(spec) * sr_out / 12000
    assert abs(peak_hz - 440) < 5


def test_silence_mask_device_matches_numpy_twin():
    """The jnp silence_mask (device variant, static shapes for fused
    pipelines) agrees with the numpy twin the host trim uses."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    sr = 16000
    audio = np.zeros(4 * sr, dtype=np.float32)
    audio[sr : 2 * sr] = rng.normal(0, 0.3, sr)
    dev = np.asarray(frontend.silence_mask(jnp.asarray(audio), pad_frames=25))
    host = frontend._silence_keep_mask_np(audio, pad_frames=25)
    assert dev.shape == host.shape
    # boundary frames may differ by the framing offset; interiors agree
    agree = (dev == host).mean()
    assert agree > 0.97, agree


def test_native_dtw_matches_python_fallback(monkeypatch):
    from audio_processor_tpu.models.whisper import align
    from audio_processor_tpu.native import audio_io

    if not audio_io.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(1)
    m = rng.uniform(0.01, 1.0, (40, 200))
    native = align.dtw_path(m)
    monkeypatch.setattr(audio_io, "available", lambda: False)
    python = align.dtw_path(m)
    np.testing.assert_array_equal(native, python)


def test_trim_silence_removes_long_gaps():
    sr = 16000
    audio = np.zeros(6 * sr, dtype=np.float32)
    audio[sr : 2 * sr] = np.sin(2 * np.pi * 300 * np.arange(sr) / sr) * 0.5
    audio[4 * sr : 5 * sr] = np.sin(2 * np.pi * 300 * np.arange(sr) / sr) * 0.5
    trimmed, intervals = frontend.trim_silence_host(audio, sr)
    assert len(trimmed) < len(audio) * 0.75
    tm = TimeMap(intervals)
    # time 0 in the trimmed signal maps near the first speech onset
    assert 0.5 <= tm.to_original(0.0) <= 1.1
    # monotone mapping
    pts = [tm.to_original(x) for x in np.linspace(0, tm.trimmed_duration, 20)]
    assert all(b >= a - 1e-9 for a, b in zip(pts, pts[1:]))


def test_device_gather_matches_host_trim():
    """The on-device trim half (silence_mask -> mask_to_intervals ->
    gather_kept_intervals) must concatenate exactly the samples
    trim_silence_host keeps — the device-frontend bench variant
    (benchmarks/run_configs.py config 2) and the host path cut identical
    regions."""
    import jax.numpy as jnp

    sr = 16000
    rng = np.random.default_rng(7)
    audio = np.zeros(8 * sr, dtype=np.float32)
    for a, b in ((1.0, 2.2), (4.5, 5.1), (6.8, 7.4)):
        seg = np.arange(int((b - a) * sr)) / sr
        audio[int(a * sr): int(a * sr) + len(seg)] = (
            0.5 * np.sin(2 * np.pi * 280 * seg)
        )
    audio += rng.normal(0, 1e-4, len(audio)).astype(np.float32)

    trimmed, _ = frontend.trim_silence_host(audio, sr)

    mask = np.asarray(frontend.silence_mask(jnp.asarray(audio)))
    bounds = frontend.mask_to_intervals(mask, len(audio), min_gap_frames=100)
    assert bounds is not None
    lens = np.array([e - s for s, e in bounds], np.int64)
    n_kept = int(lens.sum())
    assert n_kept == len(trimmed)
    k_pad = 4  # pad the interval table like the bench does
    starts = np.full(k_pad, bounds[-1][0], np.int32)
    cum = np.full(k_pad, n_kept, np.int32)
    starts[: len(bounds)] = [s for s, _ in bounds]
    cum[: len(bounds)] = np.cumsum(lens)
    n_out = 1 << int(np.ceil(np.log2(n_kept + 1)))
    out = np.asarray(frontend.gather_kept_intervals(
        jnp.asarray(audio), jnp.asarray(starts), jnp.asarray(cum), n_out
    ))
    np.testing.assert_array_equal(out[:n_kept], trimmed)
    assert not out[n_kept:].any()


def test_wav_roundtrip(tmp_path, speech_like_audio):
    p = str(tmp_path / "x.wav")
    wavio.write_wav(p, speech_like_audio, 16000)
    back, rate = wavio.read_wav_mono(p)
    assert rate == 16000
    assert len(back) == len(speech_like_audio)
    np.testing.assert_allclose(back, speech_like_audio, atol=1.0 / 32000)


def test_wav_stereo_and_float(tmp_path, rng):
    import struct

    x = rng.normal(0, 0.1, (1000, 2)).astype(np.float32)
    p = str(tmp_path / "s.wav")
    wavio.write_wav(p, x, 22050)
    y, rate = wavio.read_wav(p)
    assert rate == 22050 and y.shape == (1000, 2)

    # float32 WAV written by hand
    payload = x[:, 0].astype("<f4").tobytes()
    header = b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
    header += b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 16000, 64000, 4, 32)
    header += b"data" + struct.pack("<I", len(payload))
    pf = str(tmp_path / "f.wav")
    with open(pf, "wb") as f:
        f.write(header + payload)
    z, rate = wavio.read_wav_mono(pf)
    np.testing.assert_allclose(z, x[:, 0], atol=1e-6)


def test_timestamp_utils():
    assert format_timestamp(0) == "00:00:00"
    assert format_timestamp(3661.4) == "01:01:01"
    assert extract_date_from_filename("REC_20250617_093000.m4a") == "2025-06-17"
    assert extract_date_from_filename("[2025-06-17] Standup.m4a") == "2025-06-17"
    assert extract_date_from_filename("meeting 2025-06-17 final.wav") == "2025-06-17"
    assert extract_date_from_filename("no date here.wav") is None


def test_resample_exact_output_length_upsampling():
    """Output must be exactly ceil(n * target/orig) even when up > 2*down
    (sub-8 kHz inputs used to come back a few samples short)."""
    rng = np.random.default_rng(0)
    for orig in (4000, 6000, 8000, 11025, 22050, 44100, 48000):
        n = 1000
        x = jnp.asarray(rng.normal(0, 0.1, n), jnp.float32)
        y = np.asarray(frontend.resample(x, orig, 16000))
        assert y.shape[-1] == -(-n * 16000 // orig), orig
        assert np.isfinite(y).all()
