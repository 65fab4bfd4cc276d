"""Native C++ audio module tests (skipped when no toolchain)."""
import numpy as np
import pytest

from audio_processor_tpu.utils import wavio

audio_io = pytest.importorskip("audio_processor_tpu.native.audio_io")

pytestmark = pytest.mark.skipif(
    not audio_io.available(), reason="native library not built (no g++?)"
)


def test_native_decode_resamples_to_16k(tmp_path):
    sr = 44100
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    wavio.write_wav(p, x, sr)
    y, rate = audio_io.decode(p, 16000)
    assert rate == 16000
    assert abs(len(y) - 16000) <= 1
    spec = np.abs(np.fft.rfft(y[1000:13000] * np.hanning(12000)))
    assert abs(np.argmax(spec) * 16000 / 12000 - 440) < 3


def test_native_matches_scipy_resampler(tmp_path):
    """Compare on band-limited content (filters legitimately differ near
    Nyquist: different kaiser beta / tap count than scipy's default)."""
    from scipy.signal import resample_poly

    t = np.arange(48000) / 48000
    x = sum(
        np.sin(2 * np.pi * f * t + i) for i, f in enumerate((220, 880, 2500, 5000))
    ).astype(np.float32)
    y = audio_io.resample(x, 48000, 16000)
    ref = resample_poly(x.astype(np.float64), 1, 3)
    m = min(len(y), len(ref))
    assert np.abs(y[500 : m - 500] - ref[500 : m - 500]).max() < 5e-3


def test_native_stereo_downmix_and_info(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.normal(0, 0.1, (16000, 2)).astype(np.float32)
    p = str(tmp_path / "s.wav")
    wavio.write_wav(p, x, 16000)
    info = audio_io.wav_info(p)
    assert info == {"sample_rate": 16000, "channels": 2, "bits": 16}
    y, _ = audio_io.decode(p, 16000)
    ref = x.mean(axis=1)
    assert np.abs(y - ref).max() < 1e-3


def test_native_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.wav")
    with open(p, "wb") as f:
        f.write(b"this is not a wav file at all, sorry")
    with pytest.raises(ValueError):
        audio_io.decode(p)


def test_ingest_uses_native_path(tmp_path):
    from audio_processor_tpu.pipeline import ingest

    x = np.sin(2 * np.pi * 300 * np.arange(22050) / 22050).astype(np.float32) * 0.4
    p = str(tmp_path / "i.wav")
    wavio.write_wav(p, x, 22050)
    y = ingest.load_audio(p)
    assert abs(len(y) - 16000) <= 2
    assert y.dtype == np.float32


def _raw_wav(sample_rate: int, n_samples: int = 64) -> bytes:
    """Hand-build a PCM16 mono WAV with an arbitrary (possibly hostile)
    header-declared sample rate."""
    import struct

    data = (np.zeros(n_samples, np.int16)).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate & 0xFFFFFFFF,
                      (sample_rate * 2) & 0xFFFFFFFF, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


@pytest.mark.parametrize("rate", [0, 0xFFFFFFFF, 10_000_000])
def test_native_rejects_hostile_sample_rates(tmp_path, rate):
    """sample_rate=0 used to SIGFPE (integer div-by-zero) inside the
    resampler, killing the whole server process; absurd rates allocated a
    multi-GB polyphase kernel. Both must now fail cleanly."""
    p = str(tmp_path / f"evil_{rate}.wav")
    with open(p, "wb") as f:
        f.write(_raw_wav(rate))
    with pytest.raises(ValueError):
        audio_io.decode(p)


def test_native_accepts_boundary_sample_rate(tmp_path):
    p = str(tmp_path / "hi.wav")
    with open(p, "wb") as f:
        f.write(_raw_wav(768_000, n_samples=768))
    y, rate = audio_io.decode(p, 16000)
    assert rate == 16000 and len(y) >= 1


def test_wavio_truncated_fmt_raises_valueerror(tmp_path):
    """A fmt chunk whose declared body runs past EOF must raise ValueError
    (not struct.error): ingest's decoder-fallback chain catches ValueError
    only, so any other type crashes the caller instead of falling through
    to the next decoder."""
    import struct

    # RIFF/WAVE, one junk chunk for padding, then a fmt header at EOF
    body = b"WAVE" + b"junk" + struct.pack("<I", 4) + b"\0\0\0\0"
    body += b"fmt " + struct.pack("<I", 16)  # declared 16-byte body, absent
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    p = str(tmp_path / "trunc.wav")
    with open(p, "wb") as f:
        f.write(blob)
    with pytest.raises(ValueError):
        wavio.read_wav(p)


def test_wav_out_size_matches_decode(tmp_path):
    """The header-only size query must agree with the full decode for
    resampled and passthrough rates (it replaces a second full decode)."""
    lib = audio_io._load()
    if lib is None or not hasattr(lib, "aptpu_wav_out_size"):
        pytest.skip("native library unavailable")
    for sr, n in [(22050, 22050), (16000, 12345), (8000, 777), (44100, 100)]:
        x = np.sin(2 * np.pi * 220 * np.arange(n) / sr).astype(np.float32)
        p = str(tmp_path / f"s{sr}_{n}.wav")
        wavio.write_wav(p, x, sr)
        y, _ = audio_io.decode(p, 16000)
        with open(p, "rb") as f:
            data = f.read()
        assert lib.aptpu_wav_out_size(data, len(data), 16000) == len(y)
