"""Native C++ audio data plane tests (vs the Python/scipy reference)."""

import numpy as np
import pytest

from roar_tpu import native
from roar_tpu.data.audio import resample, trim_silence, write_wav


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native library unavailable (g++ missing?)")
    return native.get_lib()


def test_native_builds(lib):
    assert lib is not None


def test_wav_read_matches_scipy(lib, tmp_path):
    sr = 22050
    t = np.arange(sr) / sr
    x = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, sr)

    got, got_sr = native.read_wav_mono(p)
    assert got_sr == sr
    from scipy.io import wavfile

    ref_sr, ref = wavfile.read(p)
    ref = ref.astype(np.float32) / 32768.0
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_wav_info(lib, tmp_path):
    sr = 16000
    x = np.zeros(1234, np.float32)
    p = str(tmp_path / "b.wav")
    write_wav(p, x, sr)
    info = native.wav_info(p)
    assert info == (16000, 1, 1234)


def test_native_resample_tone(lib):
    sr_in, sr_out = 44100, 22050
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = native.resample_poly(x, 1, 2)
    assert y is not None
    assert abs(len(y) - sr_out) <= 2
    spec = np.abs(np.fft.rfft(y[1024:17408]))
    peak_hz = spec.argmax() * sr_out / 16384
    assert abs(peak_hz - 440) < 5
    # close to scipy's polyphase output away from edges
    ref = resample(x, sr_in, sr_out)
    n = min(len(y), len(ref))
    err = np.abs(y[256 : n - 256] - ref[256 : n - 256])
    assert np.median(err) < 2e-3


def test_native_upsample(lib):
    sr_in = 16000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 220 * t).astype(np.float32)
    y = native.resample_poly(x, 3, 2)  # 16k -> 24k
    assert y is not None
    assert abs(len(y) - 24000) <= 2
    spec = np.abs(np.fft.rfft(y[1024:17408]))
    peak_hz = spec.argmax() * 24000 / 16384
    assert abs(peak_hz - 220) < 5


def test_peak_normalize(lib):
    x = np.array([0.1, -0.5, 0.25], np.float32)
    y = native.peak_normalize(x.copy(), 1.0)
    np.testing.assert_allclose(np.abs(y).max(), 1.0, atol=1e-6)


def test_trim_bounds(lib):
    sr = 22050
    x = np.concatenate(
        [np.zeros(sr // 2), 0.5 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr), np.zeros(sr // 2)]
    ).astype(np.float32)
    s, e = native.trim_bounds(x, 2048, 512, 60.0)
    assert s > sr // 4
    assert e < len(x) - sr // 4
    assert e - s >= sr  # keeps the tone


def test_native_sanitize_self_test():
    """`make sanitize` builds the ASAN+UBSAN harness and runs it; any
    out-of-bounds/UB in the native data plane fails this test
    (SURVEY §5.2 build note)."""
    import shutil
    import subprocess
    from pathlib import Path

    if shutil.which("g++") is None:
        pytest.skip("g++ unavailable")
    native_dir = Path(__file__).resolve().parents[1] / "native"
    result = subprocess.run(
        ["make", "sanitize"], cwd=native_dir, capture_output=True, text=True,
        timeout=300,
    )
    assert result.returncode == 0, result.stdout[-2000:] + result.stderr[-2000:]
    assert "self-test OK" in result.stdout
