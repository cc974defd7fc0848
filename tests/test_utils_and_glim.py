"""Utils layer + ISTFT/Griffin-Lim tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from roar_tpu.ops.griffin_lim import griffin_lim, istft
from roar_tpu.ops.spectrogram import stft_magnitude, _windowed_dft_matrix, _reflect_pad_1d, frame_signal
from roar_tpu.utils import AppState, NamedTimer, get_logger, log_once


def test_istft_roundtrip():
    """STFT -> ISTFT reconstructs the interior of the signal."""
    sr, n_fft, hop, win = 22050, 512, 128, 512
    t = np.arange(8192) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]

    basis = np.asarray(_windowed_dft_matrix(n_fft, win, "hann"))
    xp = np.asarray(_reflect_pad_1d(jnp.asarray(x), n_fft // 2))
    frames = np.asarray(frame_signal(jnp.asarray(xp), n_fft, hop))
    proj = frames @ basis
    nf = 1 + n_fft // 2
    re = np.swapaxes(proj[..., :nf], 1, 2)
    im = np.swapaxes(proj[..., nf:], 1, 2)

    y = np.asarray(istft(jnp.asarray(re), jnp.asarray(im), n_fft, hop, win, length=8192))
    inner = slice(n_fft, 8192 - n_fft)
    np.testing.assert_allclose(y[0, inner], x[0, inner], atol=1e-3)


def test_griffin_lim_recovers_tone():
    sr, n_fft, hop = 22050, 512, 128
    t = np.arange(4096) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]
    mag = stft_magnitude(jnp.asarray(x), n_fft, hop, n_fft, "hann", center=True)
    audio = np.asarray(griffin_lim(mag, n_iters=30, n_fft=n_fft, hop_length=hop))
    # dominant frequency of the reconstruction matches
    spec = np.abs(np.fft.rfft(audio[0, 512:3584]))
    peak_hz = spec.argmax() * sr / len(audio[0, 512:3584])
    assert abs(peak_hz - 440) < 15


def test_named_timer():
    timer = NamedTimer()
    timer.start("a")
    timer.stop("a")
    assert timer.get("a") >= 0
    assert "a" in timer.export()


def test_app_state_singleton():
    a, b = AppState(), AppState()
    assert a is b
    assert a.device_count >= 1
    assert a.global_rank == 0


def test_log_once(capsys):
    log_once("hello-unique-xyz")
    log_once("hello-unique-xyz")
    get_logger().info("direct")


def test_distributed_single_host():
    """initialize_distributed / gather_objects on one host: no coordinator
    probing, identity gather (utils/distributed.py:16-44 analogue)."""
    from roar_tpu.parallel.distributed import (
        gather_objects,
        initialize_distributed,
    )

    idx, count, devices = initialize_distributed()
    assert idx == 0 and count == 1 and devices >= 1
    out = gather_objects([{"a": 1}, "x"])
    assert out == [{"a": 1}, "x"]
    # main_rank filtering on a single host returns the list (rank 0)
    assert gather_objects([1, 2], main_rank=0) == [1, 2]


class TestCloudCache:
    def test_local_fetch_and_cache(self, tmp_path):
        from roar_tpu.utils.cloud import maybe_download_from_cloud

        src = tmp_path / "weights.bin"
        src.write_bytes(b"abc123")
        out = maybe_download_from_cloud(
            str(src), "weights.bin", subfolder="m", cache_dir=str(tmp_path / "cache")
        )
        assert out and open(out, "rb").read() == b"abc123"
        # cached: source removal doesn't matter
        src.unlink()
        again = maybe_download_from_cloud(
            str(src), "weights.bin", subfolder="m", cache_dir=str(tmp_path / "cache")
        )
        assert again == out

    def test_file_url_and_refresh(self, tmp_path):
        from roar_tpu.utils.cloud import maybe_download_from_cloud

        src = tmp_path / "a.txt"
        src.write_text("v1")
        cache = str(tmp_path / "c")
        out = maybe_download_from_cloud(f"file://{src}", "a.txt", cache_dir=cache)
        assert open(out).read() == "v1"
        src.write_text("v2")
        out2 = maybe_download_from_cloud(
            f"file://{src}", "a.txt", cache_dir=cache, refresh_cache=True
        )
        assert open(out2).read() == "v2"

    def test_failure_returns_empty(self, tmp_path):
        from roar_tpu.utils.cloud import maybe_download_from_cloud

        out = maybe_download_from_cloud(
            str(tmp_path / "missing.bin"), "missing.bin", cache_dir=str(tmp_path / "c")
        )
        assert out == ""
