"""Golden-value parity tests for the STFT/mel front-end vs torch.stft (CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from roar_tpu.ops import (
    MelConfig,
    get_window,
    log_mel_spectrogram,
    mel_filterbank,
    stft_magnitude,
)

torch = pytest.importorskip("torch")


def _torch_stft_mag(x, n_fft, hop, win_length, window, center, exact_pad):
    xt = torch.tensor(np.asarray(x), dtype=torch.float32)
    if xt.ndim == 1:
        xt = xt[None]
    win = {
        "hann": torch.hann_window,
        "hamming": torch.hamming_window,
        "blackman": torch.blackman_window,
        "bartlett": torch.bartlett_window,
    }[window](win_length, periodic=False)
    if exact_pad:
        pad = (n_fft - hop) // 2
        xt = torch.nn.functional.pad(xt[:, None], (pad, pad), "reflect")[:, 0]
    out = torch.stft(
        xt,
        n_fft=n_fft,
        hop_length=hop,
        win_length=win_length,
        center=not exact_pad,
        window=win,
        return_complex=True,
    )
    return out.abs().numpy()


@pytest.mark.parametrize("window", ["hann", "hamming", "blackman", "bartlett"])
def test_window_matches_torch(window):
    fn = {
        "hann": torch.hann_window,
        "hamming": torch.hamming_window,
        "blackman": torch.blackman_window,
        "bartlett": torch.bartlett_window,
    }[window]
    ours = get_window(window, 1024)
    ref = fn(1024, periodic=False).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize(
    "n_fft,hop,win_length,center,exact_pad",
    [
        (1024, 256, 1024, True, False),
        (2048, 512, 2048, True, False),
        (1024, 256, 1024, False, True),
        (512, 128, 320, True, False),  # win_length < n_fft (zero-padded window)
    ],
)
def test_stft_magnitude_matches_torch(n_fft, hop, win_length, center, exact_pad):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 22050)).astype(np.float32)
    ours = np.asarray(
        stft_magnitude(
            jnp.asarray(x),
            n_fft=n_fft,
            hop_length=hop,
            win_length=win_length,
            window="hann",
            center=center,
            exact_pad=exact_pad,
        )
    )
    ref = _torch_stft_mag(x, n_fft, hop, win_length, "hann", center, exact_pad)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80, fmin=0, fmax=8000, norm="slaney")
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # Every filter has support, peaks are strictly increasing in frequency.
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()
    assert fb.sum(axis=1).min() > 0
    # Slaney norm: the area of each triangle is ~ constant in Hz terms:
    # sum(fb[i] * df) with df = sr/n_fft equals ~1.0 for interior filters.
    df = 22050 / 1024
    areas = fb.sum(axis=1) * df
    assert np.abs(areas[5:-5] - 1.0).max() < 0.2


def test_mel_filterbank_no_norm():
    fb = mel_filterbank(22050, 1024, 40, fmin=0, fmax=11025, norm=None)
    # Unnormalized triangles peak at 1.0 (where bin aligns well).
    assert fb.max() <= 1.0 + 1e-6
    assert fb.max() > 0.8


def test_log_mel_matches_reference_composition():
    """End-to-end log-mel vs a torch composition with the same filterbank.

    Uses the TTS preprocessor settings from fastpitch_22050_align.yaml:132-153
    (preemph null, normalize null, mag_power 1.0, log guard add 1e-5).
    """
    cfg = MelConfig(
        sample_rate=22050,
        n_window_size=2048,
        n_window_stride=512,
        n_fft=2048,
        nfilt=80,
        lowfreq=0,
        highfreq=8000,
        preemph=None,
        normalize=None,
        mag_power=1.0,
        log=True,
        log_zero_guard_type="add",
        log_zero_guard_value=1e-5,
        dither=0.0,
        pad_to=1,
    )
    rng = np.random.default_rng(1)
    t = np.arange(22050) / 22050
    x = (0.5 * np.sin(2 * np.pi * 440 * t) + 0.01 * rng.standard_normal(22050)).astype(
        np.float32
    )[None]
    lens = np.array([22050])
    mel, mel_len = log_mel_spectrogram(jnp.asarray(x), jnp.asarray(lens), cfg)
    mel = np.asarray(mel)

    ref_mag = _torch_stft_mag(x, 2048, 512, 2048, "hann", True, False)
    fb = mel_filterbank(22050, 2048, 80, 0, 8000, norm="slaney")
    ref = np.log(np.einsum("mf,bft->bmt", fb, ref_mag) + 1e-5)

    assert int(mel_len[0]) == ref.shape[-1]
    np.testing.assert_allclose(mel[..., : ref.shape[-1]], ref, atol=2e-3, rtol=1e-3)


def test_seq_len_formula():
    cfg = MelConfig(
        sample_rate=22050, n_window_size=2048, n_window_stride=512, n_fft=2048, pad_to=1
    )
    for n in [22050, 8192, 12345]:
        got = int(cfg.get_seq_len(np.array(n)))
        ref = int(
            torch.stft(
                torch.zeros(1, n),
                n_fft=2048,
                hop_length=512,
                win_length=2048,
                center=True,
                window=torch.hann_window(2048, periodic=False),
                return_complex=True,
            ).shape[-1]
        )
        assert got == ref


def test_preemphasis_and_masking():
    cfg = MelConfig(
        sample_rate=22050,
        n_window_size=1024,
        n_window_stride=256,
        n_fft=1024,
        nfilt=80,
        preemph=0.97,
        normalize=None,
        dither=0.0,
        pad_to=16,
    )
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 12000)).astype(np.float32)
    lens = np.array([12000, 6000])
    mel, seq_len = log_mel_spectrogram(jnp.asarray(x), jnp.asarray(lens), cfg)
    mel = np.asarray(mel)
    assert mel.shape[-1] % 16 == 0
    # Frames beyond each utterance's length are exactly pad_value.
    assert np.all(mel[1, :, int(seq_len[1]) :] == cfg.pad_value)
    assert not np.all(mel[1, :, : int(seq_len[1])] == cfg.pad_value)
