"""SpecAugment, perturbations, STFT losses, concat datasets."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roar_tpu.data.concat_dataset import ConcatMapDataset, mixed_indices, sampling_probabilities
from roar_tpu.data.perturb import (
    AudioAugmentor,
    GainPerturbation,
    ShiftPerturbation,
    SpeedPerturbation,
    WhiteNoisePerturbation,
)
from roar_tpu.losses.stft_losses import (
    log_stft_magnitude_loss,
    masked_mae_loss,
    multi_resolution_mel_loss,
    multi_resolution_stft_loss,
    spectral_convergence_loss,
    time_domain_loss,
)
from roar_tpu.ops.spec_augment import spec_augment, spec_cutout


def test_spec_augment_masks_bands():
    rng = jax.random.PRNGKey(0)
    spec = jnp.ones((2, 40, 120))
    out = np.asarray(spec_augment(rng, spec, freq_masks=2, time_masks=2,
                                  freq_width=5, time_width=10, mask_value=0.0))
    assert out.shape == (2, 40, 120)
    assert (out == 0).any()  # something masked
    assert (out == 1).any()  # not everything masked
    # masked rows are full bands across time or full columns across freq
    zero_frac = (out == 0).mean()
    assert zero_frac < 0.6


def test_spec_cutout():
    rng = jax.random.PRNGKey(1)
    spec = jnp.ones((1, 30, 60))
    out = np.asarray(spec_cutout(rng, spec, rect_masks=3, rect_freq=5, rect_time=6))
    assert (out == 0).any() and (out == 1).any()


def test_perturbations():
    rng = np.random.default_rng(0)
    sr = 16000
    x = np.sin(2 * np.pi * 220 * np.arange(sr) / sr).astype(np.float32)
    y = SpeedPerturbation(0.9, 0.9, 0.05).perturb(x, sr, rng)
    assert len(y) > len(x)  # slower speech = longer audio
    g = GainPerturbation(6.0, 6.0).perturb(x, sr, rng)
    np.testing.assert_allclose(np.abs(g).max(), np.abs(x).max() * 10 ** 0.3, rtol=1e-3)
    s = ShiftPerturbation(5.0, 5.0).perturb(x, sr, rng)
    assert s.shape == x.shape and s[0] == 0.0
    n = WhiteNoisePerturbation(-50, -50).perturb(x, sr, rng)
    assert not np.allclose(n, x)

    aug = AudioAugmentor([(1.0, GainPerturbation(0.0, 0.0))])
    np.testing.assert_allclose(aug.perturb(x, sr), x, atol=1e-6)


def test_time_stretch_preserves_pitch():
    """Phase-vocoder stretch changes duration, not the dominant frequency
    (ref perturb.py:146-260)."""
    from roar_tpu.data.perturb import TimeStretchPerturbation

    rng = np.random.default_rng(0)
    sr, f0 = 16000, 440.0
    x = np.sin(2 * np.pi * f0 * np.arange(2 * sr) / sr).astype(np.float32)

    def dominant_freq(sig):
        spec = np.abs(np.fft.rfft(sig * np.hanning(len(sig))))
        return np.argmax(spec) * sr / len(sig)

    for rate in (0.8, 1.25):
        y = TimeStretchPerturbation(rate, rate, num_rates=1).perturb(x, sr, rng)
        assert abs(len(y) - len(x) / rate) <= 2, (rate, len(y))
        # analyze the interior (edges have vocoder transients)
        mid = y[len(y) // 4 : -len(y) // 4]
        assert abs(dominant_freq(mid) - f0) < 10.0, (rate, dominant_freq(mid))
    # identity rate short-circuits
    y = TimeStretchPerturbation(1.0, 1.0, num_rates=1).perturb(x, sr, rng)
    np.testing.assert_array_equal(y, x)


def test_silence_perturbation():
    from roar_tpu.data.perturb import SilencePerturbation

    rng = np.random.default_rng(0)
    sr = 16000
    x = np.ones(sr, np.float32)
    p = SilencePerturbation(0.5, 0.5, 0.25, 0.25)
    y = p.perturb(x, sr, rng)
    assert len(y) == sr + sr // 2 + sr // 4
    assert (y[: sr // 2] == 0).all() and (y[-sr // 4 :] == 0).all()
    assert p.max_augmentation_length(1.0) == 1.75


def test_impulse_perturbation(tmp_path):
    """Convolving with a pure delta-delayed RIR shifts the signal; with
    shift_impulse the delay is compensated (ref perturb.py:327-400)."""
    from roar_tpu.data import write_manifest, write_wav
    from roar_tpu.data.perturb import ImpulsePerturbation

    sr, delay = 16000, 100
    ir = np.zeros(sr // 4, np.float32)
    ir[delay] = 1.0
    p = tmp_path / "rir.wav"
    write_wav(str(p), ir, sr)
    man = tmp_path / "rir.json"
    write_manifest(man, [{"audio_filepath": str(p), "duration": 0.25, "text": ""}])

    rng = np.random.default_rng(0)
    x = np.sin(2 * np.pi * 200 * np.arange(sr) / sr).astype(np.float32)
    y = ImpulsePerturbation(str(man)).perturb(x, sr, rng)
    assert y.shape == x.shape
    # delayed copy, renormalized to unit peak
    ref = np.concatenate([np.zeros(delay, np.float32), x[:-delay]])
    np.testing.assert_allclose(y, ref / np.abs(ref).max(), atol=1e-4)
    # shift_impulse compensates the delay
    y2 = ImpulsePerturbation(str(man), shift_impulse=True).perturb(x, sr, rng)
    np.testing.assert_allclose(y2, x / np.abs(x).max(), atol=1e-4)


def test_rir_and_noise_perturbation(tmp_path):
    from roar_tpu.data import write_manifest, write_wav
    from roar_tpu.data.perturb import RirAndNoisePerturbation

    sr = 16000
    rng_np = np.random.default_rng(1)
    ir = np.zeros(400, np.float32)
    ir[0] = 1.0
    noise = 0.1 * rng_np.standard_normal(sr).astype(np.float32)
    paths = {}
    for name, sig, dur in (("rir", ir, 0.025), ("noise", noise, 1.0)):
        p = tmp_path / f"{name}.wav"
        write_wav(str(p), sig, sr)
        man = tmp_path / f"{name}.json"
        write_manifest(man, [{"audio_filepath": str(p), "duration": dur, "text": ""}])
        paths[name] = str(man)

    pert = RirAndNoisePerturbation(
        rir_manifest_path=paths["rir"], rir_prob=1.0,
        noise_manifest_paths=[paths["noise"]], min_snr_db=10, max_snr_db=10,
        bg_noise_manifest_paths=[paths["noise"]], bg_min_snr_db=20, bg_max_snr_db=20,
        max_duration=0.5, max_additions=2,
    )
    rng = np.random.default_rng(0)
    x = np.sin(2 * np.pi * 220 * np.arange(sr) / sr).astype(np.float32)
    y = pert.perturb(x, sr, rng)
    assert y.shape == x.shape and np.isfinite(y).all()
    assert not np.allclose(y, x)


def test_transcode_g711():
    """Native G.711 path: band-limits to telephone band (no sox needed)."""
    from roar_tpu.data.perturb import TranscodePerturbation

    rng = np.random.default_rng(0)
    sr = 16000
    t = np.arange(sr) / sr
    in_band = 0.5 * np.sin(2 * np.pi * 1000 * t)
    out_band = 0.5 * np.sin(2 * np.pi * 6000 * t)  # above 3.4 kHz cutoff
    x = (in_band + out_band).astype(np.float32)
    y = TranscodePerturbation(["g711"]).perturb(x, sr, rng)
    assert y.shape == x.shape
    spec = np.abs(np.fft.rfft(y))
    freqs = np.fft.rfftfreq(len(y), 1 / sr)
    e_in = spec[(freqs > 900) & (freqs < 1100)].max()
    e_out = spec[(freqs > 5900) & (freqs < 6100)].max()
    assert e_out < 0.05 * e_in, (e_in, e_out)  # 6 kHz component removed


def test_random_segment_perturbation():
    from roar_tpu.data.perturb import RandomSegmentPerturbation

    rng = np.random.default_rng(0)
    sr = 16000
    x = np.arange(sr, dtype=np.float32)
    y = RandomSegmentPerturbation(duration_sec=0.25).perturb(x, sr, rng)
    assert len(y) == sr // 4
    assert (np.diff(y) == 1).all()  # contiguous crop
    with pytest.raises(ValueError):
        RandomSegmentPerturbation(duration_sec=2.0).perturb(x, sr, rng)
    y = RandomSegmentPerturbation(duration_sec=2.0, pad_to_duration=True).perturb(x, sr, rng)
    assert len(y) == 2 * sr and (y[sr:] == 0).all()


def test_process_augmentations_registry():
    from roar_tpu.data.perturb import (
        AudioAugmentor,
        Perturbation,
        perturbation_types,
        process_augmentations,
        register_perturbation,
    )

    aug = process_augmentations(
        {
            "white_noise": {"prob": 1.0, "min_level": -60, "max_level": -60},
            "gain": {"prob": 0.5, "min_gain_dbfs": -3, "max_gain_dbfs": 3},
        }
    )
    assert isinstance(aug, AudioAugmentor)
    assert len(aug.perturbations) == 2
    assert aug.perturbations[0][0] == 1.0 and aug.perturbations[1][0] == 0.5
    x = np.zeros(1000, np.float32)
    assert not np.allclose(aug.perturb(x, 16000), x)  # white noise applied

    assert process_augmentations(None) is None
    assert process_augmentations(aug) is aug
    with pytest.raises(KeyError):
        process_augmentations({"nope": {}})
    with pytest.raises(ValueError):
        process_augmentations({"gain": {"prob": 2.0}})

    class MyPert(Perturbation):
        def perturb(self, samples, sample_rate, rng):
            return samples * 2

    register_perturbation("double_test", MyPert)
    try:
        aug2 = process_augmentations({"double_test": {"prob": 1.0}})
        np.testing.assert_allclose(aug2.perturb(np.ones(8, np.float32), 16000), 2.0)
        with pytest.raises(KeyError):
            register_perturbation("double_test", MyPert)
    finally:
        perturbation_types.pop("double_test", None)


def test_stft_losses_zero_for_identical():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    sc, mag = multi_resolution_stft_loss(a, a, resolutions=((512, 128, 512),))
    assert float(sc) < 1e-5 and float(mag) < 1e-5
    assert float(multi_resolution_mel_loss(a, a, 22050, n_mels=20,
                                           resolutions=((512, 128, 512),))) < 1e-5
    assert float(time_domain_loss(a, a)) == 0.0
    b = a + 0.5
    assert float(time_domain_loss(b, a)) > 0.4
    lens = jnp.asarray([4096, 2048])
    assert float(masked_mae_loss(b, a, lens)) > 0.4


def test_spectral_convergence_scale():
    rng = np.random.default_rng(3)
    y = jnp.abs(jnp.asarray(rng.standard_normal((1, 100, 50)).astype(np.float32)))
    assert float(spectral_convergence_loss(y, y)) == 0
    assert float(spectral_convergence_loss(jnp.zeros_like(y), y)) == 1.0
    assert float(log_stft_magnitude_loss(y, y)) == 0


class _FakeDS:
    def __init__(self, n, tag):
        self.n, self.tag = n, tag
        self.lengths = [float(i) for i in range(n)]

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return (self.tag, i)

    def collate(self, items):
        return items


def test_concat_dataset_and_mixing():
    ds = ConcatMapDataset([_FakeDS(5, "a"), _FakeDS(10, "b")])
    assert len(ds) == 15
    assert ds[0] == ("a", 0)
    assert ds[5] == ("b", 0)
    assert ds[14] == ("b", 9)
    assert len(ds.lengths) == 15

    p = sampling_probabilities([5, 10], technique="round-robin")
    np.testing.assert_allclose(p, [0.5, 0.5])
    p = sampling_probabilities([5, 10], technique="temperature", temperature=1.0)
    np.testing.assert_allclose(p, [1 / 3, 2 / 3])

    idx = mixed_indices([_FakeDS(5, "a"), _FakeDS(10, "b")], 1000,
                        technique="round-robin", seed=0)
    frac_a = (idx < 5).mean()
    assert 0.45 < frac_a < 0.55  # round-robin = equal probability
