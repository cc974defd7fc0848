"""SpecAugment, perturbations, STFT losses, concat datasets."""

import numpy as np

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
