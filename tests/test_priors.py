"""Beta-binomial prior parity vs an independent torch.special.gammaln oracle."""

import numpy as np
import pytest

from roar_tpu.ops import BetaBinomialInterpolator, beta_binomial_prior, beta_binomial_prior_np

torch = pytest.importorskip("torch")


def _torch_prior(phoneme_count, mel_count, scaling=1.0):
    """Oracle implementing tts_dataset_utils.py:128-150 with torch."""
    from torch.special import gammaln

    x = torch.arange(0, phoneme_count, dtype=torch.float64)[None, :]
    y = torch.arange(1, mel_count + 1, dtype=torch.float64)[:, None]
    a = scaling * y
    b = scaling * (mel_count + 1 - y)
    n = torch.tensor(float(phoneme_count - 1), dtype=torch.float64)

    def logbeta(p, q):
        return gammaln(p) + gammaln(q) - gammaln(p + q)

    out = (
        gammaln(n + 1)
        - gammaln(x + 1)
        - gammaln(n - x + 1)
        + logbeta(x + a, n - x + b)
        - logbeta(a, b)
    )
    return out.exp().numpy()


@pytest.mark.parametrize("p,m", [(10, 37), (25, 100), (3, 5)])
def test_prior_matches_oracle(p, m):
    ref = _torch_prior(p, m)
    got = np.asarray(beta_binomial_prior(p, m))
    assert got.shape == (m, p)
    # device version runs fp32 gammaln — data-path parity is the fp64 numpy
    # twin below; the device prior is used only as a training-time prior.
    np.testing.assert_allclose(got, ref, atol=5e-3)
    got_np = beta_binomial_prior_np(p, m)
    np.testing.assert_allclose(got_np, ref, atol=1e-6)


def test_prior_rows_are_distributions():
    got = np.asarray(beta_binomial_prior(17, 63))
    np.testing.assert_allclose(got.sum(axis=1), 1.0, atol=5e-3)
    got_np = beta_binomial_prior_np(17, 63)
    np.testing.assert_allclose(got_np.sum(axis=1), 1.0, atol=1e-4)


def test_interpolator_shapes_and_mass():
    interp = BetaBinomialInterpolator()
    out = interp(137, 23)  # (mel_len, text_len)
    assert out.shape == (137, 23)
    assert out.min() >= 0
    # Ridge moves monotonically through the matrix.
    peaks = out.argmax(axis=1)
    assert peaks[0] <= 2 and peaks[-1] >= 20
    assert (np.diff(peaks) >= 0).all()
