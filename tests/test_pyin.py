"""pYIN tests: behavioral F0 accuracy + an independent numpy/scipy oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from roar_tpu.ops.pyin import (
    PyinConfig,
    cumulative_mean_normalized_difference,
    frame_audio,
    observation_probs,
    parabolic_shifts,
    pyin,
    trough_probabilities,
    viterbi_decode,
    _beta_probs,
    _transition_matrix,
)

scipy_stats = pytest.importorskip("scipy.stats")


SMALL = PyinConfig(
    sample_rate=8000,
    fmin=80.0,
    fmax=400.0,
    frame_length=512,
    center=True,
)


def _sine(freq, sr, dur, amp=0.5):
    t = np.arange(int(sr * dur)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


# ---------------------------------------------------------------------------
# Behavioral tests
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_pyin_tracks_sine():
    cfg = SMALL
    f_true = 220.0
    x = _sine(f_true, cfg.sample_rate, 0.5)
    f0, voiced, vprob = pyin(jnp.asarray(x)[None], jnp.asarray([len(x)]), cfg)
    f0, voiced = np.asarray(f0)[0], np.asarray(voiced)[0]
    # Interior frames must be voiced and within half a bin (~0.6%) of truth.
    inner = slice(4, len(f0) - 4)
    assert voiced[inner].mean() > 0.95
    rel_err = np.abs(f0[inner][voiced[inner]] - f_true) / f_true
    assert np.median(rel_err) < 0.01


@pytest.mark.slow
def test_pyin_silence_is_unvoiced():
    cfg = SMALL
    x = np.zeros(4000, np.float32)
    f0, voiced, vprob = pyin(jnp.asarray(x)[None], jnp.asarray([len(x)]), cfg)
    assert not np.asarray(voiced).any()
    assert (np.asarray(f0) == cfg.fill_na).all()


@pytest.mark.slow
def test_pyin_mixed_voiced_unvoiced():
    cfg = SMALL
    sr = cfg.sample_rate
    rng = np.random.default_rng(0)
    x = np.concatenate(
        [
            np.zeros(2000, np.float32),
            _sine(150.0, sr, 0.5),
            (0.02 * rng.standard_normal(2000)).astype(np.float32),
        ]
    )
    f0, voiced, vprob = pyin(jnp.asarray(x)[None], jnp.asarray([len(x)]), cfg)
    f0, voiced = np.asarray(f0)[0], np.asarray(voiced)[0]
    hop = cfg.hop
    tone = slice((2000 + 4 * hop) // hop, (2000 + 4000 - 4 * hop) // hop)
    assert voiced[tone].mean() > 0.9
    assert np.abs(np.median(f0[tone][voiced[tone]]) - 150.0) < 5.0
    head = slice(0, 2000 // hop - 2)
    assert voiced[head].mean() < 0.3


@pytest.mark.slow
def test_pyin_batched_matches_single():
    cfg = SMALL
    x1 = _sine(196.0, cfg.sample_rate, 0.4)
    x2 = _sine(330.0, cfg.sample_rate, 0.25)
    max_len = max(len(x1), len(x2))
    batch = np.zeros((2, max_len), np.float32)
    batch[0, : len(x1)] = x1
    batch[1, : len(x2)] = x2
    lens = jnp.asarray([len(x1), len(x2)])
    f0_b, v_b, _ = pyin(jnp.asarray(batch), lens, cfg)

    f0_1, v_1, _ = pyin(jnp.asarray(x1)[None], jnp.asarray([len(x1)]), cfg)
    t1 = cfg.num_frames(len(x1))
    np.testing.assert_allclose(
        np.asarray(f0_b)[0, :t1], np.asarray(f0_1)[0, :t1], atol=1e-4
    )
    # Padded region of the shorter utterance is masked out.
    t2 = cfg.num_frames(len(x2))
    assert not np.asarray(v_b)[1, t2:].any()


@pytest.mark.slow
def test_pyin_variable_length_masking():
    cfg = SMALL
    x = _sine(110.0, cfg.sample_rate, 0.5)
    padded = np.concatenate([x, np.zeros(1000, np.float32)])
    f0, voiced, vprob = pyin(
        jnp.asarray(padded)[None], jnp.asarray([len(x)]), cfg
    )
    t_valid = cfg.num_frames(len(x))
    assert not np.asarray(voiced)[0, t_valid:].any()
    assert np.asarray(vprob)[0, t_valid:].sum() == 0


# ---------------------------------------------------------------------------
# Oracle tests (independent numpy/scipy implementation of each stage)
# ---------------------------------------------------------------------------


def _oracle_cmndf(frames, cfg):
    fl, w = cfg.frame_length, cfg.win
    out = []
    for x in frames:
        a = np.fft.rfft(x, fl)
        b = np.fft.rfft(x[w::-1], fl)
        acf = np.fft.irfft(a * b, fl)[w:]
        acf[np.abs(acf) < 1e-6] = 0
        cum = np.cumsum(x**2)
        energy = cum[w:] - cum[:-w]
        energy[np.abs(energy) < 1e-6] = 0
        d = energy[0] + energy - 2 * acf
        tau = np.arange(1, cfg.max_period + 1)
        cmean = np.cumsum(d[1 : cfg.max_period + 1]) / tau
        num = d[cfg.min_period : cfg.max_period + 1]
        den = cmean[cfg.min_period - 1 : cfg.max_period]
        out.append(num / (den + np.finfo(np.float32).tiny))
    return np.stack(out)


def _oracle_trough_probs(yin_row, cfg):
    """Single-frame trough prior with scipy.stats beta + boltzmann."""
    thresholds = np.linspace(0, 1, cfg.n_thresholds + 1)
    beta_probs = np.diff(scipy_stats.beta.cdf(thresholds, cfg.beta_a, cfg.beta_b))
    p = len(yin_row)
    is_trough = np.zeros(p, bool)
    is_trough[0] = yin_row[0] < yin_row[1]
    for i in range(1, p - 1):
        is_trough[i] = yin_row[i] < yin_row[i - 1] and yin_row[i] <= yin_row[i + 1]
    (idx,) = np.nonzero(is_trough)
    probs = np.zeros(p)
    if len(idx) == 0:
        return probs
    heights = yin_row[idx]
    below = heights[:, None] < thresholds[None, 1:]
    positions = np.cumsum(below, axis=0) - 1
    n_troughs = np.count_nonzero(below, axis=0)
    prior = scipy_stats.boltzmann.pmf(
        positions, cfg.boltzmann_parameter, np.maximum(n_troughs, 1)
    )
    prior[~below] = 0
    trough_probs = prior.dot(beta_probs)
    gmin = np.argmin(heights)
    n_empty = np.count_nonzero(~below[gmin, :])
    trough_probs[gmin] += cfg.no_trough_prob * beta_probs[:n_empty].sum()
    probs[idx] = trough_probs
    return probs


def test_cmndf_matches_oracle():
    cfg = SMALL
    rng = np.random.default_rng(1)
    x = (_sine(170, cfg.sample_rate, 0.3) + 0.05 * rng.standard_normal(2400)).astype(
        np.float32
    )
    frames = np.asarray(frame_audio(jnp.asarray(x)[None], cfg))[0]
    got = np.asarray(cumulative_mean_normalized_difference(jnp.asarray(frames), cfg))
    ref = _oracle_cmndf(frames.astype(np.float64), cfg)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)


def test_trough_probabilities_match_oracle():
    cfg = SMALL
    rng = np.random.default_rng(2)
    x = (_sine(170, cfg.sample_rate, 0.2) + 0.05 * rng.standard_normal(1600)).astype(
        np.float32
    )
    frames = frame_audio(jnp.asarray(x)[None], cfg)
    yin = cumulative_mean_normalized_difference(frames, cfg)[0]  # [T, P]
    got = np.asarray(trough_probabilities(yin, cfg))
    yin_np = np.asarray(yin).astype(np.float64)
    for t in range(yin_np.shape[0]):
        ref = _oracle_trough_probs(yin_np[t], cfg)
        np.testing.assert_allclose(got[t], ref, atol=2e-4)


@pytest.mark.slow
def test_observation_probs_sum_to_one():
    cfg = SMALL
    rng = np.random.default_rng(3)
    x = (_sine(200, cfg.sample_rate, 0.2) + 0.01 * rng.standard_normal(1600)).astype(
        np.float32
    )
    frames = frame_audio(jnp.asarray(x)[None], cfg)
    yin = cumulative_mean_normalized_difference(frames, cfg)
    probs = trough_probabilities(yin, cfg)
    shifts = parabolic_shifts(yin)
    t = yin.shape[1]
    obs, vprob = observation_probs(
        probs.reshape(t, -1), shifts.reshape(t, -1), cfg
    )
    obs = np.asarray(obs)
    vprob = np.asarray(vprob)
    # voiced mass == clipped sum of candidate probs; unvoiced fills the rest
    totals = obs[:, : cfg.n_pitch_bins].sum(-1) + obs[:, cfg.n_pitch_bins :].mean(
        -1
    ) * cfg.n_pitch_bins
    np.testing.assert_allclose(
        totals, np.clip(vprob, 0, 1) + (1 - vprob), atol=1e-4
    )


def test_viterbi_matches_bruteforce():
    rng = np.random.default_rng(4)
    b, t, n = 2, 12, 7
    log_obs = np.log(rng.random((b, t, n)).astype(np.float32) + 1e-3)
    trans = rng.random((n, n)) + 1e-3
    trans /= trans.sum(1, keepdims=True)
    log_trans = np.log(trans.astype(np.float32))
    init = rng.random(n) + 1e-3
    init /= init.sum()
    log_init = np.log(init.astype(np.float32))

    got = np.asarray(
        viterbi_decode(jnp.asarray(log_obs), jnp.asarray(log_trans), jnp.asarray(log_init))
    )

    # brute-force DP
    for bi in range(b):
        v = log_init + log_obs[bi, 0]
        ptr = np.zeros((t, n), np.int64)
        for ti in range(1, t):
            scores = v[:, None] + log_trans
            ptr[ti] = scores.argmax(0)
            v = scores.max(0) + log_obs[bi, ti]
        ref = np.zeros(t, np.int64)
        ref[-1] = v.argmax()
        for ti in range(t - 1, 0, -1):
            ref[ti - 1] = ptr[ti, ref[ti]]
        np.testing.assert_array_equal(got[bi], ref)


def test_static_tables():
    bp = _beta_probs(100, 2.0, 18.0)
    assert bp.shape == (100,)
    np.testing.assert_allclose(bp.sum(), 1.0, atol=1e-6)
    tm = _transition_matrix(30, 11, 0.01)
    assert tm.shape == (60, 60)
    np.testing.assert_allclose(tm.sum(1), 1.0, atol=1e-5)
    # switching mass: each half-row sums to 1-switch or switch
    np.testing.assert_allclose(tm[:30, :30].sum(1), 0.99, atol=1e-6)
    np.testing.assert_allclose(tm[:30, 30:].sum(1), 0.01, atol=1e-6)


def test_banded_viterbi_matches_dense():
    """Banded decode == dense decode with the explicit transition matrix."""
    import jax

    from roar_tpu.ops.pyin import banded_viterbi_decode

    cfg = SMALL
    rng = np.random.default_rng(7)
    n = cfg.n_pitch_bins
    b, t = 2, 18
    obs = rng.random((b, t, 2 * n)).astype(np.float32)
    obs /= obs.sum(-1, keepdims=True)
    log_obs_banded = np.where(obs > 0, np.log(np.maximum(obs, 1e-37)), -700.0)

    got = np.asarray(banded_viterbi_decode(jnp.asarray(log_obs_banded), cfg))

    trans = _transition_matrix(n, cfg.transition_width, cfg.switch_prob)
    log_trans = np.where(trans > 0, np.log(np.maximum(trans, 1e-37)), -1e30).astype(
        np.float32
    )
    init = np.full(2 * n, -1e30, np.float32)
    init[n:] = np.log(1.0 / n)
    ref = np.asarray(
        viterbi_decode(
            jnp.asarray(log_obs_banded), jnp.asarray(log_trans), jnp.asarray(init)
        )
    )
    assert (got == ref).mean() > 0.98  # identical up to float ties


@pytest.mark.slow
def test_cpu_reference_agrees_with_device():
    from roar_tpu.ops.pyin_reference import pyin_cpu

    cfg = SMALL
    rng = np.random.default_rng(8)
    x = (_sine(180.0, cfg.sample_rate, 0.4) + 0.02 * rng.standard_normal(3200)).astype(
        np.float32
    )
    f0_d, v_d, p_d = pyin(jnp.asarray(x)[None], jnp.asarray([len(x)]), cfg)
    f0_c, v_c, p_c = pyin_cpu(x, cfg)
    f0_d = np.asarray(f0_d)[0]
    v_d = np.asarray(v_d)[0]
    assert (v_d == v_c).mean() > 0.95
    both = v_d & v_c
    if both.any():
        rel = np.abs(f0_d[both] - f0_c[both]) / f0_c[both]
        assert np.median(rel) < 0.01


@pytest.mark.slow
def test_pallas_viterbi_matches_xla_interpret():
    """The Pallas banded-Viterbi kernel (interpret mode on CPU) decodes
    identically to the XLA scan implementation."""
    from roar_tpu.ops.pyin import banded_viterbi_decode
    from roar_tpu.ops.pyin_pallas import banded_viterbi_decode_pallas

    cfg = SMALL
    n = cfg.n_pitch_bins
    rng = np.random.default_rng(11)
    b, t = 2, 14
    obs = rng.random((b, t, 2 * n)).astype(np.float32)
    obs /= obs.sum(-1, keepdims=True)
    log_obs = jnp.asarray(np.where(obs > 0, np.log(np.maximum(obs, 1e-37)), -700.0))
    ref = np.asarray(banded_viterbi_decode(log_obs, cfg))
    got = np.asarray(banded_viterbi_decode_pallas(log_obs, cfg, interpret=True))
    np.testing.assert_array_equal(got, ref)


def _default_cfg() -> PyinConfig:
    """Realistic 22.05 kHz config (the shipped sup-data recipe)."""
    return PyinConfig(
        sample_rate=22050,
        fmin=65.40639132514966,
        fmax=2093.004522404789,
        frame_length=2048,
        center=True,
    )


class TestOptimizedKernels:
    """The MXU-shaped rewrites must match their reference formulations
    exactly (compact troughs vs dense; windowed-matmul bins vs scatter)."""

    def _yin_rows(self, seed=0, n=257):
        import numpy as np

        from roar_tpu.ops.pyin import (
            cumulative_mean_normalized_difference,
            frame_audio,
        )

        cfg = _default_cfg()
        rng = np.random.default_rng(seed)
        t = np.arange(22050) / 22050.0
        sine = 0.5 * np.sin(2 * np.pi * 220 * t)
        noise = 0.3 * rng.standard_normal(22050)
        audio = jnp.asarray(np.stack([sine, noise]).astype(np.float32))
        frames = frame_audio(audio, cfg)
        yin = cumulative_mean_normalized_difference(frames, cfg)
        return yin.reshape(-1, yin.shape[-1]), cfg

    @pytest.mark.slow
    def test_compact_troughs_match_dense(self):
        from roar_tpu.ops.pyin import (
            trough_probabilities,
            trough_probabilities_compact,
        )

        flat, cfg = self._yin_rows()
        dense = trough_probabilities(flat, cfg)
        compact = trough_probabilities_compact(flat, cfg, max_troughs=160)
        np.testing.assert_allclose(
            np.asarray(compact), np.asarray(dense), atol=1e-6
        )

    def test_structural_trough_bound(self):
        """Interior troughs need >=3 samples each plus the edge trough, so
        K=160 always covers the default period grid."""
        from roar_tpu.ops.pyin import frame_audio

        flat, cfg = self._yin_rows(seed=3)
        p = flat.shape[-1]
        assert p // 3 + 2 <= 160

    def test_bin_window_matmul_matches_scatter(self):
        from roar_tpu.ops.pyin import (
            _bin_window_tables,
            observation_probs,
            parabolic_shifts,
        )

        flat, cfg = self._yin_rows(seed=1)
        shifts = parabolic_shifts(flat)
        probs = jnp.exp(-jnp.clip(flat, 0.0, 10.0))
        obs, vp = observation_probs(probs, shifts, cfg)

        # brute-force scatter reference
        f, p = probs.shape
        n_bins = cfg.n_pitch_bins
        # fp32 throughout to match the device's rounding at .5 boundaries
        periods = (
            cfg.min_period + np.arange(p, dtype=np.float32)[None, :]
            + np.asarray(shifts, np.float32)
        )
        f0 = np.float32(cfg.sample_rate) / np.maximum(periods, np.float32(1e-6))
        bin_idx = np.float32(12 * cfg.n_bins_per_semitone) * np.log2(
            f0 / np.float32(cfg.fmin)
        )
        bin_idx = np.clip(np.round(bin_idx), 0, n_bins - 1).astype(int)
        voiced_ref = np.zeros((f, n_bins), np.float32)
        pr = np.asarray(probs)
        for i in range(f):
            for j in range(p):
                voiced_ref[i, bin_idx[i, j]] += pr[i, j]
        np.testing.assert_allclose(
            np.asarray(obs[:, :n_bins]), voiced_ref, atol=2e-4
        )

    def test_window_tables_cover_shift_range(self):
        from roar_tpu.ops.pyin import _bin_window_tables

        _, cfg = self._yin_rows()
        lo, width, smat = _bin_window_tables(cfg)
        n_bins = cfg.n_pitch_bins
        # every (period, shift) bin lands inside its window
        for shift in (-1.0, -0.5, 0.0, 0.5, 1.0):
            periods = cfg.min_period + np.arange(cfg.n_periods) + shift
            f0 = cfg.sample_rate / np.maximum(periods, 1e-6)
            b = np.clip(
                np.round(12 * cfg.n_bins_per_semitone * np.log2(f0 / cfg.fmin)),
                0, n_bins - 1,
            ).astype(int)
            w = b - lo
            assert (w >= 0).all() and (w < width).all(), shift

    def test_matmul_cmndf_matches_fft(self):
        """The lag-restricted DFT-matmul CMNDF equals the jnp.fft version."""
        import numpy as np

        from roar_tpu.ops.pyin import frame_audio

        cfg = _default_cfg()
        rng = np.random.default_rng(0)
        audio = jnp.asarray(rng.standard_normal((1, 22050)).astype(np.float32))
        frames = frame_audio(audio, cfg)
        from roar_tpu.ops.pyin import cumulative_mean_normalized_difference

        ours = cumulative_mean_normalized_difference(frames, cfg)

        fl, w = cfg.frame_length, cfg.win
        x = np.asarray(frames, np.float64)
        a = np.fft.rfft(x, n=fl, axis=-1)
        b = np.fft.rfft(np.flip(x[..., : w + 1], axis=-1), n=fl, axis=-1)
        acf = np.fft.irfft(a * b, n=fl, axis=-1)[..., w:]
        acf[np.abs(acf) < 1e-6] = 0.0
        cum = np.cumsum(np.square(x), axis=-1)
        energy = cum[..., w:] - cum[..., :-w]
        energy[np.abs(energy) < 1e-6] = 0.0
        d = energy[..., :1] + energy - 2.0 * acf
        tau = np.arange(1, cfg.max_period + 1)
        cmean = np.cumsum(d[..., 1 : cfg.max_period + 1], axis=-1) / tau
        num = d[..., cfg.min_period : cfg.max_period + 1]
        den = cmean[..., cfg.min_period - 1 : cfg.max_period]
        ref = num / (den + 1e-20)
        np.testing.assert_allclose(
            np.asarray(ours), ref, atol=2e-3, rtol=2e-3
        )


# ---------------------------------------------------------------------------
# Golden fixtures: ground truth from synthesis parameters, not from any pYIN
# implementation (closes the self-referential-oracle loophole — a shared
# misreading of the pYIN paper in ops/pyin.py AND ops/pyin_reference.py
# would still fail here).  Fixtures + generator: tests/fixtures/
# make_pyin_golden.py; tolerance table mirrored in DESIGN.md.
# ---------------------------------------------------------------------------

# clip -> (min voicing agreement, max voiced-F0 cents RMSE, max gross-error
# rate at >100 cents).  Static-pitch clips get the tight 10-cent bound (bin
# resolution is 10 cents); moving-pitch clips (sweep: 1600 cents/s, vibrato:
# ±50 cents at 5.5 Hz) get 50 cents — the 46 ms analysis window integrates a
# changing F0, so ~25-35 cents of "error" is window physics, not tracking.
# Measured (r3): mixed 2.3 / octave_bait 2.0 / sweep 32.7 / vibrato 23.5
# cents RMSE, 100% voicing agreement, zero gross errors — on BOTH paths.
GOLDEN_TOLERANCES = {
    "mixed": (0.95, 10.0, 0.02),
    "octave_bait": (0.95, 10.0, 0.02),  # an octave flip would be 1200 cents
    "sweep": (0.95, 50.0, 0.02),
    "vibrato": (0.95, 50.0, 0.02),
}


def _score_golden(name, f0, voiced, z):
    truth_f0, truth_v, sc = z[f"{name}_f0"], z[f"{name}_voiced"], z[f"{name}_score"]
    T = len(truth_f0)
    f0, voiced = np.asarray(f0)[:T], np.asarray(voiced)[:T]
    agree = float((voiced[sc] == truth_v[sc]).mean())
    both = sc & truth_v & voiced & (f0 > 0)
    assert both.any(), f"{name}: no scoreable voiced frames"
    cents = 1200.0 * np.log2(f0[both] / truth_f0[both])
    rmse = float(np.sqrt(np.mean(cents**2)))
    gross = float((np.abs(cents) > 100.0).mean())
    min_agree, max_rmse, max_gross = GOLDEN_TOLERANCES[name]
    assert agree >= min_agree, f"{name}: voicing agreement {agree:.3f} < {min_agree}"
    assert rmse <= max_rmse, f"{name}: voiced-F0 RMSE {rmse:.1f} cents > {max_rmse}"
    assert gross <= max_gross, f"{name}: gross-error rate {gross:.3f} > {max_gross}"


@pytest.mark.slow
def test_pyin_golden_fixtures():
    """Device pyin vs committed golden fixtures (production 22.05 kHz config,
    frame_length 2048 / hop 512 — the PitchFeaturizer shape, reference
    features.py:341-397). One batched call scores all four clips."""
    from pathlib import Path

    z = np.load(Path(__file__).parent / "fixtures" / "pyin_golden.npz")
    cfg = PyinConfig(
        sample_rate=int(z["sample_rate"]), frame_length=int(z["frame_length"])
    )
    names = [str(n) for n in z["names"]]
    maxlen = max(len(z[f"{n}_audio"]) for n in names)
    pad = int(np.ceil(maxlen / 4096)) * 4096
    buf = np.zeros((len(names), pad), np.float32)
    lens = []
    for i, n in enumerate(names):
        a = z[f"{n}_audio"]
        buf[i, : len(a)] = a
        lens.append(len(a))
    f0, voiced, _ = pyin(jnp.asarray(buf), jnp.asarray(lens), cfg)
    for i, n in enumerate(names):
        _score_golden(n, f0[i], voiced[i], z)


def test_pyin_cpu_reference_golden_fixtures():
    """The numpy CPU reference must clear the same synthesis-truth bars —
    it is the baseline bench.py times against, so its correctness needs
    evidence independent of the device path."""
    from pathlib import Path

    from roar_tpu.ops.pyin_reference import pyin_cpu

    z = np.load(Path(__file__).parent / "fixtures" / "pyin_golden.npz")
    cfg = PyinConfig(
        sample_rate=int(z["sample_rate"]), frame_length=int(z["frame_length"])
    )
    for n in [str(x) for x in z["names"]]:
        f0, voiced, _ = pyin_cpu(z[f"{n}_audio"], cfg)
        _score_golden(n, f0, voiced, z)
