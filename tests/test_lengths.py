"""Length-regulation / feature-averaging parity vs torch oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roar_tpu.ops import (
    average_features,
    log_to_duration,
    mask_from_lens,
    rand_slice_segments,
    regulate_len,
    slice_segments,
)

torch = pytest.importorskip("torch")


def _torch_regulate_len(durations, enc_out, pace=1.0):
    """Oracle reproducing helpers.py:613-667 without group_size."""
    durations = torch.tensor(durations)
    enc_out = torch.tensor(enc_out)
    reps = durations.float() / pace
    reps = (reps + 0.5).floor().long()
    dec_lens = reps.sum(dim=1)
    max_len = int(dec_lens.max())
    reps_cumsum = torch.cumsum(
        torch.nn.functional.pad(reps, (1, 0, 0, 0), value=0.0), dim=1
    )[:, None, :].float()
    rng = torch.arange(max_len)[None, :, None]
    mult = (reps_cumsum[:, :, :-1] <= rng) & (reps_cumsum[:, :, 1:] > rng)
    enc_rep = torch.matmul(mult.float(), enc_out)
    return enc_rep.numpy(), dec_lens.numpy()


def _torch_average_features(pitch, durs):
    """Oracle reproducing modules/fastpitch.py:27-51."""
    pitch = torch.tensor(pitch)
    durs = torch.tensor(durs)
    durs_cums_ends = torch.cumsum(durs, dim=1).long()
    durs_cums_starts = torch.nn.functional.pad(durs_cums_ends[:, :-1], (1, 0))
    pitch_nonzero_cums = torch.nn.functional.pad(
        torch.cumsum(pitch != 0.0, dim=2), (1, 0)
    )
    pitch_cums = torch.nn.functional.pad(torch.cumsum(pitch, dim=2), (1, 0))
    bs, l = durs_cums_ends.size()
    n_formants = pitch.size(1)
    dcs = durs_cums_starts[:, None, :].expand(bs, n_formants, l)
    dce = durs_cums_ends[:, None, :].expand(bs, n_formants, l)
    sums = (torch.gather(pitch_cums, 2, dce) - torch.gather(pitch_cums, 2, dcs)).float()
    nelems = (
        torch.gather(pitch_nonzero_cums, 2, dce)
        - torch.gather(pitch_nonzero_cums, 2, dcs)
    ).float()
    return torch.where(nelems == 0.0, nelems, sums / nelems).numpy()


def test_regulate_len_matches_oracle():
    rng = np.random.default_rng(0)
    durs = rng.integers(0, 6, size=(3, 9)).astype(np.float32)
    enc = rng.standard_normal((3, 9, 4)).astype(np.float32)
    ref, ref_lens = _torch_regulate_len(durs, enc)
    got, got_lens = regulate_len(
        jnp.asarray(durs), jnp.asarray(enc), max_len=int(ref.shape[1])
    )
    np.testing.assert_array_equal(np.asarray(got_lens), ref_lens)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_regulate_len_pace_and_padding():
    rng = np.random.default_rng(1)
    durs = rng.integers(1, 5, size=(2, 6)).astype(np.float32)
    enc = rng.standard_normal((2, 6, 3)).astype(np.float32)
    ref, ref_lens = _torch_regulate_len(durs, enc, pace=1.3)
    max_len = int(ref.shape[1]) + 8  # pad beyond natural max: tail must be 0
    got, got_lens = regulate_len(jnp.asarray(durs), jnp.asarray(enc), pace=1.3, max_len=max_len)
    np.testing.assert_array_equal(np.asarray(got_lens), ref_lens)
    got = np.asarray(got)
    np.testing.assert_allclose(got[:, : ref.shape[1]], ref, atol=1e-5)
    assert np.all(got[0, ref_lens[0] :] == 0)


def test_average_features_matches_oracle():
    rng = np.random.default_rng(2)
    b, t_text, t_mel = 2, 7, 30
    durs = rng.integers(0, 7, size=(b, t_text))
    # Pad durations so cumsum stays within t_mel.
    durs = np.minimum(durs, 5).astype(np.int64)
    pitch = rng.standard_normal((b, 1, t_mel)).astype(np.float32)
    pitch[pitch < -0.5] = 0.0  # inject zeros to exercise nonzero-aware mean
    ref = _torch_average_features(pitch, durs)
    got = np.asarray(average_features(jnp.asarray(pitch), jnp.asarray(durs)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_log_to_duration():
    log_dur = jnp.asarray([[0.0, 1.0, 5.0]])
    mask = jnp.asarray([[True, True, False]])
    out = np.asarray(log_to_duration(log_dur, 0.0, 75.0, mask))
    np.testing.assert_allclose(out, [[0.0, np.e - 1.0, 0.0]], atol=1e-5)


def test_slice_segments():
    x = jnp.arange(2 * 3 * 10).reshape(2, 3, 10).astype(jnp.float32)
    segs = np.asarray(slice_segments(x, jnp.asarray([0, 4]), 4))
    np.testing.assert_array_equal(segs[0], np.asarray(x)[0, :, 0:4])
    np.testing.assert_array_equal(segs[1], np.asarray(x)[1, :, 4:8])


def test_rand_slice_segments_within_bounds():
    x = jnp.ones((4, 2, 100))
    lens = jnp.asarray([100, 50, 20, 10])
    segs, starts = rand_slice_segments(jax.random.PRNGKey(0), x, lens, segment_size=8)
    assert segs.shape == (4, 2, 8)
    starts = np.asarray(starts)
    assert (starts >= 0).all()
    assert (starts <= np.asarray(lens) - 8 + 1).all()


def test_mask_from_lens():
    m = np.asarray(mask_from_lens(jnp.asarray([3, 1]), 4))
    np.testing.assert_array_equal(m, [[1, 1, 1, 0], [1, 0, 0, 0]])


def test_mask_sequence_tensor_ranks():
    """mask_sequence_tensor (ref helpers.py:852-876): zeros beyond lengths
    on the last axis for rank 2/3/4; rejects other ranks."""
    import pytest

    from roar_tpu.ops.lengths import mask_sequence_tensor

    lens = jnp.asarray([2, 3])
    for shape in [(2, 4), (2, 3, 4), (2, 3, 2, 4)]:
        x = jnp.ones(shape)
        out = np.asarray(mask_sequence_tensor(x, lens))
        assert out[0, ..., :2].min() == 1.0 and out[0, ..., 2:].max() == 0.0
        assert out[1, ..., :3].min() == 1.0 and out[1, ..., 3:].max() == 0.0
    with pytest.raises(ValueError):
        mask_sequence_tensor(jnp.ones((2, 1, 1, 1, 4)), lens)
