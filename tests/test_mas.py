"""MAS parity vs an independent numpy Viterbi oracle."""

import numpy as np
import jax.numpy as jnp

from roar_tpu.ops import binarize_attention, mas_width1
import pytest


def _oracle_mas(log_attn):
    """Independent O(T_mel * T_text) width-1 monotonic Viterbi in numpy.

    Forward DP + argmax backtrack with explicit prev-pointer bookkeeping
    (a from-scratch implementation of the classic MAS recurrence, used here
    purely as a test oracle)."""
    t_mel, t_text = log_attn.shape
    log_p = np.full((t_mel, t_text), -np.inf)
    ptr = np.zeros((t_mel, t_text), dtype=np.int64)
    log_p[0, 0] = log_attn[0, 0]
    for i in range(1, t_mel):
        for j in range(t_text):
            best_j, best = j, log_p[i - 1, j]
            if j > 0 and log_p[i - 1, j - 1] >= best:
                best_j, best = j - 1, log_p[i - 1, j - 1]
            log_p[i, j] = log_attn[i, j] + best
            ptr[i, j] = best_j
    opt = np.zeros_like(log_p)
    j = t_text - 1
    for i in range(t_mel - 1, -1, -1):
        opt[i, j] = 1.0
        j = ptr[i, j]
    return opt


@pytest.mark.slow
def test_mas_matches_oracle_random():
    rng = np.random.default_rng(0)
    for trial in range(5):
        t_mel, t_text = 40 + trial * 7, 12 + trial
        attn = rng.random((t_mel, t_text)).astype(np.float32) + 1e-3
        la = np.log(attn)
        ref = _oracle_mas(la)
        got = np.asarray(
            mas_width1(
                jnp.asarray(la)[None],
                jnp.asarray([t_text]),
                jnp.asarray([t_mel]),
            )
        )[0]
        np.testing.assert_array_equal(got, ref)


def test_mas_batched_variable_lengths():
    rng = np.random.default_rng(1)
    b, t_mel, t_text = 4, 64, 20
    attn = rng.random((b, t_mel, t_text)).astype(np.float32) + 1e-3
    mel_lens = np.array([64, 50, 33, 61])
    text_lens = np.array([20, 11, 7, 19])
    got = np.asarray(
        binarize_attention(
            jnp.asarray(attn)[:, None],
            jnp.asarray(text_lens),
            jnp.asarray(mel_lens),
        )
    )[:, 0]
    for i in range(b):
        ref = _oracle_mas(np.log(attn[i, : mel_lens[i], : text_lens[i]]))
        np.testing.assert_array_equal(got[i, : mel_lens[i], : text_lens[i]], ref)
        # Nothing outside the valid rectangle.
        assert got[i, mel_lens[i] :].sum() == 0
        assert got[i, :, text_lens[i] :].sum() == 0
        # Exactly one text token per valid mel frame; every token covered.
        assert (got[i, : mel_lens[i]].sum(axis=1) == 1).all()
        assert (got[i, : mel_lens[i], : text_lens[i]].sum(axis=0) >= 1).all()


def test_mas_blocked_equals_sequential():
    """mas_width1_blocked (two-level banded max-plus + map-composition
    backtrack) must reproduce mas_width1 exactly: every block size,
    ragged T_mel (padding-operator path), variable lengths."""
    from roar_tpu.ops.mas import mas_width1_blocked

    rng = np.random.default_rng(7)
    for b, t_mel, t_text, blk in [
        (3, 7, 5, 4), (2, 33, 17, 8), (4, 64, 24, 32),
        (2, 97, 40, 32), (1, 3, 2, 2), (2, 130, 24, 64),
    ]:
        la = jnp.asarray(rng.standard_normal((b, t_mel, t_text)), jnp.float32)
        tl = jnp.asarray(rng.integers(1, t_text + 1, (b,)), jnp.int32)
        ml = jnp.asarray(
            np.maximum(rng.integers(1, t_mel + 1, (b,)), np.asarray(tl)),
            jnp.int32,
        )
        a = np.asarray(mas_width1(la, tl, ml))
        c = np.asarray(mas_width1_blocked(la, tl, ml, block=blk))
        np.testing.assert_array_equal(a, c, err_msg=str((b, t_mel, t_text, blk)))


def test_mas_prefers_diagonal():
    t_mel, t_text = 50, 10
    ii = np.arange(t_mel)[:, None] / t_mel
    jj = np.arange(t_text)[None, :] / t_text
    attn = np.exp(-((ii - jj) ** 2) * 20).astype(np.float32)
    got = np.asarray(
        mas_width1(jnp.log(jnp.asarray(attn))[None], jnp.asarray([t_text]), jnp.asarray([t_mel]))
    )[0]
    durs = got.sum(axis=0)
    assert durs.sum() == t_mel
    assert durs.max() <= 2 * durs.min() + 3  # roughly uniform along diagonal
