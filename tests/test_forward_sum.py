"""Forward-sum loss parity vs torch.nn.CTCLoss (the reference's backend)."""

import numpy as np
import pytest

import jax.numpy as jnp

from roar_tpu.ops import bin_loss, forward_sum_loss

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_forward_sum(attn_logprob, in_lens, out_lens, blank_logprob=-1.0):
    """Oracle reproducing ForwardSumLoss (aligner_loss.py:37-71) with torch."""
    attn_logprob = torch.tensor(attn_logprob, dtype=torch.float32)
    in_lens = torch.tensor(in_lens, dtype=torch.long)
    out_lens = torch.tensor(out_lens, dtype=torch.long)
    key_lens, query_lens = in_lens, out_lens
    max_key_len = attn_logprob.size(-1)

    x = attn_logprob.squeeze(1).permute(1, 0, 2)  # [T_mel, B, T_text]
    x = F.pad(input=x, pad=(1, 0, 0, 0, 0, 0), value=blank_logprob)
    key_inds = torch.arange(max_key_len + 1, dtype=torch.long)
    x = x.masked_fill(key_inds.view(1, 1, -1) > key_lens.view(1, -1, 1), -1e15)
    x = torch.nn.LogSoftmax(dim=-1)(x)

    target_seqs = key_inds[1:].unsqueeze(0).repeat(key_lens.numel(), 1)
    ctc = torch.nn.CTCLoss(zero_infinity=True)
    return ctc(
        x, target_seqs, input_lengths=query_lens, target_lengths=key_lens
    ).item()


def test_forward_sum_matches_ctc_uniform_lens():
    rng = np.random.default_rng(0)
    b, t_mel, t_text = 3, 40, 12
    attn = rng.standard_normal((b, 1, t_mel, t_text)).astype(np.float32)
    in_lens = np.array([12, 12, 12])
    out_lens = np.array([40, 40, 40])
    ref = _torch_forward_sum(attn, in_lens, out_lens)
    got = float(
        forward_sum_loss(jnp.asarray(attn), jnp.asarray(in_lens), jnp.asarray(out_lens))
    )
    assert abs(got - ref) < 1e-3, (got, ref)


@pytest.mark.slow
def test_forward_sum_matches_ctc_ragged():
    rng = np.random.default_rng(1)
    b, t_mel, t_text = 4, 57, 15
    attn = rng.standard_normal((b, 1, t_mel, t_text)).astype(np.float32)
    in_lens = np.array([15, 9, 11, 4])
    out_lens = np.array([57, 33, 41, 12])
    ref = _torch_forward_sum(attn, in_lens, out_lens)
    got = float(
        forward_sum_loss(jnp.asarray(attn), jnp.asarray(in_lens), jnp.asarray(out_lens))
    )
    assert abs(got - ref) < 1e-3, (got, ref)


@pytest.mark.slow
def test_forward_sum_grad_is_finite():
    import jax

    rng = np.random.default_rng(2)
    attn = rng.standard_normal((2, 1, 30, 8)).astype(np.float32)
    in_lens = jnp.asarray([8, 5])
    out_lens = jnp.asarray([30, 22])

    g = jax.grad(lambda a: forward_sum_loss(a, in_lens, out_lens))(jnp.asarray(attn))
    assert np.isfinite(np.asarray(g)).all()


def test_bin_loss_matches_reference_formula():
    rng = np.random.default_rng(3)
    soft = rng.random((2, 1, 20, 6)).astype(np.float32)
    hard = np.zeros_like(soft)
    for b in range(2):
        js = rng.integers(0, 6, size=20)
        hard[b, 0, np.arange(20), js] = 1.0
    ref = -np.log(np.clip(soft[hard == 1], 1e-12, None)).sum() / hard.sum()
    got = float(bin_loss(jnp.asarray(hard), jnp.asarray(soft)))
    assert abs(got - ref) < 1e-4

def test_forward_sum_infeasible_zeroed_like_zero_infinity():
    """An utterance whose text is longer than its mel frames has no valid
    monotonic alignment: torch CTCLoss(zero_infinity=True) zeroes its
    contribution, and ours must too (regression: the clamp used to test the
    length-normalized value, letting 1e30/target_len leak through as ~4e28)."""
    rng = np.random.default_rng(2)
    b, t_mel, t_text = 3, 30, 24
    attn = rng.standard_normal((b, 1, t_mel, t_text)).astype(np.float32)
    in_lens = np.array([24, 10, 24])   # rows 0 and 2: text 24 > mel 20/18
    out_lens = np.array([20, 30, 18])
    ref = _torch_forward_sum(attn, in_lens, out_lens)
    got = float(
        forward_sum_loss(jnp.asarray(attn), jnp.asarray(in_lens), jnp.asarray(out_lens))
    )
    assert np.isfinite(got)
    assert got < 1e6, f"infeasible rows leaked a huge loss: {got}"
    assert abs(got - ref) < 1e-3, (got, ref)
