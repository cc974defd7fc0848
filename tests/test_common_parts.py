"""Tests for common shared modules (reference common/parts/*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roar_tpu.models.common_parts import (
    LSTMDropout,
    MultiLayerPerceptron,
    StackTime,
    form_attention_mask,
    label_collate,
    mask_padded_tokens,
)


class TestMLP:
    def test_log_softmax_normalized(self):
        mlp = MultiLayerPerceptron(hidden_size=16, num_classes=4, num_layers=2)
        x = jnp.ones((3, 8))
        p = mlp.init(jax.random.PRNGKey(0), x)
        y = mlp.apply(p, x)
        np.testing.assert_allclose(np.exp(np.asarray(y)).sum(-1), 1.0, rtol=1e-5)

    def test_plain_logits(self):
        mlp = MultiLayerPerceptron(
            hidden_size=16, num_classes=4, num_layers=1, log_softmax=False
        )
        x = jnp.ones((3, 8))
        p = mlp.init(jax.random.PRNGKey(0), x)
        assert mlp.apply(p, x).shape == (3, 4)


class TestLSTM:
    @pytest.mark.slow
    def test_shapes_and_state(self):
        lstm = LSTMDropout(hidden_size=12, num_layers=2)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 7, 5)),
                        jnp.float32)
        p = lstm.init(jax.random.PRNGKey(0), x)
        out, (h, c) = lstm.apply(p, x)
        assert out.shape == (2, 7, 12)
        assert h.shape == c.shape == (2, 2, 12)
        # final hidden of top layer == last output frame
        np.testing.assert_allclose(np.asarray(h[1]), np.asarray(out[:, -1]),
                                   atol=1e-5)

    def test_state_passing_continues_sequence(self):
        lstm = LSTMDropout(hidden_size=8, num_layers=1)
        x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 8, 4)),
                        jnp.float32)
        p = lstm.init(jax.random.PRNGKey(0), x)
        full, _ = lstm.apply(p, x)
        first, state = lstm.apply(p, x[:, :4])
        second, _ = lstm.apply(p, x[:, 4:], state)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate([first, second], 1)), np.asarray(full),
            atol=1e-5,
        )

    def test_jit(self):
        lstm = LSTMDropout(hidden_size=8, num_layers=1, norm="layer")
        x = jnp.ones((2, 5, 3))
        p = lstm.init(jax.random.PRNGKey(0), x)
        out = jax.jit(lambda xx: lstm.apply(p, xx)[0])(x)
        assert out.shape == (2, 5, 8)


class TestStackTime:
    def test_exact_multiple(self):
        y, l = StackTime(factor=2)(jnp.ones((1, 6, 3)), jnp.asarray([6]))
        assert y.shape == (1, 3, 6) and l.tolist() == [3]

    def test_ragged(self):
        y, l = StackTime(factor=3)(jnp.ones((2, 7, 2)), jnp.asarray([7, 4]))
        assert y.shape == (2, 3, 6)
        assert l.tolist() == [3, 2]


class TestTransformerUtils:
    def test_padding_mask(self):
        m = form_attention_mask(jnp.asarray([[1, 1, 0]]))
        assert m.shape == (1, 1, 3, 3)
        assert float(m[0, 0, 0, 2]) == -10000.0
        assert float(m[0, 0, 0, 1]) == 0.0
        # masked QUERY rows are also masked (reference row & col logic)
        assert float(m[0, 0, 2, 0]) == -10000.0

    def test_causal(self):
        m = form_attention_mask(jnp.ones((1, 4)), diagonal=0)
        assert float(m[0, 0, 0, 1]) == -10000.0
        assert float(m[0, 0, 1, 0]) == 0.0

    def test_none_passthrough(self):
        assert form_attention_mask(None) is None

    def test_mask_padded_tokens(self):
        assert mask_padded_tokens(jnp.asarray([[5, 0, 2]]), 0).tolist() == [
            [True, False, True]
        ]

    def test_label_collate(self):
        out = label_collate([[1, 2, 3], [4]], pad_id=0)
        assert out.tolist() == [[1, 2, 3], [4, 0, 0]]


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))
