"""Pipeline parallelism (parallel/pp.py): parity vs sequential layer stack.

The reference has no working PP (vestigial AppState fields only,
SURVEY.md §2.10); these tests hold the GPipe shard_map schedule to exact
agreement with the plain sequential forward/backward on the virtual
8-device CPU mesh (conftest recipe).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from roar_tpu.parallel.pp import (
    pipeline_apply,
    scan_stage,
    split_microbatches,
    stack_layer_params,
)

N_LAYERS, FEAT = 8, 16


def _apply_one(layer_params, x):
    return jnp.tanh(x @ layer_params["w"] + layer_params["b"])


def _make_params(key):
    per_layer = []
    for i in range(N_LAYERS):
        key, k1, k2 = jax.random.split(key, 3)
        per_layer.append(
            {
                "w": jax.random.normal(k1, (FEAT, FEAT)) * 0.3,
                "b": jax.random.normal(k2, (FEAT,)) * 0.1,
            }
        )
    return stack_layer_params(per_layer)


def _sequential(params, x):
    def body(h, layer_params):
        return _apply_one(layer_params, h), None

    h, _ = jax.lax.scan(body, x, params)
    return h


def _mesh(shape, names):
    devs = np.array(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def test_pipeline_forward_matches_sequential():
    params = _make_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, FEAT))
    mesh = _mesh((4,), ("pipe",))
    mb = split_microbatches(x, 4)  # M=4 microbatches of 2
    out = pipeline_apply(scan_stage(_apply_one), params, mb, mesh)
    ref = _sequential(params, x)
    np.testing.assert_allclose(
        np.asarray(out).reshape(8, FEAT), np.asarray(ref), rtol=1e-5, atol=1e-6
    )


@pytest.mark.slow
def test_pipeline_grad_matches_sequential():
    params = _make_params(jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (8, FEAT))
    mesh = _mesh((4,), ("pipe",))

    def pp_loss(p):
        out = pipeline_apply(scan_stage(_apply_one), p, split_microbatches(x, 4), mesh)
        return jnp.sum(out**2)

    def seq_loss(p):
        return jnp.sum(_sequential(p, x) ** 2)

    g_pp = jax.grad(pp_loss)(params)
    g_seq = jax.grad(seq_loss)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp), jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_pipeline_dp_x_pp_trains():
    """Combined data x pipe mesh (2x4): one jitted SGD step on the pipelined
    stack runs, loss is finite, and grads match the sequential model."""
    params = _make_params(jax.random.PRNGKey(4))
    x = jax.random.normal(jax.random.PRNGKey(5), (16, FEAT))
    y = jax.random.normal(jax.random.PRNGKey(6), (16, FEAT))
    mesh = _mesh((2, 4), ("data", "pipe"))

    mb_x = split_microbatches(x, 4)
    mb_y = split_microbatches(y, 4)

    @jax.jit
    def step(p):
        def loss_fn(p):
            out = pipeline_apply(
                scan_stage(_apply_one), p, mb_x, mesh, data_axis="data"
            )
            return jnp.mean((out - mb_y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        new_p = jax.tree_util.tree_map(lambda a, g: a - 0.1 * g, p, grads)
        return loss, new_p, grads

    loss, new_p, grads = step(params)
    assert np.isfinite(float(loss))

    def seq_loss(p):
        return jnp.mean((_sequential(p, x) - y) ** 2)

    g_seq = jax.grad(seq_loss)(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(grads), jax.tree_util.tree_leaves(g_seq)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    loss2, _, _ = step(new_p)
    assert float(loss2) < float(loss)


@pytest.mark.slow
def test_pipelined_gpt_matches_sequential():
    """pipelined_gpt_apply produces the exact logits of the plain GPT
    forward from the same param tree (pipe=4 stages over 8 blocks), and a
    jitted dp x pp cross-entropy train step runs to a finite loss."""
    from roar_tpu.models.gpt import (
        GPT,
        GPTConfig,
        pipelined_gpt_apply,
        stack_block_params,
    )

    cfg = GPTConfig(
        block_size=32, vocab_size=64, n_layer=8, n_head=4,
        n_embd=32, intermediate_size=64, rotary_percentage=1.0,
    )
    model = GPT(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (8, 16), 0, 64)
    params = model.init(jax.random.PRNGKey(1), tokens)
    ref_logits = model.apply(params, tokens)

    stacked, rest = stack_block_params(params, cfg.n_layer)
    mesh = _mesh((4,), ("pipe",))
    pp_logits = pipelined_gpt_apply(cfg, stacked, rest, tokens, mesh, n_micro=4)
    np.testing.assert_allclose(
        np.asarray(pp_logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-5
    )

    mesh2 = _mesh((2, 4), ("data", "pipe"))
    targets = jax.random.randint(jax.random.PRNGKey(2), (8, 16), 0, 64)

    @jax.jit
    def step(stacked, rest):
        def loss_fn(stacked, rest):
            logits = pipelined_gpt_apply(
                cfg, stacked, rest, tokens, mesh2, n_micro=4, data_axis="data"
            )
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(
                jnp.take_along_axis(logp, targets[..., None], axis=-1)
            )

        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(stacked, rest)
        return loss, grads

    loss, grads = step(stacked, rest)
    assert np.isfinite(float(loss))
    gnorm = sum(
        float(jnp.sum(g**2)) for g in jax.tree_util.tree_leaves(grads)
    )
    assert gnorm > 0
