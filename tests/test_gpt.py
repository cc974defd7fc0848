"""GPT (NLP collection) tests: causality, GQA, KV-cache decode parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roar_tpu.models.gpt import (
    GPT,
    GPTConfig,
    RMSNorm,
    generate,
    init_kv_caches,
)


def tiny_cfg(**kw):
    base = dict(
        vocab_size=50, block_size=32, n_layer=2, n_head=4, n_embd=32,
        n_query_groups=2, intermediate_size=64,
    )
    base.update(kw)
    return GPTConfig(**base)


@pytest.mark.slow
def test_rmsnorm():
    norm = RMSNorm()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 5, 8)), jnp.float32)
    p = norm.init(jax.random.PRNGKey(0), x)
    y = np.asarray(norm.apply(p, x))
    rms = np.sqrt(np.mean(np.asarray(x) ** 2, -1, keepdims=True))
    np.testing.assert_allclose(y, np.asarray(x) / np.sqrt(rms**2 + 1e-5), atol=1e-5)


def test_causality():
    cfg = tiny_cfg()
    model = GPT(cfg)
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, 50, (1, 10)).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), tokens)
    logits = model.apply(params, tokens)
    # changing a future token must not change past logits
    tokens2 = tokens.at[0, 7].set((int(tokens[0, 7]) + 1) % 50)
    logits2 = model.apply(params, tokens2)
    np.testing.assert_allclose(
        np.asarray(logits)[:, :7], np.asarray(logits2)[:, :7], atol=1e-5
    )
    assert not np.allclose(np.asarray(logits)[:, 7:], np.asarray(logits2)[:, 7:])


def test_kv_cache_decode_matches_full_forward():
    cfg = tiny_cfg()
    model = GPT(cfg)
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(0, 50, (2, 8)).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), tokens)

    full = np.asarray(model.apply(params, tokens))

    # prefill 5, then decode 3 one at a time with the cache
    caches = init_kv_caches(cfg, 2)
    logits, caches = model.apply(params, tokens[:, :5], 0, caches)
    outs = [np.asarray(logits)]
    for i in range(5, 8):
        logits, caches = model.apply(params, tokens[:, i : i + 1], i, caches)
        outs.append(np.asarray(logits))
    cached = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(cached, full, atol=2e-4, rtol=1e-3)


def test_gqa_head_counts():
    cfg = tiny_cfg(n_query_groups=1)  # MQA extreme
    model = GPT(cfg)
    tokens = jnp.zeros((1, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens)
    # qkv projection sized (n_head + 2*groups) * head_size
    kernel = params["params"]["h_0"]["attn"]["attn"]["kernel"]
    assert kernel.shape[1] == (4 + 2 * 1) * 8


@pytest.mark.slow
def test_generate():
    cfg = tiny_cfg()
    model = GPT(cfg)
    prompt = jnp.asarray([[1, 2, 3]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), prompt)
    out = generate(model, params, prompt, max_new_tokens=5, temperature=0.0)
    assert out.shape == (1, 8)
    assert (np.asarray(out)[:, :3] == np.asarray(prompt)).all()
    # greedy decode is deterministic
    out2 = generate(model, params, prompt, max_new_tokens=5, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # sampling with top-k runs
    out3 = generate(model, params, prompt, 5, temperature=1.0, top_k=5,
                    rng=jax.random.PRNGKey(3))
    assert out3.shape == (1, 8)


def test_use_flash_falls_back_identically_off_tpu():
    """GPTConfig(use_flash=True) uses the Pallas causal kernel only on TPU
    (measured 2.2x train step at seq 4k, DESIGN.md 7c); on other backends
    CausalSelfAttention silently takes the einsum path, bit-identical."""
    import jax as _jax

    if _jax.default_backend() == "tpu":
        pytest.skip("fallback-path equality only holds off-TPU (flash has "
                    "its own internal precision there)")
    kw = dict(vocab_size=64, block_size=64, n_layer=1, n_head=4,
              n_embd=32, n_query_groups=2, intermediate_size=64)
    m0 = GPT(GPTConfig(**kw, use_flash=False))
    m1 = GPT(GPTConfig(**kw, use_flash=True))
    tok = jnp.asarray(np.random.default_rng(0).integers(0, 64, (2, 48)), jnp.int32)
    params = m0.init(jax.random.PRNGKey(0), tok)
    np.testing.assert_array_equal(
        np.asarray(m0.apply(params, tok)), np.asarray(m1.apply(params, tok))
    )


@pytest.mark.slow
def test_scan_layers_matches_unrolled():
    """scan_layers=True (stacked h_scan params under lax.scan) produces the
    same logits as the unrolled loop given converted params, with and
    without remat; unstack_block_params round-trips the layout back for
    KV-cache decode."""
    from roar_tpu.models.gpt import (
        scan_params_from_unrolled,
        unstack_block_params,
    )

    cfg = tiny_cfg(n_layer=3)
    tok = jnp.asarray(
        np.random.default_rng(0).integers(0, 50, (2, 16)), jnp.int32
    )
    model = GPT(cfg)
    params = model.init(jax.random.PRNGKey(0), tok)
    ref = model.apply(params, tok)

    import dataclasses

    scan_model = GPT(dataclasses.replace(cfg, scan_layers=True))
    scan_params = scan_params_from_unrolled(params, cfg.n_layer)
    np.testing.assert_allclose(
        np.asarray(scan_model.apply(scan_params, tok)), np.asarray(ref),
        rtol=2e-5, atol=2e-5,
    )
    # remat changes scheduling, not math
    remat_model = GPT(dataclasses.replace(cfg, scan_layers=True, remat=True))
    np.testing.assert_allclose(
        np.asarray(remat_model.apply(scan_params, tok)), np.asarray(ref),
        rtol=2e-5, atol=2e-5,
    )
    # grads flow through the scan+remat path
    def loss(p):
        return jnp.mean(jnp.square(remat_model.apply(p, tok)))

    g = jax.grad(loss)(scan_params)
    assert all(
        np.isfinite(x).all() for x in jax.tree_util.tree_leaves(g)
    )
    # layout round-trip: scan checkpoint -> unrolled decode params
    back = unstack_block_params(scan_params, cfg.n_layer)
    np.testing.assert_allclose(
        np.asarray(model.apply(back, tok)), np.asarray(ref), rtol=1e-6, atol=1e-6
    )
    # init in the scan layout directly also works
    p2 = scan_model.init(jax.random.PRNGKey(1), tok)
    leading = set(
        x.shape[0] for x in jax.tree_util.tree_leaves(p2["params"]["h_scan"])
    )
    assert leading == {cfg.n_layer}


@pytest.mark.slow
def test_gpt_tp_equivalence_d1024():
    """GPT_TP_RULES (qkv/o/MLP column-row pairs + vocab-sharded embedding
    and head), multi-step falsifying form (VERDICT r4 #8): TEN d=1024 SGD
    steps on mesh(8,1), on mesh(8,1) with reversed device order (the
    legitimate fp-reassociation control), and on mesh(4,2).  The tp run
    must stay inside the control envelope at every step — a small
    systematic sharding error compounds over steps; reassociation noise
    does not.  Runs on both the unrolled and scan-stacked layouts."""
    import dataclasses

    from roar_tpu.parallel import (
        GPT_TP_RULES,
        make_mesh,
        shard_batch,
        tp_param_shardings,
    )

    cfg = tiny_cfg(
        vocab_size=256, block_size=64, n_layer=2, n_head=8, n_embd=1024,
        n_query_groups=4, intermediate_size=1408,
    )
    rng = np.random.default_rng(0)
    tok = jnp.asarray(rng.integers(0, 256, (8, 64)), jnp.int32)
    tgt = jnp.asarray(rng.integers(0, 256, (8, 64)), jnp.int32)
    n_steps = 10

    for scan in (False, True):
        model = GPT(dataclasses.replace(cfg, scan_layers=scan))
        params0 = jax.device_get(
            jax.jit(model.init)(jax.random.PRNGKey(0), tok)
        )

        def loss_fn(p, tok, tgt):
            logits = model.apply(p, tok).astype(jnp.float32)
            lp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))

        @jax.jit
        def step(p, tok, tgt):
            l, g = jax.value_and_grad(loss_fn)(p, tok, tgt)
            new_p = jax.tree_util.tree_map(lambda w, gw: w - 0.1 * gw, p, g)
            return l, new_p

        def run(mesh):
            p = jax.tree_util.tree_map(np.copy, params0)
            shardings = tp_param_shardings(p, mesh, GPT_TP_RULES)
            p = jax.tree_util.tree_map(jax.device_put, p, shardings)
            b = shard_batch({"tok": tok, "tgt": tgt}, mesh)
            losses = []
            for _ in range(n_steps):
                l, p = step(p, b["tok"], b["tgt"])
                losses.append(float(l))
            return np.asarray(losses), jax.device_get(p)

        devs = list(jax.devices())
        l_a, p_a = run(make_mesh(data=8, model=1))
        l_c, p_c = run(make_mesh(data=8, model=1, devices=devs[::-1]))
        l_b, p_b = run(make_mesh(data=4, model=2))

        scale = np.abs(l_a) + 1e-9
        ctrl = np.abs(l_a - l_c) / scale
        err = np.abs(l_a - l_b) / scale
        tol = np.maximum(64.0 * ctrl, 1e-4)
        assert (err <= tol).all(), (
            f"scan={scan}: err={err}\nctrl={ctrl}\ntol={tol}")

        def max_rel(tx, ty):
            worst = 0.0
            for x, y in zip(jax.tree_util.tree_leaves(tx),
                            jax.tree_util.tree_leaves(ty)):
                x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
                denom = np.maximum(np.abs(x).max(), 1e-3)
                worst = max(worst, float(np.abs(x - y).max() / denom))
            return worst

        ctrl_p, err_p = max_rel(p_a, p_c), max_rel(p_a, p_b)
        assert err_p <= max(64.0 * ctrl_p, 5e-4), (scan, err_p, ctrl_p)


def test_fused_cross_entropy_matches_unfused():
    """ops/fused_ce.py vs the plain logsumexp formulation: loss, accuracy
    and gradients (hidden, lm_head kernel+bias) must match to fp32
    tolerance for every chunking, with and without a loss mask."""
    from roar_tpu.ops.fused_ce import fused_cross_entropy

    rng = np.random.default_rng(0)
    b, s, d, v = 2, 12, 16, 37
    hidden = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((d, v)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((v,)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(0, v, (b, s)), jnp.int32)
    mask = jnp.asarray(rng.integers(0, 2, (b, s)), jnp.float32)

    def unfused(hidden, w, bias, mask):
        logits = (hidden @ w + bias).astype(jnp.float32)
        logz = jax.nn.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(logits, labels[..., None], -1)[..., 0]
        nll = logz - gold
        if mask is None:
            return jnp.mean(nll)
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    for m in (None, mask):
        for chunk in (3, 8, 512):
            fused = lambda h, w_, b_, m_: fused_cross_entropy(
                h, w_, labels, bias=b_, loss_mask=m_, chunk=chunk)[0]
            l_f, g_f = jax.value_and_grad(fused, argnums=(0, 1, 2))(
                hidden, w, bias, m)
            l_u, g_u = jax.value_and_grad(unfused, argnums=(0, 1, 2))(
                hidden, w, bias, m)
            np.testing.assert_allclose(l_f, l_u, rtol=1e-6, atol=1e-6)
            for a, b_ in zip(g_f, g_u):
                np.testing.assert_allclose(a, b_, rtol=2e-5, atol=2e-6)

    # accuracy output matches the argmax formulation
    logits = hidden @ w + bias
    acc_ref = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
    _, acc = fused_cross_entropy(hidden, w, labels, bias=bias, chunk=8)
    np.testing.assert_allclose(acc, acc_ref, rtol=1e-6)


def test_fused_ce_no_bias_and_bf16():
    """bf16 hiddens/weights: the fused path's fp32-accumulated loss must
    match the unfused fp32-upcast formulation bit-for-bit in value (same
    matmul precision), and grads must come back in the input dtypes."""
    from roar_tpu.ops.fused_ce import fused_cross_entropy

    rng = np.random.default_rng(1)
    b, s, d, v = 2, 8, 16, 33
    hidden = jnp.asarray(rng.standard_normal((b, s, d)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((d, v)) * 0.1, jnp.bfloat16)
    labels = jnp.asarray(rng.integers(0, v, (b, s)), jnp.int32)

    loss, _ = fused_cross_entropy(hidden, w, labels, chunk=4)
    logits = jnp.dot(hidden, w, preferred_element_type=jnp.float32)
    ref = jnp.mean(jax.nn.logsumexp(logits, -1)
                   - jnp.take_along_axis(logits, labels[..., None], -1)[..., 0])
    np.testing.assert_allclose(loss, ref, rtol=1e-6)

    g = jax.grad(lambda h, w_: fused_cross_entropy(h, w_, labels)[0],
                 argnums=(0, 1))(hidden, w)
    assert g[0].dtype == jnp.bfloat16 and g[1].dtype == jnp.bfloat16


def test_gpt_lm_model_fused_ce_matches_unfused():
    """GPTLMModel with fused_ce on/off: same loss/metrics and same grads
    (the fused path swaps in return_hidden + ops/fused_ce.py)."""
    from roar_tpu.models.gpt_model import GPTLMModel

    base = dict(vocab_size=50, block_size=16, n_layer=2, n_head=4,
                n_embd=32, n_query_groups=2, intermediate_size=64)
    rng = np.random.default_rng(2)
    batch = {
        "input_ids": rng.integers(0, 50, (2, 16)).astype(np.int32),
        "labels": rng.integers(0, 50, (2, 16)).astype(np.int32),
        "loss_mask": rng.integers(0, 2, (2, 16)).astype(np.float32),
    }
    m_fused = GPTLMModel({**base, "fused_ce": True})
    m_plain = GPTLMModel({**base, "fused_ce": False})
    params = m_fused.init_params(jax.random.PRNGKey(0), batch)

    (l_f, mf), g_f = jax.value_and_grad(m_fused.loss_fn, has_aux=True)(
        params, batch)
    (l_u, mu), g_u = jax.value_and_grad(m_plain.loss_fn, has_aux=True)(
        params, batch)
    np.testing.assert_allclose(l_f, l_u, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(mf["token_acc"], mu["token_acc"], rtol=1e-6)
    flat_f = jax.tree_util.tree_leaves(g_f)
    flat_u = jax.tree_util.tree_leaves(g_u)
    for a, b in zip(flat_f, flat_u):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-5)


def test_flash_remat_policy():
    """remat_policy="flash" must be a pure schedule knob: same loss, same
    gradients as remat_policy="nothing" under scan_layers+remat.

    On TPU this exercises ops/flash_remat.py (the saveable custom_vjp wraps
    the real Pallas kernels; verified bit-identical grads on a v5e chip,
    DESIGN.md §7i).  Off TPU the attention falls back to einsum and the
    save_only_these_names policy matches nothing — which still proves the
    config plumbing (policy threaded through nn.remat in both scan and
    unrolled paths) doesn't perturb the computation.
    """
    kw = dict(scan_layers=True, remat=True, use_flash=True, block_size=64)
    tok = jnp.asarray(
        np.random.default_rng(0).integers(0, 50, (2, 64)), jnp.int32
    )
    tgt = jnp.asarray(
        np.random.default_rng(1).integers(0, 50, (2, 64)), jnp.int32
    )

    def make(policy):
        model = GPT(tiny_cfg(**kw, remat_policy=policy))

        def f(p):
            lp = jax.nn.log_softmax(
                model.apply(p, tok).astype(jnp.float32), -1
            )
            return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))

        return model, jax.jit(jax.value_and_grad(f))

    m0, f0 = make("nothing")
    _, f1 = make("flash")
    params = m0.init(jax.random.PRNGKey(0), tok)
    l0, g0 = f0(params)
    l1, g1 = f1(params)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
