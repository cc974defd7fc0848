"""GPT (NLP collection) tests: causality, GQA, KV-cache decode parity."""

import numpy as np

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
