"""Decoder-only GPT with GQA, RoPE, RMSNorm and a functional KV cache.

Re-design of the reference's lit-gpt-style NLP collection
(roar/collections/nlp/modules/gpt/gpt.py:63-430 `GPT` /
`CausalSelfAttention`, parts/submodules/llm.py:7-56 `KVCache`/`RMSNorm`,
config registry nlp/modules/gpt/config.py:17, SwiGLU `LLaMAMLP`).  The
external fused CUDA kernels it wraps (flash-attn RMSNorm/rotary/SwiGLU,
SURVEY.md §2.9 #5-#7) are plain jnp here — XLA fuses them on TPU.

Decoding is functional: the KV cache is an explicit pytree threaded through
`decode_step`, and `generate` drives it with `lax.scan` (static shapes:
the cache is pre-allocated at `block_size`).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from roar_tpu.ops.rope import apply_rope, build_rope_cache


@dataclasses.dataclass(frozen=True)
class GPTConfig:
    """Architecture config (nlp/modules/gpt/config.py registry analogue)."""

    vocab_size: int = 32000
    block_size: int = 2048
    n_layer: int = 22
    n_head: int = 32
    n_embd: int = 2048
    n_query_groups: Optional[int] = 4  # GQA; None -> MHA
    intermediate_size: Optional[int] = 5632
    rotary_percentage: float = 1.0
    norm_eps: float = 1e-5
    mlp_class: str = "LLaMAMLP"  # or "GptNeoxMLP"
    parallel_residual: bool = False
    # Pallas TPU flash attention for the TRAINING path (tuned wide-block
    # kernel: measured 2.6-3.3x over SDPA at seq 4096-8192, DESIGN.md 7c).
    # KV-cache decode — including generate()'s cache-prefill call — and
    # nonzero pos_offset always use the einsum path.
    use_flash: bool = False

    @property
    def head_size(self) -> int:
        return self.n_embd // self.n_head

    @property
    def groups(self) -> int:
        return self.n_query_groups or self.n_head

    @property
    def rope_n_elem(self) -> int:
        return int(self.rotary_percentage * self.head_size)


# Named-architecture registry (nlp/modules/gpt/config.py:17 `Config.from_name`
# analogue).  Hyperparameters are the public HF model-card values; families
# covered: TinyLlama, Llama-2, open_llama, Pythia (GPT-NeoX), StableLM.
def _pythia(n_layer, n_head, n_embd):
    return GPTConfig(
        vocab_size=50304, block_size=2048, n_layer=n_layer, n_head=n_head,
        n_embd=n_embd, n_query_groups=None, intermediate_size=4 * n_embd,
        mlp_class="GptNeoxMLP", parallel_residual=True,
    )


GPT_CONFIGS: Dict[str, GPTConfig] = {
    "tiny-llama-1.1b": GPTConfig(
        vocab_size=32000, block_size=2048, n_layer=22, n_head=32, n_embd=2048,
        n_query_groups=4, intermediate_size=5632,
    ),
    "llama-2-7b": GPTConfig(
        vocab_size=32000, block_size=4096, n_layer=32, n_head=32, n_embd=4096,
        n_query_groups=None, intermediate_size=11008,
    ),
    "llama-2-13b": GPTConfig(
        vocab_size=32000, block_size=4096, n_layer=40, n_head=40, n_embd=5120,
        n_query_groups=None, intermediate_size=13824,
    ),
    "llama-2-70b": GPTConfig(
        vocab_size=32000, block_size=4096, n_layer=80, n_head=64, n_embd=8192,
        n_query_groups=8, intermediate_size=28672,
    ),
    "open-llama-3b": GPTConfig(
        vocab_size=32000, block_size=2048, n_layer=26, n_head=32, n_embd=3200,
        n_query_groups=None, intermediate_size=8640, norm_eps=1e-6,
    ),
    "pythia-70m": _pythia(6, 8, 512),
    "pythia-160m": _pythia(12, 12, 768),
    "pythia-410m": _pythia(24, 16, 1024),
    "pythia-1b": _pythia(16, 8, 2048),
    "pythia-1.4b": _pythia(24, 16, 2048),
    "pythia-2.8b": _pythia(32, 32, 2560),
    "stablelm-base-alpha-3b": GPTConfig(
        vocab_size=50688, block_size=4096, n_layer=16, n_head=32, n_embd=4096,
        n_query_groups=None, intermediate_size=16384, mlp_class="GptNeoxMLP",
        parallel_residual=True, rotary_percentage=0.25,
    ),
}


def config_from_name(name: str) -> GPTConfig:
    """Resolve a config by exact name or shell-style pattern
    (`Config.from_name` semantics: 'pythia-1*' matches the first entry)."""
    if name in GPT_CONFIGS:
        return GPT_CONFIGS[name]
    import fnmatch

    for key in GPT_CONFIGS:
        if fnmatch.fnmatch(key, name):
            return GPT_CONFIGS[key]
    raise ValueError(
        f"unknown GPT config {name!r}; known: {sorted(GPT_CONFIGS)}"
    )


class RMSNorm(nn.Module):
    """Root-mean-square norm (llm.py:56; the fused CUDA version is one fused
    XLA op here)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * scale


class LLaMAMLP(nn.Module):
    """SwiGLU MLP: silu(x W1) * (x W3) W2 — the xformers SwiGLU analogue."""

    intermediate_size: int

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        gate = nn.Dense(self.intermediate_size, use_bias=False, name="fc_1")(x)
        up = nn.Dense(self.intermediate_size, use_bias=False, name="fc_2")(x)
        return nn.Dense(d, use_bias=False, name="proj")(nn.silu(gate) * up)


class GptNeoxMLP(nn.Module):
    intermediate_size: int

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.gelu(nn.Dense(self.intermediate_size, name="fc")(x))
        return nn.Dense(d, name="proj")(h)


def _causal_flash(q, k, v, mask, scale):
    """Causal Pallas flash attention for the training/prefill path.

    q/k/v: [B, T, H, D] (groups already expanded).  Sequence is padded up
    to the kernel's 128-block tiles; with `causal=True` and right-side
    padding, real queries never attend pad keys (pads sit at later
    positions), so zero-padding is exact and pad-query outputs are sliced
    off.  A padding `mask` (True = valid, trailing False) additionally
    masks pad keys via segment ids."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    from roar_tpu.models.transformer import _flash_block_sizes

    t = q.shape[1]
    t_pad = -(-t // 128) * 128
    if t_pad != t:
        pad = [(0, 0), (0, t_pad - t), (0, 0), (0, 0)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
        if mask is not None:
            mask = jnp.pad(mask, [(0, 0), (0, t_pad - t)])
    seg = None
    if mask is not None:
        ids = jnp.where(mask, 0, 1).astype(jnp.int32)
        seg = SegmentIds(q=ids, kv=ids)
    qt, kt, vt = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
    out = flash_attention(
        qt, kt, vt, causal=True, segment_ids=seg, sm_scale=scale,
        block_sizes=_flash_block_sizes(t_pad),
    )
    return jnp.swapaxes(out, 1, 2)[:, :t]


class CausalSelfAttention(nn.Module):
    """GQA causal attention with RoPE and optional KV-cache decode."""

    config: GPTConfig

    @nn.compact
    def __call__(self, x, pos_offset=0, kv_cache=None, mask=None):
        cfg = self.config
        b, t, _ = x.shape
        hs, nh, ng = cfg.head_size, cfg.n_head, cfg.groups
        qkv = nn.Dense((nh + 2 * ng) * hs, use_bias=False, name="attn")(x)
        q, k, v = jnp.split(qkv, [nh * hs, (nh + ng) * hs], axis=-1)
        q = q.reshape(b, t, nh, hs)
        k = k.reshape(b, t, ng, hs)
        v = v.reshape(b, t, ng, hs)

        cos, sin = build_rope_cache(cfg.block_size, cfg.rope_n_elem)
        cos = jax.lax.dynamic_slice_in_dim(jnp.asarray(cos), pos_offset, t, 0)
        sin = jax.lax.dynamic_slice_in_dim(jnp.asarray(sin), pos_offset, t, 0)
        ne = cfg.rope_n_elem
        q = jnp.concatenate([apply_rope(q[..., :ne], cos, sin), q[..., ne:]], -1)
        k = jnp.concatenate([apply_rope(k[..., :ne], cos, sin), k[..., ne:]], -1)

        new_cache = None
        if kv_cache is not None:
            ck, cv = kv_cache  # [B, block, G, hs]
            ck = jax.lax.dynamic_update_slice_in_dim(ck, k, pos_offset, axis=1)
            cv = jax.lax.dynamic_update_slice_in_dim(cv, v, pos_offset, axis=1)
            k, v = ck, cv
            new_cache = (ck, cv)

        # expand groups to heads (GQA)
        rep = nh // ng
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

        scale = 1.0 / np.sqrt(hs)
        # flash only on the from-scratch training path: a nonzero pos_offset
        # shifts the causal diagonal (query i attends keys <= i+offset),
        # which the kernel's position-aligned causal mask cannot express
        use_flash = (
            cfg.use_flash
            and kv_cache is None
            and isinstance(pos_offset, int)
            and pos_offset == 0
        )
        if use_flash:
            from roar_tpu.models.transformer import _flash_attention_available

            use_flash = _flash_attention_available()
        if use_flash:
            out = _causal_flash(q, k, v, mask, scale).reshape(b, t, nh * hs)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            t_k = k.shape[1]
            q_pos = pos_offset + jnp.arange(t)[:, None]
            k_pos = jnp.arange(t_k)[None, :]
            causal = k_pos <= q_pos  # [t, t_k]
            scores = jnp.where(causal[None, None], scores, -1e9)
            if mask is not None:
                scores = jnp.where(mask[:, None, None, :t_k], scores, -1e9)
            probs = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, nh * hs)
        out = nn.Dense(cfg.n_embd, use_bias=False, name="proj")(out)
        return out, new_cache


class Block(nn.Module):
    config: GPTConfig

    @nn.compact
    def __call__(self, x, pos_offset=0, kv_cache=None, mask=None):
        cfg = self.config
        mlp_cls = LLaMAMLP if cfg.mlp_class == "LLaMAMLP" else GptNeoxMLP
        h, new_cache = CausalSelfAttention(cfg, name="attn")(
            RMSNorm(cfg.norm_eps, name="norm_1")(x), pos_offset, kv_cache, mask
        )
        if cfg.parallel_residual:
            m = mlp_cls(cfg.intermediate_size or 4 * cfg.n_embd, name="mlp")(
                RMSNorm(cfg.norm_eps, name="norm_2")(x)
            )
            return x + h + m, new_cache
        x = x + h
        m = mlp_cls(cfg.intermediate_size or 4 * cfg.n_embd, name="mlp")(
            RMSNorm(cfg.norm_eps, name="norm_2")(x)
        )
        return x + m, new_cache


class GPT(nn.Module):
    """Token ids -> logits; supports full-sequence and cached decode."""

    config: GPTConfig

    @nn.compact
    def __call__(self, tokens, pos_offset=0, kv_caches=None, mask=None):
        cfg = self.config
        x = nn.Embed(cfg.vocab_size, cfg.n_embd, name="wte")(tokens)
        new_caches = []
        for i in range(cfg.n_layer):
            cache_i = kv_caches[i] if kv_caches is not None else None
            x, nc = Block(cfg, name=f"h_{i}")(x, pos_offset, cache_i, mask)
            new_caches.append(nc)
        x = RMSNorm(cfg.norm_eps, name="ln_f")(x)
        logits = nn.Dense(cfg.vocab_size, use_bias=False, name="lm_head")(x)
        if kv_caches is None:
            return logits
        return logits, new_caches


def init_kv_caches(cfg: GPTConfig, batch: int, dtype=jnp.float32):
    """Pre-allocated [B, block_size, groups, head_size] caches per layer."""
    shape = (batch, cfg.block_size, cfg.groups, cfg.head_size)
    return [
        (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
        for _ in range(cfg.n_layer)
    ]


def generate(
    model: GPT,
    params,
    prompt: jnp.ndarray,
    max_new_tokens: int,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    rng: Optional[jax.Array] = None,
):
    """Greedy / top-k sampling with KV cache, static shapes via lax.scan
    (text_generation utils analogue)."""
    cfg = model.config
    b, t0 = prompt.shape
    caches = init_kv_caches(cfg, b)
    # prefill
    logits, caches = model.apply(params, prompt, 0, caches)
    last_logits = logits[:, -1]
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    def sample(logits, key):
        if temperature == 0.0:
            return jnp.argmax(logits, axis=-1).astype(prompt.dtype)
        logits = logits / max(temperature, 1e-6)
        if top_k is not None:
            kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
            logits = jnp.where(logits < kth, -1e9, logits)
        return jax.random.categorical(key, logits).astype(prompt.dtype)

    def step(carry, i):
        caches, last_logits, key = carry
        key, sub = jax.random.split(key)
        tok = sample(last_logits, sub)
        logits, caches = model.apply(params, tok[:, None], t0 + i, caches)
        return (caches, logits[:, 0], key), tok

    (_, _, _), toks = jax.lax.scan(
        step, (caches, last_logits, rng), jnp.arange(max_new_tokens)
    )
    return jnp.concatenate([prompt, toks.swapaxes(0, 1)], axis=1)


# ---------------------------------------------------------------------------
# Pipeline-parallel forward (parallel/pp.py engine)
# ---------------------------------------------------------------------------

def stack_block_params(params, n_layer: int):
    """Split a GPT param tree into (stacked_blocks, rest).

    stacked_blocks carries a leading n_layer dim per leaf — the layout
    `parallel.pp.pipeline_apply` shards over the mesh 'pipe' axis.  rest
    holds wte / ln_f / lm_head.  Weight-compatible with `GPT.apply`: the
    pipelined forward below produces identical logits."""
    p = params["params"] if "params" in params else params
    blocks = [p[f"h_{i}"] for i in range(n_layer)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *blocks)
    rest = {k: v for k, v in p.items() if not k.startswith("h_")}
    return stacked, rest


def pipelined_gpt_apply(
    cfg: GPTConfig,
    stacked_blocks,
    rest,
    tokens: jnp.ndarray,
    mesh,
    n_micro: int,
    axis_name: str = "pipe",
    data_axis: Optional[str] = None,
):
    """Full-sequence GPT forward with the block stack pipelined over
    `mesh[axis_name]` (GPipe microbatching, `parallel/pp.py`).  Embedding,
    final norm and lm_head are replicated (cheap next to the blocks).

    The reference has no working PP (vestigial AppState fields only,
    roar/utils/app_state.py:130-160); this is the TPU-native upgrade:
    stages communicate activations over ICI via ppermute, autodiff gives
    the reverse pipeline for backward.
    """
    from flax import linen as nn  # local: keep module import light

    from roar_tpu.parallel.pp import pipeline_apply, scan_stage, split_microbatches

    block = Block(cfg)

    def apply_one(layer_params, x):
        y, _ = block.apply({"params": layer_params}, x)
        return y

    emb = nn.Embed(cfg.vocab_size, cfg.n_embd).apply(
        {"params": rest["wte"]}, tokens
    )
    mb = split_microbatches(emb, n_micro)
    out = pipeline_apply(
        scan_stage(apply_one), stacked_blocks, mb, mesh, axis_name, data_axis
    )
    x = out.reshape(emb.shape)
    x = RMSNorm(cfg.norm_eps).apply({"params": rest["ln_f"]}, x)
    return x @ rest["lm_head"]["kernel"]
