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


def find_multiple(n: int, k: int) -> int:
    """Smallest multiple of k that is >= n (vocab padding for the MXU)."""
    return n if n % k == 0 else n + k - (n % k)


@dataclasses.dataclass(frozen=True)
class GPTConfig:
    """Architecture config (nlp/modules/gpt/config.py registry analogue).

    Field parity with the reference Config dataclass (config.py:17-66):
    head_dim <-> head_size override, padded_vocab_size/padding_multiple,
    scale_embeddings (Gemma), bias/lm_head_bias, shared_attention_norm
    (falcon-7b, phi), norm_class Layer/RMS, gelu_approximate (phi, Gemma),
    rope_base/rope_condense_ratio (CodeLlama, 16k-context chat tunes),
    n_expert/n_expert_per_token (Mixtral LLaMAMoE).  padding_multiple
    defaults 1 (not the reference's 512) so ad-hoc configs keep their exact
    vocab; registry entries carry explicit padding."""

    vocab_size: int = 32000
    block_size: int = 2048
    n_layer: int = 22
    n_head: int = 32
    n_embd: int = 2048
    head_dim: Optional[int] = None  # head_size override (Gemma-7b: 256)
    n_query_groups: Optional[int] = 4  # GQA; None -> MHA
    intermediate_size: Optional[int] = 5632
    rotary_percentage: float = 1.0
    norm_eps: float = 1e-5
    norm_class: str = "RMSNorm"  # or "LayerNorm"
    mlp_class: str = "LLaMAMLP"  # or GptNeoxMLP | GemmaMLP | LLaMAMoE
    gelu_approximate: str = "none"  # 'tanh' for phi / Gemma
    parallel_residual: bool = False
    shared_attention_norm: bool = False  # falcon-7b / phi style
    bias: bool = False  # linear-layer biases (GPT-NeoX lineage: True)
    lm_head_bias: bool = False  # phi
    scale_embeddings: bool = False  # Gemma: x *= sqrt(n_embd)
    padded_vocab_size: Optional[int] = None
    padding_multiple: int = 1
    rope_base: float = 10000.0
    rope_condense_ratio: float = 1.0
    n_expert: int = 0  # Mixtral MoE
    n_expert_per_token: int = 0
    # Pallas TPU flash attention for the TRAINING path (tuned wide-block
    # kernel: measured 2.6-3.3x over SDPA at seq 4096-8192, DESIGN.md 7c).
    # KV-cache decode — including generate()'s cache-prefill call — and
    # nonzero pos_offset always use the einsum path.
    use_flash: bool = False
    # Layer-stacked training: `scan_layers` compiles ONE Block and runs it
    # under lax.scan with parameters stacked [n_layer, ...] (compile time
    # and HLO size O(1) in depth); `remat` wraps each Block in
    # jax.checkpoint so the backward recomputes block activations instead
    # of storing them — together these are what lets tiny-llama-1.1b train
    # at seq 4096 inside one v5e chip's HBM.  Training-path only: KV-cache
    # decode keeps the unrolled h_{i} layout (use unstack_block_params to
    # convert a scanned checkpoint for decode).
    scan_layers: bool = False
    remat: bool = False
    # "nothing": store nothing, recompute the whole block (max memory
    # savings); "flash": store the flash kernel's out/l/m residuals so the
    # backward pass skips the forward-kernel recompute (~17 MB/layer at
    # B=1 S=4096; measured -116 ms on the 1.1B step, DESIGN.md §7i).
    remat_policy: str = "nothing"

    @property
    def head_size(self) -> int:
        return self.head_dim or self.n_embd // self.n_head

    @property
    def groups(self) -> int:
        return self.n_query_groups or self.n_head

    @property
    def rope_n_elem(self) -> int:
        return int(self.rotary_percentage * self.head_size)

    @property
    def padded_vocab(self) -> int:
        return self.padded_vocab_size or find_multiple(
            self.vocab_size, self.padding_multiple
        )


# ---------------------------------------------------------------------------
# Named-architecture registry (nlp/modules/gpt/config.py:17 `Config.from_name`
# analogue).  Hyperparameters are the public HF model-card values; families:
# Pythia/Dolly/RedPajama (GPT-NeoX lineage), Falcon, Llama-2 + derivatives
# (vicuna, longchat, Nous-Hermes, Platypus, FreeWilly2, function-calling,
# 32K rope-condensed), open_llama, CodeLlama, TinyLlama, StableLM/StableCode,
# phi, Gemma, Mistral/Mixtral (MoE).  Family traits are encoded once in the
# builders below; per-model rows carry only what differs.
# ---------------------------------------------------------------------------


def _neox(n_layer, n_head, n_embd, *, rotary=0.25, parallel=True, **kw):
    """GPT-NeoX lineage (Pythia/Dolly/RedPajama/StableLM-alpha): LayerNorm,
    biased linears, GptNeoxMLP, 0.25 rotary unless overridden."""
    kw.setdefault("vocab_size", 50254)
    kw.setdefault("padding_multiple", 128)
    kw.setdefault("block_size", 2048)
    kw.setdefault("intermediate_size", 4 * n_embd)
    return GPTConfig(
        n_layer=n_layer, n_head=n_head, n_embd=n_embd, n_query_groups=None,
        rotary_percentage=rotary, parallel_residual=parallel, bias=True,
        norm_class="LayerNorm", mlp_class="GptNeoxMLP", **kw,
    )


def _llama(n_layer, n_head, n_embd, intermediate, *, groups=None, **kw):
    """Llama lineage: RMSNorm, SwiGLU, full rotary, no biases."""
    kw.setdefault("vocab_size", 32000)
    kw.setdefault("padding_multiple", 64)
    kw.setdefault("block_size", 4096)
    return GPTConfig(
        n_layer=n_layer, n_head=n_head, n_embd=n_embd,
        intermediate_size=intermediate, n_query_groups=groups,
        rotary_percentage=1.0, parallel_residual=False, bias=False,
        norm_class="RMSNorm", mlp_class="LLaMAMLP", **kw,
    )


def _falcon(n_layer, n_head, n_embd, *, groups, **kw):
    return GPTConfig(
        vocab_size=65024, padded_vocab_size=65024, block_size=2048,
        n_layer=n_layer, n_head=n_head, n_embd=n_embd, head_dim=64,
        n_query_groups=groups, intermediate_size=4 * n_embd,
        rotary_percentage=1.0, parallel_residual=True, bias=False,
        norm_class="LayerNorm", mlp_class="GptNeoxMLP", **kw,
    )


def _phi(n_layer, n_embd, rotary):
    return GPTConfig(
        vocab_size=50257, padded_vocab_size=51200, block_size=2048,
        n_layer=n_layer, n_head=32, n_embd=n_embd, n_query_groups=None,
        intermediate_size=4 * n_embd, rotary_percentage=rotary,
        parallel_residual=True, shared_attention_norm=True, bias=True,
        lm_head_bias=True, norm_class="LayerNorm", mlp_class="GptNeoxMLP",
        gelu_approximate="tanh",
    )


def _gemma(n_layer, n_head, n_embd, intermediate, *, groups=None, head_dim=None):
    return GPTConfig(
        vocab_size=256000, padding_multiple=64, block_size=8192,
        n_layer=n_layer, n_head=n_head, n_embd=n_embd, head_dim=head_dim,
        n_query_groups=groups, intermediate_size=intermediate,
        rotary_percentage=1.0, parallel_residual=False, bias=False,
        norm_class="RMSNorm", mlp_class="GemmaMLP", gelu_approximate="tanh",
        scale_embeddings=True,
    )


def _mistral(*, block_size, mlp="LLaMAMLP", **kw):
    return GPTConfig(
        vocab_size=32000, padded_vocab_size=32000, block_size=block_size,
        n_layer=32, n_head=32, n_embd=4096, n_query_groups=8,
        intermediate_size=14336, rotary_percentage=1.0,
        parallel_residual=False, bias=False, norm_class="RMSNorm",
        mlp_class=mlp, **kw,
    )


def _stablelm_4e1t(**kw):
    """stablelm-3b-4e1t generation: SwiGLU + LayerNorm + 0.25 rotary."""
    kw.setdefault("block_size", 4096)
    return GPTConfig(
        vocab_size=50254, padded_vocab_size=50304, n_layer=32, n_head=32,
        n_embd=2560, n_query_groups=None, intermediate_size=6912,
        rotary_percentage=0.25, parallel_residual=False, bias=False,
        norm_class="LayerNorm", mlp_class="LLaMAMLP", **kw,
    )


def _expand(table: Dict[str, tuple]) -> Dict[str, GPTConfig]:
    """Expand '{}'-template names (reference config.py style): the tuple is
    (config, [suffixes]); 'falcon-7b{}' + ['', '-instruct'] -> two entries."""
    out: Dict[str, GPTConfig] = {}
    for name, (cfg, suffixes) in table.items():
        for s in suffixes:
            out[name.format(s)] = cfg
    return out


_LLAMA2_7B = _llama(32, 32, 4096, 11008)
_LLAMA2_13B = _llama(40, 40, 5120, 13824)
_LLAMA2_70B = _llama(80, 64, 8192, 28672, groups=8)
_CODELLAMA = dict(block_size=16384, rope_base=1000000.0, norm_eps=1e-5)

GPT_CONFIGS: Dict[str, GPTConfig] = {
    # --- Pythia (EleutherAI suite, 14m..12b) + Dolly-v2 / RedPajama tunes ---
    "pythia-14m": _neox(6, 4, 128, block_size=512),
    "pythia-31m": _neox(6, 8, 256, block_size=1024),
    "pythia-70m": _neox(6, 8, 512),
    "pythia-160m": _neox(12, 12, 768),
    "pythia-410m": _neox(24, 16, 1024),
    "pythia-1b": _neox(16, 8, 2048),
    "pythia-1.4b": _neox(24, 16, 2048),
    "pythia-2.8b": _neox(32, 32, 2560),
    "pythia-6.9b": _neox(32, 32, 4096, padding_multiple=256),
    "pythia-12b": _neox(36, 40, 5120),
    "dolly-v2-3b": _neox(32, 32, 2560, padded_vocab_size=50280),
    "dolly-v2-7b": _neox(32, 32, 4096, padded_vocab_size=50280),
    "dolly-v2-12b": _neox(36, 40, 5120, padded_vocab_size=50280),
    # --- open_llama ---
    "open_llama_3b": _llama(26, 32, 3200, 8640, block_size=2048, norm_eps=1e-6),
    "open_llama_7b": _llama(32, 32, 4096, 11008, block_size=2048, norm_eps=1e-6),
    "open_llama_13b": _llama(40, 40, 5120, 13824, block_size=2048, norm_eps=1e-6),
    # --- vicuna / longchat (llama chat tunes; v1.5-16k condenses rope 4x) ---
    "vicuna-7b-v1.3": _llama(32, 32, 4096, 11008, block_size=2048, norm_eps=1e-6),
    "vicuna-13b-v1.3": _llama(40, 40, 5120, 13824, block_size=2048, norm_eps=1e-6),
    "vicuna-33b-v1.3": _llama(60, 52, 6656, 17920, block_size=2048, norm_eps=1e-6),
    "vicuna-7b-v1.5": _llama(32, 32, 4096, 11008),
    "vicuna-7b-v1.5-16k": _llama(
        32, 32, 4096, 11008, block_size=16384, rope_condense_ratio=4.0
    ),
    "vicuna-13b-v1.5": _llama(40, 40, 5120, 13824),
    "vicuna-13b-v1.5-16k": _llama(
        40, 40, 5120, 13824, block_size=16384, rope_condense_ratio=4.0
    ),
    "longchat-7b-16k": _llama(
        32, 32, 4096, 11008, block_size=16384, norm_eps=1e-6,
        rope_condense_ratio=8.0,
    ),
    "longchat-13b-16k": _llama(
        40, 40, 5120, 13824, block_size=16384, norm_eps=1e-6,
        rope_condense_ratio=8.0,
    ),
    # --- Nous-Hermes / Platypus / FreeWilly2 (llama fine-tune shapes) ---
    "Nous-Hermes-llama-2-7b": _llama(32, 32, 4096, 11008, padded_vocab_size=32000),
    "Nous-Hermes-13b": _llama(
        40, 40, 5120, 13824, block_size=2048, norm_eps=1e-6,
        padded_vocab_size=32001,
    ),
    "Nous-Hermes-Llama2-13b": _llama(40, 40, 5120, 13824, padded_vocab_size=32032),
    "Platypus-30B": _llama(
        60, 52, 6656, 17920, block_size=2048, norm_eps=1e-6,
        padded_vocab_size=32000,
    ),
    "Platypus2-7B": _llama(32, 32, 4096, 11008, padded_vocab_size=32000),
    "Platypus2-13B": _llama(40, 40, 5120, 13824, padded_vocab_size=32000),
    "Platypus2-70B": _llama(80, 64, 8192, 28672, padded_vocab_size=32000),
    "Platypus2-70B-instruct": _llama(
        80, 64, 8192, 28672, groups=8, padded_vocab_size=32000
    ),
    "Camel-Platypus2-13B": _llama(40, 40, 5120, 13824, padded_vocab_size=32000),
    "Camel-Platypus2-70B": _llama(
        80, 64, 8192, 28672, groups=8, padded_vocab_size=32000
    ),
    "Stable-Platypus2-13B": _llama(40, 40, 5120, 13824, padded_vocab_size=32000),
    "FreeWilly2": _llama(80, 64, 8192, 28672, groups=8, padded_vocab_size=32000),
    "LLaMA-2-7B-32K": _llama(32, 32, 4096, 11008, rope_condense_ratio=8.0),
    "Llama-2-7b-chat-hf-function-calling-v2": _llama(
        32, 32, 4096, 11008, norm_eps=1e-6
    ),
    # --- phi / Gemma ---
    "phi-1_5": _phi(24, 2048, 0.5),
    "phi-2": _phi(32, 2560, 0.4),
    "gemma-2b": _gemma(18, 8, 2048, 16384, groups=1),
    "gemma-7b": _gemma(28, 16, 3072, 24576, head_dim=256),
    # --- Mistral / Mixtral ---
    "Mistral-7B-v0.2": _mistral(block_size=32768),
    "Mistral-7B-Instruct-v0.2": _mistral(block_size=32768),
    # --- StableLM / StableCode ---
    "stablelm-base-alpha-3b": _neox(
        16, 32, 4096, block_size=4096, padding_multiple=512
    ),
    "stablelm-base-alpha-7b": _neox(
        16, 48, 6144, block_size=4096, padding_multiple=256
    ),
    "stablelm-tuned-alpha-3b": _neox(
        16, 32, 4096, block_size=4096, padding_multiple=512
    ),
    "stablelm-tuned-alpha-7b": _neox(
        16, 48, 6144, block_size=4096, padding_multiple=256
    ),
    "stablelm-3b-4e1t": _stablelm_4e1t(),
    "stablelm-zephyr-3b": _stablelm_4e1t(),
    "stable-code-3b": _stablelm_4e1t(block_size=16384),
    "stablecode-completion-alpha-3b": _neox(
        32, 32, 2560, vocab_size=49152, block_size=16384
    ),
    "stablecode-completion-alpha-3b-4k": _neox(
        32, 32, 2560, vocab_size=49152, block_size=4096
    ),
    "stablecode-instruct-alpha-3b": _neox(
        32, 32, 2560, vocab_size=49152, block_size=4096
    ),
    # legacy aliases kept from earlier rounds
    "tiny-llama-1.1b": _llama(22, 32, 2048, 5632, groups=4, block_size=2048),
    "llama-2-7b": _LLAMA2_7B,
    "llama-2-13b": _LLAMA2_13B,
    "llama-2-70b": _LLAMA2_70B,
    "open-llama-3b": _llama(26, 32, 3200, 8640, block_size=2048, norm_eps=1e-6),
    **_expand({
        "falcon-7b{}": (
            _falcon(32, 71, 4544, groups=1, shared_attention_norm=True),
            ["", "-instruct"],
        ),
        "falcon-40b{}": (_falcon(60, 128, 8192, groups=8), ["", "-instruct"]),
        "falcon-180B{}": (_falcon(80, 232, 14848, groups=8), ["", "-chat"]),
        "Llama-2-7b{}-hf": (_LLAMA2_7B, ["", "-chat"]),
        "Llama-2-13b{}-hf": (_LLAMA2_13B, ["", "-chat"]),
        "Llama-2-70b{}-hf": (_LLAMA2_70B, ["", "-chat"]),
        "TinyLlama-1.1B{}": (
            _llama(22, 32, 2048, 5632, groups=4, block_size=2048),
            ["-intermediate-step-1431k-3T", "-Chat-v1.0"],
        ),
        "RedPajama-INCITE-{}-3B-v1": (
            _neox(32, 32, 2560, rotary=1.0, parallel=False,
                  padding_multiple=256),
            ["Base", "Chat", "Instruct"],
        ),
        "RedPajama-INCITE-7B-{}": (
            _neox(32, 32, 4096, rotary=1.0, parallel=False,
                  padding_multiple=256),
            ["Base", "Chat", "Instruct"],
        ),
        "RedPajama-INCITE-{}-7B-v0.1": (
            _neox(32, 32, 4096, rotary=1.0, parallel=False,
                  padding_multiple=256),
            ["Base", "Chat", "Instruct"],
        ),
        "CodeLlama-7b{}-hf": (
            _llama(32, 32, 4096, 11008, vocab_size=32016,
                   padding_multiple=16, **_CODELLAMA),
            ["", "-Python", "-Instruct"],
        ),
        "CodeLlama-13b{}-hf": (
            _llama(40, 40, 5120, 13824, vocab_size=32016,
                   padding_multiple=16, **_CODELLAMA),
            ["", "-Python", "-Instruct"],
        ),
        "CodeLlama-34b{}-hf": (
            _llama(48, 64, 8192, 22016, groups=8,
                   padded_vocab_size=32000, **_CODELLAMA),
            ["", "-Python", "-Instruct"],
        ),
        "CodeLlama-70b{}-hf": (
            _llama(80, 64, 8192, 28672, groups=8, vocab_size=32016,
                   padding_multiple=16, **_CODELLAMA),
            ["", "-Python", "-Instruct"],
        ),
        "Mistral-7B-{}v0.1": (_mistral(block_size=4096), ["", "Instruct-"]),
        "Mixtral-8x7B-{}v0.1": (
            _mistral(block_size=32768, mlp="LLaMAMoE", rope_base=1000000.0,
                     n_expert=8, n_expert_per_token=2),
            ["", "Instruct-"],
        ),
    }),
}


def config_from_name(name: str, **overrides) -> GPTConfig:
    """Resolve a config by exact name or shell-style pattern
    (`Config.from_name` semantics: 'pythia-1*' matches the first entry;
    kwargs override fields, config.py:101-115)."""
    cfg = GPT_CONFIGS.get(name)
    if cfg is None:
        # case-insensitive exact match (the reference resolves e.g. both
        # "Gemma-2b" and "gemma-2b", config.py name= vs hf_config name)
        lowered = {k.lower(): v for k, v in GPT_CONFIGS.items()}
        cfg = lowered.get(name.lower())
    if cfg is None:
        import fnmatch

        for key in GPT_CONFIGS:
            if fnmatch.fnmatch(key, name) or fnmatch.fnmatch(
                key.lower(), name.lower()
            ):
                cfg = GPT_CONFIGS[key]
                break
        else:
            raise ValueError(
                f"unknown GPT config {name!r}; known: {sorted(GPT_CONFIGS)}"
            )
    return dataclasses.replace(cfg, **overrides) if overrides else cfg


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
    bias: bool = False

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        gate = nn.Dense(self.intermediate_size, use_bias=self.bias, name="fc_1")(x)
        up = nn.Dense(self.intermediate_size, use_bias=self.bias, name="fc_2")(x)
        return nn.Dense(d, use_bias=self.bias, name="proj")(nn.silu(gate) * up)


class GemmaMLP(nn.Module):
    """Gemma's GeGLU: gelu_tanh(x W1) * (x W3) W2."""

    intermediate_size: int
    bias: bool = False

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        gate = nn.Dense(self.intermediate_size, use_bias=self.bias, name="fc_1")(x)
        up = nn.Dense(self.intermediate_size, use_bias=self.bias, name="fc_2")(x)
        return nn.Dense(d, use_bias=self.bias, name="proj")(
            nn.gelu(gate, approximate=True) * up
        )


class GptNeoxMLP(nn.Module):
    intermediate_size: int
    bias: bool = True
    gelu_approximate: str = "none"

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.gelu(
            nn.Dense(self.intermediate_size, use_bias=self.bias, name="fc")(x),
            approximate=self.gelu_approximate == "tanh",
        )
        return nn.Dense(d, use_bias=self.bias, name="proj")(h)


def _make_mlp(cfg: "GPTConfig", name: str) -> nn.Module:
    inter = cfg.intermediate_size or 4 * cfg.n_embd
    if cfg.mlp_class == "LLaMAMLP":
        return LLaMAMLP(inter, bias=cfg.bias, name=name)
    if cfg.mlp_class == "GemmaMLP":
        return GemmaMLP(inter, bias=cfg.bias, name=name)
    if cfg.mlp_class == "GptNeoxMLP":
        return GptNeoxMLP(
            inter, bias=cfg.bias, gelu_approximate=cfg.gelu_approximate,
            name=name,
        )
    if cfg.mlp_class == "LLaMAMoE":
        from roar_tpu.models.moe import MoEMLP

        return MoEMLP(
            n_experts=cfg.n_expert, ff_dim=inter,
            top_k=cfg.n_expert_per_token, name=name,
        )
    raise ValueError(f"unknown mlp_class {cfg.mlp_class!r}")


def _make_norm(cfg: "GPTConfig", name: str) -> nn.Module:
    if cfg.norm_class == "RMSNorm":
        return RMSNorm(cfg.norm_eps, name=name)
    return nn.LayerNorm(epsilon=cfg.norm_eps, name=name)


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
    if seg is None:
        # remat-friendly wrapper: same kernels, but the VJP residuals are
        # checkpoint_name'd so remat_policy="flash" can store them instead
        # of re-running the forward kernel in the backward pass
        # (ops/flash_remat.py; bit-identical grads either way).
        from roar_tpu.ops.flash_remat import flash_attention_saveable

        out = flash_attention_saveable(
            qt, kt, vt, causal=True, sm_scale=scale,
            block_sizes=_flash_block_sizes(t_pad),
        )
    else:
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
        qkv = nn.Dense((nh + 2 * ng) * hs, use_bias=cfg.bias, name="attn")(x)
        q, k, v = jnp.split(qkv, [nh * hs, (nh + ng) * hs], axis=-1)
        q = q.reshape(b, t, nh, hs)
        k = k.reshape(b, t, ng, hs)
        v = v.reshape(b, t, ng, hs)

        cos, sin = build_rope_cache(
            cfg.block_size, cfg.rope_n_elem, base=cfg.rope_base,
            condense_ratio=cfg.rope_condense_ratio,
        )
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

        rep = nh // ng
        # float(): a np.float64 scalar is strong-typed and would promote
        # bf16 scores to fp32; a Python float stays weak-typed
        scale = float(1.0 / np.sqrt(hs))
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
            # the Pallas kernel wants equal q/kv head counts; materializing
            # the repeat is fine here — training is compute-bound
            kf = jnp.repeat(k, rep, axis=2)
            vf = jnp.repeat(v, rep, axis=2)
            out = _causal_flash(q, kf, vf, mask, scale).reshape(b, t, nh * hs)
        else:
            # GQA without materializing per-head K/V: fold the group into
            # the contraction instead of jnp.repeat-ing K/V rep× (which at
            # decode shapes dominated HBM traffic — ~12 GB/step of the 32
            # measured at tiny-llama B8/kv2048, DESIGN.md §7c).  Head
            # h = g*rep + r of the repeat formulation is exactly
            # q5[..., g, r, :], so outputs are bit-identical in layout.
            q5 = q.reshape(b, t, ng, rep, hs)
            scores = jnp.einsum("bqgrd,bkgd->bgrqk", q5, k) * scale
            t_k = k.shape[1]
            q_pos = pos_offset + jnp.arange(t)[:, None]
            k_pos = jnp.arange(t_k)[None, :]
            causal = k_pos <= q_pos  # [t, t_k]
            scores = jnp.where(causal[None, None, None], scores, -1e9)
            if mask is not None:
                scores = jnp.where(mask[:, None, None, None, :t_k], scores, -1e9)
            probs = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bgrqk,bkgd->bqgrd", probs, v).reshape(
                b, t, nh * hs
            )
        out = nn.Dense(cfg.n_embd, use_bias=cfg.bias, name="proj")(out)
        return out, new_cache


class Block(nn.Module):
    config: GPTConfig

    @nn.compact
    def __call__(self, x, pos_offset=0, kv_cache=None, mask=None):
        cfg = self.config

        def run_mlp(h_in):
            out = _make_mlp(cfg, "mlp")(h_in)
            if cfg.mlp_class == "LLaMAMoE":  # MoEMLP returns (y, aux losses)
                out, aux = out
                self.sow("intermediates", "moe_aux", aux)
            return out

        x_norm = _make_norm(cfg, "norm_1")(x)
        h, new_cache = CausalSelfAttention(cfg, name="attn")(
            x_norm, pos_offset, kv_cache, mask
        )
        if cfg.parallel_residual:
            # falcon-7b / phi share norm_1 between the attn and mlp branches
            m_in = (
                x_norm
                if cfg.shared_attention_norm
                else _make_norm(cfg, "norm_2")(x)
            )
            return x + h + run_mlp(m_in), new_cache
        x = x + h
        return x + run_mlp(_make_norm(cfg, "norm_2")(x)), new_cache


class GPT(nn.Module):
    """Token ids -> logits; supports full-sequence and cached decode."""

    config: GPTConfig

    @nn.compact
    def __call__(self, tokens, pos_offset=0, kv_caches=None, mask=None,
                 return_hidden: bool = False):
        """``return_hidden=True`` skips the lm_head projection and returns
        the post-ln_f hiddens [B, T, D] — the input the fused
        cross-entropy loss (ops/fused_ce.py) projects tile-by-tile so the
        [B, T, V] logits never hit HBM.  Init always runs the default path
        so lm_head parameters exist either way."""
        cfg = self.config
        x = nn.Embed(cfg.padded_vocab, cfg.n_embd, name="wte")(tokens)
        if cfg.scale_embeddings:  # Gemma
            x = x * jnp.asarray(np.sqrt(cfg.n_embd), x.dtype)
        new_caches = []
        remat_kwargs = {}
        if cfg.remat and cfg.remat_policy == "flash":
            from roar_tpu.ops.flash_remat import flash_remat_policy

            remat_kwargs["policy"] = flash_remat_policy()
        if cfg.scan_layers and kv_caches is None:
            # one compiled Block under lax.scan, params stacked [n_layer,…];
            # with cfg.remat the backward recomputes each block instead of
            # storing its activations.  pos_offset stays a static argnum so
            # the flash-eligibility check (isinstance int) survives remat.
            block_cls = (
                nn.remat(Block, static_argnums=(2,), prevent_cse=False,
                         **remat_kwargs)
                if cfg.remat
                else Block
            )
            blocks = nn.scan(
                block_cls,
                variable_axes={"params": 0, "intermediates": 0},
                split_rngs={"params": True},
                length=cfg.n_layer,
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
            )(cfg, name="h_scan")
            x, _ = blocks(x, pos_offset, None, mask)
        else:
            if cfg.scan_layers:
                raise ValueError(
                    "scan_layers is a training-path option; for KV-cache "
                    "decode convert the checkpoint with unstack_block_params "
                    "and use scan_layers=False"
                )
            block_cls = (
                nn.remat(Block, static_argnums=(2,), prevent_cse=False,
                         **remat_kwargs)
                if cfg.remat
                else Block
            )
            for i in range(cfg.n_layer):
                cache_i = kv_caches[i] if kv_caches is not None else None
                x, nc = block_cls(cfg, name=f"h_{i}")(x, pos_offset, cache_i, mask)
                new_caches.append(nc)
        x = _make_norm(cfg, "ln_f")(x)
        if return_hidden:
            if self.is_initializing():
                # still create lm_head so params are path-independent
                nn.Dense(cfg.padded_vocab, use_bias=cfg.lm_head_bias,
                         name="lm_head")(x[:, :1])
            return x if kv_caches is None else (x, new_caches)
        logits = nn.Dense(
            cfg.padded_vocab, use_bias=cfg.lm_head_bias, name="lm_head"
        )(x)
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


def scan_params_from_unrolled(params, n_layer: int):
    """Unrolled (h_0..h_{L-1}) GPT param tree -> the `scan_layers=True`
    layout (single `h_scan` subtree with leading n_layer dim per leaf)."""
    stacked, rest = stack_block_params(params, n_layer)
    out = dict(rest)
    out["h_scan"] = stacked
    return {"params": out} if "params" in params else out


def unstack_block_params(params, n_layer: int):
    """`scan_layers=True` (h_scan stacked) tree -> unrolled h_{i} tree, for
    KV-cache decode with a scan-trained checkpoint."""
    p = params["params"] if "params" in params else params
    stacked = p["h_scan"]
    out = {k: v for k, v in p.items() if k != "h_scan"}
    for i in range(n_layer):
        out[f"h_{i}"] = jax.tree_util.tree_map(lambda x, i=i: x[i], stacked)
    return {"params": out} if "params" in params else out


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
