"""Text-generation utilities: sampling transforms + the TextGeneration API.

Re-design of roar/collections/nlp/modules/common/text_generation.py:15-112
(LengthParam / SamplingParam / OutputType / TextGeneration interface) with
TPU-shaped mechanics: all sampling transforms are pure jnp functions usable
inside a jitted `lax.scan` decode loop, and generation runs with static
shapes (finished sequences keep "generating" but are masked — the standard
XLA early-stop pattern).
"""

from __future__ import annotations

from typing import List, Optional, TypedDict

import jax
import jax.numpy as jnp


class LengthParam(TypedDict):
    max_length: int
    min_length: int


class SamplingParam(TypedDict, total=False):
    use_greedy: bool
    temperature: float
    top_k: int
    top_p: float
    repetition_penalty: float
    add_BOS: bool
    all_probs: bool
    compute_logprob: bool
    end_strings: List[str]


class OutputType(TypedDict, total=False):
    sentences: List[str]
    tokens: List[List[str]]
    logprob: List[List[float]]
    full_logprob: List[List[float]]
    token_ids: List[List[int]]
    offsets: List[List[int]]


# ---- logits transforms (composable, jit-safe) --------------------------


def apply_temperature(logits: jnp.ndarray, temperature: float) -> jnp.ndarray:
    return logits / jnp.maximum(temperature, 1e-6)


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep the k highest-probability tokens; the rest get -inf."""
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def apply_top_p(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering: keep the smallest set of tokens whose cumulative
    probability reaches p (the token that crosses p is kept)."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens strictly before the crossing point, plus the crossing one
    keep_sorted = cum - probs < p
    # threshold logit = smallest kept logit
    thresh = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits < thresh, -jnp.inf, logits)


def apply_repetition_penalty(
    logits: jnp.ndarray, prev_tokens: jnp.ndarray, penalty: float
) -> jnp.ndarray:
    """CTRL-style penalty: logits of already-generated tokens are divided
    (if positive) or multiplied (if negative) by `penalty`.
    prev_tokens: [B, T_prev] token ids (may include padding repeats)."""
    vocab = logits.shape[-1]
    seen = jnp.zeros((logits.shape[0], vocab), bool).at[
        jnp.arange(logits.shape[0])[:, None], prev_tokens
    ].set(True)
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def sample_logits(
    logits: jnp.ndarray,
    key: jax.Array,
    use_greedy: bool = False,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
    repetition_penalty: float = 1.0,
    prev_tokens: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One sampling step [B, vocab] -> [B] applying the SamplingParam knobs
    in the reference's order (repetition penalty, temperature, top-k, top-p)."""
    if repetition_penalty != 1.0 and prev_tokens is not None:
        logits = apply_repetition_penalty(logits, prev_tokens, repetition_penalty)
    if use_greedy or temperature == 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = apply_temperature(logits, temperature)
    if top_k and top_k > 0:
        logits = apply_top_k(logits, top_k)
    if top_p and 0.0 < top_p < 1.0:
        logits = apply_top_p(logits, top_p)
    return jax.random.categorical(key, logits)


# ---- generation driver -------------------------------------------------


def generate_tokens(
    model,
    params,
    prompt: jnp.ndarray,
    length_params: Optional[LengthParam] = None,
    sampling_params: Optional[SamplingParam] = None,
    end_id: Optional[int] = None,
    rng: Optional[jax.Array] = None,
):
    """KV-cached decode with the full SamplingParam surface.

    Returns (token_ids [B, T0+max_length], logprob [B, max_length]) — the
    tensor core of the reference OutputType; string detokenization is the
    caller's tokenizer's job.  Finished rows (emitted `end_id`) keep static
    shape and repeat end_id (min_length suppresses end_id before it)."""
    from roar_tpu.models.gpt import init_kv_caches

    lp: LengthParam = {"max_length": 30, "min_length": 0, **(length_params or {})}
    sp: SamplingParam = {"use_greedy": True, "temperature": 1.0, "top_k": 0,
                         "top_p": 0.0, "repetition_penalty": 1.0,
                         **(sampling_params or {})}
    cfg = model.config
    b, t0 = prompt.shape
    max_new = int(lp["max_length"])
    min_len = int(lp.get("min_length") or 0)
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    caches = init_kv_caches(cfg, b)
    logits, caches = model.apply(params, prompt, 0, caches)
    last_logits = logits[:, -1]

    def step(carry, i):
        caches, last_logits, prev, finished, key = carry
        key, sub = jax.random.split(key)
        logits = last_logits
        if end_id is not None and min_len > 0:
            # suppress the end token before min_length
            logits = jnp.where(
                (i < min_len) & (jnp.arange(cfg.vocab_size)[None] == end_id),
                -jnp.inf,
                logits,
            )
        tok = sample_logits(
            logits,
            sub,
            use_greedy=bool(sp["use_greedy"]),
            temperature=float(sp["temperature"]),
            top_k=int(sp["top_k"]),
            top_p=float(sp["top_p"]),
            repetition_penalty=float(sp["repetition_penalty"]),
            prev_tokens=prev,
        ).astype(prompt.dtype)
        if end_id is not None:
            tok = jnp.where(finished, jnp.asarray(end_id, prompt.dtype), tok)
            finished = finished | (tok == end_id)
        logp = jax.nn.log_softmax(last_logits.astype(jnp.float32), axis=-1)
        tok_logp = jnp.take_along_axis(logp, tok[:, None].astype(jnp.int32), 1)[:, 0]
        new_logits, caches = model.apply(params, tok[:, None], t0 + i, caches)
        prev = jax.lax.dynamic_update_slice_in_dim(prev, tok[:, None], t0 + i, 1)
        return (caches, new_logits[:, 0], prev, finished, key), (tok, tok_logp)

    prev0 = jnp.concatenate(
        [prompt, jnp.zeros((b, max_new), prompt.dtype)], axis=1
    )
    finished0 = jnp.zeros((b,), bool)
    (_, _, _, _, _), (toks, logps) = jax.lax.scan(
        step, (caches, last_logits, prev0, finished0, rng), jnp.arange(max_new)
    )
    token_ids = jnp.concatenate([prompt, toks.swapaxes(0, 1)], axis=1)
    return token_ids, logps.swapaxes(0, 1)


class TextGeneration:
    """The reference TextGeneration interface (text_generation.py:43-112)
    over a GPT model + tokenizer: strings in, OutputType dict out."""

    def __init__(self, model, params, tokenizer, end_id: Optional[int] = None):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.end_id = end_id

    def parse(self, str_input: str):
        import numpy as np

        ids = self.tokenizer(str_input)
        return jnp.asarray(np.asarray(ids, np.int32))[None]

    def generate(
        self,
        inputs,
        length_params: Optional[LengthParam] = None,
        sampling_params: Optional[SamplingParam] = None,
        rng: Optional[jax.Array] = None,
    ) -> OutputType:
        import numpy as np

        if isinstance(inputs, (list, tuple)) and inputs and isinstance(inputs[0], str):
            rows = [np.asarray(self.tokenizer(s), np.int32) for s in inputs]
            t0 = max(len(r) for r in rows)
            prompt = np.zeros((len(rows), t0), np.int32)
            for i, r in enumerate(rows):
                prompt[i, : len(r)] = r
            prompt = jnp.asarray(prompt)
        else:
            prompt, _lens = inputs
            prompt = jnp.asarray(prompt)

        token_ids, logps = generate_tokens(
            self.model, self.params, prompt, length_params, sampling_params,
            end_id=self.end_id, rng=rng,
        )
        ids = np.asarray(token_ids)
        out: OutputType = {
            "token_ids": [list(map(int, row)) for row in ids],
            "logprob": [list(map(float, row)) for row in np.asarray(logps)],
        }
        decode = getattr(self.tokenizer, "decode", None)
        if decode is not None:
            out["sentences"] = [decode(list(map(int, row))) for row in ids]
        return out
