"""Sample text from a trained GPT causal-LM bundle.

Completes the NLP loop the reference never closed (its text_generation
utils have no model to drive): train with `gpt_pretraining.py` and
`exp_manager.always_save_roar=true`, then

    python examples/nlp/generate.py --model <exp>/checkpoints/GPTPretraining.roar \
        --corpus corpus.txt --prompt "the cat" \
        [--max-new-tokens 32] [--temperature 0.8] [--top-k 40]

`--corpus` rebuilds the SimpleWordTokenizer deterministically from the
same file(s) the training run saw (the vocabulary is a pure function of
the corpus and the configured cap).  Decoding runs with the static-shape
KV-cache `generate()` (models/gpt.py): one jitted prefill + lax.scan.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True, help=".roar bundle from gpt_pretraining")
    p.add_argument("--corpus", required=True, nargs="+",
                   help="training corpus file(s), to rebuild the tokenizer")
    p.add_argument("--prompt", default="the")
    p.add_argument("--max-new-tokens", type=int, default=32)
    p.add_argument("--temperature", type=float, default=0.8)
    p.add_argument("--top-k", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from roar_tpu.data.lm_dataset import SimpleWordTokenizer
    from roar_tpu.models.gpt import generate
    from roar_tpu.models.gpt_model import GPTLMModel
    from roar_tpu.training.save_restore import restore_from

    cfg, params = restore_from(args.model)
    mcfg = dict(cfg.get("model") or {})
    tokenizer = SimpleWordTokenizer(args.corpus, max_vocab=mcfg.get("vocab_size", 8000))
    if tokenizer.vocab_size != mcfg.get("vocab_size"):
        raise SystemExit(
            f"tokenizer rebuilt from {args.corpus} has vocab "
            f"{tokenizer.vocab_size} but the bundle was trained with "
            f"{mcfg.get('vocab_size')} — pass the same corpus file(s)"
        )
    model = GPTLMModel(mcfg)

    prompt_ids = tokenizer.text_to_ids(args.prompt) or [tokenizer.eos_id]
    prompt = jnp.asarray(np.asarray(prompt_ids, np.int32))[None]
    tokens = generate(
        model.module, params, prompt,
        max_new_tokens=args.max_new_tokens,
        temperature=args.temperature, top_k=args.top_k,
        rng=jax.random.PRNGKey(args.seed),
    )
    new = np.asarray(tokens)[0, len(prompt_ids):]
    print(args.prompt, " ".join(tokenizer.ids_to_tokens([int(t) for t in new])))


if __name__ == "__main__":
    main()
