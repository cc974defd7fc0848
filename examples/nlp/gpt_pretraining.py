"""GPT causal-LM pretraining on a raw text corpus.

The reference carries a full GPT/TinyLLaMa module stack
(roar/collections/nlp/modules/gpt/gpt.py) but no data layer or training
entry point (README ToDo's unchecked "TinyLLaMa"); this CLI wires the
TPU-native GPT end to end: packed EOS-joined blocks -> next-token cross
entropy -> the shared supervised engine (data-parallel mesh, optional
tensor parallelism, orbax checkpoints, EMA, preemption).

    python examples/nlp/gpt_pretraining.py --config-name=gpt_pretraining \
        train_dataset=corpus.txt trainer.max_steps=1000

``train_dataset`` is a text file, one document per line.  Name a registry
architecture with ``model.config_name=tiny-llama-1.1b`` (fnmatch patterns
allowed; models/gpt.py GPT_CONFIGS) or set GPTConfig fields directly.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from roar_tpu.config.cli import config_runner
from roar_tpu.data.lm_dataset import CausalLMDataset, SimpleWordTokenizer
from roar_tpu.models.gpt_model import GPTLMModel
from roar_tpu.training.run import train_supervised


@config_runner(config_path=str(Path(__file__).resolve().parents[2] / "configs"),
               config_name="gpt_pretraining")
def main(cfg):
    mcfg = dict(cfg["model"])
    corpus_files = [cfg["train_dataset"]]
    if cfg.get("validation_dataset"):
        corpus_files.append(cfg["validation_dataset"])
    tokenizer = SimpleWordTokenizer(corpus_files, max_vocab=mcfg.get("vocab_size", 8000))
    mcfg["vocab_size"] = tokenizer.vocab_size
    seq_length = int(mcfg.get("seq_length", 512))
    mcfg.setdefault("block_size", seq_length)

    dataset = CausalLMDataset(tokenizer, cfg["train_dataset"], seq_length=seq_length)
    val_ds = (
        CausalLMDataset(tokenizer, cfg["validation_dataset"], seq_length=seq_length)
        if cfg.get("validation_dataset")
        else None
    )
    model = GPTLMModel(mcfg)
    cfg = dict(cfg)
    cfg["model"] = mcfg
    return train_supervised(cfg, model, dataset, val_ds)


if __name__ == "__main__":
    main()
