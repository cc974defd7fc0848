"""BERT pretraining (MLM + NSP) on a raw text corpus.

The reference carries the full BERT pretraining data layer
(roar/collections/nlp/data/language_modelling/bert_dataset.py) and BERT
modules but no entry point; this CLI wires them end-to-end on the
TPU-native stack.

    python examples/nlp/bert_pretraining.py --config-name=bert_pretraining \
        train_dataset=corpus.txt trainer.max_steps=1000

``train_dataset`` is a text file, one sentence per line.  Pass
``model.preprocessed_files='[shard0.npz,...]'`` instead to train from
already-masked arrays (BertPretrainingPreprocessedDataset keys).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from roar_tpu.config.cli import config_runner
from roar_tpu.data.lm_dataset import BertPretrainingDataset, SimpleWordTokenizer
from roar_tpu.models.bert import BertPretrainingModel
from roar_tpu.training.run import train_supervised


@config_runner(config_path=str(Path(__file__).resolve().parents[2] / "configs"),
               config_name="bert_pretraining")
def main(cfg):
    mcfg = dict(cfg["model"])
    corpus_files = [cfg["train_dataset"]]
    if cfg.get("validation_dataset"):
        corpus_files.append(cfg["validation_dataset"])
    tokenizer = SimpleWordTokenizer(corpus_files, max_vocab=mcfg.get("vocab_size", 8000))
    mcfg["vocab_size"] = tokenizer.vocab_size

    def make_ds(path):
        return BertPretrainingDataset(
            tokenizer,
            path,
            max_seq_length=mcfg.get("max_seq_length", 128),
            mask_prob=mcfg.get("mask_prob", 0.15),
            short_seq_prob=mcfg.get("short_seq_prob", 0.1),
            seq_a_ratio=mcfg.get("seq_a_ratio", 0.6),
        )

    dataset = make_ds(cfg["train_dataset"])
    val_ds = make_ds(cfg["validation_dataset"]) if cfg.get("validation_dataset") else None
    model = BertPretrainingModel(mcfg)
    cfg = dict(cfg)
    cfg["model"] = mcfg
    return train_supervised(cfg, model, dataset, val_ds)


if __name__ == "__main__":
    main()
