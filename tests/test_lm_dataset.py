"""BERT pretraining data pipeline (data/lm_dataset.py) + model heads.

Covers the reference bert_dataset.py semantics: newline indexing,
sentence-pair construction with static shapes, whole-word MLM 80/10/10
masking statistics, NSP labels, the preprocessed-array variant, the
sharded file loader, and a 2-step BertPretrainingModel train smoke."""

import numpy as np
import pytest

from roar_tpu.data.lm_dataset import (
    BertPretrainingDataset,
    BertPretrainingFileLoader,
    BertPretrainingPreprocessedDataset,
    SimpleWordTokenizer,
    find_newlines,
)

WORDS = [
    "the", "cat", "sat", "on", "a", "mat", "dogs", "bark", "at", "night",
    "rivers", "flow", "to", "sea", "birds", "fly", "south", "in", "winter",
    "code", "compiles", "slowly", "tests", "pass", "quickly",
]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    rng = np.random.default_rng(0)
    path = tmp_path_factory.mktemp("lm") / "corpus.txt"
    lines = [
        " ".join(rng.choice(WORDS, size=rng.integers(4, 12)))
        for _ in range(200)
    ]
    path.write_text("\n".join(lines) + "\n")
    return str(path)


def test_find_newlines():
    data = b"one\ntwo\n\nthree\n"
    starts = find_newlines(data)
    # offsets of "one", "two", "three"; the empty line and EOF are skipped
    assert starts.tolist() == [0, 4, 9]
    assert data[starts[2]:].startswith(b"three")


def test_tokenizer_protocol(corpus):
    tok = SimpleWordTokenizer([corpus], max_vocab=100)
    assert tok.vocab_size <= 100
    ids = tok.text_to_ids("the cat unknownword")
    assert ids[-1] == tok.unk_id
    assert tok.ids_to_tokens(ids[:2]) == ["the", "cat"]
    assert len({tok.pad_id, tok.cls_id, tok.sep_id, tok.eos_id, tok.mask_id}) == 5


def test_items_static_shape_and_structure(corpus):
    tok = SimpleWordTokenizer([corpus])
    ds = BertPretrainingDataset(tok, corpus, max_seq_length=64, seed=3)
    assert len(ds) == 200
    item = ds[7]
    for key in ("input_ids", "input_type_ids", "input_mask", "output_ids",
                "output_mask"):
        assert item[key].shape == (64,), key
    n = int(item["input_mask"].sum())
    # [CLS] a [SEP] b [EOS] layout on the *unmasked* target ids
    out = item["output_ids"]
    assert out[0] == tok.cls_id and out[n - 1] == tok.eos_id
    assert tok.sep_id in out[1 : n - 1]
    sep_pos = int(np.flatnonzero(out[:n] == tok.sep_id)[0])
    # segment ids: 0 through [SEP], 1 after it, 0 again in padding
    assert item["input_type_ids"][: sep_pos + 1].max() == 0
    assert item["input_type_ids"][sep_pos + 1 : n].min() == 1
    assert item["input_type_ids"][n:].max(initial=0) == 0
    # pad region is pad_id and contributes no loss
    assert (item["input_ids"][n:] == tok.pad_id).all()
    assert item["output_mask"][n:].max(initial=0) == 0
    assert item["is_next"] in (0, 1)


def test_item_determinism_and_masking_stats(corpus):
    tok = SimpleWordTokenizer([corpus])
    ds = BertPretrainingDataset(tok, corpus, max_seq_length=64, seed=5)
    a, b = ds[11], ds[11]
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])

    # aggregate 80/10/10 over the corpus: among masked positions, ~80%
    # become [MASK]; specials are never masked
    masked_total = mask_tok = changed_other = same = 0
    for i in range(120):
        it = ds[i]
        sel = it["output_mask"] > 0
        masked_total += int(sel.sum())
        inp, out = it["input_ids"][sel], it["output_ids"][sel]
        mask_tok += int((inp == tok.mask_id).sum())
        same += int((inp == out).sum())
        changed_other += int(((inp != out) & (inp != tok.mask_id)).sum())
        specials = np.isin(it["output_ids"], [tok.cls_id, tok.sep_id, tok.eos_id])
        assert not (sel & specials).any()
    assert masked_total > 200
    assert 0.7 < mask_tok / masked_total < 0.9
    assert 0.03 < same / masked_total < 0.2
    assert 0.03 < changed_other / masked_total < 0.2
    # overall mask rate near mask_prob (word-level Bernoulli 0.15)
    # -> position-level rate close to 0.15 for word-level tokenizer
    total_positions = sum(int(ds[i]["input_mask"].sum()) for i in range(120))
    assert 0.08 < masked_total / total_positions < 0.25


def test_nsp_label_balance(corpus):
    tok = SimpleWordTokenizer([corpus])
    ds = BertPretrainingDataset(tok, corpus, max_seq_length=48, seed=1)
    labels = [int(ds[i]["is_next"]) for i in range(100)]
    assert 0.2 < np.mean(labels) < 0.8


def test_preprocessed_roundtrip(tmp_path):
    msl, n, maxpred = 32, 6, 5
    rng = np.random.default_rng(0)
    input_ids = rng.integers(5, 100, (n, msl)).astype(np.int64)
    lm_pos = np.zeros((n, maxpred), np.int64)
    lm_ids = np.zeros((n, maxpred), np.int64)
    lm_pos[:, 0], lm_pos[:, 1] = 3, 7       # two real predictions per row
    lm_ids[:, :2] = rng.integers(5, 100, (n, 2))
    shard = tmp_path / "shard0.npz"
    np.savez(
        shard,
        input_ids=input_ids,
        input_mask=np.ones((n, msl), np.int64),
        segment_ids=np.zeros((n, msl), np.int64),
        masked_lm_positions=lm_pos,
        masked_lm_ids=lm_ids,
        next_sentence_labels=rng.integers(0, 2, n),
    )
    ds = BertPretrainingPreprocessedDataset(str(shard), maxpred)
    assert len(ds) == n
    it = ds[2]
    assert it["output_mask"].sum() == 2
    assert it["output_ids"][3] == lm_ids[2, 0]
    assert it["output_ids"][7] == lm_ids[2, 1]
    # input stays masked-as-given; only targets are swapped in
    np.testing.assert_array_equal(it["input_ids"], input_ids[2].astype(np.int32))

    # file loader shards batches across processes without overlap
    loader0 = BertPretrainingFileLoader([str(shard)], maxpred, batch_size=2,
                                        num_shards=2, shard_rank=0)
    loader1 = BertPretrainingFileLoader([str(shard)], maxpred, batch_size=2,
                                        num_shards=2, shard_rank=1)
    b0, b1 = list(loader0), list(loader1)
    assert len(b0) + len(b1) == n // 2
    assert b0[0]["input_ids"].shape == (2, msl)
    assert not np.array_equal(b0[0]["input_ids"], b1[0]["input_ids"])


def test_bert_pretraining_model_trains(corpus):
    import jax

    from roar_tpu.models.bert import BertPretrainingModel

    tok = SimpleWordTokenizer([corpus])
    ds = BertPretrainingDataset(tok, corpus, max_seq_length=32, seed=0)
    model = BertPretrainingModel({
        "vocab_size": tok.vocab_size, "n_layer": 1, "n_head": 2,
        "d_model": 32, "d_inner": 64, "type_vocab_size": 2,
    })
    batch = ds.collate([ds[i] for i in range(4)])
    params = model.init_params(jax.random.PRNGKey(0), batch)

    @jax.jit
    def step(params, batch):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: model.loss_fn(p, batch, rng=jax.random.PRNGKey(1)),
            has_aux=True,
        )(params)
        params = jax.tree.map(lambda p, g: p - 1e-2 * g, params, grads)
        return params, loss, metrics

    params, loss0, m = step(params, batch)
    params, loss1, m = step(params, batch)
    assert np.isfinite(loss0) and np.isfinite(loss1)
    assert float(loss1) < float(loss0)
    assert set(m) >= {"loss", "mlm_loss", "nsp_loss", "nsp_acc"}


def test_causal_lm_dataset_packing(corpus):
    from roar_tpu.data.lm_dataset import CausalLMDataset

    tok = SimpleWordTokenizer([corpus])
    L = 16
    ds = CausalLMDataset(tok, corpus, seq_length=L)
    assert len(ds) >= 1
    # every block: labels are inputs shifted by one over the packed stream
    stream = ds.data
    for i in (0, len(ds) - 1):
        item = ds[i]
        assert item["input_ids"].shape == (L,) and item["labels"].shape == (L,)
        np.testing.assert_array_equal(item["input_ids"], stream[i * L : i * L + L])
        np.testing.assert_array_equal(item["labels"], stream[i * L + 1 : i * L + L + 1])
    # consecutive blocks tile the stream with no gaps or overlaps
    np.testing.assert_array_equal(ds[1]["input_ids"][0], ds[0]["labels"][-1])
    # documents are EOS-joined
    assert (stream == tok.eos_id).sum() >= 200
    batch = ds.collate([ds[i] for i in range(3)])
    assert batch["input_ids"].shape == (3, L)

    with pytest.raises(ValueError):
        CausalLMDataset(tok, corpus, seq_length=10**7)


def test_gpt_lm_model_trains(corpus):
    import jax

    from roar_tpu.data.lm_dataset import CausalLMDataset
    from roar_tpu.models.gpt_model import GPTLMModel

    tok = SimpleWordTokenizer([corpus])
    ds = CausalLMDataset(tok, corpus, seq_length=16)
    model = GPTLMModel({
        "vocab_size": tok.vocab_size, "block_size": 16, "n_layer": 1,
        "n_head": 2, "n_embd": 32, "n_query_groups": 1,
        "intermediate_size": 64,
    })
    batch = ds.collate([ds[i] for i in range(4)])
    params = model.init_params(jax.random.PRNGKey(0), batch)

    @jax.jit
    def step(params, batch):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: model.loss_fn(p, batch), has_aux=True
        )(params)
        params = jax.tree.map(lambda p, g: p - 1e-2 * g, params, grads)
        return params, loss, metrics

    params, loss0, m = step(params, batch)
    for _ in range(3):
        params, loss1, m = step(params, batch)
    assert np.isfinite(loss0) and np.isfinite(loss1)
    assert float(loss1) < float(loss0)
    assert set(m) >= {"loss", "ppl", "token_acc"}

    # loss_mask zeroes masked positions out of the objective
    masked = dict(batch)
    masked["loss_mask"] = np.zeros_like(batch["labels"])
    masked["loss_mask"][:, :8] = 1
    loss_m, _ = model.loss_fn(params, masked)
    assert np.isfinite(float(loss_m))

    # registry entry + overrides path
    reg = GPTLMModel({"config_name": "tiny-llama-1.1b", "n_layer": 1,
                      "vocab_size": 64, "block_size": 16})
    assert reg.config.n_layer == 1 and reg.config.vocab_size == 64
