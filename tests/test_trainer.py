"""Distributed CRF-perceptron Trainer: strategy selection, per-epoch
metrics, best-epoch keeping, bundle serving, and reproducibility
(reference: saber/trainer.py:19-132)."""

import random

import pyarrow as pa
import pytest

import ray.data as rd

from saber_ray.pipelines.train import TrainConfig, Trainer

LABELS = {"spark": "PRGE", "vector": "PRGE", "join": "DISO",
          "filter": "DISO", "customer": "LIVB"}
FILLER = ["the", "of", "runs", "on", "data", "fast", "engine", "table",
          "cluster", "batch"]


def _sentences(n: int, seed: int) -> pa.Table:
    """Deterministic learnable corpus: entity words always carry their
    label (word-identity features suffice), BIO runs included."""
    rng = random.Random(seed)
    ent_words = sorted(LABELS)
    tokens_col, tags_col = [], []
    for _ in range(n):
        toks, tags = [], []
        prev_label = None
        for _ in range(rng.randint(4, 10)):
            if rng.random() < 0.35:
                w = rng.choice(ent_words)
                lab = LABELS[w]
                tags.append(("I-" if prev_label == lab else "B-") + lab)
                prev_label = lab
            else:
                w = rng.choice(FILLER)
                tags.append("O")
                prev_label = None
            toks.append(w)
        tokens_col.append(toks)
        tags_col.append(tags)
    return pa.table({
        "tokens": pa.array(tokens_col, type=pa.list_(pa.string())),
        "tags": pa.array(tags_col, type=pa.list_(pa.string())),
    })


@pytest.fixture(scope="module")
def corpus():
    return _sentences(440, seed=5)


def test_train_valid_strategy_learns(corpus):
    train = rd.from_arrow(corpus.slice(0, 400))
    valid = rd.from_arrow(corpus.slice(400, 40))
    t = Trainer(train, valid=valid, config=TrainConfig(epochs=3, shards=4))
    result = t.train()
    assert result["strategy"] == "train_valid_test"
    hist = result["history"]
    assert len(hist) == 3
    # word-identity task: the perceptron must essentially solve it
    assert hist[-1]["f1"] >= 0.95, hist
    assert hist[-1]["tag_accuracy"] >= 0.95
    # history improves (or stays) from epoch 0 to best
    assert hist[result["best_epoch"]]["f1"] >= hist[0]["f1"]


def test_test_only_carves_valid(corpus):
    train = rd.from_arrow(corpus.slice(0, 400))
    test = rd.from_arrow(corpus.slice(400, 40))
    t = Trainer(train, test=test, config=TrainConfig(epochs=2, shards=4))
    result = t.train()
    assert result["strategy"] == "train_valid_test"
    assert "test" in result and result["test"]["f1"] >= 0.9


def test_cross_validation_strategy(corpus):
    train = rd.from_arrow(corpus.slice(0, 240))
    t = Trainer(train, config=TrainConfig(epochs=2, k_folds=3, shards=2))
    result = t.train()
    assert result["strategy"] == "cross_validation"
    assert len(result["folds"]) == 3
    assert result["mean_f1"] >= 0.85


def test_trained_bundle_serves_through_neural_tagger(corpus, tmp_path):
    from saber_ray.stages.neural import NeuralTagger

    train = rd.from_arrow(corpus.slice(0, 400))
    valid = rd.from_arrow(corpus.slice(400, 40))
    t = Trainer(train, valid=valid, config=TrainConfig(epochs=3, shards=4))
    t.train()
    bundle = t.save(str(tmp_path / "bundle"))

    tagger = NeuralTagger(bundle)
    doc = pa.table({
        "doc_id": ["d1"],
        "spans": [[{"kind": "text", "text": "the spark runs on customer data",
                    "media_ref": ""}]],
    })
    out = tagger(doc)
    ents = out["ents"].to_pylist()[0]
    got = {(e["text"], e["label"]) for e in ents}
    assert ("spark", "PRGE") in got
    assert ("customer", "LIVB") in got
    assert all(e["label"] in {"PRGE", "DISO", "LIVB"} for e in ents)


def test_training_is_reproducible(corpus):
    """Content-hash sharding + deterministic within-shard order +
    parameter mixing ⇒ identical history whatever the block layout."""
    train_a = rd.from_arrow(corpus.slice(0, 400))
    valid = rd.from_arrow(corpus.slice(400, 40))
    h1 = Trainer(train_a, valid=valid,
                 config=TrainConfig(epochs=2, shards=4)).train()["history"]
    # different block layout, same rows
    train_b = rd.from_arrow(corpus.slice(0, 400)).repartition(7)
    h2 = Trainer(train_b, valid=valid,
                 config=TrainConfig(epochs=2, shards=4)).train()["history"]
    assert h1 == h2


# ================================================================
# Gradient BiLSTM-CRF training (RecurrentTrainer)
# ================================================================


def _context_corpus(n: int, seed: int) -> pa.Table:
    """Tag of 'x' depends on the PRECEDING token ('acts x' → B-PRGE,
    'near x' → O; everything else O). A linear per-token emission
    provably cannot express this: E['x'] is one fixed row and both
    contexts present identical tag neighborhoods (all O), so any
    linear-CRF scores both labelings of 'x' identically — a BiLSTM
    state sees the context token."""
    rng = random.Random(seed)
    toks_col, tags_col = [], []
    for _ in range(n):
        ctx = rng.choice(["acts", "near"])
        toks = [ctx, "x"] + [rng.choice(FILLER) for _ in range(rng.randint(2, 5))]
        tags = ["O", "B-PRGE" if ctx == "acts" else "O"] + ["O"] * (len(toks) - 2)
        toks_col.append(toks)
        tags_col.append(tags)
    return pa.table({
        "tokens": pa.array(toks_col, type=pa.list_(pa.string())),
        "tags": pa.array(tags_col, type=pa.list_(pa.string())),
    })


@pytest.fixture(scope="module")
def ctx_corpus():
    return _context_corpus(240, seed=7)


def _small_rcfg(**kw):
    from saber_ray.pipelines.train import RecurrentTrainConfig

    base = dict(epochs=6, shards=2, lr=0.05, batch_size=16,
                word_dim=8, char_dim=4, char_units=4, word_units=8)
    base.update(kw)
    return RecurrentTrainConfig(**base)


def test_recurrent_learns_context_linear_cannot(ctx_corpus):
    from saber_ray.pipelines.train import RecurrentTrainer

    train = rd.from_arrow(ctx_corpus.slice(0, 200))
    valid = rd.from_arrow(ctx_corpus.slice(200, 40))
    rt = RecurrentTrainer(train, valid=valid, config=_small_rcfg())
    res = rt.train()
    best = res["history"][res["best_epoch"]]
    assert best["f1"] == 1.0, res["history"]

    # the linear-emission perceptron cannot separate the contexts: its
    # best F1 stays at the predict-all-x ceiling (~0.69), never 1.0
    lt = Trainer(train, valid=valid, config=TrainConfig(epochs=5, shards=2))
    lres = lt.train()
    assert max(h["f1"] for h in lres["history"]) < 0.9


def test_recurrent_empty_epoch_keeps_params(ctx_corpus):
    """An epoch that trains zero sentences (empty fold/split) must keep
    the previous params — an all-zeros mix silently wiping the model
    (and, in the multi-task trainer, the SHARED encoder) was a bug."""
    import numpy as np

    from saber_ray.pipelines.train import RecurrentTrainer, _with_shard

    train = rd.from_arrow(ctx_corpus.slice(0, 40))
    rt = RecurrentTrainer(train, config=_small_rcfg(epochs=1))
    params = rt._init_params()
    empty = _with_shard(train.filter(lambda r: False), 2)
    mixed, _ = rt._epoch_pass(empty, params)
    assert mixed is params  # unchanged object, not a zero-filled copy
    assert any(np.abs(v).sum() > 0 for v in params.values())


def test_recurrent_bundle_serves_context_pattern(ctx_corpus, tmp_path):
    from saber_ray.pipelines.train import RecurrentTrainer
    from saber_ray.stages.neural import NeuralTagger

    train = rd.from_arrow(ctx_corpus.slice(0, 200))
    valid = rd.from_arrow(ctx_corpus.slice(200, 40))
    rt = RecurrentTrainer(train, valid=valid, config=_small_rcfg())
    rt.train()
    bundle = rt.save(str(tmp_path / "bilstm_bundle"))

    tagger = NeuralTagger(bundle)
    doc = pa.table({
        "doc_id": ["d1", "d2"],
        "spans": [
            [{"kind": "text", "text": "acts x on data", "media_ref": ""}],
            [{"kind": "text", "text": "near x on data", "media_ref": ""}],
        ],
    })
    out = tagger(doc)
    ents = out["ents"].to_pylist()
    assert {(e["text"], e["label"]) for e in ents[0]} == {("x", "PRGE")}
    assert ents[1] == []  # same token, other context: no mention


def test_recurrent_training_reproducible(ctx_corpus):
    from saber_ray.pipelines.train import RecurrentTrainer

    valid = rd.from_arrow(ctx_corpus.slice(200, 40))
    h1 = RecurrentTrainer(
        rd.from_arrow(ctx_corpus.slice(0, 200)), valid=valid,
        config=_small_rcfg(epochs=2)).train()["history"]
    h2 = RecurrentTrainer(
        rd.from_arrow(ctx_corpus.slice(0, 200)).repartition(7), valid=valid,
        config=_small_rcfg(epochs=2)).train()["history"]
    assert h1 == h2


# ================================================================
# Multi-task / compound-dataset training
# ================================================================


def _task_corpus(n: int, seed: int, words: dict) -> pa.Table:
    rng = random.Random(seed)
    ent_words = sorted(words)
    toks_col, tags_col = [], []
    for _ in range(n):
        toks, tags = [], []
        for _ in range(rng.randint(4, 8)):
            if rng.random() < 0.4:
                w = rng.choice(ent_words)
                toks.append(w)
                tags.append("B-" + words[w])
            else:
                toks.append(rng.choice(FILLER))
                tags.append("O")
        toks_col.append(toks)
        tags_col.append(tags)
    return pa.table({
        "tokens": pa.array(toks_col, type=pa.list_(pa.string())),
        "tags": pa.array(tags_col, type=pa.list_(pa.string())),
    })


def test_multitask_shared_encoder_per_task_heads(tmp_path):
    """Two corpora with DISJOINT tag sets (the reference's
    dummy_dataset_1 DISO / dummy_dataset_2 PRGE shape) train one shared
    encoder with per-task CRF heads; both tasks reach F1 1.0 and each
    head serves through NeuralTagger with ITS OWN tag set."""
    from saber_ray.pipelines.train import MultiTaskRecurrentTrainer
    from saber_ray.stages.neural import NeuralTagger

    a = _task_corpus(160, 11, {"join": "DISO", "filter": "DISO"})
    b = _task_corpus(160, 12, {"spark": "PRGE", "vector": "PRGE"})
    mt = MultiTaskRecurrentTrainer(
        [
            {"train": rd.from_arrow(a.slice(0, 130)),
             "valid": rd.from_arrow(a.slice(130, 30))},
            {"train": rd.from_arrow(b.slice(0, 130)),
             "valid": rd.from_arrow(b.slice(130, 30))},
        ],
        config=_small_rcfg(epochs=6),
    )
    res = mt.train()
    assert res["strategy"] == "multi_task"
    assert res["per_task"][0]["f1"] == 1.0
    assert res["per_task"][1]["f1"] == 1.0

    # task order is shuffled per epoch with the seeded RNG
    orders = res["task_orders"]
    assert len(orders) == 6 and all(sorted(o) == [0, 1] for o in orders)
    assert len({tuple(o) for o in orders}) > 1  # actually shuffles

    bundle = mt.save(1, str(tmp_path / "task1_bundle"))
    tagger = NeuralTagger(bundle)
    doc = pa.table({
        "doc_id": ["d1"],
        "spans": [[{"kind": "text", "text": "the spark runs fast",
                    "media_ref": ""}]],
    })
    ents = tagger(doc)["ents"].to_pylist()[0]
    assert {(e["text"], e["label"]) for e in ents} == {("spark", "PRGE")}


def test_multitask_order_reproducible():
    from saber_ray.pipelines.train import MultiTaskRecurrentTrainer

    a = _task_corpus(60, 21, {"join": "DISO"})
    b = _task_corpus(60, 22, {"spark": "PRGE"})
    def run():
        mt = MultiTaskRecurrentTrainer(
            [{"train": rd.from_arrow(a)}, {"train": rd.from_arrow(b)}],
            config=_small_rcfg(epochs=3),
        )
        mt.train()
        return mt.task_orders
    assert run() == run()


def test_recurrent_cross_validation_strategy(ctx_corpus):
    """No valid partition → k-fold CV with a model reset per fold
    (reference trainer.py:86-132), exactly like the perceptron path."""
    from saber_ray.pipelines.train import RecurrentTrainer

    rt = RecurrentTrainer(
        rd.from_arrow(ctx_corpus),
        config=_small_rcfg(epochs=6, k_folds=3))
    res = rt.train()
    assert res["strategy"] == "cross_validation"
    assert len(res["folds"]) == 3
    assert all(s["f1"] == 1.0 for s in res["folds"]), res["folds"]
    assert res["mean_f1"] == 1.0
    assert rt.params is not None  # best fold's weights kept for save()


def test_pretrained_embeddings_load_and_freeze(ctx_corpus, tmp_path):
    """Reference load_embeddings parity: a word2vec text file replaces
    the embedding table (its dimension wins; PAD/UNK/OOV rows zero) and
    `fine_tune_word_embeddings=False` freezes the loaded rows through
    training while OOV rows still learn."""
    import numpy as np

    from saber_ray.pipelines.train import RecurrentTrainer

    train = rd.from_arrow(ctx_corpus.slice(0, 200))
    valid = rd.from_arrow(ctx_corpus.slice(200, 40))
    probe = RecurrentTrainer(train, valid=valid, config=_small_rcfg(epochs=1))
    vocab_words = [w for w in probe.word2idx
                   if w not in ("<PAD>", "<UNK>")]
    w2v = tmp_path / "vecs.txt"
    rng = np.random.RandomState(3)
    dim = 10
    loaded_words = vocab_words[: len(vocab_words) // 2]  # half stay OOV
    with open(w2v, "w") as f:
        f.write(f"{len(loaded_words)} {dim}\n")
        for w in loaded_words:
            vec = rng.randn(dim)
            f.write(w + " " + " ".join(f"{v:.6f}" for v in vec) + "\n")

    rt = RecurrentTrainer(train, valid=valid, config=_small_rcfg(
        epochs=4, embeddings_path=str(w2v),
        fine_tune_word_embeddings=False))
    res = rt.train()
    assert res["history"][res["best_epoch"]]["f1"] == 1.0

    from saber_ray.state.bundle import load_word2vec_text

    original = load_word2vec_text(str(w2v), rt.word2idx)
    emb = rt.params["embeddings"]
    assert emb.shape[1] == dim  # loaded dimension won over the config's
    loaded_rows = np.flatnonzero(np.abs(original).sum(axis=1) > 0)
    np.testing.assert_allclose(emb[loaded_rows],
                               original[loaded_rows], atol=1e-12)
    # at least one trainable (OOV) row actually moved
    oov_rows = [i for i in range(2, emb.shape[0]) if i not in set(loaded_rows)]
    assert any(np.abs(emb[i]).sum() > 0 for i in oov_rows)

    # fine_tune=True: loaded rows DO move
    rt2 = RecurrentTrainer(train, valid=valid, config=_small_rcfg(
        epochs=2, embeddings_path=str(w2v),
        fine_tune_word_embeddings=True))
    rt2.train()
    assert np.abs(rt2.params["embeddings"][loaded_rows]
                  - original[loaded_rows]).max() > 1e-6
