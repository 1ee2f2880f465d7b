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
