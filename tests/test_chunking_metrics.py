"""Golden tests for BIO/BIOES chunking (saber/tests/test_preprocessor.py:82-100)
and P/R/F1 evaluation math (saber/utils/model_utils.py:186-206,
saber/metrics.py:124-201)."""

import pytest

from saber_ray.functions.chunking import chunk_entities, chunks_to_spans
from saber_ray.functions.metrics import evaluate_chunks, precision_recall_f1_support


def test_chunk_simple():
    assert chunk_entities(["B-PRGE", "I-PRGE", "O", "B-PRGE"]) == [
        ("PRGE", 0, 2), ("PRGE", 3, 4)]


def test_chunk_two_types():
    assert chunk_entities(["B-LIVB", "I-LIVB", "O", "B-PRGE"]) == [
        ("LIVB", 0, 2), ("PRGE", 3, 4)]


def test_chunk_invalid_dropped():
    assert chunk_entities(["O", "I-CHED", "I-CHED", "O"]) == []


def test_chunk_blank():
    assert chunk_entities([]) == []


def test_chunk_bioes_quirk():
    # E- tags neither start nor extend chunks (fixture dummy_dataset_1 has
    # E-DISO; the reference's chunker excludes it — SURVEY.md §7 quirk #4).
    assert chunk_entities(["B-DISO", "I-DISO", "I-DISO", "E-DISO"]) == [("DISO", 0, 3)]
    assert chunk_entities(["S-DISO", "O"]) == []


def test_chunk_type_switch_breaks():
    assert chunk_entities(["B-PRGE", "I-DISO"]) == [("PRGE", 0, 1)]


def test_chunks_to_spans():
    text = "p53 causes cancer."
    offsets = [(0, 3), (4, 10), (11, 17), (17, 18)]
    chunks = [("PRGE", 0, 1), ("DISO", 2, 3)]
    assert chunks_to_spans(chunks, offsets, text) == [
        (0, 3, "p53", "PRGE"), (11, 17, "cancer", "DISO")]


def test_prf_zero_guards():
    assert precision_recall_f1_support(0, 0, 0) == (0.0, 0.0, 0.0, 0)
    assert precision_recall_f1_support(0, 5, 3) == (0.0, 0.0, 0.0, 3)
    p, r, f1, support = precision_recall_f1_support(2, 1, 1)
    assert (p, r, support) == (2 / 3, 2 / 3, 3)
    assert f1 == pytest.approx(2 / 3)


def test_evaluate_chunks_exact():
    gold = [("PRGE", 0, 2), ("DISO", 3, 4), ("PRGE", 7, 9)]
    pred = [("PRGE", 0, 2), ("DISO", 3, 5), ("PRGE", 7, 9)]
    scores = evaluate_chunks(gold, pred, criteria="exact")
    assert scores["PRGE"] == (1.0, 1.0, 1.0, 2)
    assert scores["DISO"][:2] == (0.0, 0.0)
    micro_p, micro_r, _, micro_support = scores["MICRO_AVG"]
    assert micro_p == pytest.approx(2 / 3)
    assert micro_r == pytest.approx(2 / 3)
    assert micro_support == 3


def test_evaluate_chunks_left_right():
    gold = [("DISO", 3, 4)]
    pred = [("DISO", 3, 5)]
    assert evaluate_chunks(gold, pred, criteria="left")["DISO"][2] == 1.0
    assert evaluate_chunks(gold, pred, criteria="right")["DISO"][2] == 0.0


def test_evaluate_chunks_invalid_criteria():
    with pytest.raises(ValueError):
        evaluate_chunks([], [], criteria="bogus")


def test_best_epoch():
    from saber_ray.functions.metrics import best_epoch

    scores = [(0.5, 0.5, 0.5), (0.9, 0.8, 0.85), (0.9, 0.8, 0.85), (0.1, 0.1, 0.1)]
    assert best_epoch(scores) == 1  # ties resolve to the earliest epoch
    with pytest.raises(ValueError):
        best_epoch([])


def test_rolling_fingerprint():
    from saber_ray.functions.hashing import rolling_fingerprint

    a = rolling_fingerprint(["the", "quick", "fox"])
    assert a == rolling_fingerprint(["the", "quick", "fox"])  # deterministic
    assert a != rolling_fingerprint(["quick", "the", "fox"])  # order-sensitive
    assert rolling_fingerprint([]) == 0


def test_minhash_estimates_jaccard():
    """Statistical property: signature agreement approximates Jaccard."""
    import numpy as np

    from saber_ray.functions.hashing import (
        make_minhash_params,
        minhash_signature,
        stable_u64,
    )

    a, b = make_minhash_params(256, seed=1)
    s1 = {f"sh{i}" for i in range(100)}
    s2 = {f"sh{i}" for i in range(50, 150)}  # true J = 50/150 = 1/3
    h1 = np.array([stable_u64(x) for x in sorted(s1)], dtype=np.uint64)
    h2 = np.array([stable_u64(x) for x in sorted(s2)], dtype=np.uint64)
    sig1 = minhash_signature(h1, a, b)
    sig2 = minhash_signature(h2, a, b)
    est = (sig1 == sig2).mean()
    assert abs(est - 1 / 3) < 0.08, f"minhash estimate {est} far from 1/3"


def test_bioes_tags_encoding():
    from saber_ray.functions.chunking import bioes_tags

    assert bioes_tags([]) == []
    assert bioes_tags([None, None]) == ["O", "O"]
    assert bioes_tags(["PRGE"]) == ["S-PRGE"]
    assert bioes_tags(["PRGE", "PRGE"]) == ["B-PRGE", "E-PRGE"]
    assert bioes_tags([None, "DISO", "DISO", "DISO", None, "CHED"]) == [
        "O", "B-DISO", "I-DISO", "E-DISO", "O", "S-CHED",
    ]
    # adjacent runs of DIFFERENT labels stay separate runs
    assert bioes_tags(["PRGE", "PRGE", "DISO", "DISO"]) == [
        "B-PRGE", "E-PRGE", "B-DISO", "E-DISO",
    ]


def test_bioes_chunk_roundtrip_quirks():
    """bioes_tags -> chunk_entities reproduces the reference quirks: a
    run of length k >= 2 chunks as [start, start+k-1) (E- excluded),
    and singleton S- runs chunk nothing."""
    from saber_ray.functions.chunking import bioes_tags, chunk_entities

    labels = [None, "DISO", "DISO", "DISO", None, "CHED",
              "PRGE", "PRGE", "DISO", "DISO"]
    got = chunk_entities(bioes_tags(labels))
    # length-2 runs chunk as just their B- token ([6,7), [8,9)) — the
    # E- exclusion quirk at its sharpest
    assert got == [("DISO", 1, 3), ("PRGE", 6, 7), ("DISO", 8, 9)]


def test_confusion_table_membership_semantics():
    # key A: 2 pred occurrences, key in gold -> both TP
    # key B: pred-only -> FP; key C: gold-only (2 occ) -> 2 FN
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.evaluate import confusion_table

    keyed = rd.from_arrow(pa.table({
        "label": ["X"] * 6,
        "key": ["A", "A", "A", "B", "C", "C"],
        "pred_n": pa.array([1, 1, 0, 1, 0, 0], type=pa.int64()),
        "gold_n": pa.array([0, 0, 1, 0, 1, 1], type=pa.int64()),
    }))
    t = confusion_table(keyed)
    row = t.to_pylist()[0]
    assert row == {"label": "X", "tp": 2, "fp": 1, "fn": 2}
