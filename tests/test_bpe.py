"""Tests for BPE training (word-freq-dict shape) and application."""

import pyarrow as pa
import ray.data as rd

from saber_ray.stages.bpe import (
    EOW,
    BpeEncoder,
    bpe_token_counts,
    bpe_train,
    encode_word,
    learn_bpe,
)


def test_learn_bpe_golden():
    # classic example: 'low' family — first merge must be the most
    # frequent adjacent pair weighted by word frequency
    freq = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = learn_bpe(freq, num_merges=4)
    # pair counts round 1: ('e','s')=9, ('s','t▁')=9, ('l','o')=7,
    # ('o','w▁')=5, ... tie e/s vs s/t▁ → lexicographically greatest
    assert merges[0] == ("s", "t" + EOW)
    assert merges[1] == ("e", "st" + EOW)
    assert len(merges) == 4


def test_learn_bpe_deterministic_under_dict_order():
    a = {"abc": 3, "abd": 2, "bcd": 4}
    b = dict(reversed(list(a.items())))
    assert learn_bpe(a, 6) == learn_bpe(b, 6)


def test_encode_word_roundtrip():
    freq = {"hello": 10, "hell": 4, "help": 3}
    merges = learn_bpe(freq, 8)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in freq:
        sym = encode_word(w, ranks)
        assert "".join(sym).replace(EOW, "") == w  # lossless
    assert encode_word("", ranks) == []
    # unseen word still encodes (falls back to chars + merges that apply)
    assert "".join(encode_word("helmet", ranks)).replace(EOW, "") == "helmet"


def test_bpe_train_and_counts_distributed():
    texts = ["the cat sat on the mat"] * 6 + ["a cat and a dog"] * 4
    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(10)), "text": texts})
    ).repartition(4)
    merges = bpe_train(ds, num_merges=12, max_words=None)
    assert merges  # something repeats, so something merged

    out = bpe_token_counts(ds, merges).to_pandas().sort_values("doc_id")
    # distributed counts == local reference encode
    enc = BpeEncoder(merges)
    ranks = enc.ranks
    import re

    from saber_ray.stages.bpe import _WORD_RE

    for _, row in out.iterrows():
        expect = sum(
            len(encode_word(w, ranks)) for w in _WORD_RE.findall(row["text"].lower())
        )
        assert row["n_bpe"] == expect
    # merged vocab must beat (or match) char-level token counts
    n_chars_level = sum(len(w) for t in texts for w in t.split())
    assert out["n_bpe"].sum() < n_chars_level


def test_bpe_counts_actor_pool_matches_tasks():
    ds = rd.from_arrow(
        pa.table({"doc_id": [1, 2], "text": ["aa ab aa", "ab ab ba"]})
    )
    merges = bpe_train(ds, num_merges=4, max_words=None)
    a = bpe_token_counts(ds, merges).to_pandas().sort_values("doc_id")
    b = (
        bpe_token_counts(ds, merges, concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert a["n_bpe"].tolist() == b["n_bpe"].tolist()


def _seq_apply(word, merges):
    # rank-order exhaustive left-to-right apply — what the SQL oracle's
    # chain of replace() steps computes
    from saber_ray.stages.bpe import EOW

    sym = [*word[:-1], word[-1] + EOW]
    for a, b in merges:
        out, j = [], 0
        while j < len(sym):
            if j + 1 < len(sym) and sym[j] == a and sym[j + 1] == b:
                out.append(a + b)
                j += 2
            else:
                out.append(sym[j])
                j += 1
        sym = out
    return sym


def test_pretrained_merges_alias_free():
    # the SQL-oracle equivalence (greedy lowest-rank == rank-order
    # exhaustive) relies on: every created symbol distinct, none
    # colliding with a base symbol (single char, or char+EOW)
    from saber_ray.stages.bpe import EOW, PRETRAINED_MERGES

    created = [a + b for a, b in PRETRAINED_MERGES]
    assert len(set(created)) == len(created)
    assert not any(
        len(s) == 1 or (len(s) == 2 and s.endswith(EOW)) for s in created
    )


def test_pretrained_greedy_equals_sequential():
    import random

    from saber_ray.stages.bpe import PRETRAINED_MERGES, encode_word

    ranks = {tuple(p): i for i, p in enumerate(PRETRAINED_MERGES)}
    corpus_words = [
        "scan", "column", "window", "order", "sort", "group", "query",
        "join", "merge", "value", "line", "key", "part", "agg",
    ]
    rng = random.Random(7)
    rand_words = [
        "".join(rng.choice("abcdefgjklmnopqrstuvwy0123")
                for _ in range(rng.randint(1, 14)))
        for _ in range(300)
    ]
    for w in corpus_words + rand_words:
        assert encode_word(w, ranks) == _seq_apply(w, PRETRAINED_MERGES), w
