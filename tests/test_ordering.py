"""Tests for distributed global order-index assignment and window chunking."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from saber_ray.functions.hashing import md5_key32
from saber_ray.stages.ordering import global_rank, global_shuffle_index
from saber_ray.stages.textstats import window_chunks, window_chunks_batch


def _docs(n, blocks=7, seed=3):
    rng = np.random.default_rng(seed)
    ids = rng.permutation(n).astype(np.int64)
    keys = rng.integers(0, 50, size=n).astype(np.int64)  # heavy ties
    ds = rd.from_arrow(pa.table({"doc_id": ids, "k": keys}))
    return ds.repartition(blocks), ids, keys


def test_global_shuffle_index_matches_sorted_order():
    ds, ids, _ = _docs(3000)
    out = global_shuffle_index(ds, id_column="doc_id", num_buckets=16).to_pandas()
    assert len(out) == 3000
    assert sorted(out["shuffle_pos"]) == list(range(3000))
    expect = sorted(ids.tolist(), key=lambda i: (md5_key32(i, ""), i))
    got = out.sort_values("shuffle_pos")["doc_id"].tolist()
    assert got == expect


def test_global_shuffle_index_stable_under_partitioning_and_salt():
    ds, _, _ = _docs(500, blocks=3)
    a = global_shuffle_index(ds, num_buckets=4).to_pandas().sort_values("doc_id")
    b = (
        global_shuffle_index(ds.repartition(11), num_buckets=64)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert a["shuffle_pos"].tolist() == b["shuffle_pos"].tolist()
    c = global_shuffle_index(ds, salt="other").to_pandas().sort_values("doc_id")
    assert a["shuffle_pos"].tolist() != c["shuffle_pos"].tolist()


@pytest.mark.parametrize("descending", [False, True])
def test_global_rank_exact_with_ties(descending):
    ds, ids, keys = _docs(2500)
    out = global_rank(
        ds, "k", id_column="doc_id", descending=descending, num_buckets=12
    ).to_pandas()
    order = sorted(
        zip(keys.tolist(), ids.tolist()),
        key=lambda t: (-t[0] if descending else t[0], t[1]),
    )
    expect = {i: pos for pos, (_, i) in enumerate(order)}
    got = dict(zip(out["doc_id"], out["pos"]))
    assert got == expect


def test_global_rank_single_value_and_empty():
    one = rd.from_arrow(pa.table({"doc_id": [3, 1, 2], "k": [7, 7, 7]}))
    out = global_rank(one, "k", num_buckets=8).to_pandas().sort_values("doc_id")
    assert out["pos"].tolist() == [0, 1, 2]  # all-equal keys → id tiebreak

    empty = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "k": pa.array([], pa.int64())})
    )
    out = global_rank(empty, "k")
    # (.to_pandas() on an empty Dataset drops columns — a Ray quirk, so
    # assert on the Dataset schema itself)
    assert out.count() == 0 and "pos" in out.schema().names


def test_global_rank_rejects_nulls():
    ds = rd.from_arrow(pa.table({"doc_id": [1, 2], "k": pa.array([1, None])}))
    with pytest.raises(Exception, match="null"):
        global_rank(ds, "k").to_pandas()


def test_global_rank_rejects_nan_and_inf():
    for bad in [float("nan"), float("inf")]:
        ds = rd.from_arrow(pa.table({"doc_id": [1, 2, 3], "k": [1.0, bad, 2.0]}))
        with pytest.raises(Exception, match="non-finite"):
            global_rank(ds, "k", descending=True).to_pandas()


def test_global_rank_descending_unsigned_and_extreme_int64():
    # uint32 keys sharing one equal-mass bucket: numpy negation wraps
    # unsigned ints (-uint32(1) == 4294967295), mis-ranking the bucket
    ids = list(range(30))
    keys = [0] * 5 + [1] * 5 + [2] * 20
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "k": pa.array(keys, pa.uint32())})
    )
    out = global_rank(ds, "k", descending=True, num_buckets=2).to_pandas()
    got = dict(zip(out["doc_id"], out["pos"]))
    order = sorted(zip(keys, ids), key=lambda t: (-t[0], t[1]))
    assert got == {i: p for p, (_, i) in enumerate(order)}

    # INT64_MIN/MAX: negation overflows int64
    lo, hi = -(2**63), 2**63 - 1
    ds = rd.from_arrow(
        pa.table({"doc_id": [1, 2, 3], "k": pa.array([lo, 0, hi], pa.int64())})
    )
    out = global_rank(ds, "k", descending=True, num_buckets=1).to_pandas()
    assert dict(zip(out["doc_id"], out["pos"])) == {3: 0, 2: 1, 1: 2}


def test_window_chunks_batch_golden():
    t = pa.table({"doc_id": [1, 2, 3], "text": ["a b c d e f g", "x y", ""]})
    out = window_chunks_batch(t, window=3, stride=2).to_pandas()
    rows = list(map(tuple, out.itertuples(index=False)))
    assert rows == [
        (1, 0, 0, 3, "a b c"),
        (1, 1, 2, 3, "c d e"),
        (1, 2, 4, 3, "e f g"),
        (1, 3, 6, 1, "g"),
        (2, 0, 0, 2, "x y"),
        (3, 0, 0, 1, ""),  # ''.split(' ') == [''] — one empty token
    ]


def test_window_chunks_reconstruction_no_overlap():
    # stride == window: chunks partition the token stream exactly
    texts = ["one two three four five six seven", "alpha beta", "q"]
    ds = rd.from_arrow(pa.table({"doc_id": [1, 2, 3], "text": texts}))
    out = window_chunks(ds, window=3, stride=3).to_pandas()
    for i, txt in enumerate(texts, start=1):
        sub = out[out["doc_id"] == i].sort_values("chunk_id")
        assert " ".join(sub["chunk_text"]) == txt
        assert int(sub["n_tok"].sum()) == len(txt.split(" "))


def test_take_weight_budget_matches_sql_semantics():
    from saber_ray.stages.ordering import take_weight_budget

    rng = np.random.default_rng(5)
    n = 2000
    ids = rng.permutation(n).astype(np.int64)
    w = rng.integers(1, 100, size=n).astype(np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": ids, "w": w})).repartition(5)
    budget = int(w.sum() * 0.3)
    out = take_weight_budget(
        ds, "w", "w", budget=budget, descending=True, num_buckets=16
    ).to_pandas()
    # reference: cumulative sum in (w DESC, id) order, keep cum <= budget
    order = sorted(zip(w.tolist(), ids.tolist()), key=lambda t: (-t[0], t[1]))
    cum, keep = 0, set()
    for wv, i in order:
        cum += wv
        if cum > budget:
            break
        keep.add(i)
    assert set(out["doc_id"]) == keep
    assert out["w"].sum() <= budget


def test_take_weight_budget_extremes():
    from saber_ray.stages.ordering import take_weight_budget

    ds = rd.from_arrow(pa.table({"doc_id": [1, 2, 3], "w": [10, 20, 30]}))
    # budget below the first row: nothing selected
    assert take_weight_budget(ds, "w", "w", budget=5).count() == 0
    # budget covers everything
    out = take_weight_budget(ds, "w", "w", budget=100).to_pandas()
    assert set(out["doc_id"]) == {1, 2, 3}


def test_take_weight_budget_rejects_negative_weights():
    from saber_ray.stages.ordering import take_weight_budget

    ds = rd.from_arrow(pa.table({"doc_id": [1, 2, 3], "w": [10, -1, 30]}))
    with pytest.raises(Exception, match="negative"):
        take_weight_budget(ds, "w", "w", budget=100).to_pandas()
