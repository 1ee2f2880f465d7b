"""Sketches: HLL partial pre-max / merge / accuracy, Count-Min bounds."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from saber_ray.stages.sketch import (
    approx_distinct_tokens,
    cms_hashes,
    cms_hot_tokens,
    count_min_sketch,
    hll_estimate,
    hll_partial_rows,
)


def _registers_from_rows(idx, rank, p):
    regs = np.zeros(1 << p, dtype=np.int64)
    np.maximum.at(regs, idx, rank)
    return regs


def test_partial_rows_pre_maxed_and_bounded():
    p = 8
    values = [f"tok{i}" for i in range(5000)]
    idx, rank = hll_partial_rows(values, p=p)
    # at most one row per register, registers sorted/unique
    assert len(idx) <= (1 << p)
    assert len(np.unique(idx)) == len(idx)
    # pre-max equals the max over per-value singleton updates
    regs_bulk = _registers_from_rows(idx, rank, p)
    regs_single = np.zeros(1 << p, dtype=np.int64)
    for v in values:
        i1, r1 = hll_partial_rows([v], p=p)
        np.maximum.at(regs_single, i1, r1)
    assert np.array_equal(regs_bulk, regs_single)


def test_partials_merge_associatively():
    p = 10
    a = [f"a{i}" for i in range(3000)]
    b = [f"b{i}" for i in range(3000)]
    ia, ra = hll_partial_rows(a, p=p)
    ib, rb = hll_partial_rows(b, p=p)
    merged = np.maximum(
        _registers_from_rows(ia, ra, p), _registers_from_rows(ib, rb, p)
    )
    iu, ru = hll_partial_rows(a + b, p=p)
    assert np.array_equal(merged, _registers_from_rows(iu, ru, p))
    # duplicates never change the sketch
    idup, rdup = hll_partial_rows(a + a + b, p=p)
    assert np.array_equal(merged, _registers_from_rows(idup, rdup, p))


@pytest.mark.parametrize("n", [100, 2000, 50000])
def test_estimate_within_hll_error_bound(n):
    p = 12
    idx, rank = hll_partial_rows([f"v{i}" for i in range(n)], p=p)
    est = hll_estimate(_registers_from_rows(idx, rank, p))
    # standard error is 1.04/sqrt(m) ~ 1.6% at p=12; allow 5 sigma
    assert abs(est - n) / n < 5 * 1.04 / np.sqrt(1 << p)


def _cms_array(ds, lg_w, depth):
    cms = np.zeros((depth, 1 << lg_w), dtype=np.int64)
    for r in count_min_sketch(ds, lg_w=lg_w, depth=depth).take_all():
        cms[r["row"], r["register"]] = r["sum(cnt)"]
    return cms


def test_cms_partition_invariant_and_never_underestimates():
    lg_w, depth = 10, 4
    rows = [
        {"text": " ".join(f"t{j % 97}" for j in range(i % 40 + 1))}
        for i in range(300)
    ]
    table = pa.Table.from_pylist(rows)
    one = _cms_array(rd.from_arrow(table).repartition(1), lg_w, depth)
    many = _cms_array(rd.from_arrow(table).repartition(13), lg_w, depth)
    # counters are sums — identical under any partitioning
    assert np.array_equal(one, many)
    # point query upper-bounds the true count, and total mass is exact
    true = {}
    for r in rows:
        for t in r["text"].split():
            true[t] = true.get(t, 0) + 1
    assert one.sum(axis=1).tolist() == [sum(true.values())] * depth
    toks = sorted(true)
    regs = cms_hashes(toks, lg_w, depth)
    est = one[np.arange(depth)[None, :], regs].min(axis=1)
    for t, e in zip(toks, est):
        assert e >= true[t]


def test_cms_hot_tokens_exact_when_sparse():
    # vocab of 50 tokens in a 2^14-register sketch: collisions are
    # overwhelmingly unlikely, so estimates equal exact counts and the
    # top-k ordering matches the exact frequency ranking
    rows = [{"text": " ".join(f"w{j}" for j in range(i % 50 + 1))} for i in range(200)]
    out = cms_hot_tokens(
        rd.from_arrow(pa.Table.from_pylist(rows)), lg_w=14, depth=4, k=10
    ).take_all()
    true = {}
    for r in rows:
        for t in r["text"].split():
            true[t] = true.get(t, 0) + 1
    expect = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["token"], r["est"]) for r in out] == expect


def test_approx_distinct_tokens_dataset():
    # 400 docs, 1200 distinct tokens spread across them, heavy repeats
    rows = [
        {"text": " ".join(f"w{(i * 3 + j) % 1200}" for j in range(30))}
        for i in range(400)
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = approx_distinct_tokens(ds, column="text", p=12).take_all()
    assert len(out) == 1
    row = out[0]
    assert row["m"] == 4096
    truth = len({f"w{(i * 3 + j) % 1200}" for i in range(400) for j in range(30)})
    assert abs(row["estimate"] - truth) / truth < 0.1
    assert 0 < row["occupied"] <= 4096


def test_grouped_approx_distinct():
    from saber_ray.stages.sketch import grouped_approx_distinct

    # 3 groups with known distinct-value counts (values overlap across
    # groups — per-group registers must not bleed into each other)
    rows = []
    for g, n in [("a", 800), ("b", 200), ("c", 1)]:
        rows += [{"g": g, "v": f"u{i}"} for i in range(n)]
        rows += [{"g": g, "v": f"u{i}"} for i in range(min(n, 50))]  # repeats
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(6)
    out = {r["g"]: r for r in grouped_approx_distinct(ds, "g", "v", p=12).take_all()}
    assert set(out) == {"a", "b", "c"}
    for g, n in [("a", 800), ("b", 200)]:
        assert abs(out[g]["estimate"] - n) / n < 0.1
        assert out[g]["m"] == 4096
    assert out["c"]["occupied"] == 1  # single value -> exactly one register

    # partition invariance: same sketch regardless of block layout
    out2 = {
        r["g"]: r
        for r in grouped_approx_distinct(
            rd.from_arrow(pa.Table.from_pylist(rows)).repartition(1), "g", "v", p=12
        ).take_all()
    }
    assert {g: r["estimate"] for g, r in out.items()} == {
        g: r["estimate"] for g, r in out2.items()
    }


def test_grouped_approx_distinct_nulls():
    from saber_ray.stages.sketch import grouped_approx_distinct

    rows = (
        [{"g": "a", "v": f"u{i}"} for i in range(100)]
        + [{"g": "a", "v": None}]          # null VALUES ignored (SQL)
        + [{"g": None, "v": f"u{i}"} for i in range(40)]  # null GROUP dropped
        + [{"g": "b", "v": "None"}]        # literal "None" ≠ NULL
    )
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    out = {r["g"]: r for r in grouped_approx_distinct(ds, "g", "v", p=12).take_all()}
    # null groups excluded (Ray's multi-key shuffle can't sort mixed
    # None/str keys; oracle filters identically), null values ignored
    assert set(out) == {"a", "b"}
    assert abs(out["a"]["estimate"] - 100) / 100 < 0.1
    assert out["b"]["occupied"] == 1


def test_key_skew_report_matches_pandas():
    import math

    import numpy as np
    import pytest

    from saber_ray.stages.sketch import key_skew_report

    rng = np.random.default_rng(5)
    # Zipf-ish: key i appears ~ (i+1) times, plus two tied hot keys
    keys = np.concatenate(
        [np.full(i + 1, i) for i in range(30)] + [np.full(40, 900),
                                                  np.full(40, 100)]
    ).astype(np.int64)
    rng.shuffle(keys)
    ds = rd.from_arrow(pa.table({"k": pa.array(keys)})).repartition(6)
    out = key_skew_report(ds, "k").to_pandas().iloc[0]

    import pandas as pd

    cnt = pd.Series(keys).value_counts()
    assert out["n_rows"] == len(keys)
    assert out["n_keys"] == cnt.size
    assert out["max_count"] == cnt.max() == 40
    assert out["top_key"] == 100          # min key among the 40-count tie
    assert out["top_share"] == pytest.approx(40 / len(keys), abs=1e-6)
    assert out["mean_count"] == pytest.approx(
        round(len(keys) / cnt.size, 6), abs=1e-9)
    assert out["cv_count"] == pytest.approx(
        round(cnt.std(ddof=1) / cnt.mean(), 6), abs=1e-6)
    # lower-discrete quantiles: smallest v with cum >= ceil(q*n)
    sc = np.sort(cnt.to_numpy())
    for q, col in [(0.5, "p50_count"), (0.9, "p90_count"),
                   (0.99, "p99_count")]:
        assert out[col] == sc[math.ceil(q * len(sc)) - 1]


def test_key_skew_report_empty_raises():
    import pytest

    from saber_ray.stages.sketch import key_skew_report

    empty = rd.from_arrow(pa.table({"k": pa.array([], type=pa.int64())}))
    with pytest.raises(ValueError, match="empty"):
        key_skew_report(empty, "k")


def test_key_skew_null_keys_and_custom_qs():
    import numpy as np

    from saber_ray.stages.sketch import key_skew_report

    keys = [1] * 5 + [2] * 3 + [None] * 7
    ds = rd.from_arrow(pa.table({
        "k": pa.array(keys, type=pa.int64())})).repartition(3)
    out = key_skew_report(ds, "k", qs=(0.25, 0.75)).to_pandas().iloc[0]
    assert out["n_rows"] == 8 and out["n_null_rows"] == 7
    assert out["n_keys"] == 2 and out["max_count"] == 5
    assert out["top_key"] == 1
    assert "p25_count" in out.index and "p75_count" in out.index
    assert out["p25_count"] == 3 and out["p75_count"] == 5
    # single-key corpus: cv is an Arrow NULL (SQL stddev_samp), not NaN
    one = rd.from_arrow(pa.table({"k": pa.array([9, 9, 9],
                                                type=pa.int64())}))
    tbl = key_skew_report(one, "k")
    assert not tbl["cv_count"][0].is_valid


def test_join_cardinality_matches_real_join():
    import numpy as np

    from saber_ray.stages.sketch import join_cardinality_report

    rng = np.random.default_rng(21)
    lk = rng.integers(0, 25, 200)
    rk = rng.integers(10, 40, 300)
    left = rd.from_arrow(pa.table({
        "a": pa.array(lk, type=pa.int64())})).repartition(4)
    right = rd.from_arrow(pa.table({
        "b": pa.array(rk, type=pa.int64())})).repartition(3)
    out = join_cardinality_report(left, right, "a", "b").to_pandas().iloc[0]

    import collections

    cl = collections.Counter(lk.tolist())
    cr = collections.Counter(rk.tolist())
    common = set(cl) & set(cr)
    prods = {k: cl[k] * cr[k] for k in common}
    assert out["n_left"] == 200 and out["n_right"] == 300
    assert out["n_keys_left"] == len(cl) and out["n_keys_right"] == len(cr)
    assert out["n_common_keys"] == len(common)
    assert out["join_rows"] == sum(prods.values())
    mx = max(prods.values())
    assert out["max_key_rows"] == mx
    assert out["max_key"] == min(k for k, p in prods.items() if p == mx)


def test_join_cardinality_disjoint_and_nulls():
    from saber_ray.stages.sketch import join_cardinality_report

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, None], type=pa.int64())}))
    right = rd.from_arrow(pa.table({
        "k": pa.array([3, 4, None, None], type=pa.int64())}))
    out = join_cardinality_report(left, right, "k").to_pandas().iloc[0]
    assert out["n_left"] == 2 and out["n_right"] == 2  # nulls excluded
    assert out["n_common_keys"] == 0 and out["join_rows"] == 0
    assert out["max_key_rows"] == 0
