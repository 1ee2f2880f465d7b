"""Sampling, quantiles, decontamination, packing, repetition stats."""

import hashlib

import pyarrow as pa
import pytest

import ray.data as rd

from saber_ray.stages.decontam import decontaminate, eval_shingle_set, shingle_hashes
from saber_ray.stages.packing import assign_buckets, greedy_pack, pack_sequences
from saber_ray.stages.sampling import (
    _key64,
    exact_quantiles,
    grouped_quantiles,
    sample_hash,
    stratified_sample,
)
from saber_ray.stages.textstats import repetition_stats_batch


def _docs(rows):
    return rd.from_arrow(pa.table(rows))


# ---------------------------------------------------------------- sampling


def test_key64_matches_md5_prefix():
    assert _key64([42]) == [int(hashlib.md5(b"42").hexdigest()[:8], 16)]
    assert _key64([42], salt="s") == [int(hashlib.md5(b"s42").hexdigest()[:8], 16)]


def test_sample_hash_deterministic_and_subsety():
    ds = _docs({"doc_id": list(range(1000)), "text": ["x"] * 1000})
    s10 = sorted(r["doc_id"] for r in sample_hash(ds, 10).take_all())
    s10b = sorted(r["doc_id"] for r in sample_hash(ds, 10).take_all())
    s30 = set(r["doc_id"] for r in sample_hash(ds, 30).take_all())
    assert s10 == s10b                       # idempotent
    assert set(s10) <= s30                   # nested: lower pct is a subset
    assert 40 <= len(s10) <= 180             # ~10% of 1000
    # salt decorrelates
    salted = set(r["doc_id"] for r in sample_hash(ds, 10, salt="v2").take_all())
    assert salted != set(s10)


def test_stratified_sample_quota_and_determinism():
    ids = list(range(300))
    langs = ["en", "de", "fr"] * 100
    ds = _docs({"doc_id": ids, "lang": langs})
    out = stratified_sample(ds, "lang", k=7).take_all()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert set(by_lang) == {"en", "de", "fr"}
    assert all(len(v) == 7 for v in by_lang.values())
    # pure function of (id, stratum): block layout must not matter
    out2 = stratified_sample(ds.repartition(7), "lang", k=7).take_all()
    assert sorted((r["lang"], r["doc_id"]) for r in out) == sorted(
        (r["lang"], r["doc_id"]) for r in out2
    )
    # quota larger than stratum: returns the whole stratum
    small = _docs({"doc_id": [1, 2], "lang": ["xx", "xx"]})
    assert len(stratified_sample(small, "lang", k=10).take_all()) == 2


def test_exact_quantiles():
    vals = list(range(1, 101))  # 1..100
    ds = _docs({"v": vals})
    t = exact_quantiles(ds, [0.5, 0.9, 1.0], "v")
    got = dict(zip(t["q"].to_pylist(), t["value"].to_pylist()))
    assert got == {0.5: 50, 0.9: 90, 1.0: 100}
    # skewed multiset
    ds2 = _docs({"v": [1] * 99 + [1000]})
    t2 = exact_quantiles(ds2, [0.5, 0.99, 1.0], "v")
    got2 = dict(zip(t2["q"].to_pylist(), t2["value"].to_pylist()))
    assert got2 == {0.5: 1, 0.99: 1, 1.0: 1000}


def test_grouped_quantiles():
    ds = _docs({"g": ["a"] * 100 + ["b"] * 10,
                "v": list(range(1, 101)) + [5] * 10})
    t = grouped_quantiles(ds, [0.5, 1.0], "v", "g")
    got = {(g, q): v for g, q, v in zip(t["g"].to_pylist(),
                                        t["q"].to_pylist(),
                                        t["value"].to_pylist())}
    assert got == {("a", 0.5): 50, ("a", 1.0): 100,
                   ("b", 0.5): 5, ("b", 1.0): 5}


# ------------------------------------------------------------- decontam


def test_shingle_hashes_windows():
    # window semantics: n-k+1 windows, order-sensitive, too-short -> none
    h = shingle_hashes("a b c d", 3)
    assert len(h) == 2
    assert shingle_hashes("a b c", 3) <= h          # first window shared
    assert shingle_hashes("b c d", 3) <= h          # second window shared
    assert shingle_hashes("c b a", 3).isdisjoint(h)  # order matters
    assert shingle_hashes("a b", 3) == set()
    assert shingle_hashes("", 3) == set()


def test_decontaminate_drops_overlapping_docs():
    bench = _docs({"doc_id": [100], "text": ["the quick brown fox jumps over lazy dogs"]})
    train = _docs(
        {
            "doc_id": [1, 2, 3],
            "text": [
                # contains the full 8-gram from the benchmark doc
                "prefix words the quick brown fox jumps over lazy dogs suffix",
                "completely unrelated content about ray data pipelines here",
                # shares only a 4-gram, below n=8 -> clean
                "the quick brown fox stays here",
            ],
        }
    )
    clean = sorted(r["doc_id"] for r in decontaminate(train, bench, n=8).take_all())
    assert clean == [2, 3]
    # eval shingle set size: 8 tokens -> exactly 1 shingle of 8
    assert len(eval_shingle_set(bench, 8)) == 1


def test_contamination_fraction_scores():
    from saber_ray.stages.decontam import contamination_fraction

    bench = _docs({"doc_id": [100], "text": ["q w e r t y u i"]})  # one 8-gram
    train = _docs(
        {
            "doc_id": [1, 2, 3],
            "text": [
                # 10 tokens -> 3 shingle positions; position 2 hits -> 1/3
                "a b q w e r t y u i",
                "no overlap with the benchmark document at all here now",
                "short doc",  # < 8 tokens -> 0 shingles -> 0.0
            ],
        }
    )
    out = (
        contamination_fraction(train, bench, n=8)
        .to_pandas()
        .set_index("doc_id")["contam_frac"]
    )
    assert abs(out[1] - 1 / 3) < 1e-12
    assert out[2] == 0.0
    assert out[3] == 0.0


# --------------------------------------------------------------- packing


def test_greedy_pack_rules():
    assert greedy_pack([3, 4, 5, 2], 8) == [0, 0, 1, 1]
    # oversized doc occupies its own pack, never dropped
    assert greedy_pack([9, 1], 8) == [0, 1]
    assert greedy_pack([1, 9, 1], 8) == [0, 1, 2]
    assert greedy_pack([], 8) == []


def test_pack_sequences_budget_and_determinism():
    texts = [f"tok " * (i % 40 + 1) for i in range(200)]
    ds = _docs({"doc_id": list(range(200)), "text": texts})
    out = pack_sequences(ds, budget=64, bucket_count=4).take_all()
    assert len(out) == 200
    # every (bucket, pack) fits the budget unless it is a single oversize doc
    sums = {}
    for r in out:
        sums.setdefault((r["bucket"], r["pack_id"]), []).append(r["n_tokens"])
    for members in sums.values():
        assert sum(members) <= 64 or len(members) == 1
    # block layout must not change the packing
    out2 = pack_sequences(ds.repartition(9), budget=64, bucket_count=4).take_all()
    key = lambda r: (r["doc_id"], r["bucket"], r["pack_id"], r["n_tokens"])
    assert sorted(map(key, out)) == sorted(map(key, out2))


def test_assign_buckets_matches_md5():
    b = assign_buckets(pa.table({"doc_id": [42]}), 8)
    assert b["bucket"][0].as_py() == int(hashlib.md5(b"42").hexdigest()[:8], 16) % 8


# ------------------------------------------------------------ repetition


def test_repetition_stats():
    batch = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "a\nb\na\na",          # 4 lines, 2 dup of earlier
                "x y x y x y",         # bigram (x,y) x3 of 5 bigrams
                "",                    # degenerate
            ],
        }
    )
    out = repetition_stats_batch(batch)
    assert out["n_lines"].to_pylist() == [4, 1, 1]
    assert out["dup_line_frac"].to_pylist() == [0.5, 0.0, 0.0]
    frac = out["top_bigram_frac"].to_pylist()
    assert frac[0] == pytest.approx(1 / 3)  # bigrams ab, ba, aa — all unique
    assert frac[1] == pytest.approx(3 / 5)
    assert frac[2] == 0.0


def test_tfidf_top_terms():
    """Hand-computed scores on a 3-doc corpus: a token in every doc has
    idf = ln(3/3) = 0; rarer tokens score higher; k bounds per-doc rows
    and ties break token-ascending."""
    import math

    from saber_ray.stages.textstats import tfidf_top_terms

    docs = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": [
            "apple banana apple",   # tf(apple)=2
            "apple cherry",
            "apple dog dog dog",
        ],
    }))
    out = tfidf_top_terms(docs, k=2)
    rows = {(r["doc_id"], r["token"]): r["tfidf"] for r in out.take_all()}
    # apple appears in all 3 docs -> idf 0 -> never beats any rarer token
    assert rows[(1, "banana")] == round(1 * math.log(3 / 1), 6)
    assert rows[(3, "dog")] == round(3 * math.log(3 / 1), 6)
    assert rows[(2, "cherry")] == round(1 * math.log(3 / 1), 6)
    # doc 1 has only 2 distinct tokens; apple's zero score still ranks
    # (top-k fills with what exists)
    assert rows[(1, "apple")] == 0.0
    per_doc = {}
    for (d, _t) in rows:
        per_doc[d] = per_doc.get(d, 0) + 1
    assert all(v <= 2 for v in per_doc.values())


def test_stratified_sample_dict_quotas():
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.sampling import stratified_sample

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(300), type=pa.int64()),
        "lang": pa.array((["en"] * 2 + ["de"] + ["xx"]) * 75),
    })).repartition(4)
    out = stratified_sample(ds, "lang", k={"en": 7, "de": 3}).take_all()
    by = {}
    for r in out:
        by.setdefault(r["lang"], []).append(r["doc_id"])
    assert sorted(by) == ["de", "en"]          # 'xx' excluded entirely
    assert len(by["en"]) == 7 and len(by["de"]) == 3
    # int quota still matches dict-with-same-values (back-compat)
    flat = stratified_sample(ds, "lang", k=5).take_all()
    assert sum(1 for r in flat if r["lang"] == "xx") == 5


def test_interleaved_costs_and_packing():
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.sources.testdata import DOCUMENTS
    from saber_ray.stages.packing import interleaved_costs, pack_interleaved

    def doc(doc_id, spans):
        return {"doc_id": doc_id, "spans": [
            {"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m) in enumerate(spans)
        ]}

    rows = [
        doc("a", [("text", "one two three", ""), ("image", "", "img://a")]),
        doc("b", [("text", "four", "")]),
        doc("c", []),                                 # empty doc costs 0
        doc("d", [("image", "", "img://d"), ("image", "", "img://d2")]),
    ]
    table = pa.Table.from_pylist(rows, schema=DOCUMENTS)
    costs = interleaved_costs(table, {"image": 100})
    got = dict(zip(costs["doc_id"].to_pylist(), costs["n_tokens"].to_pylist()))
    assert got == {"a": 103, "b": 1, "c": 0, "d": 200}

    ds = rd.from_arrow(table)
    packed = {r["doc_id"]: r for r in pack_interleaved(
        ds, budget=150, bucket_count=1, media_costs={"image": 100}).take_all()}
    # id order a(103), b(1), c(0), d(200): a+b fails? 103+1=104 <= 150 ok,
    # +c still 104, d overflows -> new pack (oversized doc keeps its own)
    assert [packed[k]["pack_id"] for k in "abcd"] == [0, 0, 0, 1]


def test_weighted_sample_determinism_and_bias():
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.sampling import weighted_sample

    # 100 light docs (w=1) vs 100 heavy docs (w=100): heavy dominate
    t = pa.table({
        "doc_id": pa.array(range(200), type=pa.int64()),
        "w": pa.array([1.0] * 100 + [100.0] * 100),
    })
    ds = rd.from_arrow(t).repartition(4)
    got = weighted_sample(ds, "w", k=30, id_column="doc_id").take_all()
    assert len(got) == 30
    heavy = sum(1 for r in got if r["doc_id"] >= 100)
    assert heavy >= 25                       # ∝-weight draw overwhelms
    # layout invariance: different block structure, identical sample
    again = weighted_sample(rd.from_arrow(t).repartition(9), "w", k=30,
                            id_column="doc_id").take_all()
    assert sorted(r["doc_id"] for r in got) == sorted(r["doc_id"] for r in again)
    # zero/negative weights never sampled
    t2 = pa.table({"doc_id": pa.array(range(10), type=pa.int64()),
                   "w": pa.array([0.0] * 5 + [1.0] * 5)})
    ids = {r["doc_id"] for r in weighted_sample(
        rd.from_arrow(t2), "w", k=10, id_column="doc_id").take_all()}
    assert ids == set(range(5, 10))


def test_approx_quantiles_accuracy_and_edges():
    import numpy as np
    import ray.data as rd

    from saber_ray.stages.sampling import approx_quantiles

    rng = np.random.RandomState(0)
    vals = rng.lognormal(0.0, 1.0, size=20000)
    ds = rd.from_items([{"value": float(v)} for v in vals]).repartition(8)
    qs = [0.1, 0.5, 0.9, 0.99]
    out = approx_quantiles(ds, qs, "value", bins=4096)
    got = dict(zip(out["q"].to_pylist(), out["value"].to_pylist()))
    width = (vals.max() - vals.min()) / 4096
    for q in qs:
        exact = np.quantile(vals, q)
        assert abs(got[q] - exact) <= width + 0.02 * max(1.0, exact), (
            q, got[q], exact)

    # constant column: every quantile is the constant
    const = rd.from_items([{"value": 7.5}] * 50)
    cq = approx_quantiles(const, [0.5, 0.9], "value")
    assert cq["value"].to_pylist() == [7.5, 7.5]

    # all-null column: null quantiles, not a crash
    nulls = rd.from_items([{"value": None}] * 10)
    nq = approx_quantiles(nulls, [0.5], "value")
    assert nq["value"].to_pylist() == [None]


def test_grouped_approx_quantiles_accuracy():
    import numpy as np
    import ray.data as rd

    from saber_ray.stages.sampling import grouped_approx_quantiles

    rng = np.random.RandomState(1)
    rows = ([{"g": "a", "value": float(v)} for v in rng.normal(10, 2, 5000)]
            + [{"g": "b", "value": float(v)} for v in rng.normal(100, 20, 5000)]
            + [{"g": "c", "value": 5.0}] * 50)  # constant group
    ds = rd.from_items(rows).repartition(6)
    out = grouped_approx_quantiles(ds, [0.5, 0.9], "value", "g", bins=4096)
    got = {(g, q): v for g, q, v in zip(out["g"].to_pylist(),
                                        out["q"].to_pylist(),
                                        out["value"].to_pylist())}
    a_vals = np.array([r["value"] for r in rows if r["g"] == "a"])
    b_vals = np.array([r["value"] for r in rows if r["g"] == "b"])
    for g, vals in (("a", a_vals), ("b", b_vals)):
        width = (vals.max() - vals.min()) / 4096
        for q in (0.5, 0.9):
            exact = np.quantile(vals, q)
            assert abs(got[(g, q)] - exact) <= width + 0.02 * abs(exact), (
                g, q, got[(g, q)], exact)
    assert got[("c", 0.5)] == 5.0 and got[("c", 0.9)] == 5.0


def test_approx_quantiles_null_and_nan_handling():
    """NaN/null discipline (review-hardened): all-NaN column -> null
    quantiles; a group with no real values is ABSENT from the grouped
    output (the SQL oracle's inner-join semantics); mixed NaN rows are
    dropped, not propagated into the bucket math."""
    import numpy as np
    import ray.data as rd

    from saber_ray.stages.sampling import approx_quantiles, grouped_approx_quantiles

    all_nan = rd.from_items([{"value": float("nan")}] * 20)
    assert approx_quantiles(all_nan, [0.5], "value")["value"].to_pylist() == [None]

    mixed = rd.from_items(
        [{"value": float(v)} for v in np.arange(1.0, 101.0)]
        + [{"value": float("nan")}] * 30)
    got = approx_quantiles(mixed, [0.5], "value")["value"].to_pylist()[0]
    assert abs(got - 50.0) <= (99.0 / 4096) + 1.0  # NaNs excluded from n

    g = rd.from_items(
        [{"g": "a", "value": float(v)} for v in np.arange(10.0)]
        + [{"g": "b", "value": None}] * 5
        + [{"g": "c", "value": float("nan")}] * 5)
    t = grouped_approx_quantiles(g, [0.5], "value", "g")
    assert t["g"].to_pylist() == ["a"]  # b (null) and c (NaN) absent


def test_approx_quantiles_oracle_nan_parity(tmp_path):
    """The DuckDB oracle must share the engine's NaN discipline: a NaN
    row in events changes neither side (DuckDB's min/max/count(value)
    would otherwise INCLUDE NaN — NaN sorts above every double)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    import __ray_entry__ as e
    from saber_ray.stages.sampling import approx_quantiles

    rng = np.random.default_rng(3)
    vals = rng.normal(50.0, 10.0, size=400).tolist() + [float("nan")] * 25
    events = pa.table({
        "event_type": pa.array(["x"] * len(vals)),
        "value": pa.array(vals, type=pa.float64()),
    })
    f = tmp_path / "events.parquet"
    pq.write_table(events, str(f))

    got = approx_quantiles(
        rd.from_arrow(events), [0.1, 0.5, 0.9, 0.99], "value"
    ).to_pandas().sort_values("q").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{f}'")
    want = con.execute(e.oracle_sql()["approx_quantiles"]).df()
    want = want.sort_values("q").reset_index(drop=True)
    assert list(got["q"]) == list(want["q"])
    assert list(got["value"]) == list(want["value"])  # exact: same IEEE steps


def test_temperature_mixture_quota_math():
    from saber_ray.stages.sampling import temperature_mixture

    # heavily skewed strata: 800 head / 150 mid / 50 tail
    rows = (
        [{"doc_id": i, "src": "head"} for i in range(800)]
        + [{"doc_id": 1000 + i, "src": "mid"} for i in range(150)]
        + [{"doc_id": 2000 + i, "src": "tail"} for i in range(50)]
    )
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(5)

    # alpha=1: natural proportions (floor of 100 * c / N)
    nat = temperature_mixture(ds, "src", alpha=1.0, total=100,
                              id_column="doc_id")
    n1 = {r["src"]: 0 for r in nat.take_all()}
    for r in nat.take_all():
        n1[r["src"]] += 1
    assert n1 == {"head": 80, "mid": 15, "tail": 5}

    # alpha=0.5: tail upsampled relative to natural, head downsampled
    t = temperature_mixture(ds, "src", alpha=0.5, total=100,
                            id_column="doc_id")
    n5 = {}
    for r in t.take_all():
        n5[r["src"]] = n5.get(r["src"], 0) + 1
    assert sum(n5.values()) <= 100
    assert n5["tail"] > 5 and n5["head"] < 80
    # alpha→0 approaches uniform: every stratum within one of total/3
    u = temperature_mixture(ds, "src", alpha=1e-9, total=99,
                            id_column="doc_id")
    n0 = {}
    for r in u.take_all():
        n0[r["src"]] = n0.get(r["src"], 0) + 1
    assert all(abs(v - 33) <= 1 for v in n0.values())

    # determinism under block layout
    t2 = temperature_mixture(ds.repartition(1), "src", alpha=0.5,
                             total=100, id_column="doc_id")
    assert sorted(map(tuple, (r.items() for r in t.take_all()))) == \
           sorted(map(tuple, (r.items() for r in t2.take_all())))


def test_profile_numeric_nulls_and_empty_column():
    """Per-column one-pass profile: null counting, min/max/mean over
    valid values only, and a null-only column profiling to nulls."""
    import pyarrow as pa

    from saber_ray.stages.sampling import profile_numeric

    t = pa.table({
        "a": pa.array([1.0, None, 3.0, -2.5], type=pa.float64()),
        "b": pa.array([10, 20, 30, 40], type=pa.int64()),
        "c": pa.array([None] * 4, type=pa.float64()),
    })
    got = {r["column"]: r for r in profile_numeric(
        rd.from_arrow(t), ["a", "b", "c"]).take_all()}
    assert (got["a"]["n"], got["a"]["n_null"]) == (3, 1)
    assert (got["a"]["vmin"], got["a"]["vmax"], got["a"]["mean"]) == (
        -2.5, 3.0, 0.5)
    assert (got["b"]["vmin"], got["b"]["vmax"], got["b"]["mean"]) == (
        10.0, 40.0, 25.0)
    assert (got["c"]["n"], got["c"]["n_null"]) == (0, 4)
    assert got["c"]["vmin"] is None and got["c"]["mean"] is None


# ------------------------------------------------------- top_n_per_group


def test_top_n_per_group_basic_and_ties():
    from saber_ray.stages.sampling import top_n_per_group

    ds = _docs({
        "doc_id": [1, 2, 3, 4, 5, 6, 7],
        "grp": ["a", "a", "a", "b", "b", "c", "c"],
        "score": [3.0, 9.0, 9.0, 1.0, 2.0, 5.0, 5.0],
    }).repartition(3)
    out = top_n_per_group(ds, "grp", "score", 2, id_column="doc_id")
    rows = sorted(
        (r["grp"], r["doc_id"], r["score"]) for r in out.take_all()
    )
    # ties on score break by doc_id ASC: group a keeps 2 then 3 (both 9.0)
    assert rows == [("a", 2, 9.0), ("a", 3, 9.0),
                    ("b", 4, 1.0), ("b", 5, 2.0),
                    ("c", 6, 5.0), ("c", 7, 5.0)]


def test_top_n_per_group_null_group_kept():
    """A null group is still a group: its top-n must appear (r05
    regression — pandas groupby's dropna default silently removed it)."""
    from saber_ray.stages.sampling import top_n_per_group

    ds = _docs({
        "doc_id": [1, 2, 3, 4, 5],
        "grp": pa.array(["a", None, None, None, "a"], type=pa.string()),
        "score": [1.0, 9.0, 7.0, 8.0, 2.0],
    }).repartition(2)
    out = top_n_per_group(ds, "grp", "score", 2, id_column="doc_id")
    rows = sorted(
        ((r["grp"] or ""), r["doc_id"]) for r in out.take_all()
    )
    assert rows == [("", 2), ("", 4), ("a", 1), ("a", 5)]
