"""Quality/safety operator tests: PII redaction counts + replacement,
unigram-LM doc scoring against hand-computed probabilities, chunk-level
exact dedup survivors, and nearest-centroid cluster assignment vs a
brute-force numpy argmax."""

import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from saber_ray.stages.quality import (
    chunk_dedup,
    pii_redact_batch,
    unigram_logprob,
)
from saber_ray.stages.similarity import (
    cluster_assign,
    fixed_centroids,
    kmeans_fit,
)


def test_pii_redact_counts_and_text():
    batch = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "contact alice@example.com or bob@sub.example.org now",
            "server at 192.168.1.1 and ssn 123-45-6789",
            "clean text with no pii at all",
            None,
        ],
    })
    out = pii_redact_batch(batch)
    assert out["n_emails"].to_pylist() == [2, 0, 0, None]
    assert out["n_ips"].to_pylist() == [0, 1, 0, None]
    assert out["n_ssns"].to_pylist() == [0, 1, 0, None]
    red = out["redacted"].to_pylist()
    assert red[0] == "contact <EMAIL> or <EMAIL> now"
    assert red[1] == "server at <IP> and ssn <SSN>"
    assert red[2] == "clean text with no pii at all"
    assert red[3] is None


def test_pii_redact_email_before_ip():
    # emails redact first: a dotted-quad inside an email's domain is
    # consumed by the email rule, not double-counted as an IP
    batch = pa.table({"text": ["mail user@1.2.3.4.example.com end"]})
    out = pii_redact_batch(batch)
    assert out["n_emails"].to_pylist() == [1]
    assert out["n_ips"].to_pylist() == [0]
    assert out["redacted"].to_pylist() == ["mail <EMAIL> end"]
    # bare dotted-quad "domain" has no alphabetic TLD → counted as an IP
    out2 = pii_redact_batch(pa.table({"text": ["mail user@10.0.0.1 end"]}))
    assert out2["n_emails"].to_pylist() == [0]
    assert out2["n_ips"].to_pylist() == [1]


def test_unigram_logprob_hand_computed():
    # corpus: "a a b" + "a c" → counts a=3 b=1 c=1, total=5
    ds = rd.from_arrow(pa.table({
        "doc_id": [0, 1, 2],
        "text": ["a a b", "a c", ""],
    }))
    rows = {r["doc_id"]: r for r in unigram_logprob(ds).take_all()}
    pa_, pb, c = 3 / 5, 1 / 5, 1 / 5
    exp0 = (2 * math.log2(pa_) + math.log2(pb)) / 3
    exp1 = (math.log2(pa_) + math.log2(c)) / 2
    assert rows[0]["n_tokens"] == 3
    assert abs(rows[0]["logprob"] - exp0) < 1e-12
    assert abs(rows[1]["logprob"] - exp1) < 1e-12
    # empty doc: zero tokens, NULL logprob (SQL avg-over-empty semantics)
    assert rows[2]["n_tokens"] == 0
    assert rows[2]["logprob"] is None


def test_chunk_dedup_survivor_and_counts():
    # 10-token chunks; doc 0 and doc 2 share their first chunk exactly,
    # doc 1 is distinct; doc 2's second chunk repeats doc 0's first.
    shared = " ".join(f"w{i}" for i in range(10))
    other = " ".join(f"x{i}" for i in range(10))
    ds = rd.from_arrow(pa.table({
        "doc_id": [0, 1, 2],
        "text": [shared, other, shared + " " + shared],
    }))
    out = {r["chunk_hash"]: r for r in chunk_dedup(ds).take_all()}
    assert len(out) == 2  # two distinct chunk fingerprints
    dups = {(r["first_doc_id"], r["first_idx"]): r["n_dups"]
            for r in out.values()}
    # shared chunk appears 3× (doc0 idx0, doc2 idx0, doc2 idx1);
    # survivor is the lexicographically-first (doc_id, chunk_idx)
    assert dups == {(0, 0): 3, (1, 0): 1}


def test_chunk_dedup_many_partitions():
    # same answers regardless of block layout (partial-agg correctness)
    texts = [" ".join(f"t{i % 4}_{j}" for j in range(25)) for i in range(40)]
    tbl = pa.table({"doc_id": list(range(40)), "text": texts})
    a = {(r["chunk_hash"], r["first_doc_id"], r["first_idx"], r["n_dups"])
         for r in chunk_dedup(rd.from_arrow(tbl)).take_all()}
    b = {(r["chunk_hash"], r["first_doc_id"], r["first_idx"], r["n_dups"])
         for r in chunk_dedup(
             rd.from_arrow(tbl).repartition(13)).take_all()}
    assert a == b and len(a) > 0


def test_cluster_assign_matches_bruteforce():
    rng = np.random.RandomState(3)
    k, dim, n = 8, 64, 200
    cent = fixed_centroids(k=k, dim=dim, seed=7)
    vecs = rng.standard_normal((n, dim))
    ds = rd.from_arrow(pa.table({
        "vec_id": list(range(n)),
        "embedding": [v.tolist() for v in vecs],
    }))
    got = {r["vec_id"]: r["cluster"]
           for r in cluster_assign(ds, cent).take_all()}
    normed = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    expect = (normed @ cent.T).argmax(axis=1)
    assert got == {i: int(expect[i]) for i in range(n)}


def test_fixed_centroids_deterministic_unit():
    a = fixed_centroids(k=4, dim=16, seed=7)
    b = fixed_centroids(k=4, dim=16, seed=7)
    assert np.array_equal(a, b)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


def _lloyd_local(vecs: np.ndarray, cent: np.ndarray, iters: int) -> np.ndarray:
    """Single-process spherical Lloyd reference for kmeans_fit parity."""
    v = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    c = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    for _ in range(iters):
        assign = (v @ c.T).argmax(axis=1)
        new = c.copy()
        for j in range(c.shape[0]):
            members = v[assign == j]
            if len(members):
                m = members.mean(axis=0)
                new[j] = m / np.linalg.norm(m)
        c = new
    return c


def test_kmeans_fit_matches_local_lloyd():
    rng = np.random.RandomState(11)
    k, dim, n = 6, 16, 300
    init = fixed_centroids(k=k, dim=dim, seed=7)
    vecs = rng.standard_normal((n, dim))
    ds = rd.from_arrow(pa.table({
        "vec_id": list(range(n)),
        "embedding": [v.tolist() for v in vecs],
    }))
    got = kmeans_fit(ds, init, iters=3)
    expect = _lloyd_local(vecs, init, iters=3)
    assert np.allclose(got, expect, atol=1e-9)
    assert np.allclose(np.linalg.norm(got, axis=1), 1.0)


def test_kmeans_fit_partition_invariant():
    rng = np.random.RandomState(12)
    k, dim, n = 4, 8, 120
    init = fixed_centroids(k=k, dim=dim, seed=3)
    vecs = rng.standard_normal((n, dim))
    tbl = pa.table({"embedding": [v.tolist() for v in vecs]})
    one = kmeans_fit(rd.from_arrow(tbl), init, iters=2)
    many = kmeans_fit(rd.from_arrow(tbl).repartition(13), init, iters=2)
    assert np.allclose(one, many, atol=1e-9)


def test_kmeans_fit_empty_cluster_keeps_centroid():
    # two tight groups near +e0 / -e0; centroids near e1/-e1 never win a
    # row after iteration 1 if any, so any empty cluster must keep its
    # previous (normalized) centroid rather than collapse to zero/NaN.
    vecs = np.vstack([
        np.tile([1.0, 0.01, 0, 0], (10, 1)),
        np.tile([-1.0, -0.01, 0, 0], (10, 1)),
    ])
    init = np.array([
        [1.0, 0, 0, 0],
        [-1.0, 0, 0, 0],
        [0, 1.0, 0, 0],   # never nearest for any row
        [0, 0, 1.0, 0],   # never nearest for any row
    ])
    ds = rd.from_arrow(pa.table({"embedding": [v.tolist() for v in vecs]}))
    got = kmeans_fit(ds, init, iters=2)
    assert np.allclose(got, _lloyd_local(vecs, init, iters=2), atol=1e-12)
    assert not np.isnan(got).any()
    assert np.allclose(got[2], [0, 1.0, 0, 0])
    assert np.allclose(got[3], [0, 0, 1.0, 0])


def test_quality_filter_rules_and_reasons():
    from saber_ray.stages.quality import quality_filter_batch

    stop_prose = ("the cat and the dog were in the house because it was "
                  "raining and they could not go out for a walk today")
    docs = pa.table({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [
            stop_prose,                              # clean prose → keep
            "short text",                            # too_few_tokens (+low_stopword)
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu",                             # no stopwords
            "a i a o a u i o u a i e o u a i o e u a",  # mean token len 1 < 2
            "the extraordinarily incomprehensible "
            * 12,                                    # mean token len > 10
            ("the cat sat here\nboilerplate line\nboilerplate line\n"
             "boilerplate line\nboilerplate line\nboilerplate line\n"
             "on the mat now and then some more words arrive for the "
             "cat and the dog to read"),             # dup_lines
        ],
    })
    out = quality_filter_batch(docs)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows[1]["keep"] and rows[1]["reasons"] == ""
    assert not rows[2]["keep"] and "too_few_tokens" in rows[2]["reasons"]
    assert rows[3]["reasons"] == "low_stopword"
    assert "short_tokens" in rows[4]["reasons"]
    assert "long_tokens" in rows[5]["reasons"]
    assert "dup_lines" in rows[6]["reasons"]
    # reasons keep the FIXED rule order regardless of which fire
    assert rows[2]["reasons"].split(",")[0] == "too_few_tokens"


def test_quality_filter_repetitive_and_empty():
    from saber_ray.stages.quality import quality_filter_batch

    docs = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["the cat " * 30, "", None],
    })
    out = {r["doc_id"]: r for r in
           quality_filter_batch(docs).to_pylist()}
    assert "repetitive" in out[1]["reasons"]
    # empty and null text behave identically: rejected, never crash
    assert not out[2]["keep"] and not out[3]["keep"]
    assert out[2]["reasons"] == out[3]["reasons"]


def test_bigram_logprob_hand_computed():
    import math

    from saber_ray.stages.quality import bigram_logprob

    # corpus: "a b a b" and "a b c"
    # unigrams: a:3 b:3 c:1, total 7
    # bigrams: (a,b):3 (b,a):1 (b,c):1
    docs = pa.table({"doc_id": [1, 2], "text": ["a b a b", "a b c"]})
    out = {r["doc_id"]: r["bigram_logprob"]
           for r in bigram_logprob(rd.from_arrow(docs), lam=0.75,
                                   top_m=100).take_all()}
    lam = 0.75
    p_ab = lam * (3 / 3) + (1 - lam) * (3 / 7)
    p_ba = lam * (1 / 3) + (1 - lam) * (3 / 7)
    p_bc = lam * (1 / 3) + (1 - lam) * (1 / 7)
    exp1 = (math.log2(p_ab) + math.log2(p_ba) + math.log2(p_ab)) / 3
    exp2 = (math.log2(p_ab) + math.log2(p_bc)) / 2
    assert abs(out[1] - exp1) < 1e-12
    assert abs(out[2] - exp2) < 1e-12


def test_bigram_logprob_pruning_and_short_docs():
    from saber_ray.stages.quality import bigram_logprob

    # top_m=1 keeps only the most frequent bigram; all other transitions
    # back off to the pure unigram term — scores stay finite
    docs = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["x y x y x y", "y z", "solo"],
    })
    rows = {r["doc_id"]: r["bigram_logprob"]
            for r in bigram_logprob(rd.from_arrow(docs), lam=0.75,
                                    top_m=1).take_all()}
    assert all(np.isfinite(v) for k, v in rows.items() if k in (1, 2))
    assert rows[3] is None  # one token -> no transitions -> NULL


def test_bigram_logprob_cross_corpus_oov_finite():
    import ray as _ray

    from saber_ray.stages.quality import BigramScorer, bigram_model

    train = rd.from_arrow(pa.table({"doc_id": [1], "text": ["a b a b"]}))
    model = bigram_model(train, top_m=10)
    scorer = BigramScorer(model, lam=0.75)
    out = scorer(pa.table({"doc_id": [9], "text": ["hello zzz unseen"]}))
    v = out["bigram_logprob"].to_pylist()[0]
    assert v is not None and np.isfinite(v)  # OOV w2 backs off, no -inf


def test_quality_report_per_source_counts():
    """Kept docs count under 'ok'; rejected docs count once per violated
    rule (so one doc may appear under several reasons)."""
    from saber_ray.stages.quality import quality_report

    prose = ("the cat and the dog were in the house because it was "
             "raining and they could not walk")  # passes all gates
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "source": ["web", "web", "web", "books"],
        "text": [
            prose,
            "tiny",                  # too_few_tokens AND low_stopword
            prose,
            prose,
        ],
    }))
    got = {
        (r["source"], r["reason"]): r["n_docs"]
        for r in quality_report(
            docs, group_column="source", min_tokens=10,
            min_stopword_ratio=0.05, min_mean_token_len=1.0,
            max_mean_token_len=10.0, max_dup_line_frac=1.0,
            max_top_bigram_frac=1.0,
        ).take_all()
    }
    assert got == {
        ("web", "ok"): 2,
        ("web", "too_few_tokens"): 1,
        ("web", "low_stopword"): 1,
        ("books", "ok"): 1,
    }


def test_corpus_card_facets_and_empty_text():
    """Facet cardinalities union across batches; null text counts 0
    tokens but the doc still counts; one output row."""
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.textstats import corpus_card

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array(["a b", "ccc", None, "d 9"], type=pa.string()),
        "lang": pa.array(["en", "fr", "en", "de"]),
        "source": pa.array(["s1", "s1", "s2", "s2"]),
        "n_chars": pa.array([3, 3, 0, 3], type=pa.int64()),
    })).repartition(3)
    row = corpus_card(docs).take_all()
    assert len(row) == 1
    r = row[0]
    assert r["n_docs"] == 4 and r["n_sources"] == 2 and r["n_langs"] == 3
    assert r["total_chars"] == 9 and r["total_tokens"] == 5
    assert r["avg_chars"] == 2.25


def test_adaptive_quality_filter_per_group_thresholds():
    """Each group is gated by ITS OWN q25 token count: the terse group
    keeps its short docs, the verbose group prunes relatively."""
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.quality import adaptive_quality_filter

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(8)), type=pa.int64()),
        "source": pa.array(["t"] * 4 + ["v"] * 4),
        # terse: 1,2,3,4 tokens (q25 → 1, all kept)
        # verbose: 10,20,30,40 tokens (q25 → 10, all kept... use uneven)
        "text": pa.array(
            ["a", "a b", "a b c", "a b c d",
             " ".join(["w"] * 10), " ".join(["w"] * 20),
             " ".join(["w"] * 30), " ".join(["w"] * 5)]),
    })).repartition(3)
    got = {r["source"]: (r["threshold"], r["n_docs"], r["n_kept"])
           for r in adaptive_quality_filter(docs).take_all()}
    # terse: counts 1,2,3,4 → ceil(.25*4)=1st distinct cum ≥1 → threshold 1
    assert got["t"] == (1, 4, 4)
    # verbose: counts 5,10,20,30 → threshold 5 → all kept
    assert got["v"] == (5, 4, 4)
    # tighten q: q=0.5 → thresholds 2 and 10; kept 3 each
    got2 = {r["source"]: (r["threshold"], r["n_kept"])
            for r in adaptive_quality_filter(docs, q=0.5).take_all()}
    assert got2 == {"t": (2, 3), "v": (10, 3)}


def test_adaptive_quality_filter_null_group_and_text():
    """Null source rows are excluded (the grouped_token_frequency rule —
    SQL's join-back drops NULL keys anyway); null text counts as an
    empty doc and can pull a group's threshold to 0."""
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.quality import adaptive_quality_filter

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "source": pa.array(["s", "s", None, "s"]),
        "text": pa.array(["a b c", None, "x y", "d e f g"]),
    })).repartition(2)
    got = {r["source"]: (r["threshold"], r["n_docs"], r["n_kept"])
           for r in adaptive_quality_filter(docs).take_all()}
    # source s: counts {3, 0, 4} → q25 target ceil(.25*3)=1 → threshold 0
    assert got == {"s": (0, 3, 3)}
