"""Dedup + similarity operator tests: MinHash/LSH candidate recall on
constructed near-duplicates, SimHash, distributed Jaccard verification,
exact dedup, brute-force vs LSH ANN agreement, and Annotator fusion
parity with the separate tagger→linker stages."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from saber_ray.gazetteer import SABER_GROUNDING, build_linker_dict
from saber_ray.schemas import DOCUMENTS
from saber_ray.stages.annotate import Annotator
from saber_ray.stages.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    simhash_near_pairs,
    verify_pairs_jaccard,
)
from saber_ray.stages.linker import EntityLinker
from saber_ray.stages.similarity import embedding_dup_pairs, knn_topk, knn_topk_lsh
from saber_ray.stages.tagger import DictionaryTagger


@pytest.fixture(scope="module")
def dup_corpus():
    """80 distinct docs + 5 near-duplicate pairs + 2 exact duplicates."""
    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(300)]
    rows = []
    for i in range(80):
        words = rng.choice(vocab, size=40).tolist()
        rows.append({"doc_id": i, "text": " ".join(words)})
    for j in range(5):  # near-dups: copy with 2 words changed
        base = rows[j]["text"].split()
        base[5], base[20] = "changed", "words"
        rows.append({"doc_id": 100 + j, "text": " ".join(base)})
    rows.append({"doc_id": 200, "text": rows[10]["text"]})  # exact dup
    rows.append({"doc_id": 201, "text": rows[11]["text"]})
    return rd.from_arrow(pa.table({
        "doc_id": [r["doc_id"] for r in rows],
        "text": [r["text"] for r in rows],
    })).materialize()


def test_dedup_exact_survivors(dup_corpus):
    out = dedup_exact(dup_corpus)
    assert out.count() == 85  # 87 docs, 2 exact dups collapsed
    survivors = {r["doc_id"] for r in out.take_all()}
    assert 10 in survivors and 200 not in survivors
    assert 11 in survivors and 201 not in survivors


def test_minhash_finds_near_dups(dup_corpus):
    # 2-of-40 words changed → Jaccard ≈ 0.73; 32 bands × 4 rows puts the
    # LSH s-curve threshold at (1/32)^(1/4) ≈ 0.42, so these must be caught
    # (the 16×8 default thresholds at ≈ 0.71 — tuned for closer duplicates)
    pairs = {(r["id_a"], r["id_b"])
             for r in minhash_lsh_pairs(dup_corpus, num_bands=32).take_all()}
    for j in range(5):
        assert (j, 100 + j) in pairs, f"near-dup pair {j} missed"
    assert (10, 200) in pairs and (11, 201) in pairs


def test_jaccard_verification_stage(dup_corpus):
    cand = minhash_lsh_pairs(dup_corpus, num_bands=32)
    verified = verify_pairs_jaccard(cand, dup_corpus, min_jaccard=0.5)
    rows = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.take_all()}
    assert rows[(10, 200)] == 1.0
    for j in range(5):
        assert 0.5 <= rows[(j, 100 + j)] < 1.0


def test_ngram_jaccard_exact_inverted_index(dup_corpus):
    # the exact flavor must find every verified pair the MinHash flavor
    # finds (candidate recall 1 under the df cap) with identical scores
    from saber_ray.stages.dedup import ngram_jaccard_pairs

    exact = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(dup_corpus, min_jaccard=0.5).take_all()}
    mh = verify_pairs_jaccard(
        minhash_lsh_pairs(dup_corpus, num_bands=32), dup_corpus,
        min_jaccard=0.5)
    for r in mh.take_all():
        assert exact[(r["id_a"], r["id_b"])] == r["jaccard"]
    assert exact[(10, 200)] == 1.0
    for j in range(5):
        assert 0.5 <= exact[(j, 100 + j)] < 1.0


def test_ngram_jaccard_sample_mod_subset(dup_corpus):
    # modulo-sampled shingling yields a SUBSET of the exact pair set
    # (fewer candidates, identical verification scores where found),
    # and still catches exact duplicates at modest mod
    from saber_ray.stages.dedup import ngram_jaccard_pairs

    full = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(dup_corpus, min_jaccard=0.5).take_all()}
    sampled = {(r["id_a"], r["id_b"]): r["jaccard"]
               for r in ngram_jaccard_pairs(
                   dup_corpus, min_jaccard=0.5, sample_mod=2).take_all()}
    assert set(sampled) <= set(full)
    for k, v in sampled.items():
        assert v == full[k]
    assert (10, 200) in sampled and (11, 201) in sampled


def test_simhash_finds_exact_and_near(dup_corpus):
    pairs = {(r["id_a"], r["id_b"]) for r in simhash_near_pairs(dup_corpus, max_hamming=6).take_all()}
    assert (10, 200) in pairs and (11, 201) in pairs


def test_knn_lsh_subset_of_bruteforce():
    rng = np.random.RandomState(3)
    mat = rng.normal(size=(200, 16))
    ds = rd.from_arrow(pa.table({
        "vec_id": list(range(200)),
        "embedding": [row.tolist() for row in mat],
    }))
    queries, qids = mat[:3], [0, 1, 2]
    exact = {(r["query_id"], r["neighbor_id"]) for r in
             knn_topk(ds, queries, qids, k=5).take_all()}
    approx = knn_topk_lsh(ds, queries, qids, k=5, bits=4).take_all()
    assert approx, "LSH variant returned nothing"
    # every approx neighbor must at least be a same-bucket true vector
    assert all(r["rank"] >= 1 for r in approx)
    # recall vs exact is positive (hyperplane buckets keep near vectors)
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert len(approx_pairs & exact) > 0


def test_embedding_dup_pairs_symmetric():
    base = np.random.RandomState(5).normal(size=(30, 8))
    base[7] = base[3] * 1.001  # near-identical direction
    ds = rd.from_arrow(pa.table({
        "vec_id": list(range(30)),
        "embedding": [r.tolist() for r in base],
    }))
    pairs = {(r["id_a"], r["id_b"]) for r in embedding_dup_pairs(ds, threshold=0.999).take_all()}
    assert (3, 7) in pairs
    assert all(a < b for a, b in pairs)


# ------------------------------------------------- annotator fusion ------


def test_annotator_fusion_parity():
    """Fused Annotator must equal DictionaryTagger → EntityLinker."""
    docs = []
    texts = [
        ["Glucose and p53 in cystic fibrosis.", "Mouse and human MK2!"],
        ["No entities at all here."],
        [""],
    ]
    for i, t in enumerate(texts):
        spans, off = [], 0
        if i == 1:
            spans.append({"kind": "image", "text": "", "media_ref": "m://x", "offset": 0})
        for s in t:
            spans.append({"kind": "text", "text": s, "media_ref": "", "offset": off})
            off += len(s) + 1
        docs.append({"doc_id": f"d{i}", "spans": spans})
    batch = pa.Table.from_pylist(docs, schema=DOCUMENTS)

    fused = Annotator()(batch)
    chained = EntityLinker(build_linker_dict(SABER_GROUNDING))(DictionaryTagger()(batch))
    assert fused["ents"].to_pylist() == chained["ents"].to_pylist()
    assert fused["span_hash"].to_pylist() == chained["span_hash"].to_pylist()


def test_knn_ivf_recall():
    """IVF with full probing equals exact; partial probing keeps high
    recall on clustered data."""
    from saber_ray.stages.similarity import knn_topk_ivf

    rng = np.random.RandomState(11)
    centers = rng.normal(size=(8, 16)) * 4
    vecs = np.vstack([c + rng.normal(size=(40, 16)) for c in centers])
    ds = rd.from_arrow(pa.table({
        "vec_id": list(range(len(vecs))),
        "embedding": [v.tolist() for v in vecs],
    })).materialize()
    queries, qids = vecs[:4], [0, 1, 2, 3]
    exact = {(r["query_id"], r["neighbor_id"]) for r in
             knn_topk(ds, queries, qids, k=5).take_all()}

    full = {(r["query_id"], r["neighbor_id"]) for r in
            knn_topk_ivf(ds, queries, qids, k=5, num_centroids=8, nprobe=8).take_all()}
    assert full == exact  # probing every list == exact

    part = {(r["query_id"], r["neighbor_id"]) for r in
            knn_topk_ivf(ds, queries, qids, k=5, num_centroids=8, nprobe=2).take_all()}
    recall = len(part & exact) / len(exact)
    assert recall >= 0.8, f"IVF nprobe=2 recall {recall}"


def test_dedup_documents_exact_interleaved():
    from saber_ray.sources.synthetic import generate_documents
    from saber_ray.stages.dedup import dedup_documents_exact

    table, _, _ = generate_documents(50, seed=44)
    # duplicate two documents under new ids
    import pyarrow as pa

    dup = table.to_pylist()
    dup.append({"doc_id": "zzz-copy-1", "spans": dup[3]["spans"]})
    dup.append({"doc_id": "zzz-copy-2", "spans": dup[7]["spans"]})
    ds = rd.from_arrow(pa.Table.from_pylist(dup, schema=table.schema))
    survivors = {r["doc_id"] for r in dedup_documents_exact(ds).take_all()}
    # expected uniques derived from the data (the generator itself can
    # produce identical single-filler docs)
    uniq = {tuple((s["kind"], s["text"], s["media_ref"]) for s in d["spans"])
            for d in dup}
    assert len(survivors) == len(uniq)
    assert "zzz-copy-1" not in survivors and "zzz-copy-2" not in survivors
    assert dup[3]["doc_id"] in survivors


def test_embedding_dup_lsh_matches_exact_on_planted_dups():
    """Scale path (LSH banding + distributed cosine verify) vs exact
    all-pairs: precision 1.0 by construction, recall 1.0 on planted
    near-duplicates at a realistic threshold."""
    rng = np.random.RandomState(13)
    base = rng.normal(size=(400, 32))
    for j in range(10):  # planted near-dups: tiny perturbation
        base[200 + j] = base[j] + rng.normal(scale=0.02, size=32)
    ds = rd.from_arrow(pa.table({
        "vec_id": list(range(400)),
        "embedding": [r.tolist() for r in base],
    })).materialize()
    exact = {(r["id_a"], r["id_b"]) for r in
             embedding_dup_pairs(ds, threshold=0.9, method="exact").take_all()}
    lsh = {(r["id_a"], r["id_b"]) for r in
           embedding_dup_pairs(ds, threshold=0.9, method="lsh").take_all()}
    assert exact, "fixture produced no near-dup pairs"
    assert lsh == exact  # precision AND recall 1.0 here
    assert all(a < b for a, b in lsh)


def test_verify_pairs_large_candidate_set(dup_corpus):
    """Distributed verification with a LARGE candidate set (every doc a
    member of some pair): nothing but candidate IDS may touch the
    driver, and scores must equal the driver-side kernel."""
    from saber_ray.stages.dedup import jaccard_for_pairs

    docs = dup_corpus.take_all()
    ids = sorted(r["doc_id"] for r in docs)
    # all consecutive pairs → candidate set == whole corpus
    pair_list = [(ids[i], ids[i + 1]) for i in range(len(ids) - 1)]
    pairs = rd.from_arrow(pa.table({
        "id_a": [a for a, _ in pair_list],
        "id_b": [b for _, b in pair_list],
    }))
    verified = verify_pairs_jaccard(pairs, dup_corpus, min_jaccard=0.0)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.take_all()}
    assert len(got) == len(pair_list)
    texts = {r["doc_id"]: r["text"] for r in docs}
    for a, b, j in jaccard_for_pairs(texts, pair_list):
        assert abs(got[(a, b)] - j) < 1e-12, (a, b)


def test_attach_pair_payload_empty_pairs_keep_schema():
    from saber_ray.stages.pairs import attach_pair_payload

    items = rd.from_arrow(pa.table({
        "vec_id": pa.array([1, 2], type=pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]], type=pa.list_(pa.float64())),
    }))
    empty = rd.from_arrow(pa.table({
        "id_a": pa.array([], type=pa.int64()),
        "id_b": pa.array([], type=pa.int64()),
    }))
    out = attach_pair_payload(empty, items, "vec_id", "embedding")
    assert out.count() == 0
    assert set(out.schema().names) == {"id_a", "id_b", "payload_a", "payload_b"}


def test_connected_components_shapes():
    """Chains, cycles, stars, int ids — component = min reachable id."""
    from saber_ray.stages.graph import connected_components

    pairs = rd.from_arrow(pa.table({
        "id_a": ["b", "c", "a", "x", "p", "p", "p", "cyc1", "cyc2", "cyc3"],
        "id_b": ["c", "d", "b", "y", "q", "r", "s", "cyc2", "cyc3", "cyc1"],
    }))
    got = sorted((r["node"], r["component"])
                 for r in connected_components(pairs).take_all())
    assert got == [
        ("a", "a"), ("b", "a"), ("c", "a"), ("cyc1", "cyc1"),
        ("cyc2", "cyc1"), ("cyc3", "cyc1"), ("d", "a"),
        ("p", "p"), ("q", "p"), ("r", "p"), ("s", "p"),
        ("x", "x"), ("y", "x"),
    ]
    # int ids: NUMERIC min (10 < 2 lexicographically would be wrong)
    ipairs = rd.from_arrow(pa.table({
        "id_a": pa.array([10, 2], type=pa.int64()),
        "id_b": pa.array([2, 30], type=pa.int64()),
    }))
    got = sorted((r["node"], r["component"])
                 for r in connected_components(ipairs).take_all())
    assert got == [(2, 2), (10, 2), (30, 2)]


def test_connected_components_matches_union_find():
    """Property: distributed label propagation == driver union-find."""
    import random

    from saber_ray.stages.graph import connected_components

    rng = random.Random(11)
    nodes = [f"n{i:03d}" for i in range(60)]
    pairs = [(a, b) for a, b in
             ((rng.choice(nodes), rng.choice(nodes)) for _ in range(80))
             if a != b]
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {n for ab in pairs for n in ab}
    expected = sorted((n, min(m for m in touched if find(m) == find(n)))
                      for n in touched)
    ds = rd.from_arrow(pa.table({
        "id_a": [a for a, _ in pairs], "id_b": [b for _, b in pairs],
    }))
    got = sorted((r["node"], r["component"])
                 for r in connected_components(ds).take_all())
    assert got == expected


def test_near_dup_transitive_policy(dup_corpus):
    """transitive=True keeps exactly one survivor per component even
    when the greedy pair policy would keep several."""
    from saber_ray.stages.dedup import near_dup_dropped_ids

    greedy = {r["doc_id"] for r in near_dup_dropped_ids(
        dup_corpus, min_jaccard=0.5).take_all()}
    transitive = {r["doc_id"] for r in near_dup_dropped_ids(
        dup_corpus, min_jaccard=0.5, transitive=True).take_all()}
    # both policies keep the min of every chain; transitive never keeps
    # MORE docs than greedy
    assert greedy <= transitive or greedy == transitive


def test_ivf_stored_index_matches_inmemory_ivf(tmp_path):
    """Persisted-index query == in-memory IVF (same centroids, same
    probes), and the partitioned layout exists on disk."""
    import os

    import numpy as np
    import ray.data as rd

    from saber_ray.sources.testdata import read_table
    from saber_ray.stages.similarity import (
        ivf_query_index, ivf_write_index, knn_topk_ivf)

    sf = "/root/testdata/sf0.001"
    ds = read_table(sf, "embeddings", columns=["vec_id", "embedding"])
    qrows = sorted(ds.filter(expr="vec_id < 3").take_all(),
                   key=lambda r: r["vec_id"])
    queries = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qids = [r["vec_id"] for r in qrows]

    idx = str(tmp_path / "ivf")
    centroids = ivf_write_index(ds, idx, num_centroids=8, seed=42)
    # hive layout: one directory per inverted list
    parts = [d for d in os.listdir(os.path.join(idx, "lists")) if d.startswith("centroid=")]
    assert len(parts) >= 2

    stored = ivf_query_index(idx, queries, qids, k=5, nprobe=2,
                             centroids=centroids)
    mem = knn_topk_ivf(ds, queries, qids, k=5, num_centroids=8, nprobe=2,
                       seed=42)
    key = lambda rows: sorted((r["query_id"], r["neighbor_id"], r["rank"])
                              for r in rows)
    assert key(stored.take_all()) == key(mem.take_all())




class _warn_capture:
    def __enter__(self):
        import logging

        self.records = []
        self.handler = logging.Handler()
        self.handler.emit = lambda rec: self.records.append(rec.getMessage())
        logging.getLogger("saber_ray.stages.dedup").addHandler(self.handler)
        return self.records

    def __exit__(self, *exc):
        import logging

        logging.getLogger("saber_ray.stages.dedup").removeHandler(self.handler)
        return False


def test_simhash_config_validation():
    import pytest
    import ray.data as rd
    import pyarrow as pa

    from saber_ray.stages.dedup import simhash_near_pairs

    docs = rd.from_arrow(pa.table({"doc_id": [1], "text": ["hello world"]}))
    with pytest.raises(ValueError):
        simhash_near_pairs(docs, num_tables=5)                 # >64-bit bands
    # max_hamming >= num_tables is allowed (best-effort recall) but warns
    with _warn_capture() as logs:
        simhash_near_pairs(docs, max_hamming=4, num_tables=4)
    assert any("best-effort" in m for m in logs)


def test_lsh_candidate_pairs_empty_corpus():
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.similarity import lsh_candidate_pairs

    empty = rd.from_arrow(pa.table({
        "vec_id": pa.array([], type=pa.int64()),
        "embedding": pa.array([], type=pa.list_(pa.float64())),
    }))
    assert lsh_candidate_pairs(empty, threshold=0.9).take_all() == []


def test_stack_reports_bad_rows():
    import pyarrow as pa
    import pytest

    from saber_ray.stages.similarity import _stack

    with pytest.raises(ValueError, match="null at batch row 1"):
        _stack(pa.array([[1.0, 2.0], None, [3.0, 4.0]]))
    with pytest.raises(ValueError, match="ragged"):
        _stack(pa.array([[1.0, 2.0], [3.0]]))


def test_expand_bucketed_pairs_cap_and_cross_block():
    """The shared pair-expansion kernel: (a) an oversize LSH bucket is
    dropped (logged, never expanded to O(n^2)); (b) a bucket whose rows
    arrive in DIFFERENT input blocks still pairs (the hash shuffle
    co-locates them); (c) ids keep their Arrow type through the pandas
    group frames."""
    import pyarrow as pa

    import ray.data as rd
    from saber_ray.stages.dedup import expand_bucketed_pairs

    # bucket key 1 has 3 members split across two blocks; key 2 has 30
    # members (> max_bucket=8) and must vanish; key 3 is a singleton
    rows_a = [{"doc_id": i, "band": 0, "band_hash": 1} for i in (10, 11)]
    rows_a += [{"doc_id": 100 + i, "band": 0, "band_hash": 2} for i in range(15)]
    rows_b = [{"doc_id": 12, "band": 0, "band_hash": 1}]
    rows_b += [{"doc_id": 200 + i, "band": 0, "band_hash": 2} for i in range(15)]
    rows_b += [{"doc_id": 999, "band": 0, "band_hash": 3}]
    bands = rd.from_arrow([
        pa.Table.from_pylist(rows_a), pa.Table.from_pylist(rows_b)
    ])
    out = expand_bucketed_pairs(
        bands, ["band", "band_hash"], "doc_id", pa.int64(),
        max_bucket=8, n_buckets=4,
    )
    got = sorted((r["id_a"], r["id_b"]) for r in out.take_all())
    assert got == [(10, 11), (10, 12), (11, 12)]
    sch = out.schema()
    assert dict(zip(sch.names, sch.types))["id_a"] == pa.int64()


def test_exact_dropped_ids_cap_keeps_overflow():
    """A degenerate fingerprint shared by more than max_group docs drops
    only max_group of them — the overflow SURVIVES (a drop-list must
    never drop a survivor)."""
    import ray.data as rd
    from saber_ray.stages.dedup import exact_dropped_ids

    docs = rd.from_items([
        {"doc_id": i,
         "spans": [{"kind": "text", "text": "same", "media_ref": ""}]}
        for i in range(10)
    ] + [
        {"doc_id": 100,
         "spans": [{"kind": "text", "text": "unique", "media_ref": ""}]}
    ])
    dropped = sorted(r["doc_id"] for r in
                     exact_dropped_ids(docs, max_group=4).take_all())
    # min id 0 survives; ids 1..4 dropped (cap 4); 5..9 overflow survives
    assert dropped == [1, 2, 3, 4]


def test_simhash64_many_matches_scalar_kernel():
    """The batched segment-sum kernel must be bit-for-bit identical to
    mapping simhash64 over per-document slices, including empty docs
    and heavy token repetition."""
    import numpy as np

    from saber_ray.functions.hashing import simhash64, simhash64_many

    rng = np.random.default_rng(11)
    lengths = np.array([0, 1, 7, 0, 128, 3, 0], dtype=np.int64)
    hashes = rng.integers(0, 2**64, size=int(lengths.sum()), dtype=np.uint64)
    # heavy repetition in one doc (multiplicity must be preserved)
    hashes[8:12] = hashes[8]
    got = simhash64_many(hashes, lengths)
    pos = 0
    for i, n in enumerate(lengths):
        want = simhash64(hashes[pos:pos + n])
        assert int(got[i]) == want, i
        pos += n


def test_simhash_batch_null_and_values():
    import pyarrow as pa

    from saber_ray.functions.hashing import simhash64, stable_u64_md5
    from saber_ray.stages.dedup import simhash_batch, _TOKEN_RE

    t = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                  "text": ["the cat sat on the mat", "", "Cat CAT cat!"]})
    out = simhash_batch(t)["simhash"].to_pylist()
    assert out[1] is None                        # token-less doc → NULL

    def scalar(text):
        toks = _TOKEN_RE.findall(text.lower())
        import numpy as np
        h = np.array([stable_u64_md5(x) for x in toks], dtype=np.uint64)
        v = simhash64(h)
        return v - (1 << 64) if v >= (1 << 63) else v

    assert out[0] == scalar("the cat sat on the mat")
    assert out[2] == scalar("Cat CAT cat!")


def test_ivf_write_index_refined_centroids(tmp_path):
    """refine_iters runs full-corpus Lloyd passes after sample training:
    stored centroids == train_ivf_centroids + kmeans_fit, the refined
    index still answers exactly at nprobe=all, and list dirs exist."""
    import os

    import numpy as np

    from saber_ray.sources.testdata import read_table
    from saber_ray.stages.similarity import (
        ivf_query_index, ivf_write_index, kmeans_fit, knn_topk,
        train_ivf_centroids)

    sf = "/root/testdata/sf0.001"
    ds = read_table(sf, "embeddings", columns=["vec_id", "embedding"])
    qrows = sorted(ds.filter(expr="vec_id < 3").take_all(),
                   key=lambda r: r["vec_id"])
    queries = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qids = [r["vec_id"] for r in qrows]

    idx = str(tmp_path / "ivf_refined")
    got = ivf_write_index(ds, idx, num_centroids=8, seed=42, refine_iters=2)
    expect = kmeans_fit(
        ds, train_ivf_centroids(ds, 8, seed=42), iters=2)
    assert np.allclose(got, expect, atol=1e-12)
    assert np.allclose(
        got, np.load(os.path.join(idx, "centroids.npy")), atol=0)

    stored = ivf_query_index(idx, queries, qids, k=5, nprobe=8,
                             centroids=got)
    exact = knn_topk(ds, queries, qids, k=5)
    key = lambda rows: sorted((r["query_id"], r["neighbor_id"], r["rank"])
                              for r in rows)
    assert key(stored.take_all()) == key(exact.take_all())


def test_semantic_dedup_pairs_matches_bruteforce():
    """Pairs == brute-force cosine>=t restricted to same nearest
    centroid; cross-cluster near-dups are excluded by design."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.similarity import (
        fixed_centroids, semantic_dedup_pairs)

    rng = np.random.RandomState(5)
    n, dim = 160, 16
    base = rng.standard_normal((n, dim))
    # plant near-dups: rows 2i+1 ~= rows 2i for the first 20 pairs
    for i in range(20):
        base[2 * i + 1] = base[2 * i] + 0.01 * rng.standard_normal(dim)
    cent = fixed_centroids(k=4, dim=dim, seed=9)
    ds = rd.from_arrow(pa.table({
        "vec_id": list(range(n)),
        "embedding": [v.tolist() for v in base],
    })).repartition(7)
    got = sorted((r["id_a"], r["id_b"])
                 for r in semantic_dedup_pairs(ds, cent, threshold=0.8,
                                               block=13).take_all())
    normed = base / np.linalg.norm(base, axis=1, keepdims=True)
    cluster = (normed @ cent.T).argmax(axis=1)
    sims = normed @ normed.T
    expect = sorted(
        (i, j) for i in range(n) for j in range(i + 1, n)
        if cluster[i] == cluster[j] and sims[i, j] >= 0.8)
    assert got == expect
    assert len(expect) >= 20  # the planted dups are all same-cluster


def test_semantic_dedup_pairs_empty_and_cap():
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from saber_ray.stages.similarity import (
        fixed_centroids, semantic_dedup_pairs)

    rng = np.random.RandomState(6)
    vecs = rng.standard_normal((30, 8))
    ds = rd.from_arrow(pa.table({
        "vec_id": list(range(30)),
        "embedding": [v.tolist() for v in vecs],
    }))
    cent = fixed_centroids(k=2, dim=8, seed=1)
    # threshold above any random-pair cosine → typed empty result
    out = semantic_dedup_pairs(ds, cent, threshold=0.999)
    tbl = out.take_all()
    assert tbl == []
    assert set(out.schema().names) == {"id_a", "id_b"}
    with pytest.raises(ValueError, match="max_cluster"):
        semantic_dedup_pairs(ds, cent, threshold=0.9,
                             max_cluster=10).take_all()


def test_incremental_index_layout_and_matches(dup_corpus, tmp_path):
    from saber_ray.stages.dedup import build_minhash_index, dedup_against_index

    corpus = dup_corpus.filter(lambda r: r["doc_id"] < 100)
    increment = dup_corpus.filter(lambda r: r["doc_id"] >= 100)
    idx = str(tmp_path / "mhidx")
    build_minhash_index(corpus, idx, num_parts=8)

    # persisted layout: params sidecar + hive-partitioned band/doc tables
    import glob
    import json
    import os

    params = json.load(open(os.path.join(idx, "params.json")))
    assert params["num_bands"] == 32 and params["num_parts"] == 8
    assert glob.glob(os.path.join(idx, "bands", "part=*", "*.parquet"))
    assert glob.glob(os.path.join(idx, "docs", "spart=*", "*.parquet"))

    out = {(r["new_id"], r["dup_of"]): r["jaccard"]
           for r in dedup_against_index(increment, idx).take_all()}
    assert out[(200, 10)] == 1.0 and out[(201, 11)] == 1.0
    for j in range(5):
        assert 0.5 <= out[(100 + j, j)] < 1.0
    # distinct corpus docs never match each other (cross-side pairs only)
    assert all(new >= 100 and dup < 100 for new, dup in out)


def test_incremental_no_match_and_empty(dup_corpus, tmp_path):
    from saber_ray.stages.dedup import build_minhash_index, dedup_against_index

    corpus = dup_corpus.filter(lambda r: r["doc_id"] < 100)
    idx = str(tmp_path / "mhidx")
    build_minhash_index(corpus, idx, num_parts=4)

    # an increment with disjoint vocabulary matches nothing; output stays
    # TYPED and empty
    fresh = rd.from_arrow(pa.table({
        "doc_id": [900, 901],
        "text": ["zebra quokka lemur " * 10, "axolotl capuchin " * 12],
    }))
    out = dedup_against_index(fresh, idx)
    assert out.count() == 0
    assert set(out.schema().names) == {"new_id", "dup_of", "jaccard"}


def test_incremental_matches_cross_pairs_of_full_dedup(dup_corpus, tmp_path):
    # the incremental result must equal the cross-side subset of the
    # one-shot pipeline over the union (same banding, same verify)
    from saber_ray.stages.dedup import (
        build_minhash_index,
        dedup_against_index,
        minhash_lsh_pairs,
        verify_pairs_jaccard,
    )

    corpus = dup_corpus.filter(lambda r: r["doc_id"] < 100)
    increment = dup_corpus.filter(lambda r: r["doc_id"] >= 100)
    idx = str(tmp_path / "mhidx")
    build_minhash_index(corpus, idx, num_parts=8)
    inc_out = {(r["new_id"], r["dup_of"]) for r in
               dedup_against_index(increment, idx).take_all()}

    full = verify_pairs_jaccard(
        minhash_lsh_pairs(dup_corpus), dup_corpus, min_jaccard=0.5
    )
    cross = {(max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"]))
             for r in full.take_all()
             if (r["id_a"] >= 100) != (r["id_b"] >= 100)}
    assert inc_out == cross


def test_incremental_index_extend_lifecycle(dup_corpus, tmp_path):
    # dedup shard 1 against the index, extend the index with shard 1,
    # then shard 2 must match docs from BOTH the corpus and shard 1
    from saber_ray.stages.dedup import (
        build_minhash_index,
        dedup_against_index,
        extend_minhash_index,
    )

    corpus = dup_corpus.filter(lambda r: r["doc_id"] < 100)
    shard1 = dup_corpus.filter(lambda r: 100 <= r["doc_id"] < 200)  # 100..104
    idx = str(tmp_path / "mhidx")
    build_minhash_index(corpus, idx, num_parts=8)

    out1 = {(r["new_id"], r["dup_of"]) for r in
            dedup_against_index(shard1, idx).take_all()}
    assert out1 == {(100 + j, j) for j in range(5)}
    extend_minhash_index(shard1, idx)

    # shard 2: one exact dup of a CORPUS doc (id 200 copies 10) and one
    # exact dup of a SHARD-1 doc (id 300 copies 104)
    s1_text = {r["doc_id"]: r["text"] for r in shard1.take_all()}
    shard2 = rd.from_arrow(pa.table({
        "doc_id": [200, 300],
        "text": [
            {r["doc_id"]: r["text"] for r in corpus.take_all()}[10],
            s1_text[104],
        ],
    }))
    out2 = {(r["new_id"], r["dup_of"]): r["jaccard"] for r in
            dedup_against_index(shard2, idx).take_all()}
    assert out2[(200, 10)] == 1.0
    assert out2[(300, 104)] == 1.0  # only findable via the extension


def test_duplicate_spans_islands_and_within_doc():
    from saber_ray.stages.dedup import duplicate_spans

    boiler = "please subscribe to our newsletter for daily updates today"
    docs = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [
            f"unique opening words here {boiler} and some unique tail",
            f"other lead-in text now {boiler} different ending follows",
            # within-ONE-doc repetition also counts (corpus-wide >= 2)
            "spam spam spam spam spam spam spam spam spam spam",
            "entirely distinct vocabulary without any repeated windows",
        ],
    })
    out = duplicate_spans(rd.from_arrow(docs).repartition(4), k=8)
    spans = {}
    for r in out.take_all():
        spans.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"]))
    # the shared 9-token boilerplate = two 8-windows, merged to one span
    # ("lead-in" tokenizes as two tokens, shifting doc 2 by one)
    assert spans[1] == [(4, 13)]
    assert spans[2] == [(5, 14)]
    # 10x "spam": windows 0..2 all duplicated -> one maximal span [0, 10)
    assert spans[3] == [(0, 10)]
    assert 4 not in spans
    # partition invariance
    out1 = duplicate_spans(rd.from_arrow(docs).repartition(1), k=8)
    assert sorted((r["doc_id"], r["span_start"], r["span_end"])
                  for r in out1.take_all()) == \
           sorted((d, s, e) for d, v in spans.items() for s, e in v)


def test_duplicate_spans_short_and_empty_docs():
    from saber_ray.stages.dedup import duplicate_spans

    docs = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["too short", "", None],
    })
    assert duplicate_spans(rd.from_arrow(docs), k=8).count() == 0


def test_cut_spans_lifecycle():
    from saber_ray.stages.dedup import cut_spans, duplicate_spans

    boiler = " ".join(f"b{i}" for i in range(9))  # 9-token boilerplate
    docs = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [
            f"alpha beta gamma {boiler} delta epsilon",
            f"{boiler} zeta eta theta iota kappa other words",
            "spam spam spam spam spam spam spam spam spam spam",  # fully duplicated
            "untouched document with its own distinct vocabulary kept",
        ],
    })
    ds = rd.from_arrow(docs).repartition(3)
    out = {r["doc_id"]: r["clean_text"]
           for r in cut_spans(ds, duplicate_spans(ds, k=8)).take_all()}
    assert out[1] == "alpha beta gamma delta epsilon"
    assert out[2] == "zeta eta theta iota kappa other words"
    assert 3 not in out  # every position covered -> dropped entirely
    # span-free docs pass through as their normalized token sequence
    assert out[4] == "untouched document with its own distinct vocabulary kept"

    # empty span set: all docs pass through normalized
    empty_spans = duplicate_spans(
        rd.from_arrow(pa.table({"doc_id": [9], "text": ["lone words"]})), k=8
    )
    thru = {r["doc_id"]: r["clean_text"]
            for r in cut_spans(ds, empty_spans).take_all()}
    assert len(thru) == 4 and thru[3] == " ".join(["spam"] * 10)


def test_cut_spans_null_text_doc():
    from saber_ray.stages.dedup import cut_spans, duplicate_spans

    docs = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["the same eight token window here appears twice " * 2,
                 None, "unrelated distinct words entirely"],
    })
    ds = rd.from_arrow(docs)
    out = cut_spans(ds, duplicate_spans(ds, k=8))
    got = {r["doc_id"] for r in out.take_all()}
    assert 2 not in got  # null text -> no tokens -> dropped, no crash
    assert 3 in got


def test_duplicate_spans_overlapping_islands_cut_exactly():
    # dup windows at positions 0-4 and 10 of a 20-token doc produce
    # islands [0,12) and [10,18) whose SPANS overlap; the cut must be
    # the union (2 survivors), not width-sum arithmetic
    from saber_ray.stages.dedup import cut_spans, duplicate_spans

    toks = [f"w{i}" for i in range(20)]
    doc_a = " ".join(toks)
    # duplicate windows 0..4 (tokens 0..11) and window 10 (tokens 10..17)
    other_a = " ".join(toks[0:12]) + " zzz yyy xxx"
    other_b = "qqq rrr sss " + " ".join(toks[10:18])
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": [doc_a, other_a, other_b],
    }))
    spans = duplicate_spans(ds, k=8)
    got = sorted((r["doc_id"], r["span_start"], r["span_end"])
                 for r in spans.take_all() if r["doc_id"] == 1)
    assert got == [(1, 0, 12), (1, 10, 18)]  # overlapping spans
    out = {r["doc_id"]: r["clean_text"]
           for r in cut_spans(ds, spans).take_all()}
    assert out[1] == "w18 w19"  # union coverage, not width sum


def test_duplicate_spans_matches_bruteforce_reference():
    # seeded random corpora with planted repetitions; the distributed
    # operator must equal a pure-Python reference on every one
    import re

    from saber_ray.stages.dedup import duplicate_spans

    tok_re = re.compile(r"[0-9a-z]+")
    k = 8

    def reference(texts: dict) -> set:
        grams: dict = {}
        per_doc: dict = {}
        for did, text in texts.items():
            toks = tok_re.findall(text.lower()) if text else []
            ws = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
            per_doc[did] = ws
            for w in ws:
                grams[w] = grams.get(w, 0) + 1
        out = set()
        for did, ws in per_doc.items():
            dup = [i for i, w in enumerate(ws) if grams[w] >= 2]
            start = None
            prev = None
            for i in dup + [None]:
                if i is not None and prev is not None and i == prev + 1:
                    prev = i
                    continue
                if prev is not None:
                    out.add((did, start, prev + k))
                start = prev = i
        return out

    for seed in (0, 1, 2):
        rng = np.random.RandomState(seed)
        vocab = [f"v{i}" for i in range(30)]  # tiny vocab -> collisions
        texts = {}
        for d in range(40):
            n = rng.randint(0, 40)
            words = rng.choice(vocab, size=n).tolist()
            texts[d] = " ".join(words)
        # plant a shared block across two random docs
        block = " ".join(rng.choice(vocab, size=12).tolist())
        texts[100] = f"{texts[0]} {block}"
        texts[101] = f"{block} {texts[1]}"

        ds = rd.from_arrow(pa.table({
            "doc_id": list(texts), "text": list(texts.values()),
        })).repartition(5)
        got = {(r["doc_id"], r["span_start"], r["span_end"])
               for r in duplicate_spans(ds, k=k).take_all()}
        assert got == reference(texts), f"seed {seed} diverged"


def test_select_survivors_quality_argmax():
    """Per component: highest-token-count doc wins, ties break to the
    lowest id; n_docs = component size; singleton components kept."""
    from saber_ray.stages.dedup import select_survivors

    labels = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 7, 8, 9], type=pa.int64()),
        "component": pa.array([1, 1, 1, 7, 7, 9], type=pa.int64()),
    }))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 7, 8, 9], type=pa.int64()),
        "text": [
            "one two three",          # comp 1: 3 tokens
            "one two three four five",  # comp 1: 5 tokens -> survivor 2
            "one two",                # comp 1: 2 tokens
            "not in any component so never scored or returned",
            "a b c d",                # comp 7: 4 tokens, tie with 8
            "w x y z",                # comp 7: 4 tokens -> survivor 7 (min id)
            "solo doc",               # comp 9: singleton
        ],
    }))
    got = sorted(
        (r["component"], r["doc_id"], r["n_tokens"], r["n_docs"])
        for r in select_survivors(labels, docs).take_all()
    )
    assert got == [(1, 2, 5, 3), (7, 7, 4, 2), (9, 9, 2, 1)]


def test_exact_drop_stats_per_source_rates():
    """Per source: total docs, docs an exact dedup drops (non-min-id
    copies of a fingerprint), and the drop fraction. Duplicate groups
    that span sources charge the drop to the copy's OWN source."""
    from saber_ray.stages.dedup import exact_drop_stats

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
        "source": ["web", "web", "web", "books", "books", "web"],
        "text": [
            "alpha beta gamma",   # survivor (min id of the dup group)
            "alpha beta gamma",   # dup -> dropped, charged to web
            "unique one",
            "alpha beta gamma",   # dup -> dropped, charged to books
            "unique two",
            "Alpha  BETA gamma",  # same token sequence -> dup, web
        ],
    }))
    got = sorted(
        (r["source"], r["n_docs"], r["n_dropped"], round(r["drop_rate"], 6))
        for r in exact_drop_stats(docs).take_all()
    )
    assert got == [("books", 2, 1, 0.5), ("web", 4, 2, 0.5)]


def test_exact_drop_stats_null_group_kept():
    """A null group value is a real group (SQL GROUP BY keeps it) —
    pandas' default dropna=True must not silently lose those docs."""
    from saber_ray.stages.dedup import exact_drop_stats

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "source": pa.array(["web", None, None], type=pa.string()),
        "text": ["same text here", "same text here", "other words"],
    }))
    got = sorted(
        ((r["source"] or ""), r["n_docs"], r["n_dropped"])
        for r in exact_drop_stats(docs).take_all()
    )
    assert got == [("", 2, 1), ("web", 1, 0)]


def test_embedding_group_stats():
    """inertia = mean squared distance to the group's own centroid:
    a two-point group at distance 2 has centroid midway → inertia 1;
    a singleton group has inertia 0; groups don't leak into each other."""
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.similarity import embedding_group_stats

    emb = rd.from_arrow(pa.table({
        "label": pa.array([0, 0, 1], type=pa.int32()),
        "embedding": pa.array(
            [[1.0, 0.0], [-1.0, 0.0], [5.0, 5.0]],
            type=pa.list_(pa.float32())),
    }))
    got = {r["label"]: (r["n"], r["inertia"])
           for r in embedding_group_stats(emb).take_all()}
    assert got == {0: (2, 1.0), 1: (1, 0.0)}


def test_hard_negatives_masks_own_label():
    """Neighbors never share the query's label, ranking follows cosine
    (hardest = most similar cross-label vector), self is irrelevant
    because it shares the label; k caps the output."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.similarity import hard_negatives

    vecs = {
        0: [1.0, 0.0], 1: [0.9, 0.1],          # label A
        2: [0.8, 0.2], 3: [0.0, 1.0],          # label B
        4: [-1.0, 0.0],                        # label B
    }
    labels = {0: "A", 1: "A", 2: "B", 3: "B", 4: "B"}
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(list(vecs), type=pa.int64()),
        "embedding": pa.array([vecs[i] for i in vecs],
                              type=pa.list_(pa.float32())),
        "label": pa.array([labels[i] for i in vecs], type=pa.string()),
    }))
    out = hard_negatives(
        ds, np.array([vecs[0]]), [0], ["A"], k=2).take_all()
    assert [(r["neighbor_id"], r["rank"]) for r in out] == [(2, 1), (3, 2)]


def test_brute_force_topk_tie_safe_and_masked_schema():
    """The local cut keeps EVERY row tied at the k-th score (so the
    global merge can apply the oracle's neighbor_id tie-break), and a
    non-empty but fully label-masked block returns the TYPED empty
    schema, not null-typed columns."""
    import numpy as np
    import pyarrow as pa

    from saber_ray.stages.similarity import BruteForceTopK

    batch = pa.table({
        "vec_id": pa.array([10, 3, 7], type=pa.int64()),
        "embedding": pa.array([[1.0, 0.0]] * 3, type=pa.list_(pa.float32())),
        "label": pa.array(["A", "A", "A"], type=pa.string()),
    })
    fn = BruteForceTopK(np.array([[1.0, 0.0]]), [0], k=1)
    out = fn(batch)
    # all three candidates tie at cosine 1.0 → all three survive the cut
    assert sorted(out["neighbor_id"].to_pylist()) == [3, 7, 10]

    masked = BruteForceTopK(np.array([[1.0, 0.0]]), [0], k=2,
                            query_labels=["A"])(batch)
    assert masked.num_rows == 0
    assert masked.schema.field("query_id").type == pa.int64()
    assert masked.schema.field("neighbor_id").type == pa.int64()


def test_hard_negatives_null_labels_sql_semantics():
    """NULL <> x is never true in SQL: a null-labeled candidate is never
    a hard negative, and a null-labeled query gets no negatives."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.similarity import hard_negatives

    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([0, 1, 2], type=pa.int64()),
        "embedding": pa.array([[1.0, 0.0]] * 3, type=pa.list_(pa.float32())),
        "label": pa.array(["A", None, "B"], type=pa.string()),
    }))
    out = hard_negatives(ds, np.array([[1.0, 0.0]]), [9], ["A"], k=3).take_all()
    assert [r["neighbor_id"] for r in out] == [2]   # null candidate dropped
    none_q = hard_negatives(ds, np.array([[1.0, 0.0]]), [9], [None], k=3).take_all()
    assert none_q == []                              # null query: nothing


def test_embedding_quantize_codes():
    """Known vectors: scale = max|x|/127, codes = trunc(x*127/max|x|);
    the max-abs element quantizes to ±127, a zero vector to all zeros."""
    from saber_ray.stages.similarity import embedding_quantize

    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([1, 2, 3], type=pa.int64()),
        "embedding": pa.array(
            [[2.0, -1.0, 0.5], [0.0, 0.0, 0.0], [-4.0, 2.0, 1.0]],
            type=pa.list_(pa.float32())),
    }))
    got = {r["vec_id"]: r for r in embedding_quantize(ds).take_all()}
    # vec 1: codes trunc([127, -63.5, 31.75]) = [127, -63, 31]
    assert got[1]["scale"] == 2.0 / 127.0
    assert (got[1]["qsum"], got[1]["qmin"], got[1]["qmax"]) == (95, -63, 127)
    # zero vector: scale 0, all-zero codes
    assert (got[2]["scale"], got[2]["qsum"], got[2]["qmin"], got[2]["qmax"]) \
        == (0.0, 0, 0, 0)
    # vec 3: max-abs element is negative → qmin = -127
    assert (got[3]["qmin"], got[3]["qmax"]) == (-127, 63)


# ------------------------------------------------ content-defined chunks


def test_cdc_chunks_match_local_golden():
    import hashlib

    from saber_ray.stages.dedup import content_defined_chunks
    from saber_ray.stages.textstats import _TOKEN_RE

    texts = ["Scan the column then ORDER the window",
             "group query join merge value line key part agg " * 5, "", None]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })).repartition(2)
    got = sorted(
        (r["doc_id"], r["chunk_idx"], r["n_tokens"], r["chunk_hash"])
        for r in content_defined_chunks(ds).take_all()
    )
    exp = []
    for did, text in zip([1, 2, 3, 4], texts):
        toks = _TOKEN_RE.findall(text.lower()) if text else []
        ci, start = 0, 0
        for i, t in enumerate(toks):
            if int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 64 == 0:
                chunk = " ".join(toks[start:i + 1])
                exp.append((did, ci, i + 1 - start,
                            hashlib.md5(chunk.encode()).hexdigest()))
                ci, start = ci + 1, i + 1
        if start < len(toks):
            chunk = " ".join(toks[start:])
            exp.append((did, ci, len(toks) - start,
                        hashlib.md5(chunk.encode()).hexdigest()))
    assert got == sorted(exp)


def test_cdc_chunks_edit_robust_vs_fixed_windows():
    """The CDC property: prepending tokens changes only the FIRST
    chunk's hashes — every boundary after the first post-edit cut point
    realigns, so later chunk hashes are shared with the original. Fixed
    windows lose alignment everywhere after an unaligned insertion."""
    from saber_ray.stages.dedup import content_defined_chunks

    # non-periodic deterministic text (periodic text would collapse to
    # one distinct chunk hash and prove nothing)
    base = " ".join(f"w{i * 2654435761 % 9973}" for i in range(1200))
    edited = "inserted tokens here " + base
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array([base, edited], type=pa.string()),
    }))
    rows = content_defined_chunks(ds).take_all()
    h1 = {r["chunk_hash"] for r in rows if r["doc_id"] == 1}
    h2 = {r["chunk_hash"] for r in rows if r["doc_id"] == 2}
    assert len(h1) > 2
    # all but the edited head chunk must realign
    assert len(h1 & h2) >= len(h1) - 1


# ---------------------------------------------------- embedding outliers


def test_embedding_outliers_flags_planted_degenerate():
    # one planted degenerate (a zeroed embedding) in a tight cluster.
    # NOTE: z-scores exhibit MASKING — a second, far more extreme
    # outlier inflates sd enough to hide moderate ones; that is inherent
    # to the z-score rule (documented operator semantics), so the test
    # plants exactly one.
    from saber_ray.stages.similarity import embedding_outliers

    rng = np.random.RandomState(5)
    good = rng.normal(0, 0.05, size=(200, 8)) + 1.0  # tight cluster at ~(1,..)
    mat = np.vstack([good, np.zeros(8)]).astype(np.float32)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(mat)), type=pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              type=pa.list_(pa.float32())),
    })).repartition(3)
    out = embedding_outliers(ds, z=3.0).take_all()
    flagged = {r["vec_id"] for r in out}
    assert 200 in flagged                 # the degenerate is caught
    assert len(flagged) <= 3              # and nearly nothing else
    zs = {r["vec_id"]: r["z"] for r in out}
    assert zs[200] > 3.0


def test_embedding_outliers_empty_and_uniform():
    from saber_ray.stages.similarity import embedding_outliers

    empty = rd.from_arrow(pa.table({
        "vec_id": pa.array([], type=pa.int64()),
        "embedding": pa.array([], type=pa.list_(pa.float32())),
    }))
    assert embedding_outliers(empty).take_all() == []
    # identical vectors: sd == 0, nothing can exceed the threshold
    uniform = rd.from_arrow(pa.table({
        "vec_id": pa.array([1, 2, 3], type=pa.int64()),
        "embedding": pa.array([[1.0, 2.0]] * 3, type=pa.list_(pa.float32())),
    }))
    assert embedding_outliers(uniform).take_all() == []
    # a filter that empties SOME blocks must not crash the partials
    mixed = rd.from_arrow(pa.table({
        "vec_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "embedding": pa.array([[1.0, 2.0], [9.0, 9.0], [1.1, 2.1], [1.0, 2.2]],
                              type=pa.list_(pa.float32())),
    })).repartition(4).filter(lambda r: r["vec_id"] != 2)
    out = embedding_outliers(mixed, z=0.5).take_all()
    assert all(r["vec_id"] != 2 for r in out)
