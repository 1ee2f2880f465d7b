"""Dedup stage inside ``run_kg_job``: drop-list correctness, graph
filtering, and checkpoint/resume semantics (VERDICT round-1 item 9)."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from saber_ray.pipelines.kg import KGConfig
from saber_ray.pipelines.run import run_kg_job
from saber_ray.sources.synthetic import generate_documents

N_DOCS = 96
N_FRAGS = 4
DUP_OF = [25, 37, 83]


def _write_frags(table: pa.Table, d) -> str:
    rows = table.num_rows
    per = (rows + N_FRAGS - 1) // N_FRAGS
    for i in range(N_FRAGS):
        pq.write_table(
            table.slice(i * per, per), str(d / f"frag-{i:02d}.parquet")
        )
    return str(d)


@pytest.fixture(scope="module")
def base_corpus(tmp_path_factory):
    table, _, _ = generate_documents(N_DOCS, seed=17)
    return _write_frags(table, tmp_path_factory.mktemp("base"))


def _with_dups(table: pa.Table, tweak: bool) -> pa.Table:
    """Append copies of DUP_OF docs under ids that sort AFTER every
    original (so min-id survivor == the original). ``tweak`` appends a
    surface-free token to one text span — a near-dup, not an exact dup."""
    spans_list = table["spans"].to_pylist()
    dup_ids, dup_spans = [], []
    for i in DUP_OF:
        spans = [dict(s) for s in spans_list[i]]
        if tweak:
            # append to the LAST text span: adds ~2 shingles, removes
            # none — keeps Jaccard ~0.97 on the chosen (long) docs
            for s in reversed(spans):
                if s["kind"] == "text" and s["text"]:
                    s["text"] = s["text"] + " xyzzyfiller"
                    break
        dup_ids.append(f"zz-dup-{i:04d}")
        dup_spans.append(spans)
    dup_tbl = pa.Table.from_pydict(
        {"doc_id": dup_ids, "spans": dup_spans}, schema=table.schema
    )
    return pa.concat_tables([table, dup_tbl])


@pytest.fixture(scope="module")
def exact_dup_corpus(tmp_path_factory):
    table, _, _ = generate_documents(N_DOCS, seed=17)
    return _write_frags(_with_dups(table, tweak=False),
                        tmp_path_factory.mktemp("dup_exact"))


@pytest.fixture(scope="module")
def near_dup_corpus(tmp_path_factory):
    table, _, _ = generate_documents(N_DOCS, seed=17)
    return _write_frags(_with_dups(table, tweak=True),
                        tmp_path_factory.mktemp("dup_near"))


def _graph_rows(out: str, table: str) -> list[tuple]:
    rows = []
    for f in glob.glob(os.path.join(out, table, "**", "*.parquet"), recursive=True):
        t = pq.read_table(f)
        # doc_ids is a SAMPLED lineage column (per-batch min/max union,
        # capped) — legitimately differs across batchings; exclude it
        cols = sorted(c for c in t.column_names if c != "doc_ids")
        rows.extend(sorted(zip(*[t[c].to_pylist() for c in cols])))
    return sorted(rows)


def _drop_ids(out: str) -> set:
    ids = set()
    for f in glob.glob(os.path.join(out, "dedup", "dropped", "*.parquet")):
        ids.update(pq.read_table(f)["doc_id"].to_pylist())
    return ids


@pytest.fixture(scope="module")
def base_graph(base_corpus, tmp_path_factory):
    """Graph of the clean corpus, no dedup — the equivalence oracle."""
    out = str(tmp_path_factory.mktemp("out_base"))
    s = run_kg_job(f"{base_corpus}/*.parquet", out,
                   KGConfig(batch_size=64, num_salts=4), partitions=2)
    assert s["complete"]
    return _graph_rows(out, "nodes"), _graph_rows(out, "edges")


def test_exact_dedup_restores_clean_graph(exact_dup_corpus, base_graph,
                                          tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out_exact"))
    cfg = KGConfig(batch_size=64, num_salts=4, dedup="exact")
    s = run_kg_job(f"{exact_dup_corpus}/*.parquet", out, cfg, partitions=2)
    assert s["complete"] and s["dedup"] == "ran" and s["graph"] == "ran"
    # exactly the appended copies are dropped (min-id originals survive)
    assert _drop_ids(out) == {f"zz-dup-{i:04d}" for i in DUP_OF}
    # dropping them makes the graph identical to the clean corpus's
    assert _graph_rows(out, "nodes") == base_graph[0]
    assert _graph_rows(out, "edges") == base_graph[1]


def _true_jaccard_drops(corpus: str, threshold: float) -> set:
    """Driver-side golden: greedy keep-min drop set from TRUE text
    Jaccard over all pairs (small corpus — O(n²) is fine in a test)."""
    from saber_ray.stages.dedup import _shingle_set

    ss = {}
    for f in sorted(glob.glob(f"{corpus}/*.parquet")):
        t = pq.read_table(f)
        for did, spans in zip(t["doc_id"].to_pylist(), t["spans"].to_pylist()):
            text = " ".join(
                s["text"] for s in spans if s["kind"] == "text" and s["text"]
            )
            ss[did] = _shingle_set(text, 3)
    ids = sorted(ss)
    drops = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ss[ids[i]], ss[ids[j]]
            denom = len(a | b)
            if denom and len(a & b) / denom >= threshold:
                drops.add(ids[j])
    return drops


def test_minhash_dedup_drops_near_dups(near_dup_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out_minhash"))
    cfg = KGConfig(batch_size=64, num_salts=4, dedup="minhash",
                   dedup_min_jaccard=0.8)
    s = run_kg_job(f"{near_dup_corpus}/*.parquet", out, cfg, partitions=2)
    assert s["complete"] and s["dedup"] == "ran"
    # the engine's drop set equals the true-Jaccard golden (the corpus
    # also contains NATURAL near-dups — identical filler docs — so the
    # planted copies are a subset, not the whole set)
    expected = _true_jaccard_drops(near_dup_corpus, 0.8)
    assert {f"zz-dup-{i:04d}" for i in DUP_OF} <= expected
    assert _drop_ids(out) == expected
    # the filtered graph equals a no-dedup run over the corpus with the
    # dropped docs physically removed
    clean = str(tmp_path_factory.mktemp("corpus_clean"))
    for k, f in enumerate(sorted(glob.glob(f"{near_dup_corpus}/*.parquet"))):
        t = pq.read_table(f)
        mask = [d not in expected for d in t["doc_id"].to_pylist()]
        pq.write_table(t.filter(pa.array(mask)), f"{clean}/frag-{k:02d}.parquet")
    out2 = str(tmp_path_factory.mktemp("out_minhash_oracle"))
    s2 = run_kg_job(f"{clean}/*.parquet", out2,
                    KGConfig(batch_size=64, num_salts=4), partitions=2)
    assert s2["complete"]
    assert _graph_rows(out, "nodes") == _graph_rows(out2, "nodes")
    assert _graph_rows(out, "edges") == _graph_rows(out2, "edges")


def test_dedup_checkpoint_skips_and_invalidates(exact_dup_corpus,
                                                tmp_path_factory):
    import shutil

    # private copy: this test mutates a fragment
    corpus = str(tmp_path_factory.mktemp("corpus_resume"))
    for f in glob.glob(f"{exact_dup_corpus}/*.parquet"):
        shutil.copy(f, corpus)
    out = str(tmp_path_factory.mktemp("out_resume"))
    cfg = KGConfig(batch_size=64, num_salts=4, dedup="exact")
    src = f"{corpus}/*.parquet"
    s1 = run_kg_job(src, out, cfg, partitions=2)
    assert s1["dedup"] == "ran" and s1["graph"] == "ran"

    # idempotent rerun: dedup + graph both resume from checkpoint
    s2 = run_kg_job(src, out, cfg, partitions=2)
    assert not s2["ran"]
    assert s2["dedup"] == "skipped" and s2["graph"] == "skipped"

    # a changed input fragment re-runs its partition AND invalidates the
    # aggregated drop-list + graph
    frag = sorted(glob.glob(src))[0]
    t = pq.read_table(frag)
    pq.write_table(t.slice(1), frag)  # drop one doc from the fragment
    s3 = run_kg_job(src, out, cfg, partitions=2)
    assert s3["ran"]
    assert s3["dedup"] == "ran" and s3["graph"] == "ran"


def test_no_dedup_runs_without_stage(base_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out_nodedup"))
    s = run_kg_job(f"{base_corpus}/*.parquet", out,
                   KGConfig(batch_size=64, num_salts=4), partitions=2)
    assert s["complete"] and "dedup" not in s
    assert not os.path.exists(os.path.join(out, "dedup"))


def _true_edit_drops(corpus: str, k: int = 2, prefix: int = 24) -> set:
    """Driver-side golden: keep-min drop set from TRUE Levenshtein over
    normalized prefix keys of every VALID doc pair (non-transitive
    id_b-of-any-pair semantics, exactly edit_dup_dropped_ids')."""
    keys = {}
    for f in sorted(glob.glob(f"{corpus}/*.parquet")):
        t = pq.read_table(f)
        for did, spans in zip(t["doc_id"].to_pylist(),
                              t["spans"].to_pylist()):
            text = " ".join(
                s["text"] for s in (spans or [])
                if s["kind"] == "text" and s["text"]
            )
            key = " ".join(text.lower().split())[:prefix]
            if key:
                keys[did] = key

    def lev(a, b):
        p = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            c = [i]
            for j, cb in enumerate(b, 1):
                c.append(min(p[j] + 1, c[-1] + 1, p[j - 1] + (ca != cb)))
            p = c
        return p[-1]

    ids = sorted(keys)
    drops = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if lev(keys[ids[i]], keys[ids[j]]) <= k:
                drops.add(ids[j])
    return drops


def test_edit_dedup_drops_prefix_dups(near_dup_corpus, tmp_path_factory):
    # the near-dup copies only differ in a SUFFIX token, so their
    # normalized 24-char prefixes are identical to the originals'
    # (edit distance 0) — the edit flavor must drop them, plus any
    # base docs whose prefixes are genuinely within distance 2
    out = str(tmp_path_factory.mktemp("out_edit"))
    cfg = KGConfig(batch_size=64, num_salts=4, dedup="edit")
    s = run_kg_job(f"{near_dup_corpus}/*.parquet", out, cfg, partitions=2)
    assert s["complete"] and s["dedup"] == "ran"
    golden = _true_edit_drops(near_dup_corpus)
    assert {f"zz-dup-{i:04d}" for i in DUP_OF} <= golden
    assert _drop_ids(out) == golden
