"""Skew stress: the salted canonicalization must stay correct and
bounded when one entity dominates the corpus (the "p53 problem" the
north rule names explicitly)."""

import pyarrow as pa
import pytest
import ray.data as rd

from saber_ray.pipelines.kg import KGConfig, build_graph
from saber_ray.sources.synthetic import generate_documents
from saber_ray.stages.canonicalize import partial_edges, partial_nodes


@pytest.fixture(scope="module")
def skewed():
    # hot_multiplier=60 → "p53" is drawn ~60/72 of the time: a single
    # canonical key receives the large majority of all mentions
    return generate_documents(400, seed=17, hot_surface="p53", hot_multiplier=60)


def test_canonicalization_correct_under_skew(skewed):
    table, gold_mentions, _ = skewed
    out = build_graph(rd.from_arrow(table), KGConfig(batch_size=32, num_salts=8),
                      materialize_annotated=True)
    mentions = out["mentions"].materialize()
    nodes = {n["node_id"]: n for n in out["nodes"].take_all()}
    # nothing lost in the salted two-level merge
    assert sum(n["support"] for n in nodes.values()) == mentions.count()
    hot = nodes["PRGE:STRING:ENSP00000269305"]
    assert hot["canonical_name"] == "p53"
    # the hot node dominates, as constructed
    assert hot["support"] > 0.5 * mentions.count()
    # edges conserve triple scores
    edges = out["edges"].take_all()
    triples = out["triples"].take_all()
    assert sum(e["support"] for e in edges) == int(sum(t["score"] for t in triples))


def test_partials_bound_hot_key_rows(skewed):
    """Per-batch partial aggregation: a hot key contributes ONE partial
    row per batch — the shuffle never sees per-mention rows."""
    table, _, _ = skewed
    out = build_graph(rd.from_arrow(table), KGConfig(batch_size=32),
                      materialize_annotated=True)
    batch = out["mentions"].take_batch(2000, batch_format="pyarrow")
    p = partial_nodes(batch, num_salts=8)
    eids = p["entity_id"].to_pylist()
    assert len(eids) == len(set(eids))  # one row per key per batch

    tbatch = out["triples"].take_batch(2000, batch_format="pyarrow")
    pe = partial_edges(tbatch, num_salts=8)
    keys = list(zip(pe["src"].to_pylist(), pe["pred"].to_pylist(), pe["dst"].to_pylist()))
    assert len(keys) == len(set(keys))


def test_salts_spread_hot_key(skewed):
    """The deterministic salt spreads a hot key's partials over multiple
    reducers (bounding any single merge group)."""
    table, _, _ = skewed
    out = build_graph(rd.from_arrow(table), KGConfig(batch_size=16),
                      materialize_annotated=True)
    partials = out["mentions"].map_batches(
        lambda b: partial_nodes(b, num_salts=8), batch_format="pyarrow",
        batch_size=64,  # many batches → many (key, first_doc) salt draws
    ).take_all()
    hot_salts = {p["salt"] for p in partials
                 if p["entity_id"] == "PRGE:STRING:ENSP00000269305"}
    assert len(hot_salts) > 1, "hot key partials all landed on one salt"


def test_emit_triples_bounded_on_pathological_doc():
    """A 10^4-mention single-sentence document must complete in bounded
    time: pairing is capped at MAX_PAIR_MENTIONS per (span, sentence)
    scope with a logged (never silent) drop."""
    import time

    from saber_ray.stages.linker import GROUNDED_ENT_TYPE
    from saber_ray.stages.triples import emit_triples

    n = 10_000
    ents = [
        {"start": i * 5, "end": i * 5 + 3, "text": f"e{i % 7}", "label": "PRGE",
         "span_idx": 0, "sent_idx": 0, "xrefs": [],
         "entity_id": f"PRGE:surface:e{i % 7}"}
        for i in range(n)
    ]
    batch = pa.table({
        "doc_id": pa.array(["big"]),
        "ents": pa.array([ents], type=pa.list_(GROUNDED_ENT_TYPE)),
    })
    t0 = time.time()
    out = emit_triples(batch)
    elapsed = time.time() - t0
    assert elapsed < 10.0, f"pathological doc took {elapsed:.1f}s — cap not applied"
    # all 7x6 ordered entity pairs still appear (the cap keeps the head)
    assert out.num_rows == 42
    # scores reflect only capped pairs, far below the uncapped ~5e7 scale
    assert sum(out["score"].to_pylist()) <= 1000 * 999 / 2


def test_emit_triples_cap_preserves_small_docs():
    """Docs under the cap are byte-identical to the uncapped behavior."""
    from saber_ray.stages.linker import GROUNDED_ENT_TYPE
    from saber_ray.stages.triples import emit_triples

    ents = [
        {"start": s, "end": s + 3, "text": t, "label": lab,
         "span_idx": sp, "sent_idx": se, "xrefs": [],
         "entity_id": f"{lab}:surface:{t}"}
        for s, t, lab, sp, se in [
            (0, "p53", "PRGE", 0, 0), (10, "mdm2", "PRGE", 0, 0),
            (20, "glucose", "CHED", 0, 1), (30, "p53", "PRGE", 0, 1),
            (0, "cancer", "DISO", 1, 0),
        ]
    ]
    batch = pa.table({
        "doc_id": pa.array(["d"]),
        "ents": pa.array([ents], type=pa.list_(GROUNDED_ENT_TYPE)),
    })
    capped = emit_triples(batch, max_pair_mentions=1000).to_pydict()
    huge_cap = emit_triples(batch, max_pair_mentions=10**9).to_pydict()
    assert capped == huge_cap
    # only same-(span, sentence) pairs: (p53, mdm2) and (glucose, p53)
    assert sorted(zip(capped["subj"], capped["obj"])) == sorted([
        ("PRGE:surface:p53", "PRGE:surface:mdm2"),
        ("CHED:surface:glucose", "PRGE:surface:p53"),
    ])


def test_salted_join_matches_plain_join_under_skew():
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.relational import salted_join

    # 90% of left rows share one hot key
    n = 2000
    keys = [7 if i % 10 else i for i in range(n)]          # i%10==0 -> cold key i
    left = rd.from_arrow(pa.table({
        "k": pa.array(keys, type=pa.int64()),
        "lval": pa.array(range(n), type=pa.int64()),
    })).repartition(4).materialize()
    right = rd.from_arrow(pa.table({
        "k": pa.array([7, 7, 10, 20, 9999], type=pa.int64()),
        "rval": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
    })).materialize()

    got = sorted(
        (r["k"], r["lval"], r["rval"])
        for r in salted_join(left, right, "k", num_salts=4,
                             hot_threshold=100, num_partitions=4).take_all()
    )
    want = sorted(
        (r["k"], r["lval"], r["rval"])
        for r in left.join(right, join_type="inner", num_partitions=4,
                           on=("k",)).take_all()
    )
    assert got == want
    # hot key multiplies: 1800 hot-left rows x 2 right rows + 2 cold hits
    assert len(got) == 1800 * 2 + 2


def test_salted_join_auto_hot_detection():
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.relational import salted_join

    keys = [1] * 900 + list(range(10, 110))
    left = rd.from_arrow(pa.table({
        "k": pa.array(keys, type=pa.int64()),
        "lval": pa.array(range(len(keys)), type=pa.int64()),
    })).repartition(3).materialize()
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 10, 50], type=pa.int64()),
        "rval": pa.array([100, 200, 300], type=pa.int64()),
    })).materialize()
    got = salted_join(left, right, "k", num_salts=4).take_all()
    assert len(got) == 900 + 2
