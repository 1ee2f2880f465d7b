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
