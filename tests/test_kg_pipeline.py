"""Stage-level and end-to-end tests of the KG pipeline: tagger goldens,
linker grounding goldens (saber/tests/test_grounding_utils.py:20-152),
the per-row span-sequence invariant, and the triple P/R >= 0.95 gate on
the synthetic gold-by-construction corpus (FIXTURES.md F1/F8)."""

import pyarrow as pa
import pytest
import ray.data as rd

from saber_ray.constants import NAMESPACES
from saber_ray.functions.hashing import span_sequence_hash
from saber_ray.functions.metrics import evaluate_chunks
from saber_ray.gazetteer import SABER_GROUNDING, build_linker_dict
from saber_ray.pipelines.kg import KGConfig, annotate, build_graph
from saber_ray.schemas import DOCUMENTS
from saber_ray.sources.synthetic import generate_documents
from saber_ray.stages.linker import EntityLinker, normalize_surface
from saber_ray.stages.tagger import DictionaryTagger
from saber_ray.stages.triples import emit_triples, explode_mentions


def _doc(doc_id, texts, media=()):
    spans, offset = [], 0
    for i, t in enumerate(texts):
        if i in media:
            spans.append({"kind": "image", "text": "", "media_ref": f"media://{doc_id}/{i}",
                          "offset": offset})
        spans.append({"kind": "text", "text": t, "media_ref": "", "offset": offset})
        offset += len(t) + 1
    return {"doc_id": doc_id, "spans": spans}


def _table(docs):
    return pa.Table.from_pylist(docs, schema=DOCUMENTS)


def test_tagger_finds_gazetteer_mentions():
    tagger = DictionaryTagger()
    batch = _table([_doc("d1", ["Glucose and fructose with p53.", "No entities here."])])
    out = tagger(batch)
    ents = out["ents"].to_pylist()[0]
    got = [(e["text"], e["label"], e["start"], e["end"]) for e in ents]
    assert got == [("Glucose", "CHED", 0, 7), ("fructose", "CHED", 12, 20),
                   ("p53", "PRGE", 26, 29)]


def test_tagger_multiword_longest_match():
    tagger = DictionaryTagger()
    batch = _table([_doc("d1", ["cystic fibrosis and cancer in human subjects."])])
    ents = tagger(batch)["ents"].to_pylist()[0]
    got = [(e["text"], e["label"]) for e in ents]
    assert got == [("cystic fibrosis", "DISO"), ("cancer", "DISO"), ("human", "LIVB")]


def test_tagger_token_boundaries():
    # "humanoid" must not match "human"; "p53" inside "p533" must not match
    tagger = DictionaryTagger()
    batch = _table([_doc("d1", ["humanoid p533 glucoses"])])
    assert tagger(batch)["ents"].to_pylist()[0] == []


def test_tagger_sent_idx_and_media_passthrough():
    tagger = DictionaryTagger()
    batch = _table([_doc("d1", ["p53 binds MK2. Cancer follows."], media=(0,))])
    out = tagger(batch)
    ents = out["ents"].to_pylist()[0]
    # media span at idx 0 → text span is idx 1
    assert all(e["span_idx"] == 1 for e in ents)
    assert [e["sent_idx"] for e in ents] == [0, 0, 1]
    # spans column byte-identical
    assert out["spans"].to_pylist() == batch["spans"].to_pylist()


def test_span_invariant_hash_stable():
    doc = _doc("d1", ["p53 and cancer."], media=(0,))
    kinds = [s["kind"] for s in doc["spans"]]
    texts = [s["text"] for s in doc["spans"]]
    refs = [s["media_ref"] for s in doc["spans"]]
    h1 = span_sequence_hash(kinds, texts, refs)
    h2 = span_sequence_hash(list(kinds), list(texts), list(refs))
    assert h1 == h2
    # order matters
    assert span_sequence_hash(kinds[::-1], texts[::-1], refs[::-1]) != h1


def test_linker_grounding_goldens():
    """Exact xref parity with saber/tests/test_grounding_utils.py."""
    tagger = DictionaryTagger()
    linker = EntityLinker(build_linker_dict(SABER_GROUNDING))
    batch = _table([
        _doc("ched", ["glucose and fructose"]),
        _doc("diso", ["cancer and cystic fibrosis"]),
        _doc("livb", ["mouse and human"]),
        _doc("prge", ["p53 and MK2"]),
    ])
    out = linker(tagger(batch))
    by_doc = {d: e for d, e in zip(out["doc_id"].to_pylist(), out["ents"].to_pylist())}

    def xrefs(doc, i):
        return [(x["namespace"], x["id"], x["organism_id"]) for x in by_doc[doc][i]["xrefs"]]

    assert xrefs("ched", 0) == [(NAMESPACES["CHED"], "CIDs00005793", ""),
                                (NAMESPACES["CHED"], "CIDs10954115", ""),
                                (NAMESPACES["CHED"], "CIDs53782692", "")]
    assert xrefs("ched", 1) == [(NAMESPACES["CHED"], "CIDs00439709", "")]
    assert xrefs("diso", 0) == [(NAMESPACES["DISO"], "DOID:162", "")]
    assert xrefs("diso", 1) == [(NAMESPACES["DISO"], "DOID:1485", "")]
    assert xrefs("livb", 0) == [(NAMESPACES["LIVB"], "10090", ""),
                                (NAMESPACES["LIVB"], "10088", "")]
    assert xrefs("livb", 1) == [(NAMESPACES["LIVB"], "9606", "")]
    assert xrefs("prge", 0) == [(NAMESPACES["PRGE"], "ENSP00000269305", "9606")]
    assert xrefs("prge", 1) == [(NAMESPACES["PRGE"], "ENSP00000356070", "9606"),
                                (NAMESPACES["PRGE"], "ENSP00000433109", "9606")]


def test_linker_left_outer():
    # ungrounded surfaces keep xrefs=[] (saber/utils/grounding_utils.py:63-66)
    tagger = DictionaryTagger()
    linker = EntityLinker(build_linker_dict(SABER_GROUNDING))
    out = linker(tagger(_table([_doc("d", ["Rats develop erosive cystitis."])])))
    ents = out["ents"].to_pylist()[0]
    assert [e["text"] for e in ents] == ["Rats", "erosive cystitis"]
    assert all(e["xrefs"] == [] for e in ents)
    assert ents[0]["entity_id"] == "LIVB:surface:rats"


def test_emit_triples_same_sentence():
    tagger = DictionaryTagger()
    linker = EntityLinker(build_linker_dict(SABER_GROUNDING))
    annotated = linker(tagger(_table([
        _doc("d1", ["p53 causes cancer. Glucose is sweet."]),
    ])))
    triples = emit_triples(annotated).to_pylist()
    assert len(triples) == 1
    t = triples[0]
    assert (t["subj_label"], t["pred"], t["obj_label"]) == ("PRGE", "associated_with", "DISO")
    assert t["subj"].startswith("PRGE:STRING:")
    assert t["obj"] == "DISO:Disease Ontology:DOID:162"
    # cross-sentence pairing when same_sentence=False
    assert len(emit_triples(annotated, same_sentence=False).to_pylist()) == 3


def test_explode_mentions_schema():
    tagger = DictionaryTagger()
    linker = EntityLinker(build_linker_dict(SABER_GROUNDING))
    out = explode_mentions(linker(tagger(_table([_doc("d1", ["p53 and MK2"])]))))
    assert out.num_rows == 2
    assert out["entity_id"].to_pylist() == [
        "PRGE:STRING:ENSP00000269305", "PRGE:STRING:ENSP00000356070"]


@pytest.fixture(scope="module")
def synthetic():
    return generate_documents(200, seed=42)


def test_e2e_mention_recall_and_invariant(synthetic):
    table, gold_mentions, gold_pairs = synthetic
    ds = rd.from_arrow(table)
    out = build_graph(ds, KGConfig(batch_size=64))

    annotated = out["annotated"].take_all()
    # per-row span-sequence invariant vs the generator's input
    orig = {r["doc_id"]: r["spans"] for r in table.to_pylist()}
    for row in annotated:
        spans = row["spans"]
        assert [
            (s["kind"], s["text"], s["media_ref"]) for s in spans
        ] == [(s["kind"], s["text"], s["media_ref"]) for s in orig[row["doc_id"]]]

    # mention-level P/R vs gold-by-construction (chunk := (label|doc|span, start, end))
    mentions = out["mentions"].take_all()
    pred = [(f"{m['label']}|{m['doc_id']}|{m['span_idx']}", m["start"], m["end"])
            for m in mentions]
    gold = [(f"{m['label']}|{m['doc_id']}|{m['span_idx']}", m["start"], m["end"])
            for m in gold_mentions]
    scores = evaluate_chunks(gold, pred, criteria="exact")
    _, recall, _, _ = scores["MICRO_AVG"]
    precision = scores["MICRO_AVG"][0]
    assert recall >= 0.95
    assert precision >= 0.95


def test_e2e_triple_pr_gate(synthetic):
    """Triple-level P/R >= 0.95 vs reference-derived gold pairs."""
    table, _, gold_pairs = synthetic
    from saber_ray.gazetteer import SABER_GROUNDING, SABER_SURFACES
    from saber_ray.stages.linker import entity_id_for
    from saber_ray.stages.triples import predicate_for
    from saber_ray.constants import NAMESPACES as NS

    def eid(surface, label):
        refs = SABER_GROUNDING.get((surface, label), [])
        xrefs = [{"namespace": NS[label], "id": r[0], "organism_id": r[1]} for r in refs]
        return entity_id_for(label, surface, xrefs)

    gold = set()
    for doc_id, s_surf, s_lab, o_surf, o_lab, _ in gold_pairs:
        subj, obj = eid(s_surf, s_lab), eid(o_surf, o_lab)
        if subj == obj:
            continue
        gold.add((doc_id, subj, predicate_for(s_lab, o_lab), obj))

    out = build_graph(rd.from_arrow(table), KGConfig(batch_size=64))
    pred = {(t["doc_id"], t["subj"], t["pred"], t["obj"])
            for t in out["triples"].take_all()}

    tp = len(gold & pred)
    precision = tp / len(pred) if pred else 0.0
    recall = tp / len(gold) if gold else 0.0
    assert precision >= 0.95, f"triple precision {precision:.3f}"
    assert recall >= 0.95, f"triple recall {recall:.3f}"


def test_e2e_nodes_edges(synthetic):
    table, gold_mentions, _ = synthetic
    out = build_graph(rd.from_arrow(table), KGConfig(batch_size=64, num_salts=4))
    nodes = {n["node_id"]: n for n in out["nodes"].take_all()}
    # support totals must equal total mention count (canonicalization loses nothing)
    assert sum(n["support"] for n in nodes.values()) == out["mentions"].count()
    # hot key p53 canonicalizes to a single grounded node
    p53 = nodes["PRGE:STRING:ENSP00000269305"]
    assert p53["canonical_name"] == "p53"
    assert p53["xref_id"] == "ENSP00000269305"
    assert "p53" in p53["surface_forms"]
    # edges aggregate triples with support
    edges = out["edges"].take_all()
    assert sum(e["support"] for e in edges) == int(
        sum(t["score"] for t in out["triples"].take_all()))
    assert all(len(e["doc_ids"]) <= 10 for e in edges)


def test_node_degrees_and_top_edges(synthetic):
    from saber_ray.stages.graph import node_degrees, top_edges

    table, _, _ = synthetic
    out = build_graph(rd.from_arrow(table), KGConfig(batch_size=64),
                      materialize_annotated=True)
    edges = out["edges"].materialize()
    degrees = {r["node_id"]: r for r in node_degrees(edges).take_all()}
    edge_rows = edges.take_all()
    # out/in degree must equal the edge-list counts
    import collections

    out_c = collections.Counter(e["src"] for e in edge_rows)
    in_c = collections.Counter(e["dst"] for e in edge_rows)
    for node, rec in degrees.items():
        assert rec["out_degree"] == out_c.get(node, 0)
        assert rec["in_degree"] == in_c.get(node, 0)
        assert rec["degree"] == rec["out_degree"] + rec["in_degree"]

    top = top_edges(edges, k=5).take_all()
    supports = [t["support"] for t in top]
    assert supports == sorted(supports, reverse=True)
    assert len(top) == 5


def test_k_hop_pairs():
    from saber_ray.stages.graph import k_hop_pairs, two_hop_pairs

    edges = rd.from_arrow(pa.table({
        "src": ["a", "b", "c", "d", "a"],
        "dst": ["b", "c", "d", "e", "c"],
        "pred": ["p"] * 5, "support": [1] * 5,
    }))
    hop1 = {(r["src"], r["dst"]) for r in k_hop_pairs(edges, 1).take_all()}
    assert hop1 == {("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("a", "c")}
    hop2 = {(r["src"], r["dst"]) for r in k_hop_pairs(edges, 2).take_all()}
    assert hop2 == {(r["src"], r["dst"]) for r in two_hop_pairs(edges).take_all()}
    hop3 = {(r["src"], r["dst"]) for r in k_hop_pairs(edges, 3).take_all()}
    assert hop3 == {("a", "d"), ("a", "e"), ("b", "e")}
    with pytest.raises(ValueError):
        k_hop_pairs(edges, 0)


def test_pagerank_properties():
    """Ranks sum to ~1 on a strongly-connected graph; a node with more
    in-links outranks one with fewer; deterministic across runs."""
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.graph import pagerank

    # star into 'hub' plus a cycle so every node has out-degree
    edges = rd.from_arrow(pa.table({
        "src": ["a", "b", "c", "hub", "a", "b", "c"],
        "dst": ["hub", "hub", "hub", "a", "b", "c", "a"],
    }))
    r1 = {r["node"]: r["rank"] for r in pagerank(edges, iterations=4).take_all()}
    # distributed path (local_threshold=0 forces the join/groupby loop)
    # must agree with the local fast path bit-for-bit after rounding
    r2 = {r["node"]: r["rank"]
          for r in pagerank(edges, iterations=4, local_threshold=0).take_all()}
    assert r1 == r2
    assert abs(sum(r1.values()) - 1.0) < 0.01
    # hub collects half of a/b/c's rank each; b only gets a/2, c only
    # b/2 ('a' legitimately tops hub: it receives hub's ENTIRE rank)
    assert r1["hub"] > r1["b"] > r1["c"]


def test_hits_properties():
    """Authority concentrates on the most-pointed-at node; hubs on the
    node linking to the best authorities; local and distributed paths
    agree after the 6-decimal round."""
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.graph import hits

    # a, b, c all point at 'sink'; 'a' additionally points at b and c,
    # making it the strongest hub; 'sink' has no out-edges at all
    edges = rd.from_arrow(pa.table({
        "src": ["a", "b", "c", "a", "a"],
        "dst": ["sink", "sink", "sink", "b", "c"],
    }))
    got = {r["node"]: (r["authority"], r["hub"])
           for r in hits(edges, iterations=4).take_all()}
    dist = {r["node"]: (r["authority"], r["hub"])
            for r in hits(edges, iterations=4, local_threshold=0).take_all()}
    assert got == dist
    assert set(got) == {"a", "b", "c", "sink"}
    # sink is the unique best authority, and a the unique best hub
    assert got["sink"][0] > max(got[n][0] for n in ("a", "b", "c"))
    assert got["a"][1] > max(got[n][1] for n in ("b", "c", "sink"))
    # sink emits nothing → zero hub; a receives nothing → zero authority
    assert got["sink"][1] == 0.0 and got["a"][0] == 0.0
    # L2 norms ~1 after the final normalization of each half-step
    hub_sq = sum(v[1] ** 2 for v in got.values())
    assert abs(hub_sq - 1.0) < 1e-4


def test_triangles():
    """Each undirected triangle appears exactly once as a < b < c,
    regardless of edge direction or duplication; disconnected edges and
    self-loops contribute nothing."""
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.graph import triangles

    edges = rd.from_arrow(pa.table({
        "src": ["a", "b", "c", "a", "c", "d", "x", "e", "b", "a"],
        "dst": ["b", "c", "a", "c", "d", "a", "y", "e", "a", "b"],
    }))
    out = sorted((r["a"], r["b"], r["c"]) for r in triangles(edges).take_all())
    assert out == [("a", "b", "c"), ("a", "c", "d")]


def test_clustering_coefficient_known_graphs():
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.graph import clustering_coefficient

    # K4 (complete, incl. duplicate/reversed/self-loop noise): every
    # node has degree 3, sits in 3 triangles, coefficient 1.0
    k4 = [(a, b) for a in "wxyz" for b in "wxyz" if a < b]
    noisy = k4 + [(b, a) for a, b in k4] + [("w", "w")]
    edges = rd.from_arrow(pa.table({
        "src": [e[0] for e in noisy], "dst": [e[1] for e in noisy],
    })).repartition(3)
    got = {r["node_id"]: r for r in clustering_coefficient(edges, num_partitions=2).take_all()}
    assert set(got) == set("wxyz")
    for r in got.values():
        assert r["degree"] == 3 and r["n_tri"] == 3 and r["coefficient"] == 1.0

    # path a-b-c: no triangles; centre has degree 2 -> 0.0
    path = rd.from_arrow(pa.table({"src": ["a", "b"], "dst": ["b", "c"]}))
    got = {r["node_id"]: r["coefficient"]
           for r in clustering_coefficient(path, num_partitions=2).take_all()}
    assert got == {"a": 0.0, "b": 0.0, "c": 0.0}


def test_triangles_and_clustering_on_degenerate_graphs():
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.graph import clustering_coefficient, triangles

    # self-loop-only graph: undirected edge set is EMPTY (schema-less) —
    # both operators must return typed empties, not crash
    loops = rd.from_arrow(pa.table({"src": ["a", "b"], "dst": ["a", "b"]}))
    assert triangles(loops, num_partitions=2).take_all() == []
    assert clustering_coefficient(loops, num_partitions=2).take_all() == []


def test_partial_nodes_keeps_beyond_final_cap():
    # batch partials must keep the 4x INTERMEDIATE surface cap: trimming
    # to MAX_SURFACES here would silently drop a globally-frequent
    # surface that is locally rank >32 in every batch
    import pyarrow as pa

    from saber_ray.stages.canonicalize import MAX_SURFACES, partial_nodes

    n_surf = MAX_SURFACES + 8
    batch = pa.table({
        "entity_id": pa.array(["E"] * n_surf),
        "text": pa.array([f"s{i:03d}" for i in range(n_surf)]),
        "doc_id": pa.array(["d"] * n_surf),
    })
    out = partial_nodes(batch, num_salts=4)
    kept = out["surfaces"].to_pylist()[0]
    assert len(kept) == n_surf          # < 4x cap: nothing trimmed yet
    assert int(out["support"][0].as_py()) == n_surf


def test_pathological_docs_flow_through_graph():
    """Empty-spans, media-only and unicode docs must flow through the
    whole build_graph DAG without crashing: 0 mentions each, but every
    doc still present in the annotated table (the quarantine contract)."""
    docs = [
        {"doc_id": "empty", "spans": []},
        {"doc_id": "media-only", "spans": [
            {"kind": "image", "text": "", "media_ref": "media://m/0",
             "offset": 0}]},
        _doc("unicode", ["p53 élève \U0001f9ec le glucose."]),
    ]
    out = build_graph(rd.from_arrow(_table(docs)),
                      KGConfig(batch_size=2, num_salts=2))
    ann = out["annotated"].to_pandas().set_index("doc_id")
    assert set(ann.index) == {"empty", "media-only", "unicode"}
    mentions = out["mentions"].to_pandas()
    by_doc = mentions.groupby("doc_id").size()
    assert by_doc.get("empty", 0) == 0
    assert by_doc.get("media-only", 0) == 0
    # the unicode doc still tags its ascii gazetteer surfaces
    assert set(mentions[mentions.doc_id == "unicode"]["text"]) == {
        "p53", "glucose"}


def test_adamic_adar_square_and_path():
    """Square a-b-c-d-a: the two diagonals are the only non-adjacent
    pairs, each with 2 common neighbors of degree 2 → aa = 2/ln(2);
    adjacent pairs never appear; direction and duplicates are ignored."""
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.graph import adamic_adar

    edges = rd.from_arrow(pa.table({
        "src": ["a", "b", "c", "a", "b"],   # b→a dup direction of a→b
        "dst": ["b", "c", "d", "d", "a"],
    }))
    got = {(r["a"], r["b"]): (r["common_neighbors"], r["aa_score"])
           for r in adamic_adar(edges).take_all()}
    import math
    aa2 = round(2.0 / math.log(2.0), 6)
    assert got == {("a", "c"): (2, aa2), ("b", "d"): (2, aa2)}


def test_adamic_adar_star_hub_weighting():
    """Star hub h with leaves x,y,z: every leaf pair shares only the
    hub, weighted 1/ln(3); leaf pairs are returned, (h, leaf) pairs are
    adjacent and excluded; a degree-1-only graph returns empty."""
    import math

    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.graph import adamic_adar

    edges = rd.from_arrow(pa.table({
        "src": ["h", "h", "h"], "dst": ["x", "y", "z"],
    }))
    got = {(r["a"], r["b"]): (r["common_neighbors"], r["aa_score"])
           for r in adamic_adar(edges).take_all()}
    w = round(1.0 / math.log(3.0), 6)
    assert got == {("x", "y"): (1, w), ("x", "z"): (1, w), ("y", "z"): (1, w)}

    lone = rd.from_arrow(pa.table({"src": ["p"], "dst": ["q"]}))
    assert adamic_adar(lone).take_all() == []


def test_reciprocity():
    """Distinct non-loop directed edges: (a,b) both ways + (a,c) one way
    → 2 of 3 reciprocal; duplicates and self-loops don't count."""
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.graph import reciprocity

    edges = rd.from_arrow(pa.table({
        "src": ["a", "b", "a", "a", "d"],
        "dst": ["b", "a", "c", "b", "d"],   # a→b dup, d→d loop
    }))
    (row,) = reciprocity(edges).take_all()
    assert row == {"n_edges": 3, "n_reciprocal": 2,
                   "reciprocity": round(2 / 3, 6)}


def test_k_core_peels_tail():
    """Triangle a-b-c with tail c-d-e: the 2-core iteratively peels e
    THEN d (two rounds — degree-1 at peel time, not initially) leaving
    the triangle at degree 2 each; the 3-core is empty."""
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.graph import k_core

    edges = rd.from_arrow(pa.table({
        "src": ["a", "b", "c", "c", "d"],
        "dst": ["b", "c", "a", "d", "e"],
    }))
    got = {r["node_id"]: r["core_degree"] for r in k_core(edges, k=2).take_all()}
    assert got == {"a": 2, "b": 2, "c": 2}
    assert k_core(edges, k=3).take_all() == []


def test_bfs_depths():
    """Path a-b-c-d (+ disconnected x-y): min-id default source gives
    depths 0..3; unreachable nodes are absent; direction is ignored;
    an explicit source re-roots."""
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.graph import bfs_depths

    edges = rd.from_arrow(pa.table({
        "src": ["b", "b", "d", "x"],
        "dst": ["a", "c", "c", "y"],
    }))
    got = {r["node_id"]: r["depth"] for r in bfs_depths(edges).take_all()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}
    rerooted = {r["node_id"]: r["depth"]
                for r in bfs_depths(edges, source="c").take_all()}
    assert rerooted == {"c": 0, "b": 1, "d": 1, "a": 2}


def test_graph_summary_and_degree_histogram():
    """Summary algebra on a known 3-edge graph (a→b, a→c, b→c):
    3 nodes, avg out-degree 1, max total degree 2 (every node),
    density 3/6; histogram puts all 3 nodes at degree 2."""
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.graph import degree_histogram, graph_summary

    edges = rd.from_arrow(pa.table({
        "src": ["a", "a", "b"], "dst": ["b", "c", "c"],
    }))
    (row,) = graph_summary(edges).take_all()
    assert row == {"n_edges": 3, "n_nodes": 3, "avg_out_degree": 1.0,
                   "max_degree": 2, "density": 0.5}
    hist = {r["degree"]: r["n_nodes"]
            for r in degree_histogram(edges).take_all()}
    assert hist == {2: 3}


def test_pagerank_weighted_shifts_mass():
    """With a→b weight 9 and a→c weight 1, b outranks c (uniform weights
    tie them); local and distributed weighted paths agree after the
    6-decimal round; weight duplicates on the same (src, dst) sum."""
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.graph import pagerank

    edges = rd.from_arrow(pa.table({
        "src": ["a", "a", "a", "b", "c"],
        "dst": ["b", "b", "c", "a", "a"],
        "support": pa.array([4, 5, 1, 1, 1], type=pa.int64()),
    }))
    local = {r["node"]: r["rank"]
             for r in pagerank(edges, iterations=4,
                               weight_column="support").take_all()}
    dist = {r["node"]: r["rank"]
            for r in pagerank(edges, iterations=4, weight_column="support",
                              local_threshold=0).take_all()}
    assert local == dist
    assert local["b"] > local["c"]
    unw = {r["node"]: r["rank"]
           for r in pagerank(edges, iterations=4).take_all()}
    assert unw["b"] == unw["c"]


def test_pagerank_integer_node_ids_local_path():
    """Integer node ids must survive the LOCAL fast path (it used to
    hardcode string) and agree with the distributed path."""
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.graph import pagerank

    edges = rd.from_arrow(pa.table({
        "src": pa.array([1, 2, 3], type=pa.int64()),
        "dst": pa.array([2, 3, 1], type=pa.int64()),
    }))
    local = {r["node"]: r["rank"] for r in pagerank(edges, iterations=3).take_all()}
    dist = {r["node"]: r["rank"]
            for r in pagerank(edges, iterations=3, local_threshold=0).take_all()}
    assert local == dist and set(local) == {1, 2, 3}


def test_edge_pmi_hand_computed():
    """Triangle with one hub: PMI must damp the hub's edges. Hand
    formula: pmi = ln(support·T / (m_src·m_dst)) with m = incident
    support sum and T the total support mass."""
    import math

    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.graph import edge_pmi

    edges = rd.from_arrow(pa.table({
        "src": ["hub", "hub", "a"],
        "dst": ["a", "b", "b"],
        "support": pa.array([6, 3, 1], type=pa.int64()),
    }))
    out = {(r["src"], r["dst"]): (r["support"], r["pmi"])
           for r in edge_pmi(edges).take_all()}
    T = 10.0
    m = {"hub": 9.0, "a": 7.0, "b": 4.0}
    expect = {
        ("hub", "a"): (6, round(math.log(6 * T / (m["hub"] * m["a"])), 6)),
        ("hub", "b"): (3, round(math.log(3 * T / (m["hub"] * m["b"])), 6)),
        ("a", "b"): (1, round(math.log(1 * T / (m["a"] * m["b"])), 6)),
    }
    assert out == expect
