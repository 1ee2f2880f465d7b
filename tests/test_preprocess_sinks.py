"""Tests for validation/quarantine (M10), rare-token replacement (M6),
one-hot (M12), class filter (M13), annotation combine (M14), coref gate
(M4), hot keys (P6), and the S6/S7 sinks."""

import glob
import json

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from saber_ray.constants import ENTITY_CLASSES
from saber_ray.pipelines.kg import KGConfig, annotate
from saber_ray.schemas import DOCUMENTS
from saber_ray.sources.sinks import (
    annotation_records_batch,
    fetch_pubmed_stub,
    write_annotation_json,
    write_metrics_json,
)
from saber_ray.sources.synthetic import generate_documents
from saber_ray.stages.preprocess import (
    CorefResolver,
    combine_annotations,
    filter_entity_classes,
    hot_keys,
    one_hot,
    quarantine_split,
    replace_rare_tokens_batch,
    validate_documents,
)
from saber_ray.stages.triples import explode_mentions


def _doc(doc_id, texts):
    spans, off = [], 0
    for t in texts:
        spans.append({"kind": "text", "text": t, "media_ref": "", "offset": off})
        off += (len(t) if t else 0) + 1
    return {"doc_id": doc_id, "spans": spans}


def test_validate_and_quarantine():
    docs = [
        _doc("good", ["p53 is here."]),
        {"doc_id": "", "spans": []},
        {"doc_id": "nulltext", "spans": [{"kind": "text", "text": None,
                                          "media_ref": "", "offset": 0}]},
    ]
    batch = pa.Table.from_pylist(docs, schema=DOCUMENTS)
    out = validate_documents(batch)
    assert out["valid"].to_pylist() == [True, False, False]
    assert out["invalid_reason"].to_pylist() == ["", "missing doc_id", "null text span"]

    good, bad = quarantine_split(rd.from_arrow(batch))
    assert good.count() == 1 and bad.count() == 2


def test_replace_rare_tokens():
    batch = pa.table({"text": ["common words and xqzt here", "xqzt alone", ""]})
    out = replace_rare_tokens_batch(batch, {"xqzt"})
    assert out["text"].to_pylist() == [
        "common words and <UNK> here", "<UNK> alone", ""]
    # token boundaries respected
    batch2 = pa.table({"text": ["xqzty stays"]})
    assert replace_rare_tokens_batch(batch2, {"xqzt"})["text"].to_pylist() == ["xqzty stays"]
    # broadcast ref path
    ref = ray.put({"xqzt"})
    assert replace_rare_tokens_batch(batch, ref)["text"].to_pylist()[1] == "<UNK> alone"


def test_one_hot():
    out = one_hot(np.array([[0, 2], [1, 1]]), 3)
    assert out.shape == (2, 2, 3)
    assert out[0, 0].tolist() == [1.0, 0.0, 0.0]
    assert out[0, 1].tolist() == [0.0, 0.0, 1.0]
    assert out.sum() == 4


@pytest.fixture(scope="module")
def annotated():
    table, _, _ = generate_documents(80, seed=4)
    return annotate(rd.from_arrow(table), KGConfig(batch_size=32)).materialize()


def test_filter_entity_classes(annotated):
    mentions = annotated.map_batches(explode_mentions, batch_format="pyarrow")
    only_prge = filter_entity_classes(mentions, ("PRGE",))
    labels = {r["label"] for r in only_prge.take_all()}
    assert labels == {"PRGE"}
    full = filter_entity_classes(mentions, ENTITY_CLASSES)
    assert full.count() == mentions.count()


def test_combine_annotations_dedups(annotated):
    # combining a stream with itself must not duplicate mentions
    combined = combine_annotations(annotated, annotated)
    single = annotated.map_batches(explode_mentions, batch_format="pyarrow")
    assert combined.count() == single.count()


def test_coref_gate():
    # the neuralcoref path stays gated (model not in this environment)
    with pytest.raises(NotImplementedError):
        CorefResolver(mode="neural")
    stage = CorefResolver(passthrough=True)
    batch = pa.Table.from_pylist([_doc("d", ["she said p53"])], schema=DOCUMENTS)
    assert stage(batch) is batch


def test_coref_rule_goldens():
    from saber_ray.stages.preprocess import resolve_coref_text as r

    # recency resolution, main-mention substitution
    assert r("Peter Smith spoke. He was tired.") == \
        "Peter Smith spoke. Peter Smith was tired."
    # possessive → antecedent + 's
    assert r("Peter Smith spoke. His voice carried.") == \
        "Peter Smith spoke. Peter Smith's voice carried."
    # most RECENT antecedent wins
    assert r("Anna met Marcus Webb. He nodded.") == \
        "Anna met Marcus Webb. Marcus Webb nodded."
    # pronoun before any antecedent: untouched; no antecedent: unchanged
    assert r("He ran. Anna waved.") == "He ran. Anna waved."
    assert r("it was raining. nothing happened.") == \
        "it was raining. nothing happened."
    # lone sentence-initial capitalized word is NOT an antecedent unless
    # it recurs mid-sentence
    assert r("Results were good. They shipped.") == \
        "Results were good. They shipped."
    assert r("Kinase binds ATP. The Kinase is active. It phosphorylates.") == \
        "Kinase binds ATP. The Kinase is active. The Kinase phosphorylates."
    assert r("") == ""


def test_coref_stage_rewrites_text_spans():
    stage = CorefResolver()  # default mode="rule"
    batch = pa.Table.from_pylist(
        [_doc("d", ["Peter Smith spoke.", "He was tired."])], schema=DOCUMENTS
    )
    out = stage(batch)
    spans = out["spans"].to_pylist()[0]
    assert spans[0]["text"] == "Peter Smith spoke."
    assert spans[1]["text"] == "Peter Smith was tired."


def test_hot_keys(annotated):
    mentions = annotated.map_batches(explode_mentions, batch_format="pyarrow")
    top = hot_keys(mentions, "entity_id", k=3)
    assert len(top) == 3
    counts = [c for _, c in top]
    assert counts == sorted(counts, reverse=True)
    # p53 is over-sampled by the generator's skew knob
    assert any("ENSP00000269305" in key for key, _ in top)


def test_annotation_json_sink(annotated, tmp_path):
    records = annotation_records_batch(annotated.take_batch(5, batch_format="pyarrow"))
    rec = records.to_pylist()[0]
    assert set(rec) == {"doc_id", "title", "text", "ents", "media_refs"}
    for e in rec["ents"]:
        assert set(e) == {"start", "end", "text", "label", "span_idx", "xrefs"}
        # doc-level offsets: slicing the record text yields the mention
        assert rec["text"][e["start"]:e["end"]] == e["text"]

    out = str(tmp_path / "ann")
    write_annotation_json(annotated, out)
    files = glob.glob(f"{out}/*.json")
    assert files
    first = json.loads(open(files[0]).readline())
    assert "ents" in first and "text" in first


def test_metrics_json_sink(tmp_path):
    path = write_metrics_json(
        {"PRGE": (1.0, 0.5, 2 / 3, 4), "MICRO_AVG": (1.0, 0.5, 2 / 3, 4)},
        str(tmp_path / "m" / "scores.json"),
    )
    data = json.load(open(path))
    assert data["scores"]["PRGE"]["recall"] == 0.5
    assert data["scores"]["MICRO_AVG"]["support"] == 4


def test_pubmed_stub_gated():
    with pytest.raises(NotImplementedError):
        fetch_pubmed_stub("12345")


def test_ini_config_roundtrip(tmp_path):
    from saber_ray.config import load_config, save_config
    from saber_ray.pipelines.kg import KGConfig

    cfg = KGConfig(same_sentence=False, num_salts=8, batch_size=128,
                   dedup="edit", dedup_edit_k=1,
                   surfaces={"p53": "PRGE", "glucose": "CHED"})
    path = save_config(cfg, str(tmp_path / "c.ini"))
    loaded = load_config(path)
    assert loaded.same_sentence is False
    assert loaded.num_salts == 8
    assert loaded.batch_size == 128
    assert loaded.surfaces == {"p53": "PRGE", "glucose": "CHED"}
    assert loaded.dedup == "edit" and loaded.dedup_edit_k == 1
    # CLI-style override wins
    assert load_config(path, num_salts=4).num_salts == 4


def test_ini_config_preserves_case_and_percent(tmp_path):
    from saber_ray.config import load_config, save_config
    from saber_ray.pipelines.kg import KGConfig

    cfg = KGConfig(surfaces={"NF-kB": "PRGE", "5% dextrose": "CHED"})
    path = save_config(cfg, str(tmp_path / "c.ini"))
    loaded = load_config(path)
    assert loaded.surfaces == {"NF-kB": "PRGE", "5% dextrose": "CHED"}


def test_jsonl_roundtrip_and_schema_normalization(tmp_path):
    import json

    from saber_ray.sources.jsonl import read_jsonl, write_jsonl

    # heterogeneous shards: shard 2 lacks `lang`, has an extra field
    s1 = tmp_path / "a.jsonl"
    s2 = tmp_path / "b.jsonl"
    s1.write_text("\n".join(json.dumps(r) for r in [
        {"doc_id": 1, "text": "hello world", "lang": "en"},
        {"doc_id": 2, "text": "bonjour", "lang": "fr"},
    ]))
    s2.write_text(json.dumps({"doc_id": 3, "text": "hi", "extra": 9}))

    ds = read_jsonl([str(s1), str(s2)], columns=["doc_id", "text", "lang"])
    rows = sorted(ds.take_all(), key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in rows] == [1, 2, 3]
    assert rows[2]["lang"] is None          # absent field -> typed null
    assert "extra" not in rows[0]           # pruned

    # roundtrip through the sink
    out = tmp_path / "out"
    write_jsonl(ds, str(out))
    back = sorted(read_jsonl(str(out)).take_all(), key=lambda r: r["doc_id"])
    assert [(r["doc_id"], r["text"]) for r in back] == \
           [(1, "hello world"), (2, "bonjour"), (3, "hi")]


def test_jsonl_absent_numeric_field_unifies(tmp_path):
    import json

    from saber_ray.sources.jsonl import read_jsonl

    (tmp_path / "a.jsonl").write_text(json.dumps(
        {"doc_id": 1, "n_likes": 5}))
    (tmp_path / "b.jsonl").write_text(json.dumps({"doc_id": 2}))
    ds = read_jsonl([str(tmp_path / "a.jsonl"), str(tmp_path / "b.jsonl")],
                    columns=["doc_id", "n_likes"])
    # a string-null fill would make int64/string blocks that crash on
    # unification; null-typed fill promotes to the carrying shard's type
    mat = ds.materialize()
    assert str(mat.schema().types[1]) in ("int64", "null")
    rows = sorted(mat.take_all(), key=lambda r: r["doc_id"])
    assert [r["n_likes"] for r in rows] == [5, None]
    assert ds.sum("n_likes") == 5  # numeric aggregate works end-to-end


def test_compact_parquet_roundtrip(tmp_path):
    """Many tiny files → few target-sized files; rows preserved exactly;
    source kept unless delete_src."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from saber_ray.sources.sinks import compact_parquet

    src = tmp_path / "frag"
    src.mkdir()
    for i in range(12):
        pq.write_table(pa.table({"x": pa.array([i] * 50, type=pa.int64())}),
                       src / f"part-{i:03d}.parquet")
    out = compact_parquet(str(src), str(tmp_path / "compact"), target_mb=1)
    assert out == {"files_before": 12, "files_after": 1, "rows": 600}
    assert len(glob.glob(str(src / "*.parquet"))) == 12  # source kept
    t = pq.read_table(str(tmp_path / "compact"))
    assert t.num_rows == 600
    assert sorted(set(t["x"].to_pylist())) == list(range(12))
