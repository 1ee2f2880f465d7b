"""Model-bundle (S5) + embedding-loader (S4) + neural tagger path tests:
the weights-backed encode/predict/decode pipeline must agree with the
dictionary tagger on gazetteer corpora, and the tensor contract must
match the reference's shapes (saber/preprocessor.py:139-193,
saber/constants.py:59-68)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from saber_ray.constants import MAX_CHAR_LEN, MAX_SENT_LEN, PAD, UNK
from saber_ray.gazetteer import SABER_SURFACES
from saber_ray.schemas import DOCUMENTS
from saber_ray.sources.synthetic import generate_documents
from saber_ray.stages.neural import NeuralTagger, encode_sentences
from saber_ray.stages.tagger import DictionaryTagger
from saber_ray.state.bundle import (
    build_gazetteer_bundle,
    compress_bundle,
    load_bundle,
    load_word2vec_text,
    save_bundle,
)


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    d = tmp_path_factory.mktemp("bundle")
    return build_gazetteer_bundle(str(d / "gaz"), SABER_SURFACES)


def test_bundle_roundtrip(tmp_path):
    w = {"embeddings": np.arange(6, dtype=np.float32).reshape(2, 3)}
    save_bundle(str(tmp_path / "b"), w, {"word2idx": {PAD: 0}}, {"kind": "t"})
    weights, vocab, config = load_bundle(str(tmp_path / "b"))
    np.testing.assert_array_equal(weights["embeddings"], w["embeddings"])
    assert vocab["word2idx"] == {PAD: 0}
    assert config["max_sent_len"] == MAX_SENT_LEN
    assert config["kind"] == "t"


def test_bundle_tar_bz2(tmp_path, bundle):
    archive = compress_bundle(bundle, str(tmp_path / "m.tar.bz2"))
    weights, vocab, _ = load_bundle(archive)
    assert "embeddings" in weights and "idx2tag" in vocab


def test_encode_shapes_and_padding():
    word2idx = {PAD: 0, UNK: 1, "p53": 2, "binds": 3}
    char2idx = {PAD: 0, UNK: 1, "p": 2, "5": 3, "3": 4, "b": 5}
    sents = [["p53", "binds", "mystery"], ["p53"]]
    word_ids, char_ids = encode_sentences(sents, word2idx, char2idx)
    assert word_ids.shape == (2, MAX_SENT_LEN)
    assert char_ids.shape == (2, MAX_SENT_LEN, MAX_CHAR_LEN)
    assert word_ids.dtype == np.int32
    assert word_ids[0, :3].tolist() == [2, 3, 1]          # UNK fallback
    assert word_ids[0, 3:].sum() == 0                     # right-padded
    assert char_ids[0, 0, :3].tolist() == [2, 3, 4]
    assert char_ids[1, 1:].sum() == 0


def test_word2vec_loader(tmp_path):
    # F7: header + per-word vectors; <PAD>/<UNK>/OOV rows stay zero
    path = tmp_path / "emb.txt"
    path.write_text("2 3\nthe 0.1 0.2 0.3\nfox 1.0 2.0 3.0\n")
    word2idx = {PAD: 0, UNK: 1, "fox": 2, "the": 3, "oov": 4}
    m = load_word2vec_text(str(path), word2idx)
    assert m.shape == (5, 3)
    np.testing.assert_allclose(m[2], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(m[3], [0.1, 0.2, 0.3])
    assert m[0].sum() == m[1].sum() == m[4].sum() == 0


def _doc(doc_id, texts):
    spans, offset = [], 0
    for t in texts:
        spans.append({"kind": "text", "text": t, "media_ref": "", "offset": offset})
        offset += len(t) + 1
    return {"doc_id": doc_id, "spans": spans}


def test_neural_tagger_matches_goldens(bundle):
    tagger = NeuralTagger(bundle)
    batch = pa.Table.from_pylist(
        [_doc("d1", ["Glucose and p53 in cystic fibrosis. Cancer follows."])],
        schema=DOCUMENTS,
    )
    ents = tagger(batch)["ents"].to_pylist()[0]
    got = [(e["text"], e["label"], e["start"], e["end"], e["sent_idx"]) for e in ents]
    assert got == [
        ("Glucose", "CHED", 0, 7, 0),
        ("p53", "PRGE", 12, 15, 0),
        ("cystic fibrosis", "DISO", 19, 34, 0),
        ("Cancer", "DISO", 36, 42, 1),
    ]


def test_neural_tagger_unknown_words_O(bundle):
    tagger = NeuralTagger(bundle)
    batch = pa.Table.from_pylist(
        [_doc("d1", ["completely unrelated words here."])], schema=DOCUMENTS
    )
    assert tagger(batch)["ents"].to_pylist()[0] == []


def test_neural_agrees_with_dictionary_on_corpus(bundle):
    """The distilled-weights path and the regex dictionary path must find
    the same single/multi-token gazetteer mentions on the synthetic corpus."""
    table, _, _ = generate_documents(120, seed=5)
    neural = NeuralTagger(bundle)
    dictionary = DictionaryTagger()

    def key_set(out):
        ks = set()
        for doc_id, ents in zip(out["doc_id"].to_pylist(), out["ents"].to_pylist()):
            for e in ents:
                ks.add((doc_id, e["span_idx"], e["start"], e["end"], e["label"]))
        return ks

    n = key_set(neural(table))
    d = key_set(dictionary(table))
    assert n == d
    assert len(n) > 100


def test_neural_tagger_as_ray_stage(bundle):
    table, _, _ = generate_documents(60, seed=6)
    ds = rd.from_arrow(table).map_batches(
        NeuralTagger,
        fn_constructor_kwargs={"bundle_path": bundle},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=2,
    )
    rows = ds.take_all()
    assert len(rows) == 60
    assert any(r["ents"] for r in rows)


def test_kg_job_with_bundle(bundle, tmp_path):
    """The checkpointed job runs the weights-backed path end-to-end and
    produces the same mentions as the dictionary path."""
    import glob

    import pyarrow.parquet as pq

    from saber_ray.pipelines.kg import KGConfig
    from saber_ray.pipelines.run import run_kg_job

    table, _, _ = generate_documents(60, seed=14)
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    pq.write_table(table, str(corpus / "frag.parquet"))

    out_n = str(tmp_path / "neural")
    out_d = str(tmp_path / "dict")
    s1 = run_kg_job(f"{corpus}/*.parquet", out_n,
                    KGConfig(batch_size=16, num_salts=2, bundle_path=bundle),
                    partitions=1)
    s2 = run_kg_job(f"{corpus}/*.parquet", out_d,
                    KGConfig(batch_size=16, num_salts=2), partitions=1)
    assert s1["complete"] and s2["complete"]

    def mention_set(root):
        rows = []
        for f in glob.glob(f"{root}/mentions/**/*.parquet", recursive=True):
            t = pq.read_table(f)
            rows += list(zip(t["doc_id"].to_pylist(), t["span_idx"].to_pylist(),
                             t["start"].to_pylist(), t["end"].to_pylist(),
                             t["label"].to_pylist(), t["entity_id"].to_pylist()))
        return set(rows)

    assert mention_set(out_n) == mention_set(out_d)
