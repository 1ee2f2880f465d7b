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


def test_crf_viterbi_decoding(tmp_path):
    """A transition matrix turns decoding into Viterbi: transitions can
    overrule per-token argmax (the CRF property the reference's head
    provides; saber/models/multi_task_lstm_crf.py:96-103)."""
    from saber_ray.state.bundle import save_bundle

    # tags: 0=<PAD> 1=O 2=B-X 3=I-X
    tags = ["<PAD>", "O", "B-X", "I-X"]
    # vocab: token 'a' slightly prefers I-X over B-X; token 'b' prefers I-X
    word2idx = {"<PAD>": 0, "<UNK>": 1, "a": 2, "b": 3}
    emb = np.zeros((4, 4), dtype=np.float32)
    emb[1, 1] = 1.0                     # unk → O
    emb[2] = [0.0, 0.0, 1.0, 1.1]       # 'a': I-X edges out B-X
    emb[3] = [0.0, 0.0, 0.0, 1.5]       # 'b': strongly I-X
    weights = {
        "embeddings": emb,
        "W": np.eye(4, dtype=np.float32),
        "b": np.zeros(4, dtype=np.float32),
    }
    vocab = {"word2idx": word2idx, "char2idx": {"<PAD>": 0, "<UNK>": 1},
             "idx2tag": tags}

    # without transitions: argmax picks the invalid bare I-X run, which
    # the chunker then drops (quirk-preserving, but no mention)
    save_bundle(str(tmp_path / "nocrf"), weights, vocab)
    plain = NeuralTagger(str(tmp_path / "nocrf"))
    assert plain._predict_tags([["a", "b"]]) == [["I-X", "I-X"]]

    # with a CRF transition matrix that forbids starting with I-X and
    # rewards B-X → I-X, Viterbi decodes the valid sequence
    trans = np.full((4, 4), 0.0, dtype=np.float32)
    trans[1, 3] = -5.0   # O → I-X forbidden
    trans[2, 3] = 1.0    # B-X → I-X rewarded
    # starting emission boost comes from the path score itself; penalize
    # I-X at sentence start by making O→ and B-X→ the only ways in:
    weights_crf = dict(weights)
    weights_crf["transitions"] = trans
    # make the start matter: first token score alone still favors I-X by
    # 0.1, but B-X → I-X adds +1.0 to the two-token path
    save_bundle(str(tmp_path / "crf"), weights_crf, vocab)
    crf = NeuralTagger(str(tmp_path / "crf"))
    assert crf._predict_tags([["a", "b"]]) == [["B-X", "I-X"]]

    # end-to-end: the CRF bundle yields the mention the plain one drops
    batch = pa.Table.from_pylist([_doc("d", ["a b"])], schema=DOCUMENTS)
    assert plain(batch)["ents"].to_pylist()[0] == []
    ents = crf(batch)["ents"].to_pylist()[0]
    assert [(e["text"], e["label"]) for e in ents] == [("a b", "X")]


# -------------------------------------------------- recurrent forward ----


_BL_WORDS = ["<PAD>", "<UNK>", "p53", "activates", "mdm2", "in", "cells", "glucose"]
_BL_CHARS = ["<PAD>", "<UNK>"] + sorted(set("".join(_BL_WORDS[2:])))
_BL_TAGS = ["<PAD>", "O", "B-PRGE", "I-PRGE", "B-CHED", "I-CHED"]


@pytest.fixture(scope="module")
def bilstm_weights():
    from saber_ray.functions.recurrent import init_bilstm_weights

    return init_bilstm_weights(len(_BL_WORDS), len(_BL_CHARS), len(_BL_TAGS),
                               seed=123)


def _bl_encode(sents):
    w2i = {w: i for i, w in enumerate(_BL_WORDS)}
    c2i = {c: i for i, c in enumerate(_BL_CHARS)}
    return encode_sentences(sents, w2i, c2i)


def test_bilstm_fixed_weight_golden(bilstm_weights):
    """Deterministic forward: exact expected argmax tags for seed 123.

    Guards the full recurrent stack (char BiLSTM final states, two word
    BiLSTMs, dense) against silent numerical/kernel changes."""
    from saber_ray.functions.recurrent import bilstm_crf_emissions

    sents = [["p53", "activates", "mdm2", "in", "cells"], ["glucose"]]
    em = bilstm_crf_emissions(*_bl_encode(sents), bilstm_weights)
    assert em.shape == (2, MAX_SENT_LEN, len(_BL_TAGS))
    got = [[_BL_TAGS[t] for t in em[i, :len(s)].argmax(-1)]
           for i, s in enumerate(sents)]
    assert got == [
        ["<PAD>", "<PAD>", "<PAD>", "B-PRGE", "B-CHED"],
        ["I-CHED"],
    ]


def test_bilstm_masking_invariance(bilstm_weights):
    """A sentence's emissions must not depend on what else is in the
    tensor batch (mask_zero semantics: pads never leak into states)."""
    from saber_ray.functions.recurrent import bilstm_crf_emissions

    long = ["p53", "activates", "mdm2", "in", "cells"]
    together = bilstm_crf_emissions(*_bl_encode([long, ["glucose"]]), bilstm_weights)
    alone = bilstm_crf_emissions(*_bl_encode([long]), bilstm_weights)
    np.testing.assert_allclose(together[0, :5], alone[0, :5], atol=1e-12)
    alone_short = bilstm_crf_emissions(*_bl_encode([["glucose"]]), bilstm_weights)
    np.testing.assert_allclose(together[1, :1], alone_short[0, :1], atol=1e-12)


def test_bilstm_char_path_consumed(bilstm_weights):
    """Two OOV words (same <UNK> word id) with different IN-vocab chars
    must produce different emissions — proof the char BiLSTM features
    actually reach the word layers (the round-1 gap: char_ids computed
    then discarded)."""
    from saber_ray.functions.recurrent import bilstm_crf_emissions

    ea = bilstm_crf_emissions(*_bl_encode([["cat", "in"]]), bilstm_weights)
    eb = bilstm_crf_emissions(*_bl_encode([["mat", "in"]]), bilstm_weights)
    assert not np.allclose(ea[0, :2], eb[0, :2])
    # while identical char sequences agree exactly
    ec = bilstm_crf_emissions(*_bl_encode([["cat", "in"]]), bilstm_weights)
    np.testing.assert_array_equal(ea, ec)


def test_neural_tagger_recurrent_viterbi_end_to_end(tmp_path):
    """NeuralTagger over a recurrent bundle: Viterbi decode over BiLSTM
    emissions, exact golden spans, span-hash invariant, and parity with
    a hand-run forward."""
    from saber_ray.functions.recurrent import bilstm_crf_emissions
    from saber_ray.state.bundle import build_bilstm_bundle

    w2i = {w: i for i, w in enumerate(_BL_WORDS)}
    c2i = {c: i for i, c in enumerate(_BL_CHARS)}
    path = build_bilstm_bundle(str(tmp_path / "bl"), w2i, c2i, _BL_TAGS, seed=123)
    tagger = NeuralTagger(path)
    assert tagger._recurrent

    text = "p53 activates mdm2 in cells"
    batch = pa.Table.from_pylist(
        [{"doc_id": "d0",
          "spans": [{"kind": "text", "text": text, "media_ref": "", "offset": 0}]}],
        schema=DOCUMENTS,
    )
    out = tagger(batch)
    ents = out["ents"].to_pylist()[0]

    # hand-run the same forward + viterbi for parity
    weights, vocab, _ = load_bundle(path)
    em = bilstm_crf_emissions(*_bl_encode([text.split()]), weights)[0, :5]
    pred = tagger._viterbi(em, 5)
    tags = [_BL_TAGS[t] if _BL_TAGS[t] != "<PAD>" else "O" for t in pred]
    from saber_ray.functions.chunking import chunk_entities

    expected = chunk_entities(tags)
    assert len(ents) == len(expected)
    toks = text.split()
    starts = [0, 4, 14, 19, 22]
    for ent, (label, lo, hi) in zip(ents, expected):
        assert ent["label"] == label
        assert ent["start"] == starts[lo]
        assert ent["text"] == " ".join(toks[lo:hi])
    # viterbi differs from argmax here (transitions change the path)
    argmax_tags = [_BL_TAGS[t] for t in em.argmax(-1)]
    assert tags != [t if t != "<PAD>" else "O" for t in argmax_tags]


def test_neural_tagger_columnar_batch_parity(tmp_path):
    """Multi-doc, multi-span, media/empty-span batch through the
    columnar path: ents land on the right (doc, span) and match a
    doc-at-a-time run."""
    from saber_ray.state.bundle import build_bilstm_bundle

    w2i = {w: i for i, w in enumerate(_BL_WORDS)}
    c2i = {c: i for i, c in enumerate(_BL_CHARS)}
    path = build_bilstm_bundle(str(tmp_path / "bl2"), w2i, c2i, _BL_TAGS, seed=123)
    tagger = NeuralTagger(path)

    docs = [
        {"doc_id": "a", "spans": [
            {"kind": "text", "text": "p53 activates mdm2.", "media_ref": "", "offset": 0},
            {"kind": "image", "text": "", "media_ref": "m://1", "offset": 0},
            {"kind": "text", "text": "glucose in cells", "media_ref": "", "offset": 20},
        ]},
        {"doc_id": "b", "spans": []},
        {"doc_id": "c", "spans": [
            {"kind": "text", "text": "mdm2 cells glucose p53", "media_ref": "", "offset": 0},
        ]},
    ]
    batch = pa.Table.from_pylist(docs, schema=DOCUMENTS)
    together = tagger(batch)["ents"].to_pylist()
    singles = [
        tagger(pa.Table.from_pylist([d], schema=DOCUMENTS))["ents"].to_pylist()[0]
        for d in docs
    ]
    assert together == singles
    assert together[1] == []
    for ents, d in zip(together, docs):
        for e in ents:
            assert d["spans"][e["span_idx"]]["kind"] == "text"


def test_load_word2vec_all_generates_vocab(tmp_path):
    """Reference load_all mode: the vocab comes from the embedding FILE
    (file-order word ids, PAD/UNK zero rows, char vocab from the words),
    so a word unseen in any training corpus still resolves."""
    import numpy as np

    from saber_ray.state.bundle import load_word2vec_all

    p = tmp_path / "vecs.txt"
    p.write_text(
        "3 4\n"
        "alpha 1 2 3 4\n"
        "beta 5 6 7 8\n"
        "gamma 9 10 11 12\n"
    )
    matrix, word2idx, char2idx = load_word2vec_all(str(p))
    assert word2idx == {"<PAD>": 0, "<UNK>": 1, "alpha": 2, "beta": 3,
                        "gamma": 4}
    assert matrix.shape == (5, 4)
    np.testing.assert_array_equal(matrix[0], 0.0)
    np.testing.assert_array_equal(matrix[1], 0.0)
    np.testing.assert_array_equal(matrix[word2idx["beta"]], [5, 6, 7, 8])
    # char vocab from the file's words, deterministic order
    assert set("alphabetgamma") <= set(char2idx)
    assert char2idx["<PAD>"] == 0 and char2idx["<UNK>"] == 1
    # debug-style cap
    m2, w2, _ = load_word2vec_all(str(p), limit=2)
    assert len(w2) == 4 and m2.shape == (4, 4)


# -------------------------------------------------- torch backend gate ----


def test_backend_auto_falls_back_without_torch_or_gpu(tmp_path):
    """backend='auto' must select numpy when torch is absent (this
    sandbox) OR when torch has no CUDA device — the hermetic default."""
    from saber_ray.functions.recurrent_torch import torch_available
    from saber_ray.state.bundle import build_bilstm_bundle

    w2i = {w: i for i, w in enumerate(_BL_WORDS)}
    c2i = {c: i for i, c in enumerate(_BL_CHARS)}
    path = build_bilstm_bundle(str(tmp_path / "bl"), w2i, c2i, _BL_TAGS, seed=123)
    tagger = NeuralTagger(path, backend="auto")
    if torch_available():
        import torch

        expect = "torch" if torch.cuda.is_available() else "numpy"
    else:
        expect = "numpy"
    assert tagger._backend == expect


def test_backend_torch_raises_loud_without_torch(tmp_path):
    from saber_ray.functions.recurrent_torch import torch_available
    from saber_ray.state.bundle import build_bilstm_bundle

    if torch_available():
        pytest.skip("torch installed — loud-gate case not reachable")
    w2i = {w: i for i, w in enumerate(_BL_WORDS)}
    c2i = {c: i for i, c in enumerate(_BL_CHARS)}
    path = build_bilstm_bundle(str(tmp_path / "bt"), w2i, c2i, _BL_TAGS, seed=123)
    with pytest.raises(ImportError, match="torch"):
        NeuralTagger(path, backend="torch")


def test_torch_forward_parity_with_numpy(bilstm_weights, tmp_path):
    """CPU-torch forward must reproduce the numpy kernels (same gate
    layout, same masking) to float64 tolerance, and the full tagger must
    emit IDENTICAL tags/spans under both backends."""
    from saber_ray.functions.recurrent_torch import torch_available

    if not torch_available():
        pytest.skip("torch not installed in this environment")
    from saber_ray.functions.recurrent import bilstm_crf_emissions
    from saber_ray.functions.recurrent_torch import (
        bilstm_crf_emissions_torch,
        to_torch_weights,
    )

    sents = [["p53", "activates", "mdm2", "in", "cells"], ["glucose"]]
    wid, cid = _bl_encode(sents)
    em_np = bilstm_crf_emissions(wid, cid, bilstm_weights)
    tw = to_torch_weights(bilstm_weights, "cpu")
    em_t = bilstm_crf_emissions_torch(wid, cid, tw, "cpu")
    np.testing.assert_allclose(em_t, em_np, atol=1e-10)

    from saber_ray.state.bundle import build_bilstm_bundle

    w2i = {w: i for i, w in enumerate(_BL_WORDS)}
    c2i = {c: i for i, c in enumerate(_BL_CHARS)}
    path = build_bilstm_bundle(str(tmp_path / "bp"), w2i, c2i, _BL_TAGS, seed=123)
    text = "p53 activates mdm2 in cells"
    batch = pa.Table.from_pylist(
        [{"doc_id": "d0",
          "spans": [{"kind": "text", "text": text, "media_ref": "", "offset": 0}]}],
        schema=DOCUMENTS,
    )
    out_np = NeuralTagger(path, backend="numpy")(batch)
    out_t = NeuralTagger(path, backend="torch")(batch)
    assert out_t["ents"].to_pylist() == out_np["ents"].to_pylist()
