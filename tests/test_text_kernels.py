"""Golden tests for the pure text kernels, mirroring the reference's
deterministic fixtures (saber/tests/test_text_utils.py,
saber/tests/test_preprocessor.py)."""

from saber_ray.functions.text import (
    split_sentences,
    sterilize,
    tokenize,
    tokenize_with_offsets,
)


def test_tokenizer_blank():
    assert tokenize("") == []


def test_tokenizer_simple():
    assert tokenize("This is an easy test.") == ["This", "is", "an", "easy", "test", "."]


def test_tokenizer_complicated():
    # saber/tests/test_text_utils.py:27-31
    text = "This test's tokenizers handeling of very-tricky situations, 3X, more/or/less."
    expected = ["This", "test", "'", "s", "tokenizers", "handeling", "of",
                "very", "-", "tricky", "situations", ",", "3X", ",", "more", "/", "or",
                "/", "less", "."]
    assert tokenize(text) == expected


def test_tokenizer_training_data_sentences():
    # saber/tests/test_text_utils.py:34-62 — real training-data sentences
    cases = {
        ("The results have shown that the degradation product p-choloroaniline is not "
         "a significant factor in chlorhexidine-digluconate associated erosive "
         "cystitis."): [
            'The', 'results', 'have', 'shown', 'that', 'the', 'degradation',
            'product', 'p', '-', 'choloroaniline', 'is', 'not', 'a', 'significant',
            'factor', 'in', 'chlorhexidine', '-', 'digluconate', 'associated',
            'erosive', 'cystitis', '.'],
        ("Rats were treated with seven day intravenous infusion of fucoidan "
         "(30 micrograms h-1) or vehicle."): [
            'Rats', 'were', 'treated', 'with', 'seven', 'day', 'intravenous',
            'infusion', 'of', 'fucoidan', '(', '30', 'micrograms', 'h', '-', '1',
            ')', 'or', 'vehicle', '.'],
        ("Methanoregula formicica sp. nov., a methane-producing archaeon isolated from "
         "methanogenic sludge."): [
            'Methanoregula', 'formicica', 'sp', '.', 'nov', '.', ',', 'a',
            'methane', '-', 'producing', 'archaeon', 'isolated', 'from',
            'methanogenic', 'sludge', '.'],
        ("Here we report the cloning, expression, and biochemical characterization of "
         "the 32-kDa subunit of human (h) TFIID, termed hTAFII32."): [
            'Here', 'we', 'report', 'the', 'cloning', ',', 'expression', ',',
            'and', 'biochemical', 'characterization', 'of', 'the', '32', '-',
            'kDa', 'subunit', 'of', 'human', '(', 'h', ')', 'TFIID', ',', 'termed',
            'hTAFII32', '.'],
    }
    for text, expected in cases.items():
        assert tokenize(text) == expected


def test_sentence_split_offsets():
    # saber/tests/test_preprocessor.py:23-36
    toks = tokenize_with_offsets("Simple example. With two sentences!")
    sents, offsets = split_sentences(toks)
    assert sents == [["Simple", "example", "."], ["With", "two", "sentences", "!"]]
    assert offsets == [
        [(0, 6), (7, 14), (14, 15)],
        [(16, 20), (21, 24), (25, 34), (34, 35)],
    ]


def test_sentence_split_blank():
    assert split_sentences(tokenize_with_offsets("")) == ([], [])


def test_sterilize():
    # saber/tests/test_preprocessor.py:102-117
    assert sterilize(" This is an easy test. ") == "This is an easy test."
    assert sterilize("This  is a test   with improper  spacing. ") == \
        "This is a test with improper spacing."
    assert sterilize("") == ""
    assert sterilize(" MiXeD Case ", lower=True) == "mixed case"


def test_bpe_pretokenizer_counts():
    import pyarrow as pa

    from saber_ray.stages.textstats import token_count_bpe_batch

    t = pa.table({"text": pa.array([
        "it's 2024, really?",   # it +'s + space+2024 +, + really +? = contraction split
        "hello world",
        "",
    ])})
    out = token_count_bpe_batch(t)["n_bpe_tokens"].to_pylist()
    # "it's 2024, really?" -> [it]['s][ 2024][,][ really][?] = 6
    assert out == [6, 2, 0]


def test_ngram_frequency_counts_and_topk():
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.textstats import ngram_frequency

    docs = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": ["the cat sat", "the cat ran", "x"],   # 1-token doc: no bigrams
    })).repartition(3)
    got = {r["ngram"]: r["cnt"] for r in ngram_frequency(docs, n=2).take_all()}
    assert got == {"the cat": 2, "cat sat": 1, "cat ran": 1}
    top = ngram_frequency(docs, n=2, k=1).take_all()
    assert top == [{"ngram": "the cat", "cnt": 2}]
    tri = {r["ngram"]: r["cnt"] for r in ngram_frequency(docs, n=3).take_all()}
    assert tri == {"the cat sat": 1, "the cat ran": 1}


def test_grouped_hot_tokens_exact():
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.textstats import grouped_hot_tokens

    docs = pa.table({
        "doc_id": [1, 2, 3, 4],
        "lang": ["en", "en", "fr", "fr"],
        "text": [
            "apple apple apple banana banana cherry",
            "apple banana date date date date",
            "pomme pomme poire",
            "pomme raisin raisin raisin",
        ],
    })
    out = grouped_hot_tokens(rd.from_arrow(docs).repartition(3), "lang", k=2)
    rows = {(r["lang"], r["token"]): r["n"] for r in out.take_all()}
    # en: apple 4, date 4 (banana 3 excluded); ties broken token-asc
    assert rows == {("en", "apple"): 4, ("en", "date"): 4,
                    ("fr", "pomme"): 3, ("fr", "raisin"): 3}


def test_grouped_hot_tokens_null_group_excluded():
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.textstats import grouped_hot_tokens

    docs = pa.table({
        "doc_id": [1, 2],
        "lang": ["en", None],
        "text": ["apple apple", "banana"],
    })
    out = grouped_hot_tokens(rd.from_arrow(docs), "lang", k=2).take_all()
    assert {r["lang"] for r in out} == {"en"}  # null group dropped, no crash


def test_token_entropy_known_distribution():
    # 4 equal-frequency tokens -> exactly 2 bits; skewed -> less
    import math

    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.textstats import token_entropy

    docs = rd.from_arrow(pa.table({
        "text": ["aa bb cc dd", "aa bb cc dd", None, ""],
    }))
    t = token_entropy(docs)
    assert t["n_tokens"][0].as_py() == 8
    assert t["n_distinct"][0].as_py() == 4
    assert abs(t["entropy"][0].as_py() - 2.0) < 1e-9

    skew = rd.from_arrow(pa.table({"text": ["aa aa aa aa aa aa aa bb"]}))
    s = token_entropy(skew)
    expected = -(7 / 8) * math.log2(7 / 8) - (1 / 8) * math.log2(1 / 8)
    assert abs(s["entropy"][0].as_py() - round(expected, 6)) < 1e-6


def test_source_distinctive_terms():
    """The token unique to a source tops its list (max log-odds); a
    token shared equally scores near zero and ranks below; k caps each
    group's rows."""
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.textstats import source_distinctive_terms

    docs = rd.from_arrow(pa.table({
        "source": ["a"] * 3 + ["b"] * 3,
        "text": ["zebra common", "zebra common", "zebra filler",
                 "yak common", "yak common", "yak filler"],
    }))
    out = source_distinctive_terms(docs, k=2).take_all()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append((r["token"], r["score"]))
    assert [t for t, _ in by_src["a"]][0] == "zebra"
    assert [t for t, _ in by_src["b"]][0] == "yak"
    assert all(len(v) == 2 for v in by_src.values())
    # symmetric corpus: zebra's lift in a == yak's lift in b
    assert by_src["a"][0][1] == by_src["b"][0][1] > 0


def test_inverted_postings_df_and_head():
    """df counts DISTINCT docs per token (a doc repeating a token counts
    once); postings_head is the first k doc ids ascending."""
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.textstats import inverted_postings

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([3, 1, 2], type=pa.int64()),
        "text": pa.array(["apple apple pie", "apple tart", "pie pie"]),
    })).repartition(2)
    got = {r["token"]: (r["df"], r["postings_head"])
           for r in inverted_postings(docs, head_k=2).take_all()}
    assert got == {
        "apple": (2, "1,3"),
        "pie": (2, "2,3"),
        "tart": (1, "1"),
    }


def test_source_vocab_overlap_jaccard():
    """Jaccard over DISTINCT vocabularies; token repeats don't inflate
    overlap; pairs are canonical (a < b)."""
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.textstats import source_vocab_overlap

    docs = rd.from_arrow(pa.table({
        "source": pa.array(["s1", "s1", "s2", "s3"]),
        "text": pa.array(["apple pie apple", "tart", "apple cake",
                          "zebra"]),
    })).repartition(2)
    got = {(r["source_a"], r["source_b"]): (r["common"], r["jaccard"])
           for r in source_vocab_overlap(docs).take_all()}
    # s1 vocab {apple, pie, tart}, s2 {apple, cake}, s3 {zebra}
    assert got == {("s1", "s2"): (1, round(1 / 4, 6))}


def test_zipf_fit_matches_numpy_ols():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.textstats import _TOKEN_RE, zipf_fit

    # counts 8,4,2,1 over four tokens; ranks deterministic via token ties
    text = " ".join(["alpha"] * 8 + ["beta"] * 4 + ["gamma"] * 2 + ["delta"])
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], type=pa.int64()),
        "text": pa.array([text], type=pa.string()),
    }))
    row = zipf_fit(ds).take_all()[0]
    counts = sorted(
        __import__("collections").Counter(_TOKEN_RE.findall(text)).items(),
        key=lambda kv: (-kv[1], kv[0]),
    )
    y = np.log([c for _, c in counts])
    x = np.log(np.arange(1, len(counts) + 1, dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    assert row["n_types"] == 4
    assert abs(row["slope"] - slope) < 1e-6
    assert abs(row["intercept"] - intercept) < 1e-6
    assert 0.9 < row["r2"] <= 1.0


def test_grouped_zipf_fit_matches_numpy_ols():
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.textstats import _TOKEN_RE, grouped_zipf_fit

    texts = {
        "a": " ".join(["alpha"] * 8 + ["beta"] * 4 + ["gamma"] * 2 + ["delta"]),
        "b": " ".join(["x1"] * 9 + ["x2"] * 3 + ["x3"] * 3 + ["x4"]),
    }
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "source": pa.array(list(texts), type=pa.string()),
        "text": pa.array(list(texts.values()), type=pa.string()),
    })).repartition(2)
    got = {r["source"]: r for r in grouped_zipf_fit(ds, "source").take_all()}
    for src, text in texts.items():
        counts = collections.Counter(_TOKEN_RE.findall(text))
        ns = sorted(counts.values(), reverse=True)
        # SQL RANK(): min rank among ties
        rnk = [1 + sum(1 for m in ns if m > n) for n in ns]
        x, y = np.log(np.array(rnk, float)), np.log(np.array(ns, float))
        slope, intercept = np.polyfit(x, y, 1)
        assert got[src]["n_types"] == len(ns)
        assert abs(got[src]["slope"] - slope) < 1e-6, src
        assert abs(got[src]["intercept"] - intercept) < 1e-6, src
