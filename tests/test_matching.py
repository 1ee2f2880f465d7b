"""Token-trie matcher tests: canonical match semantics, exact parity
with the regex strategy, punctuated-surface grounding, and the
large-gazetteer scaling property that justifies the trie's existence."""

import re
import time

import pytest

from saber_ray.functions.matching import TokenTrieMatcher
from saber_ray.gazetteer import SABER_SURFACES
from saber_ray.sources.synthetic import generate_documents
from saber_ray.stages.annotate import Annotator
from saber_ray.stages.tagger import build_surface_pattern

_WS = re.compile(r"\s+")


def _regex_matches(surfaces, text):
    pat = build_surface_pattern(surfaces)
    return [(m.start(), m.end()) for m in pat.finditer(text)]


def _trie_matches(surfaces, text):
    m = TokenTrieMatcher(surfaces)
    return [(s, e) for s, e, _ in m.finditer(text)]


def test_trie_basic_longest_match():
    m = TokenTrieMatcher({"cystic": "DISO", "cystic fibrosis": "DISO", "p53": "PRGE"})
    got = list(m.finditer("severe cystic fibrosis with p53"))
    assert got == [(7, 22, "DISO"), (28, 31, "PRGE")]


def test_trie_case_and_boundaries():
    m = TokenTrieMatcher({"p53": "PRGE", "human": "LIVB"})
    assert list(m.finditer("P53 and HUMAN")) == [(0, 3, "PRGE"), (8, 13, "LIVB")]
    # token boundaries: no match inside alnum runs
    assert list(m.finditer("p533 humanoid")) == []
    # punctuation-adjacent matches (same as regex lookarounds)
    assert list(m.finditer("p53-mediated")) == [(0, 3, "PRGE")]


@pytest.mark.parametrize("surfaces,text", [
    ({"cystic fibrosis": "DISO"}, "cystic fibrosis here"),
    ({"cystic fibrosis": "DISO"}, "cystic  fibrosis here"),   # whitespace run
    ({"cystic fibrosis": "DISO"}, "cystic\n fibrosis here"),
    ({"cystic fibrosis": "DISO"}, "cystic-fibrosis here"),    # punct blocks phrase
    ({"il-2": "PRGE"}, "binding of il-2 receptor"),           # punctuated surface
    ({"il-2": "PRGE"}, "binding of il - 2 receptor"),         # spaced variant: NO
    ({"il-2": "PRGE"}, "il-23 receptor"),                     # boundary
    ({"p53": "PRGE", "human": "LIVB"}, "p53/human co-culture"),
])
def test_strategy_parity_cases(surfaces, text):
    """The canonical semantics hold identically on both strategies."""
    assert _trie_matches(surfaces, text) == _regex_matches(surfaces, text)


def test_strategy_parity_on_corpus():
    table, _, _ = generate_documents(150, seed=19)
    pat = build_surface_pattern(SABER_SURFACES)
    trie = TokenTrieMatcher(SABER_SURFACES)
    for spans in table["spans"].to_pylist():
        for span in spans:
            text = span["text"]
            if not text:
                continue
            via_regex = [(m.start(), m.end()) for m in pat.finditer(text)]
            via_trie = [(s, e) for s, e, _ in trie.finditer(text)]
            assert via_trie == via_regex, text


def test_punctuated_surface_grounds():
    """Grounding survives the trie path for punctuated surfaces (norm is
    the matched text, not a token join)."""
    surfaces = {"il-2": "PRGE"}
    grounding = {("il-2", "PRGE"): [{"namespace": "STRING", "id": "X1",
                                     "organism_id": ""}]}
    import pyarrow as pa

    from saber_ray.schemas import DOCUMENTS

    batch = pa.Table.from_pylist(
        [{"doc_id": "d",
          "spans": [{"kind": "text", "text": "binding of il-2 receptor",
                     "media_ref": "", "offset": 0}]}],
        schema=DOCUMENTS,
    )
    for strategy in ("regex", "trie"):
        out = Annotator(surfaces=surfaces, linker_ref=grounding,
                        strategy=strategy)(batch)
        ents = out["ents"].to_pylist()[0]
        assert len(ents) == 1, strategy
        assert ents[0]["entity_id"] == "PRGE:STRING:X1", strategy
        assert ents[0]["xrefs"][0]["id"] == "X1", strategy


def test_annotator_strategy_parity():
    table, _, _ = generate_documents(80, seed=29)
    regex_out = Annotator(strategy="regex")(table)
    trie_out = Annotator(strategy="trie")(table)
    assert regex_out["ents"].to_pylist() == trie_out["ents"].to_pylist()


def test_auto_strategy_threshold():
    small = Annotator()  # saber gazetteer: regex
    assert small.strategy == "regex"
    big_surfaces = {f"gene{i}xyz": "PRGE" for i in range(2000)}
    big = Annotator(surfaces=big_surfaces, linker_ref={})
    assert big.strategy == "trie"


def test_trie_scales_to_large_gazetteer():
    """100k surfaces: trie match time stays bounded where the regex
    alternation takes ~25 ms per KB (measured) — and matches correctly.
    Thresholds are generous to tolerate loaded machines; the property
    under test is the ~1000x gap, not exact wall time."""
    surfaces = {f"gene{i}xyz": "PRGE" for i in range(100_000)}
    surfaces["cystic fibrosis"] = "DISO"
    t0 = time.perf_counter()
    m = TokenTrieMatcher(surfaces)
    assert time.perf_counter() - t0 < 30.0
    text = ("the gene500xyz interacts with gene99999xyz in cystic fibrosis "
            "and many other words ") * 20
    t0 = time.perf_counter()
    for _ in range(20):
        got = list(m.finditer(text))
    per_call_ms = (time.perf_counter() - t0) / 20 * 1000
    assert per_call_ms < 20.0, f"trie match {per_call_ms:.1f} ms for 1.6KB"
    assert sum(1 for *_, lab in got if lab == "PRGE") == 40
    assert sum(1 for *_, lab in got if lab == "DISO") == 20


from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abc12", min_size=1, max_size=4)
_surface = st.builds(
    lambda parts, seps: "".join(
        p + s for p, s in zip(parts, seps + [""])
    ),
    st.lists(_word, min_size=1, max_size=3),
    st.lists(st.sampled_from([" ", "-", ".", "  "]), min_size=0, max_size=2),
).filter(lambda s: s.strip())
_text = st.text(alphabet="abc12 -.\n\t", max_size=60)


@given(st.dictionaries(_surface, st.sampled_from(["PRGE", "CHED"]),
                       min_size=1, max_size=6), _text)
@settings(max_examples=300, deadline=None)
def test_trie_regex_parity_fuzz(surfaces, text):
    """Randomized parity: both strategies must produce identical match
    spans for ANY gazetteer/text over the shared alphabet."""
    # regex path normalizes surfaces by the same lower rule the trie uses
    surfaces = {k.lower(): v for k, v in surfaces.items()}
    assert _trie_matches(surfaces, text) == _regex_matches(surfaces, text)
