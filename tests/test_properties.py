"""Property-based tests (hypothesis) for the pure kernels: invariants
that must hold for ALL inputs, complementing the golden fixtures."""

from hypothesis import given, settings
from hypothesis import strategies as st

from saber_ray.functions.chunking import chunk_entities
from saber_ray.functions.hashing import span_sequence_hash, stable_u64
from saber_ray.functions.metrics import evaluate_chunks
from saber_ray.functions.text import sterilize, tokenize, tokenize_with_offsets

text_st = st.text(max_size=200)


@given(text_st)
@settings(max_examples=200, deadline=None)
def test_tokenize_offsets_slice_back(text):
    for tok, start, end in tokenize_with_offsets(text):
        assert text[start:end] == tok
        assert end > start


@given(text_st)
@settings(max_examples=200, deadline=None)
def test_tokenize_offsets_monotonic_nonoverlapping(text):
    toks = tokenize_with_offsets(text)
    for (_, s1, e1), (_, s2, e2) in zip(toks, toks[1:]):
        assert e1 <= s2


@given(text_st)
@settings(max_examples=200, deadline=None)
def test_tokenize_covers_every_nonspace_char(text):
    covered = set()
    for _, start, end in tokenize_with_offsets(text):
        covered.update(range(start, end))
    for i, ch in enumerate(text):
        if not ch.isspace():
            assert i in covered, f"char {ch!r} at {i} not tokenized"


@given(text_st)
@settings(max_examples=200, deadline=None)
def test_tokenize_matches_offsets_variant(text):
    assert tokenize(text) == [t for t, _, _ in tokenize_with_offsets(text)]


@given(text_st, st.booleans())
@settings(max_examples=200, deadline=None)
def test_sterilize_idempotent_and_collapsed(text, lower):
    once = sterilize(text, lower)
    assert sterilize(once, lower) == once
    assert "  " not in once
    assert once == once.strip()


_tag_st = st.lists(
    st.sampled_from(["O", "B-PRGE", "I-PRGE", "B-DISO", "I-DISO", "E-DISO", "S-CHED"]),
    max_size=30,
)


@given(_tag_st)
@settings(max_examples=300, deadline=None)
def test_chunks_well_formed(tags):
    chunks = chunk_entities(tags)
    prev_end = 0
    for label, start, end in chunks:
        assert 0 <= start < end <= len(tags)
        assert start >= prev_end           # non-overlapping, ordered
        assert tags[start] == f"B-{label}"  # every chunk starts at a B- tag
        for i in range(start + 1, end):
            assert tags[i] == f"I-{label}"
        prev_end = end


@given(st.lists(st.tuples(st.sampled_from(["A", "B"]), st.integers(0, 5),
                          st.integers(6, 9)), max_size=10))
@settings(max_examples=200, deadline=None)
def test_evaluate_chunks_bounds_and_identity(chunks):
    scores = evaluate_chunks(chunks, chunks)
    for label, (p, r, f1, support) in scores.items():
        assert 0.0 <= p <= 1.0 and 0.0 <= r <= 1.0 and 0.0 <= f1 <= 1.0
        if label not in ("MACRO_AVG", "MICRO_AVG") and support:
            assert (p, r, f1) == (1.0, 1.0, 1.0)


@given(st.lists(st.tuples(st.sampled_from(["text", "image"]), text_st,
                          st.text(max_size=20)), max_size=6))
@settings(max_examples=200, deadline=None)
def test_span_hash_order_and_content_sensitivity(spans):
    kinds = [s[0] for s in spans]
    texts = [s[1] for s in spans]
    refs = [s[2] for s in spans]
    h = span_sequence_hash(kinds, texts, refs)
    assert h == span_sequence_hash(list(kinds), list(texts), list(refs))
    if len(spans) >= 2 and spans[0] != spans[1]:
        swapped = [spans[1], spans[0]] + spans[2:]
        h2 = span_sequence_hash([s[0] for s in swapped], [s[1] for s in swapped],
                                [s[2] for s in swapped])
        assert h2 != h


@given(st.text(max_size=50))
@settings(max_examples=200, deadline=None)
def test_stable_u64_deterministic(s):
    assert stable_u64(s) == stable_u64(s)
    assert 0 <= stable_u64(s) < 2**64
