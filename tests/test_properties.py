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


# ---- edit-distance near-dup pure kernels (stages/dedup.py) ----

_word_st = st.text(alphabet="abcx ", min_size=0, max_size=12)


@given(_word_st, _word_st, st.integers(min_value=1, max_value=3))
@settings(max_examples=300, deadline=None)
def test_lev_banded_triangle_and_symmetry(a, b, k):
    from saber_ray.stages.dedup import _lev_banded

    d_ab = _lev_banded(a, b, k)
    d_ba = _lev_banded(b, a, k)
    assert d_ab == d_ba                       # symmetry
    assert 0 <= d_ab <= k + 1
    if a == b:
        assert d_ab == 0
    if d_ab == 0:
        assert a == b                          # identity of indiscernibles


@given(_word_st, _word_st)
@settings(max_examples=200, deadline=None)
def test_deletion_neighborhood_complete(a, b):
    """The SymSpell pigeonhole: lev(a,b) <= 2 implies a shared
    <=2-deletion variant hash (the blocking can never miss a pair)."""
    import pyarrow as pa

    from saber_ray.stages.dedup import _lev_banded, _variant_rows

    if not a or not b:
        return
    tbl = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array([a, b], type=pa.string()),
    })
    rows = _variant_rows(tbl, "text", "doc_id", 2, 24)
    ids = rows["doc_id"].to_pylist()
    vhs = rows["vh"].to_pylist()
    va = {h for h, i in zip(vhs, ids) if i == 0}
    vb = {h for h, i in zip(vhs, ids) if i == 1}
    # keys are normalized first — compare on the normalized forms
    from saber_ray.stages.dedup import normalized_prefix

    na = normalized_prefix(pa.array([a]), 24)[0].as_py()
    nb = normalized_prefix(pa.array([b]), 24)[0].as_py()
    if na and nb and _lev_banded(na, nb, 2) <= 2:
        assert va & vb, (a, b, na, nb)


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_subnormal=False),
                min_size=1, max_size=40),
       st.sampled_from([0.125, 0.25, 0.5, 0.75]))
@settings(max_examples=150, deadline=None)
def test_ewma_fold_bounds(values, alpha):
    """The pandas ewm(adjust=False) kernel — the exact cython scan
    ewma_by_key runs per bucket — must equal the recursive definition
    bit-for-bit on arbitrary series, stay within [min, max], and treat
    a constant series as a fixed point."""
    import pandas as pd

    acc = None
    for v in values:
        acc = v if acc is None else acc * (1 - alpha) + v * alpha
    kernel = float(
        pd.Series(values).ewm(alpha=alpha, adjust=False).mean().iloc[-1])
    assert kernel == acc  # bit-identical to the definitional fold
    assert min(values) - 1e-6 <= kernel <= max(values) + 1e-6
    const = pd.Series([values[0]] * len(values))
    assert float(
        const.ewm(alpha=alpha, adjust=False).mean().iloc[-1]) == values[0]
