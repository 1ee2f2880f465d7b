"""Text-analysis operators over flat document tables: token counting,
global token frequency, vocabulary build, document statistics / quality
scoring, md5 fingerprinting and language identification.

These are the training-data-pipeline extensions the engine adds on top of
the reference's NER capabilities (the reference's closest analogues are
its token ``Counter`` — saber/preprocessor.py:246-249 — and vocab build —
saber/preprocessor.py:101-137 — which ``token_frequency`` / ``vocab``
generalize into distributed aggregates).

Scale notes:
* token counting is a vectorized Arrow kernel (``count_substring_regex``)
  — no Python row loop;
* global frequency pre-aggregates per batch (one partial row per distinct
  token per batch) before the ``groupby().sum()`` shuffle, so hot tokens
  ship one row per batch, not one per occurrence;
* everything streams — nothing materializes the corpus.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.arrowtypes import arrow_types

from ..constants import PAD, UNK

TOKEN_PATTERN = r"[0-9a-zA-Z]+"
_TOKEN_RE = re.compile(TOKEN_PATTERN)

# Tiny multilingual stopword profiles for the language-ID heuristic.
STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "that", "it", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "por"},
    "de": {"der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"},
    "fr": {"le", "la", "de", "et", "les", "des", "en", "un", "une", "que"},
}
_CJK = re.compile(r"[一-鿿]")
EN_STOPWORDS = STOPWORDS["en"]


# ------------------------------------------------------------- kernels ---


def sterilize_batch(batch: pa.Table, column: str = "text", out: str = "clean") -> pa.Table:
    """Vectorized sterilize (M1): trim + collapse whitespace runs."""
    clean = pc.replace_substring_regex(
        pc.utf8_trim_whitespace(batch[column]), r"\s+", " "
    )
    return batch.append_column(out, clean)


def token_count_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Append ``n_tokens`` — vectorized regex count, no row loop."""
    n = pc.count_substring_regex(batch[column], TOKEN_PATTERN)
    return batch.append_column("n_tokens", pc.cast(n, pa.int64()))


#: GPT-2-style pre-tokenizer (ASCII form, RE2-compatible on BOTH sides:
#: Arrow's count_substring_regex and DuckDB's regexp_extract_all — the
#: original pattern's `\s+(?!\S)` lookahead is dropped because RE2 has
#: no lookahead; contractions, letter runs, digit runs, punctuation
#: runs, whitespace runs)
BPE_TOKEN_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def token_count_bpe_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Append ``n_bpe_tokens`` — a training-cost estimator: counts
    GPT-2-pretokenizer segments (the unit BPE merges start from), which
    tracks real tokenizer counts far better than whitespace words on
    punctuation/number-heavy text. Vectorized regex count, no row loop."""
    n = pc.count_substring_regex(batch[column], BPE_TOKEN_PATTERN)
    return batch.append_column("n_bpe_tokens", pc.cast(n, pa.int64()))


def token_frequency_partial(batch: pa.Table, column: str = "text") -> pa.Table:
    """One (token, n) partial row per distinct token in the batch."""
    counter: Counter[str] = Counter()
    for text in batch[column].to_pylist():
        if text:
            counter.update(_TOKEN_RE.findall(text.lower()))
    toks = sorted(counter)
    return pa.table(
        {
            "token": pa.array(toks, type=pa.string()),
            "n": pa.array([counter[t] for t in toks], type=pa.int64()),
        }
    )


def doc_stats_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Per-doc quality statistics: chars, tokens, distinct tokens,
    stopword count + ratio, mean token length."""
    texts = batch[column].to_pylist()
    n_tokens, n_distinct, n_stop, tok_chars = [], [], [], []
    for text in texts:
        toks = _TOKEN_RE.findall(text.lower()) if text else []
        n_tokens.append(len(toks))
        n_distinct.append(len(set(toks)))
        n_stop.append(sum(1 for t in toks if t in EN_STOPWORDS))
        tok_chars.append(sum(len(t) for t in toks))
    # fill_null: every other stat treats a null text as an EMPTY doc
    # (0 tokens/ratios) — a null n_chars here would make filters like
    # "n_chars < 100" and "n_tokens == 0" disagree on the same rows
    out = batch.append_column(
        "n_chars",
        pc.fill_null(pc.cast(pc.utf8_length(batch[column]), pa.int64()), 0),
    )
    out = out.append_column("n_tokens", pa.array(n_tokens, type=pa.int64()))
    out = out.append_column("n_distinct", pa.array(n_distinct, type=pa.int64()))
    out = out.append_column("n_stopwords", pa.array(n_stop, type=pa.int64()))
    ratio = [s / n if n else 0.0 for s, n in zip(n_stop, n_tokens)]
    mean_len = [c / n if n else 0.0 for c, n in zip(tok_chars, n_tokens)]
    out = out.append_column("stopword_ratio", pa.array(ratio, type=pa.float64()))
    out = out.append_column("mean_token_len", pa.array(mean_len, type=pa.float64()))
    return out


def fingerprint_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Append ``fingerprint`` — md5 hex of the normalized token sequence.

    md5 (not blake2b) so a DuckDB oracle can reproduce it exactly:
    ``md5(array_to_string(regexp_extract_all(lower(text),'[0-9a-z]+'),' '))``.
    """
    fps = []
    for text in batch[column].to_pylist():
        toks = _TOKEN_RE.findall(text.lower()) if text else []
        fps.append(hashlib.md5(" ".join(toks).encode("utf-8")).hexdigest())
    return batch.append_column("fingerprint", pa.array(fps, type=pa.string()))


def lang_id_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Append ``lang_pred`` — stopword-profile + CJK heuristic language ID."""
    preds = []
    for text in batch[column].to_pylist():
        if not text:
            preds.append("und")
            continue
        if _CJK.search(text):
            preds.append("zh")
            continue
        toks = _TOKEN_RE.findall(text.lower())
        best, best_score = "und", 0
        for lang, stops in STOPWORDS.items():
            score = sum(1 for t in toks if t in stops)
            if score > best_score:
                best, best_score = lang, score
        preds.append(best)
    return batch.append_column("lang_pred", pa.array(preds, type=pa.string()))


def repetition_stats_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Append Gopher-style repetition signals (Rae et al. 2021, §A1.1):

    * ``n_lines`` / ``dup_line_frac`` — fraction of newline-split lines
      that repeat an earlier line (boilerplate / scraped-menu detector);
    * ``top_bigram_frac`` — share of all token bigrams taken by the most
      frequent one (degenerate-repetition detector).

    Newline splitting matches ``string_split(text, chr(10))`` and Python
    ``str.split('\\n')`` exactly (empty segments kept) so a DuckDB oracle
    reproduces the fractions bit-for-bit.
    """
    n_lines, dup_frac, top_bg = [], [], []
    for text in batch[column].to_pylist():
        lines = (text or "").split("\n")
        n_lines.append(len(lines))
        dup_frac.append((len(lines) - len(set(lines))) / len(lines))
        toks = _TOKEN_RE.findall(text.lower()) if text else []
        if len(toks) < 2:
            top_bg.append(0.0)
        else:
            counts = Counter(zip(toks, toks[1:]))
            top_bg.append(max(counts.values()) / (len(toks) - 1))
    out = batch.append_column("n_lines", pa.array(n_lines, type=pa.int64()))
    out = out.append_column("dup_line_frac", pa.array(dup_frac, type=pa.float64()))
    out = out.append_column("top_bigram_frac", pa.array(top_bg, type=pa.float64()))
    return out


# ---------------------------------------------------------- aggregates ---


def token_frequency(ds: rd.Dataset, column: str = "text") -> rd.Dataset:
    """Global token frequency (A1): partial per-batch counts → one shuffle."""
    partials = ds.map_batches(
        lambda b: token_frequency_partial(b, column), batch_format="pyarrow"
    )
    agg = partials.groupby("token").sum("n")
    return agg.rename_columns({"sum(n)": "n"})


def rare_tokens(ds: rd.Dataset, column: str = "text", max_count: int = 1) -> rd.Dataset:
    """Tokens occurring <= max_count times (M6: rare-token replacement set)."""
    freq = token_frequency(ds, column)
    return freq.filter(expr=f"n <= {max_count}")


def build_vocab(ds: rd.Dataset, column: str = "text") -> dict[str, int]:
    """Distinct-token vocabulary with consecutive ids, reserved specials
    first (M11: reference saber/preprocessor.py:101-137 semantics —
    <PAD>=0, <UNK>=1, then tokens). Driver-side dict, intended for
    ``ray.put`` broadcast into tagger actors."""
    tokens = sorted(t["token"] for t in token_frequency(ds, column).take_all())
    vocab = {PAD: 0, UNK: 1}
    for tok in tokens:
        vocab[tok] = len(vocab)
    return vocab


def tfidf_top_terms(
    ds: rd.Dataset,
    k: int = 5,
    column: str = "text",
    id_column: str = "doc_id",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Per-document top-``k`` TF-IDF terms: ``tf * ln(N / df)`` where
    ``tf`` is the in-document token count, ``df`` the number of docs
    containing the token and ``N`` ALL corpus rows (including empty
    docs — matching the SQL oracle's ``count(*)``).

    Distributed shape: one flat map emits the postings table — one
    (doc, token, tf) row per DISTINCT token per doc, pre-aggregated
    inside the batch so hot tokens never ship per-occurrence; document
    frequency is a token-keyed groupby over per-batch partial counts
    (Arrow ``Table.group_by``, vectorized); idf attaches with ONE hash
    join on token; the per-doc top-k reuses the two-phase grouped limit
    (``top_n_per_group``: local prune to <= k rows per doc per batch →
    tiny merge), so the final shuffle moves O(k × batches) rows, never
    the postings. The postings table is materialized once because both
    the df aggregate and the join consume it — re-deriving it would
    re-tokenize the corpus.

    Ranking uses the UNROUNDED score with token-ascending tie-breaks
    (same ORDER BY as the oracle's row_number), so engine and oracle
    select identical rows; the returned ``tfidf`` is rounded to 6
    decimals for hash-stable comparison.
    """
    import numpy as np

    from ..functions.partitioning import shuffle_partitions
    from .sampling import top_n_per_group

    n_docs = float(ds.count())
    id_type = arrow_types(ds)[id_column]

    def postings(batch: pa.Table) -> pa.Table:
        ids: list = []
        toks: list[str] = []
        tfs: list[int] = []
        for doc_id, text in zip(
            batch[id_column].to_pylist(), batch[column].to_pylist()
        ):
            if not text:
                continue
            c = Counter(_TOKEN_RE.findall(text.lower()))
            for t in sorted(c):
                ids.append(doc_id)
                toks.append(t)
                tfs.append(c[t])
        return pa.table({
            id_column: pa.array(ids, type=id_type),
            "token": pa.array(toks, type=pa.string()),
            "tf": pa.array(tfs, type=pa.int64()),
        })

    parts = num_partitions or shuffle_partitions(8, ds)
    tf = (
        ds.map_batches(postings, batch_format="pyarrow")
        .repartition(parts)
        .materialize()
    )

    def df_partial(batch: pa.Table) -> pa.Table:
        agg = batch.select(["token"]).group_by("token").aggregate([([], "count_all")])
        return agg.rename_columns(["token", "c"])

    df = (
        tf.map_batches(df_partial, batch_format="pyarrow")
        .groupby("token").sum("c")
        .rename_columns({"sum(c)": "df"})
        .repartition(max(2, parts // 2))
        .materialize()
    )

    joined = tf.join(
        df, join_type="inner", num_partitions=parts, on=("token",)
    )

    def score(batch: pa.Table) -> pa.Table:
        tfv = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = batch["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            id_column: batch[id_column],
            "token": batch["token"],
            "tfidf": pa.array(tfv * np.log(n_docs / dfv), type=pa.float64()),
        })

    scored = joined.map_batches(score, batch_format="pyarrow")
    top = top_n_per_group(
        scored, group_column=id_column, value_column="tfidf", n=k,
        id_column="token",
    )
    return top.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("tfidf"), "tfidf",
            pc.round(b["tfidf"], 6, round_mode="half_towards_infinity"),
        ),
        batch_format="pyarrow",
    )


def ngram_frequency_partial(
    batch: pa.Table, n: int = 2, column: str = "text"
) -> pa.Table:
    """One (ngram, cnt) partial row per distinct word n-gram in the
    batch — n-grams never cross document boundaries. Counter+zip runs at
    C speed per document; the partial collapses the batch to its
    distinct n-grams BEFORE anything shuffles (same discipline as
    ``token_frequency_partial``)."""
    counter: Counter[str] = Counter()
    for text in batch[column].to_pylist():
        if not text:
            continue
        toks = _TOKEN_RE.findall(text.lower())
        if len(toks) >= n:
            counter.update(
                " ".join(gram) for gram in zip(*(toks[i:] for i in range(n)))
            )
    grams = sorted(counter)
    return pa.table({
        "ngram": pa.array(grams, type=pa.string()),
        "cnt": pa.array([counter[g] for g in grams], type=pa.int64()),
    })


def ngram_frequency(
    ds: rd.Dataset, n: int = 2, column: str = "text", k: int | None = None
) -> rd.Dataset:
    """Corpus n-gram frequency: per-batch partial counts → ONE groupby
    shuffle; with ``k`` the result is the global top-k (sort+limit runs
    on the already-aggregated distinct-ngram table, ties broken
    lexicographically for determinism). The boilerplate-phrase detector
    behind corpus-level cleaning (per-doc repetition is
    ``repetition_stats_batch``)."""
    partials = ds.map_batches(
        lambda b: ngram_frequency_partial(b, n, column), batch_format="pyarrow"
    )
    agg = partials.groupby("ngram").sum("cnt").rename_columns({"sum(cnt)": "cnt"})
    if k is not None:
        agg = agg.sort(["cnt", "ngram"], descending=[True, False]).limit(k)
    return agg


def window_chunks_batch(
    batch: pa.Table,
    window: int,
    stride: int,
    id_column: str = "doc_id",
    text_column: str = "text",
) -> pa.Table:
    """Overlapping token-window chunking of one batch — the RAG /
    context-window splitter. Emits one row per window of ``window``
    tokens taken every ``stride`` tokens (single-space tokenization, so
    DuckDB's ``string_split(text, ' ')`` reproduces it exactly).

    Fully vectorized: ONE Arrow ``split_pattern`` per batch, numpy
    segment-arange to build the (overlap-inflated) gather index, one
    ``take`` + ``binary_join`` to materialize chunk text. No Python
    loop over docs or chunks — per-chunk cost is the memcpy of its
    bytes, which producing the output requires anyway.
    """
    import numpy as np

    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    ids = batch[id_column]
    split = pc.split_pattern(batch[text_column], " ")
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    doc_off = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = split.values
    lens = np.diff(doc_off)  # >= 1 per doc: ''.split(' ') == ['']
    n_chunks = -(-lens // stride)
    total = int(n_chunks.sum())
    if total == 0:
        return pa.table(
            {
                id_column: pa.array([], ids.type),
                "chunk_id": pa.array([], pa.int64()),
                "start_tok": pa.array([], pa.int64()),
                "n_tok": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
            }
        )
    doc_idx = np.repeat(np.arange(len(lens)), n_chunks)
    chunk_starts = np.concatenate(([0], np.cumsum(n_chunks)))[:-1]
    chunk_id = np.arange(total, dtype=np.int64) - np.repeat(chunk_starts, n_chunks)
    s = chunk_id * stride
    cl = np.minimum(window, lens[doc_idx] - s)
    # gather index: for chunk c, flat positions doc_off[doc]+s .. +s+cl-1
    gstart = doc_off[doc_idx] + s
    out_off = np.concatenate(([0], np.cumsum(cl)))
    idx = np.arange(out_off[-1], dtype=np.int64) - np.repeat(out_off[:-1], cl) + np.repeat(gstart, cl)
    gathered = flat.take(pa.array(idx))
    lists = pa.ListArray.from_arrays(pa.array(out_off, pa.int32()), gathered)
    chunk_text = pc.binary_join(lists, " ")
    return pa.table(
        {
            id_column: ids.take(pa.array(doc_idx)),
            "chunk_id": pa.array(chunk_id),
            "start_tok": pa.array(s.astype(np.int64)),
            "n_tok": pa.array(cl.astype(np.int64)),
            "chunk_text": chunk_text,
        }
    )


def window_chunks(
    ds: rd.Dataset,
    window: int = 32,
    stride: int = 24,
    id_column: str = "doc_id",
    text_column: str = "text",
) -> rd.Dataset:
    """Split every document into overlapping ``window``-token chunks at
    ``stride`` spacing (stride < window ⇒ overlap). Pure per-batch
    flat-map — streams, no shuffle; output rows carry (doc_id, chunk_id,
    start_tok, n_tok, chunk_text)."""
    return ds.map_batches(
        lambda b: window_chunks_batch(b, window, stride, id_column, text_column),
        batch_format="pyarrow",
    )


def grouped_token_frequency(
    ds: rd.Dataset, group_column: str, column: str = "text"
) -> rd.Dataset:
    """Exact per-group token frequency: one (group, token, n) partial
    row per distinct pair per batch (the ``token_frequency`` shape keyed
    by the group too), then ONE keyed sum — the shuffle carries
    compressed partials, never token occurrences."""

    def partial(batch: pa.Table) -> pa.Table:
        counter: Counter = Counter()
        for grp, text in zip(
            batch[group_column].to_pylist(), batch[column].to_pylist()
        ):
            # null groups are excluded: Ray's multi-key sort shuffle
            # cannot order mixed None/str keys (same rule as
            # grouped_approx_distinct) — fill_null upstream to keep them
            if text and grp is not None:
                for t in _TOKEN_RE.findall(text.lower()):
                    counter[(grp, t)] += 1
        keys = sorted(counter)
        return pa.table(
            {
                group_column: pa.array(
                    [g for g, _ in keys],
                    type=batch.schema.field(group_column).type,
                ),
                "token": pa.array([t for _, t in keys], type=pa.string()),
                "n": pa.array([counter[k] for k in keys], type=pa.int64()),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby(
        [group_column, "token"]
    ).sum("n")
    return agg.rename_columns({"sum(n)": "n"})


def grouped_hot_tokens(
    ds: rd.Dataset, group_column: str, k: int, column: str = "text"
) -> rd.Dataset:
    """Per-group heavy hitters: the k most frequent tokens per group
    (count desc, token asc on ties) — "top terms per language/domain",
    exact. Counting is ``grouped_token_frequency``; selection reuses the
    two-phase ``top_n_per_group`` (shuffle moves O(k × batches) rows)."""
    from .sampling import top_n_per_group

    freq = grouped_token_frequency(ds, group_column, column)
    return top_n_per_group(freq, group_column, "n", k, id_column="token")


def token_entropy(ds: rd.Dataset, column: str = "text") -> pa.Table:
    """Corpus-level Shannon entropy (bits) of the token unigram
    distribution, plus total/distinct token counts — the
    information-density scalar a mixture designer reads next to the
    per-source quality stats.

    H = log2(T) - (Σ c·log2 c)/T over the (token, c) frequency table,
    so the big corpus reduces to per-batch ``(Σc, Σ c·log2 c,
    #distinct)`` triples after the ONE token-count shuffle that
    ``token_frequency`` already pays; only three scalars reach the
    driver. Returns a one-row Arrow table (n_tokens, n_distinct,
    entropy) with entropy rounded to 6 decimals.
    """
    import math

    import numpy as np

    freq = token_frequency(ds, column)

    def partial(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy().astype(np.float64)
        return pa.table({
            "total": pa.array([float(n.sum())], type=pa.float64()),
            "nlogn": pa.array([float((n * np.log2(n)).sum())],
                              type=pa.float64()),
            "distinct": pa.array([batch.num_rows], type=pa.int64()),
        })

    agg = freq.map_batches(partial, batch_format="pyarrow").sum(
        ["total", "nlogn", "distinct"])
    total = float(agg["sum(total)"]) if agg else 0.0
    nlogn = float(agg["sum(nlogn)"]) if agg else 0.0
    distinct = int(agg["sum(distinct)"]) if agg else 0
    entropy = (math.log2(total) - nlogn / total) if total > 0 else None
    if entropy is not None:
        entropy = float(
            pc.round(pa.scalar(entropy), 6,
                     round_mode="half_towards_infinity").as_py())
    return pa.table({
        "n_tokens": pa.array([int(total)], type=pa.int64()),
        "n_distinct": pa.array([distinct], type=pa.int64()),
        "entropy": pa.array([entropy], type=pa.float64()),
    })


def source_distinctive_terms(
    ds: rd.Dataset, group_column: str = "source", k: int = 10,
    column: str = "text",
) -> rd.Dataset:
    """Per-group distinctive vocabulary: the k tokens with the highest
    smoothed log-odds ratio of appearing in the group vs the REST of
    the corpus (Monroe et al.'s "Fightin' Words" statistic with +0.5
    smoothing) — the "what makes this source's language different"
    report a mixture designer reads before weighting sources.

    score(g, w) = ln((a+½)/(A−a+½)) − ln((b+½)/(B−b+½)) with
    a = count of w in g, A = tokens in g, b/B the same outside g.

    Shape: ONE (group, token) keyed sum (compressed per-batch partials,
    ``grouped_token_frequency`` — null groups are EXCLUDED, like every
    grouped token statistic here), one vocab-keyed sum for the token
    totals, ONE hash join to attach them, per-group totals broadcast as
    a closure (#groups rows, small by contract), and the two-phase
    grouped top-k. Returns (group, token, score) with score rounded to
    6 decimals.
    """
    import numpy as np

    from .sampling import top_n_per_group

    cnt = grouped_token_frequency(ds, group_column, column)
    cnt = cnt.repartition(8).materialize()

    stot_rows = cnt.groupby(group_column).sum("n").take_all()
    a_tot = {r[group_column]: float(r["sum(n)"]) for r in stot_rows}
    g_tot = sum(a_tot.values())

    ttot = (
        cnt.groupby("token").sum("n")
        .rename_columns({"sum(n)": "t_total"})
        .repartition(8).materialize()
    )

    joined = cnt.join(ttot, join_type="inner", num_partitions=8,
                      on=("token",))

    def score(batch: pa.Table) -> pa.Table:
        a = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        t = batch["t_total"].to_numpy(zero_copy_only=False).astype(np.float64)
        groups = batch[group_column].to_pylist()
        big_a = np.array([a_tot[g] for g in groups])
        b = t - a
        big_b = g_tot - big_a
        s = (np.log((a + 0.5) / (big_a - a + 0.5))
             - np.log((b + 0.5) / (big_b - b + 0.5)))
        return pa.table({
            group_column: batch[group_column],
            "token": batch["token"],
            "score": pa.array(s, type=pa.float64()),
        })

    scored = joined.map_batches(score, batch_format="pyarrow")
    top = top_n_per_group(scored, group_column, "score", k,
                          id_column="token")
    return top.map_batches(
        lambda b: pa.table({
            group_column: b[group_column],
            "token": b["token"],
            "score": pc.round(b["score"], 6,
                              round_mode="half_towards_infinity"),
        }),
        batch_format="pyarrow",
    )


def corpus_card(
    docs: rd.Dataset,
    text_column: str = "text",
    chars_column: str = "n_chars",
    facet_columns: tuple[str, ...] = ("source", "lang"),
) -> rd.Dataset:
    """One-row dataset card: corpus size, facet cardinalities, and
    token volume — the summary stamped next to an exported training
    set. Returns (n_docs, n_<facet>s..., total_chars, avg_chars,
    total_tokens).

    Scale shape: each batch folds to ONE partial row (counts, sums,
    and the batch's DISTINCT facet values — facets like source/lang
    are low-cardinality by contract); one constant-key reduce merges
    #batches partial rows. Token counting is the vectorized Arrow
    regex-count kernel, not a Python loop; the text column never
    leaves the map stage.
    """
    import numpy as np  # noqa: F401

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.count_substring_regex(
            pc.fill_null(batch[text_column], ""), TOKEN_PATTERN)
        cols: dict = {
            "__k": pa.array([0], type=pa.int64()),
            "n_docs": pa.array([len(batch)], type=pa.int64()),
            "total_chars": pa.array(
                [pc.sum(batch[chars_column]).as_py() or 0], type=pa.int64()),
            "total_tokens": pa.array(
                [pc.sum(toks).as_py() or 0], type=pa.int64()),
        }
        for f in facet_columns:
            vals = pc.drop_null(pc.unique(batch[f]))
            cols[f"__{f}_set"] = pa.array(
                [vals.to_pylist()], type=pa.list_(pa.string()))
        return pa.table(cols)

    def combine(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        n_docs = int(df["n_docs"].sum())
        total_chars = int(df["total_chars"].sum())
        out = {"n_docs": pd.array([n_docs], dtype="int64")}
        for f in facet_columns:
            uniq = set()
            for lst in df[f"__{f}_set"]:
                uniq.update(lst)
            out[f"n_{f}s"] = pd.array([len(uniq)], dtype="int64")
        out["total_chars"] = pd.array([total_chars], dtype="int64")
        # half-away-from-zero like the DuckDB oracle's round(x, 6) —
        # Python round() is decimal half-even and can differ on the
        # boundary
        avg = (pc.round(pa.array([total_chars / n_docs]), 6,
                        round_mode="half_towards_infinity")[0].as_py()
               if n_docs else 0.0)
        out["avg_chars"] = [avg]
        out["total_tokens"] = pd.array(
            [int(df["total_tokens"].sum())], dtype="int64")
        return pd.DataFrame(out)

    import pandas as pd  # noqa: F401  (map_groups pandas format)

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("__k")
        .map_groups(combine, batch_format="pandas")
    )


def inverted_postings(
    docs: rd.Dataset,
    head_k: int = 8,
    id_column: str = "doc_id",
    text_column: str = "text",
    num_buckets: int = 16,
) -> rd.Dataset:
    """Distributed inverted-index build: per token, its document
    frequency and the first ``head_k`` posting doc ids (ascending,
    comma-joined) — the retrieval-side structure a corpus engine
    materializes next to the forward table. Returns
    (token, df, postings_head).

    Scale shape: each batch emits DISTINCT (token, doc) pairs — the
    pairs ARE the index payload, so the one keyed shuffle is inherent
    (the ``shuffle_export`` argument); tokens are hash-bucketed (the
    bucket rule: keys never become Ray-level groups) and each bucket
    reduces df with one C-level pandas groupby. Head-string assembly is
    one Python join per OUTPUT row — work proportional to the index
    being built, not to the corpus. At 100 TB the full posting lists
    would land as list<int64> parquet partitioned by token hash;
    ``head_k`` doubles as the hot-stopword cap.
    """
    import numpy as np
    import pandas as pd  # noqa: F401

    from ..functions.hashing import stable_u64

    def pairs(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        ids: list = []
        for did, text in zip(batch[id_column].to_pylist(),
                             batch[text_column].to_pylist()):
            if not text:
                continue
            for t in set(_TOKEN_RE.findall(text.lower())):
                toks.append(t)
                ids.append(did)
        arr = np.array(toks, dtype=object)
        uniq, inverse = (np.unique(arr, return_inverse=True)
                         if len(arr) else (arr, arr.astype(np.int64)))
        bh = np.array([stable_u64(t) % num_buckets for t in uniq],
                      dtype=np.int32)
        return pa.table({
            "token": pa.array(toks, type=pa.string()),
            id_column: pa.array(ids,
                                type=batch.schema.field(id_column).type),
            "__bucket": pa.array(bh[inverse] if len(arr) else [],
                                 type=pa.int32()),
        })

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["token", id_column]).drop(columns="__bucket")
        grp = df.groupby("token", sort=True)
        sizes = grp[id_column].size()
        head = (
            df[grp.cumcount() < head_k]
            .groupby("token", sort=True)[id_column]
            .agg(lambda s: ",".join(str(v) for v in s))
        )
        return pd.DataFrame({
            "token": sizes.index,
            "df": pd.array(sizes.to_numpy(), dtype="int64"),
            "postings_head": head.reindex(sizes.index).to_numpy(),
        })

    return (
        docs.select_columns([id_column, text_column])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def source_vocab_overlap(
    docs: rd.Dataset,
    group_column: str = "source",
    text_column: str = "text",
    num_buckets: int = 16,
) -> rd.Dataset:
    """Pairwise vocabulary Jaccard between sources: for every source
    pair (a < b), how many distinct tokens they share and the Jaccard
    of their vocabularies — the corpus-composition diagnostic next to
    ``source_distinctive_terms`` (that one ranks WHAT differs; this one
    measures HOW MUCH overlaps).

    Returns (source_a, source_b, common, jaccard), jaccard rounded to 6
    decimals (half-away-from-zero, matching the SQL oracle).

    Scale shape: batches emit distinct (source, token) pairs, ONE dedup
    shuffle compresses to the global source-vocab incidence (≤ sources
    × vocab rows); per-source vocab sizes are a #sources-row aggregate
    broadcast into the finish map, and the pair expansion self-merges
    token hash-buckets vectorized (blowup bounded by sources² per
    token). Output is #source-pairs rows.
    """
    import numpy as np
    import pandas as pd  # noqa: F401

    import ray

    from ..functions.hashing import stable_u64

    def pairs(batch: pa.Table) -> pa.Table:
        srcs: list = []
        toks: list[str] = []
        for src, text in zip(batch[group_column].to_pylist(),
                             batch[text_column].to_pylist()):
            if not text or src is None:
                continue
            for t in set(_TOKEN_RE.findall(text.lower())):
                srcs.append(src)
                toks.append(t)
        return pa.table({
            group_column: pa.array(
                srcs, type=batch.schema.field(group_column).type),
            "token": pa.array(toks, type=pa.string()),
        })

    incidence = (
        docs.select_columns([group_column, text_column])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby([group_column, "token"]).count()
        .drop_columns(["count()"])
        .materialize()  # consumed twice: sizes + pair expansion
    )

    sizes = {r[group_column]: r["count()"] for r in
             incidence.groupby(group_column).count().take_all()}
    sizes_ref = ray.put(sizes)

    def bucket(batch: pa.Table) -> pa.Table:
        toks = batch["token"].to_pylist()
        uniq = {t: stable_u64(t) % num_buckets for t in set(toks)}
        return batch.append_column(
            "__bucket", pa.array([uniq[t] for t in toks],
                                 type=pa.int32()))

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.drop(columns="__bucket")
        m = df.merge(df, on="token")
        a, b = f"{group_column}_x", f"{group_column}_y"
        m = m[m[a] < m[b]]
        out = m.groupby([a, b], sort=True).size().rename("common")
        out = out.reset_index()
        out.columns = ["source_a", "source_b", "common"]
        out["common"] = out["common"].astype("int64")
        return out

    def finish(batch: pa.Table, _ref=sizes_ref) -> pa.Table:
        sz = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
        a = batch["source_a"].to_pylist()
        b = batch["source_b"].to_pylist()
        c = batch["common"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        denom = np.array([sz[x] + sz[y] for x, y in zip(a, b)],
                         dtype=np.float64) - c
        return pa.table({
            "source_a": batch["source_a"],
            "source_b": batch["source_b"],
            "common": batch["common"],
            "jaccard": pc.round(
                pa.array(c / denom, type=pa.float64()), 6,
                round_mode="half_towards_infinity"),
        })

    return (
        incidence.map_batches(bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["source_a", "source_b"]).sum("common")
        .map_batches(
            lambda b: pa.table({
                "source_a": b["source_a"], "source_b": b["source_b"],
                "common": pc.cast(b["sum(common)"], pa.int64()),
            }),
            batch_format="pyarrow")
        .map_batches(finish, batch_format="pyarrow")
    )


def zipf_fit(ds: rd.Dataset, column: str = "text") -> rd.Dataset:
    """Zipf's-law fit over the corpus token distribution: OLS of
    ``ln(freq)`` on ``ln(rank)`` (rank 1 = most frequent; ties broken
    by token so the rank order is total and deterministic). A healthy
    natural-language corpus shows slope ≈ -1; a synthetic / templated /
    boilerplate-heavy corpus deviates sharply, so the single output row
    (slope, intercept, r2, n_types) is a standing data-quality
    diagnostic for a training-data pipeline (corpus-card material,
    alongside ``token_entropy`` / ``corpus_card``).

    Scale shape: the distributed ``token_frequency`` aggregate (partials
    → one shuffle), `global_rank`'s histogram-bucket ranking over JUST
    the (n, token) columns (vocab-sized, Zipf-bounded — never the
    corpus), then fixed-size per-batch moment partials (6 numbers each)
    folded on the driver. Values rounded to 6 decimals (DuckDB
    ``regr_slope``/``regr_intercept``/``regr_r2`` parity).
    """
    import math

    import numpy as np

    from .ordering import global_rank

    # materialize: global_rank consumes its input THREE times (min/max
    # stats, histogram, keyed shuffle) and Ray re-executes derived
    # lineage per consumer — without this the token_frequency aggregate
    # (the expensive corpus pass) runs 3x. The table is vocab-sized.
    freq = token_frequency(ds, column=column).materialize()
    ranked = global_rank(freq, "n", id_column="token", descending=True,
                         out_column="pos")

    def moments(batch: pa.Table) -> pa.Table:
        y = np.log(batch["n"].to_numpy(zero_copy_only=False).astype(np.float64))
        x = np.log(batch["pos"].to_numpy(zero_copy_only=False).astype(np.float64)
                   + 1.0)
        return pa.table({
            "k": pa.array([float(len(x))]),
            "sx": pa.array([float(x.sum())]),
            "sy": pa.array([float(y.sum())]),
            "sxx": pa.array([float((x * x).sum())]),
            "sxy": pa.array([float((x * y).sum())]),
            "syy": pa.array([float((y * y).sum())]),
        })

    k = sx = sy = sxx = sxy = syy = 0.0
    for r in ranked.map_batches(moments, batch_format="pyarrow").take_all():
        k += r["k"]; sx += r["sx"]; sy += r["sy"]
        sxx += r["sxx"]; sxy += r["sxy"]; syy += r["syy"]
    if k < 2:
        raise ValueError("zipf_fit needs at least 2 distinct tokens")
    vx = sxx - sx * sx / k
    vy = syy - sy * sy / k
    cov = sxy - sx * sy / k
    slope = cov / vx if vx else float("nan")
    intercept = (sy - slope * sx) / k
    r2 = (cov * cov) / (vx * vy) if vx and vy else 1.0
    return rd.from_arrow(pa.table({
        "slope": pa.array([round(slope, 6)], type=pa.float64()),
        "intercept": pa.array([round(intercept, 6)], type=pa.float64()),
        "r2": pa.array([round(r2, 6)], type=pa.float64()),
        "n_types": pa.array([int(k)], type=pa.int64()),
    }))


def grouped_zipf_fit(
    ds: rd.Dataset, group_column: str, column: str = "text"
) -> rd.Dataset:
    """Per-group Zipf's-law fit — ``zipf_fit`` keyed by source/lang/
    domain, the corpus-card diagnostic that localizes WHICH slice of a
    mixture is templated or boilerplate-heavy (a healthy slice shows
    slope ≈ -1; a templated one deviates sharply).

    Fully distributed: the exact per-group frequency aggregate
    (compressed partials, one shuffle), per-group frequency RANK via
    ``rank_within``'s bucket shape (SQL ``RANK()`` min-rank ties — the
    oracle uses the same window function), per-batch ln-ln moment
    partials reduced by ONE ``groupby(group).sum``, then a vectorized
    finalize over the #groups-row aggregate. Groups whose tokens all
    tie on frequency have zero rank variance (no line to fit; SQL
    ``regr_slope`` is NULL there) and are dropped on both sides.
    Returns (group, slope, intercept, r2, n_types), rounded to 6.
    """
    import numpy as np

    from .relational import rank_within

    freq = grouped_token_frequency(ds, group_column, column)
    ranked = rank_within(freq, by=group_column, value_column="n",
                         id_column="token", ascending=False)

    def moments(batch: pa.Table) -> pa.Table:
        y = np.log(batch["n"].to_numpy(zero_copy_only=False)
                   .astype(np.float64))
        x = np.log(batch["rnk"].to_numpy(zero_copy_only=False)
                   .astype(np.float64))
        t = pa.table({
            group_column: batch[group_column],
            "k": pa.array(np.ones(len(x))),
            "sx": pa.array(x), "sy": pa.array(y),
            "sxx": pa.array(x * x), "sxy": pa.array(x * y),
            "syy": pa.array(y * y),
        })
        agg = t.group_by(group_column).aggregate(
            [(c, "sum") for c in ("k", "sx", "sy", "sxx", "sxy", "syy")]
        )
        return agg.rename_columns(
            [group_column, "k", "sx", "sy", "sxx", "sxy", "syy"]
        )

    agg = (
        ranked.map_batches(moments, batch_format="pyarrow")
        .groupby(group_column)
        .sum(["k", "sx", "sy", "sxx", "sxy", "syy"])
    )

    def finalize(batch: pa.Table) -> pa.Table:
        k = batch["sum(k)"].to_numpy(zero_copy_only=False)
        sx = batch["sum(sx)"].to_numpy(zero_copy_only=False)
        sy = batch["sum(sy)"].to_numpy(zero_copy_only=False)
        sxx = batch["sum(sxx)"].to_numpy(zero_copy_only=False)
        sxy = batch["sum(sxy)"].to_numpy(zero_copy_only=False)
        syy = batch["sum(syy)"].to_numpy(zero_copy_only=False)
        vx = sxx - sx * sx / k
        vy = syy - sy * sy / k
        cov = sxy - sx * sy / k
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = cov / vx
            intercept = (sy - slope * sx) / k
            r2 = (cov * cov) / (vx * vy)
        keep = vx > 0
        return pa.table({
            group_column: batch[group_column].filter(pa.array(keep)),
            "slope": pa.array(np.round(slope[keep], 6)),
            "intercept": pa.array(np.round(intercept[keep], 6)),
            "r2": pa.array(np.round(r2[keep], 6)),
            "n_types": pa.array(k[keep].astype(np.int64)),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")
