"""Training-data quality / safety operators: PII detection + redaction,
unigram-LM document scoring, and chunk-level (sub-document) exact dedup.

These extend the corpus-hygiene family (``stages/dedup.py``,
``stages/textstats.py``, ``stages/decontam.py``) with three operators a
production LLM-data pipeline runs before packing:

* **PII redaction** — emails / IPv4s / SSN-shaped ids are counted and
  replaced in one vectorized RE2 pass per pattern (Arrow
  ``count_substring_regex`` / ``replace_substring_regex``; both Arrow and
  DuckDB use RE2, so the oracle reproduces matches exactly);
* **unigram-LM scoring** — a corpus-level unigram language model (one
  ``token_frequency`` shuffle, result broadcast once via ``ray.put``)
  scores every document by mean log2 token probability: the classic
  cheap quality / outlier signal (degenerate and boilerplate docs score
  far from the corpus mode);
* **chunk-level exact dedup** — documents are split into fixed-size
  token chunks and duplicate CHUNKS are found corpus-wide (the
  sub-document analogue of ``dedup_exact``: catches boilerplate
  paragraphs repeated across otherwise-distinct documents). One keyed
  shuffle; the survivor (lexicographically-first (doc_id, chunk_idx))
  is computed with NATIVE Min/Sum aggregates over a zero-padded sort key
  — no per-group Python.

Scale notes: every map is per-batch (no per-row Python in the Arrow
kernels; tokenization is the same compiled-regex-per-row pattern as
``token_frequency_partial``); the LM table is a compressed aggregate
(distinct tokens, not occurrences) and ships to actors once; chunk dedup
pre-aggregates per batch before its single shuffle.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .textstats import TOKEN_PATTERN, token_frequency

_TOKEN_RE = re.compile(TOKEN_PATTERN)

# RE2-compatible on BOTH sides (Arrow kernels and DuckDB regexp_*):
# no lookaround, no backreferences.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
SSN_PATTERN = r"\b\d{3}-\d{2}-\d{4}\b"

#: (pattern, replacement, count-column) — applied IN ORDER, each pattern
#: counted on the text as left by the previous redaction (emails are
#: redacted before the IP scan so a dotted-quad inside an email domain,
#: e.g. ``user@1.2.3.4.example.com``, is one email, not an email plus
#: an IP). The oracle applies the same chain.
PII_RULES = [
    (EMAIL_PATTERN, "<EMAIL>", "n_emails"),
    (IPV4_PATTERN, "<IP>", "n_ips"),
    (SSN_PATTERN, "<SSN>", "n_ssns"),
]


def pii_redact_batch(batch: pa.Table, column: str = "text",
                     out: str = "redacted") -> pa.Table:
    """Append per-pattern PII counts and a fully-redacted text column.

    Pure vectorized Arrow: one ``count_substring_regex`` + one
    ``replace_substring_regex`` per rule — no Python row loop. Null
    texts yield null counts/redaction (callers treat null as "no text",
    same as every other kernel here).
    """
    cur = batch[column]
    for pattern, repl, count_col in PII_RULES:
        n = pc.cast(pc.count_substring_regex(cur, pattern), pa.int64())
        batch = batch.append_column(count_col, n)
        cur = pc.replace_substring_regex(cur, pattern, repl)
    return batch.append_column(out, cur)


# ---------------------------------------------------------- unigram LM ---


def unigram_model(ds: rd.Dataset, column: str = "text"):
    """Train the corpus unigram LM: ONE partial-aggregated shuffle
    (``token_frequency``), result pulled as a compressed aggregate
    (one row per DISTINCT token — vocab-sized, not corpus-sized) and
    returned as (sorted token array, counts, total) ready for
    ``ray.put`` broadcast."""
    rows = token_frequency(ds, column).take_all()
    toks = np.array(sorted(r["token"] for r in rows), dtype=object)
    by_tok = {r["token"]: r["n"] for r in rows}
    counts = np.array([by_tok[t] for t in toks], dtype=np.float64)
    return toks, counts, float(counts.sum())


class UnigramScorer:
    """Actor-pool stage: append ``n_tokens`` + ``logprob`` (mean log2
    unigram probability per token) to each document.

    The model (sorted vocab + counts) is fetched from the object store
    ONCE per actor in ``__init__``; per batch, every token in the batch
    is resolved with ONE vectorized ``searchsorted`` and per-document
    means are one ``reduceat`` segment sum. Tokens outside the model
    vocabulary (scoring a corpus the LM wasn't trained on) back off to
    an add-one floor of ``1 / (total + 1)``."""

    def __init__(self, model_ref, column: str = "text"):
        toks, counts, total = ray.get(model_ref)
        self._toks = toks
        self._logp = np.log2(counts / total)
        self._floor = float(np.log2(1.0 / (total + 1.0)))
        self._column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_tokens = [
            _TOKEN_RE.findall(t.lower()) if t else []
            for t in batch[self._column].to_pylist()
        ]
        lengths = np.array([len(t) for t in doc_tokens], dtype=np.int64)
        flat = np.array([t for ts in doc_tokens for t in ts], dtype=object)
        if len(flat):
            idx = np.searchsorted(self._toks, flat)
            idx_c = np.clip(idx, 0, len(self._toks) - 1)
            hit = self._toks[idx_c] == flat
            lps = np.where(hit, self._logp[idx_c], self._floor)
        else:
            lps = np.empty(0, dtype=np.float64)
        offsets = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        valid = lengths > 0
        sums = np.zeros(len(lengths), dtype=np.float64)
        if valid.any():
            sums[valid] = np.add.reduceat(lps, offsets[valid])
        means = np.divide(sums, lengths, out=np.zeros_like(sums),
                          where=valid)
        out = batch.append_column("n_tokens", pa.array(lengths, type=pa.int64()))
        # 0-token docs get NULL (SQL's avg over an empty group), not 0.0
        return out.append_column(
            "logprob", pa.array(means, type=pa.float64(), mask=~valid)
        )


def unigram_logprob(ds: rd.Dataset, column: str = "text",
                    concurrency: int | None = None) -> rd.Dataset:
    """Score every document with the corpus's own unigram LM.

    Two passes over the corpus (train shuffle + score map) — the model
    is broadcast once via ``ray.put``, never re-shipped per batch."""
    from ..functions.partitioning import pinned_pool

    model_ref = ray.put(unigram_model(ds, column))
    return ds.map_batches(
        UnigramScorer,
        fn_constructor_kwargs={"model_ref": model_ref, "column": column},
        batch_format="pyarrow",
        concurrency=concurrency or pinned_pool(8),
    )


# --------------------------------------------------------- chunk dedup ---


def chunk_partial(batch: pa.Table, id_column: str = "doc_id",
                  column: str = "text", chunk_tokens: int = 10) -> pa.Table:
    """Per-batch partial for chunk-level dedup: one row per DISTINCT
    chunk fingerprint in the batch, carrying the batch-local
    lexicographically-first (doc_id, chunk_idx) as a zero-padded sort
    key plus the batch-local occurrence count.

    Chunks are non-overlapping ``chunk_tokens``-token windows of the
    lowercased token stream (trailing partial window kept) — the C4 /
    RefinedWeb-style sub-document unit. Fingerprints are md5 of the
    space-joined chunk so a DuckDB oracle reproduces them.

    The sort key zero-pads doc_id and chunk_idx to fixed width, so
    STRING min == lexicographic (doc_id, idx) min. Requires
    non-negative integer doc ids (asserted)."""
    first: dict[str, str] = {}
    counts: dict[str, int] = {}
    for doc_id, text in zip(batch[id_column].to_pylist(),
                            batch[column].to_pylist()):
        if doc_id is None:
            continue
        if int(doc_id) < 0:
            # the zero-padded survivor key is lexicographic; a negative
            # id would sort inverted and before every positive id
            raise ValueError("chunk_dedup requires non-negative doc ids")
        toks = _TOKEN_RE.findall(text.lower()) if text else []
        for ci, start in enumerate(range(0, len(toks), chunk_tokens)):
            chunk = " ".join(toks[start:start + chunk_tokens])
            h = hashlib.md5(chunk.encode("utf-8")).hexdigest()
            key = f"{int(doc_id):020d}|{ci:010d}"
            prev = first.get(h)
            if prev is None or key < prev:
                first[h] = key
            counts[h] = counts.get(h, 0) + 1
    hashes = sorted(first)
    return pa.table({
        "chunk_hash": pa.array(hashes, type=pa.string()),
        "first_key": pa.array([first[h] for h in hashes], type=pa.string()),
        "n": pa.array([counts[h] for h in hashes], type=pa.int64()),
    })


def chunk_dedup(ds: rd.Dataset, id_column: str = "doc_id",
                column: str = "text", chunk_tokens: int = 10) -> rd.Dataset:
    """Corpus-wide duplicate-chunk table: (chunk_hash, first_doc_id,
    first_idx, n_dups), survivor = lexicographically-first
    (doc_id, chunk_idx) occurrence.

    Shape: per-batch partials (one row per distinct chunk per batch)
    → ONE ``groupby(chunk_hash)`` with NATIVE ``Min``/``Sum`` aggregates
    (the packed sort key makes min-by-pair a plain string min) → tiny
    decode map. No per-group Python; hot chunks (corpus-wide
    boilerplate) ship one row per batch, not one per occurrence."""
    from ray.data.aggregate import Min, Sum

    partials = ds.map_batches(
        lambda b: chunk_partial(b, id_column, column, chunk_tokens),
        batch_format="pyarrow",
    )
    agg = partials.groupby("chunk_hash").aggregate(
        Min("first_key", alias_name="first_key"),
        Sum("n", alias_name="n_dups"),
    )

    def decode(batch: pa.Table) -> pa.Table:
        keys = batch["first_key"]
        doc = pc.cast(pc.utf8_slice_codeunits(keys, 0, 20), pa.int64())
        idx = pc.cast(pc.utf8_slice_codeunits(keys, 21, 31), pa.int64())
        return pa.table({
            "chunk_hash": batch["chunk_hash"],
            "first_doc_id": doc,
            "first_idx": idx,
            "n_dups": pc.cast(batch["n_dups"], pa.int64()),
        })

    return agg.map_batches(decode, batch_format="pyarrow")


def quality_filter_batch(
    batch: pa.Table,
    column: str = "text",
    id_column: str = "doc_id",
    min_tokens: int = 10,
    min_stopword_ratio: float = 0.05,
    min_mean_token_len: float = 2.0,
    max_mean_token_len: float = 10.0,
    max_dup_line_frac: float = 0.30,
    max_top_bigram_frac: float = 0.20,
) -> pa.Table:
    """Composite C4/Gopher-style quality gate (Raffel et al. 2020 §2.2,
    Rae et al. 2021 §A1.1): one pass computes the per-doc stats
    (``doc_stats_batch`` + ``repetition_stats_batch`` kernels) and
    applies the rule set, emitting (id, keep, reasons) where ``reasons``
    is the comma-joined list of violated rules in a FIXED order — so the
    verdict is auditable, deterministic, and SQL-reproducible.

    Rules: too_few_tokens, low_stopword (non-prose), short_tokens /
    long_tokens (mean token length outside [min, max] — gibberish /
    concatenated-junk detectors), dup_lines (boilerplate), repetitive
    (degenerate top-bigram share). Every stat is the same IEEE-double
    arithmetic as its already-value-oracled stat query, so threshold
    comparisons agree bitwise with the DuckDB oracle.
    """
    from .textstats import doc_stats_batch, repetition_stats_batch

    stats = repetition_stats_batch(
        doc_stats_batch(batch.select([id_column, column]), column), column
    )
    n_tok = stats["n_tokens"].to_numpy(zero_copy_only=False)
    checks = [
        ("too_few_tokens", n_tok < min_tokens),
        ("low_stopword",
         stats["stopword_ratio"].to_numpy(zero_copy_only=False)
         < min_stopword_ratio),
        ("short_tokens",
         stats["mean_token_len"].to_numpy(zero_copy_only=False)
         < min_mean_token_len),
        ("long_tokens",
         stats["mean_token_len"].to_numpy(zero_copy_only=False)
         > max_mean_token_len),
        ("dup_lines",
         stats["dup_line_frac"].to_numpy(zero_copy_only=False)
         > max_dup_line_frac),
        ("repetitive",
         stats["top_bigram_frac"].to_numpy(zero_copy_only=False)
         > max_top_bigram_frac),
    ]
    keep = np.ones(batch.num_rows, dtype=bool)
    reasons = [[] for _ in range(batch.num_rows)]
    for name, bad in checks:
        keep &= ~bad
        for i in np.flatnonzero(bad):
            reasons[i].append(name)
    return pa.table(
        {
            id_column: batch[id_column],
            "keep": pa.array(keep),
            "reasons": pa.array(
                [",".join(r) for r in reasons], type=pa.string()
            ),
        }
    )


def bigram_model(ds: rd.Dataset, column: str = "text", top_m: int = 5000):
    """Build the interpolated-bigram LM tables: the full unigram table
    (one ``token_frequency`` shuffle — vocab-sized, the same broadcast
    bound ``unigram_logprob`` already accepts) plus the bigram table
    PRUNED to the ``top_m`` most frequent bigrams (count desc, gram asc
    ties) — the pruning is what keeps the broadcast bounded at corpus
    scale, where the full bigram vocabulary is orders of magnitude
    larger than the unigram one. Returns a ``ray.put`` handle."""
    from .textstats import ngram_frequency

    uni = token_frequency(ds, column).take_all()
    toks = np.array(sorted(r["token"] for r in uni), dtype=object)
    by_tok = {r["token"]: r["n"] for r in uni}
    counts = np.array([by_tok[t] for t in toks.tolist()], dtype=np.float64)
    total = float(counts.sum())

    bi = ngram_frequency(ds, n=2, column=column, k=top_m).take_all()
    grams = np.array(sorted(r["ngram"] for r in bi), dtype=object)
    by_gram = {r["ngram"]: r["cnt"] for r in bi}
    gcounts = np.array([by_gram[g] for g in grams.tolist()], dtype=np.float64)
    return ray.put((toks, counts, total, grams, gcounts))


class BigramScorer:
    """Actor-pool stage: append ``bigram_logprob`` — mean log2 of the
    interpolated transition probability
    ``lam * count(w1 w2)/count(w1) + (1-lam) * count(w2)/total``
    over every adjacent token pair (documents with < 2 tokens get NULL).
    Pruned-away bigrams contribute 0 to the first term (backoff to the
    unigram term keeps the log finite). Model fetched once per actor;
    per batch, transitions resolve with two vectorized ``searchsorted``
    calls and per-doc means are one ``reduceat``."""

    def __init__(self, model_ref, lam: float = 0.75, column: str = "text"):
        toks, counts, total, grams, gcounts = ray.get(model_ref)
        self._toks, self._counts, self._total = toks, counts, total
        self._grams, self._gcounts = grams, gcounts
        self._lam = lam
        self._column = column

    def _lookup(self, keys: np.ndarray, table: np.ndarray,
                values: np.ndarray, default: float) -> np.ndarray:
        if len(keys) == 0:
            return np.empty(0, dtype=np.float64)
        idx = np.searchsorted(table, keys)
        idx_c = np.clip(idx, 0, len(table) - 1)
        hit = table[idx_c] == keys if len(table) else np.zeros(len(keys), bool)
        return np.where(hit, values[idx_c] if len(table) else default, default)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_tokens = [
            _TOKEN_RE.findall(t.lower()) if t else []
            for t in batch[self._column].to_pylist()
        ]
        n_trans = np.array([max(0, len(t) - 1) for t in doc_tokens],
                           dtype=np.int64)
        w1 = np.array([w for ts in doc_tokens for w in ts[:-1]], dtype=object)
        w2 = np.array([w for ts in doc_tokens for w in ts[1:]], dtype=object)
        if len(w1):
            pair = np.array([f"{a} {b}" for a, b in zip(w1, w2)], dtype=object)
            bi_cnt = self._lookup(pair, self._grams, self._gcounts, 0.0)
            u1 = self._lookup(w1, self._toks, self._counts, self._total + 1.0)
            # out-of-vocab w2 (cross-corpus scoring) backs off to the
            # same add-one floor as UnigramScorer — a raw 0 would make
            # the interpolated p zero and the log -inf
            u2 = self._lookup(w2, self._toks, self._counts, -1.0)
            p_uni = np.where(
                u2 >= 0, u2 / self._total, 1.0 / (self._total + 1.0)
            )
            p = self._lam * (bi_cnt / u1) + (1.0 - self._lam) * p_uni
            lps = np.log2(p)
        else:
            lps = np.empty(0, dtype=np.float64)
        offsets = np.concatenate(([0], np.cumsum(n_trans)[:-1]))
        valid = n_trans > 0
        sums = np.zeros(len(n_trans), dtype=np.float64)
        if valid.any():
            sums[valid] = np.add.reduceat(lps, offsets[valid])
        means = np.divide(sums, n_trans, out=np.zeros_like(sums), where=valid)
        return batch.append_column(
            "bigram_logprob", pa.array(means, type=pa.float64(), mask=~valid)
        )


def bigram_logprob(
    ds: rd.Dataset,
    column: str = "text",
    lam: float = 0.75,
    top_m: int = 5000,
    concurrency=None,
) -> rd.Dataset:
    """Interpolated-bigram LM document scoring — the next quality rung
    above ``unigram_logprob`` (degenerate word salads score low even
    when their unigrams are common). Two small aggregate shuffles build
    the model; scoring is one actor-pool pass.

    The input is consumed THREE times (unigram build, bigram build,
    scoring) — deliberately not materialized here: re-streaming a
    column-pruned parquet scan beats pinning corpus text in the object
    store. Callers whose ``ds`` carries EXPENSIVE derived lineage
    (a curation pipeline, a model stage) should ``ds.materialize()``
    first, or Ray re-executes that lineage per consumer."""
    from ..functions.partitioning import pinned_pool

    model_ref = bigram_model(ds, column, top_m)
    return ds.map_batches(
        BigramScorer,
        fn_constructor_kwargs={"model_ref": model_ref, "lam": lam,
                               "column": column},
        batch_format="pyarrow",
        concurrency=concurrency or pinned_pool(8),
    )


def quality_report(
    ds: rd.Dataset,
    group_column: str = "source",
    column: str = "text",
    id_column: str = "doc_id",
    **thresholds,
) -> rd.Dataset:
    """Per-group quality-gate outcome report: one row per
    ``(group, reason)`` with the document count — kept docs count under
    reason ``'ok'``, rejected docs once per violated rule. The first
    question a curation run answers per source/domain ("what is each
    source failing on, and how much survives?"), derived from the same
    auditable verdicts as :func:`quality_filter_batch`.

    Scale shape: verdicts + reason explosion + per-batch partial counts
    are ONE vectorized map pass (Arrow ``split_pattern`` /
    ``list_parent_indices`` — no Python row loop); the only shuffle is
    the final ``groupby`` over (group, reason) partials, whose
    cardinality is sources × 7, independent of corpus size.

    Returns ``(group_column, reason, n_docs)``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        v = quality_filter_batch(
            batch, column=column, id_column=id_column, **thresholds)
        reason = pc.if_else(v["keep"], pa.scalar("ok"), v["reasons"])
        split = pc.split_pattern(reason, ",")
        grp = pc.take(
            batch[group_column].combine_chunks()
            if isinstance(batch[group_column], pa.ChunkedArray)
            else batch[group_column],
            pc.list_parent_indices(split),
        )
        t = pa.table({group_column: grp, "reason": pc.list_flatten(split)})
        g = t.group_by([group_column, "reason"]).aggregate([([], "count_all")])
        return pa.table({
            group_column: g[group_column],
            "reason": g["reason"],
            "n_docs": pc.cast(g["count_all"], pa.int64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_column, "reason"])
        .sum("n_docs")
        .rename_columns({"sum(n_docs)": "n_docs"})
    )


def adaptive_quality_filter(
    ds: rd.Dataset,
    q: float = 0.25,
    group_column: str = "source",
    text_column: str = "text",
) -> rd.Dataset:
    """Per-group ADAPTIVE length gate: each group (source/domain) keeps
    documents with at least its own q-quantile token count — fixed
    global thresholds (``quality_filter_batch``) over-prune terse
    domains and under-prune verbose ones; quantile-relative gates are
    the standard correction. Returns the audit summary
    (group, threshold, n_docs, n_kept).

    Scale shape: pass 1 reduces to one row per (group, distinct token
    count) (the ``grouped_quantiles`` value-count compression) and the
    per-group thresholds — a #groups-sized table — are broadcast via
    ``ray.put``; pass 2 re-counts tokens with the vectorized Arrow
    regex kernel and folds each batch to #groups partial rows. Two
    streaming scans of the text, nothing corpus-sized is materialized
    or shuffled (the alternative — materializing per-doc token counts
    between the passes — would pin O(corpus) rows in the object store
    to save one cheap regex pass).
    """
    from .sampling import grouped_quantiles

    def counts(batch: pa.Table) -> pa.Table:
        # null groups are excluded (the grouped_token_frequency rule;
        # the SQL oracle agrees for free — NULL never joins back to its
        # own threshold); null text counts as an empty doc, matching
        # the doc_stats convention and the oracle's coalesce
        t = batch.filter(pc.is_valid(batch[group_column]))
        toks = pc.count_substring_regex(
            pc.fill_null(t[text_column], ""), TOKEN_PATTERN)
        return pa.table({
            group_column: t[group_column],
            "v": pc.cast(toks, pa.int64()),
        })

    stats = ds.select_columns([group_column, text_column]).map_batches(
        counts, batch_format="pyarrow")
    thr_tbl = grouped_quantiles(stats, [q], "v", group_column)
    thr = dict(zip(thr_tbl[group_column].to_pylist(),
                   thr_tbl["value"].to_pylist()))
    thr_ref = ray.put(thr)

    def partial(batch: pa.Table, _ref=thr_ref) -> pa.Table:
        import pandas as pd

        tmap = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
        t = counts(batch)
        g = pd.Series(t[group_column].to_pylist())
        v = t["v"].to_numpy(zero_copy_only=False)
        cut = g.map(tmap).to_numpy(dtype=np.float64)
        kept = v >= cut
        df = pd.DataFrame({group_column: g, "kept": kept})
        out = df.groupby(group_column, sort=False).agg(
            n_docs=("kept", "size"), n_kept=("kept", "sum"))
        out = out.reset_index()
        return pa.table({
            group_column: pa.array(out[group_column]),
            "threshold": pa.array(
                out[group_column].map(tmap), type=pa.int64()),
            "n_docs": pa.array(out["n_docs"], type=pa.int64()),
            "n_kept": pa.array(out["n_kept"], type=pa.int64()),
        })

    return (
        ds.select_columns([group_column, text_column])
        .map_batches(partial, batch_format="pyarrow")
        .groupby([group_column, "threshold"])
        .sum(["n_docs", "n_kept"])
        .rename_columns({"sum(n_docs)": "n_docs", "sum(n_kept)": "n_kept"})
    )
