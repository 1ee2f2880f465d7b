"""Benchmark decontamination: drop training documents that share an
n-token shingle with an evaluation/benchmark set.

The standard guard for LLM training data (an n-gram overlap test against
held-out benchmarks). The contamination source is SMALL relative to the
corpus — benchmarks are thousands of documents against billions — so the
right 100-TB shape is a broadcast semi-join: shingle the eval set once,
``ray.put`` the hash set, and filter the corpus in one streaming pass.
No shuffle touches the training corpus. (For a contamination source too
big to broadcast, shingle both sides and anti-join on the shingle hash —
the same one-keyed-shuffle shape as ``stages/dedup.py:dedup_exact``.)

Shingles are ``n`` consecutive tokens (``[0-9a-z]+`` on lowercased text,
the corpus-wide tokenizer from ``stages/textstats.py``); membership is
tested on a 64-bit rolling hash over vectorized per-token hashes
(``functions/hashing.py:batch_shingle_hashes`` — one polars hash call
per batch + numpy windows, replacing a per-shingle md5 loop that was
the dominant map cost). Collision odds ~m²/2^64 — negligible against
benchmark-sized shingle sets, and verifiable: the DuckDB oracle joins
on the exact shingle TEXT and agrees.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..functions.hashing import batch_shingle_hashes
from .textstats import TOKEN_PATTERN

_TOKEN_RE = re.compile(TOKEN_PATTERN)


def shingle_hashes(text: str, n: int) -> set[int]:
    """64-bit hashes of all n-token shingles of ``text`` (a doc shorter
    than ``n`` has none). The ONE shingle/hash recipe shared by the
    eval-set builder and the corpus-side membership test — divergence
    here would silently stop the filter from matching the eval set."""
    [hs] = batch_shingle_hashes([text], _TOKEN_RE, n)
    return set(int(h) for h in hs)


def eval_shingle_set(
    eval_ds: rd.Dataset, n: int, text_column: str = "text"
) -> np.ndarray:
    """SORTED UNIQUE uint64 shingle hashes over the (small) eval set.

    Per-batch partial arrays are unioned on the driver — the stream back
    is one array per batch of the EVAL side only. A numpy array (not a
    Python set) so the ``ray.put`` broadcast is plasma-zero-copy in
    every probe actor and membership is a vectorized ``searchsorted``.
    """

    def batch_set(batch: pa.Table) -> pa.Table:
        per_doc = batch_shingle_hashes(
            batch[text_column].to_pylist(), _TOKEN_RE, n)
        acc = (np.unique(np.concatenate(per_doc)) if per_doc
               else np.empty(0, dtype=np.uint64))
        return pa.table({"h": pa.array(acc, type=pa.uint64())})

    parts = eval_ds.map_batches(batch_set, batch_format="pyarrow")
    chunks = [b["h"].to_numpy(zero_copy_only=False)
              for b in parts.iter_batches(batch_format="pyarrow")]
    if not chunks:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(chunks)).astype(np.uint64)


class CleanFilter:
    """Actor-pool corpus filter: the banned shingle array is ``ray.get``
    ONCE per actor in ``__init__`` (zero-copy plasma view of the sorted
    uint64 array). Per batch: ALL documents' shingle hashes are computed
    in one vectorized pass and membership-tested with one
    ``searchsorted`` — no per-shingle Python."""

    def __init__(self, shingles_ref, n: int, text_column: str = "text"):
        banned = (ray.get(shingles_ref)
                  if isinstance(shingles_ref, ray.ObjectRef)
                  else shingles_ref)
        if isinstance(banned, set):  # caller-built set: normalize once
            banned = np.fromiter(banned, dtype=np.uint64, count=len(banned))
            banned.sort()
        self._banned = np.asarray(banned, dtype=np.uint64)
        self._n = n
        self._col = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        banned = self._banned
        per_doc = batch_shingle_hashes(
            batch[self._col].to_pylist(), _TOKEN_RE, self._n)
        lens = np.array([len(h) for h in per_doc], dtype=np.int64)
        if lens.sum() == 0 or len(banned) == 0:
            return batch
        flat = np.concatenate([h for h in per_doc if len(h)])
        pos = np.searchsorted(banned, flat)
        pos[pos == len(banned)] = 0  # out-of-range probe can't match
        hit = banned[pos] == flat
        # per-doc ANY over the flattened hit mask (segment reduction)
        clean = np.ones(batch.num_rows, dtype=bool)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        nonempty = lens > 0
        if nonempty.any():
            seg_any = np.logical_or.reduceat(hit, starts[nonempty])
            clean[nonempty] = ~seg_any
        return batch.filter(pa.array(clean))


def decontaminate(
    train_ds: rd.Dataset,
    eval_ds: rd.Dataset,
    n: int = 8,
    text_column: str = "text",
    concurrency=None,
) -> rd.Dataset:
    """Filter ``train_ds`` down to documents sharing NO n-token shingle
    with ``eval_ds``. One streaming pass over the corpus; the eval
    shingle set is broadcast once via ``ray.put`` and loaded once per
    actor."""
    from ..functions.partitioning import pinned_pool

    shingles_ref = ray.put(eval_shingle_set(eval_ds, n, text_column))
    return train_ds.map_batches(
        CleanFilter,
        fn_constructor_kwargs={
            "shingles_ref": shingles_ref, "n": n, "text_column": text_column,
        },
        batch_format="pyarrow",
        concurrency=concurrency or pinned_pool(8),
    )


class ContamFraction(CleanFilter):
    """Actor-pool contamination SCORER: same broadcast shingle set and
    vectorized probe as ``CleanFilter``, but instead of dropping hits it
    appends ``contam_frac`` — the fraction of the document's shingle
    POSITIONS found in the eval set. The reporting companion to the
    binary filter: at 100 TB you audit overlap rates per source/shard
    before deciding a drop threshold."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        banned = self._banned
        per_doc = batch_shingle_hashes(
            batch[self._col].to_pylist(), _TOKEN_RE, self._n)
        lens = np.array([len(h) for h in per_doc], dtype=np.int64)
        frac = np.zeros(batch.num_rows, dtype=np.float64)
        if lens.sum() and len(banned):
            flat = np.concatenate([h for h in per_doc if len(h)])
            pos = np.searchsorted(banned, flat)
            pos[pos == len(banned)] = 0
            hit = (banned[pos] == flat).astype(np.int64)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            nonempty = lens > 0
            seg_hits = np.add.reduceat(hit, starts[nonempty])
            frac[nonempty] = seg_hits / lens[nonempty]
        return batch.append_column("contam_frac", pa.array(frac))


def contamination_fraction(
    train_ds: rd.Dataset,
    eval_ds: rd.Dataset,
    n: int = 8,
    text_column: str = "text",
    concurrency=None,
) -> rd.Dataset:
    """Append per-document ``contam_frac`` (shingle positions hitting the
    eval set / total shingle positions; 0.0 for docs shorter than ``n``
    tokens). One streaming pass; eval shingles broadcast once."""
    from ..functions.partitioning import pinned_pool

    shingles_ref = ray.put(eval_shingle_set(eval_ds, n, text_column))
    return train_ds.map_batches(
        ContamFraction,
        fn_constructor_kwargs={
            "shingles_ref": shingles_ref, "n": n, "text_column": text_column,
        },
        batch_format="pyarrow",
        concurrency=concurrency or pinned_pool(8),
    )
