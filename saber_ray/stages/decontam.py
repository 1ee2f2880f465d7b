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
the corpus-wide tokenizer from ``stages/textstats.py``), joined with a
single space; membership is tested on the 64-bit prefix of the md5 of
that string (collision odds ~m^2/2^64 — negligible against benchmark-
sized shingle sets, and verifiable: the DuckDB oracle joins on the exact
shingle TEXT and agrees).
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

import ray
import ray.data as rd

from .textstats import TOKEN_PATTERN

_TOKEN_RE = re.compile(TOKEN_PATTERN)


def _shingle_hash_iter(text: str, n: int):
    """Yield the 64-bit md5-prefix hash of every n-token shingle — the
    ONE shingle/hash recipe shared by the eval-set builder and the
    corpus-side membership test (divergence here would silently stop
    the filter from matching the eval set)."""
    toks = _TOKEN_RE.findall(text.lower()) if text else []
    for i in range(len(toks) - n + 1):
        s = " ".join(toks[i : i + n])
        yield int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16)


def shingle_hashes(text: str, n: int) -> set[int]:
    """64-bit hashes of all n-token shingles of ``text``."""
    return set(_shingle_hash_iter(text, n))


def eval_shingle_set(
    eval_ds: rd.Dataset, n: int, text_column: str = "text"
) -> set[int]:
    """Union of shingle hashes over the (small) eval set.

    Per-batch partial sets are unioned on the driver — the stream back
    is one set per batch of the EVAL side only.
    """

    def batch_set(batch: pa.Table) -> pa.Table:
        acc: set[int] = set()
        for text in batch[text_column].to_pylist():
            acc |= shingle_hashes(text, n)
        return pa.table({"h": pa.array(sorted(acc), type=pa.uint64())})

    parts = eval_ds.map_batches(batch_set, batch_format="pyarrow")
    out: set[int] = set()
    for b in parts.iter_batches(batch_format="pyarrow"):
        out.update(b["h"].to_pylist())
    return out


class CleanFilter:
    """Actor-pool corpus filter: the banned shingle set is ``ray.get``
    ONCE per actor in ``__init__`` — a per-batch get would re-deserialize
    the whole (non-zero-copy) Python set for every 1024-row batch, which
    dominates the stage at corpus scale."""

    def __init__(self, shingles_ref, n: int, text_column: str = "text"):
        self._banned = (ray.get(shingles_ref)
                        if isinstance(shingles_ref, ray.ObjectRef)
                        else shingles_ref)
        self._n = n
        self._col = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        banned, n = self._banned, self._n
        mask = []
        for text in batch[self._col].to_pylist():
            # early-exit scan: stop at the first banned shingle
            hit = any(h in banned for h in _shingle_hash_iter(text, n))
            mask.append(not hit)
        return batch.filter(pa.array(mask, type=pa.bool_()))


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
