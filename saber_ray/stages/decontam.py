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


def shingle_hashes(text: str, n: int) -> set[int]:
    """64-bit hashes of all n-token shingles of ``text``."""
    toks = _TOKEN_RE.findall(text.lower()) if text else []
    out = set()
    for i in range(len(toks) - n + 1):
        s = " ".join(toks[i : i + n])
        out.add(int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16))
    return out


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


def decontaminate(
    train_ds: rd.Dataset,
    eval_ds: rd.Dataset,
    n: int = 8,
    text_column: str = "text",
) -> rd.Dataset:
    """Filter ``train_ds`` down to documents sharing NO n-token shingle
    with ``eval_ds``. One streaming pass over the corpus; the eval
    shingle set is broadcast once via ``ray.put``."""
    shingles_ref = ray.put(eval_shingle_set(eval_ds, n, text_column))

    def keep_clean(batch: pa.Table) -> pa.Table:
        banned = ray.get(shingles_ref)
        mask = []
        for text in batch[text_column].to_pylist():
            toks = _TOKEN_RE.findall(text.lower()) if text else []
            hit = False
            for i in range(len(toks) - n + 1):
                s = " ".join(toks[i : i + n])
                if int(hashlib.md5(s.encode()).hexdigest()[:16], 16) in banned:
                    hit = True
                    break
            mask.append(not hit)
        return batch.filter(pa.array(mask, type=pa.bool_()))

    return train_ds.map_batches(keep_clean, batch_format="pyarrow")
