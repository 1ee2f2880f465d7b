"""Sequence packing: group documents into fixed-token-budget packs for
training batches.

Trainers consume fixed-length sequences; feeding one short document per
sequence wastes the budget on padding. Packing greedily fills each pack
with consecutive documents until the token budget would overflow — the
standard preprocessing step between curation and tokenized-shard
writing.

Determinism at scale: a global greedy order would serialize the corpus
through one task, so documents are first bucketed by a hash of their id
(``bucket_count`` independent greedy problems, one per bucket) and each
bucket packs its documents in id order. The result is a pure function of
(ids, token counts, budget, bucket_count) — independent of block
boundaries, retries, and cluster size — and each bucket's pack stream
can be written as its own output partition (resumable layout). The only
shuffle is the per-bucket groupby.

An oversized document (n_tokens > budget) gets a pack of its own — it is
the trainer's truncation decision, never silently dropped here.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

import ray.data as rd

from .textstats import token_count_batch


def assign_buckets(
    batch: pa.Table, bucket_count: int, id_column: str = "doc_id"
) -> pa.Table:
    """Append ``bucket`` — md5-based, so DuckDB reproduces it exactly."""
    buckets = [
        int(hashlib.md5(str(v).encode("utf-8")).hexdigest()[:8], 16) % bucket_count
        for v in batch[id_column].to_pylist()
    ]
    return batch.append_column("bucket", pa.array(buckets, type=pa.int64()))


def greedy_pack(ns: list[int], budget: int) -> list[int]:
    """Greedy pack ids for token counts ``ns`` taken IN ORDER: start a
    new pack whenever adding the next document would exceed ``budget``."""
    packs, cum, pack = [], 0, 0
    for i, n in enumerate(ns):
        if i == 0:
            cum = n
        elif cum + n > budget:
            pack += 1
            cum = n
        else:
            cum += n
        packs.append(pack)
    return packs


def pack_sequences(
    ds: rd.Dataset,
    budget: int = 2048,
    bucket_count: int = 32,
    id_column: str = "doc_id",
    text_column: str = "text",
) -> rd.Dataset:
    """Documents → ``(doc_id, bucket, pack_id, n_tokens)``.

    Token counts come from the corpus tokenizer (vectorized Arrow regex
    count, ``textstats.token_count_batch``); the groupby moves only the
    (id, bucket, n_tokens) triple, never the text.
    """

    def counts(batch: pa.Table) -> pa.Table:
        out = token_count_batch(batch, column=text_column)
        out = assign_buckets(out, bucket_count, id_column)
        return out.select([id_column, "bucket", "n_tokens"])

    def pack_group(df):
        df = df.sort_values(id_column).reset_index(drop=True)
        df["pack_id"] = greedy_pack(df["n_tokens"].tolist(), budget)
        return df[[id_column, "bucket", "pack_id", "n_tokens"]]

    triples = ds.map_batches(counts, batch_format="pyarrow")
    return triples.groupby("bucket").map_groups(pack_group, batch_format="pandas")
