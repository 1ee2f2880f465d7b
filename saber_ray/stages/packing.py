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

import pyarrow as pa

import ray.data as rd

from .textstats import token_count_batch


def assign_buckets(
    batch: pa.Table, bucket_count: int, id_column: str = "doc_id"
) -> pa.Table:
    """Append ``bucket`` — md5-based, so DuckDB reproduces it exactly."""
    from ..functions.hashing import md5_key32

    buckets = [
        md5_key32(v) % bucket_count for v in batch[id_column].to_pylist()
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
        import pyarrow.compute as pc

        out = token_count_batch(batch, column=text_column)
        # null text -> null count -> pandas NaN, and every NaN budget
        # comparison is False: one null row would silently collapse its
        # whole bucket into a single over-budget pack. Nulls cost 0.
        out = out.set_column(
            out.column_names.index("n_tokens"), "n_tokens",
            pc.fill_null(out["n_tokens"], 0),
        )
        out = assign_buckets(out, bucket_count, id_column)
        return out.select([id_column, "bucket", "n_tokens"])

    def pack_group(df):
        df = df.sort_values(id_column).reset_index(drop=True)
        df["pack_id"] = greedy_pack(df["n_tokens"].tolist(), budget)
        return df[[id_column, "bucket", "pack_id", "n_tokens"]]

    triples = ds.map_batches(counts, batch_format="pyarrow")
    return triples.groupby("bucket").map_groups(pack_group, batch_format="pandas")


def interleaved_costs(
    batch: pa.Table,
    media_costs: dict[str, int],
    spans_column: str = "spans",
    id_column: str = "doc_id",
    default_media_cost: int = 256,
) -> pa.Table:
    """Per-document training-token cost over the INTERLEAVED schema:
    text spans cost their token count (same vectorized Arrow regex as
    ``token_count_batch``); media spans cost a FIXED per-kind budget
    (``{"image": 256, ...}`` — the vision-token allowance a multimodal
    trainer charges per image/audio clip). Returns (doc_id, n_tokens).

    Fully columnar: the spans list column is flattened once, per-span
    costs are computed on the flat arrays (regex count for text, masked
    constants per media kind), and a segment-sum over the list offsets
    folds them back to one row per document — no Python row loop.
    """
    import numpy as np
    import pyarrow.compute as pc

    from .textstats import TOKEN_PATTERN

    spans = batch[spans_column].combine_chunks()
    flat = spans.flatten()
    kinds = flat.field("kind")
    texts = flat.field("text")

    tok = pc.fill_null(
        pc.cast(pc.count_substring_regex(texts, TOKEN_PATTERN), pa.int64()), 0
    )  # null span text costs 0, never NaN (NaN poisons the greedy pack)
    is_text = pc.fill_null(pc.equal(kinds, "text"), False).to_numpy(
        zero_copy_only=False)
    # every NON-text kind is charged: unknown media kinds get
    # default_media_cost rather than a silent 0 (a 0-cost video span
    # would let packs exceed the trainer's real token budget)
    cost = np.where(
        is_text, tok.to_numpy(zero_copy_only=False), int(default_media_cost)
    ).astype(np.int64)
    for kind, c in media_costs.items():
        cost[pc.fill_null(pc.equal(kinds, kind), False).to_numpy(
            zero_copy_only=False)] = int(c)

    offsets = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    starts = offsets[:-1]
    # reduceat misbehaves on empty segments (repeats the next segment's
    # first element); cumsum differencing is exact for any layout
    csum = np.concatenate([[0], np.cumsum(cost)])
    totals = csum[offsets[1:]] - csum[starts]
    return pa.table({
        id_column: batch[id_column],
        "n_tokens": pa.array(totals, type=pa.int64()),
    })


def pack_interleaved(
    ds: rd.Dataset,
    budget: int = 2048,
    bucket_count: int = 8,
    media_costs: dict[str, int] | None = None,
    id_column: str = "doc_id",
    default_media_cost: int = 256,
) -> rd.Dataset:
    """``pack_sequences`` over interleaved text+media documents: the
    pack budget charges text spans their token count and media spans a
    fixed per-kind cost (kinds missing from ``media_costs`` charge
    ``default_media_cost`` — never a silent 0). Same determinism
    contract (hash buckets, id order) and the same single groupby —
    span payloads never shuffle, only (doc_id, bucket, n_tokens)."""
    media_costs = media_costs if media_costs is not None else {"image": 256}

    def costs(batch: pa.Table) -> pa.Table:
        out = interleaved_costs(batch, media_costs, id_column=id_column,
                                default_media_cost=default_media_cost)
        out = assign_buckets(out, bucket_count, id_column)
        return out

    def pack_group(df):
        df = df.sort_values(id_column).reset_index(drop=True)
        df["pack_id"] = greedy_pack(df["n_tokens"].tolist(), budget)
        return df[[id_column, "bucket", "pack_id", "n_tokens"]]

    triples = ds.map_batches(costs, batch_format="pyarrow")
    return triples.groupby("bucket").map_groups(pack_group, batch_format="pandas")
