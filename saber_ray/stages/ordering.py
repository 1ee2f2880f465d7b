"""Distributed global order-index assignment: deterministic shuffle
positions and exact global ranks, without any node seeing the table.

Reference analogue: the reference shuffles training data driver-side
(``random.sample`` over dataset indices, ``saber/trainer.py:73-74``) and
picks the best epoch by ordering a tiny metrics list
(``saber/metrics.py:266-273``) — both single-process, both bounded by
driver memory. A 100-TB training-data pipeline needs the same two
operations as DISTRIBUTED total orders: a deterministic global shuffle
(every example gets its exact position in a seeded permutation — stable
under retries, resumes and cluster size, so a training run can be
reproduced and resumed mid-epoch) and a curriculum ordering (rank every
document by a difficulty/quality key).

Scale shape (both entry points share it):

1. a map stage appends the order key and a RANGE bucket id — uniform
   hash keys use fixed-width value ranges; general numeric keys use
   equal-mass boundaries from a 4096-bin histogram pass over just the
   key column;
2. bucket row-counts come from one tiny aggregate (P rows, P ≈
   partition count — independent of table size); the driver prefix-sums
   them into per-bucket global offsets;
3. ONE hash shuffle keyed by bucket; inside a bucket the rank is a
   single vectorized ``np.lexsort`` — no per-key Python calls, the
   ``sessionize``/``running_totals`` bucket shape.

Equal keys always share a bucket (buckets are value ranges, assignment
is ``searchsorted`` on closed boundaries), so in-bucket rank + bucket
offset is the exact global rank. Known skew caveat: one key value that
dominates the table lands in one bucket; the id tiebreak spreads ranks
within it but not the bucket itself — for such keys shuffle by the
uniform-hash path instead (its keys are unique by construction).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

_HIST_BINS = 4096


def _bucket_offsets(ds_bucketed: rd.Dataset, order: np.ndarray) -> dict[int, int]:
    """Exact per-bucket global offsets from one tiny count aggregate.

    ``order`` lists bucket ids in GLOBAL RANK order (ascending buckets
    for ascending keys, descending for descending keys). The returned
    dict is O(P) — hundreds of entries — and is captured by value in
    the rank closure (broadcast once per task by Ray's closure
    serialization; it is far below ``ray.put`` size concerns).
    """
    counts = {
        int(r["__bucket"]): int(r["count()"])
        for r in ds_bucketed.groupby("__bucket").count().take_all()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for b in order.tolist():
        offsets[int(b)] = acc
        acc += counts.get(int(b), 0)
    return offsets


def _ranked(
    ds_bucketed: rd.Dataset,
    offsets: dict[int, int],
    *,
    id_column: str,
    descending: bool,
    out_column: str,
) -> rd.Dataset:
    """Shuffle by bucket; vectorized in-bucket lexsort → global index."""

    def per_bucket(group: pa.Table) -> pa.Table:
        keep = [c for c in group.column_names if c not in ("__bucket", "__key")]
        if len(group) == 0:
            return group.select(keep).append_column(
                out_column, pa.array([], pa.int64())
            )
        bucket = int(group["__bucket"][0].as_py())
        keys = group["__key"].to_numpy(zero_copy_only=False)
        ids = group[id_column].to_numpy(zero_copy_only=False)
        if np.issubdtype(keys.dtype, np.integer):
            # order-preserving uint64 encoding: numpy negation wraps
            # unsigned ints and overflows INT64_MIN, silently mis-ranking
            # equal-bucket keys; bitwise NOT of the encoding inverts the
            # order exactly for every integer dtype
            if keys.dtype.kind == "u":
                enc = keys.astype(np.uint64)
            else:
                enc = keys.astype(np.int64).view(np.uint64) ^ np.uint64(1 << 63)
            sort_keys = ~enc if descending else enc
        else:
            sort_keys = -keys if descending else keys
        order = np.lexsort((ids, sort_keys))
        pos = np.empty(len(order), dtype=np.int64)
        pos[order] = np.arange(len(order), dtype=np.int64) + offsets[bucket]
        return group.select(keep).append_column(out_column, pa.array(pos))

    return ds_bucketed.groupby("__bucket").map_groups(
        per_bucket, batch_format="pyarrow"
    )


def global_shuffle_index(
    ds: rd.Dataset,
    *,
    id_column: str = "doc_id",
    salt: str = "",
    num_buckets: int = 256,
    out_column: str = "shuffle_pos",
) -> rd.Dataset:
    """Deterministic global shuffle: every row's exact position in the
    seeded permutation ``ORDER BY md5(salt || id), id``.

    Unlike ``Dataset.random_shuffle`` the permutation is a pure function
    of ``(id, salt)`` — stable under retries, resumes, repartitioning
    and cluster size, so two runs (or a resumed epoch) agree on which
    example is at position N. Keys are md5-uniform in ``[0, 2^32)``, so
    buckets are fixed-width ranges of the key space — no histogram pass
    needed and no skew possible (keys are unique per id).
    """
    from .sampling import _key64  # the ONE md5 bucketing-key recipe

    num_buckets = max(1, num_buckets)
    width = -(-(1 << 32) // num_buckets)  # ceil — covers the full key space

    def keyed(batch: pa.Table) -> pa.Table:
        keys = np.array(_key64(batch[id_column].to_pylist(), salt), dtype=np.int64)
        batch = batch.append_column("__key", pa.array(keys))
        return batch.append_column(
            "__bucket", pa.array((keys // width).astype(np.int32))
        )

    # materialize once: the count aggregate AND the rank shuffle both
    # consume this lineage, and re-executing it would pay the per-row
    # md5 map twice — the operator's dominant cost. The staged barrier
    # is this repo's measured-win shape (BASELINE.md); blocks spill to
    # the object store rather than re-running the map.
    bucketed = ds.map_batches(keyed, batch_format="pyarrow").materialize()
    offsets = _bucket_offsets(bucketed, np.arange(num_buckets))
    return _ranked(
        bucketed,
        offsets,
        id_column=id_column,
        descending=False,
        out_column=out_column,
    )


def global_rank(
    ds: rd.Dataset,
    key_column: str,
    *,
    id_column: str = "doc_id",
    descending: bool = False,
    num_buckets: int = 256,
    out_column: str = "pos",
) -> rd.Dataset:
    """Exact global rank (0-based) of every row under
    ``ORDER BY key [DESC], id`` — the distributed curriculum-ordering /
    ``row_number() OVER (ORDER BY ...)`` operator.

    Two streaming passes over JUST the key column size the buckets
    (min/max, then a 4096-bin exact histogram — bin counts are exact
    because binning is deterministic), then the one bucket shuffle
    assigns ranks. Bucket boundaries are bin edges grouped to ~equal
    mass, so no bucket exceeds ~rows/P except where a single key value
    dominates (see module docstring). Null, NaN and infinite keys are
    rejected loudly: none of them has a position under SQL ``ORDER BY``
    without a declared placement policy (and NaN/inf would poison the
    histogram edges) — silently defaulting one would corrupt every
    downstream offset.
    """
    num_buckets = max(1, num_buckets)

    def _checked(col) -> np.ndarray:
        if col.null_count:
            raise ValueError(f"global_rank: null values in {key_column!r}")
        v = col.to_numpy(zero_copy_only=False)
        if np.issubdtype(v.dtype, np.floating) and not np.isfinite(v).all():
            raise ValueError(f"global_rank: non-finite values in {key_column!r}")
        return v

    def key_stats(batch: pa.Table) -> pa.Table:
        v = _checked(batch[key_column]).astype(np.float64)
        return pa.table(
            {"lo": [float(v.min())], "hi": [float(v.max())]}
            if len(v)
            else {"lo": pa.array([], pa.float64()), "hi": pa.array([], pa.float64())}
        )

    stats = ds.select_columns([key_column]).map_batches(
        key_stats, batch_format="pyarrow"
    ).to_pandas()
    if stats.empty:
        sch = ds.schema()
        arrow_sch = getattr(sch, "base_schema", sch)  # Ray Schema wrapper
        empty = arrow_sch.empty_table().append_column(
            out_column, pa.array([], pa.int64())
        )
        return rd.from_arrow(empty)
    lo, hi = float(stats["lo"].min()), float(stats["hi"].max())
    edges = np.linspace(lo, hi, _HIST_BINS + 1)[1:-1] if hi > lo else np.array([])

    def hist_partial(batch: pa.Table) -> pa.Table:
        v = batch[key_column].to_numpy(zero_copy_only=False).astype(np.float64)
        binned = np.searchsorted(edges, v, side="right")
        counts = np.bincount(binned, minlength=_HIST_BINS).astype(np.int64)
        return pa.table({"bin": np.arange(_HIST_BINS, dtype=np.int32), "n": counts})

    hist = (
        ds.select_columns([key_column])
        .map_batches(hist_partial, batch_format="pyarrow")
        .groupby("bin")
        .sum("n")
        .to_pandas()
        .sort_values("bin")
    )
    bin_counts = np.zeros(_HIST_BINS, dtype=np.int64)
    bin_counts[hist["bin"].to_numpy()] = hist["sum(n)"].to_numpy()
    # group bins into ~equal-mass buckets: bucket id per bin
    cum = np.cumsum(bin_counts)
    total = int(cum[-1])
    per = max(1, -(-total // num_buckets))
    bin_to_bucket = np.minimum((cum - 1) // per, num_buckets - 1).astype(np.int32)
    bin_to_bucket = np.maximum(bin_to_bucket, 0)

    def keyed(batch: pa.Table) -> pa.Table:
        v = _checked(batch[key_column])
        binned = np.searchsorted(edges, v.astype(np.float64), side="right")
        batch = batch.append_column("__key", pa.array(v))
        return batch.append_column(
            "__bucket", pa.array(bin_to_bucket[binned])
        )

    bucketed = ds.map_batches(keyed, batch_format="pyarrow")
    # bucket masses are already exact from the histogram (binning is
    # deterministic), so no extra count pass: prefix-sum them directly
    bucket_mass = np.bincount(
        bin_to_bucket, weights=bin_counts, minlength=num_buckets
    ).astype(np.int64)
    order = np.arange(num_buckets)
    if descending:
        order = order[::-1]
    cum_mass = np.concatenate(([0], np.cumsum(bucket_mass[order])))[:-1]
    offsets = {int(b): int(o) for b, o in zip(order, cum_mass)}
    return _ranked(
        bucketed,
        offsets,
        id_column=id_column,
        descending=descending,
        out_column=out_column,
    )


def take_weight_budget(
    ds: rd.Dataset,
    key_column: str,
    weight_column: str,
    budget: float,
    *,
    id_column: str = "doc_id",
    descending: bool = True,
    num_buckets: int = 256,
) -> rd.Dataset:
    """Select rows in ``ORDER BY key [DESC], id`` order until the running
    sum of ``weight`` reaches ``budget`` (inclusive of the row that lands
    exactly on it) — "fill a token budget with the best documents".

    SQL equivalent: ``WHERE sum(w) OVER (ORDER BY key [DESC], id) <= B``.

    Scale shape: the same histogram range-bucketing as ``global_rank``,
    then ONE tiny per-bucket weight-sum aggregate (P rows) which the
    driver prefix-sums in rank order. Every bucket whose prefix offset
    already exceeds the budget is dropped by a cheap FILTER before the
    shuffle — only the selected buckets plus the single frontier bucket
    ever move, so the shuffle cost tracks the BUDGET, not the corpus.
    In-bucket selection is one vectorized lexsort + cumsum.

    Weights must be non-negative (a negative weight makes the running
    sum non-monotone and the pre-shuffle pruning unsound — rejected
    loudly). Integer weights are exact (float64 accumulation below
    2^53); for float weights a row landing within float-rounding of the
    budget may differ from an exact-decimal SQL evaluation.
    """
    num_buckets = max(1, num_buckets)

    def _checked(col, name) -> np.ndarray:
        if col.null_count:
            raise ValueError(f"take_weight_budget: null values in {name!r}")
        v = col.to_numpy(zero_copy_only=False)
        if np.issubdtype(v.dtype, np.floating) and not np.isfinite(v).all():
            raise ValueError(f"take_weight_budget: non-finite values in {name!r}")
        return v

    def key_stats(batch: pa.Table) -> pa.Table:
        v = _checked(batch[key_column], key_column).astype(np.float64)
        return pa.table(
            {"lo": [float(v.min())], "hi": [float(v.max())]}
            if len(v)
            else {"lo": pa.array([], pa.float64()), "hi": pa.array([], pa.float64())}
        )

    stats = ds.select_columns([key_column]).map_batches(
        key_stats, batch_format="pyarrow"
    ).to_pandas()
    if stats.empty:
        return ds
    lo, hi = float(stats["lo"].min()), float(stats["hi"].max())
    edges = np.linspace(lo, hi, _HIST_BINS + 1)[1:-1] if hi > lo else np.array([])

    # per-BIN weight sums (exact — binning is deterministic); bins then
    # group into equal-WEIGHT buckets so the frontier bucket is small
    def wsum_partial(batch: pa.Table) -> pa.Table:
        k = _checked(batch[key_column], key_column).astype(np.float64)
        w = _checked(batch[weight_column], weight_column).astype(np.float64)
        if (w < 0).any():
            # negative weights make the running sum non-monotone: rows
            # PAST the frontier could re-qualify, so bucket pruning (and
            # the budget semantics themselves) would silently drop them
            raise ValueError(
                f"take_weight_budget: negative weights in {weight_column!r}"
            )
        binned = np.searchsorted(edges, k, side="right")
        sums = np.bincount(binned, weights=w, minlength=_HIST_BINS)
        return pa.table(
            {"bin": np.arange(_HIST_BINS, dtype=np.int32), "w": sums}
        )

    wcols = [key_column] + ([weight_column] if weight_column != key_column else [])
    hist = (
        ds.select_columns(wcols)
        .map_batches(wsum_partial, batch_format="pyarrow")
        .groupby("bin")
        .sum("w")
        .to_pandas()
        .sort_values("bin")
    )
    bin_w = np.zeros(_HIST_BINS, dtype=np.float64)
    bin_w[hist["bin"].to_numpy()] = hist["sum(w)"].to_numpy()
    total_w = float(bin_w.sum())
    per = max(total_w / num_buckets, 1e-12)
    cum_w = np.cumsum(bin_w)
    bin_to_bucket = np.minimum(
        np.maximum(np.ceil(cum_w / per).astype(np.int64) - 1, 0), num_buckets - 1
    ).astype(np.int32)

    # weight offset of each bucket in rank order + pre-shuffle pruning
    bucket_w = np.bincount(bin_to_bucket, weights=bin_w, minlength=num_buckets)
    order = np.arange(num_buckets)
    if descending:
        order = order[::-1]
    w_off = np.concatenate(([0.0], np.cumsum(bucket_w[order])))[:-1]
    offsets = {int(b): float(o) for b, o in zip(order, w_off)}
    live = np.array(
        sorted(int(b) for b, o in offsets.items() if o <= budget), dtype=np.int32
    )

    def keyed(batch: pa.Table) -> pa.Table:
        k = _checked(batch[key_column], key_column)
        binned = np.searchsorted(edges, k.astype(np.float64), side="right")
        b = bin_to_bucket[binned]
        batch = batch.append_column("__key", pa.array(k))
        batch = batch.append_column("__bucket", pa.array(b))
        return batch.filter(pa.array(np.isin(b, live)))

    def per_bucket(group: pa.Table) -> pa.Table:
        keep = [c for c in group.column_names if c not in ("__bucket", "__key")]
        if len(group) == 0:
            return group.select(keep)
        bucket = int(group["__bucket"][0].as_py())
        keys = group["__key"].to_numpy(zero_copy_only=False)
        ids = group[id_column].to_numpy(zero_copy_only=False)
        if np.issubdtype(keys.dtype, np.integer):
            if keys.dtype.kind == "u":
                enc = keys.astype(np.uint64)
            else:
                enc = keys.astype(np.int64).view(np.uint64) ^ np.uint64(1 << 63)
            sort_keys = ~enc if descending else enc
        else:
            sort_keys = -keys if descending else keys
        order_ix = np.lexsort((ids, sort_keys))
        w = group[weight_column].to_numpy(zero_copy_only=False).astype(np.float64)
        cum = np.cumsum(w[order_ix]) + offsets[bucket]
        sel = order_ix[cum <= budget]
        return group.select(keep).take(pa.array(np.sort(sel)))

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
