"""General relational operators the engine exposes beyond the KG path:
grouped aggregates, windowed event aggregation, hash joins and top-k.

These exist to prove the engine's Dataset surface covers the standard
wide operations (groupby/aggregate/sort/limit/join) with the same
scale discipline as the KG stages: aggregate partials are combined
per-batch before any shuffle; small join sides are broadcast via
``ray.put`` instead of shuffled.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..functions.arrowtypes import arrow_types


def tumbling_window_agg(
    events: rd.Dataset,
    window: str = "hour",
    key: str = "event_type",
    ts_column: str = "ts",
    value_column: str = "value",
) -> rd.Dataset:
    """Tumbling-window aggregate over an event stream:
    (key, window_start) → n events, max value.

    Window assignment is a vectorized Arrow ``floor_temporal`` inside
    ``map_batches`` — the shuffle key is (key, window_start), so windows
    never require event-time ordering (no watermarks needed: tumbling
    windows over a bounded Dataset are a pure groupby).
    """

    def assign(batch: pa.Table) -> pa.Table:
        ws = pc.floor_temporal(batch[ts_column], unit=window)
        return batch.select([key, value_column]).append_column("window_start", ws)

    assigned = events.map_batches(assign, batch_format="pyarrow")
    agg = assigned.groupby([key, "window_start"]).aggregate(
        rd.aggregate.Count(alias_name="n"),
        rd.aggregate.Max(value_column, alias_name="max_value"),
    )
    return agg


def sliding_window_agg(
    events: rd.Dataset,
    window_minutes: int = 60,
    slide_minutes: int = 15,
    key: str = "event_type",
    ts_column: str = "ts",
) -> rd.Dataset:
    """Sliding-window aggregate: each event lands in
    ``window/slide`` overlapping windows (epoch-aligned starts); counts
    per (key, window_start).

    Window assignment is a flat map (vectorized floor + offsets) — the
    multiplicity is bounded (window/slide), and the shuffle is still a
    single groupby on (key, window_start).
    """
    assert window_minutes % slide_minutes == 0
    fanout = window_minutes // slide_minutes

    def assign(batch: pa.Table) -> pa.Table:
        base = pc.floor_temporal(batch[ts_column], multiple=slide_minutes, unit="minute")
        keys, starts = [], []
        for off in range(fanout):
            delta = pa.scalar(off * slide_minutes * 60_000_000, type=pa.duration("us"))
            starts.append(pc.subtract(base, delta))
            keys.append(batch[key])
        return pa.table(
            {
                key: pa.concat_arrays([pa.concat_arrays(k.chunks) if isinstance(k, pa.ChunkedArray) else k for k in keys]),
                "window_start": pa.concat_arrays(
                    [s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s for s in starts]
                ),
            }
        )

    agg = events.map_batches(assign, batch_format="pyarrow").groupby(
        [key, "window_start"]
    ).count()
    return agg.rename_columns({"count()": "n"})


def sessionize(
    events: rd.Dataset,
    gap_minutes: int = 30,
    user_column: str = "user_id",
    ts_column: str = "ts",
) -> rd.Dataset:
    """Gap-based sessionization: per user, a new session starts when the
    gap to the previous event exceeds ``gap_minutes``.

    Returns (user_id, session_num, n, session_start, session_end);
    session_num is 1-based in event-time order (deterministic).

    Scale shape: ONE hash shuffle on ``hash(user) % P`` buckets (the
    ``running_totals`` shape), NOT ``groupby(user)`` — per-user
    ``map_groups`` pays a Python/pandas call per distinct user, which
    dies at 10^8 users. Inside a bucket the whole computation is
    vectorized: one sort, one ``groupby(user).diff()`` for the gap
    test, one grouped cumsum for session numbering, one grouped
    aggregate for the session rows. Keys never become Python-level
    groups.
    """
    import pandas as pd

    from ..functions.partitioning import shuffle_partitions

    gap = pd.Timedelta(minutes=gap_minutes)
    n = shuffle_partitions(8, events)

    def bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("__bucket", _key_buckets(batch, user_column, n))

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values([user_column, ts_column]).drop(columns="__bucket")
        grp = df.groupby(user_column, sort=False, dropna=False)
        new_session = grp[ts_column].diff().gt(gap) | ~df[user_column].duplicated()
        df = df.assign(session_num=new_session.groupby(df[user_column], sort=False, dropna=False).cumsum().astype("int64"))
        out = (
            df.groupby([user_column, "session_num"], sort=True, dropna=False)
            .agg(
                n=(ts_column, "size"),
                session_start=(ts_column, "min"),
                session_end=(ts_column, "max"),
            )
            .reset_index()
        )
        out["n"] = out["n"].astype("int64")
        return out

    return (
        events.select_columns([user_column, ts_column])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def lineitem_pricing_summary(lineitem: rd.Dataset) -> rd.Dataset:
    """TPC-H Q1-shaped pricing summary over lineitem.

    Partial per-batch aggregation (vectorized Arrow groupby inside
    map_batches) → tiny final groupby over (#batches × #flag-status)
    partial rows. Sums are rounded to 2 decimals at the end.
    """

    def partial(batch: pa.Table) -> pa.Table:
        disc_price = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        t = batch.select(["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])
        t = t.append_column("disc_price", disc_price)
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("disc_price", "sum"), ("l_quantity", "count")]
        )

    partials = lineitem.map_batches(partial, batch_format="pyarrow")
    final = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        rd.aggregate.Sum("l_quantity_sum", alias_name="sum_qty"),
        rd.aggregate.Sum("l_extendedprice_sum", alias_name="sum_base_price"),
        rd.aggregate.Sum("disc_price_sum", alias_name="sum_disc_price"),
        rd.aggregate.Sum("l_quantity_count", alias_name="count_order"),
    )

    def round2(batch: pa.Table) -> pa.Table:
        for col in ("sum_qty", "sum_base_price", "sum_disc_price"):
            idx = batch.column_names.index(col)
            batch = batch.set_column(
                idx, col,
                # DuckDB round() is half-away-from-zero; Arrow defaults to
                # half-to-even - match DuckDB so value hashes agree exactly
                pc.round(batch[col], 2, round_mode="half_towards_infinity"),
            )
        return batch

    return final.map_batches(round2, batch_format="pyarrow").sort(
        ["l_returnflag", "l_linestatus"]
    )


def broadcast_join(
    large: rd.Dataset,
    small_table: pa.Table,
    left_on: str,
    right_on: str,
    select_small: list[str] | None = None,
) -> rd.Dataset:
    """Broadcast-small-side hash join: the small table is ``ray.put``
    once and joined against inside every map task (never shuffled).
    """
    if select_small:
        small_table = small_table.select(list(dict.fromkeys([right_on] + select_small)))

    if small_table.column_names == [right_on]:
        # key-only small side = a SEMI join: one vectorized is_in mask
        # per batch beats spinning a hash-join per batch (tpch_q3's
        # customer side takes this path)
        key_ref = ray.put(small_table[right_on].combine_chunks().unique())

        def semi_batch(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.is_in(batch[left_on], value_set=ray.get(key_ref))
            )

        return large.map_batches(semi_batch, batch_format="pyarrow")

    small_ref = ray.put(small_table)

    def join_batch(batch: pa.Table) -> pa.Table:
        small = ray.get(small_ref)
        # Arrow-native hash join on the batch (zero pandas round-trip);
        # the right key column is coalesced away by Arrow's join.
        # use_threads=False: every map task would otherwise spin its own
        # Acero thread pool and oversubscribe the node CPUs (measured
        # ~25% slower on tpch_q3 at 32 concurrent tasks)
        return batch.join(small, keys=left_on, right_keys=right_on,
                          join_type="inner", use_threads=False)

    return large.map_batches(join_batch, batch_format="pyarrow")


def top_revenue_orders(
    orders: rd.Dataset, lineitem: rd.Dataset, customer_small: pa.Table,
    segment: str = "BUILDING", k: int = 10,
) -> rd.Dataset:
    """TPC-H Q3-shaped: revenue per order for one customer segment, top-k.

    customer (small) is broadcast; the segment's order keys become a
    Bloom prefilter on lineitem (fixed-size bits whatever the segment's
    cardinality — only ~1/5 of lineitem rows can survive the final join,
    so the revenue groupby's shuffle input shrinks ~5x; false positives
    just ride through and the join drops them; measured 7.3s → 5.0s at
    sf0.1); lineitem revenue is then pre-aggregated per order BEFORE
    joining; orders⨝revenue uses the hash ``Dataset.join``; final top-k
    = sort + limit on the small aggregate. ``seg_orders`` is
    materialized because it has two consumers (bloom build + join) and
    Ray Data has no common-subexpression reuse.
    """
    import ray

    from ..functions.bloom import build_bloom

    cust = customer_small.filter(
        pc.equal(customer_small["c_mktsegment"], segment)
    ).select(["c_custkey"])
    seg_orders = broadcast_join(
        orders, cust, "o_custkey", "c_custkey"
    ).materialize()
    bloom_ref = ray.put(build_bloom(seg_orders, "o_orderkey"))

    def prefilter(batch: pa.Table) -> pa.Table:
        bf = ray.get(bloom_ref)
        return batch.filter(pa.array(bf.might_contain(batch["l_orderkey"])))

    lineitem = lineitem.map_batches(prefilter, batch_format="pyarrow")

    def rev_partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        t = pa.table({"l_orderkey": batch["l_orderkey"], "rev": rev})
        return t.group_by("l_orderkey").aggregate([("rev", "sum")])

    revenue = (
        lineitem.map_batches(rev_partial, batch_format="pyarrow")
        # NOT coalesced before the groupby: unlike the canonicalize
        # partials (tiny rows, many near-empty blocks), the per-order
        # partial stream is dense enough that an extra repartition
        # shuffle costs more than the reduce-task overhead it saves
        # (measured A/B: none 7.6-7.9s vs repartition(16) 8.0-9.3s warm)
        .groupby("l_orderkey")
        .sum("rev_sum")
        .rename_columns({"sum(rev_sum)": "revenue"})
    )
    joined = seg_orders.select_columns(["o_orderkey", "o_orderdate"]).join(
        revenue, join_type="inner", num_partitions=8,
        on=("o_orderkey",), right_on=("l_orderkey",),
    )

    def round2(batch: pa.Table) -> pa.Table:
        idx = batch.column_names.index("revenue")
        return batch.set_column(
            idx, "revenue",
            pc.round(batch["revenue"], 2, round_mode="half_towards_infinity"),
        )

    return (
        joined.map_batches(round2, batch_format="pyarrow")
        .sort(["revenue", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


def revenue_forecast(
    lineitem: rd.Dataset,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    disc_lo: float = 0.02,
    disc_hi: float = 0.06,
    max_qty: float = 24.0,
) -> pa.Table:
    """TPC-H Q6-shaped scalar aggregate: revenue from discounted small
    lineitems shipped in a date window.

    The filter + multiply runs vectorized per batch; each batch reduces
    to ONE partial-sum row, so the driver combines #batches scalars —
    no shuffle at all. At 100 TB this is the cheapest possible plan: a
    column-pruned scan (callers pass ``columns=`` at the read) with a
    streaming scalar reduce.
    """
    import datetime

    lo = datetime.datetime.fromisoformat(date_lo)
    hi = datetime.datetime.fromisoformat(date_hi)

    def partial(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(batch["l_shipdate"], pa.scalar(lo)),
                pc.less(batch["l_shipdate"], pa.scalar(hi)),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(batch["l_discount"], pa.scalar(disc_lo)),
                    pc.less_equal(batch["l_discount"], pa.scalar(disc_hi)),
                ),
                pc.less(batch["l_quantity"], pa.scalar(max_qty)),
            ),
        )
        f = batch.filter(mask)
        rev = pc.sum(pc.multiply(f["l_extendedprice"], f["l_discount"]))
        return pa.table({"rev_part": pa.array(
            [rev.as_py() if rev.is_valid else 0.0], type=pa.float64())})

    total = lineitem.map_batches(partial, batch_format="pyarrow").sum("rev_part")
    # DuckDB round() is half-away-from-zero; Python's round() is
    # half-to-even — use the Arrow kernel so value hashes agree exactly
    rounded = pc.round(
        pa.scalar(float(total or 0.0)), 2, round_mode="half_towards_infinity"
    )
    return pa.table({"revenue": pa.array([rounded.as_py()], type=pa.float64())})


def local_supplier_volume(
    lineitem: rd.Dataset,
    orders: rd.Dataset,
    customer: rd.Dataset,
    supplier_small: pa.Table,
    nation_small: pa.Table,
    region_small: pa.Table,
    region: str = "ASIA",
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
) -> rd.Dataset:
    """TPC-H Q5-shaped: revenue per nation where the customer and the
    line's supplier share a nation inside one region.

    Plan (scale shapes): region⨝nation collapse to a broadcast
    nationkey→name dict; supplier (the smallest 1:SF table) broadcasts
    as suppkey→nationkey; lineitem attaches ``s_nationkey`` per batch,
    drops non-region rows AT THE SCAN, and pre-aggregates revenue per
    (orderkey, nation) before anything shuffles. orders⨝customer is a
    hash ``Dataset.join`` (customer is NOT broadcast here — at real SF
    it is a large table), producing (orderkey, c_nationkey) for the date
    window only. The final join matches the two shrunken per-order
    streams and a tiny groupby(nation) finishes.
    """
    import datetime

    from ..functions.partitioning import shuffle_partitions

    lo = datetime.datetime.fromisoformat(date_lo)
    hi = datetime.datetime.fromisoformat(date_hi)

    rkey = region_small.filter(pc.equal(region_small["r_name"], region))[
        "r_regionkey"]
    nat = nation_small.filter(
        pc.is_in(nation_small["n_regionkey"], value_set=rkey.combine_chunks())
    )
    name_of = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    nat_of_supp = {
        s: n
        for s, n in zip(
            supplier_small["s_suppkey"].to_pylist(),
            supplier_small["s_nationkey"].to_pylist(),
        )
        if n in name_of
    }
    supp_ref = ray.put(nat_of_supp)

    def line_partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        lookup = ray.get(supp_ref)
        supp = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        nkey = np.array([lookup.get(s, -1) for s in supp.tolist()], dtype=np.int64)
        keep = nkey >= 0
        if not keep.any():
            return pa.table({
                "l_orderkey": pa.array([], type=pa.int64()),
                "s_nationkey": pa.array([], type=pa.int64()),
                "rev": pa.array([], type=pa.float64()),
            })
        f = batch.filter(pa.array(keep))
        rev = pc.multiply(
            f["l_extendedprice"], pc.subtract(pa.scalar(1.0), f["l_discount"])
        )
        t = pa.table({
            "l_orderkey": f["l_orderkey"],
            "s_nationkey": pa.array(nkey[keep]),
            "rev": rev,
        })
        return t.group_by(["l_orderkey", "s_nationkey"]).aggregate([("rev", "sum")])

    line_rev = lineitem.map_batches(line_partial, batch_format="pyarrow")

    def order_window(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(batch["o_orderdate"], pa.scalar(lo)),
            pc.less(batch["o_orderdate"], pa.scalar(hi)),
        )
        return batch.filter(mask).select(["o_orderkey", "o_custkey"])

    n_parts = shuffle_partitions(8, orders)
    cust_nat = orders.map_batches(order_window, batch_format="pyarrow").join(
        customer.select_columns(["c_custkey", "c_nationkey"]),
        join_type="inner", num_partitions=n_parts,
        on=("o_custkey",), right_on=("c_custkey",),
    )
    joined = line_rev.join(
        cust_nat.select_columns(["o_orderkey", "c_nationkey"]),
        join_type="inner", num_partitions=n_parts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def same_nation(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.equal(batch["s_nationkey"], batch["c_nationkey"]))
        names = pa.array(
            [name_of[k] for k in f["s_nationkey"].to_pylist()], type=pa.string()
        )
        return pa.table({"n_name": names, "rev_sum": f["rev_sum"]})

    agg = (
        joined.map_batches(same_nation, batch_format="pyarrow")
        .groupby("n_name")
        .sum("rev_sum")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": batch["n_name"],
            "revenue": pc.round(batch["sum(rev_sum)"], 2,
                                round_mode="half_towards_infinity"),
        })

    return agg.map_batches(finish, batch_format="pyarrow").sort(
        ["revenue", "n_name"], descending=[True, False]
    )


def promo_revenue(
    lineitem: rd.Dataset,
    part_small: pa.Table,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-02-01",
    promo_type: str = "PROMO",
) -> pa.Table:
    """TPC-H Q14-shaped: percentage of revenue from promo parts in a
    ship-date window.

    Scale shape: the part side collapses to a broadcast SET of promo
    part keys (``ray.put`` once — at 100 TB the key set of the small
    dimension table still fits in one object); each lineitem batch does
    a vectorized ``is_in`` + two conditional sums and reduces to ONE
    partial row, so nothing shuffles at all.
    """
    import datetime

    lo = datetime.datetime.fromisoformat(date_lo)
    hi = datetime.datetime.fromisoformat(date_hi)
    promo_keys = part_small.filter(
        pc.equal(part_small["p_type"], promo_type)
    )["p_partkey"].combine_chunks()
    keys_ref = ray.put(promo_keys)

    def partial(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(batch["l_shipdate"], pa.scalar(lo)),
            pc.less(batch["l_shipdate"], pa.scalar(hi)),
        )
        f = batch.filter(mask)
        rev = pc.multiply(
            f["l_extendedprice"], pc.subtract(pa.scalar(1.0), f["l_discount"])
        )
        is_promo = pc.is_in(f["l_partkey"], value_set=ray.get(keys_ref))
        promo = pc.sum(pc.if_else(is_promo, rev, pa.scalar(0.0)))
        total = pc.sum(rev)
        return pa.table({
            "promo_part": pa.array(
                [promo.as_py() if promo.is_valid else 0.0], type=pa.float64()),
            "total_part": pa.array(
                [total.as_py() if total.is_valid else 0.0], type=pa.float64()),
        })

    parts = lineitem.map_batches(partial, batch_format="pyarrow")
    sums = parts.sum(["promo_part", "total_part"])
    if sums is None:  # Dataset.sum returns None over zero blocks
        promo, total = 0.0, 0.0
    else:
        promo, total = sums["sum(promo_part)"], sums["sum(total_part)"]
    pct = 100.0 * promo / total if total else 0.0
    rounded = pc.round(pa.scalar(pct), 6, round_mode="half_towards_infinity")
    return pa.table({"promo_revenue": pa.array([rounded.as_py()], type=pa.float64())})


def semi_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Distributed EXISTS semi-join: left rows with at least one match in
    ``right`` — without broadcast (both sides may be large at 100 TB;
    ``broadcast_join`` handles the small-side case).

    The right side first reduces to DISTINCT keys (a keyed shuffle over
    the key column ONLY — payload never moves), then the bucketed
    :func:`_filter_join` keeps left rows whose key appears in the set —
    exactly semi-join semantics (no row multiplication) without the
    native hash join's empty-partition schema loss.

    Empty-side handling (Ray's hash join breaks on the schema-less
    blocks an all-empty side carries): the LEFT side is probed FIRST
    with a ``limit(1)`` streaming early-stop — one block on map-only
    lineage — so an empty left never pays for the right reduce at all.
    The distinct-key reduce is then MATERIALIZED: its count is free and
    the join reuses the same computed blocks, so the right-side
    emptiness check adds zero re-execution (the key set spills to the
    object store if large). On a shuffle-derived LEFT the probe runs
    the upstream shuffle — pass a materialized left when chaining wide
    operators.
    """
    from ..functions.partitioning import shuffle_partitions

    if left.limit(1).count() == 0:
        return left.limit(0)
    keys = (
        right.select_columns([right_on])
        .groupby(right_on)
        .count()
        .select_columns([right_on])
        .materialize()  # distinct keys only; count + join reuse one run
    )
    if keys.count() == 0:
        return left.limit(0)
    n = num_partitions or shuffle_partitions(8, left)
    return _filter_join(left, keys, left_on, right_on, anti=False,
                        num_partitions=n)


def _filter_join(
    left: rd.Dataset,
    keys: rd.Dataset,
    left_on: str,
    right_on: str,
    anti: bool,
    num_partitions: int,
) -> rd.Dataset:
    """Bucketed EXISTS / NOT-EXISTS engine under :func:`semi_join` and
    :func:`anti_join`: tag left payload rows side=0 and right DISTINCT
    keys side=1 (null-padded to the left schema so the union is
    type-exact), ONE ``hash(key) % P`` groupby co-locates each key's
    rows with its membership bit, and a vectorized ``is_in`` per bucket
    keeps (semi) or drops (anti) matches.

    Why not the native hash ``Dataset.join``: a shuffle partition that
    receives ZERO left rows loses its schema and Acero rejects the key
    FieldRef — guaranteed once P exceeds the left row count (a 13-row
    candidate set at 16 partitions) and reachable at any scale under
    key skew. Buckets only exist where rows exist, so the bucket shape
    cannot manufacture an empty side. Cost is the same single co-shuffle
    of (payload + key) rows the native join pays.

    Null semantics match SQL EXISTS: a null left key never matches —
    dropped by semi, KEPT by anti."""
    import numpy as np

    lat = arrow_types(left)
    names, types = list(lat), list(lat.values())
    key_type = lat[left_on]
    n = num_partitions

    def tag_left(batch: pa.Table) -> pa.Table:
        b = batch.select(names).append_column(
            "__side", pa.array(np.zeros(batch.num_rows, dtype=np.int8)))
        return b.append_column("__bucket", _key_buckets(b, left_on, n))

    def tag_right(batch: pa.Table) -> pa.Table:
        k = batch[right_on]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        if k.type != key_type:
            k = pc.cast(k, key_type)
        cols = {name: (k if name == left_on else
                       pa.nulls(batch.num_rows, type=typ))
                for name, typ in zip(names, types)}
        t = pa.table(cols).append_column(
            "__side", pa.array(np.ones(batch.num_rows, dtype=np.int8)))
        return t.append_column("__bucket", _key_buckets(t, left_on, n))

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        keys.map_batches(tag_right, batch_format="pyarrow"))

    def in_bucket(group: pa.Table) -> pa.Table:
        side = group["__side"]
        lrows = group.filter(pc.equal(side, 0))
        rkeys = group.filter(pc.equal(side, 1))[left_on]
        if isinstance(rkeys, pa.ChunkedArray):
            rkeys = rkeys.combine_chunks()
        # drop null keys from the set: Arrow's is_in matches null to
        # null, but SQL EXISTS equality never does
        matched = pc.fill_null(
            pc.is_in(lrows[left_on], value_set=rkeys.drop_null()), False)
        mask = pc.invert(matched) if anti else matched
        return lrows.filter(mask).drop_columns(["__side", "__bucket"])

    return tagged.groupby("__bucket").map_groups(
        in_bucket, batch_format="pyarrow")


def lookup_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str,
    payload: list[str],
    num_partitions: int,
    outer: bool = False,
) -> rd.Dataset:
    """Bucketed equi-join that attaches ``payload`` columns from a
    UNIQUE-KEYED right side to every matching left row (inner by
    default; ``outer=True`` keeps unmatched left rows with null
    payload — SQL LEFT OUTER).

    The payload-carrying sibling of :func:`_filter_join`, on the same
    tagged-union bucket shape and for the same reason: the native hash
    ``Dataset.join`` drops the schema of any shuffle partition that
    receives zero rows from one side and then rejects the key FieldRef
    — guaranteed when ``num_partitions`` exceeds a filtered side's row
    count. Buckets only exist where rows exist.

    Right keys must be unique (a dimension lookup / pre-aggregated
    side); a duplicate key in any bucket raises rather than silently
    multiplying rows. Null keys never match (SQL equality): inner
    drops them, outer keeps them with null payload.
    """
    import numpy as np

    lat = arrow_types(left)
    lnames, ltypes = list(lat), list(lat.values())
    rschema = arrow_types(right)
    ptypes = [rschema[p] for p in payload]
    key_type = ltypes[lnames.index(left_on)]
    n = num_partitions

    def tag_left(batch: pa.Table) -> pa.Table:
        b = batch.select(lnames)
        for p, t in zip(payload, ptypes):
            b = b.append_column(p, pa.nulls(batch.num_rows, type=t))
        b = b.append_column(
            "__side", pa.array(np.zeros(batch.num_rows, dtype=np.int8)))
        return b.append_column("__bucket", _key_buckets(b, left_on, n))

    def tag_right(batch: pa.Table) -> pa.Table:
        k = batch[right_on]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        if k.type != key_type:
            k = pc.cast(k, key_type)
        cols = {name: (k if name == left_on else
                       pa.nulls(batch.num_rows, type=typ))
                for name, typ in zip(lnames, ltypes)}
        t = pa.table(cols)
        for p in payload:
            t = t.append_column(p, batch[p])
        t = t.append_column(
            "__side", pa.array(np.ones(batch.num_rows, dtype=np.int8)))
        return t.append_column("__bucket", _key_buckets(t, left_on, n))

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))

    def in_bucket(group: pa.Table) -> pa.Table:
        side = group["__side"]
        lrows = group.filter(pc.equal(side, 0))
        rrows = group.filter(pc.equal(side, 1))
        rkeys = rrows[left_on]
        if isinstance(rkeys, pa.ChunkedArray):
            rkeys = rkeys.combine_chunks()
        valid = pc.is_valid(rkeys)
        if rrows.num_rows and not pc.all(valid).as_py():
            rrows = rrows.filter(valid)
            rkeys = rkeys.drop_null()
        if rrows.num_rows and pc.count_distinct(rkeys).as_py() != len(rkeys):
            raise ValueError(
                f"lookup_join right side has duplicate {right_on!r} keys")
        idx = pc.index_in(lrows[left_on], value_set=rkeys)
        out = lrows.drop_columns(list(payload))
        for p in payload:
            out = out.append_column(p, pc.take(rrows[p], idx))
        if not outer:
            out = out.filter(pc.is_valid(idx))
        return out.drop_columns(["__side", "__bucket"])

    return tagged.groupby("__bucket").map_groups(
        in_bucket, batch_format="pyarrow")


def order_priority_counts(
    orders: rd.Dataset,
    lineitem: rd.Dataset,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    returnflag: str = "R",
) -> rd.Dataset:
    """TPC-H Q4-shaped: count orders per priority having at least one
    lineitem with the given return flag — date-window filter at the
    scan, then ``semi_join`` (distinct-key shuffle, no broadcast), then
    a tiny groupby(priority) count."""
    import datetime

    lo = datetime.datetime.fromisoformat(date_lo)
    hi = datetime.datetime.fromisoformat(date_hi)

    def order_window(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(batch["o_orderdate"], pa.scalar(lo)),
            pc.less(batch["o_orderdate"], pa.scalar(hi)),
        )
        return batch.filter(mask).select(["o_orderkey", "o_orderpriority"])

    def flagged(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.equal(batch["l_returnflag"], returnflag)
        ).select(["l_orderkey"])

    win = orders.map_batches(order_window, batch_format="pyarrow")
    flag = lineitem.map_batches(flagged, batch_format="pyarrow")
    counts = (
        semi_join(win, flag, "o_orderkey", "l_orderkey")
        .groupby("o_orderpriority")
        .count()
    )
    return counts.rename_columns({"count()": "n"}).sort("o_orderpriority")


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str = "ts",
    by: str = "user_id",
    right_columns: dict[str, str] | None = None,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """As-of join (backward, inclusive): each left row gets the columns
    of the LATEST right row with ``right.on <= left.on`` and the same
    ``by`` key; unmatched left rows keep nulls (left-join semantics) —
    DuckDB's ``ASOF LEFT JOIN``, which Ray Data has no native operator
    for.

    Scale shape: ONE hash shuffle. Both sides are tagged and unioned
    under an aligned schema, bucketed by ``hash(by) % P`` (bucket count
    from ``shuffle_partitions`` — every row of one key lands in one
    bucket), and each bucket runs a vectorized ``pandas.merge_asof``
    (sort + single merge pass, ``by=`` handles per-key alignment inside
    the bucket). No per-key Python: buckets are the unit of work, not
    keys, so millions of small keys don't become millions of groups.

    ``right_columns`` maps right-side source columns to output names
    (default ``{"value": "prior_value"}``).
    """
    from ..functions.partitioning import shuffle_partitions

    right_columns = right_columns or {"value": "prior_value"}
    n = num_partitions or shuffle_partitions(8, left)
    # capture names/types as plain lists on the driver: referencing
    # ``left`` inside a UDF would pickle the whole Dataset plan into
    # every map task
    lat = arrow_types(left)
    left_names, left_types = list(lat), list(lat.values())
    out_names = list(right_columns.values())

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in left_names}
        for name in out_names:
            cols[name] = pa.nulls(batch.num_rows, type=pa.float64())
        cols["__side"] = pa.array(["L"] * batch.num_rows)
        t = pa.table(cols)
        return t

    def tag_right(batch: pa.Table) -> pa.Table:
        cols = {}
        for c, typ in zip(left_names, left_types):
            if c in (by, on):
                cols[c] = batch[c]
            else:
                cols[c] = pa.nulls(batch.num_rows, type=typ)
        for src, name in right_columns.items():
            cols[name] = pc.cast(batch[src], pa.float64())
        cols["__side"] = pa.array(["R"] * batch.num_rows)
        return pa.table(cols)

    def bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("__bucket", _key_buckets(batch, by, n))

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    ).map_batches(bucket, batch_format="pyarrow")

    def merge(df):
        import pandas as pd

        l = df[df["__side"] == "L"].sort_values([on, by]).drop(
            columns=["__side", "__bucket"] + out_names)
        r = df[df["__side"] == "R"].sort_values([on, by])[[by, on] + out_names]
        if not len(l):
            return l
        if not len(r):
            out = l.copy()
            for name in out_names:
                out[name] = float("nan")
            return out
        return pd.merge_asof(l, r, on=on, by=by, direction="backward")

    out = tagged.groupby("__bucket").map_groups(merge, batch_format="pandas")
    return out.map_batches(
        _cast_back(left_names + out_names,
                   left_types + [pa.float64()] * len(out_names)),
        batch_format="pyarrow",
    )


def _cast_back(names: list, types: list):
    """``map_batches`` fn restoring the Arrow types a pandas
    ``map_groups`` conversion widened. The bucketed union frames carry
    null-padded key columns (R rows are null in L-only columns), so
    pandas coerces int64 → float64 and the float dtype SURVIVES into the
    output even after the R rows are dropped — the values are whole
    numbers, but the driver's canonical hash stringifies ``5.0 != 5``.
    NaN → null, then cast each column back to its declared type."""
    target = list(zip(names, types))

    def cast(batch: pa.Table) -> pa.Table:
        cols = {}
        for name, typ in target:
            col = batch[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if col.type != typ:
                if pa.types.is_floating(col.type) and not pa.types.is_floating(typ):
                    col = pc.if_else(
                        pc.is_nan(col), pa.scalar(None, type=col.type), col)
                col = pc.cast(col, typ)
            cols[name] = col
        return pa.table(cols)

    return cast


def _key_buckets(batch: pa.Table, by: str, n: int) -> pa.Array:
    """Process-stable ``hash(by) % n`` bucket ids for a batch column.

    Integer nulls are filled with 0 BEFORE the numpy conversion: a null
    forces float64, which (a) rounds ints >2^53 and (b) flips the dtype
    branch, so the same key would land in different buckets depending on
    whether its block happens to contain a null — silently splitting one
    key's rows across groups. All nulls share bucket ``0 % n``.
    """
    import numpy as np

    from ..functions.hashing import stable_u64

    col = batch[by]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type) and col.null_count:
        col = col.fill_null(0)
    keys = col.to_numpy(zero_copy_only=False)
    if np.issubdtype(keys.dtype, np.integer):
        b = (np.abs(keys.astype(np.int64)) % n).astype(np.int32)
    else:
        b = np.array([stable_u64(str(k)) % n for k in keys.tolist()],
                     dtype=np.int32)
    return pa.array(b)


def window_count_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str = "ts",
    by: str = "user_id",
    before: "pd.Timedelta | str | int | float | None" = None,
    after: "pd.Timedelta | str | int | float | None" = None,
    count_column: str = "n_range",
) -> rd.Dataset:
    """Range (band) join, count-aggregated: each left row gets the COUNT
    of right rows with the same ``by`` key whose ``on`` value falls in
    ``[left.on - before, left.on + after)``. ``before``/``after`` default
    to 0 (e.g. ``before=1h, after=0`` counts the strictly-preceding
    hour). A SQL range join ``ON a.key=b.key AND b.ts BETWEEN ... ``
    has no Ray Data operator; emitting matched PAIRS would multiply
    rows by the band width, so the operator returns the windowed count
    (the aggregate pipelines actually need).

    Scale shape: ONE hash shuffle. Both sides are tagged, unioned and
    bucketed by ``hash(by) % P`` (asof_join's pattern — buckets are the
    work unit, not keys). Per bucket the count is two vectorized
    ``merge_asof`` probes against the right side's per-key cumulative
    count: ``#{r.on < t + after} - #{r.on < t - before}`` — no per-key
    Python loop, no pair materialization, cost O((L+R) log(L+R)) per
    bucket regardless of band width.
    """
    import pandas as pd

    from ..functions.partitioning import shuffle_partitions

    n = shuffle_partitions(8, left)
    lat = arrow_types(left)  # plain lists: never close over `left`
    left_names, left_types = list(lat), list(lat.values())
    on_type = left_types[left_names.index(on)]
    if pa.types.is_temporal(on_type):
        # Timedelta coercion only makes sense for temporal band columns;
        # a bare int here would be silently read as NANOSECONDS
        before = pd.Timedelta(0) if before is None else pd.Timedelta(before)
        after = pd.Timedelta(0) if after is None else pd.Timedelta(after)
    else:
        # numeric band column: plain numeric offsets, same units as `on`
        import datetime as _dt

        import numpy as np

        before = 0 if before is None else before
        after = 0 if after is None else after
        duration_types = (str, pd.Timedelta, _dt.timedelta, np.timedelta64)
        if isinstance(before, duration_types) or isinstance(after, duration_types):
            raise TypeError(
                f"column {on!r} is numeric ({on_type}); pass numeric "
                "before/after offsets, not durations"
            )
        if pa.types.is_integer(on_type):
            # fractional offsets on an integer column would be silently
            # FLOORED by the probe's dtype cast (and float64 can't hold
            # ns-epoch int64 exactly) — require integral offsets
            if not (float(before).is_integer() and float(after).is_integer()):
                raise TypeError(
                    f"column {on!r} is integer ({on_type}); "
                    "before/after must be integral"
                )
            before, after = int(before), int(after)

    def tag_left(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__side", pa.array(["L"] * batch.num_rows)
        ).append_column("__bucket", _key_buckets(batch, by, n))

    def tag_right(batch: pa.Table) -> pa.Table:
        cols = {}
        for c, typ in zip(left_names, left_types):
            if c in (by, on):
                cols[c] = batch[c]
            else:
                cols[c] = pa.nulls(batch.num_rows, type=typ)
        cols["__side"] = pa.array(["R"] * batch.num_rows)
        t = pa.table(cols)
        return t.append_column("__bucket", _key_buckets(t, by, n))

    right_names = right.schema().names
    missing = [c for c in (by, on) if c not in right_names]
    if missing:
        raise ValueError(
            f"window_count_join: right side is missing column(s) {missing}; "
            f"right schema has {right_names}"
        )
    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.select_columns([by, on]).map_batches(
            tag_right, batch_format="pyarrow")
    )

    def count_in_band(df: "pd.DataFrame") -> "pd.DataFrame":
        l = df[df["__side"] == "L"].drop(columns=["__side", "__bucket"])
        r = df.loc[df["__side"] == "R", [by, on]]
        if not len(l):
            out = l.copy()
            out[count_column] = pd.Series([], dtype="int64")
            return out
        if not len(r):
            out = l.copy()
            out[count_column] = 0
            return out
        r = r.sort_values([on, by]).reset_index(drop=True)
        # per-key running count: value at each right row = #{rows of this
        # key with on <= this row's on} (ties resolved by merge_asof
        # taking the LAST qualifying row, which carries the max count)
        r["__cum"] = r.groupby(by, sort=False, dropna=False).cumcount() + 1
        r = r.sort_values(on, kind="mergesort")

        def probe(at: "pd.Series") -> "pd.Series":
            # timedelta arithmetic upcasts to ns; merge_asof requires
            # exactly matching key dtypes (parquet timestamps are us)
            lp = l.assign(__at=at.astype(r[on].dtype)).sort_values(
                "__at", kind="mergesort")
            m = pd.merge_asof(
                lp, r, left_on="__at", right_on=on, by=by,
                direction="backward", allow_exact_matches=False,
                suffixes=("", "__r"),
            )
            return m["__cum"].fillna(0).astype("int64").set_axis(lp.index)

        hi = probe(l[on] + after)   # #{r.on < t + after}
        lo = probe(l[on] - before)  # #{r.on < t - before}
        out = l.copy()
        out[count_column] = (hi - lo).reindex(l.index)
        return out

    out = tagged.groupby("__bucket").map_groups(
        count_in_band, batch_format="pandas"
    )
    return out.map_batches(
        _cast_back(left_names + [count_column], left_types + [pa.int64()]),
        batch_format="pyarrow",
    )


def anti_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Distributed NOT-EXISTS anti-join: left rows with NO match in
    ``right``. The complement of :func:`semi_join`, on the same bucketed
    :func:`_filter_join` engine. The right side reduces to DISTINCT
    keys first: anti never multiplies rows, so this is a size trade —
    when FK-style keys repeat it shrinks the join's build side (and its
    shuffle input) to unique keys; when keys are already near-unique it
    costs roughly one extra key-column shuffle. The reduced key set is
    MATERIALIZED so the emptiness check and the join share one execution
    (see :func:`semi_join` for the empty-block rationale and probe
    order). Empty left → empty result; empty right → every left row
    survives.
    """
    from ..functions.partitioning import shuffle_partitions

    if left.limit(1).count() == 0:
        return left.limit(0)
    keys = (
        right.select_columns([right_on])
        .groupby(right_on)
        .count()
        .select_columns([right_on])
        .materialize()
    )
    if keys.count() == 0:
        return left
    n = num_partitions or shuffle_partitions(8, left)
    return _filter_join(left, keys, left_on, right_on, anti=True,
                        num_partitions=n)


def running_totals(
    events: rd.Dataset,
    by: str = "user_id",
    ts_column: str = "ts",
    value_column: str = "value",
    tiebreak: str = "event_id",
    out_column: str = "running_value",
) -> rd.Dataset:
    """Cumulative windowed aggregate: per ``by`` key, the running sum of
    ``value_column`` in (``ts_column``, ``tiebreak``) order — SQL's
    ``SUM(value) OVER (PARTITION BY key ORDER BY ts ROWS UNBOUNDED
    PRECEDING)``.

    Scale shape: ONE hash shuffle on ``hash(by) % P`` buckets; inside a
    bucket the cumsum is a single vectorized ``groupby(by).cumsum()``
    over the sorted frame (keys never become Python-level groups). The
    running sum is sequential per key by definition, so per-key work is
    inherently ordered — but keys are independent, so bucket-level
    parallelism is the correct (and maximal) distribution.
    """
    from ..functions.partitioning import shuffle_partitions

    n = shuffle_partitions(8, events)

    def bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("__bucket", _key_buckets(batch, by, n))

    def cum(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values([by, ts_column, tiebreak]).drop(columns="__bucket")
        df[out_column] = df.groupby(by, sort=False, dropna=False)[value_column].cumsum()
        return df

    cols = [c for c in (by, ts_column, tiebreak, value_column)]
    return events.select_columns(cols).map_batches(
        bucket, batch_format="pyarrow"
    ).groupby("__bucket").map_groups(cum, batch_format="pandas")


def ewma_by_key(
    events: rd.Dataset,
    alpha: float = 0.25,
    by: str = "user_id",
    ts_column: str = "ts",
    value_column: str = "value",
    tiebreak: str = "event_id",
) -> rd.Dataset:
    """Per-key exponentially-weighted moving average (recursive form,
    ``y_t = (1-α)·y_{t-1} + α·x_t``, seeded with the first value) in
    (``ts_column``, ``tiebreak``) order; returns the FINAL smoothed
    state per key — (key, n, ewma) — the classic online feature-store
    aggregate.

    Scale shape: the ``running_totals`` bucket shape — one hash shuffle
    on ``hash(key) % P``, one vectorized ``groupby(key).ewm(adjust=
    False)`` per bucket (pandas' cython scan; keys never become
    Python-level groups). Float parity: the recursive form is evaluated
    in identical IEEE float64 order by pandas, a plain left fold, and
    DuckDB's ``list_reduce(list(v ORDER BY ts, tiebreak), (acc, x) ->
    acc*(1-α) + x*α)`` — measured bit-identical; the output is rounded
    to 6 (the repo oracle convention) anyway.
    """
    import pandas as pd

    from ..functions.partitioning import shuffle_partitions

    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    n = shuffle_partitions(8, events)

    def bucket(batch: pa.Table) -> pa.Table:
        # null/NaN values AND null keys are dropped BEFORE bucketing —
        # the oracle mirrors both (`value IS NOT NULL AND NOT
        # isnan(value)` + the repo-wide null-group convention); a null
        # key surviving to pandas would make groupby drop it AND widen
        # the whole bucket's int key column to float64
        v = batch[value_column]
        ok = pc.and_kleene(pc.is_valid(v), pc.invert(pc.is_nan(v)))
        ok = pc.and_kleene(ok, pc.is_valid(batch[by]))
        batch = batch.filter(pc.fill_null(ok, False))
        return batch.append_column("__bucket", _key_buckets(batch, by, n))

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values([by, ts_column, tiebreak])
        grp = df.groupby(by, sort=True, dropna=False)
        # grouped-ewm is pandas' cython scan — one call per BUCKET, not
        # per key; result is (key, row)-multiindexed in within-group
        # sorted order, so last-per-key is the final state. Unrounded:
        # DuckDB-parity rounding happens Arrow-side below (pandas
        # .round is half-even)
        sm = grp[value_column].ewm(alpha=alpha, adjust=False).mean()
        last = sm.groupby(level=0, dropna=False).last()
        return pd.DataFrame({
            by: last.index.to_numpy(),
            "n": grp.size().to_numpy().astype("int64"),
            "ewma": last.to_numpy(),
        })

    def finish(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("ewma"), "ewma",
            pc.round(pc.cast(batch["ewma"], pa.float64()), 6,
                     round_mode="half_towards_infinity"))

    return events.select_columns(
        [by, ts_column, tiebreak, value_column]
    ).map_batches(bucket, batch_format="pyarrow").groupby(
        "__bucket").map_groups(
        per_bucket, batch_format="pandas"
    ).map_batches(finish, batch_format="pyarrow")


def returned_item_revenue(
    customer: rd.Dataset,
    orders: rd.Dataset,
    lineitem: rd.Dataset,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
    returnflag: str = "R",
    k: int = 20,
) -> rd.Dataset:
    """TPC-H Q10-shaped: top-k customers by revenue lost to returned
    items in one quarter.

    Plan: lineitem keeps only returned rows and pre-aggregates revenue
    per order AT THE SCAN (the wide fact table collapses before any
    shuffle); orders are date-windowed at the scan; orders⨝revenue is a
    hash join of two shrunken per-order streams; a groupby(custkey)
    reduces to one row per customer BEFORE the customer join, so the
    customer table joins against at most |customers| rows. Top-k is
    sort+limit on the final small aggregate.
    """
    import datetime

    from ..functions.partitioning import shuffle_partitions

    lo = datetime.datetime.fromisoformat(date_lo)
    hi = datetime.datetime.fromisoformat(date_hi)

    def returned_rev(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.equal(batch["l_returnflag"], returnflag))
        rev = pc.multiply(
            f["l_extendedprice"], pc.subtract(pa.scalar(1.0), f["l_discount"])
        )
        t = pa.table({"l_orderkey": f["l_orderkey"], "rev": rev})
        return t.group_by("l_orderkey").aggregate([("rev", "sum")])

    def order_window(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(batch["o_orderdate"], pa.scalar(lo)),
            pc.less(batch["o_orderdate"], pa.scalar(hi)),
        )
        return batch.filter(mask).select(["o_orderkey", "o_custkey"])

    n = shuffle_partitions(8, lineitem)
    rev = lineitem.map_batches(returned_rev, batch_format="pyarrow")
    win = orders.map_batches(order_window, batch_format="pyarrow")
    per_order = win.join(
        rev, join_type="inner", num_partitions=n,
        on=("o_orderkey",), right_on=("l_orderkey",),
    )
    per_cust = (
        per_order.groupby("o_custkey").sum("rev_sum")
        .rename_columns({"sum(rev_sum)": "revenue"})
    )
    joined = per_cust.join(
        customer.select_columns(["c_custkey", "c_name", "c_acctbal"]),
        join_type="inner", num_partitions=n,
        on=("o_custkey",), right_on=("c_custkey",),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": batch["o_custkey"],
            "c_name": batch["c_name"],
            "c_acctbal": batch["c_acctbal"],
            "revenue": pc.round(batch["revenue"], 2,
                                round_mode="half_towards_infinity"),
        })

    return (
        joined.map_batches(finish, batch_format="pyarrow")
        .sort(["revenue", "c_custkey"], descending=[True, False])
        .limit(k)
    )


def large_volume_customers(
    customer: rd.Dataset,
    orders: rd.Dataset,
    lineitem: rd.Dataset,
    min_qty: float = 200.0,
    k: int = 20,
) -> rd.Dataset:
    """TPC-H Q18-shaped: orders whose total lineitem quantity exceeds
    ``min_qty``, with their customer, largest first.

    Plan: quantity pre-aggregates per order inside the scan (vectorized
    Arrow group_by per batch), ONE groupby(orderkey) merges partials,
    the HAVING filter drops almost everything before the two joins, and
    both joins run against the tiny surviving order set.
    """
    from ..functions.partitioning import shuffle_partitions

    def qty_partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["l_orderkey", "l_quantity"])
        return t.group_by("l_orderkey").aggregate([("l_quantity", "sum")])

    n = shuffle_partitions(8, lineitem)
    qty = (
        lineitem.map_batches(qty_partial, batch_format="pyarrow")
        .groupby("l_orderkey").sum("l_quantity_sum")
        .rename_columns({"sum(l_quantity_sum)": "total_qty"})
        .filter(expr=f"total_qty > {min_qty}")
    )
    with_orders = qty.join(
        orders.select_columns(["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]),
        join_type="inner", num_partitions=n,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    with_cust = with_orders.join(
        customer.select_columns(["c_custkey", "c_name"]),
        join_type="inner", num_partitions=n,
        on=("o_custkey",), right_on=("c_custkey",),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_name": batch["c_name"],
            "c_custkey": batch["o_custkey"],
            "o_orderkey": batch["l_orderkey"],
            "o_orderdate": batch["o_orderdate"],
            "o_totalprice": batch["o_totalprice"],
            "total_qty": batch["total_qty"],
        })

    return (
        with_cust.map_batches(finish, batch_format="pyarrow")
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


def salted_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str | None = None,
    num_salts: int = 8,
    hot_keys: "set | None" = None,
    hot_threshold: int | None = None,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Inner hash join with HOT-KEY SALTING — result identical to
    ``Dataset.join``, but a skewed key no longer lands on one reduce
    partition. The canonicalization stages salt their aggregation
    shuffle (``stages/canonicalize.py``); this is the same cure for the
    join shuffle, where one celebrity key (a high-frequency gene symbol,
    a bot user) otherwise serializes the whole join behind one task.

    Hot LEFT keys are split across ``num_salts`` shards (salt =
    row-position mod S — any spreading works: results are salt-invariant
    by construction); matching RIGHT rows are replicated once per salt
    (the broadcast-a-sliver trade: S copies of the hot keys' right rows
    buy S-way parallelism on the skewed side). Cold keys keep salt 0 —
    zero overhead. The join key becomes ``(key, __salt)``.

    ``hot_keys`` skips detection. Otherwise hot keys are found with a
    keys-only partial-count pass over ``left`` (never the payload):
    count > ``hot_threshold`` (default: 4× the mean per-key count,
    floored at 1000). Only the keys ABOVE the threshold ever reach the
    driver (heavy hitters are few by definition, capped at ``max_hot``
    with a logged truncation — never the full distinct-key table).
    Pass a materialized or file-backed ``left`` — Ray Data re-executes
    derived lineage once per consumer.
    """
    import numpy as np

    right_on = right_on or left_on
    from ..functions.partitioning import shuffle_partitions

    n = num_partitions or shuffle_partitions(8, left)

    # inner join: either side all-empty -> empty result (the native hash
    # join breaks on schema-less empty-side blocks). Left-schema only —
    # an empty inner join has no right rows to type the right columns.
    if left.limit(1).count() == 0 or right.limit(1).count() == 0:
        return left.limit(0)

    max_hot = 100_000
    if hot_keys is None:
        def key_partial(batch: pa.Table) -> pa.Table:
            g = batch.select([left_on]).group_by(left_on).aggregate(
                [([], "count_all")]
            )
            return pa.table({left_on: g[left_on], "cnt": g["count_all"]})

        counts = (
            left.map_batches(key_partial, batch_format="pyarrow")
            .groupby(left_on).sum("cnt")
            .rename_columns({"sum(cnt)": "cnt_total"})
            .materialize()  # distinct keys; total/count/filter share one run
        )
        if hot_threshold is None:
            total = counts.sum("cnt_total") or 0
            hot_threshold = max(1000, (4 * int(total)) // max(1, counts.count()))
        # only the heavy hitters come to the driver, never the key table;
        # take_batch keeps the ORIGINAL Arrow key type — a Python
        # round-trip (take_all + pa.array) re-infers types and e.g.
        # truncates timestamp[ns] keys to [us], silently defeating the
        # is_in match (and therefore the salting) for those keys
        hot_ds = counts.filter(
            expr=f"cnt_total > {int(hot_threshold)}"
        ).limit(max_hot + 1).materialize()
        if hot_ds.count() == 0:
            key_type = arrow_types(counts)[left_on]
            hot_arr = pa.array([], type=key_type)
        else:
            hot_tbl = hot_ds.take_batch(max_hot + 1, batch_format="pyarrow")
            if hot_tbl.num_rows > max_hot:
                import logging

                logging.getLogger(__name__).warning(
                    "salted_join: >%d hot keys above threshold %d; salting "
                    "only the first %d", max_hot, hot_threshold, max_hot)
                hot_tbl = hot_tbl.slice(0, max_hot)
            hot_arr = hot_tbl[left_on].combine_chunks()
    else:
        # cast explicitly to the left key type — inference from Python
        # values can silently change the Arrow type (see above)
        key_type = arrow_types(left)[left_on]
        hot_arr = pa.array(list(hot_keys), type=key_type)
    hot = ray.put(hot_arr)

    def _is_hot_mask(column) -> pa.Array:
        hk = ray.get(hot)
        if len(hk) == 0:
            return pa.array(np.zeros(len(column), dtype=bool))
        return pc.is_in(
            column.combine_chunks() if isinstance(column, pa.ChunkedArray) else column,
            value_set=hk,
        )

    def salt_left(batch: pa.Table) -> pa.Table:
        is_hot = _is_hot_mask(batch[left_on]).to_numpy(zero_copy_only=False)
        salts = np.zeros(batch.num_rows, dtype=np.int32)
        salts[is_hot] = np.arange(int(is_hot.sum())) % num_salts
        return batch.append_column("__salt", pa.array(salts))

    def replicate_right(batch: pa.Table) -> pa.Table:
        is_hot = _is_hot_mask(batch[right_on])
        cold = batch.filter(pc.invert(is_hot))
        cold = cold.append_column(
            "__rsalt", pa.array(np.zeros(cold.num_rows, dtype=np.int32)))
        hot_rows = batch.filter(is_hot)
        parts = [cold] + [
            hot_rows.append_column(
                "__rsalt", pa.array(np.full(hot_rows.num_rows, s, dtype=np.int32)))
            for s in range(num_salts)
        ]
        return pa.concat_tables([p for p in parts if p.num_rows > 0] or [cold])

    lsalted = left.map_batches(salt_left, batch_format="pyarrow")
    rsalted = right.map_batches(replicate_right, batch_format="pyarrow")
    joined = lsalted.join(
        rsalted, join_type="inner", num_partitions=n,
        on=(left_on, "__salt"), right_on=(right_on, "__rsalt"),
    )
    return joined.drop_columns(["__salt"])


def rolling_avg(
    events: rd.Dataset,
    by: str = "user_id",
    ts_column: str = "ts",
    value_column: str = "value",
    tiebreak: str = "event_id",
    window_rows: int = 3,
    out_column: str = "rolling_avg",
) -> rd.Dataset:
    """Frame-bounded rolling mean: per ``by`` key, the average of the
    last ``window_rows`` values (current row included) in (ts, tiebreak)
    order — SQL's ``AVG(value) OVER (PARTITION BY key ORDER BY ts ROWS
    BETWEEN N-1 PRECEDING AND CURRENT ROW)``. Complements
    ``running_totals`` (unbounded frame) with the bounded-frame window.

    Same scale shape as the other window operators: ONE ``hash(by) % P``
    bucket shuffle, then a vectorized ``groupby(by).rolling`` over the
    sorted bucket — keys never become Python-level groups.
    """
    from ..functions.partitioning import shuffle_partitions

    n = shuffle_partitions(8, events)

    def bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("__bucket", _key_buckets(batch, by, n))

    def roll(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values([by, ts_column, tiebreak]).drop(columns="__bucket")
        df[out_column] = (
            df.groupby(by, sort=False, dropna=False)[value_column]
            .rolling(window_rows, min_periods=1).mean()
            .reset_index(level=0, drop=True)
        )
        return df

    cols = [by, ts_column, tiebreak, value_column]
    return events.select_columns(cols).map_batches(
        bucket, batch_format="pyarrow"
    ).groupby("__bucket").map_groups(roll, batch_format="pandas")


def _pricing_finest(lineitem: rd.Dataset) -> rd.Dataset:
    """UNROUNDED (flag, status) totals: per-batch Arrow partials → one
    real shuffle; materialized because every grouping-set level
    re-aggregates it (Ray Data has no common-subexpression reuse)."""

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        t = batch.select(["l_returnflag", "l_linestatus", "l_quantity"])
        t = t.append_column("rev", rev)
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("rev", "sum"), ("l_quantity", "count")]
        )

    return (
        lineitem.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            rd.aggregate.Sum("l_quantity_sum", alias_name="sum_qty"),
            rd.aggregate.Sum("rev_sum", alias_name="sum_rev"),
            rd.aggregate.Sum("l_quantity_count", alias_name="n"),
        )
        .materialize()
    )


def _null_out(columns: list[str]):
    def fn(batch: pa.Table) -> pa.Table:
        for c in columns:
            batch = batch.set_column(
                batch.column_names.index(c), c,
                pa.nulls(batch.num_rows, type=pa.string()),
            )
        return batch
    return fn


def _reagg_level(ds: rd.Dataset) -> rd.Dataset:
    return ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        rd.aggregate.Sum("sum_qty", alias_name="sum_qty"),
        rd.aggregate.Sum("sum_rev", alias_name="sum_rev"),
        rd.aggregate.Sum("n", alias_name="n"),
    )


def _round_levels(ds: rd.Dataset) -> rd.Dataset:
    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "sum_qty": pc.round(batch["sum_qty"], 2,
                                round_mode="half_towards_infinity"),
            "sum_rev": pc.round(batch["sum_rev"], 2,
                                round_mode="half_towards_infinity"),
            "n": pc.cast(batch["n"], pa.int64()),
        })

    return ds.map_batches(finish, batch_format="pyarrow")


def pricing_rollup(lineitem: rd.Dataset) -> rd.Dataset:
    """SQL ``GROUP BY ROLLUP(l_returnflag, l_linestatus)`` over lineitem:
    quantity/revenue totals at three nesting levels — (flag, status),
    (flag, NULL), (NULL, NULL) — in one result, NULL marking the
    rolled-up dimension.

    Scale shape: the corpus is aggregated ONCE at the finest level
    (per-batch Arrow partials → one real shuffle, exactly
    ``lineitem_pricing_summary``'s plan); every coarser level is then a
    RE-aggregation of the finest UNROUNDED result, which has one row per
    (flag, status) combination — constant-sized no matter the corpus —
    so the rollup adds only trivial shuffles over that tiny table.
    Rounding happens once at the very end (re-aggregating rounded sums
    would drift up to 0.005 × groups off the oracle's raw-row sums).
    """
    finest = _pricing_finest(lineitem)
    level1 = _reagg_level(finest.map_batches(_null_out(["l_linestatus"]),
                                             batch_format="pyarrow"))
    level2 = _reagg_level(finest.map_batches(
        _null_out(["l_returnflag", "l_linestatus"]), batch_format="pyarrow"))
    return _round_levels(finest.union(level1).union(level2))


def pricing_cube(lineitem: rd.Dataset) -> rd.Dataset:
    """SQL ``GROUP BY CUBE(l_returnflag, l_linestatus)``: all four
    grouping sets — (flag, status), (flag, ·), (·, status), (·, ·) —
    :func:`pricing_rollup`'s plan plus the (·, status) set; every level
    re-aggregates the unrounded finest table and rounds once."""
    finest = _pricing_finest(lineitem)
    level_flag = _reagg_level(finest.map_batches(
        _null_out(["l_linestatus"]), batch_format="pyarrow"))
    level_status = _reagg_level(finest.map_batches(
        _null_out(["l_returnflag"]), batch_format="pyarrow"))
    level_grand = _reagg_level(finest.map_batches(
        _null_out(["l_returnflag", "l_linestatus"]), batch_format="pyarrow"))
    return _round_levels(
        finest.union(level_flag).union(level_status).union(level_grand)
    )


def pivot_counts(
    events: rd.Dataset,
    row_key: str = "event_type",
    ts_column: str = "ts",
    days: "list[str] | None" = None,
) -> pa.Table:
    """Crosstab / PIVOT: one row per ``row_key``, one count column per
    calendar day — the wide reshaping Ray Data has no operator for.

    Scale shape: the corpus reduces with ONE (row_key, day) groupby
    (per-batch Arrow partials first), and only the aggregated table —
    |row keys| × |days| cells — is reshaped, on the driver, into the
    wide layout. The column DOMAIN is explicit (callers pass ``days``)
    so the output schema is fixed and resume/append-stable, never
    data-dependent.
    """
    import datetime

    days = days or [f"2024-01-{d:02d}" for d in range(1, 31)]

    def assign(batch: pa.Table) -> pa.Table:
        day = pc.strftime(pc.floor_temporal(batch[ts_column], unit="day"),
                          format="%Y-%m-%d")
        t = pa.table({row_key: batch[row_key], "day": day})
        return t.group_by([row_key, "day"]).aggregate([([], "count_all")])

    agg = (
        events.select_columns([row_key, ts_column])
        .map_batches(assign, batch_format="pyarrow")
        .groupby([row_key, "day"]).sum("count_all")
    )
    # the row key keeps its source type (int event codes stay int) —
    # taken from the events schema, not hardcoded string
    key_type = arrow_types(events)[row_key]
    cells = {}
    row_keys = set()
    for r in agg.take_all():          # |keys| x |days| rows - tiny
        cells[(r[row_key], r["day"])] = int(r["sum(count_all)"])
        row_keys.add(r[row_key])
    rows = sorted(row_keys)
    cols = {row_key: pa.array(rows, type=key_type)}
    for d in days:
        cols[f"d_{d.replace('-', '_')}"] = pa.array(
            [cells.get((rk, d), 0) for rk in rows], type=pa.int64())
    return pa.table(cols)


def line_priority_counts(
    orders: rd.Dataset,
    lineitem: rd.Dataset,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
) -> rd.Dataset:
    """TPC-H Q12-shaped (adapted: the testdata lineitem has no shipmode
    column, so ``l_returnflag`` plays the mode): per return flag over a
    shipdate window, how many lines belong to HIGH-priority orders
    (1-URGENT / 2-HIGH) vs the rest.

    Scale shape: lineitem filters + projects to (orderkey, flag) at the
    scan; orders projects to (orderkey, priority); ONE distributed hash
    join on orderkey (both sides large — no broadcast); then a per-batch
    partial (group flag → high/low sums, ≤ |flags| rows per batch)
    feeds a tiny final groupby."""
    import datetime

    from ..functions.partitioning import shuffle_partitions

    lo = datetime.datetime.fromisoformat(date_lo)
    hi = datetime.datetime.fromisoformat(date_hi)

    def li_window(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(batch["l_shipdate"], pa.scalar(lo)),
            pc.less(batch["l_shipdate"], pa.scalar(hi)),
        )
        return batch.filter(mask).select(["l_orderkey", "l_returnflag"])

    li = lineitem.map_batches(li_window, batch_format="pyarrow")
    # lookup_join, not the native hash join: the window filter can leave
    # fewer left rows than shuffle partitions, and the native join loses
    # the schema of empty partitions (see lookup_join)
    joined = lookup_join(
        li, orders.select_columns(["o_orderkey", "o_orderpriority"]),
        "l_orderkey", "o_orderkey", ["o_orderpriority"],
        shuffle_partitions(8, lineitem),
    )

    def partial(batch: pa.Table) -> pa.Table:
        high = pc.is_in(
            batch["o_orderpriority"],
            value_set=pa.array(["1-URGENT", "2-HIGH"]),
        )
        t = pa.table({
            "l_returnflag": batch["l_returnflag"],
            "high_line_count": pc.cast(high, pa.int64()),
            "low_line_count": pc.cast(pc.invert(high), pa.int64()),
        })
        return t.group_by("l_returnflag").aggregate(
            [("high_line_count", "sum"), ("low_line_count", "sum")])

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .sum(["high_line_count_sum", "low_line_count_sum"])
        .rename_columns({
            "sum(high_line_count_sum)": "high_line_count",
            "sum(low_line_count_sum)": "low_line_count",
        })
        .sort("l_returnflag")
    )


def customer_order_distribution(
    customer: rd.Dataset,
    orders: rd.Dataset,
    exclude_priority: str = "1-URGENT",
) -> rd.Dataset:
    """TPC-H Q13-shaped (adapted: no o_comment column, so the excluded
    class is an order priority): the distribution of per-customer order
    counts INCLUDING customers with zero qualifying orders — c_count →
    how many customers placed exactly that many orders.

    Scale shape: orders filter + groupby(custkey).count() reduces the
    big side to one row per customer BEFORE any join; customer LEFT
    OUTER joins that small aggregate (zero-order customers survive with
    a null count → 0); the distribution is a second tiny groupby. No
    row ever carries payload beyond (key, count)."""
    from ..functions.partitioning import shuffle_partitions

    per_cust = (
        orders.filter(
            expr=f"o_orderpriority != {exclude_priority!r}")
        .groupby("o_custkey")
        .count()
        .rename_columns({"count()": "c_count"})
    )
    # lookup_join (outer), not the native left_outer join: the priority
    # filter can empty per_cust's shuffle partitions, and the native
    # join loses the schema of empty partitions (see lookup_join)
    joined = lookup_join(
        customer.select_columns(["c_custkey"]), per_cust,
        "c_custkey", "o_custkey", ["c_count"],
        shuffle_partitions(8, customer), outer=True,
    )

    def zero_fill(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": batch["c_custkey"],
            "c_count": pc.coalesce(batch["c_count"], pa.scalar(0)),
        })

    return (
        joined.map_batches(zero_fill, batch_format="pyarrow")
        .groupby("c_count")
        .count()
        .rename_columns({"count()": "custdist"})
        .sort(["custdist", "c_count"], descending=[True, True])
    )


def small_quantity_revenue(
    lineitem: rd.Dataset,
    part_small: pa.Table,
    brand: str = "Brand#11",
    quantity_factor: float = 0.2,
    years: float = 7.0,
) -> rd.Dataset:
    """TPC-H Q17-shaped (adapted: no p_container, brand alone selects
    the parts): average yearly revenue lost if small orders —
    quantity below ``quantity_factor`` x the part's mean quantity —
    were no longer filled.

    Scale shape: the brand's part keys are a SMALL set → broadcast
    semi-filter prunes lineitem at the scan (only the brand's rows
    survive, ∝ brand selectivity); the pruned projection is
    materialized ONCE for its two consumers (per-part mean, final
    filter); per-part means are a per-batch partial → small groupby;
    the mean thresholds broadcast back (one row per brand part) so the
    final pass is a vectorized lookup + sum — no second shuffle."""
    import numpy as np

    keys = part_small.filter(
        pc.equal(part_small["p_brand"], brand)).select(["p_partkey"])
    pruned = broadcast_join(
        lineitem.select_columns(
            ["l_partkey", "l_quantity", "l_extendedprice"]),
        keys, "l_partkey", "p_partkey",
    ).materialize()

    def qty_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "l_partkey": batch["l_partkey"],
            "qty": batch["l_quantity"],
            "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
        })
        return t.group_by("l_partkey").aggregate([("qty", "sum"), ("n", "sum")])

    means = (
        pruned.map_batches(qty_partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .sum(["qty_sum", "n_sum"])
        .take_all()  # one row per brand part — small by construction
    )
    thresh = {r["l_partkey"]: quantity_factor * r["sum(qty_sum)"] / r["sum(n_sum)"]
              for r in means}
    thresh_ref = ray.put(thresh)

    def rev_partial(batch: pa.Table) -> pa.Table:
        th = ray.get(thresh_ref)
        limits = pa.array([th.get(k) for k in batch["l_partkey"].to_pylist()],
                          type=pa.float64())
        mask = pc.less(pc.cast(batch["l_quantity"], pa.float64()), limits)
        total = pc.sum(pc.if_else(mask, batch["l_extendedprice"],
                                  pa.scalar(0.0)))
        total = total.as_py() or 0.0
        return pa.table({"rev": pa.array([total], type=pa.float64())})

    total = sum(r["rev"] for r in
                pruned.map_batches(rev_partial, batch_format="pyarrow")
                .take_all())
    import ray.data as _rd

    # DuckDB round() is half-away-from-zero; Python's round() banks
    rounded = pc.round(pa.scalar(total / years), 2,
                       round_mode="half_towards_infinity")
    return _rd.from_arrow(pa.table({
        "avg_yearly": pa.array([rounded.as_py()], type=pa.float64()),
    }))


def inactive_customer_balances(
    customer: rd.Dataset,
    orders: rd.Dataset,
    nations: tuple = (1, 3, 5, 7, 9),
    order_priority: str = "1-URGENT",
) -> rd.Dataset:
    """TPC-H Q22-shaped (adapted: no c_phone, so the country-code prefix
    set is a nationkey set, and — because this testdata gives every
    customer orders — "never placed an order" becomes "never placed a
    ``order_priority`` order"): per nation, the count and total balance
    of customers with above-average positive balances and no qualifying
    order.

    Scale shape: the nation filter prunes customer at the scan; the
    positive-balance average is ONE streaming aggregate (a scalar);
    candidates anti-join the priority-filtered orders on custkey (the
    right side reduces to distinct keys first — see :func:`anti_join`);
    the final rollup is a per-batch partial → tiny groupby."""
    cust = customer.filter(
        expr=f"c_nationkey in {[int(n) for n in nations]}"
    ).select_columns(["c_custkey", "c_nationkey", "c_acctbal"]).materialize()

    avg_bal = cust.filter(expr="c_acctbal > 0.0").mean("c_acctbal")
    if avg_bal is None:
        # no positive-balance customer: SQL's `> NULL` matches nothing
        nk_type = arrow_types(cust)["c_nationkey"]
        return rd.from_arrow(pa.table({
            "c_nationkey": pa.array([], type=nk_type),
            "numcust": pa.array([], type=pa.int64()),
            "totacctbal": pa.array([], type=pa.float64()),
        }))
    # re-materialize after the threshold filter: a filter can leave
    # schema-less empty blocks that the left side of a hash join rejects
    cand = cust.filter(expr=f"c_acctbal > {float(avg_bal)!r}").materialize()
    def urgent_keys(batch: pa.Table) -> pa.Table:
        # filter+project in ONE map: an expr-filter after select_columns
        # would be reordered past the projection and lose its column
        return batch.filter(
            pc.equal(batch["o_orderpriority"], order_priority)
        ).select(["o_custkey"])

    urgent = orders.map_batches(urgent_keys, batch_format="pyarrow")
    no_orders = anti_join(cand, urgent, "c_custkey", "o_custkey")

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np
        t = pa.table({
            "c_nationkey": batch["c_nationkey"],
            "numcust": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            "totacctbal": batch["c_acctbal"],
        })
        return t.group_by("c_nationkey").aggregate(
            [("numcust", "sum"), ("totacctbal", "sum")])

    def round2(batch: pa.Table) -> pa.Table:
        idx = batch.column_names.index("totacctbal")
        return batch.set_column(
            idx, "totacctbal",
            pc.round(batch["totacctbal"], 2,
                     round_mode="half_towards_infinity"))

    return (
        no_orders.map_batches(partial, batch_format="pyarrow")
        .groupby("c_nationkey")
        .sum(["numcust_sum", "totacctbal_sum"])
        .rename_columns({"sum(numcust_sum)": "numcust",
                         "sum(totacctbal_sum)": "totacctbal"})
        .map_batches(round2, batch_format="pyarrow")
        .sort("c_nationkey")
    )


def nation_pair_volume(
    lineitem: rd.Dataset,
    orders: rd.Dataset,
    customer: rd.Dataset,
    supplier_small: pa.Table,
    nation_small: pa.Table,
    nation_a: str = "NATION_3",
    nation_b: str = "NATION_7",
    date_lo: str = "1996-01-01",
    date_hi: str = "1998-01-01",
) -> rd.Dataset:
    """TPC-H Q7-shaped: shipping volume between two nations per ship
    year, in both directions (supplier in A / customer in B and vice
    versa).

    Scale shape: supplier collapses to a broadcast suppkey→nation-name
    dict RESTRICTED to the two nations, so the lineitem scan drops
    ~(N-2)/N of all lines before anything shuffles and pre-aggregates
    volume per (orderkey, supp_nation, year) — the only big join is one
    hash join orderkey↔orderkey against the (also pair-filtered)
    orders⨝customer stream, exactly Q5's plan. The pair filter
    (A→B or B→A) is a vectorized mask after the join.
    """
    import datetime

    from ..functions.partitioning import shuffle_partitions

    lo = datetime.datetime.fromisoformat(date_lo)
    hi = datetime.datetime.fromisoformat(date_hi)

    pair = {nation_a, nation_b}
    name_of = {
        k: n
        for k, n in zip(nation_small["n_nationkey"].to_pylist(),
                        nation_small["n_name"].to_pylist())
        if n in pair
    }
    supp_a = pa.array(sorted(
        s
        for s, n in zip(supplier_small["s_suppkey"].to_pylist(),
                        supplier_small["s_nationkey"].to_pylist())
        if name_of.get(n) == nation_a), type=pa.int64())
    supp_b = pa.array(sorted(
        s
        for s, n in zip(supplier_small["s_suppkey"].to_pylist(),
                        supplier_small["s_nationkey"].to_pylist())
        if name_of.get(n) == nation_b), type=pa.int64())
    supp_ref = ray.put((supp_a, supp_b))
    pair_keys = pa.array(sorted(name_of), type=pa.int64())

    def line_partial(batch: pa.Table) -> pa.Table:
        set_a, set_b = ray.get(supp_ref)
        mask = pc.and_(
            pc.greater_equal(batch["l_shipdate"], pa.scalar(lo)),
            pc.less(batch["l_shipdate"], pa.scalar(hi)),
        )
        f = batch.filter(mask)
        in_a = pc.is_in(f["l_suppkey"], value_set=set_a)
        in_b = pc.is_in(f["l_suppkey"], value_set=set_b)
        f = f.filter(pc.or_(in_a, in_b))
        rev = pc.multiply(
            f["l_extendedprice"], pc.subtract(pa.scalar(1.0), f["l_discount"]))
        t = pa.table({
            "l_orderkey": f["l_orderkey"],
            "supp_nation": pc.if_else(
                pc.is_in(f["l_suppkey"], value_set=set_a),
                pa.scalar(nation_a), pa.scalar(nation_b)),
            "l_year": pc.cast(pc.year(f["l_shipdate"]), pa.int64()),
            "volume": rev,
        })
        return t.group_by(
            ["l_orderkey", "supp_nation", "l_year"]).aggregate([("volume", "sum")])

    # same empty-block barrier as cust_pair below: the date window plus
    # the two-nation suppkey prune can leave whole lineitem blocks
    # empty, poisoning the downstream join's FieldRef resolution
    line_rev = lineitem.map_batches(
        line_partial, batch_format="pyarrow"
    ).repartition(4).materialize()

    cust_pair = customer.map_batches(
        lambda b: b.filter(pc.is_in(b["c_nationkey"], value_set=pair_keys))
        .select(["c_custkey", "c_nationkey"]),
        batch_format="pyarrow",
    # rebuilt uniform blocks before the join: the pair filter leaves
    # some blocks empty, and Ray 2.49's hash join loses FieldRef
    # resolution on schema-less empty partitions (the k_hop_pairs
    # quirk) — visible at tiny scale where whole blocks filter away
    ).repartition(2).materialize()
    n_parts = shuffle_partitions(8, orders)
    cust_nat = orders.join(
        cust_pair, join_type="inner", num_partitions=n_parts,
        on=("o_custkey",), right_on=("c_custkey",),
    )
    joined = line_rev.join(
        cust_nat.select_columns(["o_orderkey", "c_nationkey"]),
        join_type="inner", num_partitions=n_parts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    key_a = next(k for k, n in name_of.items() if n == nation_a)

    def cross_pair(batch: pa.Table) -> pa.Table:
        cust_names = pc.if_else(
            pc.equal(batch["c_nationkey"], pa.scalar(key_a)),
            pa.scalar(nation_a), pa.scalar(nation_b))
        keep = pc.invert(pc.equal(batch["supp_nation"], cust_names))
        t = pa.table({
            "supp_nation": batch["supp_nation"],
            "cust_nation": cust_names,
            "l_year": batch["l_year"],
            "volume_sum": batch["volume_sum"],
        }).filter(keep)
        return t.group_by(
            ["supp_nation", "cust_nation", "l_year"]).aggregate(
            [("volume_sum", "sum")])

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "supp_nation": batch["supp_nation"],
            "cust_nation": batch["cust_nation"],
            "l_year": batch["l_year"],
            "revenue": pc.round(batch["sum(volume_sum_sum)"], 2,
                                round_mode="half_towards_infinity"),
        })

    return (
        joined.map_batches(cross_pair, batch_format="pyarrow")
        .groupby(["supp_nation", "cust_nation", "l_year"])
        .sum("volume_sum_sum")
        .map_batches(finish, batch_format="pyarrow")
        .sort(["supp_nation", "cust_nation", "l_year"])
    )


def product_type_profit(
    lineitem: rd.Dataset,
    orders: rd.Dataset,
    part_small: pa.Table,
    supplier_small: pa.Table,
    nation_small: pa.Table,
    name_token: str = "red",
) -> rd.Dataset:
    """TPC-H Q9-shaped (adapted: the testdata has no partsupp table, so
    profit = revenue without the supplycost term): revenue from parts
    whose name contains ``name_token``, per supplier nation per order
    year.

    Scale shape: part collapses to a broadcast key SET (substring match
    evaluated once on the small side), supplier⨝nation to a broadcast
    suppkey→nation-name dict; the lineitem scan filters on the key set
    and pre-aggregates (orderkey, nation)→volume, so the only shuffle
    is one hash join against orders projected to (orderkey, year).
    """
    from ..functions.partitioning import shuffle_partitions

    match_keys = part_small.filter(
        pc.match_substring(part_small["p_name"], name_token)
    )["p_partkey"].combine_chunks()
    keys_ref = ray.put(match_keys)
    import numpy as np

    name_of = dict(zip(nation_small["n_nationkey"].to_pylist(),
                       nation_small["n_name"].to_pylist()))
    supp_sorted = supplier_small.sort_by("s_suppkey")
    supp_keys = supp_sorted["s_suppkey"].to_numpy()
    supp_nations = np.asarray(
        [name_of[n] for n in supp_sorted["s_nationkey"].to_pylist()],
        dtype=object)
    supp_ref = ray.put((supp_keys, supp_nations))

    def line_partial(batch: pa.Table) -> pa.Table:
        f = batch.filter(
            pc.is_in(batch["l_partkey"], value_set=ray.get(keys_ref)))
        keys, nations = ray.get(supp_ref)
        rev = pc.multiply(
            f["l_extendedprice"], pc.subtract(pa.scalar(1.0), f["l_discount"]))
        # vectorized suppkey→nation-name: binary search the sorted
        # broadcast key array (every lineitem suppkey exists in supplier)
        idx = np.searchsorted(keys, f["l_suppkey"].to_numpy(zero_copy_only=False))
        t = pa.table({
            "l_orderkey": f["l_orderkey"],
            "nation": pa.array(nations[idx], type=pa.string()),
            "volume": rev,
        })
        return t.group_by(["l_orderkey", "nation"]).aggregate(
            [("volume", "sum")])

    line_rev = lineitem.map_batches(line_partial, batch_format="pyarrow")

    def order_year(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "o_year": pc.cast(pc.year(batch["o_orderdate"]), pa.int64()),
        })

    n_parts = shuffle_partitions(8, orders)
    joined = line_rev.join(
        orders.map_batches(order_year, batch_format="pyarrow"),
        join_type="inner", num_partitions=n_parts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table({
            "nation": batch["nation"],
            "o_year": batch["o_year"],
            "volume_sum": batch["volume_sum"],
        }).group_by(["nation", "o_year"]).aggregate([("volume_sum", "sum")])

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "nation": batch["nation"],
            "o_year": batch["o_year"],
            "sum_profit": pc.round(batch["sum(volume_sum_sum)"], 2,
                                   round_mode="half_towards_infinity"),
        })

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby(["nation", "o_year"])
        .sum("volume_sum_sum")
        .map_batches(finish, batch_format="pyarrow")
        .sort(["nation", "o_year"], descending=[False, True])
    )


def top_supplier(
    lineitem: rd.Dataset,
    supplier_small: pa.Table,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
) -> pa.Table:
    """TPC-H Q15-shaped: the supplier(s) with maximum revenue inside a
    ship-date window.

    Scale shape: per-batch partial aggregation reduces lineitem to
    (suppkey → revenue) partials; one small groupby(suppkey) merges
    them (one row per supplier — the 1:SF smallest fact dimension);
    the max + equality filter run on that compressed aggregate, and
    supplier names attach from the broadcast dimension table. Revenue
    is rounded to 2 decimals BEFORE the max comparison so ties match
    the SQL oracle's rounded comparison exactly.
    """
    import datetime

    lo = datetime.datetime.fromisoformat(date_lo)
    hi = datetime.datetime.fromisoformat(date_hi)

    def partial(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(batch["l_shipdate"], pa.scalar(lo)),
            pc.less(batch["l_shipdate"], pa.scalar(hi)),
        )
        f = batch.filter(mask)
        rev = pc.multiply(
            f["l_extendedprice"], pc.subtract(pa.scalar(1.0), f["l_discount"]))
        return pa.table({
            "s_suppkey": f["l_suppkey"], "rev": rev,
        }).group_by("s_suppkey").aggregate([("rev", "sum")])

    revs = (
        lineitem.map_batches(partial, batch_format="pyarrow")
        .groupby("s_suppkey")
        .sum("rev_sum")
    )
    # one compressed row per supplier — safe to materialize
    rev_tbl = pa.Table.from_pandas(revs.to_pandas(), preserve_index=False)
    if rev_tbl.num_rows == 0:
        return pa.table({
            "s_suppkey": pa.array([], type=pa.int64()),
            "s_name": pa.array([], type=pa.string()),
            "total_revenue": pa.array([], type=pa.float64()),
        })
    total = pc.round(rev_tbl["sum(rev_sum)"], 2,
                     round_mode="half_towards_infinity")
    best = pc.max(total)
    keep = pc.equal(total, best)
    winners = pa.table({
        "s_suppkey": rev_tbl["s_suppkey"], "total_revenue": total,
    }).filter(keep)
    names = dict(zip(supplier_small["s_suppkey"].to_pylist(),
                     supplier_small["s_name"].to_pylist()))
    out = pa.table({
        "s_suppkey": winners["s_suppkey"],
        "s_name": pa.array(
            [names.get(k) for k in winners["s_suppkey"].to_pylist()],
            type=pa.string()),
        "total_revenue": winners["total_revenue"],
    })
    return out.sort_by("s_suppkey")


def disjunctive_revenue(
    lineitem: rd.Dataset,
    part_small: pa.Table,
    branches: list[tuple[str, int, int, float, float]] = (
        ("Brand#11", 1, 5, 1.0, 11.0),
        ("Brand#12", 1, 10, 10.0, 20.0),
        ("Brand#13", 1, 15, 20.0, 30.0),
    ),
) -> pa.Table:
    """TPC-H Q19-shaped: revenue from lines matching ANY of several
    (brand, size range, quantity range) branch predicates.

    Scale shape: each branch's part predicate is evaluated ONCE on the
    broadcast part table, collapsing to a per-branch partkey set; each
    lineitem batch computes a vectorized OR over ``is_in`` + quantity
    range masks and reduces to one partial row — zero shuffles.
    """
    branch_keys = []
    for brand, size_lo, size_hi, qty_lo, qty_hi in branches:
        mask = pc.and_(
            pc.equal(part_small["p_brand"], brand),
            pc.and_(
                pc.greater_equal(part_small["p_size"], pa.scalar(size_lo)),
                pc.less_equal(part_small["p_size"], pa.scalar(size_hi)),
            ),
        )
        keys = part_small.filter(mask)["p_partkey"].combine_chunks()
        branch_keys.append((keys, float(qty_lo), float(qty_hi)))
    keys_ref = ray.put(branch_keys)

    def partial(batch: pa.Table) -> pa.Table:
        keep = None
        for keys, qty_lo, qty_hi in ray.get(keys_ref):
            m = pc.and_(
                pc.is_in(batch["l_partkey"], value_set=keys),
                pc.and_(
                    pc.greater_equal(batch["l_quantity"], pa.scalar(qty_lo)),
                    pc.less_equal(batch["l_quantity"], pa.scalar(qty_hi)),
                ),
            )
            keep = m if keep is None else pc.or_(keep, m)
        f = batch.filter(keep)
        rev = pc.sum(pc.multiply(
            f["l_extendedprice"], pc.subtract(pa.scalar(1.0), f["l_discount"])))
        return pa.table({
            "revenue": pa.array(
                [rev.as_py() if rev.is_valid else 0.0], type=pa.float64()),
        })

    parts = lineitem.map_batches(partial, batch_format="pyarrow")
    sums = parts.sum("revenue")
    total = 0.0 if sums is None else sums
    rounded = pc.round(pa.scalar(total), 2, round_mode="half_towards_infinity")
    return pa.table({"revenue": pa.array([rounded.as_py()], type=pa.float64())})


def national_market_share(
    lineitem: rd.Dataset,
    orders: rd.Dataset,
    customer: rd.Dataset,
    part_small: pa.Table,
    supplier_small: pa.Table,
    nation_small: pa.Table,
    region_small: pa.Table,
    target_nation: str = "NATION_5",
    region: str = "ASIA",
    part_type: str = "ECONOMY",
    date_lo: str = "1996-01-01",
    date_hi: str = "1998-01-01",
) -> rd.Dataset:
    """TPC-H Q8-shaped: the target nation's share of revenue for one
    part type sold to customers in one region, per order year.

    Scale shape: part and supplier collapse to broadcast structures
    (a matching-partkey set; a suppkey→is-target-nation flag map);
    lineitem filters on the part set at the scan and pre-aggregates
    (orderkey → volume, target_volume); orders⨝customer is a hash join
    restricted to region customers; the final orderkey join matches the
    two shrunken streams and a per-year conditional-sum ratio finishes.
    """
    import datetime

    from ..functions.partitioning import shuffle_partitions

    lo = datetime.datetime.fromisoformat(date_lo)
    hi = datetime.datetime.fromisoformat(date_hi)

    part_keys = part_small.filter(
        pc.equal(part_small["p_type"], part_type)
    )["p_partkey"].combine_chunks()
    part_ref = ray.put(part_keys)

    name_of = dict(zip(nation_small["n_nationkey"].to_pylist(),
                       nation_small["n_name"].to_pylist()))
    target_supp = {
        s
        for s, n in zip(supplier_small["s_suppkey"].to_pylist(),
                        supplier_small["s_nationkey"].to_pylist())
        if name_of.get(n) == target_nation
    }
    supp_ref = ray.put(pa.array(sorted(target_supp), type=pa.int64()))

    rkey = region_small.filter(pc.equal(region_small["r_name"], region))[
        "r_regionkey"]
    region_nations = nation_small.filter(
        pc.is_in(nation_small["n_regionkey"], value_set=rkey.combine_chunks())
    )["n_nationkey"].combine_chunks()

    def line_partial(batch: pa.Table) -> pa.Table:
        f = batch.filter(
            pc.is_in(batch["l_partkey"], value_set=ray.get(part_ref)))
        rev = pc.multiply(
            f["l_extendedprice"], pc.subtract(pa.scalar(1.0), f["l_discount"]))
        is_target = pc.is_in(f["l_suppkey"], value_set=ray.get(supp_ref))
        t = pa.table({
            "l_orderkey": f["l_orderkey"],
            "volume": rev,
            "target_volume": pc.if_else(is_target, rev, pa.scalar(0.0)),
        })
        return t.group_by("l_orderkey").aggregate(
            [("volume", "sum"), ("target_volume", "sum")])

    line_rev = lineitem.map_batches(line_partial, batch_format="pyarrow")

    def order_window(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(batch["o_orderdate"], pa.scalar(lo)),
            pc.less(batch["o_orderdate"], pa.scalar(hi)),
        )
        f = batch.filter(mask)
        return pa.table({
            "o_orderkey": f["o_orderkey"],
            "o_custkey": f["o_custkey"],
            "o_year": pc.cast(pc.year(f["o_orderdate"]), pa.int64()),
        })

    cust_region = customer.map_batches(
        lambda b: b.filter(
            pc.is_in(b["c_nationkey"], value_set=region_nations))
        .select(["c_custkey"]),
        batch_format="pyarrow",
    )
    n_parts = shuffle_partitions(8, orders)
    order_year = orders.map_batches(order_window, batch_format="pyarrow").join(
        cust_region, join_type="inner", num_partitions=n_parts,
        on=("o_custkey",), right_on=("c_custkey",),
    )
    joined = line_rev.join(
        order_year.select_columns(["o_orderkey", "o_year"]),
        join_type="inner", num_partitions=n_parts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_year": batch["o_year"],
            "volume_sum": batch["volume_sum"],
            "target_volume_sum": batch["target_volume_sum"],
        }).group_by("o_year").aggregate(
            [("volume_sum", "sum"), ("target_volume_sum", "sum")])

    def finish(batch: pa.Table) -> pa.Table:
        share = pc.divide(batch["sum(target_volume_sum_sum)"],
                          batch["sum(volume_sum_sum)"])
        return pa.table({
            "o_year": batch["o_year"],
            "mkt_share": pc.round(share, 6,
                                  round_mode="half_towards_infinity"),
        })

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_year")
        .sum(["volume_sum_sum", "target_volume_sum_sum"])
        .map_batches(finish, batch_format="pyarrow")
        .sort("o_year")
    )


def parts_supplier_counts(
    lineitem: rd.Dataset,
    part_small: pa.Table,
    supplier_small: pa.Table,
    exclude_brand: str = "Brand#11",
    sizes: tuple[int, ...] = (1, 7, 14, 21, 28, 35, 42, 49),
) -> rd.Dataset:
    """TPC-H Q16-shaped (adapted: the testdata has no partsupp table,
    so the part↔supplier relation comes from lineitem, and the
    excluded-supplier predicate is a negative account balance instead
    of a complaints comment): how many DISTINCT suppliers ship each
    (brand, type, size) combination, excluding one brand, a size list,
    and bad-standing suppliers.

    Scale shape: part attributes broadcast as partkey→(brand, type,
    size) restricted to qualifying parts; excluded suppliers broadcast
    as a key set; each lineitem batch filters + attaches attributes and
    locally dedups, so the only shuffle is the global distinct on
    (brand, type, size, suppkey) followed by a tiny count groupby.
    """
    mask = pc.and_(
        pc.invert(pc.equal(part_small["p_brand"], exclude_brand)),
        pc.is_in(part_small["p_size"],
                 value_set=pa.array(list(sizes), type=pa.int64())),
    )
    import numpy as np

    keep_parts = part_small.filter(mask).sort_by("p_partkey")
    part_keys = keep_parts["p_partkey"].to_numpy()
    part_keys_pa = keep_parts["p_partkey"].combine_chunks()
    part_attrs = (
        np.asarray(keep_parts["p_brand"].to_pylist(), dtype=object),
        np.asarray(keep_parts["p_type"].to_pylist(), dtype=object),
        keep_parts["p_size"].to_numpy().astype(np.int64),
    )
    attrs_ref = ray.put((part_keys, part_keys_pa, part_attrs))
    bad_supp = supplier_small.filter(
        pc.less(supplier_small["s_acctbal"], pa.scalar(0.0))
    )["s_suppkey"].combine_chunks()
    bad_ref = ray.put(bad_supp)

    def attach(batch: pa.Table) -> pa.Table:
        keys, keys_pa, (brands, types, sizes) = ray.get(attrs_ref)
        f = batch.filter(pc.and_(
            pc.invert(pc.is_in(batch["l_suppkey"],
                               value_set=ray.get(bad_ref))),
            pc.is_in(batch["l_partkey"], value_set=keys_pa),
        ))
        # vectorized partkey→attrs: binary search the sorted broadcast
        # key array (rows were just filtered to keys that exist in it)
        idx = np.searchsorted(keys, f["l_partkey"].to_numpy(zero_copy_only=False))
        t = pa.table({
            "p_brand": pa.array(brands[idx], type=pa.string()),
            "p_type": pa.array(types[idx], type=pa.string()),
            "p_size": pa.array(sizes[idx], type=pa.int64()),
            "s_suppkey": f["l_suppkey"],
        })
        # local dedup before the shuffle
        return t.group_by(
            ["p_brand", "p_type", "p_size", "s_suppkey"]).aggregate([])

    distinct = (
        lineitem.map_batches(attach, batch_format="pyarrow")
        .groupby(["p_brand", "p_type", "p_size", "s_suppkey"])
        .count()
    )

    def drop_count(batch: pa.Table) -> pa.Table:
        return batch.select(["p_brand", "p_type", "p_size"])

    return (
        distinct.map_batches(drop_count, batch_format="pyarrow")
        .groupby(["p_brand", "p_type", "p_size"])
        .count()
        .rename_columns({"count()": "supplier_cnt"})
        .sort(["supplier_cnt", "p_brand", "p_type", "p_size"],
              descending=[True, False, False, False])
    )


def user_lag(
    events: rd.Dataset,
    user_column: str = "user_id",
    ts_column: str = "ts",
    value_column: str = "value",
    id_column: str = "event_id",
) -> rd.Dataset:
    """Per-user LAG window: each event paired with the user's previous
    event value (event-time order, id tiebreak) and the delta.

    Returns (event_id, user_id, value, prev_value, delta); the first
    event of a user has null prev_value/delta — LAG(value) OVER
    (PARTITION BY user ORDER BY ts, id) semantics.

    Scale shape: the ``sessionize`` bucket shape — ONE hash shuffle on
    ``hash(user) % P``, then fully vectorized in-bucket work (one sort,
    one ``groupby(user).shift(1)``); per-user Python calls never happen,
    so 10^8 distinct users cost the same per row as 10^2.
    """
    import pandas as pd  # noqa: F401  (map_groups pandas format)

    from ..functions.partitioning import shuffle_partitions

    n = shuffle_partitions(8, events)

    def bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("__bucket", _key_buckets(batch, user_column, n))

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values([user_column, ts_column, id_column]).drop(
            columns="__bucket")
        prev = df.groupby(user_column, sort=False, dropna=False)[value_column].shift(1)
        return df.assign(
            prev_value=prev, delta=df[value_column] - prev,
        )[[id_column, user_column, value_column, "prev_value", "delta"]]

    return (
        events.select_columns([id_column, user_column, ts_column, value_column])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def rank_within(
    events: rd.Dataset,
    by: str = "user_id",
    value_column: str = "value",
    id_column: str = "event_id",
    ascending: bool = False,
) -> rd.Dataset:
    """Per-key RANK window: each row paired with its rank of
    ``value_column`` within its ``by`` partition — SQL's ``RANK() OVER
    (PARTITION BY key ORDER BY value DESC)``, tie rows sharing a rank
    and the following rank skipping (1, 1, 3, ...).

    Returns (id, by, value, rnk). ``value_column`` must be non-null,
    non-NaN (the events contract): pandas rank EXCLUDES missing values
    while SQL RANK still assigns them a rank, so a missing value here
    fails loudly at the int64 cast instead of silently diverging.

    Scale shape: the ``user_lag`` bucket shape — ONE hash shuffle on
    ``hash(by) % P``, then one vectorized ``groupby(by).rank('min')``
    per bucket; keys never become Python-level groups, so 10^8
    distinct keys cost the same per row as 10^2.
    """
    import pandas as pd  # noqa: F401  (map_groups pandas format)

    from ..functions.partitioning import shuffle_partitions

    n = shuffle_partitions(8, events)

    def bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("__bucket", _key_buckets(batch, by, n))

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.drop(columns="__bucket")
        rnk = df.groupby(by, sort=False, dropna=False)[value_column].rank(
            method="min", ascending=ascending)
        return df.assign(rnk=rnk.astype("int64"))[
            [id_column, by, value_column, "rnk"]]

    return (
        events.select_columns([id_column, by, value_column])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def ntile_summary(
    events: rd.Dataset,
    by: str = "event_type",
    value_column: str = "value",
    id_column: str = "event_id",
    tiles: int = 4,
) -> rd.Dataset:
    """Per-key NTILE window, summarized: rows of each ``by`` partition
    are split into ``tiles`` position-buckets in (value, id) order with
    SQL NTILE semantics (the first ``count % tiles`` buckets get one
    extra row), then each (key, tile) reports its row count and value
    range. Equivalent to ``NTILE(t) OVER (PARTITION BY key ORDER BY
    value, id)`` followed by a GROUP BY (key, tile).

    Returns (by, tile, n, min_value, max_value), tile 1-based.

    Scale shape: ONE hash shuffle on ``hash(by) % P``; in-bucket the
    tile index is pure vectorized arithmetic over ``cumcount`` and
    ``transform('size')`` (no per-key Python), and the summary is one
    grouped aggregate — output is O(#keys × tiles), not O(rows).
    """
    import numpy as np
    import pandas as pd  # noqa: F401  (map_groups pandas format)

    from ..functions.partitioning import shuffle_partitions

    n = shuffle_partitions(8, events)

    def bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("__bucket", _key_buckets(batch, by, n))

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values([by, value_column, id_column]).drop(
            columns="__bucket")
        grp = df.groupby(by, sort=False, dropna=False)
        pos = grp.cumcount().to_numpy()
        size = grp[id_column].transform("size").to_numpy()
        # SQL NTILE: quotient q rows per tile, the first r tiles get q+1
        q, r = size // tiles, size % tiles
        big = r * (q + 1)  # rows covered by the q+1-sized tiles
        tile = np.where(
            pos < big,
            pos // np.maximum(q + 1, 1),
            r + (pos - big) // np.maximum(q, 1),
        ).astype(np.int64) + 1
        out = (
            df.assign(tile=tile)
            .groupby([by, "tile"], sort=True)
            .agg(
                n=(id_column, "size"),
                min_value=(value_column, "min"),
                max_value=(value_column, "max"),
            )
            .reset_index()
        )
        out["n"] = out["n"].astype("int64")
        return out

    return (
        events.select_columns([id_column, by, value_column])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def waiting_suppliers(
    lineitem: rd.Dataset,
    orders: rd.Dataset,
    supplier_small: pa.Table,
    late_days: int = 60,
) -> rd.Dataset:
    """TPC-H Q21-shaped (adapted: the testdata has no
    receipt/commitdate, so "late" = shipped more than ``late_days``
    after the order date): suppliers who were the ONLY late supplier in
    a finished multi-supplier order, counted per supplier.

    The existential pair (EXISTS another supplier / NOT EXISTS another
    late supplier) collapses to per-order aggregates over globally
    distinct (orderkey, suppkey, late) rows: n_supp >= 2, n_late == 1,
    and the blamed supplier is min(late suppkey) (unique when
    n_late == 1).

    Scale shape: one hash join orderkey↔orderkey against 'F'-status
    orders projected to (key, date); a per-batch LOCAL dedup compresses
    the joined stream before the global (orderkey, suppkey) max-late
    groupby; the per-order reduce runs over one row per (order,
    supplier) with per-batch partials; the final per-supplier count is
    a tiny shuffle and names attach from the broadcast dimension.
    """
    import datetime

    from ..functions.partitioning import shuffle_partitions

    late_delta = pa.scalar(datetime.timedelta(days=late_days))

    def orders_f(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.equal(batch["o_orderstatus"], "F"))
        return pa.table({
            "o_orderkey": f["o_orderkey"],
            "o_orderdate": f["o_orderdate"],
        })

    n_parts = shuffle_partitions(8, orders)
    joined = lineitem.join(
        orders.map_batches(orders_f, batch_format="pyarrow"),
        join_type="inner", num_partitions=n_parts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def local_dedup(batch: pa.Table) -> pa.Table:
        late = pc.cast(
            pc.greater(batch["l_shipdate"],
                       pc.add(batch["o_orderdate"], late_delta)),
            pa.int64())
        t = pa.table({
            "l_orderkey": batch["l_orderkey"],
            "l_suppkey": batch["l_suppkey"],
            "late": late,
        })
        return t.group_by(["l_orderkey", "l_suppkey"]).aggregate(
            [("late", "max")])

    def per_order_partial(batch: pa.Table) -> pa.Table:
        late = pc.cast(batch["max(late_max)"], pa.bool_())
        t = pa.table({
            "l_orderkey": batch["l_orderkey"],
            "n_supp": pa.array([1] * batch.num_rows, type=pa.int64()),
            "n_late": pc.cast(late, pa.int64()),
            "late_supp": pc.if_else(late, batch["l_suppkey"],
                                    pa.scalar(None, type=pa.int64())),
        })
        return t.group_by("l_orderkey").aggregate(
            [("n_supp", "sum"), ("n_late", "sum"), ("late_supp", "min")])

    def blame(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(batch["sum(n_supp_sum)"], pa.scalar(2)),
            pc.equal(batch["sum(n_late_sum)"], pa.scalar(1)),
        )
        f = batch.filter(keep)
        return pa.table({"s_suppkey": f["min(late_supp_min)"]}).group_by(
            "s_suppkey").aggregate([([], "count_all")])

    names = dict(zip(supplier_small["s_suppkey"].to_pylist(),
                     supplier_small["s_name"].to_pylist()))
    names_ref = ray.put(names)

    def attach_name(batch: pa.Table) -> pa.Table:
        nm = ray.get(names_ref)
        return pa.table({
            "s_name": pa.array(
                [nm.get(k) for k in batch["s_suppkey"].to_pylist()],
                type=pa.string()),
            "numwait": batch["sum(count_all)"],
        })

    from ray.data.aggregate import Min, Sum

    return (
        joined
        .map_batches(local_dedup, batch_format="pyarrow")
        .groupby(["l_orderkey", "l_suppkey"])
        .max("late_max")
        .map_batches(per_order_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(
            Sum("n_supp_sum", ignore_nulls=True),
            Sum("n_late_sum", ignore_nulls=True),
            Min("late_supp_min", ignore_nulls=True),
        )
        .map_batches(blame, batch_format="pyarrow")
        .groupby("s_suppkey")
        .sum("count_all")
        .map_batches(attach_name, batch_format="pyarrow")
        .sort(["numwait", "s_name"], descending=[True, False])
    )


def _xy_moment_partial(group_column: str, x_column: str, y_column: str):
    """Per-batch grouped (n, Σx, Σy, Σx², Σy², Σxy) moment partial —
    the shared map stage of every grouped second-moment statistic
    (Pearson, regression): six partial columns per (batch, group), one
    vectorized Arrow groupby, rows with a null in either column dropped
    first (SQL pairwise semantics)."""

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[x_column]
        y = batch[y_column]
        ok = pc.and_(pc.is_valid(x), pc.is_valid(y))
        f = batch.filter(ok)
        x = pc.cast(f[x_column], pa.float64())
        y = pc.cast(f[y_column], pa.float64())
        t = pa.table({
            "g": f[group_column],
            "n": pa.array([1] * f.num_rows, type=pa.int64()),
            "sx": x,
            "sy": y,
            "sxx": pc.multiply(x, x),
            "syy": pc.multiply(y, y),
            "sxy": pc.multiply(x, y),
        })
        return t.group_by("g").aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")])

    return partial


def grouped_pearson(
    ds: rd.Dataset,
    group_column: str,
    x_column: str,
    y_column: str,
) -> rd.Dataset:
    """Grouped second-moment statistics: per group, sample stddev of x
    and the Pearson correlation corr(x, y).

    Returns (group, n, stddev_x, corr) with both stats rounded to 6
    decimals (sample semantics, n-1 denominators — SQL
    ``stddev_samp`` / ``corr``). Groups with n < 2 or zero variance get
    null, matching SQL.

    Scale shape: the moment vector (n, Σx, Σy, Σx², Σy², Σxy) is
    computed per batch with one vectorized Arrow groupby — six partial
    columns per (batch, group) — and merged by ONE tiny groupby
    shuffle; the corpus never moves. Rows with a null in either column
    are dropped first (SQL pairwise semantics).
    """

    partial = _xy_moment_partial(group_column, x_column, y_column)

    def finish(batch: pa.Table) -> pa.Table:
        import numpy as np

        n = batch["sum(n_sum)"].to_numpy().astype(np.float64)
        sx = batch["sum(sx_sum)"].to_numpy()
        sy = batch["sum(sy_sum)"].to_numpy()
        sxx = batch["sum(sxx_sum)"].to_numpy()
        syy = batch["sum(syy_sum)"].to_numpy()
        sxy = batch["sum(sxy_sum)"].to_numpy()
        with np.errstate(invalid="ignore", divide="ignore"):
            var_x = (sxx - sx * sx / n) / (n - 1.0)
            var_y = (syy - sy * sy / n) / (n - 1.0)
            cov = (sxy - sx * sy / n) / (n - 1.0)
            stddev_x = np.sqrt(var_x)
            corr = cov / np.sqrt(var_x * var_y)
        stddev_x = np.where(n >= 2, stddev_x, np.nan)
        corr = np.where((n >= 2) & (var_x > 0) & (var_y > 0), corr, np.nan)
        return pa.table({
            group_column: batch["g"],
            "n": pc.cast(batch["sum(n_sum)"], pa.int64()),
            "stddev_x": pc.round(
                pa.array(stddev_x, type=pa.float64(), from_pandas=True), 6,
                round_mode="half_towards_infinity"),
            "corr": pc.round(
                pa.array(corr, type=pa.float64(), from_pandas=True), 6,
                round_mode="half_towards_infinity"),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .sum(["n_sum", "sx_sum", "sy_sum", "sxx_sum", "syy_sum", "sxy_sum"])
        .map_batches(finish, batch_format="pyarrow")
        .sort(group_column)
    )


def grouped_regression(
    ds: rd.Dataset,
    group_column: str,
    x_column: str,
    y_column: str,
) -> rd.Dataset:
    """Per-group simple linear regression y = slope·x + intercept:
    (group, n, slope, intercept, r2), population semantics matching SQL
    ``regr_slope`` / ``regr_intercept`` / ``regr_r2``. Groups with zero
    x-variance get null slope/intercept/r2 (SQL's 0/0); r2 is also null
    when y has zero variance.

    Scale shape: the same shared (n, Σx, Σy, Σx², Σy², Σxy) moment
    partial as ``grouped_pearson`` — one vectorized Arrow groupby per
    batch, ONE tiny merge shuffle, closed-form finalize; the corpus
    never moves.
    """
    partial = _xy_moment_partial(group_column, x_column, y_column)

    def finish(batch: pa.Table) -> pa.Table:
        import numpy as np

        n = batch["sum(n_sum)"].to_numpy().astype(np.float64)
        sx = batch["sum(sx_sum)"].to_numpy()
        sy = batch["sum(sy_sum)"].to_numpy()
        sxx = batch["sum(sxx_sum)"].to_numpy()
        syy = batch["sum(syy_sum)"].to_numpy()
        sxy = batch["sum(sxy_sum)"].to_numpy()
        with np.errstate(invalid="ignore", divide="ignore"):
            ssx = n * sxx - sx * sx      # n² · var_pop(x)
            ssy = n * syy - sy * sy
            spxy = n * sxy - sx * sy
            slope = spxy / ssx
            intercept = (sy - slope * sx) / n
            r2 = (spxy * spxy) / (ssx * ssy)
        ok_x = ssx > 0
        slope = np.where(ok_x, slope, np.nan)
        intercept = np.where(ok_x, intercept, np.nan)
        # DuckDB regr_r2 for var(y)=0 with var(x)>0 is 1.0 (the fit is
        # exact), not NULL — verified against duckdb directly
        r2 = np.where(ok_x & (ssy > 0), r2,
                      np.where(ok_x & (ssy == 0), 1.0, np.nan))

        def r6(v):
            return pc.round(
                pa.array(v, type=pa.float64(), from_pandas=True), 6,
                round_mode="half_towards_infinity")

        return pa.table({
            group_column: batch["g"],
            "n": pc.cast(batch["sum(n_sum)"], pa.int64()),
            "slope": r6(slope),
            "intercept": r6(intercept),
            "r2": r6(r2),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .sum(["n_sum", "sx_sum", "sy_sum", "sxx_sum", "syy_sum", "sxy_sum"])
        .map_batches(finish, batch_format="pyarrow")
        .sort(group_column)
    )


def windowed_distinct_users(
    events: rd.Dataset,
    window: str = "hour",
    ts_column: str = "ts",
    user_column: str = "user_id",
) -> rd.Dataset:
    """Distinct-actor telemetry: per tumbling window, the number of
    DISTINCT users active (the hourly-actives report).

    Returns (window_start, n_users).

    Scale shape: the ``parts_supplier_counts`` two-level distinct —
    each batch LOCALLY dedups (window, user) after a vectorized
    ``floor_temporal``, so the shuffle moves at most one row per
    (window, user) per batch instead of one per event; the global
    groupby finishes the dedup and a per-batch count partial collapses
    to the tiny final (window → count) merge. No per-key Python work
    anywhere; exact counts (the HLL sketch stage is the approximate
    sibling for cardinalities that don't fit a shuffle).
    """

    def assign_dedup(batch: pa.Table) -> pa.Table:
        ws = pc.floor_temporal(batch[ts_column], unit=window)
        t = pa.table({
            "window_start": ws,
            user_column: batch[user_column],
        })
        return t.group_by(["window_start", user_column]).aggregate([])

    def count_partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["window_start"])
        t = t.append_column(
            "n_users", pa.array([1] * t.num_rows, type=pa.int64()))
        return t.group_by("window_start").aggregate([("n_users", "sum")])

    return (
        events.select_columns([ts_column, user_column])
        .map_batches(assign_dedup, batch_format="pyarrow")
        .groupby(["window_start", user_column])
        .count()
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("window_start")
        .sum("n_users_sum")
        .rename_columns({"sum(n_users_sum)": "n_users"})
        .sort("window_start")
    )


def _region_supplier_keys(
    supplier_small: pa.Table,
    nation_small: pa.Table,
    region_small: pa.Table,
    region: str,
) -> pa.Table:
    """Suppliers located in ``region``, with their nation names attached.

    All three inputs are dimension tables (the smallest sides of the
    TPC-H schema), so this runs driver-side on plain Arrow and the
    result is broadcast — never shuffled.
    """
    rkey = region_small.filter(
        pc.equal(region_small["r_name"], region))["r_regionkey"]
    nations = nation_small.filter(
        pc.is_in(nation_small["n_regionkey"],
                 value_set=rkey.combine_chunks()))
    name_of = dict(zip(nations["n_nationkey"].to_pylist(),
                       nations["n_name"].to_pylist()))
    sup = supplier_small.filter(
        pc.is_in(supplier_small["s_nationkey"],
                 value_set=nations["n_nationkey"].combine_chunks()))
    return sup.append_column(
        "n_name",
        pa.array([name_of[k] for k in sup["s_nationkey"].to_pylist()],
                 type=pa.string()))


def min_cost_supplier(
    lineitem: rd.Dataset,
    part_small: pa.Table,
    supplier_small: pa.Table,
    nation_small: pa.Table,
    region_small: pa.Table,
    region: str = "ASIA",
    max_size: int = 25,
    part_type: str = "STANDARD",
    limit: int = 100,
) -> pa.Table:
    """TPC-H Q2-shaped (adapted: no partsupp table in this schema, so
    supply cost per (part, supplier) is derived as the minimum observed
    unit price ``l_extendedprice / l_quantity`` over lineitem): for each
    qualifying part, the region supplier offering it cheapest.

    Scale shape: part filter and region-supplier attributes collapse to
    broadcast structures; lineitem is pre-filtered at the batch on both
    key sets, per-batch ``group_by(part, supp).min`` partials compress
    the stream before the one (part, supp) shuffle; the per-part argmin
    runs as a second grouped min over that compressed table plus an
    equality filter — rows never exceed the qualifying part × region
    supplier pairs actually trading. Ties break to the smallest suppkey
    so the result is deterministic under any partitioning.
    """
    fpart = part_small.filter(pc.and_(
        pc.less_equal(part_small["p_size"], pa.scalar(max_size)),
        pc.equal(part_small["p_type"], part_type),
    ))
    brand_of = dict(zip(fpart["p_partkey"].to_pylist(),
                        fpart["p_brand"].to_pylist()))
    rsup = _region_supplier_keys(
        supplier_small, nation_small, region_small, region)
    part_ref = ray.put(fpart["p_partkey"].combine_chunks())
    supp_ref = ray.put(rsup["s_suppkey"].combine_chunks())

    def partial(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.and_(
            pc.is_in(batch["l_partkey"], value_set=ray.get(part_ref)),
            pc.is_in(batch["l_suppkey"], value_set=ray.get(supp_ref)),
        ))
        cost = pc.divide(f["l_extendedprice"], f["l_quantity"])
        return pa.table({
            "l_partkey": f["l_partkey"], "l_suppkey": f["l_suppkey"],
            "cost": cost,
        }).group_by(["l_partkey", "l_suppkey"]).aggregate([("cost", "min")])

    # one row per (qualifying part, region supplier) pair after the merge
    pair_cost = (
        lineitem.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_partkey", "l_suppkey"])
        .min("cost_min")
    )

    def per_part(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": batch["l_partkey"], "minc": batch["min(cost_min)"],
        }).group_by("l_partkey").aggregate([("minc", "min")])

    best = dict()
    for b in (
        pair_cost.map_batches(per_part, batch_format="pyarrow")
        .groupby("l_partkey").min("minc_min")
        .iter_batches(batch_format="pyarrow")
    ):
        best.update(zip(b["l_partkey"].to_pylist(),
                        b["min(minc_min)"].to_pylist()))

    # equality filter against the broadcast per-part minimum, then the
    # deterministic suppkey tie-break — still one row per part max
    best_ref = ray.put(best)

    def winners(batch: pa.Table) -> pa.Table:
        bm = ray.get(best_ref)
        mins = pa.array([bm.get(k) for k in batch["l_partkey"].to_pylist()],
                        type=pa.float64())
        f = batch.filter(pc.equal(batch["min(cost_min)"], mins))
        return pa.table({
            "l_partkey": f["l_partkey"], "l_suppkey": f["l_suppkey"],
            "cost": f["min(cost_min)"],
        }).group_by("l_partkey").aggregate(
            [("l_suppkey", "min"), ("cost", "min")])

    pick = (
        pair_cost.map_batches(winners, batch_format="pyarrow")
        .groupby("l_partkey")
        .min(["l_suppkey_min", "cost_min"])
    )
    # one row per qualifying part — bounded by the part dimension slice
    tbl = pa.Table.from_pandas(pick.to_pandas(), preserve_index=False)
    if tbl.num_rows == 0:
        return pa.table({
            "s_acctbal": pa.array([], type=pa.float64()),
            "s_name": pa.array([], type=pa.string()),
            "n_name": pa.array([], type=pa.string()),
            "p_partkey": pa.array([], type=pa.int64()),
            "p_brand": pa.array([], type=pa.string()),
            "supply_cost": pa.array([], type=pa.float64()),
        })
    sattr = {
        k: (b, n, m)
        for k, b, n, m in zip(rsup["s_suppkey"].to_pylist(),
                              rsup["s_acctbal"].to_pylist(),
                              rsup["n_name"].to_pylist(),
                              rsup["s_name"].to_pylist())
    }
    supps = tbl["min(l_suppkey_min)"].to_pylist()
    out = pa.table({
        "s_acctbal": pa.array([sattr[s][0] for s in supps],
                              type=pa.float64()),
        "s_name": pa.array([sattr[s][2] for s in supps], type=pa.string()),
        "n_name": pa.array([sattr[s][1] for s in supps], type=pa.string()),
        "p_partkey": tbl["l_partkey"],
        "p_brand": pa.array(
            [brand_of[k] for k in tbl["l_partkey"].to_pylist()],
            type=pa.string()),
        "supply_cost": pc.round(tbl["min(cost_min)"], 2,
                                round_mode="half_towards_infinity"),
    })
    out = out.sort_by([
        ("s_acctbal", "descending"), ("n_name", "ascending"),
        ("s_name", "ascending"), ("p_partkey", "ascending"),
    ])
    return out.slice(0, limit)


def important_parts(
    lineitem: rd.Dataset,
    supplier_small: pa.Table,
    nation_small: pa.Table,
    region_small: pa.Table,
    region: str = "EUROPE",
    fraction: float = 0.001,
) -> pa.Table:
    """TPC-H Q11-shaped (adapted: no partsupp, so a part's "stock value"
    is the discounted revenue its region suppliers shipped): parts whose
    value exceeds ``fraction`` of the total across all parts.

    Scale shape: the region-supplier filter is a broadcast key set;
    per-batch partials compress lineitem to (partkey → value) before the
    one part-keyed shuffle; the global total is a scalar aggregate over
    that compressed table (one number to the driver), broadcast back
    into a vectorized threshold filter. The materialized result is the
    filtered part dimension slice, never the fact table.
    """
    rsup = _region_supplier_keys(
        supplier_small, nation_small, region_small, region)
    supp_ref = ray.put(rsup["s_suppkey"].combine_chunks())

    def partial(batch: pa.Table) -> pa.Table:
        f = batch.filter(
            pc.is_in(batch["l_suppkey"], value_set=ray.get(supp_ref)))
        v = pc.multiply(
            f["l_extendedprice"], pc.subtract(pa.scalar(1.0), f["l_discount"]))
        return pa.table({
            "p_partkey": f["l_partkey"], "v": v,
        }).group_by("p_partkey").aggregate([("v", "sum")])

    val = (
        lineitem.map_batches(partial, batch_format="pyarrow")
        .groupby("p_partkey")
        .sum("v_sum")
    )
    total = val.sum("sum(v_sum)")
    thresh = fraction * (total or 0.0)

    def keep(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.greater(batch["sum(v_sum)"], pa.scalar(thresh)))
        return pa.table({
            "p_partkey": f["p_partkey"],
            "part_value": pc.round(f["sum(v_sum)"], 2,
                                   round_mode="half_towards_infinity"),
        })

    out = pa.Table.from_pandas(
        val.map_batches(keep, batch_format="pyarrow").to_pandas(),
        preserve_index=False)
    if out.num_rows == 0:
        return pa.table({
            "p_partkey": pa.array([], type=pa.int64()),
            "part_value": pa.array([], type=pa.float64()),
        })
    return out.sort_by([
        ("part_value", "descending"), ("p_partkey", "ascending")])


def promotable_suppliers(
    lineitem: rd.Dataset,
    part_small: pa.Table,
    supplier_small: pa.Table,
    nation_small: pa.Table,
    nation: str = "NATION_3",
    name_prefix: str = "blue ",
    date_lo: str = "1997-01-01",
    date_hi: str = "1998-01-01",
    ratio: float = 2.0,
) -> pa.Table:
    """TPC-H Q20-shaped (adapted: no partsupp availability column, so a
    supplier "has excess stock" of a part when its all-time shipped
    quantity exceeds ``ratio`` × the quantity shipped inside the date
    window): suppliers in ``nation`` holding excess stock of any part
    whose name starts with ``name_prefix``.

    Scale shape: the part-name prefix filter collapses to a broadcast
    key set; one pass over lineitem computes BOTH conditional sums
    (all-time and windowed quantity) as per-batch partials, so the
    correlated-subquery shape of the original costs a single
    (supp, part) shuffle; the survivor filter and nation semi-join run
    on the compressed aggregate.
    """
    import datetime

    lo = datetime.datetime.fromisoformat(date_lo)
    hi = datetime.datetime.fromisoformat(date_hi)

    fpart = part_small.filter(
        pc.starts_with(part_small["p_name"], name_prefix))
    part_ref = ray.put(fpart["p_partkey"].combine_chunks())

    def partial(batch: pa.Table) -> pa.Table:
        f = batch.filter(
            pc.is_in(batch["l_partkey"], value_set=ray.get(part_ref)))
        in_win = pc.and_(
            pc.greater_equal(f["l_shipdate"], pa.scalar(lo)),
            pc.less(f["l_shipdate"], pa.scalar(hi)),
        )
        return pa.table({
            "l_suppkey": f["l_suppkey"], "l_partkey": f["l_partkey"],
            "q_all": f["l_quantity"],
            "q_win": pc.if_else(in_win, f["l_quantity"], pa.scalar(0.0)),
        }).group_by(["l_suppkey", "l_partkey"]).aggregate(
            [("q_all", "sum"), ("q_win", "sum")])

    qty = (
        lineitem.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_suppkey", "l_partkey"])
        .sum(["q_all_sum", "q_win_sum"])
    )

    def survivors(batch: pa.Table) -> pa.Table:
        q_all = batch["sum(q_all_sum)"]
        q_win = batch["sum(q_win_sum)"]
        mask = pc.and_(
            pc.greater(q_win, pa.scalar(0.0)),
            pc.greater(q_all, pc.multiply(pa.scalar(ratio), q_win)),
        )
        t = batch.filter(mask).select(["l_suppkey"])
        return t.group_by("l_suppkey").aggregate([])

    keep = set()
    for b in qty.map_batches(
            survivors, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        keep.update(b["l_suppkey"].to_pylist())

    name_of = dict(zip(nation_small["n_nationkey"].to_pylist(),
                       nation_small["n_name"].to_pylist()))
    rows = [
        (nm, bal)
        for k, nm, bal, nk in zip(supplier_small["s_suppkey"].to_pylist(),
                                  supplier_small["s_name"].to_pylist(),
                                  supplier_small["s_acctbal"].to_pylist(),
                                  supplier_small["s_nationkey"].to_pylist())
        if k in keep and name_of.get(nk) == nation
    ]
    rows.sort()
    return pa.table({
        "s_name": pa.array([r[0] for r in rows], type=pa.string()),
        "s_acctbal": pa.array([r[1] for r in rows], type=pa.float64()),
    })


def funnel(
    events: rd.Dataset,
    steps: tuple[str, ...] = ("signup", "click", "purchase"),
    user_column: str = "user_id",
    ts_column: str = "ts",
    type_column: str = "event_type",
) -> rd.Dataset:
    """Ordered conversion funnel: a user reaches step i+1 with their
    first ``steps[i+1]`` event STRICTLY after their first step-i
    timestamp (first = min ts of the qualifying events). Returns one row
    per step: (step, event_type, users).

    Scale shape: prune to the step event types + 3 columns at the scan
    (callers should push ``isin(steps)`` into the parquet filter), ONE
    ``hash(user) % P`` bucket shuffle — every user's rows land in one
    bucket, so per-bucket step counts sum exactly — then vectorized
    pandas inside each bucket (grouped mins + a map-threshold filter per
    step, no per-user Python calls), and a step-keyed groupby over
    P × len(steps) partial rows.
    """
    import pandas as pd

    from ..functions.partitioning import shuffle_partitions

    steps = tuple(steps)
    if not steps:
        raise ValueError("funnel needs at least one step")
    n = shuffle_partitions(8, events)

    def bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.is_in(batch[type_column], value_set=pa.array(list(steps)))
        batch = batch.filter(keep)
        return batch.append_column(
            "__bucket", _key_buckets(batch, user_column, n))

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        counts = []
        cur = (
            df[df[type_column] == steps[0]]
            .groupby(user_column, sort=False, dropna=False)[ts_column].min()
        )
        counts.append(len(cur))
        for s in steps[1:]:
            sub = df[df[type_column] == s]
            thr = sub[user_column].map(cur)  # NaT where user not reached
            sub = sub[sub[ts_column] > thr]
            cur = sub.groupby(user_column, sort=False, dropna=False)[ts_column].min()
            counts.append(len(cur))
        return pd.DataFrame({
            "step": pd.array(range(1, len(steps) + 1), dtype="int64"),
            "users": pd.array(counts, dtype="int64"),
        })

    agg = (
        events.select_columns([user_column, ts_column, type_column])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("step").sum("users")
    )

    name_of = {i + 1: s for i, s in enumerate(steps)}

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        step = pc.cast(batch["step"], pa.int64())
        return pa.table({
            "step": step,
            "event_type": pa.array(
                [name_of[i] for i in step.to_pylist()], type=pa.string()),
            "users": pc.cast(batch["sum(users)"], pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def cohort_retention(
    events: rd.Dataset,
    signup_type: str = "signup",
    user_column: str = "user_id",
    ts_column: str = "ts",
    type_column: str = "event_type",
) -> rd.Dataset:
    """Weekly cohort retention: cohort_week = epoch-week of a user's
    FIRST ``signup_type`` event; for every week ≥ that in which the user
    has ANY event, count the user once. Returns
    (cohort_week, week_offset, users) — the classic retention triangle.

    Weeks are integer epoch-microseconds // 1 week — identical integer
    math to the oracle's ``floor(epoch(ts)/604800)``, no calendar/WEEK
    locale semantics to disagree over. Scale shape: ONE hash(user) % P
    bucket shuffle (each user lands wholly in one bucket, so per-bucket
    DISTINCT (user, cohort, offset) rows make the final per-cell sums
    exact — the two-level local-dedup shape of the windowed
    distinct-actives operator), vectorized pandas inside the bucket,
    then one tiny (cohort, offset) groupby over P × cells partials.
    """
    import pandas as pd

    from ..functions.partitioning import shuffle_partitions

    week_us = 7 * 24 * 3600 * 1_000_000
    n = shuffle_partitions(8, events)

    def bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__bucket", _key_buckets(batch, user_column, n))

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        wk = df[ts_column].astype("int64") // week_us
        df = df.assign(__wk=wk)
        cohorts = (
            df[df[type_column] == signup_type]
            .groupby(user_column, sort=False)["__wk"].min()
        )
        cw = df[user_column].map(cohorts)
        act = df.assign(__cw=cw)[cw.notna() & (wk >= cw)]
        cells = (
            act[[user_column, "__cw", "__wk"]].drop_duplicates()
            .assign(__off=lambda d: (d["__wk"] - d["__cw"]).astype("int64"))
            .groupby(["__cw", "__off"], sort=False).size()
        )
        out = cells.reset_index(name="users")
        return pd.DataFrame({
            "cohort_week": out["__cw"].astype("int64"),
            "week_offset": out["__off"].astype("int64"),
            "users": out["users"].astype("int64"),
        })

    agg = (
        events.select_columns([user_column, ts_column, type_column])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["cohort_week", "week_offset"]).sum("users")
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "cohort_week": pc.cast(batch["cohort_week"], pa.int64()),
            "week_offset": pc.cast(batch["week_offset"], pa.int64()),
            "users": pc.cast(batch["sum(users)"], pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def event_transitions(
    events: rd.Dataset,
    user_column: str = "user_id",
    ts_column: str = "ts",
    type_column: str = "event_type",
    order_tiebreak: str = "event_id",
) -> rd.Dataset:
    """First-order Markov transition counts over per-user event
    sequences: (from_type, to_type, n) where n counts consecutive event
    pairs in (ts, tiebreak) order — the behavioral sequence-mining
    primitive behind funnels and next-event prediction.

    Scale shape: ONE hash(user) % P bucket shuffle; inside a bucket one
    sort + one grouped ``shift(-1)`` produces every user's successor
    column vectorized (no per-user Python calls); per-bucket
    (from, to) partial counts collapse in a final tiny groupby over
    P × |types|² rows.
    """
    import pandas as pd

    from ..functions.partitioning import shuffle_partitions

    n = shuffle_partitions(8, events)

    def bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__bucket", _key_buckets(batch, user_column, n))

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values([user_column, ts_column, order_tiebreak],
                            kind="mergesort")
        nxt = df.groupby(user_column, sort=False, dropna=False)[type_column].shift(-1)
        pairs = pd.DataFrame({
            "from_type": df[type_column], "to_type": nxt,
        }).dropna(subset=["to_type"])
        out = (pairs.groupby(["from_type", "to_type"], sort=False, dropna=False)
               .size().reset_index(name="n"))
        out["n"] = out["n"].astype("int64")
        return out

    agg = (
        events.select_columns(
            [user_column, ts_column, type_column, order_tiebreak])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["from_type", "to_type"]).sum("n")
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "from_type": batch["from_type"],
            "to_type": batch["to_type"],
            "n": pc.cast(batch["sum(n)"], pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def grouped_outliers(
    ds: rd.Dataset,
    group_column: str = "event_type",
    value_column: str = "value",
    z: float = 3.0,
) -> rd.Dataset:
    """Per-group z-score outlier counts: (group, n, n_outliers) where an
    outlier has |x − mean| > z · stddev_pop within its group — the
    data-quality gate run on a metric column before training on it.

    Two streaming passes, no per-group Python: pass 1 accumulates naive
    moments (n, Σx, Σx²) per (batch, group) vectorized and merges them
    in a tiny groupby (the ``grouped_pearson`` shape); the per-group
    stats — #groups rows, small BY CONTRACT of a grouping column — are
    collected once and CLOSED OVER for pass 2's counting scan (broadcast
    lookup, not a shuffle join). Moments, mean and stddev use the exact
    float order of the SQL oracle (m = s1/n; sd = √max(0, s2/n − m·m)),
    so the hard threshold test agrees bit-for-bit.

    Null values are ignored in both the moments and the counts.
    """
    import math

    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    def moments(batch: pa.Table) -> pa.Table:
        # Arrow-native group_by keys NULL groups directly (no factorize
        # NaN sentinel to repair — the grouped_pearson partial shape)
        keep = pc.is_valid(batch[value_column])
        batch = batch.filter(keep)
        v = pc.cast(batch[value_column], pa.float64())
        t = pa.table({
            group_column: batch[group_column],
            "v": v,
            "v2": pc.multiply(v, v),
        })
        g = t.group_by(group_column).aggregate(
            [("v", "count"), ("v", "sum"), ("v2", "sum")])
        return pa.table({
            group_column: g[group_column],
            "n": pc.cast(g["v_count"], pa.int64()),
            "s1": g["v_sum"],
            "s2": g["v2_sum"],
        })

    merged = (
        ds.select_columns([group_column, value_column])
        .map_batches(moments, batch_format="pyarrow")
        .groupby(group_column).sum(["n", "s1", "s2"])
        .take_all()
    )
    stats = {}
    for r in merged:
        n = int(r["sum(n)"])
        if n == 0:
            continue
        m = r["sum(s1)"] / n
        sd = math.sqrt(max(0.0, r["sum(s2)"] / n - m * m))
        stats[r[group_column]] = (n, m, sd)

    def count_outliers(batch: pa.Table) -> pa.Table:
        keep = pc.is_valid(batch[value_column])
        batch = batch.filter(keep)
        keys = batch[group_column].to_numpy(zero_copy_only=False)
        vals = pc.cast(batch[value_column], pa.float64()).to_numpy(
            zero_copy_only=False)
        groups = batch[group_column]
        if isinstance(groups, pa.ChunkedArray):
            groups = groups.combine_chunks()
        inv, uniq = pd.factorize(keys, use_na_sentinel=False)
        k = len(uniq)
        # factorize surfaces a NULL key as NaN, but the stats dict (built
        # from Arrow group_by rows) keys it as None — normalize the probe
        norm = [None if (isinstance(g, float) and g != g) else g
                for g in uniq]
        means = np.array([stats.get(g, (0, 0.0, 0.0))[1] for g in norm])
        sds = np.array([stats.get(g, (0, 0.0, 0.0))[2] for g in norm])
        is_out = np.abs(vals - means[inv]) > z * sds[inv]
        key_vals = [None if (isinstance(v, float) and v != v) else v
                    for v in list(uniq)]
        return pa.table({
            group_column: pa.array(key_vals, type=groups.type),
            "n_outliers": pa.array(
                np.bincount(inv, weights=is_out, minlength=k).astype(
                    np.int64), type=pa.int64()),
        })

    agg = (
        ds.select_columns([group_column, value_column])
        .map_batches(count_outliers, batch_format="pyarrow")
        .groupby(group_column).sum("n_outliers")
    )

    def finish(batch: pa.Table) -> pa.Table:
        keys = batch[group_column].to_pylist()
        return pa.table({
            group_column: batch[group_column],
            "n": pa.array([stats[g][0] for g in keys], type=pa.int64()),
            "n_outliers": pc.cast(batch["sum(n_outliers)"], pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def nation_coverage(
    customer: rd.Dataset,
    supplier: rd.Dataset,
    min_cust_bal: float = 9000.0,
    min_supp_bal: float = 9000.0,
) -> rd.Dataset:
    """FULL OUTER reconciliation: per nation, how many high-balance
    customers vs high-balance suppliers — nations present on only ONE
    side survive with a zero on the other (the join type every audit
    "compare two aggregates, keep all keys" report needs; the rest of
    the suite covers inner/left/semi/anti/asof/range/broadcast/salted).

    Both sides collapse to #nations-sized aggregates BEFORE the join
    (per-batch partial count → one small groupby each), so the full
    outer join touches two tiny tables regardless of corpus size.

    Returns (nationkey, n_cust, n_supp) with nulls coalesced to 0.
    """

    def cust_partial(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.greater(batch["c_acctbal"],
                                    pa.scalar(min_cust_bal)))
        g = f.group_by("c_nationkey").aggregate([([], "count_all")])
        return pa.table({
            "nationkey": g["c_nationkey"],
            "n_cust": pc.cast(g["count_all"], pa.int64()),
        })

    def supp_partial(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.greater(batch["s_acctbal"],
                                    pa.scalar(min_supp_bal)))
        g = f.group_by("s_nationkey").aggregate([([], "count_all")])
        return pa.table({
            "nationkey": g["s_nationkey"],
            "n_supp": pc.cast(g["count_all"], pa.int64()),
        })

    cust = (
        customer.select_columns(["c_nationkey", "c_acctbal"])
        .map_batches(cust_partial, batch_format="pyarrow")
        .groupby("nationkey").sum("n_cust")
        .rename_columns({"sum(n_cust)": "n_cust"})
        .repartition(2).materialize()
    )
    supp = (
        supplier.select_columns(["s_nationkey", "s_acctbal"])
        .map_batches(supp_partial, batch_format="pyarrow")
        .groupby("nationkey").sum("n_supp")
        .rename_columns({"sum(n_supp)": "n_supp"})
        .repartition(2).materialize()
    )

    # an ALL-empty side makes Ray's full-outer finalize KeyError on the
    # missing schema (the k_hop_pairs empty-block quirk, join flavor);
    # an empty side also makes the outer join trivially one-sided
    if cust.count() == 0:
        return supp.map_batches(
            lambda b: pa.table({
                "nationkey": b["nationkey"],
                "n_cust": pa.array([0] * b.num_rows, type=pa.int64()),
                "n_supp": pc.cast(b["n_supp"], pa.int64()),
            }),
            batch_format="pyarrow")
    if supp.count() == 0:
        return cust.map_batches(
            lambda b: pa.table({
                "nationkey": b["nationkey"],
                "n_cust": pc.cast(b["n_cust"], pa.int64()),
                "n_supp": pa.array([0] * b.num_rows, type=pa.int64()),
            }),
            batch_format="pyarrow")

    joined = cust.join(supp, join_type="full_outer", num_partitions=4,
                       on=("nationkey",))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "nationkey": batch["nationkey"],
            "n_cust": pc.fill_null(
                pc.cast(batch["n_cust"], pa.int64()), 0),
            "n_supp": pc.fill_null(
                pc.cast(batch["n_supp"], pa.int64()), 0),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def conversion_time(
    events: rd.Dataset,
    from_type: str = "view",
    to_type: str = "purchase",
    user_column: str = "user_id",
    ts_column: str = "ts",
    type_column: str = "event_type",
) -> rd.Dataset:
    """Per-user conversion latency: seconds from the user's FIRST
    ``from_type`` event to their FIRST ``to_type`` event — the
    time-to-convert metric next to the funnel's conversion count. Users
    missing either event, or whose first ``to_type`` precedes their
    first ``from_type`` (converted before exposure), are dropped.

    Returns (user, first_from, first_to, seconds).

    Scale shape: rows are filtered to the two event types AT THE SCAN
    (predicate pushdown upstream; a vectorized re-filter here keeps the
    operator self-contained), each batch folds to at most TWO partial
    rows per user present (min from-ts, min to-ts — vectorized pandas
    groupby), and one keyed min-reduce + in-bucket subtraction
    finishes; the wide event stream never shuffles.
    """
    import pandas as pd  # noqa: F401

    def partial(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[type_column],
                        value_set=pa.array([from_type, to_type]))
        t = batch.filter(mask)
        g = (
            t.group_by([user_column, type_column])
            .aggregate([(ts_column, "min")])
        )
        # positional rename: pyarrow Table.rename_columns takes a list
        names = [("first_ts" if c == f"{ts_column}_min" else c)
                 for c in g.column_names]
        return g.rename_columns(names)

    firsts = (
        events.select_columns([user_column, ts_column, type_column])
        .map_batches(partial, batch_format="pyarrow")
        .groupby([user_column, type_column]).min("first_ts")
        .rename_columns({"min(first_ts)": "first_ts"})
    )

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        w = df.pivot_table(index=user_column, columns=type_column,
                           values="first_ts", aggfunc="min")
        if from_type not in w.columns or to_type not in w.columns:
            # typed empty (user dtype from the input, not hardcoded):
            # a null-typed or mistyped empty block poisons the schema
            # union with non-empty buckets
            return pd.DataFrame({
                user_column: pd.array([], dtype=df[user_column].dtype),
                "first_from": pd.array([], dtype="datetime64[us]"),
                "first_to": pd.array([], dtype="datetime64[us]"),
                "seconds": pd.array([], dtype="float64"),
            })
        w = w.dropna(subset=[from_type, to_type])
        w = w[w[to_type] >= w[from_type]]
        out = pd.DataFrame({
            user_column: w.index,
            "first_from": w[from_type].to_numpy(),
            "first_to": w[to_type].to_numpy(),
            "seconds": (w[to_type] - w[from_type]).dt.total_seconds()
                       .to_numpy(),
        })
        return out.reset_index(drop=True)

    from ..functions.partitioning import shuffle_partitions

    n = shuffle_partitions(8, events)

    def bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__bucket", _key_buckets(batch, user_column, n))

    return (
        firsts.map_batches(bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def type_cooccurrence(
    events: rd.Dataset,
    user_column: str = "user_id",
    ts_column: str = "ts",
    type_column: str = "event_type",
) -> rd.Dataset:
    """Frequent-pair mining over (user, day) baskets: for every
    unordered pair of event types, how many baskets contain BOTH — the
    support counts the apriori/market-basket family starts from.

    Returns (type_a, type_b, n_baskets) with type_a < type_b.

    Scale shape: batches fold to DISTINCT (user, day, type) rows (the
    basket encoding — one row per basket member, never per event), one
    keyed dedup shuffle, then baskets are hash(user)-bucketed and pair
    expansion inside a bucket is ONE vectorized self-merge (baskets
    hold at most #event-types members, so the blowup is bounded by
    types² per basket); a final tiny (a, b) groupby sums supports.
    """
    import pandas as pd  # noqa: F401

    from ..functions.partitioning import shuffle_partitions

    def member_rows(batch: pa.Table) -> pa.Table:
        t = pa.table({
            user_column: batch[user_column],
            "day": pc.cast(batch[ts_column], pa.date32()),
            type_column: batch[type_column],
        })
        return t.group_by([user_column, "day", type_column]).aggregate([])

    members = (
        events.select_columns([user_column, ts_column, type_column])
        .map_batches(member_rows, batch_format="pyarrow")
        .groupby([user_column, "day", type_column]).count()
        .drop_columns(["count()"])
    )

    n = shuffle_partitions(8, events)

    def bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__bucket", _key_buckets(batch, user_column, n))

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.drop(columns="__bucket")
        m = df.merge(df, on=[user_column, "day"])
        m = m[m[f"{type_column}_x"] < m[f"{type_column}_y"]]
        out = (
            m.groupby([f"{type_column}_x", f"{type_column}_y"], sort=True)
            .size().rename("n_baskets").reset_index()
        )
        out.columns = ["type_a", "type_b", "n_baskets"]
        out["n_baskets"] = out["n_baskets"].astype("int64")
        return out

    return (
        members.map_batches(bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["type_a", "type_b"]).sum("n_baskets")
        # rename via an Arrow map: Dataset.rename_columns projects with
        # block.rename_columns, which pandas blocks (map_groups output)
        # don't have
        .map_batches(
            lambda b: pa.table({
                "type_a": b["type_a"], "type_b": b["type_b"],
                "n_baskets": pc.cast(b["sum(n_baskets)"], pa.int64()),
            }),
            batch_format="pyarrow")
    )


def watermark_window_counts(
    events: rd.Dataset,
    window_minutes: int = 60,
    lateness_minutes: int = 30,
    id_column: str = "event_id",
    ts_column: str = "ts",
    num_segments: int = 64,
) -> rd.Dataset:
    """Streaming tumbling-window counts with an allowed-lateness
    watermark, replayed deterministically over the batch table: arrival
    order is ``id_column`` (the ingest sequence), the watermark after
    arrival i is max(ts_1..ts_i), and an event is LATE — dropped from
    its finalized window — when its ts has fallen more than
    ``lateness_minutes`` behind the watermark INCLUSIVE of itself
    (a fresh maximum is never late). Returns per tumbling window
    (window_start, n_on_time, n_late); windows whose every event was
    late still appear (n_on_time 0).

    Scale shape: a DISTRIBUTED PREFIX SCAN, not a global sort — arrival
    ids are cut into ``num_segments`` contiguous segments; one groupby
    reduces each segment to its max ts (tiny), the driver prefix-maxes
    the #segments boundary values (the only sequential step, O(P)), and
    the broadcast prefixes let every segment compute its in-segment
    vectorized cummax independently. One small shuffle + one bucketed
    pass; the classic two-phase scan from parallel-prefix literature.
    """
    import numpy as np
    import pandas as pd  # noqa: F401

    import ray

    wm_lag = np.timedelta64(lateness_minutes * 60 * 1_000_000, "us")
    win = window_minutes * 60 * 1_000_000  # µs

    # segment width from the id span: ONE combined min/max scan (two
    # separate .min()/.max() calls would each execute the full pipeline)
    from ray.data.aggregate import Max, Min

    agg = events.aggregate(Min(id_column), Max(id_column))
    lo = None if agg is None else agg.get(f"min({id_column})")
    hi = None if agg is None else agg.get(f"max({id_column})")
    if lo is None:
        return rd.from_arrow(pa.table({
            "window_start": pa.array([], type=pa.timestamp("us")),
            "n_on_time": pa.array([], type=pa.int64()),
            "n_late": pa.array([], type=pa.int64()),
        }))
    width = max(1, (int(hi) - int(lo)) // num_segments + 1)

    def seg(batch: pa.Table) -> pa.Table:
        s = pc.divide(pc.subtract(batch[id_column], pa.scalar(int(lo))),
                      pa.scalar(width))
        return pa.table({
            "__seg": pc.cast(s, pa.int64()),
            id_column: batch[id_column],
            ts_column: batch[ts_column],
        })

    tagged = events.select_columns([id_column, ts_column]).map_batches(
        seg, batch_format="pyarrow")

    seg_max = {r["__seg"]: r["max(" + ts_column + ")"]
               for r in tagged.groupby("__seg").max(ts_column).take_all()}
    prefix: dict[int, "np.datetime64"] = {}
    running = None
    for s in sorted(seg_max):
        prefix[s] = running  # watermark carried INTO the segment
        m = np.datetime64(seg_max[s], "us")
        running = m if running is None else max(running, m)
    prefix_ref = ray.put(prefix)

    def per_segment(df: "pd.DataFrame") -> "pd.DataFrame":
        pre = ray.get(prefix_ref) if isinstance(
            prefix_ref, ray.ObjectRef) else prefix_ref
        df = df.sort_values(id_column)
        ts = df[ts_column].to_numpy(dtype="datetime64[us]")
        wm = np.maximum.accumulate(ts)
        carried = pre.get(int(df["__seg"].iloc[0]))
        if carried is not None:
            wm = np.maximum(wm, carried)
        late = ts < wm - wm_lag
        epoch = ts.astype("int64")
        start = (epoch // win) * win
        out = pd.DataFrame({
            "window_start": start.astype("datetime64[us]"),
            "on_time": (~late).astype("int64"),
            "late": late.astype("int64"),
        })
        g = out.groupby("window_start", sort=True).sum().reset_index()
        return g

    counted = (
        tagged.groupby("__seg")
        .map_groups(per_segment, batch_format="pandas")
        .groupby("window_start").sum(["on_time", "late"])
    )
    return counted.map_batches(
        lambda b: pa.table({
            "window_start": b["window_start"],
            "n_on_time": pc.cast(b["sum(on_time)"], pa.int64()),
            "n_late": pc.cast(b["sum(late)"], pa.int64()),
        }),
        batch_format="pyarrow")


def latest_state(
    events: rd.Dataset,
    key_column: str = "user_id",
    ts_column: str = "ts",
    tiebreak: str = "event_id",
    payload_columns: tuple[str, ...] = ("event_type", "value"),
) -> rd.Dataset:
    """SCD-1 snapshot: one row per key carrying the payload of its
    LATEST event ((ts, tiebreak) order) — the upsert/"current state"
    table a lakehouse merge maintains incrementally; computed here as
    one distributed argmax-per-key.

    Returns (key, ts, *payload_columns).

    Scale shape: each batch pre-reduces to its own per-key argmax rows
    (vectorized sort + drop_duplicates keep='last'), so the ONE keyed
    bucket shuffle carries at most #keys rows per batch, and the
    in-bucket reduce repeats the same vectorized argmax — hot keys are
    bounded per batch exactly like the canonicalization partials.
    """
    import pandas as pd  # noqa: F401

    from ..functions.partitioning import shuffle_partitions

    cols = [key_column, ts_column, tiebreak, *payload_columns]
    n = shuffle_partitions(8, events)

    def argmax_rows(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values([key_column, ts_column, tiebreak])
        return df.drop_duplicates(subset=[key_column], keep="last")

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        return argmax_rows(df)

    def bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__bucket", _key_buckets(batch, key_column, n))

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        out = argmax_rows(df.drop(columns="__bucket"))
        return out[[key_column, ts_column, *payload_columns]]

    return (
        events.select_columns(cols)
        .map_batches(partial, batch_format="pandas")
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
