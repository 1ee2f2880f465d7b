"""Mergeable sketches: HyperLogLog distinct counts, Count-Min frequencies.

At 100 TB an exact ``COUNT(DISTINCT token)`` is a vocabulary-sized
shuffle; the HLL sketch replaces it with a fixed 2^p-register state
(KB, not TB) that merges by elementwise max — the canonical mergeable
aggregate (Flajolet et al. 2007, and the sketch behind DuckDB/BigQuery
``approx_count_distinct``).

Distributed shape: each batch pre-maxes its tokens into at most 2^p
(register, rank) partial rows, ONE ``groupby(register).max`` merges the
partials, and the finalizer walks the <= 2^p-row aggregate — registers,
never values, cross the wire, and nothing larger than the register file
ever reaches the driver.

The hash is the md5-prefix ``stable_u64_md5`` (NOT a salted/random
hash), so the whole sketch — register index, leading-zero rank, the
harmonic-mean estimate and the small-range correction — is reproduced
EXACTLY by a generated DuckDB oracle (``__ray_entry__._hll_sql``):
an approximate algorithm, deterministically checkable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..functions.hashing import stable_u64_md5


def hll_partial_rows(
    values: list[str], p: int = 12
) -> tuple[np.ndarray, np.ndarray]:
    """(register, rank) arrays pre-maxed over ``values`` — at most 2^p
    rows regardless of input size. rank = leading zeros of the low
    (64-p) hash bits + 1, the HLL register update."""
    if not values:
        empty = np.empty(0, dtype=np.int64)
        return empty, empty
    shift = 64 - p
    hv = np.array(
        [stable_u64_md5(v) for v in set(values)], dtype=np.uint64
    )
    idx = (hv >> np.uint64(shift)).astype(np.int64)
    rem = hv & np.uint64((1 << shift) - 1)
    # bit_length via frexp: rem < 2^52 is exactly representable, so the
    # binary exponent IS the bit length (deterministic, no log2 rounding)
    _, exp = np.frexp(rem.astype(np.float64))
    rank = np.where(rem == 0, shift + 1, shift + 1 - exp).astype(np.int64)
    order = np.lexsort((-rank, idx))
    idx, rank = idx[order], rank[order]
    first = np.concatenate(([True], idx[1:] != idx[:-1]))
    return idx[first], rank[first]


def hll_estimate(registers: np.ndarray) -> float:
    """Classic HLL estimator over the full 2^p register file (rank 0 =
    empty register): harmonic mean with the small-range linear-counting
    correction. No large-range correction — 64-bit hashes don't
    saturate."""
    m = float(len(registers))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = float(np.sum(np.power(2.0, -registers.astype(np.float64))))
    raw = alpha * m * m / s
    zeros = float(np.count_nonzero(registers == 0))
    if zeros > 0.0 and raw <= 2.5 * m:
        return m * np.log(m / zeros)
    return raw


def approx_distinct_tokens(
    ds: rd.Dataset, column: str = "text", p: int = 12
) -> rd.Dataset:
    """One-row Dataset (estimate, occupied, m): approximate distinct
    token count over the corpus. ``occupied`` (registers hit) is exact
    and integer — a hash-stable check even where float rounding isn't.
    """
    from .textstats import _TOKEN_RE

    def partial(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for text in batch[column].to_pylist():
            if text:
                toks.extend(_TOKEN_RE.findall(text.lower()))
        idx, rank = hll_partial_rows(toks, p)
        return pa.table({
            "register": pa.array(idx, type=pa.int64()),
            "rank": pa.array(rank, type=pa.int64()),
        })

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("register").max("rank")
    )

    def finalize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = 1 << p
        registers = np.zeros(m, dtype=np.int64)
        registers[batch["register"].to_numpy(zero_copy_only=False)] = (
            batch["max(rank)"].to_numpy(zero_copy_only=False)
        )
        est = pa.table({
            "estimate": pa.array([hll_estimate(registers)], type=pa.float64()),
            "occupied": pa.array(
                [int(np.count_nonzero(registers))], type=pa.int64()
            ),
            "m": pa.array([m], type=pa.int64()),
        })
        return est.set_column(
            0, "estimate",
            pc.round(est["estimate"], 6, round_mode="half_towards_infinity"),
        )

    # the merged register file is <= 2^p rows by construction — the
    # repartition(1) feeds ALL of it to one finalize call, not the corpus
    return merged.repartition(1).map_batches(
        finalize, batch_size=(1 << p) + 1, batch_format="pyarrow"
    )


# ----------------------------------------------------------- Count-Min ---


def cms_hashes(tokens: list[str], lg_w: int, depth: int) -> np.ndarray:
    """(n, depth) register indexes: one md5 per token supplies up to four
    independent big-endian u32 words (depth <= 4), each truncated to the
    top ``lg_w`` bits — byte-for-byte the DuckDB expression
    ``('0x' || substr(md5(tok), 1+8*i, 8))::UBIGINT >> (32-lg_w)``."""
    if depth > 4:
        raise ValueError("md5 supplies at most 4 u32 words (depth <= 4)")
    digests = b"".join(
        hashlib.md5(t.encode("utf-8", "surrogatepass")).digest()
        for t in tokens
    )
    words = np.frombuffer(digests, dtype=">u4").reshape(len(tokens), 4)
    return (words[:, :depth] >> np.uint32(32 - lg_w)).astype(np.int64)


def count_min_sketch(
    ds: rd.Dataset, column: str = "text", lg_w: int = 12, depth: int = 4
) -> rd.Dataset:
    """Count-Min token-frequency sketch: at most ``depth * 2^lg_w``
    (row, register, cnt) rows. Counters merge by pure addition, so the
    sketch is identical under ANY partitioning — unlike Misra-Gries,
    whose merge is order-dependent — which is what makes an exact DuckDB
    oracle possible for an approximate counter.

    Each batch pre-sums its tokens into at most depth*2^lg_w partial
    rows (np.bincount per row), and ONE groupby-sum merges the partials;
    token strings never cross the shuffle, only fixed-size registers.
    """
    from .textstats import _TOKEN_RE

    w = 1 << lg_w

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        counts: Counter[str] = Counter()
        for text in batch[column].to_pylist():
            if text:
                counts.update(_TOKEN_RE.findall(text.lower()))
        if not counts:
            empty = pa.array([], type=pa.int64())
            return pa.table({"row": empty, "register": empty, "cnt": empty})
        toks = list(counts)
        weights = np.array([counts[t] for t in toks], dtype=np.int64)
        regs = cms_hashes(toks, lg_w, depth)
        rows, registers, cnts = [], [], []
        for i in range(depth):
            dense = np.bincount(regs[:, i], weights=weights, minlength=w)
            nz = np.nonzero(dense)[0]
            rows.append(np.full(len(nz), i, dtype=np.int64))
            registers.append(nz.astype(np.int64))
            cnts.append(dense[nz].astype(np.int64))
        return pa.table({
            "row": np.concatenate(rows),
            "register": np.concatenate(registers),
            "cnt": np.concatenate(cnts),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["row", "register"]).sum("cnt")
    )


def cms_hot_tokens(
    ds: rd.Dataset,
    column: str = "text",
    lg_w: int = 12,
    depth: int = 4,
    k: int = 20,
) -> rd.Dataset:
    """Top-``k`` tokens by Count-Min POINT-QUERY estimate (ties broken
    by token): est(tok) = min over rows of counter[hash_i(tok)], the
    classic CM upper bound (Cormode & Muthukrishnan 2005).

    Two passes over the corpus: one builds the sketch, one enumerates
    the probe set. Here the probes are the corpus' own distinct tokens
    (a vocab-sized dedup shuffle — cheap for word-like keys); at 100 TB
    you would instead probe an externally supplied candidate list and
    skip that shuffle entirely. The sketch itself is materialized to the
    driver deliberately: it is fixed-size state (<= depth * 2^lg_w rows,
    KBs), independent of input size, broadcast once via ray.put.
    """
    from .textstats import _TOKEN_RE

    w = 1 << lg_w
    cms = np.zeros((depth, w), dtype=np.int64)
    for r in count_min_sketch(ds, column, lg_w, depth).take_all():
        cms[r["row"], r["register"]] = r["sum(cnt)"]
    cms_ref = ray.put(cms)

    def distinct_partial(batch: pa.Table) -> pa.Table:
        toks: set[str] = set()
        for text in batch[column].to_pylist():
            if text:
                toks.update(_TOKEN_RE.findall(text.lower()))
        return pa.table({"token": pa.array(sorted(toks), type=pa.string())})

    def estimate(batch: pa.Table) -> pa.Table:
        sketch = ray.get(cms_ref)
        toks = batch["token"].to_pylist()
        if not toks:
            return pa.table({
                "token": pa.array([], type=pa.string()),
                "est": pa.array([], type=pa.int64()),
            })
        regs = cms_hashes(toks, lg_w, depth)
        est = sketch[np.arange(depth)[None, :], regs].min(axis=1)
        return pa.table({
            "token": batch["token"],
            "est": pa.array(est, type=pa.int64()),
        })

    probes = (
        ds.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby("token").count()
        .drop_columns(["count()"])
        .map_batches(estimate, batch_format="pyarrow")
    )
    return probes.sort(["est", "token"], descending=[True, False]).limit(k)


def grouped_approx_distinct(
    ds: rd.Dataset,
    group_column: str,
    value_column: str,
    p: int = 12,
) -> rd.Dataset:
    """Per-group approximate distinct count (grouped HyperLogLog):
    ``approx_count_distinct(value) GROUP BY group`` at 100-TB scale —
    e.g. distinct users per event type without a (group, value) shuffle.

    Distributed shape: each batch pre-maxes into at most
    ``groups_in_batch × 2^p`` (group, register, rank) rows (usually far
    fewer), ONE ``groupby(group, register).max`` merges the partials,
    and a per-GROUP finalizer walks each group's <= 2^p-row register
    file — per-group Python cost is one call per OUTPUT row, which is
    the result's own size. Same md5 hash recipe as the global sketch,
    so the DuckDB oracle reproduces the estimate exactly.
    """
    shift = 64 - p
    mask = (1 << shift) - 1
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        groups = batch[group_column].to_pylist()
        values = batch[value_column].to_pylist()
        cache: dict = {}
        best: dict = {}
        for grp, val in set(zip(groups, values)):
            if val is None or grp is None:
                # null VALUES: SQL count(DISTINCT v) ignores NULL, and
                # hashing str(None) would collide with the string "None".
                # null GROUPS: Ray's multi-key sort shuffle cannot order
                # mixed None/str keys — excluded (fill_null upstream to
                # keep them); the oracle filters both the same way
                continue
            t = cache.get(val)
            if t is None:
                h = stable_u64_md5(str(val))
                rem = h & mask
                t = (h >> shift, shift + 1 - rem.bit_length() if rem else shift + 1)
                cache[val] = t
            key = (grp, t[0])
            if best.get(key, 0) < t[1]:
                best[key] = t[1]
        # null GROUPS are kept (SQL GROUP BY keeps the NULL group) — the
        # sort is only for deterministic block layout, so order nulls last
        ks = sorted(best, key=lambda k: (k[0] is None, str(k[0]), k[1]))
        return pa.table({
            group_column: pa.array(
                [k[0] for k in ks],
                type=batch.schema.field(group_column).type,
            ),
            "register": pa.array([k[1] for k in ks], type=pa.int64()),
            "rank": pa.array([best[k] for k in ks], type=pa.int64()),
        })

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_column, "register"])
        .max("rank")
    )

    def per_group(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        registers = np.zeros(m, dtype=np.int64)
        registers[group["register"].to_numpy(zero_copy_only=False)] = (
            group["max(rank)"].to_numpy(zero_copy_only=False)
        )
        est = pa.table({
            group_column: group[group_column][:1],
            "estimate": pc.round(
                pa.array([hll_estimate(registers)], type=pa.float64()),
                6, round_mode="half_towards_infinity",
            ),
            "occupied": pa.array(
                [int(np.count_nonzero(registers))], type=pa.int64()
            ),
            "m": pa.array([m], type=pa.int64()),
        })
        return est

    return merged.groupby(group_column).map_groups(
        per_group, batch_format="pyarrow"
    )


def key_skew_report(
    ds: rd.Dataset,
    key_column: str,
    qs: tuple = (0.5, 0.9, 0.99),
) -> pa.Table:
    """Shuffle-planning diagnostic: the per-key row-count distribution of
    a prospective groupby/join key, as ONE summary row — run it BEFORE a
    wide operation to decide whether the key needs salting (the engine's
    canonicalize stage) or a broadcast side.

    Returns (n_rows, n_null_rows, n_keys, max_count, top_key, top_share,
    mean_count, p<q>_count per requested quantile, cv_count): top_key is
    the smallest key among max-count ties; top_share = max_count/n_rows;
    cv is the coefficient of variation (stddev_samp/mean, NULL for a
    single key, matching SQL) of per-key counts; quantiles use the
    repo's lower-discrete rule. NULL keys — the classic skew culprit —
    are counted in ``n_null_rows`` and excluded from the key
    distribution (the repo-wide null-group convention; a null key can't
    ride Ray's sort-based shuffle).

    Scale shape: ONE ``groupby(key).count()`` shuffle compresses rows to
    keys; the counts table is NEVER collected — moment partials (n, Σ,
    Σ², max, argmin-key-at-max) are one row per batch, and the quantile
    walk reuses the distinct-VALUE-count compression (per-key counts are
    Zipf: ~10^3 distinct count values for 10^8 keys).
    """
    import math

    import pyarrow.compute as pc

    # total row count is metadata-cheap on file-backed datasets; the
    # null-key tally falls out as total − Σ per-key counts, so nulls
    # cost no extra pass
    n_total = ds.count()
    valid = ds.select_columns([key_column]).map_batches(
        lambda t: t.filter(pc.is_valid(t[key_column])),
        batch_format="pyarrow")
    # materialized: both the moment pass and the quantile pass consume
    # it, and it is already the key-compressed table (n_keys rows, two
    # columns), not the input
    counts = valid.groupby(key_column).count().materialize()

    def partial(batch: pa.Table) -> pa.Table:
        c = np.asarray(batch["count()"].combine_chunks(), dtype=np.int64)
        if len(c) == 0:
            return pa.table({
                "n_keys": pa.array([], type=pa.int64()),
                "n_rows": pa.array([], type=pa.int64()),
                "sumsq": pa.array([], type=pa.float64()),
                "max_count": pa.array([], type=pa.int64()),
                "top_key": batch[key_column].slice(0, 0),
            })
        mx = int(c.max())
        at = np.flatnonzero(c == mx)
        keys = batch[key_column].combine_chunks().take(pa.array(at))
        top = pc.min(keys).as_py()
        return pa.table({
            "n_keys": pa.array([len(c)], type=pa.int64()),
            "n_rows": pa.array([int(c.sum())], type=pa.int64()),
            "sumsq": pa.array([float((c.astype(np.float64) ** 2).sum())],
                              type=pa.float64()),
            "max_count": pa.array([mx], type=pa.int64()),
            "top_key": pa.array([top], type=batch[key_column].type),
        })

    parts = counts.map_batches(partial, batch_format="pyarrow").take_all()
    if not parts:
        raise ValueError(
            "key_skew_report over an empty (or all-null-key) dataset")
    n_keys = sum(p["n_keys"] for p in parts)
    n_rows = sum(p["n_rows"] for p in parts)
    sumsq = sum(p["sumsq"] for p in parts)
    max_count = max(p["max_count"] for p in parts)
    top_key = min(p["top_key"] for p in parts if p["max_count"] == max_count)
    mean = n_rows / n_keys
    if n_keys > 1:
        var = (sumsq - n_keys * mean * mean) / (n_keys - 1)
        cv = math.sqrt(max(var, 0.0)) / mean
    else:
        cv = None  # SQL stddev_samp of one key is NULL, not NaN

    # lower-discrete quantiles over the (distinct count value, #keys)
    # compression — a second tiny shuffle over the counts table only
    from .sampling import exact_quantiles

    # renamed: exact_quantiles groups on the value column and its own
    # frequency column is also "count()" — the collision would make the
    # cumulative walk read frequencies as values
    qt = exact_quantiles(
        counts.rename_columns({"count()": "cnt"}), list(qs), "cnt")

    def r6(vals):
        # half-away rounding for DuckDB round() parity (Python round is
        # half-even — the established oracle convention in this repo)
        return pc.round(pa.array(vals, type=pa.float64()), 6,
                        round_mode="half_towards_infinity")

    cols: dict = {
        "n_rows": pa.array([n_rows], type=pa.int64()),
        "n_null_rows": pa.array([n_total - n_rows], type=pa.int64()),
        "n_keys": pa.array([n_keys], type=pa.int64()),
        "max_count": pa.array([max_count], type=pa.int64()),
        "top_key": pa.array([top_key]),
        "top_share": r6([max_count / n_rows]),
        "mean_count": r6([mean]),
    }
    for q, v in zip(qt["q"].to_pylist(), qt["value"].to_pylist()):
        # one column per REQUESTED quantile — p50_count / p975_count /
        # p999_count style names (trailing zeros trimmed)
        name = f"p{q * 100:g}".replace(".", "") + "_count"
        cols[name] = pa.array([v], type=pa.int64())
    cols["cv_count"] = r6([cv])
    return pa.table(cols)


def join_cardinality_report(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str | None = None,
) -> pa.Table:
    """Pre-join planning diagnostic: the EXACT output cardinality of an
    inner equi-join and where it comes from, WITHOUT running the join —
    one row: (n_left, n_right, n_keys_left, n_keys_right, n_common_keys,
    join_rows, max_key_rows, max_key): ``join_rows = Σ_k cl(k)·cr(k)``
    over common keys, ``max_key`` the smallest key among argmax ties of
    the per-key product. Run it before a big join to spot the 10^12-row
    blowup (or the skewed key that needs salting) while it still costs
    two key-compress aggregates.

    Scale shape: each side compresses to its per-key count table (ONE
    groupby shuffle each — the same shuffle the real join would pay, on
    2-column rows); the two count tables hash-join on the key (rows =
    distinct keys, not input rows) and per-batch product partials fold
    driver-side. Null keys never match in SQL and are excluded.
    """
    import pyarrow.compute as pc

    right_on = right_on or left_on

    def compress(ds: rd.Dataset, key: str, out_count: str) -> rd.Dataset:
        slim = ds.select_columns([key]).map_batches(
            lambda t, _k=key: t.filter(pc.is_valid(t[_k])),
            batch_format="pyarrow")
        return slim.groupby(key).count().map_batches(
            lambda t, _k=key, _c=out_count: pa.table(
                {"k": t[_k], _c: pc.cast(t["count()"], pa.int64())}),
            batch_format="pyarrow")

    lc = compress(left, left_on, "cl").materialize()
    rc = compress(right, right_on, "cr").materialize()

    def side_totals(ds: rd.Dataset, c: str) -> tuple[int, int]:
        rows = ds.map_batches(
            lambda t, _c=c: pa.table({
                "keys": pa.array([t.num_rows], type=pa.int64()),
                "rows": pa.array(
                    [pc.sum(t[_c]).as_py() or 0], type=pa.int64()),
            }), batch_format="pyarrow").take_all()
        return (sum(r["rows"] for r in rows), sum(r["keys"] for r in rows))

    n_left, n_keys_left = side_totals(lc, "cl")
    n_right, n_keys_right = side_totals(rc, "cr")

    joined = lc.join(rc, join_type="inner", num_partitions=max(
        2, min(16, (n_keys_left + n_keys_right) // 500_000 + 2)),
        on=("k",))

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "keys": pa.array([], type=pa.int64()),
                "rows": pa.array([], type=pa.int64()),
                "mx": pa.array([], type=pa.int64()),
                "mk": batch["k"].slice(0, 0),
            })
        # checked multiply: a hot key with ~4e9 rows on each side puts
        # cl*cr past int64 — wrapping silently would corrupt exactly
        # the blowup this diagnostic exists to catch; raising is right
        prod = pc.multiply_checked(pc.cast(batch["cl"], pa.int64()),
                                   pc.cast(batch["cr"], pa.int64()))
        mx = pc.max(prod).as_py()
        ties = batch["k"].filter(pc.equal(prod, mx))
        # Python-int sum: the per-batch total of int64 products can
        # itself exceed int64; arbitrary precision here, overflow is
        # then impossible until the (float64-exact-enough) driver fold
        total = sum(prod.to_pylist())
        if total > 2**63 - 1:
            raise OverflowError(
                f"join cardinality exceeds int64 ({total}) — the join "
                "this diagnoses is infeasible as written")
        return pa.table({
            "keys": pa.array([batch.num_rows], type=pa.int64()),
            "rows": pa.array([total], type=pa.int64()),
            "mx": pa.array([mx], type=pa.int64()),
            "mk": pa.array([pc.min(ties).as_py()], type=batch["k"].type),
        })

    parts = joined.map_batches(partial, batch_format="pyarrow").take_all()
    n_common = sum(p["keys"] for p in parts)
    join_rows = sum(p["rows"] for p in parts)
    if parts and n_common:
        max_rows = max(p["mx"] for p in parts if p["keys"])
        max_key = min(p["mk"] for p in parts
                      if p["keys"] and p["mx"] == max_rows)
    else:
        max_rows, max_key = 0, None
    return pa.table({
        "n_left": pa.array([n_left], type=pa.int64()),
        "n_right": pa.array([n_right], type=pa.int64()),
        "n_keys_left": pa.array([n_keys_left], type=pa.int64()),
        "n_keys_right": pa.array([n_keys_right], type=pa.int64()),
        "n_common_keys": pa.array([n_common], type=pa.int64()),
        "join_rows": pa.array([join_rows], type=pa.int64()),
        "max_key_rows": pa.array([max_rows], type=pa.int64()),
        "max_key": pa.array([max_key]),
    })
