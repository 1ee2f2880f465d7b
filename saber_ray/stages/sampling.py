"""Deterministic sampling operators for training-data curation.

Random sampling is wrong for a resumable 100-TB pipeline: a re-run (or a
straggler retry) must pick the SAME rows, and a sample drawn twice from
two overlapping snapshots must agree on the overlap. Every sampler here
is therefore a pure function of the row key — md5-based, seedable by a
salt string — so sampling is idempotent, shard-order-independent, and
reproducible across cluster sizes. (The reference's sampling needs are
served by seeded RNG shuffles — saber/utils/data_utils.py — which
``pipelines/splits.py:seeded_shuffle`` covers; these operators are the
web-scale analogues.)

Scale notes:
* ``sample_hash`` is a stateless filter — streams, no shuffle;
* ``stratified_sample`` pre-prunes to <= k candidate rows per stratum
  per batch before the one (tiny) per-stratum merge, so the shuffle
  moves O(k x batches) rows, never the corpus;
* both ship only the key/stratum columns through the hash, the payload
  stays in place.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def _key64(values: list, salt: str = "") -> list[int]:
    """md5-based uniform key in [0, 2^32) — shared recipe, see
    ``functions.hashing.md5_key32`` (DuckDB-reproducible)."""
    from ..functions.hashing import md5_key32

    return [md5_key32(v, salt) for v in values]


def sample_hash_batch(
    batch: pa.Table, pct: int, column: str = "doc_id", salt: str = ""
) -> pa.Table:
    """Keep rows whose hash key falls in the lowest ``pct`` of 100 hash
    residue classes — a deterministic ~pct% Bernoulli sample."""
    keys = _key64(batch[column].to_pylist(), salt)
    mask = pa.array([k % 100 < pct for k in keys], type=pa.bool_())
    return batch.filter(mask)


def sample_hash(
    ds: rd.Dataset, pct: int, column: str = "doc_id", salt: str = ""
) -> rd.Dataset:
    """Deterministic ~``pct``% sample: pure filter, streams, no shuffle.

    Unlike ``Dataset.random_sample`` the result is a function of the key
    alone — stable under retries, resumes, repartitioning and cluster
    size, and two salted samples are independent of each other.
    """
    return ds.map_batches(
        lambda b: sample_hash_batch(b, pct, column, salt), batch_format="pyarrow"
    )


def stratified_sample(
    ds: rd.Dataset,
    stratum_column: str,
    k: "int | dict",
    id_column: str = "doc_id",
    salt: str = "",
) -> rd.Dataset:
    """Deterministic quota sample: the ``k`` rows with the smallest hash
    keys per stratum (ties broken by id) — a balanced per-class sample
    for curation ("k docs per language/source/quality bucket").

    ``k`` may be a per-stratum quota dict (a training-data MIXTURE
    spec: "30 en docs, 10 de, 5 fr"); strata absent from the dict are
    excluded entirely. An int applies one quota to every stratum.

    Two-phase top-k: each batch locally keeps at most ``k`` candidates
    per stratum it sees, THEN one ``groupby(stratum).map_groups`` merges
    candidates. The shuffle moves O(k x batches) id/stratum rows — the
    document payload never moves; callers re-attach it by joining the
    returned ids (broadcast: the result is k x strata rows, tiny).

    Returns ``(stratum_column, id_column)`` sorted within stratum by id.
    """
    quota = (lambda s: k) if isinstance(k, int) else (lambda s: k.get(s, 0))

    def local_candidates(batch: pa.Table) -> pa.Table:
        sub = batch.select([stratum_column, id_column])
        keys = pa.array(_key64(sub[id_column].to_pylist(), salt), type=pa.int64())
        sub = sub.append_column("__key", keys)
        idx = pc.sort_indices(
            sub,
            sort_keys=[(stratum_column, "ascending"), ("__key", "ascending"),
                       (id_column, "ascending")],
        )
        sub = sub.take(idx)
        strata = sub[stratum_column].to_pylist()
        keep, seen = [], {}
        for i, s in enumerate(strata):
            c = seen.get(s, 0)
            if c < quota(s):
                keep.append(i)
                seen[s] = c + 1
        return sub.take(pa.array(keep, type=pa.int64()))

    def merge(df):
        df = df.sort_values(["__key", id_column]).head(quota(df[stratum_column].iloc[0]))
        return df.sort_values(id_column)[[stratum_column, id_column]]

    cands = ds.map_batches(local_candidates, batch_format="pyarrow")
    return cands.groupby(stratum_column).map_groups(merge, batch_format="pandas")


def exact_quantiles(
    ds: rd.Dataset, qs: list[float], column: str
) -> pa.Table:
    """EXACT distributed quantiles of an integer-valued column.

    Sketch-free: one ``groupby(column).count()`` shuffle compresses the
    corpus to one row per DISTINCT value (token/char lengths have ~10^4
    distinct values no matter how many documents), then the cumulative
    walk over that tiny table runs on the driver. Quantile rule (lower
    discrete): smallest value v with cum_count >= ceil(q * n).

    Returns an in-memory ``pa.Table (q:double, value:int64)`` — quantiles
    are a scalar summary, not a dataset.
    """
    import math

    counts = sorted(
        (r[column], r["count()"]) for r in ds.groupby(column).count().take_all()
    )
    n = sum(c for _, c in counts)
    out_q, out_v = [], []
    for q in qs:
        target = math.ceil(q * n)
        cum = 0
        val = counts[-1][0] if counts else None
        for v, c in counts:
            cum += c
            if cum >= target:
                val = v
                break
        out_q.append(q)
        out_v.append(val)
    return pa.table({"q": pa.array(out_q, type=pa.float64()),
                     "value": pa.array(out_v, type=pa.int64())})


def _hist_quantile(hist, cum, lo: float, width: float, q: float) -> float:
    """Lower-rank (``ceil(q·n)``) bucket + uniform-within-bucket
    interpolation — the ONE oracle-parity-critical arithmetic shared by
    ``approx_quantiles`` and ``grouped_approx_quantiles`` (every IEEE
    step here is mirrored verbatim in their SQL oracles; change both
    together)."""
    import math

    import numpy as np

    n = int(cum[-1])
    target = max(1, math.ceil(q * n))
    b = int(np.searchsorted(cum, target))
    before = int(cum[b - 1]) if b else 0
    frac = (target - before) / int(hist[b])
    return lo + (b + frac) * width


def approx_quantiles(
    ds: rd.Dataset, qs: list[float], column: str, bins: int = 4096
) -> pa.Table:
    """Approximate quantiles of a CONTINUOUS column at corpus scale —
    the scale path where ``exact_quantiles``' distinct-value compression
    breaks down (a double column has ~one distinct value per row).

    Two streaming passes, no shuffle of the corpus: (1) global min/max
    (per-batch partials, Ray's native aggregate); (2) a fixed
    ``bins``-bucket histogram — each batch reduces to ONE [bins] int64
    vector, vectors fold pairwise through a coalesced second level (the
    ``build_bloom`` fold shape) so the driver sums a handful of arrays
    whatever the corpus size. Quantile = the lower-rank bucket
    (``ceil(q·n)``) with linear interpolation inside it; worst-case
    value error is one bucket width, (max−min)/bins.

    Every arithmetic step (bucket assignment ``floor((v−lo)/width)``,
    the interpolation) is plain IEEE double math reproducible in SQL, so
    the driver value-checks this against a DuckDB oracle (outputs
    rounded to 6 decimals, the pagerank convention). Returns
    ``pa.Table (q:double, value:double)``.
    """
    import math

    from ray.data.aggregate import Max, Min

    def drop_nan(batch: pa.Table) -> pa.Table:
        col = batch[column]
        mask = col.is_valid()
        if pa.types.is_floating(col.type):
            mask = pc.and_(mask, pc.invert(pc.is_nan(col)))
        return batch.filter(mask)

    # NaNs are dropped BEFORE the min/max aggregate: a NaN-propagating
    # Min over a mixed column would poison the bucket math, and an
    # all-NaN column must yield null quantiles, not an IndexError
    clean = ds.select_columns([column]).map_batches(
        drop_nan, batch_format="pyarrow")
    mm = clean.aggregate(Min(column), Max(column))
    if mm is None or mm.get(f"min({column})") is None:
        return pa.table({"q": pa.array(qs, type=pa.float64()),
                         "value": pa.array([None] * len(qs), type=pa.float64())})
    lo = float(mm[f"min({column})"])
    hi = float(mm[f"max({column})"])
    width = (hi - lo) / bins
    if width <= 0.0:  # constant column: every quantile is that value
        return pa.table({"q": pa.array(qs, type=pa.float64()),
                         "value": pa.array([lo] * len(qs), type=pa.float64())})

    def hist_batch(batch: pa.Table) -> pa.Table:
        import numpy as np

        v = batch[column].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        idx = np.clip(np.floor((v - lo) / width).astype(np.int64), 0, bins - 1)
        h = np.bincount(idx, minlength=bins)
        return pa.table({"h": pa.array([h.tobytes()], type=pa.large_binary())})

    def fold(batch: pa.Table) -> pa.Table:
        import numpy as np

        acc = np.zeros(bins, dtype=np.int64)
        for buf in batch["h"].to_pylist():
            acc += np.frombuffer(buf, dtype=np.int64)
        return pa.table({"h": pa.array([acc.tobytes()], type=pa.large_binary())})

    import numpy as np

    partials = (
        clean
        .map_batches(hist_batch, batch_format="pyarrow", batch_size=None)
        .repartition(16)
        .map_batches(fold, batch_format="pyarrow", batch_size=None)
    )
    hist = np.zeros(bins, dtype=np.int64)
    for row in partials.take_all():
        hist += np.frombuffer(row["h"], dtype=np.int64)
    cum = np.cumsum(hist)
    out_v = [_hist_quantile(hist, cum, lo, width, q) for q in qs]
    # half-away rounding for DuckDB round() parity (Python round is
    # half-even — the established oracle convention in this repo)
    vals = pc.round(pa.array(out_v, type=pa.float64()), 6,
                    round_mode="half_towards_infinity")
    return pa.table({"q": pa.array(qs, type=pa.float64()), "value": vals})


def grouped_approx_quantiles(
    ds: rd.Dataset, qs: list[float], column: str, group_column: str,
    bins: int = 4096,
) -> pa.Table:
    """Per-group :func:`approx_quantiles` for CONTINUOUS columns.

    Pass 1: per-group min/max (native keyed aggregate — tiny result).
    Pass 2: each batch reduces to ONE histogram vector per group it
    sees; a ``groupby(group)`` merges the vectors (the shuffle moves
    O(groups × batches) fixed-size rows, never the corpus). Quantile
    math identical to ``approx_quantiles``, per group, on the driver —
    |groups| × bins ints. Null/NaN values are dropped first; a group
    with no real values is ABSENT from the output (the SQL inner-join
    semantics). Returns ``(group, q, value)`` sorted.
    """
    import math

    import numpy as np

    from ray.data.aggregate import Max, Min

    # null/NaN values are dropped BEFORE everything (the same discipline
    # as approx_quantiles — a NaN-propagating Min on some engine version
    # must not poison the bucket math): a group with no real values then
    # simply doesn't appear in the output, exactly the SQL oracle's
    # inner-join semantics. ONE keyed aggregate carries both bounds — a
    # min⨝max self-join would trip Ray's empty-block join poisoning
    # (schema-less blocks out of groupby, see semi_join's rationale).
    def drop_nan(batch: pa.Table) -> pa.Table:
        col = batch[column]
        mask = col.is_valid()
        if pa.types.is_floating(col.type):
            mask = pc.and_(mask, pc.invert(pc.is_nan(col)))
        return batch.filter(mask)

    clean = ds.select_columns([group_column, column]).map_batches(
        drop_nan, batch_format="pyarrow")

    def _bound(v):  # belt: None/NaN can't normally reach here post-filter
        return None if v is None or (isinstance(v, float) and math.isnan(v)) else float(v)

    ranges = {}
    for r in (clean.groupby(group_column)
              .aggregate(Min(column), Max(column)).take_all()):
        lo, hi = _bound(r[f"min({column})"]), _bound(r[f"max({column})"])
        if lo is not None and hi is not None:
            ranges[r[group_column]] = (lo, hi)
    import ray

    ranges_ref = ray.put(ranges)

    def hist_batch(batch: pa.Table) -> pa.Table:
        rng = ray.get(ranges_ref)
        groups, blobs = [], []
        g = batch[group_column].to_numpy(zero_copy_only=False)
        v = batch[column].to_numpy(zero_copy_only=False).astype(np.float64)
        for grp in np.unique(g):
            if rng.get(grp) is None:  # all-null/NaN group: no histogram
                continue
            lo, hi = rng[grp]
            width = (hi - lo) / bins
            vals = v[g == grp]
            vals = vals[~np.isnan(vals)]
            if width <= 0.0:
                h = np.zeros(bins, dtype=np.int64)
                h[0] = len(vals)
            else:
                idx = np.clip(np.floor((vals - lo) / width).astype(np.int64),
                              0, bins - 1)
                h = np.bincount(idx, minlength=bins)
            groups.append(grp)
            blobs.append(h.tobytes())
        return pa.table({
            group_column: pa.array(groups, type=batch.schema.field(group_column).type),
            "h": pa.array(blobs, type=pa.large_binary()),
        })

    def fold(df):
        import pandas as pd

        acc = np.zeros(bins, dtype=np.int64)
        for buf in df["h"]:
            acc += np.frombuffer(buf, dtype=np.int64)
        return pd.DataFrame({group_column: [df[group_column].iloc[0]],
                             "h": [acc.tobytes()]})

    folded = (
        clean
        .map_batches(hist_batch, batch_format="pyarrow", batch_size=None)
        .groupby(group_column)
        .map_groups(fold, batch_format="pandas")
    )
    hists = {row[group_column]: np.frombuffer(row["h"], dtype=np.int64)
             for row in folded.take_all()}
    out_g, out_q, out_v = [], [], []
    for grp in sorted(ranges):
        bounds = ranges[grp]
        hist = hists.get(grp)
        for q in qs:
            out_g.append(grp)
            out_q.append(q)
            if bounds is None or hist is None:
                out_v.append(None)  # all-null/NaN group
                continue
            lo, hi = bounds
            width = (hi - lo) / bins
            cum = np.cumsum(hist)
            if int(cum[-1]) == 0:
                out_v.append(None)
                continue
            if width <= 0.0:  # constant group
                out_v.append(lo)
                continue
            out_v.append(_hist_quantile(hist, cum, lo, width, q))
    vals = pc.round(pa.array(out_v, type=pa.float64()), 6,
                    round_mode="half_towards_infinity")
    return pa.table({group_column: pa.array(out_g),
                     "q": pa.array(out_q, type=pa.float64()),
                     "value": vals})


def grouped_quantiles(
    ds: rd.Dataset, qs: list[float], column: str, group_column: str
) -> pa.Table:
    """Per-group exact quantiles, same value-count compression as
    ``exact_quantiles``: ONE ``groupby((group, value)).count()`` shuffle
    — the reduced table has one row per (group, distinct value), tiny no
    matter the corpus — then the cumulative walk per group on the
    driver. Returns ``(group, q, value)`` sorted by (group, q)."""
    import math
    from collections import defaultdict

    rows = ds.groupby([group_column, column]).count().take_all()
    by_group: dict = defaultdict(list)
    for r in rows:
        by_group[r[group_column]].append((r[column], r["count()"]))
    out_g, out_q, out_v = [], [], []
    for g in sorted(by_group):
        counts = sorted(by_group[g])
        n = sum(c for _, c in counts)
        for q in qs:
            target = math.ceil(q * n)
            cum = 0
            val = counts[-1][0]
            for v, c in counts:
                cum += c
                if cum >= target:
                    val = v
                    break
            out_g.append(g)
            out_q.append(q)
            out_v.append(val)
    return pa.table({group_column: out_g,
                     "q": pa.array(out_q, type=pa.float64()),
                     "value": pa.array(out_v, type=pa.int64())})


def top_n_per_group(
    ds: rd.Dataset,
    group_column: str,
    value_column: str,
    n: int,
    id_column: str = "doc_id",
) -> rd.Dataset:
    """Per-group top-``n`` by value (descending), ties broken by id
    ascending — "keep the n highest-quality docs per domain", the
    grouped-limit every curation pipeline needs and Ray Data has no
    native operator for.

    Two-phase with a BUCKETED merge: each batch locally prunes to <= n
    candidate rows per group it sees (vectorized sort + run-length
    ranks), then the merge shuffles candidates by ``hash(group) % P``
    and runs ONE vectorized pandas ``sort_values().groupby().head(n)``
    per BUCKET. The shuffle still moves only O(n x batches) key rows,
    and — unlike a ``groupby(group).map_groups`` merge, which makes one
    Python/pandas call per DISTINCT group — the merge cost is bounded by
    P (cluster-derived), not by group cardinality. That matters because
    ``tfidf_top_terms`` keys this on ``doc_id``: corpus-cardinality
    groups, i.e. billions of per-group pandas frames at 100 TB under
    the old shape. Returns ``(group_column, id_column, value_column)``.
    """
    import numpy as np

    from ..functions.partitioning import shuffle_partitions
    from .relational import _key_buckets

    nb = shuffle_partitions(16)

    def local_candidates(batch: pa.Table) -> pa.Table:
        sub = batch.select([group_column, id_column, value_column])
        idx = pc.sort_indices(
            sub,
            sort_keys=[(group_column, "ascending"), (value_column, "descending"),
                       (id_column, "ascending")],
        )
        sub = sub.take(idx)
        m = len(sub)
        if m > 1:
            g = sub[group_column]
            if isinstance(g, pa.ChunkedArray):
                g = g.combine_chunks()
            # rank within each group run: positions where the sorted key
            # changes start a new run; rank = index - run_start
            new_run = np.empty(m, dtype=bool)
            new_run[0] = True
            # null group values compare as null -> fill False -> every
            # null row starts a run; over-keeping nulls is harmless (the
            # merge still takes an exact head(n))
            eq = pc.equal(g.slice(1), g.slice(0, m - 1)).fill_null(False)
            new_run[1:] = ~eq.to_numpy(zero_copy_only=False)
            run_start = np.maximum.accumulate(
                np.where(new_run, np.arange(m), 0)
            )
            rank = np.arange(m) - run_start
            sub = sub.filter(pa.array(rank < n))
        return sub.append_column(
            "__bucket", _key_buckets(sub, group_column, nb)
        )

    def merge(df):
        df = df.sort_values([group_column, value_column, id_column],
                            ascending=[True, False, True])
        # dropna=False: a null group is still A GROUP (the old per-group
        # merge kept its top-n; pandas' default would silently drop it)
        df = df.groupby(group_column, sort=False, dropna=False).head(n)
        return df[[group_column, id_column, value_column]]

    cands = ds.map_batches(local_candidates, batch_format="pyarrow")
    return cands.groupby("__bucket").map_groups(merge, batch_format="pandas")


def weighted_sample(
    ds: rd.Dataset,
    weight_column: str,
    k: int,
    id_column: str = "doc_id",
    salt: str = "",
) -> rd.Dataset:
    """Deterministic weighted sample WITHOUT replacement: k rows drawn
    with probability proportional to ``weight_column`` (importance /
    quality-weighted curation), via the Efraimidis–Spirakis A-Res order:
    rank every row by ``-ln(u) / w`` ascending (u = the row's md5-uniform
    in (0,1)) and keep the k smallest. Pure function of (ids, weights,
    salt) — retry/layout/cluster-size stable, reproducible in SQL.

    Two-phase top-k: each batch prunes to its local k best (vectorized
    numpy partition), the global sort+limit then runs over O(k × batches)
    candidate rows — the payload never shuffles. Rows with weight <= 0
    are excluded (they have zero draw probability).
    """
    import numpy as np

    def local_candidates(batch: pa.Table) -> pa.Table:
        sub = batch.select([id_column, weight_column])
        w = sub[weight_column].to_numpy(zero_copy_only=False).astype(np.float64)
        u = (np.array(_key64(sub[id_column].to_pylist(), salt), dtype=np.float64)
             + 0.5) / 4294967296.0
        with np.errstate(divide="ignore", invalid="ignore"):
            key = np.where(w > 0, -np.log(u) / w, np.inf)
        keep = np.flatnonzero(np.isfinite(key))
        if len(keep) > k:
            keep = keep[np.argpartition(key[keep], k)[:k]]
        out = sub.take(pa.array(keep, type=pa.int64()))
        return out.append_column("__key", pa.array(key[keep], type=pa.float64()))

    cands = ds.map_batches(local_candidates, batch_format="pyarrow")
    top = cands.sort(["__key", id_column]).limit(k)
    return top.drop_columns(["__key"])


def temperature_mixture(
    ds: rd.Dataset,
    stratum_column: str,
    alpha: float = 0.5,
    total: int = 1000,
    id_column: str = "doc_id",
    salt: str = "",
) -> rd.Dataset:
    """Temperature-rebalanced mixture sample: per-stratum quotas
    proportional to ``count^alpha`` (Lample & Conneau 2019 §3.1 — the
    multilingual/domain rebalancing rule: ``alpha=1`` keeps natural
    proportions, ``alpha → 0`` approaches uniform, upsampling the tail
    relative to the head).

    Quotas are ``floor(round(total * count_s^alpha / Σ count^alpha, 9))``
    — the result has AT MOST ``total`` rows (floor remainders are
    dropped, not reassigned, so the rule is one closed-form expression a
    SQL oracle reproduces; libm ``pow``/``floor`` on both sides). The
    9-decimal snap BEFORE the floor is load-bearing: when quotas land
    exactly on an integer (equal-sized strata do this), the raw ratio
    sits one ulp either side of it depending on SUMMATION ORDER — the
    driver's dict fold and DuckDB's parallel aggregate can disagree, and
    DuckDB's own thread partitioning varies run to run (observed at
    sf0.1: 20 equal strata flipping between quota 5 and 4 → 100 vs 80
    rows). Snapping to a 1e-9 grid makes both sides deterministic — ulp
    noise is ~1e-15, far below the grid. The stratum-count
    aggregate is tiny (one row per stratum on the driver); row selection
    reuses ``stratified_sample``'s two-phase deterministic top-k, so the
    shuffle moves O(quota × batches) id rows and the sample is stable
    under retries, resumes and block layout.
    """
    import math

    # two consumers (the count aggregate and the quota selection) — Ray
    # re-executes derived lineage per consumer, so an expensive upstream
    # (e.g. a curation pipeline) would run twice; materialize ONLY the
    # two slim columns both consumers need
    ds = ds.select_columns([stratum_column, id_column]).materialize()
    counts = {
        r[stratum_column]: r["count()"]
        for r in ds.groupby(stratum_column).count().take_all()
    }
    weights = {s: math.pow(c, alpha) for s, c in counts.items()}
    denom = sum(weights.values())
    quotas = {
        s: int(math.floor(round(total * w / denom, 9)))
        for s, w in weights.items()
    }
    return stratified_sample(
        ds, stratum_column, quotas, id_column=id_column, salt=salt
    )


def profile_numeric(
    ds: rd.Dataset,
    columns: list[str],
) -> rd.Dataset:
    """One-pass numeric profile: per column, row count, null count,
    min, max, mean — the schema-sanity report a pipeline runs on a new
    table before spending compute on it.

    Scale shape: each batch folds every profiled column to ONE partial
    row of scalars (count/nulls/min/max/sum via Arrow kernels — a batch
    of millions of rows leaves as ``len(columns)`` rows), and the only
    shuffle is a groupby over ``len(columns)`` keys. Null-only columns
    profile to null min/max/mean (SQL aggregate semantics).

    Returns ``(column, n, n_null, vmin, vmax, mean)``; values are cast
    to float64 so heterogeneous numeric columns share one schema.
    """

    def partial(batch: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs, sums = [], [], [], [], [], []
        for c in columns:
            col = batch[c]
            valid = pc.count(col, mode="only_valid").as_py()
            names.append(c)
            ns.append(valid)
            nulls.append(batch.num_rows - valid)
            if valid:
                mm = pc.min_max(col).as_py()
                mins.append(float(mm["min"]))
                maxs.append(float(mm["max"]))
                sums.append(float(pc.sum(col).as_py()))
            else:
                mins.append(None)
                maxs.append(None)
                sums.append(None)
        return pa.table({
            "column": pa.array(names, type=pa.string()),
            "n": pa.array(ns, type=pa.int64()),
            "n_null": pa.array(nulls, type=pa.int64()),
            "vmin": pa.array(mins, type=pa.float64()),
            "vmax": pa.array(maxs, type=pa.float64()),
            "sum": pa.array(sums, type=pa.float64()),
        })

    def finish(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch["sum(n)"], pa.int64())
        s = batch["sum(sum)"]
        return pa.table({
            "column": batch["column"],
            "n": n,
            "n_null": pc.cast(batch["sum(n_null)"], pa.int64()),
            "vmin": batch["min(vmin)"],
            "vmax": batch["max(vmax)"],
            "mean": pc.divide(s, pc.cast(
                pc.if_else(pc.equal(n, 0), pa.scalar(None, pa.int64()), n),
                pa.float64())),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("column")
        .aggregate(
            rd.aggregate.Sum("n"), rd.aggregate.Sum("n_null"),
            rd.aggregate.Min("vmin"), rd.aggregate.Max("vmax"),
            rd.aggregate.Sum("sum"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )
