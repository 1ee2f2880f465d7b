"""asof_join unit goldens: backward-inclusive match, left-join nulls,
per-key isolation, string-key bucketing stability."""

import datetime as dt

import pyarrow as pa

import ray.data as rd

from saber_ray.stages.relational import asof_join


def _ts(minute: int):
    return dt.datetime(2024, 1, 1, 0, minute)


def _left(rows):
    return rd.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([_ts(r[1]) for r in rows], type=pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
        "value": pa.array([float(r[3]) for r in rows], type=pa.float64()),
    }))


def _right(rows):
    return rd.from_arrow(pa.table({
        "ts": pa.array([_ts(r[0]) for r in rows], type=pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
        "value": pa.array([float(r[2]) for r in rows], type=pa.float64()),
    }))


def test_asof_backward_inclusive_and_nulls():
    left = _left([(1, 10, 7, 1.0), (2, 20, 7, 2.0), (3, 5, 8, 3.0)])
    right = _right([(10, 7, 100.0), (15, 7, 150.0), (30, 8, 300.0)])
    out = {r["event_id"]: r["prior_error_value"]
           for r in asof_join(left, right, right_columns={"value": "prior_error_value"}).take_all()}
    assert out[1] == 100.0       # equal ts matches (inclusive)
    assert out[2] == 150.0       # latest prior, not first
    assert out[3] is None or out[3] != out[3]  # no prior → null/NaN
    # per-key isolation: user 8's rights never leak to user 7
    assert out[2] != 300.0


def test_asof_empty_right_keeps_lefts():
    left = _left([(1, 10, 7, 1.0), (2, 20, 9, 2.0)])
    right = _right([])
    rows = asof_join(left, right, right_columns={"value": "prior_error_value"}).take_all()
    assert {r["event_id"] for r in rows} == {1, 2}
    for r in rows:
        v = r["prior_error_value"]
        assert v is None or v != v  # null/NaN


def test_asof_string_keys_stable_bucketing():
    left = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2], type=pa.int64()),
        "ts": pa.array([_ts(10), _ts(20)], type=pa.timestamp("us")),
        "user_id": pa.array(["alice", "bob"]),
        "value": pa.array([1.0, 2.0]),
    })).repartition(3)
    right = rd.from_arrow(pa.table({
        "ts": pa.array([_ts(5), _ts(6)], type=pa.timestamp("us")),
        "user_id": pa.array(["alice", "bob"]),
        "value": pa.array([50.0, 60.0]),
    })).repartition(2)
    out = {r["event_id"]: r["prior_error_value"]
           for r in asof_join(left, right, num_partitions=4, right_columns={"value": "prior_error_value"}).take_all()}
    assert out == {1: 50.0, 2: 60.0}


# ---------------------------------------------------------------- tpch ---


SF = "/root/testdata/sf0.001"


def _duck(sql: str):
    import duckdb

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "nation",
              "region", "events", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).df()


def test_tpch_q6_matches_duckdb():
    import __ray_entry__ as e

    got = e.queries()["tpch_q6"](SF).to_pandas()
    want = _duck(e.oracle_sql()["tpch_q6"])
    assert got["revenue"].iloc[0] == want["revenue"].iloc[0]


def test_tpch_q5_matches_duckdb():
    import __ray_entry__ as e

    got = (
        e.queries()["tpch_q5"](SF).to_pandas()
        .sort_values(["n_name"]).reset_index(drop=True)
    )
    want = _duck(e.oracle_sql()["tpch_q5"]).sort_values(["n_name"]).reset_index(drop=True)
    assert list(got["n_name"]) == list(want["n_name"])
    assert list(got["revenue"]) == list(want["revenue"])


def test_tpch_q4_matches_duckdb():
    import __ray_entry__ as e

    got = e.queries()["tpch_q4"](SF).to_pandas().reset_index(drop=True)
    want = _duck(e.oracle_sql()["tpch_q4"])
    assert list(got["o_orderpriority"]) == list(want["o_orderpriority"])
    assert list(got["n"]) == list(want["n"])


def test_top_events_per_type_matches_duckdb():
    import __ray_entry__ as e

    got = (
        e.queries()["top_events_per_type"](SF).to_pandas()
        .sort_values(["event_type", "event_id"]).reset_index(drop=True)
    )
    want = (
        _duck(e.oracle_sql()["top_events_per_type"])
        .sort_values(["event_type", "event_id"]).reset_index(drop=True)
    )
    assert list(got["event_id"]) == list(want["event_id"])
    assert list(got["value"]) == list(want["value"])


def test_semi_join_no_multiplication():
    # right side has DUPLICATE keys: semi-join must not multiply lefts
    from saber_ray.stages.relational import semi_join

    left = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3], type=pa.int64()),
                                   "v": pa.array(["a", "b", "c"])}))
    right = rd.from_arrow(pa.table({"rk": pa.array([2, 2, 2, 4], type=pa.int64())}))
    rows = semi_join(left, right, "k", "rk", num_partitions=2).take_all()
    assert [(r["k"], r["v"]) for r in rows] == [(2, "b")]


def test_extract_json_fields_paths_agree():
    """Polars fast path and stdlib fallback produce identical typed
    columns, including nulls for missing keys and malformed JSON."""
    import pyarrow as pa

    from saber_ray.stages import semistruct

    batch = pa.table({
        "id": [1, 2, 3, 4, 5],
        "props": ['{"k": 7, "s": "x"}', '{"s": "y"}', "not json", None, '{"k": 0}'],
    })
    fields = {"k": pa.int64(), "s": pa.string()}
    fast = semistruct.extract_json_fields(batch, "props", fields)
    saved = semistruct.pl
    semistruct.pl = None
    try:
        slow = semistruct.extract_json_fields(batch, "props", fields)
    finally:
        semistruct.pl = saved
    assert fast.column("k").to_pylist() == [7, None, None, None, 0]
    assert fast.column("s").to_pylist() == ["x", "y", None, None, None]
    assert fast.equals(slow)
    dropped = semistruct.extract_json_fields(batch, "props", fields, drop_source=True)
    assert "props" not in dropped.column_names


def test_window_count_join_band_semantics():
    from saber_ray.stages.relational import window_count_join

    # user 7: views at minutes 10, 15, 40; clicks at 20 and 50
    #  click@20 with before=30min counts views in [minute -10, 20) -> 2
    #  click@50 counts views in [20, 50) -> 1
    # user 8 has no views -> 0
    left = _left([(1, 20, 7, 0.0), (2, 50, 7, 0.0), (3, 30, 8, 0.0)])
    right = _right([(10, 7, 0.0), (15, 7, 0.0), (40, 7, 0.0)])
    out = {r["event_id"]: r["n_range"] for r in window_count_join(
        left, right, before="30min").take_all()}
    assert out == {1: 2, 2: 1, 3: 0}


def test_window_count_join_exclusive_bounds():
    from saber_ray.stages.relational import window_count_join

    # right exactly AT the left ts is excluded (after=0 means [t-b, t));
    # right exactly at t - before is included
    left = _left([(1, 30, 7, 0.0)])
    right = _right([(30, 7, 0.0), (20, 7, 0.0), (10, 7, 0.0)])
    out = window_count_join(left, right, before="20min").take_all()
    assert out[0]["n_range"] == 2  # minutes 10 and 20; not 30


def test_window_count_join_forward_band():
    from saber_ray.stages.relational import window_count_join

    # after>0 counts forward: [t, t+after) with before=0
    left = _left([(1, 10, 7, 0.0)])
    right = _right([(10, 7, 0.0), (15, 7, 0.0), (25, 7, 0.0)])
    out = window_count_join(left, right, after="10min").take_all()
    assert out[0]["n_range"] == 2  # minutes 10 (inclusive lower) and 15


def test_anti_join_complement_of_semi():
    from saber_ray.stages.relational import anti_join, semi_join

    left = _left([(i, i, i % 5, 0.0) for i in range(1, 21)])
    right = _right([(1, 0, 0.0), (2, 2, 0.0), (3, 2, 0.0)])  # users 0,2 matched
    anti_ids = {r["event_id"] for r in anti_join(
        left, right, "user_id", "user_id").take_all()}
    semi_ids = {r["event_id"] for r in semi_join(
        left, right, "user_id", "user_id", num_partitions=2).take_all()}
    assert anti_ids | semi_ids == set(range(1, 21))
    assert not (anti_ids & semi_ids)
    assert all(r % 5 not in (0, 2) for r in anti_ids)


def test_running_totals_order_and_isolation():
    from saber_ray.stages.relational import running_totals

    ev = _left([
        (1, 10, 7, 1.5), (2, 20, 7, 2.5), (3, 15, 7, 4.0),   # user 7 by ts
        (4, 10, 8, 10.0), (5, 10, 8, 1.0),                   # tie -> event_id order
    ])
    out = {r["event_id"]: r["running_value"]
           for r in running_totals(ev).take_all()}
    assert out[1] == 1.5 and out[3] == 5.5 and out[2] == 8.0
    assert out[4] == 10.0 and out[5] == 11.0


def _frames_equal(got, want):
    import pandas as pd

    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    want = want.sort_values(list(want.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_tpch_q10_matches_duckdb():
    import __ray_entry__ as e

    _frames_equal(e.queries()["tpch_q10"](SF).to_pandas(),
                  _duck(e.oracle_sql()["tpch_q10"]))


def test_tpch_q18_matches_duckdb():
    import __ray_entry__ as e

    _frames_equal(e.queries()["tpch_q18"](SF).to_pandas(),
                  _duck(e.oracle_sql()["tpch_q18"]))


def test_tpch_q14_matches_duckdb():
    import __ray_entry__ as e

    got = e.queries()["tpch_q14"](SF)
    # _duck registers the standard views except part — inline that one
    want = _duck(
        e.oracle_sql()["tpch_q14"].replace(
            "JOIN part ", "JOIN read_parquet('" + SF + "/part.parquet') part ")
    )
    assert abs(got["promo_revenue"][0].as_py() - want["promo_revenue"].iloc[0]) < 1e-9


def test_rolling_avg_frame_and_isolation():
    from saber_ray.stages.relational import rolling_avg

    ev = _left([
        (1, 10, 7, 3.0), (2, 20, 7, 6.0), (3, 30, 7, 9.0), (4, 40, 7, 12.0),
        (5, 10, 8, 100.0),
    ])
    out = {r["event_id"]: r["rolling_avg"]
           for r in rolling_avg(ev, window_rows=3).take_all()}
    assert out[1] == 3.0 and out[2] == 4.5 and out[3] == 6.0
    assert out[4] == 9.0                      # frame slides: (6+9+12)/3
    assert out[5] == 100.0                    # other key isolated


def test_semi_anti_join_empty_sides():
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.relational import anti_join, semi_join

    left = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3], type=pa.int64()),
                                   "v": pa.array([10, 20, 30], type=pa.int64())}))
    empty_r = rd.from_arrow(pa.table({"k": pa.array([], type=pa.int64())}))
    # empty right: semi -> nothing, anti -> everything
    assert semi_join(left, empty_r, "k", "k", num_partitions=2).take_all() == []
    assert sorted(r["v"] for r in anti_join(
        left, empty_r, "k", "k", num_partitions=2).take_all()) == [10, 20, 30]
    # left emptied by a filter (schema-less blocks): both return empty
    gone = left.filter(lambda r: False)
    right = rd.from_arrow(pa.table({"k": pa.array([1], type=pa.int64())}))
    assert semi_join(gone, right, "k", "k", num_partitions=2).take_all() == []
    assert anti_join(gone, right, "k", "k", num_partitions=2).take_all() == []


def test_pricing_rollup_levels():
    import math

    import __ray_entry__ as e

    rows = e.queries()["pricing_rollup"](SF).take_all()
    finest = [r for r in rows if r["l_returnflag"] is not None and r["l_linestatus"] is not None]
    per_flag = [r for r in rows if r["l_returnflag"] is not None and r["l_linestatus"] is None]
    grand = [r for r in rows if r["l_returnflag"] is None and r["l_linestatus"] is None]
    assert len(grand) == 1
    assert grand[0]["n"] == sum(r["n"] for r in finest)
    for pf in per_flag:
        parts = [r for r in finest if r["l_returnflag"] == pf["l_returnflag"]]
        assert pf["n"] == sum(r["n"] for r in parts)
        assert math.isclose(pf["sum_qty"], sum(r["sum_qty"] for r in parts), rel_tol=1e-9)


def test_pricing_cube_adds_status_level():
    import __ray_entry__ as e

    rows = e.queries()["pricing_cube"](SF).take_all()
    by_status = [r for r in rows if r["l_returnflag"] is None and r["l_linestatus"] is not None]
    finest = [r for r in rows if r["l_returnflag"] is not None and r["l_linestatus"] is not None]
    assert by_status, "cube must include the (NULL, status) grouping set"
    for bs in by_status:
        parts = [r for r in finest if r["l_linestatus"] == bs["l_linestatus"]]
        assert bs["n"] == sum(r["n"] for r in parts)


def test_pivot_counts_cells():
    import pyarrow.compute as pc

    import __ray_entry__ as e

    t = e.queries()["events_pivot"](SF)
    assert t.num_columns == 31                      # event_type + 30 days
    total = sum(pc.sum(t[c]).as_py() for c in t.column_names if c != "event_type")
    assert total == 1000                            # sf0.001 events rows


def test_bucketed_windows_consistent_with_null_keys():
    import pyarrow as pa
    import ray.data as rd

    from saber_ray.stages.relational import running_totals

    # one block holds user 7 WITH a null neighbour, another without: the
    # null used to flip the block to float64 bucketing, splitting user
    # 7's rows across two running sums
    t1 = pa.table({
        "event_id": pa.array([1, 2], type=pa.int64()),
        "ts": pa.array([1, 2], type=pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([7, None], type=pa.int64()),
        "value": pa.array([1.0, 5.0]),
    })
    t2 = pa.table({
        "event_id": pa.array([3], type=pa.int64()),
        "ts": pa.array([3], type=pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([7], type=pa.int64()),
        "value": pa.array([2.0]),
    })
    ds = rd.from_arrow(t1).union(rd.from_arrow(t2))
    out = {r["event_id"]: r["running_value"] for r in running_totals(ds).take_all()}
    assert out[1] == 1.0 and out[3] == 3.0     # one continuous sum for user 7


def test_window_count_join_numeric_on_column_guards():
    import pytest
    import ray.data as rd

    from saber_ray.stages.relational import window_count_join

    left = rd.from_arrow(pa.table({
        "event_id": pa.array([1], type=pa.int64()),
        "pos": pa.array([100], type=pa.int64()),
        "user_id": pa.array([7], type=pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "pos": pa.array([95, 99, 100], type=pa.int64()),
        "user_id": pa.array([7, 7, 7], type=pa.int64()),
    }))
    # integral numeric band works: [100-5, 100) -> positions 95, 99
    out = window_count_join(left, right, on="pos", before=5).take_all()
    assert out[0]["n_range"] == 2
    # fractional offsets on an int column would be silently floored
    with pytest.raises(TypeError):
        window_count_join(left, right, on="pos", after=0.9)
    # durations on a numeric column are rejected at the driver
    import datetime

    with pytest.raises(TypeError):
        window_count_join(left, right, on="pos", before=datetime.timedelta(minutes=1))


def test_sessionize_matches_duckdb():
    import __ray_entry__ as e

    got = e.queries()["events_sessions"](SF).to_pandas()
    want = _duck(e.oracle_sql()["events_sessions"])
    _frames_equal(got, want)


def test_sessionize_many_users_vectorized():
    """≥10^5 distinct users must NOT become 10^5 Python-level groups:
    sessionize buckets on hash(user) % P, so the pandas session kernel
    runs once per bucket. Correctness is asserted per-user on known
    gap patterns on known users."""
    import numpy as np

    from saber_ray.stages.relational import sessionize

    n_users = 100_000
    base = np.datetime64("2024-01-01T00:00:00", "us")
    hour = np.timedelta64(3600, "s")
    minute = np.timedelta64(60, "s")
    # every user gets 2 events 1 h apart (2 sessions); users ≡ 0 (mod 10)
    # get a third event 1 min after the first (still session 1)
    users = np.repeat(np.arange(n_users, dtype=np.int64), 2)
    ts = np.tile(np.array([base, base + hour]), n_users)
    extra = np.arange(0, n_users, 10, dtype=np.int64)
    users = np.concatenate([users, extra])
    ts = np.concatenate([ts, np.full(len(extra), base + minute)])
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array(users, type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "event_id": pa.array(np.arange(len(users), dtype=np.int64)),
        "value": pa.array(np.zeros(len(users))),
    }))

    # take_all() converts 200k timestamp rows one Python scalar at a
    # time (~minutes); to_pandas() is the vectorized consumption path.
    out = sessionize(ds).to_pandas()

    assert len(out) == 2 * n_users               # 2 sessions per user
    per_user = out.groupby("user_id").size()
    assert len(per_user) == n_users
    assert (per_user == 2).all()
    u0 = out[out["user_id"] == 0].sort_values("session_num")
    assert list(u0["n"]) == [2, 1]               # user 0: 3 events, gap after 2
    u1 = out[out["user_id"] == 1].sort_values("session_num")
    assert list(u1["n"]) == [1, 1]


def _frames_equal(got, want):
    import pandas as pd

    got = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
    want = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_tpch_q12_matches_duckdb():
    import __ray_entry__ as e

    _frames_equal(e.queries()["tpch_q12"](SF).to_pandas(),
                  _duck(e.oracle_sql()["tpch_q12"]))


def test_tpch_q13_matches_duckdb():
    import __ray_entry__ as e

    _frames_equal(e.queries()["tpch_q13"](SF).to_pandas(),
                  _duck(e.oracle_sql()["tpch_q13"]))


def test_tpch_q17_matches_duckdb():
    import __ray_entry__ as e

    _frames_equal(e.queries()["tpch_q17"](SF).to_pandas(),
                  _duck(e.oracle_sql()["tpch_q17"]))


def test_tpch_q22_matches_duckdb():
    import __ray_entry__ as e

    _frames_equal(e.queries()["tpch_q22"](SF).to_pandas(),
                  _duck(e.oracle_sql()["tpch_q22"]))


def test_filter_join_more_partitions_than_rows():
    """Regression: the native hash join lost partition schemas when
    P > left rows (ArrowInvalid FieldRef on the empty side); the
    bucketed engine must be exact at ANY partition count."""
    from saber_ray.stages.relational import anti_join, semi_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "payload": ["a", "b", "c", "d", "e"],
    }))
    right = rd.from_arrow(pa.table({"rk": pa.array([2, 4, 9], type=pa.int64())}))
    for n in (2, 16, 64):
        semi = sorted(r["k"] for r in
                      semi_join(left, right, "k", "rk", num_partitions=n).take_all())
        anti = sorted(r["k"] for r in
                      anti_join(left, right, "k", "rk", num_partitions=n).take_all())
        assert semi == [2, 4], n
        assert anti == [1, 3, 5], n


def test_filter_join_null_key_semantics():
    """SQL EXISTS semantics: a null left key matches nothing — semi
    drops it, anti KEEPS it; null right keys match nothing."""
    from saber_ray.stages.relational import anti_join, semi_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, None, 3], type=pa.int64()),
        "payload": ["a", "b", "c"],
    }))
    right = rd.from_arrow(pa.table({"rk": pa.array([1, None], type=pa.int64())}))
    semi = sorted(r["payload"] for r in
                  semi_join(left, right, "k", "rk", num_partitions=4).take_all())
    anti = sorted(r["payload"] for r in
                  anti_join(left, right, "k", "rk", num_partitions=4).take_all())
    assert semi == ["a"]
    assert anti == ["b", "c"]


def test_filter_join_key_type_widening():
    """A right key column of a narrower int type joins against an int64
    left key (the cast happens at the tag stage, not per bucket)."""
    from saber_ray.stages.relational import semi_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([10, 20, 30], type=pa.int64()),
        "payload": ["x", "y", "z"],
    }))
    right = rd.from_arrow(pa.table({"rk": pa.array([20, 30], type=pa.int32())}))
    got = sorted(r["k"] for r in
                 semi_join(left, right, "k", "rk", num_partitions=8).take_all())
    assert got == [20, 30]


def test_lookup_join_more_partitions_than_rows():
    """Regression: Q12/Q13 used the native hash join, which loses the
    schema of shuffle partitions receiving zero rows from one side
    (guaranteed when P exceeds a filtered side's row count). The
    bucketed lookup_join must be exact at ANY partition count, inner
    and outer."""
    from saber_ray.stages.relational import lookup_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 2, 3, 9], type=pa.int64()),
        "payload": ["a", "b", "c", "d", "e"],
    }))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([1, 2, 4], type=pa.int64()),
        "val": ["one", "two", "four"],
    }))
    for n in (2, 16, 64):
        inner = sorted(
            (r["k"], r["payload"], r["val"]) for r in lookup_join(
                left, right, "k", "rk", ["val"], num_partitions=n
            ).take_all())
        assert inner == [(1, "a", "one"), (2, "b", "two"),
                         (2, "c", "two")], n
        outer = sorted(
            (r["k"], r["val"] or "-") for r in lookup_join(
                left, right, "k", "rk", ["val"], num_partitions=n,
                outer=True,
            ).take_all())
        assert outer == [(1, "one"), (2, "two"), (2, "two"),
                         (3, "-"), (9, "-")], n


def test_lookup_join_duplicate_right_key_raises():
    from ray.exceptions import RayTaskError

    from saber_ray.stages.relational import lookup_join

    left = rd.from_arrow(pa.table({"k": pa.array([1], type=pa.int64())}))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([1, 1], type=pa.int64()),
        "val": ["x", "y"],
    }))
    import pytest as _pytest
    with _pytest.raises((RayTaskError, ValueError)):
        lookup_join(left, right, "k", "rk", ["val"],
                    num_partitions=4).take_all()


def test_lookup_join_null_keys_never_match():
    from saber_ray.stages.relational import lookup_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, None], type=pa.int64()),
        "payload": ["a", "b"],
    }))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([1, None], type=pa.int64()),
        "val": ["one", "null-row"],
    }))
    inner = [(r["payload"], r["val"]) for r in lookup_join(
        left, right, "k", "rk", ["val"], num_partitions=4).take_all()]
    assert inner == [("a", "one")]
    outer = sorted((r["payload"], r["val"] or "-") for r in lookup_join(
        left, right, "k", "rk", ["val"], num_partitions=4,
        outer=True).take_all())
    assert outer == [("a", "one"), ("b", "-")]


def test_tpch_q12_narrow_window_empty_left():
    """The exact review failure scenario: a date window so narrow the
    filtered lineitem side is tiny/empty — must return an empty/small
    result, not crash on empty shuffle partitions."""
    from saber_ray.sources.testdata import read_table

    from saber_ray.stages.relational import line_priority_counts

    out = line_priority_counts(
        read_table(SF, "orders"), read_table(SF, "lineitem"),
        date_lo="1901-01-01", date_hi="1901-01-02",
    ).take_all()
    assert out == []


def test_tpch_q22_no_positive_balances_empty():
    """avg over an empty positive-balance set is NULL; SQL `> NULL`
    matches nothing — the query must return 0 rows, not crash."""
    from saber_ray.stages.relational import inactive_customer_balances

    cust = rd.from_arrow(pa.table({
        "c_custkey": pa.array([1, 2], type=pa.int64()),
        "c_nationkey": pa.array([1, 3], type=pa.int32()),
        "c_acctbal": pa.array([-5.0, -1.0], type=pa.float64()),
    }))
    orders = rd.from_arrow(pa.table({
        "o_custkey": pa.array([1], type=pa.int64()),
        "o_orderpriority": ["1-URGENT"],
    }))
    out = inactive_customer_balances(cust, orders)
    assert out.count() == 0
    assert set(out.schema().names) == {"c_nationkey", "numcust", "totacctbal"}


def test_tpch_q7_matches_duckdb():
    import __ray_entry__ as e

    _frames_equal(e.queries()["tpch_q7"](SF).to_pandas(),
                  _duck(e.oracle_sql()["tpch_q7"]))


def test_tpch_q8_matches_duckdb():
    import __ray_entry__ as e

    _frames_equal(e.queries()["tpch_q8"](SF).to_pandas(),
                  _duck(e.oracle_sql()["tpch_q8"]))


def test_tpch_q9_matches_duckdb():
    import __ray_entry__ as e

    _frames_equal(e.queries()["tpch_q9"](SF).to_pandas(),
                  _duck(e.oracle_sql()["tpch_q9"]))


def test_tpch_q15_matches_duckdb():
    import __ray_entry__ as e

    _frames_equal(e.queries()["tpch_q15"](SF).to_pandas(),
                  _duck(e.oracle_sql()["tpch_q15"]))


def test_tpch_q16_matches_duckdb():
    import __ray_entry__ as e

    _frames_equal(e.queries()["tpch_q16"](SF).to_pandas(),
                  _duck(e.oracle_sql()["tpch_q16"]))


def test_tpch_q19_matches_duckdb():
    import __ray_entry__ as e

    _frames_equal(e.queries()["tpch_q19"](SF).to_pandas(),
                  _duck(e.oracle_sql()["tpch_q19"]))


def test_tpch_q21_matches_duckdb():
    import __ray_entry__ as e

    _frames_equal(e.queries()["tpch_q21"](SF).to_pandas(),
                  _duck(e.oracle_sql()["tpch_q21"]))


def test_tpch_q2_matches_duckdb():
    import __ray_entry__ as e

    _frames_equal(e.queries()["tpch_q2"](SF).to_pandas(),
                  _duck(e.oracle_sql()["tpch_q2"]))


def test_tpch_q11_matches_duckdb():
    import __ray_entry__ as e

    _frames_equal(e.queries()["tpch_q11"](SF).to_pandas(),
                  _duck(e.oracle_sql()["tpch_q11"]))


def test_tpch_q20_matches_duckdb():
    import __ray_entry__ as e

    _frames_equal(e.queries()["tpch_q20"](SF).to_pandas(),
                  _duck(e.oracle_sql()["tpch_q20"]))


def test_tpch_q2_no_matching_parts_empty_with_schema():
    import pyarrow.parquet as pq

    from saber_ray.sources.testdata import read_table
    from saber_ray.stages.relational import min_cost_supplier

    out = min_cost_supplier(
        read_table(SF, "lineitem",
                   columns=["l_partkey", "l_suppkey", "l_quantity",
                            "l_extendedprice"]),
        pq.read_table(f"{SF}/part.parquet",
                      columns=["p_partkey", "p_brand", "p_type", "p_size"]),
        pq.read_table(f"{SF}/supplier.parquet"),
        pq.read_table(f"{SF}/nation.parquet"),
        pq.read_table(f"{SF}/region.parquet"),
        region="ASIA", max_size=0, part_type="STANDARD",
    )
    assert out.num_rows == 0
    assert out.column_names == [
        "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
        "supply_cost"]


def test_tpch_q20_unmatched_prefix_empty():
    import pyarrow.parquet as pq

    from saber_ray.sources.testdata import read_table
    from saber_ray.stages.relational import promotable_suppliers

    out = promotable_suppliers(
        read_table(SF, "lineitem",
                   columns=["l_partkey", "l_suppkey", "l_quantity",
                            "l_shipdate"]),
        pq.read_table(f"{SF}/part.parquet",
                      columns=["p_partkey", "p_name"]),
        pq.read_table(f"{SF}/supplier.parquet"),
        pq.read_table(f"{SF}/nation.parquet"),
        name_prefix="no-such-prefix ",
    )
    assert out.num_rows == 0
    assert out.column_names == ["s_name", "s_acctbal"]


def test_events_lag_matches_duckdb():
    import __ray_entry__ as e

    _frames_equal(e.queries()["events_lag"](SF).to_pandas(),
                  _duck(e.oracle_sql()["events_lag"]))


def test_user_lag_many_users_no_per_key_groups():
    # the bucket shape: 10^4 distinct users must produce at most P
    # Python-level groups (the bucket count), never one per user
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from saber_ray.stages.relational import user_lag

    rng = np.random.default_rng(11)
    n = 40_000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 10_000, n).astype(np.int64),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
        "value": rng.normal(size=n),
    })
    out = user_lag(rd.from_pandas(df)).to_pandas()
    assert len(out) == n
    got = out.sort_values("event_id").reset_index(drop=True)
    exp = df.sort_values(["user_id", "ts", "event_id"])
    prev = (exp.assign(prev=exp.groupby("user_id", sort=False)["value"].shift(1))
            .sort_values("event_id").reset_index(drop=True))
    assert np.allclose(got["prev_value"].to_numpy(), prev["prev"].to_numpy(),
                       equal_nan=True)


def test_grouped_corr_matches_duckdb():
    import __ray_entry__ as e

    _frames_equal(e.queries()["grouped_corr"](SF).to_pandas(),
                  _duck(e.oracle_sql()["grouped_corr"]))


def test_grouped_pearson_degenerate_groups():
    # n=1 and zero-variance groups must yield SQL-null stats, not inf
    import pandas as pd
    import ray.data as rd

    from saber_ray.stages.relational import grouped_pearson

    df = pd.DataFrame({
        "g": ["lone", "flat", "flat", "ok", "ok", "ok"],
        "x": [1.0, 5.0, 5.0, 1.0, 2.0, 3.0],
        "y": [2.0, 1.0, 2.0, 2.0, 4.0, 6.0],
    })
    out = (grouped_pearson(rd.from_pandas(df), "g", "x", "y")
           .to_pandas().set_index("g"))
    assert pd.isna(out.loc["lone", "stddev_x"]) and pd.isna(out.loc["lone", "corr"])
    assert out.loc["flat", "stddev_x"] == 0.0 and pd.isna(out.loc["flat", "corr"])
    assert abs(out.loc["ok", "corr"] - 1.0) < 1e-9


def test_events_active_users_matches_duckdb():
    import __ray_entry__ as e

    _frames_equal(e.queries()["events_active_users"](SF).to_pandas(),
                  _duck(e.oracle_sql()["events_active_users"]))


def test_funnel_strict_ordering():
    """Step i+1 counts only first-events STRICTLY after the user's
    step-i first event: equal timestamps don't convert, pre-step events
    don't convert, and every step row is emitted even when zero users
    reach it."""
    from saber_ray.stages.relational import funnel

    rows = [
        # u1 converts fully: signup < click < purchase
        (1, 0, "signup"), (1, 10, "click"), (1, 20, "purchase"),
        # u2: click BEFORE signup only → step 1 only
        (2, 10, "signup"), (2, 5, "click"),
        # u3: click only, never signed up → no steps
        (3, 1, "click"), (3, 2, "purchase"),
        # u4: click at the SAME ts as signup (not strictly after)
        (4, 7, "signup"), (4, 7, "click"),
        # u5: signup→click, purchase before the click → step 2
        (5, 0, "signup"), (5, 9, "click"), (5, 4, "purchase"),
        # noise event type is ignored
        (1, 1, "error"),
    ]
    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([_ts(r[1]) for r in rows], type=pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], type=pa.string()),
    }))
    got = {r["step"]: (r["event_type"], r["users"])
           for r in funnel(ev).take_all()}
    assert got == {1: ("signup", 4), 2: ("click", 2), 3: ("purchase", 1)}


def test_cohort_retention():
    """cohort = epoch-week of first signup; each (user, active week ≥
    cohort) counts once; pre-signup activity and never-signed-up users
    are excluded; duplicate events in a week don't double-count."""
    import datetime as dt2

    from saber_ray.stages.relational import cohort_retention

    def at(day: int, hour: int = 0):
        return dt2.datetime(2024, 1, 1) + dt2.timedelta(days=day, hours=hour)

    import numpy as np

    week_us = 7 * 24 * 3600 * 1_000_000
    w0 = int(np.datetime64(at(0), "us").astype(np.int64)) // week_us

    rows = [
        # u1: signup in w0, active w0 (twice) and w0+2
        (1, at(0), "signup"), (1, at(1), "click"), (1, at(1, 5), "view"),
        (1, at(15), "purchase"),
        # u2: pre-signup click in w0 (excluded), signup w0+1, active w0+1
        (2, at(2), "click"), (2, at(8), "signup"), (2, at(9), "view"),
        # u3: never signs up
        (3, at(3), "click"),
    ]
    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], type=pa.string()),
    }))
    got = {(r["cohort_week"], r["week_offset"]): r["users"]
           for r in cohort_retention(ev).take_all()}
    assert got == {(w0, 0): 1, (w0, 2): 1, (w0 + 1, 0): 1}


def test_event_transitions():
    """Consecutive pairs per user in (ts, event_id) order; ties broken
    by event_id; sequences never cross users; last event has no
    successor."""
    from saber_ray.stages.relational import event_transitions

    rows = [  # (user, minute, event_id, type)
        (1, 0, 1, "a"), (1, 1, 2, "b"), (1, 2, 3, "a"),
        (2, 0, 4, "a"), (2, 0, 5, "b"),   # same ts → event_id order
        (3, 5, 6, "c"),                   # singleton: no pair
    ]
    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([_ts(r[1]) for r in rows], type=pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[3] for r in rows], type=pa.string()),
    }))
    got = {(r["from_type"], r["to_type"]): r["n"]
           for r in event_transitions(ev).take_all()}
    assert got == {("a", "b"): 2, ("b", "a"): 1}


def test_grouped_outliers():
    """Known moments: group 'a' = nine 0.0s and one 10.0 → mean 1,
    sd 3 → only the 10.0 exceeds |x−m| > 2σ; a constant group has
    σ = 0 and no outliers; nulls are ignored in n and the counts."""
    from saber_ray.stages.relational import grouped_outliers

    ev = rd.from_arrow(pa.table({
        "event_type": pa.array(["a"] * 10 + ["b"] * 3 + ["a"],
                               type=pa.string()),
        "value": pa.array([0.0] * 9 + [10.0] + [5.0, 5.0, 5.0] + [None],
                          type=pa.float64()),
    }))
    got = {r["event_type"]: (r["n"], r["n_outliers"])
           for r in grouped_outliers(ev, z=2.0).take_all()}
    assert got == {"a": (10, 1), "b": (3, 0)}


def test_grouped_outliers_null_group():
    """A NULL group key is a first-class group: its own moments, its own
    counts — not the (0, 0, 0) stats-miss that counts everything."""
    from saber_ray.stages.relational import grouped_outliers

    ev = rd.from_arrow(pa.table({
        "event_type": pa.array([None, None, "a", "a"], type=pa.string()),
        "value": pa.array([5.0, 5.0, 1.0, 1.0], type=pa.float64()),
    }))
    got = {r["event_type"]: (r["n"], r["n_outliers"])
           for r in grouped_outliers(ev, z=2.0).take_all()}
    assert got == {None: (2, 0), "a": (2, 0)}


# ------------------------------------------------------- rank / ntile ---


def test_rank_within_tie_semantics():
    """SQL RANK: tie rows share the min rank, the next rank skips."""
    from saber_ray.stages.relational import rank_within

    ev = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "user_id": pa.array([7, 7, 7, 7, 8], type=pa.int64()),
        "value": pa.array([3.0, 9.0, 9.0, 1.0, 4.0], type=pa.float64()),
    }))
    got = {r["event_id"]: r["rnk"] for r in rank_within(ev).take_all()}
    assert got == {2: 1, 3: 1, 1: 3, 4: 4, 5: 1}


def test_events_rank_matches_duckdb():
    import __ray_entry__ as e

    got = e.queries()["events_rank"](SF).to_pandas()
    want = _duck(e.oracle_sql()["events_rank"])
    _frames_equal(got, want)


def test_ntile_remainder_distribution():
    """NTILE(4) over 6 rows: the first 6 % 4 = 2 tiles get 2 rows, the
    last two get 1 — and tile boundaries follow (value, id) order."""
    from saber_ray.stages.relational import ntile_summary

    ev = rd.from_arrow(pa.table({
        "event_id": pa.array(list(range(6)), type=pa.int64()),
        "event_type": pa.array(["x"] * 6),
        "value": pa.array([10.0, 20.0, 30.0, 40.0, 50.0, 60.0]),
    }))
    rows = {r["tile"]: (r["n"], r["min_value"], r["max_value"])
            for r in ntile_summary(ev).take_all()}
    assert rows == {1: (2, 10.0, 20.0), 2: (2, 30.0, 40.0),
                    3: (1, 50.0, 50.0), 4: (1, 60.0, 60.0)}


def test_events_ntile_matches_duckdb():
    import __ray_entry__ as e

    got = e.queries()["events_ntile"](SF).to_pandas()
    want = _duck(e.oracle_sql()["events_ntile"])
    _frames_equal(got, want)


# --------------------------------------------------------- full outer ---


def test_nation_coverage_full_outer_zero_fill():
    """Keys on only one side survive with a 0 on the other; shared keys
    carry both counts."""
    from saber_ray.stages.relational import nation_coverage

    cust = rd.from_arrow(pa.table({
        "c_nationkey": pa.array([1, 1, 2], type=pa.int64()),
        "c_acctbal": pa.array([9500.0, 9600.0, 9700.0]),
    }))
    supp = rd.from_arrow(pa.table({
        "s_nationkey": pa.array([2, 3], type=pa.int64()),
        "s_acctbal": pa.array([9800.0, 9900.0]),
    }))
    got = {r["nationkey"]: (r["n_cust"], r["n_supp"])
           for r in nation_coverage(cust, supp).take_all()}
    assert got == {1: (2, 0), 2: (1, 1), 3: (0, 1)}


def test_nation_coverage_empty_side():
    """An all-empty side must not poison the outer join: the other
    side survives with zeros."""
    from saber_ray.stages.relational import nation_coverage

    cust = rd.from_arrow(pa.table({
        "c_nationkey": pa.array([4], type=pa.int64()),
        "c_acctbal": pa.array([9500.0]),
    }))
    supp = rd.from_arrow(pa.table({
        "s_nationkey": pa.array([5], type=pa.int64()),
        "s_acctbal": pa.array([100.0]),   # filtered out → empty side
    }))
    got = {r["nationkey"]: (r["n_cust"], r["n_supp"])
           for r in nation_coverage(cust, supp).take_all()}
    assert got == {4: (1, 0)}


def test_conversion_time_semantics():
    """first view → first purchase; converted-before-exposure users and
    single-sided users are dropped; seconds carry microsecond precision."""
    from saber_ray.stages.relational import conversion_time

    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 2, 2, 3, 4], type=pa.int64()),
        "ts": pa.array([_ts(10), _ts(25), _ts(20), _ts(5), _ts(7), _ts(9)],
                       type=pa.timestamp("us")),
        "event_type": pa.array(["view", "purchase", "view", "purchase",
                                "view", "purchase"]),
    })).repartition(3)
    got = {r["user_id"]: r["seconds"]
           for r in conversion_time(ev).take_all()}
    # user 1 converts in 15 min; user 2 purchased BEFORE viewing → out;
    # users 3/4 are single-sided → out
    assert got == {1: 900.0}


def test_type_cooccurrence_baskets():
    """Pairs count BASKETS (user-day), not event occurrences; order
    inside the pair is canonical (a < b)."""
    from saber_ray.stages.relational import type_cooccurrence

    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2, 2], type=pa.int64()),
        "ts": pa.array([_ts(1), _ts(2), _ts(3),
                        dt.datetime(2024, 1, 2, 0, 1), _ts(4), _ts(5)],
                       type=pa.timestamp("us")),
        "event_type": pa.array(["view", "view", "click", "click",
                                "click", "view"]),
    })).repartition(3)
    got = {(r["type_a"], r["type_b"]): r["n_baskets"]
           for r in type_cooccurrence(ev).take_all()}
    # user1 day1 basket {view, click} (view repeats → still one basket),
    # user1 day2 basket {click} (no pair), user2 day1 {click, view}
    assert got == {("click", "view"): 2}


def test_watermark_window_late_drop():
    """Arrival order = event_id: an event more than `lateness` behind
    the running-max watermark (inclusive of itself) is late; a fresh
    maximum is never late; segment boundaries must not change verdicts."""
    from saber_ray.stages.relational import watermark_window_counts

    # arrivals: ts 0:00, 2:00 (wm jumps), then a 0:10 straggler (late by
    # 1h50 > 30min), then 1:45 (late by 15min → on time)
    ev = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "ts": pa.array([dt.datetime(2024, 1, 1, 0, 0),
                        dt.datetime(2024, 1, 1, 2, 0),
                        dt.datetime(2024, 1, 1, 0, 10),
                        dt.datetime(2024, 1, 1, 1, 45)],
                       type=pa.timestamp("us")),
    })).repartition(2)
    for segs in (1, 3):   # prefix carry across segments must not matter
        got = {str(r["window_start"]): (r["n_on_time"], r["n_late"])
               for r in watermark_window_counts(
                   ev, num_segments=segs).take_all()}
        assert got == {
            "2024-01-01 00:00:00": (1, 1),   # 0:00 on time, 0:10 late
            "2024-01-01 01:00:00": (1, 0),   # 1:45 within lateness
            "2024-01-01 02:00:00": (1, 0),   # fresh max never late
        }, segs


def test_latest_state_argmax_tiebreak():
    """One row per key with the latest (ts, event_id) payload; equal
    timestamps resolve by the id tiebreak."""
    from saber_ray.stages.relational import latest_state

    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2], type=pa.int64()),
        "ts": pa.array([_ts(10), _ts(20), _ts(20), _ts(5)],
                       type=pa.timestamp("us")),
        "event_id": pa.array([7, 8, 9, 1], type=pa.int64()),
        "event_type": pa.array(["a", "b", "c", "d"]),
        "value": pa.array([1.0, 2.0, 3.0, 4.0]),
    })).repartition(3)
    got = {r["user_id"]: (r["event_type"], r["value"])
           for r in latest_state(ev).take_all()}
    assert got == {1: ("c", 3.0), 2: ("d", 4.0)}


def test_ewma_by_key_matches_scan():
    """Grouped-ewm bucket shape == an explicit per-key recursive fold,
    across partition layouts; NaN/null values are dropped first."""
    import numpy as np

    from saber_ray.stages.relational import ewma_by_key

    rng = np.random.default_rng(13)
    n = 600
    users = rng.integers(0, 37, n)
    base = dt.datetime(2024, 1, 1)
    ts = [base + dt.timedelta(seconds=int(t))
          for t in rng.integers(0, 10**6, n)]
    vals = rng.normal(size=n) * 50
    vals[::97] = np.nan  # NaN rows must not perturb the state
    tbl = pa.table({
        "user_id": pa.array(users, type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "event_id": pa.array(range(n), type=pa.int64()),
        "value": pa.array(vals, type=pa.float64(), from_pandas=True),
    })

    def brute(alpha):
        rows = sorted(
            (u, t, e, v) for u, t, e, v in
            zip(users, ts, range(n), vals) if not np.isnan(v))
        acc, cnt = {}, {}
        for u, _, _, v in rows:
            acc[u] = v if u not in acc else acc[u] * (1 - alpha) + v * alpha
            cnt[u] = cnt.get(u, 0) + 1
        return {u: (cnt[u], round(acc[u], 6)) for u in acc}

    for p in (1, 5):
        out = ewma_by_key(
            rd.from_arrow(tbl).repartition(p), alpha=0.25).take_all()
        got = {r["user_id"]: (r["n"], r["ewma"]) for r in out}
        assert got == brute(0.25)

    import pytest

    with pytest.raises(ValueError, match="alpha"):
        ewma_by_key(rd.from_arrow(tbl), alpha=0.0)


def test_ewma_by_key_null_keys_dropped():
    """Null keys must not reach pandas (dropna would eat them AND widen
    the bucket's int key column to float64)."""
    from saber_ray.stages.relational import ewma_by_key

    base = dt.datetime(2024, 1, 1)
    tbl = pa.table({
        "user_id": pa.array([1, None, 1, None, 2], type=pa.int64()),
        "ts": pa.array([base + dt.timedelta(seconds=i) for i in range(5)],
                       type=pa.timestamp("us")),
        "event_id": pa.array(range(5), type=pa.int64()),
        "value": pa.array([4.0, 100.0, 8.0, 100.0, 6.0]),
    })
    out = ewma_by_key(rd.from_arrow(tbl).repartition(2),
                      alpha=0.5).take_all()
    got = {r["user_id"]: (r["n"], r["ewma"]) for r in out}
    assert got == {1: (2, 6.0), 2: (1, 6.0)}
    assert all(isinstance(k, int) for k in got)


def test_grouped_regression_matches_numpy():
    import numpy as np
    import pytest

    from saber_ray.stages.relational import grouped_regression

    rng = np.random.default_rng(3)
    rows = []
    truth = {}
    for g, (m, b) in {"a": (2.0, 1.0), "b": (-0.5, 3.0)}.items():
        x = rng.uniform(0, 10, 80)
        y = m * x + b + rng.normal(0, 0.3, 80)
        rows += [{"g": g, "x": float(xi), "y": float(yi)}
                 for xi, yi in zip(x, y)]
        A = np.vstack([x, np.ones_like(x)]).T
        slope, inter = np.linalg.lstsq(A, y, rcond=None)[0]
        ss_res = float(((y - (slope * x + inter)) ** 2).sum())
        ss_tot = float(((y - y.mean()) ** 2).sum())
        truth[g] = (80, round(slope, 6), round(inter, 6),
                    round(1 - ss_res / ss_tot, 6))
    # zero-x-variance group: slope/intercept/r2 are SQL NULL
    rows += [{"g": "flat", "x": 5.0, "y": float(v)} for v in (1, 2, 3)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(5)
    out = grouped_regression(ds, "g", "x", "y")
    tbl = {r["g"]: r for r in out.take_all()}
    for g in ("a", "b"):
        got = tbl[g]
        n, slope, inter, r2 = truth[g]
        assert got["n"] == n
        assert got["slope"] == pytest.approx(slope, abs=2e-6)
        assert got["intercept"] == pytest.approx(inter, abs=2e-6)
        assert got["r2"] == pytest.approx(r2, abs=2e-6)
    flat = tbl["flat"]
    assert flat["n"] == 3
    assert flat["slope"] is None and flat["intercept"] is None
    assert flat["r2"] is None
    # constant-y group: DuckDB regr_r2 is 1.0 (exact fit), not NULL
    consty = rd.from_arrow(pa.Table.from_pylist(
        [{"g": "c", "x": float(i), "y": 5.0} for i in range(4)]))
    row = grouped_regression(consty, "g", "x", "y").take_all()[0]
    assert row["slope"] == 0.0 and row["intercept"] == 5.0
    assert row["r2"] == 1.0


def test_null_partition_keys_survive_windows():
    """SQL window functions keep a NULL partition (PARTITION BY user_id
    groups the NULL rows together); the bucketed pandas merges used to
    drop or crash on them (rank's NaN.astype(int64) raised). r05
    regression: every null-key row must come back with real values."""
    import datetime as dt

    from saber_ray.stages.relational import rank_within, running_totals, user_lag

    t0 = dt.datetime(2024, 1, 1)
    ev = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "user_id": pa.array([7, None, None, 8], type=pa.int64()),
        "ts": pa.array([t0 + dt.timedelta(minutes=i) for i in range(4)],
                       type=pa.timestamp("us")),
        "value": pa.array([3.0, 9.0, 4.0, 1.0], type=pa.float64()),
    })).repartition(2)

    ranks = {r["event_id"]: r["rnk"] for r in rank_within(ev).take_all()}
    assert len(ranks) == 4                      # nothing dropped
    assert ranks[2] == 1 and ranks[3] == 2      # NULL partition ranked

    lag = {r["event_id"]: r["prev_value"] for r in user_lag(ev).take_all()}
    assert len(lag) == 4
    assert lag[3] == 9.0                        # LAG within NULL partition

    tot = {r["event_id"]: r["running_value"]
           for r in running_totals(ev).take_all()}
    assert len(tot) == 4
    assert tot[3] == 13.0                       # cumsum within NULL partition
