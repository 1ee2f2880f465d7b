"""HyperLogLog sketch: partial pre-max, merge semantics, accuracy bound."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from saber_ray.stages.sketch import (
    approx_distinct_tokens,
    hll_estimate,
    hll_partial_rows,
)


def _registers_from_rows(idx, rank, p):
    regs = np.zeros(1 << p, dtype=np.int64)
    np.maximum.at(regs, idx, rank)
    return regs


def test_partial_rows_pre_maxed_and_bounded():
    p = 8
    values = [f"tok{i}" for i in range(5000)]
    idx, rank = hll_partial_rows(values, p=p)
    # at most one row per register, registers sorted/unique
    assert len(idx) <= (1 << p)
    assert len(np.unique(idx)) == len(idx)
    # pre-max equals the max over per-value singleton updates
    regs_bulk = _registers_from_rows(idx, rank, p)
    regs_single = np.zeros(1 << p, dtype=np.int64)
    for v in values:
        i1, r1 = hll_partial_rows([v], p=p)
        np.maximum.at(regs_single, i1, r1)
    assert np.array_equal(regs_bulk, regs_single)


def test_partials_merge_associatively():
    p = 10
    a = [f"a{i}" for i in range(3000)]
    b = [f"b{i}" for i in range(3000)]
    ia, ra = hll_partial_rows(a, p=p)
    ib, rb = hll_partial_rows(b, p=p)
    merged = np.maximum(
        _registers_from_rows(ia, ra, p), _registers_from_rows(ib, rb, p)
    )
    iu, ru = hll_partial_rows(a + b, p=p)
    assert np.array_equal(merged, _registers_from_rows(iu, ru, p))
    # duplicates never change the sketch
    idup, rdup = hll_partial_rows(a + a + b, p=p)
    assert np.array_equal(merged, _registers_from_rows(idup, rdup, p))


@pytest.mark.parametrize("n", [100, 2000, 50000])
def test_estimate_within_hll_error_bound(n):
    p = 12
    idx, rank = hll_partial_rows([f"v{i}" for i in range(n)], p=p)
    est = hll_estimate(_registers_from_rows(idx, rank, p))
    # standard error is 1.04/sqrt(m) ~ 1.6% at p=12; allow 5 sigma
    assert abs(est - n) / n < 5 * 1.04 / np.sqrt(1 << p)


def test_approx_distinct_tokens_dataset():
    # 400 docs, 1200 distinct tokens spread across them, heavy repeats
    rows = [
        {"text": " ".join(f"w{(i * 3 + j) % 1200}" for j in range(30))}
        for i in range(400)
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = approx_distinct_tokens(ds, column="text", p=12).take_all()
    assert len(out) == 1
    row = out[0]
    assert row["m"] == 4096
    truth = len({f"w{(i * 3 + j) % 1200}" for i in range(400) for j in range(30)})
    assert abs(row["estimate"] - truth) / truth < 0.1
    assert 0 < row["occupied"] <= 4096
