"""Mergeable sketches: HyperLogLog approximate distinct counting.

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

import numpy as np
import pyarrow as pa

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
