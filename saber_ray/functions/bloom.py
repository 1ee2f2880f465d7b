"""Distributed Bloom filter for shuffle pruning.

At 100 TB the dominant cost of a semi/anti/inner join is the all-to-all
exchange of the PROBE side. When the build side's key set is selective,
a Bloom filter built in one streaming pass over the build keys and
broadcast via ``ray.put`` lets every probe-side map task drop
definite-non-matching rows BEFORE the shuffle — rows that survive are
then joined exactly, so false positives cost only unpruned bytes, never
wrong results (the classic Bloom-join; reference semantics: plain
``semi_join`` in ``stages/relational.py``).

Hashing is vectorized end-to-end: integer keys are mixed with a
splitmix64 numpy kernel; string keys use polars' Rust hash when
available (stdlib blake2b fallback). Bits use double hashing
``idx_i = h1 + i*h2 (mod m)`` (Kirsch–Mitzenmacher), so two 64-bit
hashes serve any ``num_hashes``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _splitmix64(x: np.ndarray, seed: int) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a well-mixed 64-bit hash for
    integer keys (public-domain constants from the splitmix64 PRNG)."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += np.uint64(0x9E3779B97F4A7C15 ^ (seed * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def _polars_available() -> bool:
    try:
        import polars  # noqa: F401

        return True
    except Exception:
        return False


def key_hashes64(
    column: "pa.ChunkedArray | pa.Array", seed: int = 0,
    str_impl: str = "polars",
) -> np.ndarray:
    """uint64 hash per value of an Arrow column, vectorized.

    Integer columns: splitmix64 on the raw values (zero-copy in).
    String columns: the impl named by ``str_impl`` — ``"polars"``
    (Rust-side row hash) or ``"blake2b"`` (stdlib, per-row). The impl is
    chosen ONCE on the driver (see :class:`BloomFilter`) and pinned:
    build and probe tasks MUST hash identically or the Bloom filter
    yields false negatives (silently dropped matching rows), so a task
    where the pinned impl is unavailable raises instead of falling back.
    """
    if isinstance(column, pa.ChunkedArray):
        column = column.combine_chunks()
    if pa.types.is_integer(column.type):
        # fill nulls BEFORE to_numpy: a null forces a float64 conversion
        # that silently rounds ints >2^53 (2^60+1 -> 2^60), so the same
        # key would hash differently depending on its block's null count
        # — a Bloom FALSE NEGATIVE. Nulls hash as 0 (never joinable
        # anyway; at worst one extra false positive).
        if column.null_count:
            column = column.fill_null(0)
        vals = column.to_numpy(zero_copy_only=False).astype(np.uint64)
        return _splitmix64(vals, seed)
    if str_impl == "polars":
        import polars as pl  # pinned impl missing → loud ImportError

        s = pl.from_arrow(pa.chunked_array([column]))
        return s.hash(seed=seed).to_numpy().astype(np.uint64)
    if str_impl == "blake2b":
        import hashlib

        return np.array(
            [
                int.from_bytes(
                    hashlib.blake2b(
                        str(v).encode(), digest_size=8, salt=seed.to_bytes(8, "big")
                    ).digest(),
                    "big",
                )
                for v in column.to_pylist()
            ],
            dtype=np.uint64,
        )
    raise ValueError(f"unknown str_impl {str_impl!r}")


class BloomFilter:
    """Fixed-size bitset with double hashing. ``bits`` is a uint64 word
    array — cheap to ``ray.put`` (plasma gives probe tasks a zero-copy
    read-only view) and to OR-merge across partial builds."""

    def __init__(self, num_bits: int = 1 << 23, num_hashes: int = 4,
                 bits: np.ndarray | None = None, str_impl: str | None = None):
        assert num_bits % 64 == 0
        self.num_bits = num_bits
        self.num_hashes = num_hashes
        # pin the string-hash impl at construction (driver side) so every
        # build/probe task — whatever its local import situation — uses
        # the SAME function; a worker missing the pinned impl raises
        # rather than silently hashing differently (false negatives)
        self.str_impl = str_impl if str_impl is not None else (
            "polars" if _polars_available() else "blake2b")
        self.bits = bits if bits is not None else np.zeros(
            num_bits // 64, dtype=np.uint64)

    def _indices(self, column) -> np.ndarray:
        """(num_hashes, n) bit indices for a key column."""
        h1 = key_hashes64(column, seed=0, str_impl=self.str_impl)
        h2 = key_hashes64(column, seed=1, str_impl=self.str_impl) | np.uint64(1)  # odd → full cycle
        i = np.arange(self.num_hashes, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return (h1[None, :] + i * h2[None, :]) % np.uint64(self.num_bits)

    def add(self, column) -> None:
        idx = self._indices(column).ravel()
        np.bitwise_or.at(
            self.bits, (idx >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (idx & np.uint64(63)),
        )

    def might_contain(self, column) -> np.ndarray:
        """Boolean mask: False = DEFINITELY absent; True = probably
        present (exact join downstream resolves false positives)."""
        idx = self._indices(column)
        words = self.bits[(idx >> np.uint64(6)).astype(np.int64)]
        hit = (words >> (idx & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0).astype(bool)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.num_bits == other.num_bits
        assert self.str_impl == other.str_impl, (
            "merging Bloom filters built with different string-hash impls "
            f"({self.str_impl} vs {other.str_impl}) would corrupt membership")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    @property
    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.bits.view(np.uint8)).mean())


def build_bloom(
    ds, column: str, num_bits: int = 1 << 23, num_hashes: int = 4,
    fold_partitions: int = 16,
) -> BloomFilter:
    """One streaming pass over the build side: each block folds its keys
    into ONE local bitmap row (vectorized bit-sets), a coalesced
    second level ORs block bitmaps within ``fold_partitions``
    partitions, and the driver ORs the ≤``fold_partitions`` survivors —
    the driver never sees per-block bitmaps, so build cost is
    O(num_bits × fold_partitions) driver memory regardless of corpus
    size. No shuffle of keys at any point."""

    # pin the string-hash impl ONCE here on the driver; every build task
    # and (via the returned filter) every probe task uses exactly it
    str_impl = "polars" if _polars_available() else "blake2b"

    def block_bitmap(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(num_bits, num_hashes, str_impl=str_impl)
        bf.add(batch[column])
        return pa.table({"bitmap": pa.array([bf.bits.tobytes()], type=pa.large_binary())})

    def or_fold(batch: pa.Table) -> pa.Table:
        acc = np.zeros(num_bits // 64, dtype=np.uint64)
        for buf in batch["bitmap"].to_pylist():
            np.bitwise_or(acc, np.frombuffer(buf, dtype=np.uint64), out=acc)
        return pa.table({"bitmap": pa.array([acc.tobytes()], type=pa.large_binary())})

    partials = (
        ds.select_columns([column])
        .map_batches(block_bitmap, batch_format="pyarrow", batch_size=None)
        .repartition(fold_partitions)
        .map_batches(or_fold, batch_format="pyarrow", batch_size=None)
    )
    out = BloomFilter(num_bits, num_hashes, str_impl=str_impl)
    for row in partials.take_all():
        np.bitwise_or(
            out.bits, np.frombuffer(row["bitmap"], dtype=np.uint64), out=out.bits
        )
    return out


def bloom_semi_join(
    left, right, left_on: str, right_on: str,
    num_bits: int = 1 << 23, num_hashes: int = 4,
    num_partitions: int | None = None,
):
    """semi_join with a Bloom pre-filter on the probe side: build a
    filter over ``right``'s keys (streaming, no shuffle), broadcast it
    once, drop definite-non-matching ``left`` rows per batch BEFORE the
    join shuffle, then run the exact ``semi_join`` on the survivors.
    Result is row-identical to ``semi_join`` — the Bloom stage only
    removes rows the join would drop anyway."""
    import ray

    from ..stages.relational import semi_join

    bloom = build_bloom(right, right_on, num_bits, num_hashes)
    ref = ray.put(bloom)

    def prefilter(batch: pa.Table) -> pa.Table:
        bf: BloomFilter = ray.get(ref)
        return batch.filter(pa.array(bf.might_contain(batch[left_on])))

    pruned = left.map_batches(prefilter, batch_format="pyarrow")
    return semi_join(pruned, right, left_on, right_on, num_partitions)
