"""Bloom join prefilter: no false negatives, exactness vs semi_join,
and actual pruning on disjoint key sets."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from saber_ray.functions.bloom import BloomFilter, bloom_semi_join, build_bloom


def test_no_false_negatives_int_and_string_keys():
    rng = np.random.default_rng(7)
    ints = pa.array(rng.integers(0, 1 << 40, size=5000).tolist(), type=pa.int64())
    strs = pa.array([f"doc-{i*31}" for i in range(5000)])
    for col in (ints, strs):
        bf = BloomFilter(num_bits=1 << 16, num_hashes=4)
        bf.add(col)
        assert bf.might_contain(col).all()


def test_disjoint_keys_mostly_pruned():
    members = pa.array(list(range(0, 4000)), type=pa.int64())
    absent = pa.array(list(range(1_000_000, 1_004_000)), type=pa.int64())
    bf = BloomFilter(num_bits=1 << 17, num_hashes=4)
    bf.add(members)
    fp = bf.might_contain(absent).mean()
    assert fp < 0.05, f"false-positive rate {fp}"
    assert 0.0 < bf.fill_ratio < 0.5


def test_build_bloom_distributed_matches_local():
    keys = [f"k{i}" for i in range(3000)]
    ds = rd.from_arrow(pa.table({"k": keys})).repartition(8)
    dist = build_bloom(ds, "k", num_bits=1 << 16, fold_partitions=4)
    local = BloomFilter(num_bits=1 << 16)
    local.add(pa.array(keys))
    assert np.array_equal(dist.bits, local.bits)


def test_bloom_semi_join_identical_to_semi_join():
    from saber_ray.stages.relational import semi_join

    left = rd.from_arrow(pa.table({
        "id": pa.array(range(2000), type=pa.int64()),
        "k": pa.array([i % 500 for i in range(2000)], type=pa.int64()),
    })).repartition(4)
    right = rd.from_arrow(pa.table({
        "k": pa.array([3, 77, 240, 240, 499, 9999], type=pa.int64()),
    }))
    got = sorted(r["id"] for r in bloom_semi_join(
        left, right, "k", "k", num_bits=1 << 12, num_partitions=2).take_all())
    want = sorted(r["id"] for r in semi_join(
        left, right, "k", "k", num_partitions=2).take_all())
    assert got == want and len(got) == 2000 // 500 * 4


def test_no_false_negatives_with_nulls_and_large_ints():
    # a null in the column forces a float64 numpy conversion that used
    # to round ints >2^53 — hashing the same key differently per block
    big = 2**60 + 1
    bf = BloomFilter(num_bits=1 << 14, num_hashes=4)
    bf.add(pa.array([big, None, 7], type=pa.int64()))
    assert bf.might_contain(pa.array([big, 7], type=pa.int64())).all()
