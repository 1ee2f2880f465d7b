"""Edit-distance near-dup: deletion-neighborhood blocking completeness
vs brute-force Levenshtein, banded-DP parity, normalization, edge cases."""
import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from saber_ray.stages.dedup import (
    _lev_banded,
    _variant_rows,
    edit_distance_pairs,
    normalized_prefix,
)


def _full_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _run(texts, k=2, prefix=24, **kw):
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    out = edit_distance_pairs(
        rd.from_arrow(tbl).repartition(3), k=k, prefix=prefix, **kw
    ).to_pandas()
    return {(int(r.id_a), int(r.id_b)): int(r.dist)
            for r in out.itertuples()}


def _brute(texts, k=2, prefix=24):
    keys = [" ".join(t.lower().split())[:prefix] for t in texts]
    out = {}
    for i, j in itertools.combinations(range(len(texts)), 2):
        if not keys[i] or not keys[j]:
            continue
        d = _full_lev(keys[i], keys[j])
        if d <= k:
            out[(i, j)] = d
    return out


def test_lev_banded_matches_full():
    rng = np.random.default_rng(11)
    alpha = "abcd"
    for _ in range(300):
        a = "".join(rng.choice(list(alpha), size=rng.integers(0, 9)))
        b = "".join(rng.choice(list(alpha), size=rng.integers(0, 9)))
        for k in (1, 2, 3):
            full = _full_lev(a, b)
            got = _lev_banded(a, b, k)
            assert got == (full if full <= k else k + 1), (a, b, k)


def test_exact_distance_values():
    texts = [
        "the quick brown fox",       # 0
        "the quick brown fox",       # 1: dist 0 to 0
        "the quick brawn fox",       # 2: dist 1 (substitution)
        "the quick brown foxx",      # 3: dist 1 (insertion)
        "the quik brown fox",        # 4: dist 1 (deletion)
        "the quick brawn foxx",      # 5: dist 2
        "a totally different doc",   # 6: far away
    ]
    got = _run(texts)
    assert got == _brute(texts)
    assert got[(0, 1)] == 0 and got[(0, 2)] == 1
    assert got[(0, 3)] == 1 and got[(0, 4)] == 1 and got[(0, 5)] == 2
    assert not any(6 in p for p in got)


def test_completeness_random_corpus():
    # random mutations of a few seeds: blocking must find EVERY pair
    # brute force finds (pigeonhole completeness, buckets under the cap)
    rng = np.random.default_rng(7)
    seeds = ["lorem ipsum dolor sit amet", "pack my box with five dozen",
             "jackdaws love my big sphinx"]
    texts = []
    for s in seeds:
        for _ in range(6):
            chars = list(s)
            for _ in range(rng.integers(0, 3)):
                op = rng.integers(0, 3)
                pos = int(rng.integers(0, len(chars)))
                if op == 0:
                    chars[pos] = chr(ord("a") + int(rng.integers(0, 26)))
                elif op == 1 and len(chars) > 1:
                    del chars[pos]
                else:
                    chars.insert(pos, chr(ord("a") + int(rng.integers(0, 26))))
            texts.append("".join(chars))
    assert _run(texts, max_bucket=4096) == _brute(texts)


def test_normalization_and_empties():
    texts = ["  The   QUICK\tbrown\nfox  ", "the quick brown fox",
             "", "   \t\n  "]
    got = _run(texts)
    assert got == {(0, 1): 0}  # whitespace collapse + lower; empties drop
    key = normalized_prefix(pa.array(["  A \t B\n\nC  "]), 24)[0].as_py()
    assert key == "a b c"


def test_short_keys_and_empty_variant():
    # "ab" vs "cd": lev 2, common subsequence "" — needs the 0-width
    # variant for completeness
    got = _run(["ab", "cd", "xy"])
    assert got == {(0, 1): 2, (0, 2): 2, (1, 2): 2}


def test_variant_rows_dedupe_equal_deletions():
    tbl = pa.table({
        "doc_id": pa.array([1], type=pa.int64()),
        "text": pa.array(["aab"], type=pa.string()),
    })
    rows = _variant_rows(tbl, "text", "doc_id", 2, 24)
    vh = rows["vh"].to_pylist()
    assert len(vh) == len(set(vh))  # no (id, vh) duplicates
    # "aab": {aab} ∪ {ab (×2, deduped), aa} ∪ {a (×2, deduped), b}
    assert len(vh) == 5


def test_layout_invariance():
    texts = [f"document number {i:03d} padded" for i in range(40)]
    texts += [t.replace("0", "o", 1) for t in texts[:5]]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    outs = []
    for p in (1, 7):
        out = edit_distance_pairs(
            rd.from_arrow(tbl).repartition(p), k=2, prefix=24).to_pandas()
        outs.append(sorted(map(tuple, out.to_numpy().tolist())))
    assert outs[0] == outs[1] and len(outs[0]) > 0
