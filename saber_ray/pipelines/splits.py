"""Dataset split operators (P1/P2).

The reference splits with scikit-learn — 90/10 train/valid,
``random_state=42, shuffle=False`` (saber/utils/data_utils.py:139-182)
and 5-fold CV (saber/utils/data_utils.py:184-272). On a Dataset the
ordered, seedless equivalents are ``split_proportionately`` and
``split(k)`` — deterministic for a deterministic input order, which is
how the reference behaves with ``shuffle=False``.
"""

from __future__ import annotations

import ray.data as rd


def train_valid_split(ds: rd.Dataset, valid_fraction: float = 0.10):
    """Ordered 90/10 split (reference default TRAIN_TEST_SPLIT):
    valid is the TAIL of the dataset order, exactly like
    ``train_test_split(..., shuffle=False)``. ``split_at_indices`` is
    the order-preserving cut (``split_proportionately`` apportions per
    block, which interleaves rows)."""
    n = ds.count()
    cut = int(n * (1.0 - valid_fraction))
    train, valid = ds.split_at_indices([cut])
    return train, valid


def k_fold_splits(ds: rd.Dataset, k: int = 5):
    """k equal folds; fold i's (train, valid) = (rest, fold i)."""
    folds = ds.split(k, equal=False)
    out = []
    for i in range(k):
        rest = [f for j, f in enumerate(folds) if j != i]
        train = rest[0]
        for f in rest[1:]:
            train = train.union(f)
        out.append((train, folds[i]))
    return out


def seeded_shuffle(ds: rd.Dataset, seed: int = 42) -> rd.Dataset:
    """Deterministic corpus shuffle (P3 analogue: the reference seeds its
    random task order; training-data pipelines shuffle shards the same
    way). A full random_shuffle is an all-to-all exchange — at scale
    prefer ``randomize_block_order`` when block-level mixing suffices."""
    return ds.random_shuffle(seed=seed)
