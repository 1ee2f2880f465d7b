"""Distributed chunk/mention/triple evaluation (A3) — P/R/F1 per label
with exact/left/right boundary criteria, as ONE keyed shuffle.

The reference accumulates TP/FP/FN per label in-process
(saber/metrics.py:124-201); distributed, the same math becomes:

1. map each side to its match key (criteria-projected) + side marker;
2. ``groupby(key)`` counting pred/gold occurrences per key (membership
   semantics matching the reference: every pred occurrence of a key
   present in gold is a TP; gold keys absent from pred are FNs);
3. per-label TP/FP/FN sums → driver-side scalar P/R/F1
   (functions/metrics.py, the unit-tested port of the reference math).

Works for mention tables and triple tables alike — a triple is scored
as a chunk whose label is the whole (subj, pred, obj) tuple.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from ..functions.metrics import CRITERIA, precision_recall_f1_support


def _join_cols(batch: pa.Table, names: list[str]) -> pa.Array:
    """Vectorized '|'-joined string key over columns (no Python row loop)."""
    import pyarrow.compute as pc

    parts = [
        pc.cast(batch[n], pa.string()).combine_chunks() for n in names
    ]
    return pc.binary_join_element_wise(*parts, "|")


def _mention_key_batch(batch: pa.Table, criteria: str, side: str) -> pa.Table:
    if criteria == "exact":
        key = _join_cols(batch, ["doc_id", "span_idx", "start", "end"])
    elif criteria == "left":
        key = _join_cols(batch, ["doc_id", "span_idx", "start"])
    else:  # right
        key = _join_cols(batch, ["doc_id", "span_idx", "end"])
    n = batch.num_rows
    return pa.table(
        {
            "label": pa.compute.cast(batch["label"], pa.string()),
            "key": key,
            "pred_n": pa.array([1 if side == "pred" else 0] * n, type=pa.int64()),
            "gold_n": pa.array([1 if side == "gold" else 0] * n, type=pa.int64()),
        }
    )


def _triple_key_batch(batch: pa.Table, side: str) -> pa.Table:
    key = _join_cols(batch, ["doc_id", "subj", "pred", "obj"])
    n = batch.num_rows
    return pa.table(
        {
            "label": pa.array(["triple"] * n, type=pa.string()),
            "key": key,
            "pred_n": pa.array([1 if side == "pred" else 0] * n, type=pa.int64()),
            "gold_n": pa.array([1 if side == "gold" else 0] * n, type=pa.int64()),
        }
    )


def _confusion(keyed: rd.Dataset) -> dict[str, tuple[int, int, int]]:
    """keyed (label, key, pred_n, gold_n) → {label: (tp, fp, fn)}."""
    per_key = (
        keyed.groupby(["label", "key"])
        .sum(["pred_n", "gold_n"])
        .rename_columns({"sum(pred_n)": "pred_n", "sum(gold_n)": "gold_n"})
    )

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # membership semantics matching the reference (and
        # functions/metrics.evaluate_chunks): every pred occurrence of a
        # key present in gold is a TP; gold keys absent from pred are FNs
        gold_hit = pc.greater(batch["gold_n"], 0)
        pred_hit = pc.greater(batch["pred_n"], 0)
        zero = pa.scalar(0, type=pa.int64())
        tp = pc.if_else(gold_hit, batch["pred_n"], zero)
        fp = pc.subtract(batch["pred_n"], tp)
        fn = pc.if_else(pred_hit, zero, batch["gold_n"])
        t = pa.table({"label": batch["label"], "tp": tp, "fp": fp, "fn": fn})
        return t.group_by("label").aggregate([("tp", "sum"), ("fp", "sum"), ("fn", "sum")])

    agg = (
        per_key.map_batches(partial, batch_format="pyarrow")
        .groupby("label")
        .sum(["tp_sum", "fp_sum", "fn_sum"])
    )
    out: dict[str, tuple[int, int, int]] = {}
    for row in agg.take_all():
        out[row["label"]] = (
            int(row["sum(tp_sum)"]), int(row["sum(fp_sum)"]), int(row["sum(fn_sum)"])
        )
    return out


def _scores(conf: dict[str, tuple[int, int, int]]) -> dict[str, tuple]:
    scores: dict[str, tuple] = {}
    tp_t = fp_t = fn_t = 0
    for label in sorted(conf):
        tp, fp, fn = conf[label]
        scores[label] = precision_recall_f1_support(tp, fp, fn)
        tp_t, fp_t, fn_t = tp_t + tp, fp_t + fp, fn_t + fn
    if scores:
        k = len(scores)
        scores["MACRO_AVG"] = tuple(
            sum(v[i] for v in list(scores.values())[:k]) / k for i in range(3)
        ) + (tp_t + fn_t,)
    else:
        scores["MACRO_AVG"] = (0.0, 0.0, 0.0, 0)
    scores["MICRO_AVG"] = precision_recall_f1_support(tp_t, fp_t, fn_t)
    return scores


def confusion_table(keyed: rd.Dataset) -> pa.Table:
    """Per-label confusion counts as an exact-integer Arrow table
    (label, tp, fp, fn) — the distributed half of A3 exposed in a shape
    a SQL oracle can reproduce bit-for-bit (the P/R/F1 scalar math on
    top is ``functions/metrics.py``, unit-tested against the reference).

    ``keyed`` rows are (label, key, pred_n, gold_n) occurrence markers —
    the same contract ``_confusion`` consumes (one row per occurrence;
    the groupby sums multiplicities per key).
    """
    conf = _confusion(keyed)
    labels = sorted(conf)
    return pa.table(
        {
            "label": pa.array(labels, type=pa.string()),
            "tp": pa.array([conf[l][0] for l in labels], type=pa.int64()),
            "fp": pa.array([conf[l][1] for l in labels], type=pa.int64()),
            "fn": pa.array([conf[l][2] for l in labels], type=pa.int64()),
        }
    )


def evaluate_mentions(
    pred: rd.Dataset, gold: rd.Dataset, criteria: str = "exact"
) -> dict[str, tuple]:
    """Distributed mention-level P/R/F1 per label + micro/macro.

    ``pred``/``gold`` are MENTIONS-shaped datasets (doc_id, span_idx,
    start, end, label). One groupby shuffle regardless of corpus size.
    """
    if criteria not in CRITERIA:
        raise ValueError(f"Expected criteria to be one of {CRITERIA}. Got: {criteria}")
    keyed = pred.map_batches(
        lambda b: _mention_key_batch(b, criteria, "pred"), batch_format="pyarrow"
    ).union(
        gold.map_batches(
            lambda b: _mention_key_batch(b, criteria, "gold"), batch_format="pyarrow"
        )
    )
    return _scores(_confusion(keyed))


def evaluate_triples(pred: rd.Dataset, gold: rd.Dataset) -> dict[str, tuple]:
    """Distributed triple-level P/R/F1 (the ≥0.95 gate at corpus scale)."""
    keyed = pred.map_batches(
        lambda b: _triple_key_batch(b, "pred"), batch_format="pyarrow"
    ).union(
        gold.map_batches(lambda b: _triple_key_batch(b, "gold"), batch_format="pyarrow")
    )
    return _scores(_confusion(keyed))
