"""Chunk-level precision / recall / F1 evaluation.

Reimplements the reference's evaluation math (saber/metrics.py:124-201 and
saber/utils/model_utils.py:186-206) so our pytest gates use the exact same
scoring the reference's tests validate:

* chunks are ``(label, start, end)`` triples; matching criteria ``exact``
  (both boundaries), ``left`` (start only) or ``right`` (end only);
* per-label TP / FP / FN accumulation by (multiset-insensitive) membership;
* zero-guards: TP == 0 → P = R = 0; P + R == 0 → F1 = 0;
* micro average = pooled counts; macro average = unweighted mean of
  per-label scores; support = TP + FN.

This same math scores triple-level P/R for the ≥0.95 gate: a triple
``(subj, pred, obj)`` is simply evaluated as a chunk whose "label" is the
whole tuple.
"""

from __future__ import annotations

from typing import Iterable, Sequence

CRITERIA = ("exact", "left", "right")


def precision_recall_f1_support(tp: int, fp: int, fn: int) -> tuple[float, float, float, int]:
    precision = tp / (tp + fp) if tp > 0 else 0.0
    recall = tp / (tp + fn) if tp > 0 else 0.0
    f1 = 2 * precision * recall / (precision + recall) if (precision + recall) > 0 else 0.0
    return precision, recall, f1, tp + fn


def _project(chunk: Sequence, criteria: str) -> tuple:
    if criteria == "exact":
        return tuple(chunk)
    if criteria == "left":
        return tuple(chunk[:2])
    # right: label + end boundary
    return tuple(chunk[::2])


def evaluate_chunks(
    y_true: Iterable[Sequence],
    y_pred: Iterable[Sequence],
    criteria: str = "exact",
) -> dict[str, tuple[float, float, float, int]]:
    """Score predicted chunks against gold chunks.

    Returns ``{label: (p, r, f1, support), ..., 'MACRO_AVG': ...,
    'MICRO_AVG': ...}``. Labels present only in predictions contribute FPs
    to the micro average (the reference iterates labels from y_true only;
    we keep pred-only labels so spurious classes are not silently free —
    with identical label sets the outputs agree with the reference).
    """
    if criteria not in CRITERIA:
        raise ValueError(
            f"Expected criteria to be one of {CRITERIA}. Got: {criteria}"
        )
    y_true = [tuple(c) for c in y_true]
    y_pred = [tuple(c) for c in y_pred]
    labels = sorted({c[0] for c in y_true} | {c[0] for c in y_pred})

    scores: dict[str, tuple[float, float, float, int]] = {}
    tp_total = fp_total = fn_total = 0
    for lab in labels:
        gold = [_project(c, criteria) for c in y_true if c[0] == lab]
        pred = [_project(c, criteria) for c in y_pred if c[0] == lab]
        tp = sum(1 for p in pred if p in gold)
        fp = sum(1 for p in pred if p not in gold)
        fn = sum(1 for g in gold if g not in pred)
        scores[lab] = precision_recall_f1_support(tp, fp, fn)
        tp_total += tp
        fp_total += fp
        fn_total += fn

    if scores:
        macro_p = sum(v[0] for v in scores.values()) / len(scores)
        macro_r = sum(v[1] for v in scores.values()) / len(scores)
        macro_f1 = sum(v[2] for v in scores.values()) / len(scores)
    else:
        macro_p = macro_r = macro_f1 = 0.0
    scores["MACRO_AVG"] = (macro_p, macro_r, macro_f1, tp_total + fn_total)
    scores["MICRO_AVG"] = precision_recall_f1_support(tp_total, fp_total, fn_total)
    return scores


def best_epoch(epoch_scores: list[tuple[float, float, float]]) -> int:
    """A4: index of the epoch with the best F1 (reference picks max by
    itemgetter(2) over (p, r, f1) tuples — saber/metrics.py:266-273).
    Ties resolve to the EARLIEST epoch, like ``max`` over a left-to-right
    scan."""
    if not epoch_scores:
        raise ValueError("no epochs to choose from")
    best_idx = 0
    for i, scores in enumerate(epoch_scores):
        if scores[2] > epoch_scores[best_idx][2]:
            best_idx = i
    return best_idx
