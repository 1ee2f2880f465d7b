"""Remaining per-record preprocessing operators from the reference's
surface (SURVEY.md §2.2): input validation with quarantine (M10),
rare-token replacement (M6), one-hot target encoding (M12),
entity-class filtering (M13), annotation combining (M14), the optional
coreference stage (M4, gated like the reference's ``en_coref_md``
dependency), and hot-key detection (P6) feeding the canonicalization
salt list.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..constants import ENTITY_CLASSES, UNK

# ------------------------------------------------------------------ M10 ---


def validate_documents(batch: pa.Table) -> pa.Table:
    """Input validation with quarantine semantics.

    The reference raises on non-str/empty text (saber/saber.py:83-86);
    a streaming engine must not kill a 100 TB job for one bad row, so
    invalid documents are FLAGGED (``valid`` column + reason), never
    dropped silently — the span-sequence invariant requires every input
    row to reach the output.
    """
    valid, reason = [], []
    for doc_id, spans in zip(batch["doc_id"].to_pylist(), batch["spans"].to_pylist()):
        if doc_id is None or doc_id == "":
            valid.append(False)
            reason.append("missing doc_id")
        elif spans is None:
            valid.append(False)
            reason.append("null spans")
        elif any(s["kind"] == "text" and s["text"] is None for s in spans):
            valid.append(False)
            reason.append("null text span")
        else:
            valid.append(True)
            reason.append("")
    out = batch.append_column("valid", pa.array(valid, type=pa.bool_()))
    return out.append_column("invalid_reason", pa.array(reason, type=pa.string()))


def quarantine_split(ds: rd.Dataset) -> tuple[rd.Dataset, rd.Dataset]:
    """(valid docs, quarantined docs) — both streams, nothing dropped."""
    flagged = ds.map_batches(validate_documents, batch_format="pyarrow")
    return flagged.filter(expr="valid == True"), flagged.filter(expr="valid == False")


# ------------------------------------------------------------------- M6 ---


def replace_rare_tokens_batch(
    batch: pa.Table, rare_ref, column: str = "text", unk: str = UNK
) -> pa.Table:
    """Map-side rare-token replacement: the rare set (from
    ``textstats.rare_tokens``) is broadcast via ``ray.put`` and each
    task replaces occurrences with <UNK> (reference:
    saber/preprocessor.py:229-257, NUM_RARE=1)."""
    rare = ray.get(rare_ref) if isinstance(rare_ref, ray.ObjectRef) else rare_ref
    if not rare:
        return batch
    import re

    pat = re.compile(
        r"(?<![0-9a-zA-Z])(?:" + "|".join(re.escape(t) for t in sorted(rare)) + r")(?![0-9a-zA-Z])"
    )
    texts = [
        pat.sub(unk, t) if t else t for t in batch[column].to_pylist()
    ]
    idx = batch.column_names.index(column)
    return batch.set_column(idx, column, pa.array(texts, type=pa.string()))


# ------------------------------------------------------------------ M12 ---


def one_hot(ids: np.ndarray, num_classes: int) -> np.ndarray:
    """Tag-id matrix → one-hot targets (reference: to_categorical,
    saber/dataset.py:168-169). Train-time kernel."""
    flat = np.asarray(ids, dtype=np.int64)
    out = np.zeros(flat.shape + (num_classes,), dtype=np.float32)
    np.put_along_axis(out, flat[..., None], 1.0, axis=-1)
    return out


# ------------------------------------------------------------------ M13 ---


def filter_entity_classes(
    mentions: rd.Dataset, enabled: tuple[str, ...] = ENTITY_CLASSES
) -> rd.Dataset:
    """Keep only mentions of enabled classes (reference ENTITIES toggles,
    saber/constants.py:39-44; saber/utils/app_utils.py:117-142)."""
    enabled_list = list(enabled)

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch["label"], value_set=pa.array(enabled_list))
        return batch.filter(mask)

    return mentions.map_batches(keep, batch_format="pyarrow")


# ------------------------------------------------------------------ M14 ---


def combine_annotations(*annotated: rd.Dataset) -> rd.Dataset:
    """Union per-model annotated-document datasets into one mention
    stream with exact duplicate collapse (reference concatenates ents
    lists per request, saber/utils/app_utils.py:165-178; the dedup
    groupby is the distributed upgrade SURVEY P5 calls for)."""
    from .triples import explode_mentions

    streams = [a.map_batches(explode_mentions, batch_format="pyarrow") for a in annotated]
    out = streams[0]
    for s in streams[1:]:
        out = out.union(s)
    dedup = out.groupby(["doc_id", "span_idx", "start", "end", "label"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )
    return dedup


# ------------------------------------------------------------------- M4 ---


#: third-person pronouns the rule resolver rewrites; possessives get an
#: "'s" suffix on the antecedent (neuralcoref substitutes the cluster's
#: main mention the same way — "his" → "Peter's")
_PRONOUNS = {
    "he": False, "him": False, "she": False, "it": False,
    "they": False, "them": False,
    "his": True, "her": True, "hers": True, "its": True,
    "their": True, "theirs": True,
}

_CAP_TOKEN = re.compile(r"[A-Z][A-Za-z0-9]*")
_WORD = re.compile(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]")


def resolve_coref_text(text: str) -> str:
    """Deterministic rule-based coreference: rewrite third-person
    pronouns to their most recent NAMED antecedent (a maximal run of
    capitalized tokens that is not merely sentence-initial), the way
    ``doc._.coref_resolved`` substitutes each mention with its
    cluster's main mention (reference saber/preprocessor.py:54-57).

    Recency-only resolution (Hobbs-lite): no gender/number agreement —
    documented simplification; a pronoun before any antecedent is left
    untouched, and a document with no antecedents returns unchanged
    (neuralcoref's "empty string if no coreference found" → keep text).
    """
    return _resolve_carrying(text, None)[0]


def _resolve_carrying(text: str, antecedent: str | None) -> tuple[str, str | None]:
    """Core resolver with a carried antecedent — the discourse continues
    across the text spans of one interleaved document."""
    if not text:
        return text, antecedent
    # tokens with offsets; sentence-initial = first word token after
    # ./!/? or start
    tokens = [(m.group(), m.start(), m.end()) for m in _WORD.finditer(text)]
    out: list[str] = []
    last = 0
    sent_initial = True
    i = 0
    while i < len(tokens):
        tok, start, end = tokens[i]
        lower = tok.lower()
        if tok in {".", "!", "?"}:
            sent_initial = True
            i += 1
            continue
        if lower in _PRONOUNS and antecedent is not None:
            # do not rewrite a sentence-initial capitalized pronoun that
            # could itself be a name ("It" is safe; "He" is safe too —
            # pronoun list wins over the capitalization heuristic)
            out.append(text[last:start])
            out.append(antecedent + ("'s" if _PRONOUNS[lower] else ""))
            last = end
        elif _CAP_TOKEN.fullmatch(tok) and lower not in _PRONOUNS:
            # candidate antecedent: maximal run of capitalized tokens;
            # a lone sentence-initial capitalized word only counts if it
            # recurs capitalized mid-sentence somewhere in the document
            j = i
            while (j + 1 < len(tokens)
                   and _CAP_TOKEN.fullmatch(tokens[j + 1][0])
                   and tokens[j + 1][0].lower() not in _PRONOUNS):
                j += 1
            phrase = text[tokens[i][1]:tokens[j][2]]
            if j > i or not sent_initial or _recurs_mid_sentence(tokens, tok):
                antecedent = phrase
            sent_initial = False
            i = j + 1
            continue
        else:
            sent_initial = False
        i += 1
    out.append(text[last:])
    return "".join(out), antecedent


def _recurs_mid_sentence(tokens, tok: str) -> bool:
    prev_break = True
    for t, _, _ in tokens:
        if t in {".", "!", "?"}:
            prev_break = True
            continue
        if t == tok and not prev_break:
            return True
        prev_break = False
    return False


class CorefResolver:
    """Optional coreference stage, OFF by default like the reference
    (coref=False, saber/saber.py:52).

    ``mode``:
      * ``"rule"`` (default) — the deterministic recency resolver above,
        applied to every text span of the interleaved document (media
        spans untouched);
      * ``"neural"`` — the reference's neuralcoref path; raises in this
        environment (model not installed), mirroring the reference's
        hard dependency;
      * ``"passthrough"`` — explicit no-op for pipeline-shape tests.
    """

    def __init__(self, mode: str = "rule", passthrough: bool = False):
        if passthrough:  # back-compat constructor flag
            mode = "passthrough"
        if mode == "neural":
            try:
                import neuralcoref  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "coref mode='neural' needs the neuralcoref model (not "
                    "in this environment); use mode='rule' for the "
                    "deterministic resolver"
                ) from e
        if mode not in ("rule", "neural", "passthrough"):
            raise ValueError(f"unknown coref mode {mode!r}")
        self._mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._mode == "passthrough":
            return batch
        spans_col = batch["spans"]
        new_spans = []
        for spans in spans_col.to_pylist():
            row = []
            antecedent = None  # discourse state carries ACROSS spans
            for s in spans or []:
                if s["kind"] == "text" and s["text"]:
                    new_text, antecedent = _resolve_carrying(s["text"], antecedent)
                    s = dict(s, text=new_text)
                row.append(s)
            new_spans.append(row)
        idx = batch.column_names.index("spans")
        return batch.set_column(
            idx, "spans", pa.array(new_spans, type=spans_col.type)
        )


# ------------------------------------------------------------------- P6 ---


def hot_keys(ds: rd.Dataset, column: str, k: int = 10) -> list[tuple[str, int]]:
    """Top-k hottest values of a column — drives the canonicalization
    salt list (groupby count → sort → limit; deterministic tie-break on
    the value)."""
    counts = ds.groupby(column).count()
    top = counts.sort(["count()", column], descending=[True, False]).limit(k)
    return [(r[column], r["count()"]) for r in top.take_all()]
