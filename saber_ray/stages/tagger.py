"""Mention-detection stage: a dictionary/gazetteer sequence tagger as a
Ray Data actor-pool `map_batches` class.

Reimagines the reference's BiLSTM-CRF tagging path
(saber/saber.py:52-128, saber/models/multi_task_lstm_crf.py) as a
deterministic, hermetic stage with the SAME interface a weights-backed
tagger would have: expensive setup (pattern compilation / model load)
happens once per actor in ``__init__``; ``__call__`` processes one Arrow
batch of interleaved documents and returns them annotated.

Semantics per document row:

* only ``kind == 'text'`` spans are scanned; media spans pass through
  untouched (per-row span-sequence invariant);
* matching is greedy longest-surface, case-insensitive, on NERsuite token
  boundaries (equivalent to emitting ``B-X``/``I-X`` tags for dictionary
  hits and chunking them with the reference's chunker —
  saber/preprocessor.py:195-227 — which is exactly what the unit tests
  cross-check);
* mention char offsets index into the ORIGINAL span text (never a
  sterilized view), so annotations can always be projected back;
* each mention records ``span_idx`` (position in the span list) and
  ``sent_idx`` (sentence ordinal within the span, boundaries after
  ``.!?``), which downstream triple emission uses for sentence-level
  co-occurrence.

Output schema = input columns + ``ents: list<struct<start, end, text,
label, span_idx, sent_idx>>`` + ``span_hash: string`` (the invariant
hash, recomputed and asserted by every later stage).
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..functions.hashing import span_sequence_hash

_ENT_TYPE = pa.struct(
    [
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("text", pa.string()),
        ("label", pa.string()),
        ("span_idx", pa.int32()),
        ("sent_idx", pa.int32()),
    ]
)
_SENT_BREAK = re.compile(r"[.!?]")


def build_surface_pattern(surfaces: dict[str, str]) -> re.Pattern:
    """Compile one alternation regex over all gazetteer surfaces.

    Alternatives are sorted longest-first so Python's leftmost-first
    alternation implements greedy longest match; token boundaries are
    enforced with alnum lookarounds (the NERsuite tokenizer's token
    boundary — saber/utils/text_utils.py:10). A space inside a surface
    matches any whitespace RUN (canonical semantics shared with the
    token-trie strategy — functions/matching.py).
    """
    # surfaces are normalized before compilation (trim + collapse
    # whitespace runs): a surface "p53 " MEANS "p53" — both strategies
    # and the grounding keys share this normalization
    norm = {re.sub(r"\s+", " ", s.strip()) for s in surfaces}
    norm.discard("")
    alts = sorted(norm, key=lambda s: (-len(s), s))

    def alt(s: str) -> str:
        # token-accurate boundaries: an alnum-run edge must not extend
        # ("p53" ≠ "p533"), but a punctuation edge is its own token and
        # needs no guard ("1-" matches inside "1-1")
        pre = r"(?<![0-9a-zA-Z])" if s[0].isalnum() else ""
        suf = r"(?![0-9a-zA-Z])" if s[-1].isalnum() else ""
        return pre + re.escape(s).replace(r"\ ", r"\s+") + suf

    body = "|".join(alt(s) for s in alts)
    return re.compile(rf"(?:{body})", re.IGNORECASE)


class DictionaryTagger:
    """Actor-pool stage: annotate interleaved documents with entity mentions.

    Parameters are plain picklable values (the gazetteer dict travels once
    per actor, not once per batch). A weights-backed tagger would take a
    model-bundle path here and load it in ``__init__`` exactly the same
    way (reference loads models once per process: saber/saber.py:75-81,
    saber/cli/app.py:92-93).
    """

    def __init__(self, surfaces: dict[str, str] | None = None):
        if surfaces is None:
            from ..gazetteer import SABER_SURFACES as surfaces  # noqa: N811
        self._ws = re.compile(r"\s+")
        self._labels = {
            self._ws.sub(" ", k.strip().lower()): v for k, v in surfaces.items()
        }
        self._pattern = build_surface_pattern(surfaces)

    def _label_of(self, matched: str) -> "str | None":
        # .get: re.IGNORECASE can match a Unicode case-variant (U+017F
        # 'ſ' for 's') whose .lower() is not a gazetteer key — treat as
        # a miss rather than KeyError-ing the batch task
        return self._labels.get(self._ws.sub(" ", matched.lower()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans_col = batch["spans"].to_pylist()
        ents_col: list[list[dict]] = []
        hashes: list[str] = []
        for spans in spans_col:
            ents: list[dict] = []
            for span_idx, span in enumerate(spans):
                if span["kind"] != "text" or not span["text"]:
                    continue
                text = span["text"]
                # sentence boundary char positions (end-exclusive prefix)
                sent_bounds = [m.start() for m in _SENT_BREAK.finditer(text)]
                for m in self._pattern.finditer(text):
                    label = self._label_of(m.group())
                    if label is None:
                        continue
                    sent_idx = 0
                    for b in sent_bounds:
                        if m.start() > b:
                            sent_idx += 1
                        else:
                            break
                    ents.append(
                        {
                            "start": m.start(),
                            "end": m.end(),
                            "text": m.group(),
                            "label": label,
                            "span_idx": span_idx,
                            "sent_idx": sent_idx,
                        }
                    )
            ents_col.append(ents)
            hashes.append(
                span_sequence_hash(
                    [s["kind"] for s in spans],
                    [s["text"] for s in spans],
                    [s["media_ref"] for s in spans],
                )
            )
        out = batch.append_column("ents", pa.array(ents_col, type=pa.list_(_ENT_TYPE)))
        if "span_hash" in batch.column_names:
            # invariant: spans unchanged since ingest
            prior = batch["span_hash"].to_pylist()
            if prior != hashes:
                raise AssertionError("span-sequence invariant violated in tagger input")
            return out
        return out.append_column("span_hash", pa.array(hashes, type=pa.string()))
