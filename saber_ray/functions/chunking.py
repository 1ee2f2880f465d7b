"""BIO/BIOES tag-sequence chunking.

Reproduces the reference's exact semantics including its quirks
(reference: saber/preprocessor.py:195-227; goldens
saber/tests/test_preprocessor.py:82-100):

* only ``B-`` starts a chunk; it is extended by consecutive ``I-`` tags of
  the SAME type;
* ``E-`` / ``S-`` tags never start nor extend a chunk (BIOES fixtures such
  as ``B-DISO I-DISO I-DISO E-DISO`` therefore chunk WITHOUT the ``E-``
  token — a quirk the goldens depend on);
* a bare ``I-`` run with no preceding ``B-`` is dropped (invalid sequence);
* chunk end is exclusive.
"""

from __future__ import annotations


def bioes_tags(labels: list[str | None]) -> list[str]:
    """Per-token entity labels (``None`` = outside) → BIOES tag sequence.

    The inverse-direction kernel to ``chunk_entities``: maximal runs of
    one label become ``B- I-… E-`` (length ≥ 2) or a single ``S-``
    (length 1); everything else is ``O``. Matches the reference's tag
    alphabet (saber/tests/test_preprocessor.py:82-100 fixtures).
    """
    n = len(labels)
    tags: list[str] = []
    i = 0
    while i < n:
        lab = labels[i]
        if lab is None:
            tags.append("O")
            i += 1
            continue
        j = i + 1
        while j < n and labels[j] == lab:
            j += 1
        if j - i == 1:
            tags.append(f"S-{lab}")
        else:
            tags.append(f"B-{lab}")
            tags.extend(f"I-{lab}" for _ in range(j - i - 2))
            tags.append(f"E-{lab}")
        i = j
    return tags


def chunk_entities(tags: list[str]) -> list[tuple[str, int, int]]:
    """Return ``[(entity_type, start, end_exclusive), ...]`` for a tag seq."""
    chunks: list[tuple[str, int, int]] = []
    n = len(tags)
    i = 0
    while i < n:
        tag = tags[i]
        if not tag.startswith("B"):
            i += 1
            continue
        etype = tag.split("-")[-1]
        j = i + 1
        while j < n and tags[j].startswith("I") and tags[j].split("-")[-1] == etype:
            j += 1
        chunks.append((etype, i, j))
        i = j
    return chunks


def chunks_to_spans(
    chunks: list[tuple[str, int, int]],
    offsets: list[tuple[int, int]],
    text: str,
) -> list[tuple[int, int, str, str]]:
    """Project token-index chunks onto character spans of ``text``.

    ``offsets`` is the flattened per-token ``(char_start, char_end)`` list
    aligned with the tag sequence. Returns
    ``[(char_start, char_end, surface_text, label), ...]`` — the shape of
    the reference's ``ents`` entries (saber/saber.py:103-112).
    """
    spans = []
    for label, tok_start, tok_end in chunks:
        start = offsets[tok_start][0]
        end = offsets[tok_end - 1][1]
        spans.append((start, end, text[start:end], label))
    return spans
