"""Token-trie surface matching — the large-gazetteer strategy.

The regex-alternation tagger (stages/tagger.py:build_surface_pattern) is
fastest for small dictionaries but degrades linearly with surface count
(measured: ~25 ms per KB of text at 100k surfaces — Python's ``re``
doesn't trie-optimize big alternations). Production grounding
dictionaries (UniProt/ChEBI-scale) hold 10^5–10^6 surface forms, so the
engine also ships this token-level longest-match trie: build O(total
surface tokens), match O(text tokens × max phrase length) — independent
of dictionary size.

CANONICAL MATCH SEMANTICS (shared with the regex strategy; parity is
unit-tested in tests/test_matching.py):

* case-insensitive, NERsuite token boundaries, leftmost-longest,
  non-overlapping;
* a SPACE inside a surface matches any whitespace RUN in the text
  ("cystic fibrosis" matches "cystic  fibrosis");
* ADJACENT tokens inside a surface (punctuated forms like "il-2")
  require adjacency in the text — "il - 2" does NOT match "il-2";
* the grounding key is the matched text normalized (lowercase,
  whitespace runs collapsed), so punctuated surfaces round-trip to
  their dictionary entries.
"""

from __future__ import annotations

from .text import TOKEN_RE, tokenize_with_offsets

_LEAF = "\x00leaf"
_ADJ = 1   # tokens must touch in the text
_WS = 0    # any whitespace run between tokens


def _surface_edges(surface: str) -> list[tuple[str, int]]:
    """Surface string → [(token, edge-to-previous), ...]; the first
    token's edge value is unused."""
    toks = tokenize_with_offsets(surface.lower())
    out = []
    prev_end = None
    for tok, start, end in toks:
        edge = _WS if prev_end is None or start > prev_end else _ADJ
        out.append((tok, edge))
        prev_end = end
    return out


class TokenTrieMatcher:
    """Longest-match surface matcher over NERsuite tokens."""

    def __init__(self, surfaces: dict[str, str]):
        """``surfaces``: surface form → label."""
        self._trie: dict = {}
        self._max_len = 1
        for surface, label in surfaces.items():
            toks = _surface_edges(surface)
            if not toks:
                continue
            node = self._trie
            for tok, edge in toks:
                node = node.setdefault((tok, edge), {})
            node[_LEAF] = label
            self._max_len = max(self._max_len, len(toks))

    def finditer(self, text: str):
        """Yield ``(char_start, char_end, label)`` matches,
        leftmost-longest, non-overlapping."""
        toks = [(m.group().lower(), m.start(), m.end()) for m in TOKEN_RE.finditer(text)]
        n = len(toks)
        i = 0
        trie = self._trie
        while i < n:
            node = trie.get((toks[i][0], _WS))
            if node is None:
                i += 1
                continue
            best_label = node.get(_LEAF)
            best_j = i
            j = i
            while j + 1 < n and j - i + 1 < self._max_len:
                adjacent = toks[j][2] == toks[j + 1][1]
                nxt = node.get((toks[j + 1][0], _ADJ)) if adjacent else None
                if nxt is None:
                    nxt = node.get((toks[j + 1][0], _WS))
                    # a _WS edge requires actual separation in the text
                    if nxt is not None and adjacent:
                        nxt = None
                if nxt is None:
                    break
                j += 1
                node = nxt
                leaf = node.get(_LEAF)
                if leaf is not None:
                    best_label = leaf
                    best_j = j
            if best_label is None:
                i += 1
                continue
            yield toks[i][1], toks[best_j][2], best_label
            i = best_j + 1
