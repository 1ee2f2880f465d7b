"""Token-trie surface matching — the large-gazetteer strategy.

The regex-alternation tagger (stages/tagger.py:build_surface_pattern) is
fastest for small dictionaries but degrades linearly with surface count
(measured: ~25 ms per KB of text at 100k surfaces — Python's ``re``
doesn't trie-optimize big alternations). Production grounding
dictionaries (UniProt/ChEBI-scale) hold 10^5–10^6 surface forms, so the
engine also ships this token-level longest-match trie: build O(total
surface tokens), match O(text tokens × max phrase length) — independent
of dictionary size.

Semantics are IDENTICAL to the regex path (unit-tested parity):
case-insensitive, NERsuite token boundaries, leftmost-longest,
non-overlapping; multi-token surfaces match across whitespace runs but
not across intervening punctuation tokens.
"""

from __future__ import annotations

from .text import TOKEN_RE, tokenize

_LEAF = "\x00leaf"


class TokenTrieMatcher:
    """Longest-match surface matcher over NERsuite tokens."""

    def __init__(self, surfaces: dict[str, str]):
        """``surfaces``: normalized surface form → label."""
        self._trie: dict = {}
        self._max_len = 1
        for surface, label in surfaces.items():
            toks = tokenize(surface.lower())
            if not toks:
                continue
            node = self._trie
            for tok in toks:
                node = node.setdefault(tok, {})
            # leaf payload: (normalized surface key, label)
            node[_LEAF] = (" ".join(toks), label)
            self._max_len = max(self._max_len, len(toks))

    def finditer(self, text: str):
        """Yield ``(char_start, char_end, norm_surface, label)`` matches,
        leftmost-longest, non-overlapping — the regex path's contract."""
        toks = [(m.group().lower(), m.start(), m.end()) for m in TOKEN_RE.finditer(text)]
        n = len(toks)
        i = 0
        trie = self._trie
        while i < n:
            node = trie.get(toks[i][0])
            if node is None:
                i += 1
                continue
            best = node.get(_LEAF)
            best_j = i
            j = i
            while j + 1 < n and j - i + 1 < self._max_len:
                nxt = node.get(toks[j + 1][0])
                if nxt is None:
                    break
                j += 1
                node = nxt
                leaf = node.get(_LEAF)
                if leaf is not None:
                    best = leaf
                    best_j = j
            if best is None:
                i += 1
                continue
            yield toks[i][1], toks[best_j][2], best[0], best[1]
            i = best_j + 1
