"""Pure text kernels: sterilize, tokenize-with-offsets, sentence split.

These reproduce the reference's deterministic text behavior without any
spaCy dependency:

* ``sterilize`` — whitespace collapse + optional lowercase
  (reference: saber/preprocessor.py:259-277; goldens
  saber/tests/test_preprocessor.py:102-117).
* ``tokenize_with_offsets`` — the NERsuite-like tokenizer. The reference
  plugs the infix regex ``([0-9a-zA-Z]+|[^0-9a-zA-Z])`` into spaCy's
  ``Tokenizer`` (saber/utils/text_utils.py:10-17), whose contract is:
  split on whitespace first, then emit every infix match within each
  whitespace-delimited chunk. Since the regex tiles the whole chunk
  (alnum runs, or one char each for everything else), the regex alone
  fully determines tokens and character offsets — no spaCy needed.
  Goldens: saber/tests/test_text_utils.py:18-67.
* ``split_sentences`` — sentence boundaries after ``.`` / ``!`` / ``?``
  tokens. The reference relies on spaCy's parser (saber/preprocessor.py:76-99);
  this rule reproduces its golden
  (saber/tests/test_preprocessor.py:23-36) exactly on the fixture
  sentences and is deterministic at scale.

All functions are pure and operate on single strings; batch stages wrap
them (vectorizing where the kernel allows).
"""

from __future__ import annotations

import re

# Alnum runs are tokens; every other non-space char is its own token.
TOKEN_RE = re.compile(r"[0-9a-zA-Z]+|[^0-9a-zA-Z\s]")
_WS_RUN = re.compile(r"\s+")
_SENT_END = frozenset(".!?")


def sterilize(text: str, lower: bool = False) -> str:
    """Trim, collapse whitespace runs to one space, optionally lowercase."""
    out = _WS_RUN.sub(" ", text.strip())
    return out.lower() if lower else out


def tokenize_with_offsets(text: str) -> list[tuple[str, int, int]]:
    """Tokenize ``text``; returns ``[(token, char_start, char_end), ...]``.

    Offsets index into ``text`` as given (callers must therefore tokenize
    the ORIGINAL span text, not a sterilized view, so downstream mention
    offsets never drift — see SURVEY.md §7 "What's hard" #2).
    """
    return [(m.group(), m.start(), m.end()) for m in TOKEN_RE.finditer(text)]


def tokenize(text: str) -> list[str]:
    """Token strings only (golden-test surface)."""
    return TOKEN_RE.findall(text)


def split_sentences(
    toks: list[tuple[str, int, int]],
) -> tuple[list[list[str]], list[list[tuple[int, int]]]]:
    """Group a token stream into sentences.

    A sentence ends after a ``.``, ``!`` or ``?`` token. Returns
    ``(sentences, offsets)`` shaped like the reference's
    ``Preprocessor._process_text`` output (token strings per sentence and
    ``(start, end)`` char offsets per token).
    """
    sents: list[list[str]] = []
    offsets: list[list[tuple[int, int]]] = []
    cur_t: list[str] = []
    cur_o: list[tuple[int, int]] = []
    for tok, start, end in toks:
        cur_t.append(tok)
        cur_o.append((start, end))
        if tok in _SENT_END:
            sents.append(cur_t)
            offsets.append(cur_o)
            cur_t, cur_o = [], []
    if cur_t:
        sents.append(cur_t)
        offsets.append(cur_o)
    return sents, offsets
