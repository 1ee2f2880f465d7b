"""Weights-backed sequence-tagger stage: the reference's predict path
(encode → forward → decode → chunk → spans) on numpy, as an actor pool.

This is the same stage interface as ``DictionaryTagger`` but driven by a
model bundle loaded once per actor, reproducing the reference's tensor
contract exactly:

* M5 integerization: token→id with <UNK> fallback, char→id; right
  pad/truncate sentences to MAX_SENT_LEN=100 and words to
  MAX_CHAR_LEN=25 with pad id 0 (saber/preprocessor.py:139-193,
  saber/constants.py:62-64);
* J2/J3 lookups: embedding row per word id, vocab dict lookups;
* forward pass: ``logits = embeddings[ids] @ W + b`` — a linear
  stand-in for the BiLSTM-CRF (no Keras in this environment); the
  bundle format would carry real recurrent weights identically;
* M9 decode: ``argmax(-1)`` over logits, idx→tag, strip predictions at
  <PAD> positions (saber/saber.py:99-101);
* M7/M8: BIO chunking over the flattened per-document tag sequence and
  projection onto char offsets, slicing mention text from the ORIGINAL
  span text (saber/saber.py:100-112 flattens sentences before chunking —
  preserved, including the possibility of chunks crossing sentence
  boundaries).

Prediction batch size mirrors the reference's PRED_BATCH_SIZE=256
sentences (saber/constants.py:59-60) via the stage's ``batch_size``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..constants import MAX_CHAR_LEN, MAX_SENT_LEN, PAD_VALUE, UNK_VALUE
from ..functions.chunking import chunk_entities
from ..functions.hashing import span_sequence_hash
from ..functions.text import split_sentences, tokenize_with_offsets
from ..state.bundle import load_bundle
from .tagger import _ENT_TYPE


def encode_sentences(
    sents: list[list[str]],
    word2idx: dict[str, int],
    char2idx: dict[str, int],
    max_sent_len: int = MAX_SENT_LEN,
    max_char_len: int = MAX_CHAR_LEN,
    lower: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """M5: sentences → (word_ids [n, S], char_ids [n, S, C]) int32."""
    n = len(sents)
    word_ids = np.full((n, max_sent_len), PAD_VALUE, dtype=np.int32)
    char_ids = np.full((n, max_sent_len, max_char_len), PAD_VALUE, dtype=np.int32)
    for i, sent in enumerate(sents):
        for j, tok in enumerate(sent[:max_sent_len]):
            key = tok.lower() if lower else tok
            word_ids[i, j] = word2idx.get(key, UNK_VALUE)
            for k, ch in enumerate(key[:max_char_len]):
                char_ids[i, j, k] = char2idx.get(ch, UNK_VALUE)
    return word_ids, char_ids


class NeuralTagger:
    """Actor-pool stage: model-bundle-backed mention tagger.

    ``__init__`` loads weights + vocab once per actor (the reference
    loads models once per process, saber/saber.py:75-81); ``__call__``
    annotates one Arrow batch of interleaved documents.
    """

    def __init__(self, bundle_path: str):
        weights, vocab, config = load_bundle(bundle_path)
        self._emb = weights["embeddings"]
        self._w = weights["W"]
        self._b = weights["b"]
        # optional CRF head: a [T, T] transition score matrix turns the
        # per-token argmax into Viterbi decoding (the reference's CRF
        # layer, saber/models/multi_task_lstm_crf.py:96-103); absent →
        # independent argmax, exactly the CRF-less decode
        self._transitions = weights.get("transitions")
        self._word2idx = vocab["word2idx"]
        self._char2idx = vocab["char2idx"]
        self._idx2tag = vocab["idx2tag"]
        self._pad_tag = "<PAD>"

    def _viterbi(self, logits: np.ndarray, length: int) -> np.ndarray:
        """Max-score tag path for one sentence: [S, T] emissions + the
        bundle's transition matrix (first-order linear-chain CRF)."""
        trans = self._transitions
        score = logits[0].copy()                     # [T]
        back = np.zeros((length, len(score)), dtype=np.int64)
        for t in range(1, length):
            cand = score[:, None] + trans            # [T_prev, T_next]
            back[t] = cand.argmax(axis=0)
            score = cand.max(axis=0) + logits[t]
        path = np.zeros(length, dtype=np.int64)
        path[-1] = int(score.argmax())
        for t in range(length - 1, 0, -1):
            path[t - 1] = back[t, path[t]]
        return path

    def _predict_tags(self, sents: list[list[str]]) -> list[list[str]]:
        """Forward + M9 decode: per-sentence tag strings, pads stripped."""
        if not sents:
            return []
        word_ids, _ = encode_sentences(sents, self._word2idx, self._char2idx)
        logits = self._emb[word_ids] @ self._w + self._b       # [n, S, T]
        out = []
        for i, sent in enumerate(sents):
            length = min(len(sent), logits.shape[1])
            if self._transitions is not None and length:
                pred = self._viterbi(logits[i, :length], length)
            else:
                pred = logits[i, :length].argmax(-1)
            tags = [self._idx2tag[t] for t in pred]
            out.append([t if t != self._pad_tag else "O" for t in tags])
        return out

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
                toks = tokenize_with_offsets(text)
                sents, offsets = split_sentences(toks)
                tag_seqs = self._predict_tags(sents)
                # reference flattens sentences before chunking
                flat_tags = [t for seq in tag_seqs for t in seq]
                # sentences beyond MAX_SENT_LEN are truncated by the model;
                # keep offsets aligned with the predicted tags
                flat_offsets = [
                    o
                    for seq, sent_off in zip(tag_seqs, offsets)
                    for o in sent_off[: len(seq)]
                ]
                sent_of_token = [
                    si for si, seq in enumerate(tag_seqs) for _ in seq
                ]
                for label, tok_start, tok_end in chunk_entities(flat_tags):
                    start = flat_offsets[tok_start][0]
                    end = flat_offsets[tok_end - 1][1]
                    ents.append(
                        {
                            "start": start,
                            "end": end,
                            "text": text[start:end],
                            "label": label,
                            "span_idx": span_idx,
                            "sent_idx": sent_of_token[tok_start],
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
            prior = batch["span_hash"].to_pylist()
            if prior != hashes:
                raise AssertionError("span-sequence invariant violated in tagger input")
            return out
        return out.append_column("span_hash", pa.array(hashes, type=pa.string()))
