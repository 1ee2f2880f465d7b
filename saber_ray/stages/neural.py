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
* forward pass: when the bundle carries recurrent weights, the FULL
  reference architecture runs in numpy — char BiLSTM over each word's
  characters, word embedding ++ char feature, two sequence-returning
  word BiLSTMs, time-distributed dense
  (/root/reference/saber/models/multi_task_lstm_crf.py:62-145, via
  functions/recurrent.py); legacy bundles with only (embeddings, W, b)
  fall back to the linear emission ``emb[ids] @ W + b``;
* CRF decode: a [T, T] transition matrix in the bundle turns the
  per-token argmax into Viterbi decoding (the reference's CRF layer,
  saber/models/multi_task_lstm_crf.py:96-103); absent → independent
  argmax;
* M9 decode: best tag per position, idx→tag, strip predictions at
  <PAD> positions (saber/saber.py:99-101);
* M7/M8: BIO chunking over the flattened per-document tag sequence and
  projection onto char offsets, slicing mention text from the ORIGINAL
  span text (saber/saber.py:100-112 flattens sentences before chunking —
  preserved, including the possibility of chunks crossing sentence
  boundaries).

Batch shape: ALL sentences of the Arrow batch are encoded into one
tensor and run through the forward in PRED_BATCH_SIZE=256-sentence
slices (saber/constants.py:59-60) — one encode + a handful of matmuls
per batch, never a per-document model call. The ``spans`` column is
decoded via ListArray offsets + flattened struct fields (zero-copy
views) and mentions are rebuilt with the same flat-accumulator layout
as the fused ``Annotator`` (stages/annotate.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..constants import (
    MAX_CHAR_LEN,
    MAX_SENT_LEN,
    PAD_VALUE,
    PRED_BATCH_SIZE,
    UNK_VALUE,
)
from ..functions.chunking import chunk_entities
from ..functions.hashing import span_sequence_hash
from ..functions.text import split_sentences, tokenize_with_offsets
from ..state.bundle import load_bundle
from .tagger import _ENT_TYPE

#: weights.npz keys whose presence selects the recurrent forward
_RECURRENT_KEYS = ("char_embeddings", "char_fwd_W", "w1_fwd_W", "w2_fwd_W", "dense_W")


def encode_sentences(
    sents: list[list[str]],
    word2idx: dict[str, int],
    char2idx: dict[str, int],
    max_sent_len: int = MAX_SENT_LEN,
    max_char_len: int = MAX_CHAR_LEN,
    lower: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """M5: sentences → (word_ids [n, S], char_ids [n, S, C]) int32.

    Lookups are EXACT-case first with a lowercase fallback (when
    ``lower``): the reference's predict path never lowercases
    (reference saber/preprocessor.py:168-178 looks up original-case
    tokens/chars), so a case-preserving bundle must hit its real ids
    ('BRCA1' ≠ <UNK>) — while bundles whose vocab was built lowercased
    (this repo's Trainer) resolve identically to before via the
    fallback.
    """
    n = len(sents)
    word_ids = np.full((n, max_sent_len), PAD_VALUE, dtype=np.int32)
    char_ids = np.full((n, max_sent_len, max_char_len), PAD_VALUE, dtype=np.int32)
    for i, sent in enumerate(sents):
        for j, tok in enumerate(sent[:max_sent_len]):
            if tok in word2idx or not lower:
                key = tok
            else:
                key = tok.lower()
            word_ids[i, j] = word2idx.get(key, UNK_VALUE)
            for k, ch in enumerate(key[:max_char_len]):
                cid = char2idx.get(ch)
                if cid is None and lower:
                    cid = char2idx.get(ch.lower())
                char_ids[i, j, k] = cid if cid is not None else UNK_VALUE
    return word_ids, char_ids


class NeuralTagger:
    """Actor-pool stage: model-bundle-backed mention tagger.

    ``__init__`` loads weights + vocab once per actor (the reference
    loads models once per process, saber/saber.py:75-81); ``__call__``
    annotates one Arrow batch of interleaved documents.
    """

    def __init__(self, bundle_path: str, backend: str = "auto"):
        """``backend``: ``"numpy"`` (default/hermetic), ``"torch"``
        (optional — parity-tested against numpy on CPU; float32 on
        CUDA), or ``"auto"`` (torch iff torch AND a CUDA device are
        visible — i.e. when the registry schedules this stage with
        ``num_gpus > 0`` the actor lands on a GPU worker and picks the
        GPU forward; everywhere else the numpy path runs). Reference GPU
        path: saber/models/multi_task_lstm_crf.py:153-161 (device
        placement is Keras-implicit there; explicit here)."""
        if backend not in ("numpy", "torch", "auto"):
            raise ValueError(
                f"backend must be 'numpy', 'torch' or 'auto', got {backend!r}"
            )
        weights, vocab, config = load_bundle(bundle_path)
        self._weights = weights
        self._recurrent = all(k in weights for k in _RECURRENT_KEYS)
        self._backend, self._device = "numpy", "cpu"
        if self._recurrent and backend in ("torch", "auto"):
            from ..functions.recurrent_torch import torch_available

            if torch_available():
                import torch

                cuda = torch.cuda.is_available()
                if backend == "torch" or cuda:
                    self._backend = "torch"
                    self._device = "cuda" if cuda else "cpu"
            elif backend == "torch":
                raise ImportError(
                    "NeuralTagger(backend='torch') requires torch; "
                    "install it or use backend='numpy'/'auto'"
                )
        if self._backend == "torch":
            from ..functions.recurrent_torch import to_torch_weights

            # weights converted ONCE per actor, not per batch
            self._tweights = to_torch_weights(weights, self._device)
        if not self._recurrent:
            self._emb = weights["embeddings"]
            self._w = weights["W"]
            self._b = weights["b"]
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

    def _emissions(self, sents: list[list[str]]) -> np.ndarray:
        """Encode + forward for a slice of sentences → [n, S, T]."""
        word_ids, char_ids = encode_sentences(sents, self._word2idx, self._char2idx)
        if self._recurrent:
            # trim to the slice's real max sentence/word lengths: masking
            # makes the result identical, but the recurrent loops and the
            # char-path tensors shrink from the fixed (100, 25) pads to
            # the actual data (typically ~10x less work)
            s_max = max(1, int((word_ids != PAD_VALUE).sum(axis=1).max(initial=0)))
            word_ids = word_ids[:, :s_max]
            char_ids = char_ids[:, :s_max]
            c_max = max(1, int((char_ids != PAD_VALUE).sum(axis=2).max(initial=0)))
            char_ids = char_ids[:, :, :c_max]
            if self._backend == "torch":
                from ..functions.recurrent_torch import (
                    bilstm_crf_emissions_torch,
                )

                return bilstm_crf_emissions_torch(
                    word_ids, char_ids, self._tweights, self._device
                )
            from ..functions.recurrent import bilstm_crf_emissions

            return bilstm_crf_emissions(word_ids, char_ids, self._weights)
        return self._emb[word_ids] @ self._w + self._b

    def _predict_tags(self, sents: list[list[str]]) -> list[list[str]]:
        """Forward + M9 decode: per-sentence tag strings, pads stripped.

        Runs in PRED_BATCH_SIZE-sentence slices so one Arrow batch with
        many sentences never materializes an oversized tensor."""
        out: list[list[str]] = []
        for lo in range(0, len(sents), PRED_BATCH_SIZE):
            chunk = sents[lo:lo + PRED_BATCH_SIZE]
            logits = self._emissions(chunk)                    # [n, S, T]
            for i, sent in enumerate(chunk):
                length = min(len(sent), logits.shape[1])
                if self._transitions is not None and length:
                    pred = self._viterbi(logits[i, :length], length)
                else:
                    pred = logits[i, :length].argmax(-1)
                tags = [self._idx2tag[t] for t in pred]
                out.append([t if t != self._pad_tag else "O" for t in tags])
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        # columnar decode of the spans column — shared with the fused
        # Annotator (functions/span_decode.py)
        from ..functions.span_decode import decode_spans_column

        doc_offsets, kinds, texts, media = decode_spans_column(batch)
        n_docs = batch.num_rows

        # 1) gather EVERY sentence of the batch (with back-pointers)
        sel = [i for i in range(len(kinds)) if kinds[i] == "text" and texts[i]]
        all_sents: list[list[str]] = []
        per_span: list[tuple[int, int, int, list]] = []  # (flat idx, lo, hi, offsets)
        for i in sel:
            toks = tokenize_with_offsets(texts[i])
            sents, offsets = split_sentences(toks)
            per_span.append((i, len(all_sents), len(all_sents) + len(sents), offsets))
            all_sents.extend(sents)

        # 2) ONE encode+forward pass over the whole batch's sentences
        tag_seqs = self._predict_tags(all_sents)

        # 3) per-span chunking into flat mention accumulators
        m_start: list[int] = []
        m_end: list[int] = []
        m_text: list[str] = []
        m_label: list[str] = []
        m_sent_idx: list[int] = []
        mention_flat_idx: list[int] = []
        for i, s_lo, s_hi, offsets in per_span:
            seqs = tag_seqs[s_lo:s_hi]
            # reference flattens sentences before chunking; sentences
            # beyond MAX_SENT_LEN are truncated by the model — keep
            # offsets aligned with the predicted tags
            flat_tags = [t for seq in seqs for t in seq]
            flat_offsets = [
                o for seq, sent_off in zip(seqs, offsets)
                for o in sent_off[: len(seq)]
            ]
            sent_of_token = [si for si, seq in enumerate(seqs) for _ in seq]
            text = texts[i]
            for label, tok_start, tok_end in chunk_entities(flat_tags):
                start = flat_offsets[tok_start][0]
                end = flat_offsets[tok_end - 1][1]
                m_start.append(start)
                m_end.append(end)
                m_text.append(text[start:end])
                m_label.append(label)
                m_sent_idx.append(sent_of_token[tok_start])
                mention_flat_idx.append(i)

        # 4) flat span index → (doc, span_idx) + per-doc hashes (shared
        # helpers — same math as annotate.py by construction)
        from ..functions.span_decode import (
            doc_span_hashes,
            mention_list_offsets,
        )

        m_span_idx, ents_offsets = mention_list_offsets(
            mention_flat_idx, doc_offsets, n_docs)
        hashes = doc_span_hashes(doc_offsets, kinds, texts, media, n_docs)

        ent_struct = pa.StructArray.from_arrays(
            [
                pa.array(m_start, type=pa.int32()),
                pa.array(m_end, type=pa.int32()),
                pa.array(m_text, type=pa.string()),
                pa.array(m_label, type=pa.string()),
                pa.array(m_span_idx, type=pa.int32()),
                pa.array(m_sent_idx, type=pa.int32()),
            ],
            fields=list(_ENT_TYPE),
        )
        ents_arr = pa.ListArray.from_arrays(pa.array(ents_offsets), ent_struct)

        from ..functions.span_decode import attach_ents

        return attach_ents(batch, ents_arr, hashes, "tagger")
