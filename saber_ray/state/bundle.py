"""Model bundle save/load (S5) and word2vec embedding loading (S4).

Mirrors the reference's model-artifact contract — architecture/params +
weights + pickled ``type_to_idx``/``idx_to_tag`` maps + config, optional
tar.bz2 packaging (saber/saber.py:130-218, saber/models/base_model.py:23-52,
saber/utils/generic_utils.py:38-71) — re-expressed as a directory of
portable files an actor pool loads once per worker in ``__init__``:

    bundle/
      weights.npz     # numpy arrays: embeddings [V, D], W [D, T], b [T]
      vocab.json      # word2idx, char2idx, idx2tag
      config.json     # model metadata (max lens, tag scheme)

``load_word2vec_text`` reproduces the reference's embedding-matrix
construction (saber/embeddings.py:54-106): row i = vector of word with
id i; rows for <PAD>/<UNK>/OOV stay zero.
"""

from __future__ import annotations

import json
import os
import tarfile

import numpy as np

from ..constants import MAX_CHAR_LEN, MAX_SENT_LEN, PAD, UNK


def save_bundle(path: str, weights: dict[str, np.ndarray], vocab: dict, config: dict | None = None) -> None:
    os.makedirs(path, exist_ok=True)
    np.savez(os.path.join(path, "weights.npz"), **weights)
    with open(os.path.join(path, "vocab.json"), "w") as f:
        json.dump(vocab, f, sort_keys=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(
            {"max_sent_len": MAX_SENT_LEN, "max_char_len": MAX_CHAR_LEN, **(config or {})},
            f, sort_keys=True,
        )


def load_bundle(path: str) -> tuple[dict[str, np.ndarray], dict, dict]:
    if path.endswith(".tar.bz2"):
        path = extract_bundle(path)
    with np.load(os.path.join(path, "weights.npz")) as npz:
        weights = {k: npz[k] for k in npz.files}
    with open(os.path.join(path, "vocab.json")) as f:
        vocab = json.load(f)
    with open(os.path.join(path, "config.json")) as f:
        config = json.load(f)
    return weights, vocab, config


def compress_bundle(path: str, out: str | None = None) -> str:
    """Directory → .tar.bz2 (reference: generic_utils.compress_model)."""
    out = out or path.rstrip("/") + ".tar.bz2"
    with tarfile.open(out, "w:bz2") as tar:
        tar.add(path, arcname=os.path.basename(path.rstrip("/")))
    return out


def extract_bundle(archive: str, dest: str | None = None) -> str:
    dest = dest or os.path.dirname(os.path.abspath(archive))
    with tarfile.open(archive, "r:bz2") as tar:
        names = tar.getnames()
        tar.extractall(dest, filter="data")
    root = min(n.split("/")[0] for n in names)
    return os.path.join(dest, root)


def load_word2vec_text(path: str, word2idx: dict[str, int]) -> np.ndarray:
    """word2vec text format → [vocab, dim] float32 matrix.

    Header line ``<count> <dim>``; each following line ``word v1 .. vd``.
    Row ``word2idx[word]`` gets the vector; <PAD>/<UNK>/OOV rows stay 0
    (reference: saber/embeddings.py:74-106).
    """
    with open(path) as f:
        header = f.readline().split()
        dim = int(header[1])
        matrix = np.zeros((len(word2idx), dim), dtype=np.float32)
        for line in f:
            parts = line.rstrip("\n").split(" ")
            if len(parts) < dim + 1:  # blank/short line (trailing newline)
                continue
            word = parts[0]
            if word in word2idx:
                matrix[word2idx[word]] = np.asarray(parts[1 : dim + 1], dtype=np.float32)
    return matrix


def load_word2vec_all(
    path: str, limit: int | None = None
) -> tuple["np.ndarray", dict, dict]:
    """word2vec text → (matrix, word2idx, char2idx) with the vocab
    generated FROM THE EMBEDDING FILE — the reference's ``load_all``
    mode (saber/embeddings.py:74-106 + ``_generate_type_to_idx``),
    used at predict time so a word unseen in training but present in
    the pre-trained embeddings still resolves instead of becoming
    <UNK>. <PAD>=0 and <UNK>=1 rows are zero; word ids follow FILE
    order (the reference's insertion order); char ids are sorted (the
    reference iterates a Python set there, which is run-dependent — we
    pin a deterministic order). ``limit`` mirrors the reference's
    ``debug`` 10k-vector cap.
    """
    from ..constants import PAD, UNK

    words: list[str] = []
    vecs: list[np.ndarray] = []
    with open(path) as f:
        header = f.readline().split()
        dim = int(header[1])
        for line in f:
            parts = line.rstrip("\n").split(" ")
            if len(parts) < dim + 1:  # blank/short line (trailing newline)
                continue
            words.append(parts[0])
            vecs.append(np.asarray(parts[1 : dim + 1], dtype=np.float32))
            if limit is not None and len(words) >= limit:
                break
    word2idx = {PAD: 0, UNK: 1}
    matrix = np.zeros((2 + len(words), dim), dtype=np.float32)
    for w, v in zip(words, vecs):
        if w in word2idx:
            continue
        word2idx[w] = len(word2idx)
        matrix[word2idx[w]] = v
    matrix = matrix[: len(word2idx)]
    chars = sorted({c for w in words for c in w})
    char2idx = {PAD: 0, UNK: 1}
    for c in chars:
        char2idx[c] = len(char2idx)
    return matrix, word2idx, char2idx


def build_bilstm_bundle(
    path: str,
    word2idx: dict[str, int],
    char2idx: dict[str, int],
    tags: list[str],
    seed: int = 42,
    with_crf: bool = True,
    **dims,
) -> str:
    """Bundle with FULL recurrent weights (char BiLSTM + word BiLSTM ×2 +
    dense + optional CRF transitions) in the reference's architecture
    (saber/models/multi_task_lstm_crf.py:62-145), deterministically
    initialized from ``seed`` — the NeuralTagger selects the recurrent
    forward when these keys are present. Trained Keras exports use the
    same key layout (functions/recurrent.py)."""
    from ..functions.recurrent import init_bilstm_weights

    weights = init_bilstm_weights(
        len(word2idx), len(char2idx), len(tags), seed=seed,
        with_crf=with_crf, **dims,
    )
    vocab = {"word2idx": word2idx, "char2idx": char2idx, "idx2tag": tags}
    save_bundle(path, weights, vocab, {"kind": "bilstm-crf", "seed": seed})
    return path


def build_gazetteer_bundle(path: str, surfaces: dict[str, str], labels=None) -> str:
    """Distill a gazetteer into a tiny linear tagger bundle.

    Produces weights that make the neural forward pass (embedding lookup →
    linear → argmax) emit ``B-X``/``I-X`` for gazetteer surface tokens and
    ``O`` elsewhere — a deterministic, training-free stand-in for the
    reference's BiLSTM-CRF weights that exercises the identical
    encode/predict/decode path.
    """
    from ..functions.text import tokenize

    if labels is None:
        labels = sorted({v for v in surfaces.values()})
    tags = ["<PAD>", "O"]
    for lab in labels:
        tags.extend([f"B-{lab}", f"I-{lab}"])
    tag2idx = {t: i for i, t in enumerate(tags)}

    word_tag: dict[str, int] = {}
    for surface, label in sorted(surfaces.items()):
        toks = tokenize(surface.lower())
        for k, tok in enumerate(toks):
            word_tag[tok] = tag2idx[("B-" if k == 0 else "I-") + label]

    word2idx = {PAD: 0, UNK: 1}
    for tok in sorted(word_tag):
        word2idx[tok] = len(word2idx)
    char2idx = {PAD: 0, UNK: 1}
    for ch in sorted({c for w in word_tag for c in w}):
        char2idx[ch] = len(char2idx)

    n_tags = len(tags)
    emb = np.zeros((len(word2idx), n_tags), dtype=np.float32)
    emb[0, tag2idx["<PAD>"]] = 1.0
    emb[1, tag2idx["O"]] = 1.0
    for tok, t in word_tag.items():
        emb[word2idx[tok], t] = 1.0
    # identity "dense layer": logits = emb[ids] @ W + b
    weights = {
        "embeddings": emb,
        "W": np.eye(n_tags, dtype=np.float32),
        "b": np.zeros(n_tags, dtype=np.float32),
    }
    # unseen words (id UNK) score O; <PAD> positions decode to <PAD>
    vocab = {"word2idx": word2idx, "char2idx": char2idx, "idx2tag": tags}
    save_bundle(path, weights, vocab, {"kind": "gazetteer-linear"})
    return path
