"""Numpy recurrent kernels for the neural tagger's forward pass.

Reimplements (inference-only, batched, masked) the reference model's
recurrent stack — char BiLSTM over each word's characters, two
sequence-returning word BiLSTMs, a time-distributed dense layer
(/root/reference/saber/models/multi_task_lstm_crf.py:62-145) — as pure
numpy so actor pools can run real recurrent weights in this
environment (no Keras/TF). Gate layout follows the Keras convention
(i, f, g, o concatenated on the last axis) so exported Keras weights
drop in unchanged.

Masking matches Keras ``mask_zero=True``: at padded timesteps the
hidden/cell states CARRY (the step is skipped), and the backward
direction processes the sequence reversed within its valid length.
"""

from __future__ import annotations

import numpy as np


def sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def _reverse_valid(x: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Reverse each row's first ``lengths[i]`` timesteps in place of a
    full flip (Keras `go_backwards` + masking semantics: pads stay at
    the tail)."""
    out = x.copy()
    for i, ln in enumerate(lengths):
        if ln > 1:
            out[i, :ln] = x[i, ln - 1::-1]
    return out


def lstm_forward(
    x: np.ndarray, lengths: np.ndarray,
    W: np.ndarray, U: np.ndarray, b: np.ndarray,
) -> np.ndarray:
    """Masked unidirectional LSTM: x [n, S, D] → hidden states [n, S, u].

    At t >= lengths[i] the state carries and the output stays 0 (the
    masked-step output of a zero-initialized carry is never read by the
    decode, which strips pad positions)."""
    n, S, _ = x.shape
    units = U.shape[0]
    h = np.zeros((n, units), dtype=np.float64)
    c = np.zeros((n, units), dtype=np.float64)
    hs = np.zeros((n, S, units), dtype=np.float64)
    pre = x @ W + b  # [n, S, 4u] — the only big matmul, done once
    max_len = int(lengths.max()) if len(lengths) else 0
    for t in range(max_len):
        z = pre[:, t] + h @ U
        i = sigmoid(z[:, :units])
        f = sigmoid(z[:, units:2 * units])
        g = np.tanh(z[:, 2 * units:3 * units])
        o = sigmoid(z[:, 3 * units:])
        c_new = f * c + i * g
        h_new = o * np.tanh(c_new)
        live = (lengths > t)[:, None]
        c = np.where(live, c_new, c)
        h = np.where(live, h_new, h)
        hs[:, t] = np.where(live, h_new, 0.0)
    return hs


def bilstm_sequences(x: np.ndarray, lengths: np.ndarray, p: dict, prefix: str) -> np.ndarray:
    """Bidirectional LSTM returning per-timestep states [n, S, 2u].

    ``p`` holds ``{prefix}_fwd_W/U/b`` and ``{prefix}_bwd_W/U/b``."""
    fwd = lstm_forward(x, lengths, p[f"{prefix}_fwd_W"], p[f"{prefix}_fwd_U"],
                       p[f"{prefix}_fwd_b"])
    rev_in = _reverse_valid(x, lengths)
    bwd = lstm_forward(rev_in, lengths, p[f"{prefix}_bwd_W"], p[f"{prefix}_bwd_U"],
                       p[f"{prefix}_bwd_b"])
    bwd = _reverse_valid(bwd, lengths)
    return np.concatenate([fwd, bwd], axis=-1)


def bilstm_final(x: np.ndarray, lengths: np.ndarray, p: dict, prefix: str) -> np.ndarray:
    """Bidirectional LSTM returning the final state per sequence
    [n, 2u] — the char-BiLSTM word feature (Keras
    ``Bidirectional(LSTM(...))`` without return_sequences: forward final
    state ++ backward final state)."""
    n = x.shape[0]
    fwd = lstm_forward(x, lengths, p[f"{prefix}_fwd_W"], p[f"{prefix}_fwd_U"],
                       p[f"{prefix}_fwd_b"])
    rev_in = _reverse_valid(x, lengths)
    bwd = lstm_forward(rev_in, lengths, p[f"{prefix}_bwd_W"], p[f"{prefix}_bwd_U"],
                       p[f"{prefix}_bwd_b"])
    idx = np.maximum(lengths.astype(np.int64) - 1, 0)
    rows = np.arange(n)
    fwd_final = fwd[rows, idx]
    bwd_final = bwd[rows, idx]
    empty = (lengths == 0)[:, None]
    out = np.concatenate([fwd_final, bwd_final], axis=-1)
    return np.where(empty, 0.0, out)


def bilstm_crf_emissions(
    word_ids: np.ndarray,      # [n, S]
    char_ids: np.ndarray,      # [n, S, C]
    weights: dict,
) -> np.ndarray:
    """Full reference-architecture forward: emissions [n, S, T].

    char embedding → char BiLSTM final states (per word) → concat with
    word embedding → word BiLSTM 1 → word BiLSTM 2 → time-distributed
    dense. Pad id 0 everywhere (mask_zero semantics).
    """
    n, S = word_ids.shape
    C = char_ids.shape[2]
    word_lengths = (word_ids != 0).sum(axis=1).astype(np.int64)

    # --- char path: one flat [n*S, C] pass over all words of the batch
    flat_chars = char_ids.reshape(n * S, C)
    char_lengths = (flat_chars != 0).sum(axis=1).astype(np.int64)
    char_emb = weights["char_embeddings"][flat_chars]          # [n*S, C, Dc]
    char_feat = bilstm_final(char_emb, char_lengths, weights, "char")
    char_feat = char_feat.reshape(n, S, -1)                    # [n, S, 2uc]

    word_emb = weights["embeddings"][word_ids]                 # [n, S, D]
    x = np.concatenate([word_emb, char_feat], axis=-1)

    h1 = bilstm_sequences(x, word_lengths, weights, "w1")
    h2 = bilstm_sequences(h1, word_lengths, weights, "w2")
    return h2 @ weights["dense_W"] + weights["dense_b"]        # [n, S, T]


def init_bilstm_weights(
    n_words: int, n_chars: int, n_tags: int,
    word_dim: int = 16, char_dim: int = 8,
    char_units: int = 8, word_units: int = 16,
    seed: int = 42, with_crf: bool = True,
) -> dict[str, np.ndarray]:
    """Deterministic (seeded) weight init with the reference's shapes —
    used for fixed-weight golden tests and training-free smoke bundles.
    Row 0 of both embedding tables is zero (pad)."""
    rng = np.random.RandomState(seed)

    def glorot(*shape):
        lim = np.sqrt(6.0 / sum(shape))
        return rng.uniform(-lim, lim, size=shape)

    w: dict[str, np.ndarray] = {
        "embeddings": glorot(n_words, word_dim),
        "char_embeddings": glorot(n_chars, char_dim),
    }
    w["embeddings"][0] = 0.0
    w["char_embeddings"][0] = 0.0
    for prefix, in_dim, units in (
        ("char", char_dim, char_units),
        ("w1", word_dim + 2 * char_units, word_units),
        ("w2", 2 * word_units, word_units),
    ):
        for d in ("fwd", "bwd"):
            w[f"{prefix}_{d}_W"] = glorot(in_dim, 4 * units)
            w[f"{prefix}_{d}_U"] = glorot(units, 4 * units)
            b = np.zeros(4 * units)
            b[units:2 * units] = 1.0  # forget-gate bias 1 (Keras unit_forget_bias)
            w[f"{prefix}_{d}_b"] = b
    w["dense_W"] = glorot(2 * word_units, n_tags)
    w["dense_b"] = np.zeros(n_tags)
    if with_crf:
        w["transitions"] = glorot(n_tags, n_tags)
    return w
