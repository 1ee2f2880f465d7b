"""Optional torch backend for the neural tagger's forward pass.

Mirrors ``functions/recurrent.py`` (the numpy reference kernels —
reference architecture at
/root/reference/saber/models/multi_task_lstm_crf.py:62-145) operation
for operation: same Keras gate layout (i, f, g, o), same
``mask_zero=True`` carry semantics, same reversed-within-valid-length
backward direction. float64 on CPU so the parity test against numpy is
tight (~1e-12); float32 on CUDA (the GPU-throughput configuration).

torch is OPTIONAL — this sandbox does not ship it. Import is gated:
``torch_available()`` reports the gate, and ``NeuralTagger`` falls back
to the numpy path when torch is absent. No module in the default import
path imports torch at module load.
"""

from __future__ import annotations

import numpy as np


def torch_available() -> bool:
    try:
        import torch  # noqa: F401

        return True
    except ImportError:
        return False


def _lstm_forward_t(x, lengths, W, U, b):
    """Masked unidirectional LSTM on torch tensors: x [n, S, D] ->
    hidden states [n, S, u]. Same carry/mask semantics as the numpy
    ``lstm_forward``."""
    import torch

    n, S, _ = x.shape
    units = U.shape[0]
    h = torch.zeros((n, units), dtype=x.dtype, device=x.device)
    c = torch.zeros((n, units), dtype=x.dtype, device=x.device)
    hs = torch.zeros((n, S, units), dtype=x.dtype, device=x.device)
    pre = x @ W + b  # [n, S, 4u]
    max_len = int(lengths.max().item()) if len(lengths) else 0
    for t in range(max_len):
        z = pre[:, t] + h @ U
        i = torch.sigmoid(z[:, :units])
        f = torch.sigmoid(z[:, units:2 * units])
        g = torch.tanh(z[:, 2 * units:3 * units])
        o = torch.sigmoid(z[:, 3 * units:])
        c_new = f * c + i * g
        h_new = o * torch.tanh(c_new)
        live = (lengths > t).unsqueeze(1)
        c = torch.where(live, c_new, c)
        h = torch.where(live, h_new, h)
        hs[:, t] = torch.where(live, h_new, torch.zeros_like(h_new))
    return hs


def _reverse_valid_t(x, lengths):
    import torch

    out = x.clone()
    for i in range(x.shape[0]):
        ln = int(lengths[i].item())
        if ln > 1:
            out[i, :ln] = torch.flip(x[i, :ln], dims=(0,))
    return out


def _bilstm_sequences_t(x, lengths, p, prefix):
    import torch

    fwd = _lstm_forward_t(x, lengths, p[f"{prefix}_fwd_W"],
                          p[f"{prefix}_fwd_U"], p[f"{prefix}_fwd_b"])
    rev_in = _reverse_valid_t(x, lengths)
    bwd = _lstm_forward_t(rev_in, lengths, p[f"{prefix}_bwd_W"],
                          p[f"{prefix}_bwd_U"], p[f"{prefix}_bwd_b"])
    bwd = _reverse_valid_t(bwd, lengths)
    return torch.cat([fwd, bwd], dim=-1)


def _bilstm_final_t(x, lengths, p, prefix):
    import torch

    n = x.shape[0]
    fwd = _lstm_forward_t(x, lengths, p[f"{prefix}_fwd_W"],
                          p[f"{prefix}_fwd_U"], p[f"{prefix}_fwd_b"])
    rev_in = _reverse_valid_t(x, lengths)
    bwd = _lstm_forward_t(rev_in, lengths, p[f"{prefix}_bwd_W"],
                          p[f"{prefix}_bwd_U"], p[f"{prefix}_bwd_b"])
    idx = torch.clamp(lengths.to(torch.int64) - 1, min=0)
    rows = torch.arange(n, device=x.device)
    out = torch.cat([fwd[rows, idx], bwd[rows, idx]], dim=-1)
    empty = (lengths == 0).unsqueeze(1)
    return torch.where(empty, torch.zeros_like(out), out)


def to_torch_weights(weights: dict, device: str = "cpu") -> dict:
    """Convert a bundle's numpy weight dict to torch tensors ONCE (per
    actor, in ``NeuralTagger.__init__``) — float64 on CPU for numpy
    parity, float32 on CUDA for throughput."""
    import torch

    dtype = torch.float64 if device == "cpu" else torch.float32
    return {
        k: torch.as_tensor(np.asarray(v), dtype=dtype, device=device)
        for k, v in weights.items()
        if isinstance(v, np.ndarray) and v.dtype != np.int64
    }


def bilstm_crf_emissions_torch(
    word_ids: np.ndarray,      # [n, S]
    char_ids: np.ndarray,      # [n, S, C]
    tweights: dict,            # torch tensors from ``to_torch_weights``
    device: str = "cpu",
) -> np.ndarray:
    """Full-architecture forward on torch; returns numpy emissions
    [n, S, T] so the (numpy) Viterbi/argmax decode is backend-agnostic."""
    import torch

    with torch.no_grad():
        n, S = word_ids.shape
        C = char_ids.shape[2]
        wid = torch.as_tensor(word_ids.astype(np.int64), device=device)
        cid = torch.as_tensor(char_ids.astype(np.int64), device=device)
        word_lengths = (wid != 0).sum(dim=1)

        flat_chars = cid.reshape(n * S, C)
        char_lengths = (flat_chars != 0).sum(dim=1)
        char_emb = tweights["char_embeddings"][flat_chars]
        char_feat = _bilstm_final_t(char_emb, char_lengths, tweights, "char")
        char_feat = char_feat.reshape(n, S, -1)

        word_emb = tweights["embeddings"][wid]
        x = torch.cat([word_emb, char_feat], dim=-1)

        h1 = _bilstm_sequences_t(x, word_lengths, tweights, "w1")
        h2 = _bilstm_sequences_t(h1, word_lengths, tweights, "w2")
        out = h2 @ tweights["dense_W"] + tweights["dense_b"]
        return out.cpu().numpy().astype(np.float64)
