"""Numpy backpropagation through the recurrent tagger stack.

Training-side counterpart of ``functions/recurrent.py``: the same
masked char-BiLSTM → word-embedding ⊕ char-feature → 2× word-BiLSTM →
dense forward (reference architecture,
/root/reference/saber/models/multi_task_lstm_crf.py:56-150), plus
analytic gradients for every stage and a linear-chain CRF
negative-log-likelihood loss (forward-backward marginals — the
reference's ``CRF`` layer trains by the same likelihood). Everything is
pure numpy so gradient steps run INSIDE Ray map_groups tasks (the
distributed perceptron loop in ``pipelines/train.py`` reuses this for
its parameter-mixing epochs).

Masking matches inference (``mask_zero=True`` carry semantics): at a
padded timestep the hidden/cell state carries, the emitted output is
zero, and gradients flow through the carry untouched — verified against
numerical differentiation in tests/test_recurrent_grad.py.
"""

from __future__ import annotations

import numpy as np

from .recurrent import _reverse_valid, sigmoid

# ------------------------------------------------------------ LSTM ------


def lstm_forward_cache(x, lengths, W, U, b):
    """Masked unidirectional LSTM with a backprop cache.

    Returns (hs [n,S,u], cache). Forward math identical to
    ``recurrent.lstm_forward`` (one fused input matmul, per-step
    recurrent matmul, carry at dead steps).
    """
    n, S, _ = x.shape
    units = U.shape[0]
    h = np.zeros((n, units))
    c = np.zeros((n, units))
    hs = np.zeros((n, S, units))
    pre = x @ W + b
    max_len = int(lengths.max()) if len(lengths) else 0
    gates = np.zeros((n, max_len, 4 * units))   # i f g o (post-activation)
    cs = np.zeros((n, max_len, units))          # c_t
    h_prevs = np.zeros((n, max_len, units))     # h_{t-1}
    c_prevs = np.zeros((n, max_len, units))     # c_{t-1}
    for t in range(max_len):
        z = pre[:, t] + h @ U
        i = sigmoid(z[:, :units])
        f = sigmoid(z[:, units:2 * units])
        g = np.tanh(z[:, 2 * units:3 * units])
        o = sigmoid(z[:, 3 * units:])
        c_new = f * c + i * g
        h_new = o * np.tanh(c_new)
        live = (lengths > t)[:, None]
        gates[:, t, :units] = i
        gates[:, t, units:2 * units] = f
        gates[:, t, 2 * units:3 * units] = g
        gates[:, t, 3 * units:] = o
        h_prevs[:, t] = h
        c_prevs[:, t] = c
        c = np.where(live, c_new, c)
        h = np.where(live, h_new, h)
        cs[:, t] = c
        hs[:, t] = np.where(live, h_new, 0.0)
    cache = (x, lengths, gates, cs, h_prevs, c_prevs, max_len)
    return hs, cache


def lstm_backward(dhs, dh_final, dc_final, cache, W, U):
    """BPTT through ``lstm_forward_cache``.

    ``dhs`` is the gradient w.r.t. the emitted sequence [n,S,u];
    ``dh_final``/``dc_final`` (or None) are gradients w.r.t. the final
    carried state (used by the char path, which reads the final state
    rather than the sequence). Returns (dx, dW, dU, db).
    """
    x, lengths, gates, cs, h_prevs, c_prevs, max_len = cache
    n, S, D = x.shape
    units = U.shape[0]
    dx = np.zeros_like(x)
    dW = np.zeros_like(W)
    dU = np.zeros_like(U)
    db = np.zeros(4 * units)
    dh = np.zeros((n, units)) if dh_final is None else dh_final.copy()
    dc = np.zeros((n, units)) if dc_final is None else dc_final.copy()
    for t in range(max_len - 1, -1, -1):
        live = (lengths > t)[:, None]
        dh_t = dh + np.where(live, dhs[:, t], 0.0)
        i = gates[:, t, :units]
        f = gates[:, t, units:2 * units]
        g = gates[:, t, 2 * units:3 * units]
        o = gates[:, t, 3 * units:]
        c_t = cs[:, t]
        tanh_c = np.tanh(c_t)
        do = dh_t * tanh_c
        dc_t = dc + dh_t * o * (1.0 - tanh_c ** 2)
        di = dc_t * g
        df = dc_t * c_prevs[:, t]
        dg = dc_t * i
        dz = np.concatenate(
            [di * i * (1 - i), df * f * (1 - f),
             dg * (1 - g ** 2), do * o * (1 - o)], axis=1)
        dz = np.where(live, dz, 0.0)
        dx[:, t] = dz @ W.T
        dW += x[:, t].T @ dz
        dU += h_prevs[:, t].T @ dz
        db += dz.sum(axis=0)
        # dead rows: state carried -> gradients carry through UNTOUCHED
        # (dh_t must not leak into dc via the tanh'(c) term: at a carried
        # step h_t = h_{t-1} and c_t = c_{t-1} are independent pass-
        # throughs, so dh carries as dh_t and dc carries as dc exactly)
        dh = np.where(live, dz @ U.T, dh_t)
        dc = np.where(live, dc_t * f, dc)
    return dx, dW, dU, db


def bilstm_seq_forward(x, lengths, p, prefix):
    """Sequence-returning BiLSTM forward with caches: [n,S,2u]."""
    fwd, cache_f = lstm_forward_cache(
        x, lengths, p[f"{prefix}_fwd_W"], p[f"{prefix}_fwd_U"],
        p[f"{prefix}_fwd_b"])
    rev_in = _reverse_valid(x, lengths)
    bwd_r, cache_b = lstm_forward_cache(
        rev_in, lengths, p[f"{prefix}_bwd_W"], p[f"{prefix}_bwd_U"],
        p[f"{prefix}_bwd_b"])
    bwd = _reverse_valid(bwd_r, lengths)
    return np.concatenate([fwd, bwd], axis=-1), (cache_f, cache_b, lengths)


def bilstm_seq_backward(dout, cache, p, prefix, grads):
    """Backward through ``bilstm_seq_forward`` → dx; accumulates the six
    weight gradients into ``grads`` under the forward's key names."""
    cache_f, cache_b, lengths = cache
    units = p[f"{prefix}_fwd_U"].shape[0]
    d_fwd = dout[:, :, :units]
    d_bwd = _reverse_valid(dout[:, :, units:], lengths)
    dx_f, dWf, dUf, dbf = lstm_backward(
        d_fwd, None, None, cache_f, p[f"{prefix}_fwd_W"], p[f"{prefix}_fwd_U"])
    dx_br, dWb, dUb, dbb = lstm_backward(
        d_bwd, None, None, cache_b, p[f"{prefix}_bwd_W"], p[f"{prefix}_bwd_U"])
    dx = dx_f + _reverse_valid(dx_br, lengths)
    grads[f"{prefix}_fwd_W"] += dWf
    grads[f"{prefix}_fwd_U"] += dUf
    grads[f"{prefix}_fwd_b"] += dbf
    grads[f"{prefix}_bwd_W"] += dWb
    grads[f"{prefix}_bwd_U"] += dUb
    grads[f"{prefix}_bwd_b"] += dbb
    return dx


def bilstm_final_forward(x, lengths, p, prefix):
    """Final-state BiLSTM forward with caches: [n,2u] (char feature)."""
    fwd, cache_f = lstm_forward_cache(
        x, lengths, p[f"{prefix}_fwd_W"], p[f"{prefix}_fwd_U"],
        p[f"{prefix}_fwd_b"])
    rev_in = _reverse_valid(x, lengths)
    bwd_r, cache_b = lstm_forward_cache(
        rev_in, lengths, p[f"{prefix}_bwd_W"], p[f"{prefix}_bwd_U"],
        p[f"{prefix}_bwd_b"])
    n = x.shape[0]
    idx = np.maximum(lengths.astype(np.int64) - 1, 0)
    rows = np.arange(n)
    out = np.concatenate([fwd[rows, idx], bwd_r[rows, idx]], axis=-1)
    empty = (lengths == 0)[:, None]
    out = np.where(empty, 0.0, out)
    return out, (cache_f, cache_b, lengths, idx)


def bilstm_final_backward(dout, cache, p, prefix, grads):
    """Backward through the final-state BiLSTM → dx.

    The final state is the last LIVE step's h; because dead steps carry
    h forward unchanged, injecting the gradient as ``dh_final`` into the
    top of BPTT routes it to the right timestep automatically.
    """
    cache_f, cache_b, lengths, idx = cache
    units = p[f"{prefix}_fwd_U"].shape[0]
    alive = (lengths > 0)[:, None]
    dh_f = np.where(alive, dout[:, :units], 0.0)
    dh_b = np.where(alive, dout[:, units:], 0.0)
    dx_f, dWf, dUf, dbf = lstm_backward(
        np.zeros(cache_f[0].shape[:2] + (units,)), dh_f, None,
        cache_f, p[f"{prefix}_fwd_W"], p[f"{prefix}_fwd_U"])
    dx_br, dWb, dUb, dbb = lstm_backward(
        np.zeros(cache_b[0].shape[:2] + (units,)), dh_b, None,
        cache_b, p[f"{prefix}_bwd_W"], p[f"{prefix}_bwd_U"])
    dx = dx_f + _reverse_valid(dx_br, lengths)
    grads[f"{prefix}_fwd_W"] += dWf
    grads[f"{prefix}_fwd_U"] += dUf
    grads[f"{prefix}_fwd_b"] += dbf
    grads[f"{prefix}_bwd_W"] += dWb
    grads[f"{prefix}_bwd_U"] += dUb
    grads[f"{prefix}_bwd_b"] += dbb
    return dx


# ------------------------------------------------------------- CRF ------


def _logsumexp(a, axis):
    # all--inf slices (dead timesteps of shorter rows) produce NaN here;
    # every consumer masks those rows out, so just silence the warning
    m = a.max(axis=axis, keepdims=True)
    with np.errstate(invalid="ignore"):
        return (m + np.log(np.exp(a - m).sum(axis=axis, keepdims=True))).squeeze(axis)


def crf_nll_and_grads(emissions, trans, gold, lengths):
    """Linear-chain CRF negative log-likelihood + analytic gradients.

    emissions [n,S,T], trans [T,T], gold [n,S] int64, lengths [n].
    Returns (mean_loss, d_emissions, d_trans) — gradients of the MEAN
    per-sentence NLL. d_emissions[t] = q_t - onehot(gold_t) (unary
    marginals from forward-backward); d_trans = Σ pairwise marginals −
    gold transition counts. Zero-length rows contribute nothing.
    """
    n, S, T = emissions.shape
    valid = lengths > 0
    n_eff = max(1, int(valid.sum()))
    max_len = int(lengths.max()) if len(lengths) else 0

    # ---- forward (log alpha) and gold score
    alpha = np.full((n, max_len, T), -np.inf)
    if max_len:
        alpha[:, 0] = emissions[:, 0]
    for t in range(1, max_len):
        prev = alpha[:, t - 1]
        a = _logsumexp(prev[:, :, None] + trans[None], axis=1) + emissions[:, t]
        live = (lengths > t)[:, None]
        alpha[:, t] = np.where(live, a, prev)  # carry keeps logZ readable at end
    last = np.maximum(lengths - 1, 0)
    rows = np.arange(n)
    logZ = _logsumexp(alpha[rows, last], axis=1)

    gold_score = np.zeros(n)
    for t in range(max_len):
        live = lengths > t
        gold_score[live] += emissions[rows[live], t, gold[live, t]]
        if t >= 1:  # the transition term shares the emission term's mask
            gold_score[live] += trans[gold[live, t - 1], gold[live, t]]
    loss = float(np.where(valid, logZ - gold_score, 0.0).sum() / n_eff)

    # ---- backward (log beta)
    beta = np.full((n, max_len, T), -np.inf)
    if max_len:
        beta[rows, last] = 0.0
    for t in range(max_len - 2, -1, -1):
        nxt = beta[:, t + 1] + emissions[:, t + 1]
        b = _logsumexp(trans[None] + nxt[:, None, :], axis=2)
        live = (lengths > t + 1)[:, None]   # a next step exists
        keep = (lengths - 1 == t)[:, None]  # this is the row's last step
        beta[:, t] = np.where(live, b, np.where(keep, beta[:, t], -np.inf))

    # ---- gradients
    d_em = np.zeros_like(emissions)
    d_trans = np.zeros_like(trans)
    for t in range(max_len):
        live = lengths > t
        if not live.any():
            break
        logq = alpha[:, t] + beta[:, t] - logZ[:, None]
        q = np.exp(np.clip(logq, -745.0, 50.0))
        q = np.where(live[:, None], q, 0.0)
        d_em[:, t] = q / n_eff
        idx_live = rows[live]
        d_em[idx_live, t, gold[live, t]] -= 1.0 / n_eff
        if t >= 1:
            # pairwise marginals p_t(y', y)
            lp = (alpha[:, t - 1][:, :, None] + trans[None]
                  + emissions[:, t][:, None, :] + beta[:, t][:, None, :]
                  - logZ[:, None, None])
            p = np.exp(np.clip(lp, -745.0, 50.0))
            p = np.where(live[:, None, None], p, 0.0)
            d_trans += p.sum(axis=0) / n_eff
            np.add.at(d_trans, (gold[live, t - 1], gold[live, t]), -1.0 / n_eff)
    return loss, d_em, d_trans


# ----------------------------------------------------------- model ------


def tagger_loss_and_grads(word_ids, char_ids, gold, params,
                          use_chars: bool = True):
    """Full-stack loss + gradients for one padded minibatch.

    Same forward as ``recurrent.bilstm_crf_emissions`` (char feature
    optional), CRF NLL loss, gradients for EVERY parameter including
    both embedding tables (pad row 0 stays frozen at zero, Keras
    ``mask_zero`` semantics). Returns (loss, grads dict).
    """
    n, S = word_ids.shape
    lengths = (word_ids != 0).sum(axis=1).astype(np.int64)
    grads = {k: np.zeros_like(v) for k, v in params.items()}

    word_emb = params["embeddings"][word_ids]
    if use_chars:
        C = char_ids.shape[2]
        flat_chars = char_ids.reshape(n * S, C)
        char_lengths = (flat_chars != 0).sum(axis=1).astype(np.int64)
        char_emb = params["char_embeddings"][flat_chars]
        char_feat_flat, char_cache = bilstm_final_forward(
            char_emb, char_lengths, params, "char")
        char_feat = char_feat_flat.reshape(n, S, -1)
        x = np.concatenate([word_emb, char_feat], axis=-1)
    else:
        x = word_emb

    h1, cache1 = bilstm_seq_forward(x, lengths, params, "w1")
    h2, cache2 = bilstm_seq_forward(h1, lengths, params, "w2")
    emissions = h2 @ params["dense_W"] + params["dense_b"]

    loss, d_em, d_trans = crf_nll_and_grads(
        emissions, params["transitions"], gold, lengths)
    grads["transitions"] += d_trans

    grads["dense_W"] += np.einsum("nst,nsk->tk", h2, d_em)
    grads["dense_b"] += d_em.sum(axis=(0, 1))
    dh2 = d_em @ params["dense_W"].T
    dh1 = bilstm_seq_backward(dh2, cache2, params, "w2", grads)
    dx = bilstm_seq_backward(dh1, cache1, params, "w1", grads)

    D = params["embeddings"].shape[1]
    d_word_emb = dx[:, :, :D]
    np.add.at(grads["embeddings"], word_ids, d_word_emb)
    grads["embeddings"][0] = 0.0  # pad row frozen

    if use_chars:
        d_char_feat = dx[:, :, D:].reshape(n * S, -1)
        d_char_emb = bilstm_final_backward(
            d_char_feat, char_cache, params, "char", grads)
        np.add.at(grads["char_embeddings"], flat_chars, d_char_emb)
        grads["char_embeddings"][0] = 0.0
    else:
        for k in params:
            if k.startswith("char"):
                grads.pop(k, None)
    return loss, grads


class AdamState:
    """Per-parameter Adam optimizer state (Kingma & Ba 2015)."""

    def __init__(self, params, lr=0.01, beta1=0.9, beta2=0.999, eps=1e-8):
        self.lr, self.b1, self.b2, self.eps = lr, beta1, beta2, eps
        self.m = {k: np.zeros_like(v) for k, v in params.items()}
        self.v = {k: np.zeros_like(v) for k, v in params.items()}
        self.t = 0

    def step(self, params, grads):
        self.t += 1
        for k, g in grads.items():
            self.m[k] = self.b1 * self.m[k] + (1 - self.b1) * g
            self.v[k] = self.b2 * self.v[k] + (1 - self.b2) * g * g
            mhat = self.m[k] / (1 - self.b1 ** self.t)
            vhat = self.v[k] / (1 - self.b2 ** self.t)
            params[k] = params[k] - self.lr * mhat / (np.sqrt(vhat) + self.eps)
        # pad rows stay zero whatever the optimizer did
        for name in ("embeddings", "char_embeddings"):
            if name in params:
                params[name][0] = 0.0
        return params
