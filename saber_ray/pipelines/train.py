"""Distributed sequence-tagger training — the reference ``Trainer``'s
coordination semantics (saber/trainer.py:19-132) on Ray Data.

The reference trains a Keras BiLSTM-CRF; this engine trains a
linear-chain CRF tagger by **structured perceptron with iterative
parameter mixing** (McDonald, Hall & Mann, NAACL 2010 — the standard
distributed perceptron: shard the corpus, run the online perceptron
independently per shard from the same broadcast weights, average the
shard-trained weights each epoch). Everything the reference's Trainer
coordinates has a counterpart:

* strategy selection (saber/trainer.py:40-45): a valid (or test)
  partition → train/valid strategy, carving 10% of train as valid when
  only test was given (data_utils.collect_valid_data); neither → k-fold
  cross-validation with a model reset per fold (trainer.py:87-131);
* per-epoch Metrics callback (saber/metrics.py): span-level P/R/F1 via
  the engine's ``evaluate_chunks`` over the valid partition, recorded
  into ``history``;
* best-epoch selection (A4, saber/metrics.py:266-273): weights of the
  best-F1 epoch are kept, not the last;
* model persistence: ``save()`` writes a NeuralTagger-compatible
  bundle — emissions as the ``embeddings`` [V, T] table with an
  identity dense layer and the learned CRF ``transitions`` — so a
  trained model serves through the SAME actor-pool tagger stage
  (stages/neural.py) as the reference's exported models.

Scale shape: one ``map_batches`` pass assigns deterministic shard keys;
per-epoch training is ``groupby(shard).map_groups`` (S shards, each an
independent online perceptron — S is a hyperparameter like batch size,
so results are REPRODUCIBLE on any cluster width); the driver only ever
holds the [V, T] + [T, T] weight matrices (vocab-sized, not
corpus-sized). Eval is an embarrassingly-parallel ``map_batches`` with
per-batch count partials summed by Ray.

The training corpus itself is the small labeled partition of the world
(CoNLL-style), NOT the 100 TB raw corpus — per-shard in-memory
sentence lists are the same assumption every mini-batch trainer makes.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..constants import PAD, UNK
from ..functions.chunking import chunk_entities
from ..functions.hashing import stable_u64
from ..functions.metrics import best_epoch


@dataclass
class TrainConfig:
    epochs: int = 5
    k_folds: int = 5               # CV strategy (no valid/test given)
    valid_fraction: float = 0.10   # carved from train when only test given
    shards: int = 8                # parameter-mixing width (reproducible)
    seed: int = 42
    criteria: str = "exact"        # span-match criteria for epoch metrics


def _build_tag_vocab(ds: rd.Dataset) -> list[str]:
    """Distinct tags, <PAD> first then sorted (bundle tag layout)."""
    flat = ds.map_batches(
        lambda b: pa.table({"tag": pa.compute.list_flatten(b["tags"])}),
        batch_format="pyarrow",
    )
    tags = sorted(t["tag"] for t in flat.groupby("tag").count().take_all())
    return ["<PAD>"] + [t for t in tags if t != "<PAD>"]


def _build_word_vocab(ds: rd.Dataset) -> dict[str, int]:
    """Distinct lowercased train tokens; <PAD>=0, <UNK>=1 (M11 layout)."""
    flat = ds.map_batches(
        lambda b: pa.table({
            "tok": pa.compute.utf8_lower(pa.compute.list_flatten(b["tokens"]))
        }),
        batch_format="pyarrow",
    )
    toks = sorted(t["tok"] for t in flat.groupby("tok").count().take_all())
    vocab = {PAD: 0, UNK: 1}
    for t in toks:
        vocab[t] = len(vocab)
    return vocab


def _with_shard(ds: rd.Dataset, shards: int) -> rd.Dataset:
    """Deterministic shard + within-shard order keys from sentence
    CONTENT — identical results whatever the block layout or cluster."""
    def assign(batch: pa.Table) -> pa.Table:
        keys, shard_ids = [], []
        for toks, tags in zip(batch["tokens"].to_pylist(), batch["tags"].to_pylist()):
            h = stable_u64("\x1f".join(toks) + "\x1e" + "\x1f".join(tags))
            keys.append(int(h & 0x7FFFFFFFFFFFFFFF))
            shard_ids.append(int(h % shards))
        return batch.append_column(
            "shard", pa.array(shard_ids, type=pa.int32())
        ).append_column("order_key", pa.array(keys, type=pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def _viterbi(emissions: np.ndarray, trans: np.ndarray) -> np.ndarray:
    """[n, T] emissions + [T, T] transitions → best tag path (int64)."""
    n, T = emissions.shape
    score = emissions[0].copy()
    back = np.zeros((n, T), dtype=np.int64)
    for t in range(1, n):
        cand = score[:, None] + trans
        back[t] = cand.argmax(axis=0)
        score = cand.max(axis=0) + emissions[t]
    path = np.zeros(n, dtype=np.int64)
    path[-1] = int(score.argmax())
    for t in range(n - 1, 0, -1):
        path[t - 1] = back[t, path[t]]
    return path


def _encode_ids(tokens: list[str], word2idx: dict[str, int]) -> np.ndarray:
    return np.array(
        [word2idx.get(t.lower(), 1) for t in tokens], dtype=np.int64
    )


def _train_shard_fn(weights_ref, word2idx, tag2idx):
    """Per-shard online structured perceptron (map_groups callable)."""
    def train_group(group: pa.Table) -> pa.Table:
        E0, T0 = ray.get(weights_ref)
        E = E0.copy()
        trans = T0.copy()
        # AVERAGED perceptron within the shard (Collins 2002): the shard
        # returns the running average over its pass, not the endpoint —
        # without it, uniform mixing of raw endpoints oscillates
        # (measured: plateaus at F1 0.93 where averaging reaches 1.0)
        E_sum = np.zeros_like(E)
        T_sum = np.zeros_like(trans)
        steps = 0
        # deterministic within-shard order: content hash, ties by tokens
        idx = sorted(
            range(group.num_rows),
            key=lambda i: (group["order_key"][i].as_py(),
                           group["tokens"][i].as_py()),
        )
        updates = 0
        for i in idx:
            tokens = group["tokens"][i].as_py()
            tags = group["tags"][i].as_py()
            if not tokens:
                continue
            ids = _encode_ids(tokens, word2idx)
            gold = np.array([tag2idx[t] for t in tags], dtype=np.int64)
            pred = _viterbi(E[ids], trans)
            if not np.array_equal(pred, gold):
                updates += 1
                for pos in range(len(ids)):
                    if pred[pos] != gold[pos]:
                        E[ids[pos], gold[pos]] += 1.0
                        E[ids[pos], pred[pos]] -= 1.0
                for pos in range(1, len(ids)):
                    if pred[pos - 1] != gold[pos - 1] or pred[pos] != gold[pos]:
                        trans[gold[pos - 1], gold[pos]] += 1.0
                        trans[pred[pos - 1], pred[pos]] -= 1.0
            E_sum += E
            T_sum += trans
            steps += 1
        if steps:
            E = E_sum / steps
            trans = T_sum / steps
        return pa.table({
            "shard": pa.array([int(group["shard"][0].as_py())], type=pa.int32()),
            "sentences": pa.array([group.num_rows], type=pa.int64()),
            "updates": pa.array([updates], type=pa.int64()),
            "emissions": pa.array([E.astype(np.float32).tobytes()], type=pa.binary()),
            "transitions": pa.array([trans.astype(np.float32).tobytes()], type=pa.binary()),
        })

    return train_group


def _eval_fn(weights_ref, word2idx, idx2tag, criteria):
    """Per-batch eval partials: tag hits + micro span TP/FP/FN counts
    (the per-label breakdown comes from ``evaluate_chunks`` at the end;
    the streaming pass only carries the summable counts)."""
    from ..functions.metrics import _project

    def eval_batch(batch: pa.Table) -> pa.Table:
        E, trans = ray.get(weights_ref)
        correct = total = tp = fp = fn = 0
        for tokens, tags in zip(batch["tokens"].to_pylist(), batch["tags"].to_pylist()):
            if not tokens:
                continue
            ids = _encode_ids(tokens, word2idx)
            pred = _viterbi(E[ids], trans)
            pred_tags = [idx2tag[p] for p in pred]
            correct += sum(1 for p, g in zip(pred_tags, tags) if p == g)
            total += len(tags)
            gold_set = [_project(c, criteria) for c in chunk_entities(tags)]
            pred_set = [_project(c, criteria) for c in chunk_entities(pred_tags)]
            tp += sum(1 for c in pred_set if c in gold_set)
            fp += sum(1 for c in pred_set if c not in gold_set)
            fn += sum(1 for c in gold_set if c not in pred_set)
        return pa.table({
            "correct": pa.array([correct], type=pa.int64()),
            "total": pa.array([total], type=pa.int64()),
            "tp": pa.array([tp], type=pa.int64()),
            "fp": pa.array([fp], type=pa.int64()),
            "fn": pa.array([fn], type=pa.int64()),
        })

    return eval_batch


class Trainer:
    """Coordinates distributed CRF-perceptron training over sentence
    Datasets with the reference's strategy selection, per-epoch metrics
    and best-epoch model keeping (saber/trainer.py).

    ``train``/``valid``/``test`` are Datasets with ``tokens`` and
    ``tags`` list<string> columns (the CoNLL reader's schema).
    """

    def __init__(self, train: rd.Dataset, valid: rd.Dataset | None = None,
                 test: rd.Dataset | None = None,
                 config: TrainConfig | None = None):
        self.config = config or TrainConfig()
        self._train = train
        self._valid = valid
        self._test = test
        self.word2idx = _build_word_vocab(train)
        self.idx2tag = _build_tag_vocab(train)
        self.tag2idx = {t: i for i, t in enumerate(self.idx2tag)}
        self.history: list[dict] = []
        self.fold_history: list[list[dict]] = []
        self.best: dict | None = None
        self._E = None
        self._trans = None

    # ---- public API (mirrors reference Trainer.train) ----

    def train(self) -> dict:
        """Strategy selection exactly as the reference (trainer.py:40-45):
        valid or test present → train/valid; else k-fold CV."""
        if self._valid is not None or self._test is not None:
            return self._train_valid_test()
        return self._cross_validation()

    def save(self, path: str) -> str:
        """Best-epoch weights → NeuralTagger-servable bundle."""
        from ..state.bundle import save_bundle

        if self._E is None:
            raise RuntimeError("train() must run before save()")
        _, T = self._E.shape
        char2idx = {PAD: 0, UNK: 1}
        save_bundle(
            path,
            {
                "embeddings": self._E.astype(np.float32),
                "W": np.eye(T, dtype=np.float32),
                "b": np.zeros(T, dtype=np.float32),
                "transitions": self._trans.astype(np.float32),
            },
            {"word2idx": self.word2idx, "char2idx": char2idx,
             "idx2tag": self.idx2tag},
            {"kind": "crf-perceptron", "epochs": self.config.epochs,
             "shards": self.config.shards},
        )
        return path

    # ---- internals ----

    def _zero_weights(self):
        V, T = len(self.word2idx), len(self.idx2tag)
        return np.zeros((V, T), dtype=np.float32), np.zeros((T, T), dtype=np.float32)

    def _run_epochs(self, train: rd.Dataset, valid: rd.Dataset,
                    history: list[dict]) -> tuple[np.ndarray, np.ndarray]:
        cfg = self.config
        sharded = _with_shard(train, cfg.shards).materialize()
        E, trans = self._zero_weights()
        per_epoch: list[tuple[np.ndarray, np.ndarray]] = []
        for epoch in range(cfg.epochs):
            ref = ray.put((E, trans))
            rows = sharded.groupby("shard").map_groups(
                _train_shard_fn(ref, self.word2idx, self.tag2idx),
                batch_format="pyarrow",
            ).take_all()
            # iterative parameter mixing: sentence-count-weighted average
            V, T = E.shape
            totE = np.zeros_like(E)
            totT = np.zeros_like(trans)
            n_sents = 0
            updates = 0
            for r in rows:
                w = int(r["sentences"])
                totE += np.frombuffer(r["emissions"], dtype=np.float32).reshape(V, T) * w
                totT += np.frombuffer(r["transitions"], dtype=np.float32).reshape(T, T) * w
                n_sents += w
                updates += int(r["updates"])
            E = totE / max(1, n_sents)
            trans = totT / max(1, n_sents)
            metrics = self._evaluate(valid, E, trans)
            metrics.update({"epoch": epoch, "updates": updates})
            history.append(metrics)
            per_epoch.append((E.copy(), trans.copy()))
        # A4: keep the best-F1 epoch's weights, not the last
        idx = best_epoch([
            (h["precision"], h["recall"], h["f1"]) for h in history[-cfg.epochs:]
        ])
        return per_epoch[idx]

    def _evaluate(self, ds: rd.Dataset, E, trans) -> dict:
        ref = ray.put((E, trans))
        parts = ds.map_batches(
            _eval_fn(ref, self.word2idx, self.idx2tag,
                     self.config.criteria),
            batch_format="pyarrow",
        )
        agg = parts.sum(["correct", "total", "tp", "fp", "fn"])
        if agg is None:  # empty eval partition
            agg = {f"sum({k})": 0 for k in ("correct", "total", "tp", "fp", "fn")}
        correct, total = agg["sum(correct)"], agg["sum(total)"]
        tp, fp, fn = agg["sum(tp)"], agg["sum(fp)"], agg["sum(fn)"]
        from ..functions.metrics import precision_recall_f1_support

        p, r, f1, support = precision_recall_f1_support(tp, fp, fn)
        return {
            "tag_accuracy": correct / total if total else 0.0,
            "precision": p, "recall": r, "f1": f1, "support": support,
        }

    def _train_valid_test(self) -> dict:
        from .splits import train_valid_split

        train, valid = self._train, self._valid
        if valid is None:
            # only test given: carve 10% of train as valid
            # (data_utils.collect_valid_data)
            train, valid = train_valid_split(train, self.config.valid_fraction)
        self._E, self._trans = self._run_epochs(train, valid, self.history)
        result = {
            "strategy": "train_valid_test",
            "history": self.history,
            "best_epoch": best_epoch(
                [(h["precision"], h["recall"], h["f1"]) for h in self.history]
            ),
        }
        if self._test is not None:
            result["test"] = self._evaluate(self._test, self._E, self._trans)
        return result

    def _cross_validation(self) -> dict:
        from .splits import k_fold_splits

        # ds.split(k) splits by BLOCK; a single-block corpus would give
        # k-1 empty folds — spread rows across >= k blocks first
        # (training itself is block-layout-independent: content-hash
        # sharding fixes each sentence's shard)
        k = self.config.k_folds
        folds = k_fold_splits(self._train.repartition(2 * k), k)
        fold_scores: list[dict] = []
        best_f1 = -1.0
        for fold, (train, valid) in enumerate(folds):
            # model reset per fold (trainer.py:133-139)
            hist: list[dict] = []
            E, trans = self._run_epochs(train, valid, hist)
            self.fold_history.append(hist)
            idx = best_epoch([(h["precision"], h["recall"], h["f1"]) for h in hist])
            fold_scores.append({**hist[idx], "fold": fold})
            if hist[idx]["f1"] > best_f1:
                best_f1 = hist[idx]["f1"]
                self._E, self._trans = E, trans
        mean_f1 = sum(s["f1"] for s in fold_scores) / len(fold_scores)
        return {
            "strategy": "cross_validation",
            "folds": fold_scores,
            "mean_f1": mean_f1,
        }


# ================================================================
# Gradient training of the recurrent emission stack
# ================================================================


@dataclass
class RecurrentTrainConfig:
    """Hyperparameters for gradient BiLSTM-CRF training (reference
    architecture sizes default much larger — saber/constants.py:65-68 —
    these defaults suit fixture-scale corpora and tests)."""
    epochs: int = 8
    shards: int = 4                # parameter-mixing width (reproducible)
    k_folds: int = 5               # CV strategy (no valid partition given)
    seed: int = 42
    lr: float = 0.03
    # pre-trained word2vec text file loaded into the embedding table
    # (reference saber.load_embeddings, saber/embeddings.py:54-106);
    # fine_tune mirrors config.ini `fine_tune_word_embeddings` — False
    # freezes the loaded vectors (their gradients are zeroed; OOV/<UNK>
    # rows still train)
    embeddings_path: str = ""
    fine_tune_word_embeddings: bool = True
    batch_size: int = 16
    word_dim: int = 12
    char_dim: int = 6
    char_units: int = 6
    word_units: int = 12
    criteria: str = "exact"
    valid_fraction: float = 0.10


def _build_char_vocab(ds: rd.Dataset) -> dict[str, int]:
    """Distinct characters of the lowercased train tokens;
    <PAD>=0, <UNK>=1 (reference char vocab, saber/dataset.py:96-111)."""
    flat = ds.map_batches(
        lambda b: pa.table({
            "tok": pa.compute.utf8_lower(pa.compute.list_flatten(b["tokens"]))
        }),
        batch_format="pyarrow",
    )
    chars: set[str] = set()
    for row in flat.groupby("tok").count().take_all():
        chars.update(row["tok"])
    vocab = {PAD: 0, UNK: 1}
    for c in sorted(chars):
        vocab[c] = len(vocab)
    return vocab


def _encode_train_batch(sents, tags_list, word2idx, char2idx, tag2idx,
                        max_char_len: int = 25):
    """Pad one minibatch to ITS OWN max lengths (masking makes the
    result independent of padding; local pads keep tensors small)."""
    S = max(1, max(len(s) for s in sents))
    C = max(1, min(max_char_len, max((len(t) for s in sents for t in s),
                                     default=1)))
    n = len(sents)
    word_ids = np.zeros((n, S), dtype=np.int64)
    char_ids = np.zeros((n, S, C), dtype=np.int64)
    gold = np.zeros((n, S), dtype=np.int64)
    for i, (sent, tags) in enumerate(zip(sents, tags_list)):
        for j, tok in enumerate(sent):
            low = tok.lower()
            word_ids[i, j] = word2idx.get(low, 1)
            for k, ch in enumerate(low[:C]):
                char_ids[i, j, k] = char2idx.get(ch, 1)
            gold[i, j] = tag2idx[tags[j]]
    return word_ids, char_ids, gold


def _train_shard_recurrent(params_ref, word2idx, char2idx, tag2idx, cfg,
                           frozen_ref=None):
    """Per-shard gradient pass (map_groups callable): local Adam over
    deterministic-order minibatches from the broadcast epoch weights;
    returns the shard-trained parameter dict (pickled) for mixing.
    ``frozen_ref`` (optional) broadcasts the embedding rows whose
    vectors are pre-trained and FROZEN (`fine_tune_word_embeddings =
    False`, reference config.ini:78) — their gradients are zeroed."""
    import pickle

    def train_group(group: pa.Table) -> pa.Table:
        from ..functions.recurrent_grad import AdamState, tagger_loss_and_grads

        params = {k: v.copy() for k, v in ray.get(params_ref).items()}
        frozen = ray.get(frozen_ref) if frozen_ref is not None else None
        opt = AdamState(params, lr=cfg.lr)
        idx = sorted(
            range(group.num_rows),
            key=lambda i: (group["order_key"][i].as_py(),
                           group["tokens"][i].as_py()),
        )
        rows = [(group["tokens"][i].as_py(), group["tags"][i].as_py())
                for i in idx if group["tokens"][i].as_py()]
        total_loss = 0.0
        n_batches = 0
        for start in range(0, len(rows), cfg.batch_size):
            chunk = rows[start:start + cfg.batch_size]
            sents = [r[0] for r in chunk]
            tags = [r[1] for r in chunk]
            word_ids, char_ids, gold = _encode_train_batch(
                sents, tags, word2idx, char2idx, tag2idx)
            loss, grads = tagger_loss_and_grads(word_ids, char_ids, gold, params)
            if frozen is not None:
                grads["embeddings"][frozen] = 0.0
            params = opt.step(params, grads)
            total_loss += loss
            n_batches += 1
        return pa.table({
            "shard": pa.array([int(group["shard"][0].as_py())], type=pa.int32()),
            "sentences": pa.array([len(rows)], type=pa.int64()),
            "loss": pa.array([total_loss / max(1, n_batches)], type=pa.float64()),
            "params": pa.array([pickle.dumps(params)], type=pa.large_binary()),
        })

    return train_group


def _eval_recurrent_fn(params_ref, word2idx, char2idx, idx2tag, criteria):
    """Per-batch eval partials with the full recurrent forward + Viterbi
    (same kernels the serving NeuralTagger uses)."""
    from ..functions.metrics import _project
    from ..functions.recurrent import bilstm_crf_emissions

    def eval_batch(batch: pa.Table) -> pa.Table:
        params = ray.get(params_ref)
        trans = params["transitions"]
        correct = total = tp = fp = fn = 0
        rows = [(t, g) for t, g in zip(batch["tokens"].to_pylist(),
                                       batch["tags"].to_pylist()) if t]
        for start in range(0, len(rows), 64):
            chunk = rows[start:start + 64]
            sents = [r[0] for r in chunk]
            word_ids, char_ids, _ = _encode_train_batch(
                sents, [["<PAD>"] * len(s) for s in sents],
                word2idx, char2idx, {"<PAD>": 0})
            em = bilstm_crf_emissions(word_ids, char_ids, params)
            for i, (tokens, tags) in enumerate(chunk):
                pred = _viterbi(em[i, :len(tokens)], trans)
                pred_tags = [idx2tag[p] for p in pred]
                correct += sum(1 for p, g in zip(pred_tags, tags) if p == g)
                total += len(tags)
                gold_set = [_project(c, criteria) for c in chunk_entities(tags)]
                pred_set = [_project(c, criteria) for c in chunk_entities(pred_tags)]
                tp += sum(1 for c in pred_set if c in gold_set)
                fp += sum(1 for c in pred_set if c not in gold_set)
                fn += sum(1 for c in gold_set if c not in pred_set)
        return pa.table({
            "correct": pa.array([correct], type=pa.int64()),
            "total": pa.array([total], type=pa.int64()),
            "tp": pa.array([tp], type=pa.int64()),
            "fp": pa.array([fp], type=pa.int64()),
            "fn": pa.array([fn], type=pa.int64()),
        })

    return eval_batch


class RecurrentTrainer:
    """Gradient training of the full recurrent tagger (char BiLSTM →
    word BiLSTM ×2 → dense → CRF) — the reference's end-to-end model
    training (saber/models/multi_task_lstm_crf.py:105-150,
    saber/trainer.py:47-84) with the SAME distributed coordination as
    the perceptron ``Trainer``: deterministic content-hash shards, one
    ``groupby(shard).map_groups`` gradient pass per epoch (local Adam
    per shard), sentence-weighted parameter mixing, per-epoch span
    P/R/F1 on the valid partition, best-epoch weights kept (A4).

    The saved bundle carries the full weight dict, so it serves through
    the SAME ``NeuralTagger`` actor pool as hand-built recurrent
    bundles — unlike the perceptron path, the emissions here are
    context-dependent (a BiLSTM state, not a per-token embedding row),
    which ``tests/test_trainer.py`` proves by learning a tag pattern a
    linear emission provably cannot express.
    """

    def __init__(self, train: rd.Dataset, valid: rd.Dataset | None = None,
                 test: rd.Dataset | None = None,
                 config: RecurrentTrainConfig | None = None):
        self.config = config or RecurrentTrainConfig()
        self._train = train
        self._valid = valid
        self._test = test
        self.word2idx = _build_word_vocab(train)
        self.char2idx = _build_char_vocab(train)
        self.idx2tag = _build_tag_vocab(train)
        self.tag2idx = {t: i for i, t in enumerate(self.idx2tag)}
        self.history: list[dict] = []
        self.params: dict | None = None

    def _init_params(self, seed_offset: int = 0) -> dict:
        from ..functions.recurrent import init_bilstm_weights

        cfg = self.config
        word_dim = cfg.word_dim
        pretrained = None
        if cfg.embeddings_path:
            # reference saber.load_embeddings: the word2vec matrix
            # REPLACES the embedding table (zeros for PAD/UNK/OOV,
            # saber/embeddings.py:74-106); its dimension wins. Parsed
            # ONCE per trainer — a k-fold run calls _init_params per
            # fold and reference-scale word2vec text files are large
            if getattr(self, "_pretrained_cache", None) is None:
                from ..state.bundle import load_word2vec_text

                self._pretrained_cache = load_word2vec_text(
                    cfg.embeddings_path, self.word2idx)
            pretrained = self._pretrained_cache
            word_dim = pretrained.shape[1]
        params = init_bilstm_weights(
            len(self.word2idx), len(self.char2idx), len(self.idx2tag),
            word_dim=word_dim, char_dim=cfg.char_dim,
            char_units=cfg.char_units, word_units=cfg.word_units,
            seed=cfg.seed + seed_offset,
        )
        if pretrained is not None:
            params["embeddings"] = pretrained.astype(np.float64)
            if cfg.fine_tune_word_embeddings:
                self._frozen_ref = None
            elif getattr(self, "_frozen_ref", None) is None:
                # put ONCE per trainer; every epoch's map_groups reuses it
                self._frozen_ref = ray.put(
                    np.flatnonzero(np.abs(pretrained).sum(axis=1) > 0))
        else:
            self._frozen_ref = None
        return params

    def _epoch_pass(self, sharded: rd.Dataset, params: dict) -> tuple[dict, float]:
        """One distributed epoch: broadcast → per-shard Adam → mix."""
        import pickle

        ref = ray.put(params)
        rows = sharded.groupby("shard").map_groups(
            _train_shard_recurrent(ref, self.word2idx, self.char2idx,
                                   self.tag2idx, self.config,
                                   frozen_ref=getattr(self, "_frozen_ref", None)),
            batch_format="pyarrow",
        ).take_all()
        mixed = {k: np.zeros_like(v) for k, v in params.items()}
        n_sents = 0
        loss = 0.0
        for r in rows:
            w = int(r["sentences"])
            shard_params = pickle.loads(r["params"])
            for k in mixed:
                mixed[k] += shard_params[k] * w
            n_sents += w
            loss += float(r["loss"]) * w
        if not n_sents:
            # empty fold/split: an all-zeros "mixed" would silently
            # replace (and wipe) the model — keep the previous params
            return params, loss
        for k in mixed:
            mixed[k] /= n_sents
        loss /= n_sents
        return mixed, loss

    def _evaluate(self, ds: rd.Dataset, params: dict) -> dict:
        ref = ray.put(params)
        parts = ds.map_batches(
            _eval_recurrent_fn(ref, self.word2idx, self.char2idx,
                               self.idx2tag, self.config.criteria),
            batch_format="pyarrow",
        )
        agg = parts.sum(["correct", "total", "tp", "fp", "fn"])
        if agg is None:
            agg = {f"sum({k})": 0 for k in ("correct", "total", "tp", "fp", "fn")}
        from ..functions.metrics import precision_recall_f1_support

        p, r, f1, support = precision_recall_f1_support(
            agg["sum(tp)"], agg["sum(fp)"], agg["sum(fn)"])
        return {
            "tag_accuracy": (agg["sum(correct)"] / agg["sum(total)"]
                             if agg["sum(total)"] else 0.0),
            "precision": p, "recall": r, "f1": f1, "support": support,
        }

    def train(self) -> dict:
        """Strategy selection exactly as the reference (trainer.py:40-45):
        a valid OR test partition present → train/valid (valid carved
        from train when only test was given, data_utils.collect_valid_
        data); neither → k-fold CV with a model reset per fold
        (trainer.py:87-131)."""
        if self._valid is not None or self._test is not None:
            return self._train_valid()
        return self._cross_validation()

    def _run_epochs(self, train: rd.Dataset, valid: rd.Dataset,
                    history: list[dict], seed_offset: int = 0) -> dict:
        cfg = self.config
        sharded = _with_shard(train, cfg.shards).materialize()
        params = self._init_params(seed_offset)
        per_epoch: list[dict] = []
        for epoch in range(cfg.epochs):
            params, loss = self._epoch_pass(sharded, params)
            metrics = self._evaluate(valid, params)
            metrics.update({"epoch": epoch, "loss": loss})
            history.append(metrics)
            per_epoch.append({k: v.copy() for k, v in params.items()})
        idx = best_epoch([
            (h["precision"], h["recall"], h["f1"]) for h in history[-cfg.epochs:]
        ])
        return per_epoch[idx]

    def _train_valid(self) -> dict:
        from .splits import train_valid_split

        train, valid = self._train, self._valid
        if valid is None:
            train, valid = train_valid_split(train, self.config.valid_fraction)
        self.params = self._run_epochs(train, valid, self.history)
        result = {
            "strategy": "train_valid_test",
            "history": self.history,
            "best_epoch": best_epoch([
                (h["precision"], h["recall"], h["f1"]) for h in self.history
            ]),
        }
        if self._test is not None:
            result["test"] = self._evaluate(self._test, self.params)
        return result

    def _cross_validation(self) -> dict:
        from .splits import k_fold_splits

        # ds.split(k) splits by BLOCK (see the perceptron Trainer) —
        # spread rows across >= k blocks first; training itself is
        # layout-independent via content-hash sharding
        k = self.config.k_folds
        folds = k_fold_splits(self._train.repartition(2 * k), k)
        self.fold_history: list[list[dict]] = []
        fold_scores: list[dict] = []
        best_f1 = -1.0
        for fold, (train, valid) in enumerate(folds):
            hist: list[dict] = []
            # model reset per fold (trainer.py:133-139), seeded per fold
            params = self._run_epochs(train, valid, hist, seed_offset=fold)
            self.fold_history.append(hist)
            idx = best_epoch([(h["precision"], h["recall"], h["f1"]) for h in hist])
            fold_scores.append({**hist[idx], "fold": fold})
            if hist[idx]["f1"] > best_f1:
                best_f1 = hist[idx]["f1"]
                self.params = params
        mean_f1 = sum(s["f1"] for s in fold_scores) / len(fold_scores)
        return {
            "strategy": "cross_validation",
            "folds": fold_scores,
            "mean_f1": mean_f1,
        }

    def save(self, path: str) -> str:
        """Best-epoch weights → NeuralTagger-servable recurrent bundle."""
        from ..state.bundle import save_bundle

        if self.params is None:
            raise RuntimeError("train() must run before save()")
        save_bundle(
            path,
            {k: v.astype(np.float32) for k, v in self.params.items()},
            {"word2idx": self.word2idx, "char2idx": self.char2idx,
             "idx2tag": self.idx2tag},
            {"kind": "bilstm-crf-gradient", "epochs": self.config.epochs,
             "shards": self.config.shards},
        )
        return path


class MultiTaskRecurrentTrainer:
    """Compound-dataset training: SHARED encoder (embeddings, char
    BiLSTM, both word BiLSTMs), per-task dense + CRF heads, tasks
    visited in seeded-random order each epoch — the reference's
    multi-task loop (saber/trainer.py:73-74 random task order;
    saber/utils/data_utils.py:94-116 compound datasets pooling word
    types across corpora while each keeps its own tag set;
    saber/models/multi_task_lstm_crf.py:62-103 shares every layer
    except the CRF).

    ``tasks`` is a list of dicts ``{"train": Dataset, "valid": Dataset
    (optional)}``. Word/char vocabs are built over the UNION of the
    tasks' train partitions; tag vocab per task.
    """

    def __init__(self, tasks: list[dict],
                 config: RecurrentTrainConfig | None = None):
        import random

        if not tasks:
            raise ValueError("at least one task required")
        self.config = config or RecurrentTrainConfig()
        self._rng = random.Random(self.config.seed)
        pooled = tasks[0]["train"]
        for t in tasks[1:]:
            pooled = pooled.union(t["train"])
        self.word2idx = _build_word_vocab(pooled)
        self.char2idx = _build_char_vocab(pooled)
        self.tasks = []
        for t in tasks:
            idx2tag = _build_tag_vocab(t["train"])
            self.tasks.append({
                "train": t["train"], "valid": t.get("valid"),
                "idx2tag": idx2tag,
                "tag2idx": {tag: i for i, tag in enumerate(idx2tag)},
            })
        self.history: list[list[dict]] = [[] for _ in tasks]
        self.task_orders: list[list[int]] = []
        self.shared: dict | None = None
        self.heads: list[dict] | None = None

    _HEAD_KEYS = ("dense_W", "dense_b", "transitions")

    def train(self) -> dict:
        from ..functions.recurrent import init_bilstm_weights
        from .splits import train_valid_split

        cfg = self.config
        # pre-trained embeddings load into the SHARED table exactly as
        # in the single-task trainer (reference load_embeddings; freeze
        # via fine_tune_word_embeddings=False)
        word_dim = cfg.word_dim
        pretrained = None
        if cfg.embeddings_path:
            from ..state.bundle import load_word2vec_text

            pretrained = load_word2vec_text(cfg.embeddings_path, self.word2idx)
            word_dim = pretrained.shape[1]
        # init: shared encoder from task 0's shapes; one head per task
        base = init_bilstm_weights(
            len(self.word2idx), len(self.char2idx),
            len(self.tasks[0]["idx2tag"]),
            word_dim=word_dim, char_dim=cfg.char_dim,
            char_units=cfg.char_units, word_units=cfg.word_units,
            seed=cfg.seed,
        )
        shared = {k: v for k, v in base.items() if k not in self._HEAD_KEYS}
        frozen_ref = None
        if pretrained is not None:
            shared["embeddings"] = pretrained.astype(np.float64)
            if not cfg.fine_tune_word_embeddings:
                frozen_ref = ray.put(
                    np.flatnonzero(np.abs(pretrained).sum(axis=1) > 0))
        heads = []
        for i, task in enumerate(self.tasks):
            head_src = init_bilstm_weights(
                2, 2, len(task["idx2tag"]),
                word_dim=cfg.word_dim, char_dim=cfg.char_dim,
                char_units=cfg.char_units, word_units=cfg.word_units,
                seed=cfg.seed + 100 + i,
            )
            heads.append({k: head_src[k] for k in self._HEAD_KEYS})

        staged = []
        for task in self.tasks:
            train, valid = task["train"], task["valid"]
            if valid is None:
                train, valid = train_valid_split(train, cfg.valid_fraction)
            staged.append({
                "sharded": _with_shard(train, cfg.shards).materialize(),
                "valid": valid,
            })

        eval_cfg = RecurrentTrainConfig(**{**cfg.__dict__})
        per_epoch: list[tuple[dict, list[dict]]] = []
        mean_f1s: list[float] = []
        for epoch in range(cfg.epochs):
            # the reference shuffles task order per epoch with the run's
            # seeded RNG (saber/trainer.py:73-74)
            order = self._rng.sample(range(len(self.tasks)), len(self.tasks))
            self.task_orders.append(order)
            for ti in order:
                task, stage = self.tasks[ti], staged[ti]
                params = {**shared, **heads[ti]}
                ref = ray.put(params)
                import pickle

                rows = stage["sharded"].groupby("shard").map_groups(
                    _train_shard_recurrent(
                        ref, self.word2idx, self.char2idx,
                        task["tag2idx"], cfg, frozen_ref=frozen_ref),
                    batch_format="pyarrow",
                ).take_all()
                mixed = {k: np.zeros_like(v) for k, v in params.items()}
                n_sents = 0
                for r in rows:
                    w = int(r["sentences"])
                    sp = pickle.loads(r["params"])
                    for k in mixed:
                        mixed[k] += sp[k] * w
                    n_sents += w
                if not n_sents:
                    # empty task train partition: keep the current
                    # shared encoder + this task's head (an all-zeros
                    # mix would wipe the SHARED weights for all tasks)
                    continue
                for k in mixed:
                    mixed[k] /= n_sents
                shared = {k: v for k, v in mixed.items()
                          if k not in self._HEAD_KEYS}
                heads[ti] = {k: mixed[k] for k in self._HEAD_KEYS}
            f1s = []
            for ti, (task, stage) in enumerate(zip(self.tasks, staged)):
                tr = RecurrentTrainer.__new__(RecurrentTrainer)
                tr.config = eval_cfg
                tr.word2idx, tr.char2idx = self.word2idx, self.char2idx
                tr.idx2tag = task["idx2tag"]
                metrics = RecurrentTrainer._evaluate(
                    tr, stage["valid"], {**shared, **heads[ti]})
                metrics["epoch"] = epoch
                self.history[ti].append(metrics)
                f1s.append(metrics["f1"])
            mean_f1s.append(sum(f1s) / len(f1s))
            per_epoch.append((
                {k: v.copy() for k, v in shared.items()},
                [{k: v.copy() for k, v in h.items()} for h in heads],
            ))
        best = int(np.argmax(mean_f1s))
        self.shared, self.heads = per_epoch[best]
        return {
            "strategy": "multi_task",
            "best_epoch": best,
            "mean_f1": mean_f1s[best],
            "per_task": [h[best] for h in self.history],
            "task_orders": self.task_orders,
        }

    def save(self, task_index: int, path: str) -> str:
        """One task's servable bundle: shared encoder + its head."""
        from ..state.bundle import save_bundle

        if self.shared is None:
            raise RuntimeError("train() must run before save()")
        weights = {**self.shared, **self.heads[task_index]}
        save_bundle(
            path,
            {k: v.astype(np.float32) for k, v in weights.items()},
            {"word2idx": self.word2idx, "char2idx": self.char2idx,
             "idx2tag": self.tasks[task_index]["idx2tag"]},
            {"kind": "bilstm-crf-multitask", "task": task_index},
        )
        return path
