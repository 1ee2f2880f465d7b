"""Deduplication operators: exact (fingerprint), MinHash+LSH, SimHash,
n-gram Jaccard verification, and embedding-cosine near-duplicates.

All flavors follow the same scale shape:

* signature computation is an embarrassingly-parallel ``map_batches``
  (numpy-vectorized per document, no global state);
* candidate generation is ONE keyed shuffle (``groupby`` on a band /
  bucket key) — the only all-to-all exchange;
* per-bucket pair expansion is capped (``max_bucket``) so a degenerate
  bucket cannot emit O(n²) pairs — oversize buckets are dropped WITH a
  warning log (never silently);
* pair verification (exact Jaccard / Hamming / cosine) happens on the
  candidate pairs only.

References: MinHash (Broder 1997), LSH banding (Leskovec-Rajaraman-Ullman
MMDS ch.3), SimHash (Charikar 2002). The reference repo has no dedup —
these are the engine's training-data-pipeline extensions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.arrowtypes import arrow_types
from ..functions.partitioning import pinned_pool

from ..functions.hashing import (
    batch_shingle_hashes,
    make_minhash_params,
    minhash_signature,
)
from .textstats import _TOKEN_RE, fingerprint_batch

# ------------------------------------------------------------ exact -----


def dedup_exact(ds: rd.Dataset, id_column: str = "doc_id", column: str = "text") -> rd.Dataset:
    """Exact dedup: md5 token-sequence fingerprint → keep min(id) per group.

    Returns (fingerprint, doc_id) survivor rows. Hash-partition + per-group
    first — one shuffle keyed on the fingerprint.
    """
    fps = ds.map_batches(
        lambda b: fingerprint_batch(b, column).select([id_column, "fingerprint"]),
        batch_format="pyarrow",
    )
    return _min_id_survivors(fps, id_column)


def _min_id_survivors(fps: rd.Dataset, id_column: str) -> rd.Dataset:
    """Shared survivor policy: keep the min-id row per fingerprint."""
    out = fps.groupby("fingerprint").min(id_column)
    return out.rename_columns({f"min({id_column})": id_column})


# ----------------------------------------------------------- minhash ----


class MinHashSignatures:
    """Actor-pool stage: per-document MinHash signatures.

    Permutation coefficients are generated once per actor in ``__init__``
    (deterministic seed) — stateful setup out of the per-batch path.
    Shingle hashing is batch-vectorized (one polars hash call over the
    batch's tokens + numpy rolling windows — see
    ``functions/hashing.py:batch_shingle_hashes``); the former
    per-shingle hashlib loop was the dominant map cost at corpus scale.
    """

    def __init__(self, num_perm: int = 128, shingle_k: int = 3, column: str = "text",
                 id_column: str = "doc_id", seed: int = 42):
        self._a, self._b = make_minhash_params(num_perm, seed)
        self._k = shingle_k
        self._col = column
        self._id = id_column
        self._num_perm = num_perm

    def __call__(self, batch: pa.Table) -> pa.Table:
        # docs with no shingles are dropped here: the all-max "empty"
        # signature is identical for every empty doc, so banding them
        # would pair all empty docs with each other
        per_doc = batch_shingle_hashes(
            batch[self._col].to_pylist(), _TOKEN_RE, self._k,
            whole_doc_if_short=True,
        )
        ids, sigs = [], []
        for rid, hashes in zip(batch[self._id].to_pylist(), per_doc):
            if len(hashes) == 0:
                continue
            ids.append(rid)
            sigs.append(minhash_signature(hashes, self._a, self._b).astype(np.int64))
        id_type = batch.schema.field(self._id).type
        return pa.table(
            {
                self._id: pa.array(ids, type=id_type),
                "signature": pa.array([s.tolist() for s in sigs], type=pa.list_(pa.int64())),
            }
        )


def _band_rows(batch: pa.Table, num_bands: int, id_column: str) -> pa.Table:
    """(id, signature) batch → one row per (band, band_hash, id).

    Band hashes are computed for the WHOLE batch in one vectorized pass:
    reshape the signature matrix to [docs, bands, rows_per_band] and
    polynomial-combine along the last axis (uint64 wraparound — same
    family as ``rolling_shingle_hashes``). 64-bit band keys collide with
    negligible probability at per-bucket scales, and an LSH collision is
    only an extra CANDIDATE, verified exactly downstream.
    """
    from ..functions.hashing import _FNV_PRIME

    n = batch.num_rows
    if n == 0:
        # empty block: pa.array([]) would infer a NULL-typed id column
        # whose schema conflicts with non-empty blocks — keep the type
        return pa.table(
            {
                id_column: pa.array([], type=batch.schema.field(id_column).type),
                "band": pa.array([], type=pa.int32()),
                "band_hash": pa.array([], type=pa.int64()),
            }
        )
    sig_col = batch["signature"].combine_chunks()
    num_perm = len(sig_col[0])
    rows_per_band = num_perm // num_bands
    mat = np.asarray(sig_col.flatten(), dtype=np.uint64).reshape(
        n, num_bands, rows_per_band)
    acc = np.zeros((n, num_bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(rows_per_band):
            acc = acc * _FNV_PRIME + mat[:, :, j]
    ids = batch[id_column].combine_chunks()
    return pa.table(
        {
            id_column: pa.concat_arrays([ids] * num_bands)
            if num_bands > 1 else ids,
            "band": pa.array(
                np.repeat(np.arange(num_bands, dtype=np.int32), n)),
            "band_hash": pa.array(acc.T.reshape(-1).view(np.int64)),
        }
    )


def expand_bucketed_pairs(
    bands: rd.Dataset,
    band_cols: list[str],
    id_column: str,
    id_type,
    max_bucket: int,
    n_buckets: int,
    payload_column: str | None = None,
    pair_filter=None,
) -> rd.Dataset:
    """(LSH band rows) → DISTINCT (id_a, id_b) candidate pairs.

    The shared candidate-expansion shape for every LSH flavor (MinHash
    banding, multi-table sign-LSH, SimHash banding): rows hash into
    ``n_buckets`` shuffle groups on the LAST band column (the bucket key
    — every row of one LSH bucket lands in one group), then each group
    frame finds its duplicate runs with ONE vectorized boundary scan and
    expands only those. Buckets, not LSH keys, are the work unit: a
    per-key aggregate makes one Python accumulator call per group and
    almost every LSH bucket is a singleton — measured 3.9 s of a 6.6 s
    minhash query at sf0.1 went to that aggregate shape.

    ``payload_column`` + ``pair_filter`` add in-bucket verification:
    the payload value rides with each band row, and
    ``pair_filter(payload_a, payload_b) -> bool mask`` (vectorized over
    a run's candidate pairs) keeps only verified pairs — SimHash uses
    this for the Hamming check.

    Oversize buckets (> ``max_bucket``) are dropped WITH a warning —
    never expanded to O(n²) pairs, never silently.
    """
    key_col = band_cols[-1]

    def bucketize(batch: pa.Table) -> pa.Table:
        h = np.asarray(batch[key_col].combine_chunks(), dtype=np.int64)
        bucket = (h.view(np.uint64) % np.uint64(n_buckets)).astype(np.int32)
        return batch.append_column("__bucket", pa.array(bucket))

    bucketed = bands.map_batches(bucketize, batch_format="pyarrow")

    def expand(df):
        import logging

        import pandas as pd

        df = df.sort_values(band_cols + [id_column], kind="mergesort")
        ids = df[id_column].to_numpy()
        n = len(df)
        if n == 0:
            return pd.DataFrame({"id_a": ids[:0], "id_b": ids[:0]})
        payload = (df[payload_column].to_numpy()
                   if payload_column is not None else None)
        boundary = np.zeros(n, dtype=bool)
        boundary[0] = True
        for c in band_cols:
            v = df[c].to_numpy()
            boundary[1:] |= v[1:] != v[:-1]
        run_id = np.cumsum(boundary) - 1
        counts = np.bincount(run_id)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        out_a, out_b = [], []
        # only duplicate runs (rare) reach Python
        for s, c in zip(starts[counts >= 2], counts[counts >= 2]):
            if c > max_bucket:
                logging.getLogger(__name__).warning(
                    "LSH bucket exceeds max_bucket=%d; its pairs are skipped",
                    max_bucket,
                )
                continue
            order = np.argsort(ids[s:s + c], kind="stable")
            mem = ids[s:s + c][order]
            ia, ib = np.triu_indices(c, k=1)
            if pair_filter is not None:
                pl = payload[s:s + c][order]
                keep = pair_filter(pl[ia], pl[ib])
                ia, ib = ia[keep], ib[keep]
            out_a.extend(mem[ia])
            out_b.extend(mem[ib])
        return pd.DataFrame({"id_a": out_a, "id_b": out_b})

    pairs = bucketed.groupby("__bucket").map_groups(
        expand, batch_format="pandas"
    ).map_batches(  # pandas may widen the id dtype; restore the input's
        lambda t: pa.table({"id_a": pc.cast(t["id_a"], id_type),
                            "id_b": pc.cast(t["id_b"], id_type)}),
        batch_format="pyarrow",
    )
    # distinct (a, b) across bands/tables
    return pairs.groupby(["id_a", "id_b"]).count().drop_columns(["count()"])


def minhash_lsh_pairs(
    ds: rd.Dataset,
    num_perm: int = 128,
    num_bands: int = 32,
    shingle_k: int = 3,
    column: str = "text",
    id_column: str = "doc_id",
    max_bucket: int = 64,
    concurrency=None,
) -> rd.Dataset:
    """Candidate near-duplicate pairs via MinHash + LSH banding.

    signatures (actor pool) → band explode → ONE hash shuffle keyed on
    ``hash(band_hash) % P`` → per-BUCKET vectorized run detection + pair
    expansion → distinct pairs. Buckets (not LSH keys) are the shuffle
    groups: a per-(band, band_hash) aggregate makes one Python
    accumulator call per group, and almost every group is a singleton —
    measured 3.9 s of a 6.6 s query at sf0.1 went to that aggregate;
    the bucket shape replaced it with P pandas frames whose duplicate
    runs are found by one vectorized boundary scan each (6.6 → 5.1 s
    warm, identical pairs).

    Default banding 32 bands x 4 rows (128 perms): candidate recall
    1-(1-s^4)^32 is ~0.87 at s=0.5 and >1-1e-14 at s=0.9, so pairs at a
    0.5-Jaccard verification threshold are reliably CANDIDATES; the
    exact-Jaccard verify stage removes the low-s false positives this
    wider banding admits (their count is bounded by the bucket cap).
    """
    if num_perm % num_bands:
        raise ValueError(
            f"num_perm ({num_perm}) must be divisible by num_bands "
            f"({num_bands}) — trailing permutations would be silently dropped"
        )
    id_type = arrow_types(ds)[id_column]
    sigs = ds.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={
            "num_perm": num_perm, "shingle_k": shingle_k,
            "column": column, "id_column": id_column,
        },
        batch_format="pyarrow",
        concurrency=concurrency or pinned_pool(8),
    )
    from ..functions.partitioning import shuffle_partitions

    bands = sigs.map_batches(
        lambda b: _band_rows(b, num_bands, id_column), batch_format="pyarrow"
    )
    return expand_bucketed_pairs(
        bands, ["band", "band_hash"], id_column, id_type,
        max_bucket, shuffle_partitions(num_bands, ds),
    )


def _shingle_set(text: str, k: int) -> set:
    toks = _TOKEN_RE.findall(text.lower()) if text else []
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def jaccard_for_pairs(
    texts_by_id: dict, pairs: list[tuple], shingle_k: int = 3
) -> list[tuple]:
    """Exact n-gram Jaccard for candidate pairs (verification kernel).

    Driver/test-side helper; at scale the same math runs inside a
    ``map_batches`` over pair rows joined back to shingle sets.
    """
    out = []
    for a, b in pairs:
        sa = _shingle_set(texts_by_id[a], shingle_k)
        sb = _shingle_set(texts_by_id[b], shingle_k)
        denom = len(sa | sb)
        out.append((a, b, len(sa & sb) / denom if denom else 0.0))
    return out


def _shingle_hash_arrays(batch: pa.Table, shingle_k: int,
                         id_column: str, column: str) -> pa.Table:
    """[id, text] batch → [id, shingles] where ``shingles`` is the
    SORTED DISTINCT int64 shingle-hash array of each document (the
    Arrow-storable stand-in for the shingle string set; 64-bit
    collisions are negligible at per-doc shingle counts). Vectorized:
    same batch-level kernel as the signature stage, then per-doc
    ``np.unique``; Jaccard over hash SETS equals Jaccard over shingle
    string sets because the hash is injective at these cardinalities."""
    per_doc = batch_shingle_hashes(
        batch[column].to_pylist(), _TOKEN_RE, shingle_k,
        whole_doc_if_short=True,
    )
    out = [np.sort(np.unique(hs).view(np.int64)) for hs in per_doc]
    return pa.table(
        {
            id_column: batch[id_column],
            "shingles": pa.array([o.tolist() for o in out], type=pa.list_(pa.int64())),
        }
    )


def verify_pairs_jaccard(
    pairs: rd.Dataset,
    docs: rd.Dataset,
    shingle_k: int = 3,
    id_column: str = "doc_id",
    column: str = "text",
    min_jaccard: float = 0.0,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Distributed exact-Jaccard verification of candidate pairs.

    The corpus streams once through a candidate-id mask (no corpus
    shuffle); candidate docs are shingle-hashed IN the stream; two hash
    joins attach each side's sorted shingle-hash array to the pair rows
    (see stages/pairs.py — only ids ever touch the driver); scoring is a
    per-row sorted-array intersection. Returns (id_a, id_b, jaccard)
    with jaccard >= min_jaccard.
    """
    import numpy as np

    from .pairs import attach_pair_payload

    id_type = arrow_types(docs)[id_column]
    attached = attach_pair_payload(
        pairs, docs, id_column, "shingles",
        raw_columns=[column],
        payload_builder=lambda b: _shingle_hash_arrays(b, shingle_k, id_column, column),
        num_partitions=num_partitions,
    )

    return attached.map_batches(
        lambda b: _score_attached_jaccard(b, id_type, min_jaccard),
        batch_format="pyarrow",
    )


def _score_attached_jaccard(
    batch: pa.Table, id_type, min_jaccard: float
) -> pa.Table:
    """(id_a, id_b, payload_a, payload_b) rows → exact-Jaccard scores over
    the sorted-distinct shingle-hash arrays; the shared verification
    kernel of ``verify_pairs_jaccard`` and ``dedup_against_index``."""
    out_a, out_b, out_j = [], [], []
    for a, b, sa, sb in zip(
        batch["id_a"].to_pylist(), batch["id_b"].to_pylist(),
        batch["payload_a"].to_pylist(), batch["payload_b"].to_pylist(),
    ):
        sa = np.asarray(sa, dtype=np.int64)
        sb = np.asarray(sb, dtype=np.int64)
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        denom = len(sa) + len(sb) - inter
        j = inter / denom if denom else 0.0
        if j >= min_jaccard:
            out_a.append(a)
            out_b.append(b)
            out_j.append(j)
    return pa.table(
        {
            "id_a": pa.array(out_a, type=id_type),
            "id_b": pa.array(out_b, type=id_type),
            "jaccard": pa.array(out_j, type=pa.float64()),
        }
    )


def ngram_jaccard_pairs(
    ds: rd.Dataset,
    shingle_k: int = 3,
    min_jaccard: float = 0.5,
    column: str = "text",
    id_column: str = "doc_id",
    max_doc_freq: int = 256,
    sample_mod: int = 1,
    concurrency=None,
) -> rd.Dataset:
    """Exact n-gram Jaccard near-dup pairs via a shingle INVERTED INDEX.

    The non-approximate sibling of :func:`minhash_lsh_pairs`: candidate
    generation is the inverted index itself — every doc explodes into
    (shingle_hash, id) rows, ONE shuffle keyed on ``hash(shingle) % P``
    groups the postings, and each shingle's posting run expands to
    pairs (capped at ``max_doc_freq`` docs per shingle: a hotter shingle
    is non-discriminative and its pairs — if real near-dups — share a
    rarer shingle too). Any pair sharing >= 1 surviving shingle becomes
    a candidate (recall 1 under the cap, vs MinHash's probabilistic
    banding recall), then the shared :func:`verify_pairs_jaccard` stage
    computes exact Jaccard and keeps ``>= min_jaccard``.

    Scale trade vs MinHash: the shuffle moves one row per DISTINCT
    shingle occurrence (~tokens per doc) instead of ``num_bands`` rows
    per doc — exactness costs shuffle bytes. ``sample_mod`` > 1 keeps
    only shingles with ``hash % sample_mod == 0`` (Broder's modulo
    sketch): deterministic, set-consistent sampling that divides
    shuffle volume while keeping recall high for high-Jaccard pairs
    (a j=0.5 pair sharing s shingles survives with p = 1-(1-1/m)^s).

    Returns (id_a, id_b, jaccard) rows, id_a < id_b.
    """
    from ..functions.partitioning import shuffle_partitions

    id_type = arrow_types(ds)[id_column]

    def explode(batch: pa.Table) -> pa.Table:
        t = _shingle_hash_arrays(batch, shingle_k, id_column, column)
        sh = t["shingles"].combine_chunks()
        flat = pc.list_flatten(sh)
        parent = pc.list_parent_indices(sh)
        ids = pc.take(t[id_column].combine_chunks(), parent)
        if sample_mod > 1:
            f = np.asarray(flat)
            keep = np.flatnonzero((f.view(np.uint64) % np.uint64(sample_mod)) == 0)
            flat = pa.array(f[keep])
            ids = pc.take(ids, pa.array(keep))
        return pa.table({"shingle": flat, id_column: ids})

    postings = ds.map_batches(explode, batch_format="pyarrow",
                              concurrency=concurrency)
    cand = expand_bucketed_pairs(
        postings, ["shingle"], id_column, id_type,
        max_doc_freq, shuffle_partitions(16, ds),
    )
    return verify_pairs_jaccard(
        cand, ds, shingle_k, id_column, column, min_jaccard,
    )


# ----------------------------------------------------------- simhash ----


def simhash_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Append ``simhash`` — 64-bit SimHash over md5 token hashes
    (vectorized bit-vote accumulation per document).

    Token hashes are md5-derived (``stable_u64_md5``) so a DuckDB oracle
    reproduces the bit votes — and thus pairwise hamming distances —
    exactly. Token-less documents get a NULL simhash (an all-zero
    "empty" hash would pair every empty doc with every other).

    Vectorized per batch: md5 runs ONCE per DISTINCT token in the batch
    (``np.unique`` + inverse-index gather — the duplication factor of
    natural text makes this the dominant saving), and the bit votes are
    one batched ``simhash64_many`` segment-sum instead of a Python
    ``simhash64`` call per document. Occurrence multiplicity is
    preserved by the gather (each occurrence votes once, as before)."""
    from ..functions.hashing import simhash64_many, stable_u64_md5

    doc_tokens = [
        _TOKEN_RE.findall(text.lower()) if text else []
        for text in batch[column].to_pylist()
    ]
    lengths = np.array([len(t) for t in doc_tokens], dtype=np.int64)
    all_toks = np.array(
        [t for toks in doc_tokens for t in toks], dtype=object
    )
    if len(all_toks):
        uniq, inverse = np.unique(all_toks, return_inverse=True)
        uniq_hashes = np.array(
            [stable_u64_md5(t) for t in uniq.tolist()], dtype=np.uint64
        )
        occ_hashes = uniq_hashes[inverse]
    else:
        occ_hashes = np.empty(0, dtype=np.uint64)
    sims = simhash64_many(occ_hashes, lengths).view(np.int64)
    arr = pa.array(sims, type=pa.int64(), mask=lengths == 0)
    return batch.append_column("simhash", arr)


def simhash_near_pairs(
    ds: rd.Dataset,
    max_hamming: int = 3,
    num_tables: int = 4,
    column: str = "text",
    id_column: str = "doc_id",
    max_bucket: int = 1024,
) -> rd.Dataset:
    """Near-dup pairs by SimHash: bucket on each 16-bit band (4 tables →
    any pair within Hamming distance 3 shares at least one exact band by
    pigeonhole), then verify Hamming distance inside the bucket.

    Recall is GUARANTEED only for ``max_hamming < num_tables``
    (pigeonhole: fewer differing bits than bands forces a shared band);
    beyond that the banding is best-effort — a pair differing in one
    bit per band shares no band and is missed — so that configuration
    logs a warning instead of silently under-delivering. A 64-bit
    signature holds at most four 16-bit bands (a fifth band key would
    be the constant 0, funneling the corpus into one dropped bucket) —
    that config is an error.

    ``max_bucket`` default: 16-bit bands collide QUADRATICALLY with
    corpus size (a band carries 65,536 keys, so 5k docs already push
    popular buckets near 300 members — measured at sf0.1, where a cap
    of 64 silently cost 25 true pairs), so the simhash cap is 1024
    (≤ C(1024,2) ≈ 524k verified candidates per degenerate bucket)
    rather than the 64 that fits MinHash's much wider band keyspace.
    """
    if not 1 <= num_tables <= 4:
        raise ValueError(
            f"num_tables={num_tables}: a 64-bit simhash has at most four "
            "16-bit bands")
    if max_hamming >= num_tables:
        import logging

        logging.getLogger(__name__).warning(
            "simhash_near_pairs: max_hamming=%d >= num_tables=%d — recall "
            "is best-effort (pigeonhole guarantee needs fewer differing "
            "bits than bands); pairs at the distance limit may be missed",
            max_hamming, num_tables)
    sigs = ds.map_batches(
        lambda b: simhash_batch(b, column).select([id_column, "simhash"]),
        batch_format="pyarrow",
    )

    def bands(batch: pa.Table) -> pa.Table:
        # vectorized band expansion: filter null simhashes (token-less
        # docs band nothing), then numpy repeat/tile — no per-row loop
        valid = batch.filter(pc.is_valid(batch["simhash"]))
        sh = valid["simhash"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = sh.view(np.uint64)
        n = len(sh)
        shifts = np.uint64(16) * np.arange(num_tables, dtype=np.uint64)
        keys = ((u[:, None] >> shifts[None, :]) & np.uint64(0xFFFF)).astype(np.int64).ravel()
        id_col = valid[id_column]
        if isinstance(id_col, pa.ChunkedArray):
            id_col = id_col.combine_chunks()
        id_arr = id_col.take(pa.array(np.repeat(np.arange(n, dtype=np.int64), num_tables)))
        return pa.table({id_column: id_arr,
                         "t": pa.array(np.tile(np.arange(num_tables, dtype=np.int32), n)),
                         "key": pa.array(keys, type=pa.int64()),
                         "simhash": pa.array(np.repeat(sh, num_tables), type=pa.int64())})

    id_type = arrow_types(ds)[id_column]

    from ..functions.partitioning import shuffle_partitions

    def hamming_ok(sh_a, sh_b):
        # vectorized Hamming over a run's candidate pairs (the payload
        # hook of expand_bucketed_pairs)
        x = sh_a.astype(np.int64).view(np.uint64) ^ \
            sh_b.astype(np.int64).view(np.uint64)
        dist = np.zeros(len(x), dtype=np.int64)
        while x.any():
            dist += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        return dist <= max_hamming

    banded = sigs.map_batches(bands, batch_format="pyarrow")
    return expand_bucketed_pairs(
        banded, ["t", "key"], id_column, id_type,
        max_bucket, shuffle_partitions(num_tables, ds),
        payload_column="simhash", pair_filter=hamming_ok,
    )


def _interleaved_fingerprints(docs: rd.Dataset, id_column: str) -> rd.Dataset:
    """(id, fingerprint) rows for interleaved documents: reuse the
    ``span_hash`` invariant column when present, else hash each row's
    span sequence in-stream."""
    from ..functions.hashing import span_sequence_hash

    if "span_hash" in docs.schema().names:
        # annotated documents already carry the invariant hash — reuse it
        # instead of re-hashing every span
        return docs.select_columns([id_column, "span_hash"]).rename_columns(
            {"span_hash": "fingerprint"}
        )

    def fp(batch: pa.Table) -> pa.Table:
        hashes = []
        for spans in batch["spans"].to_pylist():
            spans = spans or []
            hashes.append(span_sequence_hash(
                [s["kind"] for s in spans],
                [s["text"] for s in spans],
                [s["media_ref"] for s in spans],
            ))
        return pa.table({id_column: batch[id_column],
                         "fingerprint": pa.array(hashes, type=pa.string())})

    return docs.map_batches(fp, batch_format="pyarrow")


def dedup_documents_exact(docs: rd.Dataset, id_column: str = "doc_id") -> rd.Dataset:
    """Exact dedup of INTERLEAVED documents: the span-sequence hash (the
    pipeline invariant) doubles as the content fingerprint; keep the
    min-id document per identical span sequence. One shuffle.
    """
    return _min_id_survivors(_interleaved_fingerprints(docs, id_column), id_column)


def exact_dropped_ids(
    docs: rd.Dataset, id_column: str = "doc_id", max_group: int = 1024
) -> rd.Dataset:
    """DROP-list complement of ``dedup_documents_exact``: one ``doc_id``
    row per document that an exact dedup would remove (everything but
    the min-id survivor of each identical span sequence).

    Same bucket-keyed shuffle shape as ``expand_bucketed_pairs``:
    fingerprints hash into P bucket groups (every copy of one
    fingerprint lands in one group), each group frame finds duplicate
    runs with one vectorized boundary scan and emits the non-min run
    members. Per-fingerprint drops are capped at ``max_group`` so a
    degenerate fingerprint shared by millions of rows cannot explode
    the drop-list — the overflow duplicates SURVIVE (conservative: a
    drop-list must never drop a survivor), logged not silent. Output
    column is always ``doc_id`` (the job runner's drop-list schema)
    whatever ``id_column`` names the input.
    """
    from ..functions.hashing import hash_str_array
    from ..functions.partitioning import shuffle_partitions

    n_buckets = shuffle_partitions(8, docs)
    id_type = arrow_types(docs)[id_column]
    fps = _interleaved_fingerprints(docs, id_column)

    def bucketize(batch: pa.Table) -> pa.Table:
        h = hash_str_array(batch["fingerprint"].to_pylist())
        return batch.append_column(
            "__bucket",
            pa.array((h % np.uint64(n_buckets)).astype(np.int32)),
        )

    def dropped(df):
        import logging

        import pandas as pd

        df = df.sort_values(["fingerprint", id_column], kind="mergesort")
        ids = df[id_column].to_numpy()
        n = len(df)
        if n == 0:
            return pd.DataFrame({"doc_id": ids[:0]})
        f = df["fingerprint"].to_numpy()
        boundary = np.ones(n, dtype=bool)
        boundary[1:] = f[1:] != f[:-1]
        run_id = np.cumsum(boundary) - 1
        counts = np.bincount(run_id)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        pos = np.arange(n) - starts[run_id]
        if (counts > max_group + 1).any():
            logging.getLogger(__name__).warning(
                "exact-dup group exceeds max_group=%d; uncollected "
                "duplicates are kept", max_group,
            )
        drop = (pos >= 1) & (pos <= max_group)
        return pd.DataFrame({"doc_id": ids[drop]})

    return (
        fps.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(dropped, batch_format="pandas")
        .map_batches(
            lambda t: pa.table({"doc_id": pc.cast(t["doc_id"], id_type)}),
            batch_format="pyarrow",
        )
    )


def near_dup_dropped_ids(
    docs: rd.Dataset,
    id_column: str = "doc_id",
    column: str = "text",
    min_jaccard: float = 0.8,
    num_perm: int = 128,
    num_bands: int = 16,
    shingle_k: int = 3,
    max_bucket: int = 64,
    transitive: bool = False,
) -> rd.Dataset:
    """Near-duplicate DROP-list: MinHash+LSH candidates → distributed
    exact-Jaccard verification → keep-min survivor policy. Output
    column is always ``doc_id``.

    ``transitive=False`` (default, the cheap web-dedup policy): every
    verified pair is emitted sorted ``id_a < id_b``; dropping the
    distinct ``id_b`` set keeps the smallest id of each chain — for
    a~b~c it drops b and c even if a~c was never a candidate, and for
    a~c, b~c (no a~b) it keeps both a AND b.

    ``transitive=True``: connected components over the verified pair
    graph (iterative min-label propagation, ``graph.py``) — exactly one
    survivor (the min id) per component, whatever the pair topology.
    Costs O(component diameter) extra shuffles over the pair set only.
    """
    # materialize once: the signature scan and the verification scan are
    # two independent consumers, and Ray re-executes derived lineage per
    # consumer (would run any upstream actor pools twice)
    docs = docs.materialize()
    pairs = minhash_lsh_pairs(
        docs, num_perm=num_perm, num_bands=num_bands, shingle_k=shingle_k,
        column=column, id_column=id_column, max_bucket=max_bucket,
    )
    verified = verify_pairs_jaccard(
        pairs, docs, shingle_k=shingle_k, id_column=id_column,
        column=column, min_jaccard=min_jaccard,
    )
    if transitive:
        from .graph import connected_components

        comp = connected_components(verified)

        def non_min(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = pc.invert(pc.equal(batch["node"], batch["component"]))
            return pa.table({"doc_id": batch.filter(keep)["node"]})

        return comp.map_batches(non_min, batch_format="pyarrow")
    return (
        verified.groupby("id_b").count()
        .drop_columns(["count()"])
        .rename_columns({"id_b": "doc_id"})
    )


# ------------------------------------------- incremental (stored index) -----


class MinHashIndexRows(MinHashSignatures):
    """Fused index-build stage: one pass over document text emits BOTH
    the MinHash signature and the sorted-distinct shingle-hash array per
    document (the verification payload). Shingle hashing — the dominant
    map cost — runs once, not once per derived table."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        per_doc = batch_shingle_hashes(
            batch[self._col].to_pylist(), _TOKEN_RE, self._k,
            whole_doc_if_short=True,
        )
        ids, sigs, shingles = [], [], []
        for rid, hashes in zip(batch[self._id].to_pylist(), per_doc):
            if len(hashes) == 0:
                continue  # same empty-doc drop as MinHashSignatures
            ids.append(rid)
            sigs.append(
                minhash_signature(hashes, self._a, self._b)
                .astype(np.int64).tolist()
            )
            # np.unique output is already sorted; order is irrelevant to
            # the intersect1d(assume_unique=True) verification kernel
            shingles.append(np.unique(hashes).view(np.int64).tolist())
        id_type = batch.schema.field(self._id).type
        return pa.table(
            {
                self._id: pa.array(ids, type=id_type),
                "signature": pa.array(sigs, type=pa.list_(pa.int64())),
                "shingles": pa.array(shingles, type=pa.list_(pa.int64())),
            }
        )


def _stable_part(ids, num_parts: int) -> np.ndarray:
    """Deterministic partition id per document id — md5-based so the
    driver can reproduce it for storage-level pruning, layout- and
    dtype-independent (matches ``functions.hashing.stable_u64_md5``)."""
    from ..functions.hashing import stable_u64_md5

    return np.fromiter(
        (stable_u64_md5(str(i)) % num_parts for i in ids),
        dtype=np.int64, count=len(ids),
    )


def _add_spart(batch: pa.Table, id_column: str, num_parts: int) -> pa.Table:
    """Append the payload table's partition column (stable id hash)."""
    return batch.append_column(
        "spart",
        pa.array(_stable_part(batch[id_column].to_pylist(), num_parts)),
    )


def _bands_with_part(
    batch: pa.Table, num_bands: int, num_parts: int, id_column: str
) -> pa.Table:
    """(id, signature) batch → band rows + the band table's partition
    column (``band_hash % num_parts``) — the one key every side of the
    incremental lifecycle must compute identically."""
    out = _band_rows(batch.select([id_column, "signature"]), num_bands, id_column)
    part = (
        np.asarray(out["band_hash"].combine_chunks(), dtype=np.int64)
        .view(np.uint64) % np.uint64(num_parts)
    ).astype(np.int64)
    return out.append_column("part", pa.array(part))


def build_minhash_index(
    corpus: rd.Dataset,
    index_dir: str,
    num_perm: int = 128,
    num_bands: int = 32,
    shingle_k: int = 3,
    column: str = "text",
    id_column: str = "doc_id",
    num_parts: int = 64,
    seed: int = 42,
    concurrency=None,
) -> None:
    """Build and PERSIST a MinHash-LSH dedup index over a corpus, so
    later arriving shards dedup against it WITHOUT re-touching corpus
    text (``dedup_against_index``) — the incremental shape a 100-TB
    corpus needs: the expensive corpus pass happens once, at build time.

    Layout (all parquet, hive-partitioned):

    * ``<index_dir>/docs/spart=<h>/``  — (id, signature, shingles) rows,
      partitioned by a stable hash of the id: the verification payload,
      prunable by candidate id at query time;
    * ``<index_dir>/bands/part=<p>/`` — (id, band, band_hash) LSH band
      rows partitioned by ``band_hash % num_parts``: candidate lookup
      reads ONLY the partitions an increment's own band hashes land in;
    * ``<index_dir>/params.json``     — banding/shingle parameters; an
      increment MUST be hashed with the same parameters, so the query
      side reads them from here rather than trusting its caller.

    Cost: one streaming text pass (fused signature+shingle stage), one
    partitioned write, then one column-pruned pass over the stored
    ``signature`` column to derive band rows — corpus text is read
    exactly once, and both derived tables shuffle nothing wider than a
    partitioned write.
    """
    import json
    import os

    if num_perm % num_bands:
        # same up-front guard as minhash_lsh_pairs — failing inside
        # _band_rows would only surface AFTER the whole corpus text pass
        raise ValueError(
            f"num_perm ({num_perm}) must be divisible by num_bands "
            f"({num_bands}) — trailing permutations would be silently dropped"
        )
    rows = corpus.map_batches(
        MinHashIndexRows,
        fn_constructor_kwargs={
            "num_perm": num_perm, "shingle_k": shingle_k,
            "column": column, "id_column": id_column, "seed": seed,
        },
        batch_format="pyarrow",
        concurrency=concurrency or pinned_pool(8),
    )

    # sort by the partition column before every partitioned write: an
    # unsorted write fans each input block across EVERY partition dir it
    # touches (blocks × num_parts tiny files — measured 1,349 files and
    # a 20 s verify read at sf0.1); sorted, each partition holds
    # contiguous blocks, so file count tracks data size. The sort is one
    # keyed shuffle paid at BUILD time, amortized over every later shard
    rows.map_batches(
        lambda b: _add_spart(b, id_column, num_parts), batch_format="pyarrow"
    ).sort("spart").write_parquet(
        os.path.join(index_dir, "docs"), partition_cols=["spart"]
    )

    # band rows derive from the STORED signature column (column-pruned
    # read — shingle payloads never leave storage for this pass)
    stored = rd.read_parquet(
        os.path.join(index_dir, "docs"), columns=[id_column, "signature"]
    )
    stored.map_batches(
        lambda b: _bands_with_part(b, num_bands, num_parts, id_column),
        batch_format="pyarrow",
    ).sort("part").write_parquet(
        os.path.join(index_dir, "bands"), partition_cols=["part"]
    )
    with open(os.path.join(index_dir, "params.json"), "w") as f:
        json.dump(
            {
                "num_perm": num_perm, "num_bands": num_bands,
                "shingle_k": shingle_k, "num_parts": num_parts,
                "id_column": id_column, "column": column, "seed": seed,
            },
            f,
        )


def dedup_against_index(
    increment: rd.Dataset,
    index_dir: str,
    min_jaccard: float = 0.5,
    max_bucket: int = 64,
    concurrency=None,
) -> rd.Dataset:
    """Near-duplicate matches of an arriving shard against a PERSISTED
    corpus index (``build_minhash_index``), corpus text untouched.

    Returns (new_id, dup_of, jaccard): every increment document whose
    exact shingle Jaccard against some indexed document is
    ``>= min_jaccard``, one row per matching corpus document.

    Scale shape — cost is proportional to the INCREMENT, not the corpus:

    1. increment → fused signature+shingle stage (one text pass);
    2. increment band rows shuffle ONCE keyed on ``band_hash %
       num_parts``; each group task reads exactly its own
       ``bands/part=<p>/`` index partition (partitions no increment row
       lands in are never opened) and joins in-task — the INDEX side
       never shuffles;
    3. per-LSH-key join fan-out is capped per side (``max_bucket``,
       dropped WITH a warning — never O(n²));
    4. verification payloads: increment side rides the in-stream shingle
       arrays; corpus side reads ONLY the ``docs/spart=<h>/`` partitions
       that hold candidate ids (storage-level pruning on the stable id
       hash), then the shared exact-Jaccard kernel scores pair rows.
    """
    import glob
    import json
    import os

    with open(os.path.join(index_dir, "params.json")) as f:
        params = json.load(f)
    num_parts = params["num_parts"]
    id_column = params["id_column"]
    column = params["column"]

    id_type = arrow_types(increment)[id_column]
    inc_rows = increment.map_batches(
        MinHashIndexRows,
        fn_constructor_kwargs={
            "num_perm": params["num_perm"], "shingle_k": params["shingle_k"],
            "column": column, "id_column": id_column,
            "seed": params.get("seed", 42),
        },
        batch_format="pyarrow",
        concurrency=concurrency or pinned_pool(8),
    ).materialize()  # two consumers: band lookup + verification payload

    inc_bands = inc_rows.map_batches(
        lambda b: _bands_with_part(b, params["num_bands"], num_parts, id_column),
        batch_format="pyarrow",
    )

    def probe_part(df):
        """One shuffle group = one index partition: read it (local,
        pruned), join on the LSH key, emit cross-side candidate pairs."""
        import logging

        import pandas as pd
        import pyarrow.parquet as pq

        empty = pd.DataFrame({"id_a": df[id_column][:0], "id_b": df[id_column][:0]})
        if len(df) == 0:
            return empty
        p = int(df["part"].iloc[0])
        files = sorted(
            glob.glob(os.path.join(index_dir, "bands", f"part={p}", "*.parquet"))
        )
        if not files:
            return empty
        idx = pa.concat_tables(
            [pq.read_table(f, columns=[id_column, "band", "band_hash"]) for f in files]
        ).to_pandas()
        # cap on the UNION size per LSH key — the same rule
        # expand_bucketed_pairs applies to a one-shot run (where both
        # sides form ONE run), so the incremental result stays exactly
        # the cross-side subset of the one-shot pipeline; a per-SIDE cap
        # would keep keys the one-shot path drops
        union = (
            df.groupby(["band", "band_hash"]).size()
            .add(idx.groupby(["band", "band_hash"]).size(), fill_value=0)
        )
        bad = union.index[union > max_bucket]
        if len(bad):
            logging.getLogger(__name__).warning(
                "LSH key exceeds max_bucket=%d; its pairs are skipped", max_bucket
            )
        df_keys = pd.MultiIndex.from_frame(df[["band", "band_hash"]])
        idx_keys = pd.MultiIndex.from_frame(idx[["band", "band_hash"]])
        merged = pd.merge(
            idx[~idx_keys.isin(bad)].rename(columns={id_column: "id_a"}),
            df[~df_keys.isin(bad)].rename(columns={id_column: "id_b"}),
            on=["band", "band_hash"],
        )
        # a doc can appear on both sides of the split only by caller
        # error; self-pairs are still excluded for safety
        merged = merged[merged["id_a"] != merged["id_b"]]
        return merged[["id_a", "id_b"]]

    pairs = (
        inc_bands.groupby("part")
        .map_groups(probe_part, batch_format="pandas")
        .map_batches(  # pandas may widen dtypes; restore the input's
            lambda t: pa.table({"id_a": pc.cast(t["id_a"], id_type),
                                "id_b": pc.cast(t["id_b"], id_type)}),
            batch_format="pyarrow",
        )
        .groupby(["id_a", "id_b"]).count().drop_columns(["count()"])
        .materialize()
    )

    # ----- verification: pruned corpus payload reads + in-stream increment
    corpus_ids: set = set()
    for b in pairs.iter_batches(batch_format="pyarrow"):
        corpus_ids.update(b["id_a"].to_pylist())
    empty_out = rd.from_arrow(pa.table({
        "new_id": pa.array([], type=id_type),
        "dup_of": pa.array([], type=id_type),
        "jaccard": pa.array([], type=pa.float64()),
    }))
    if not corpus_ids:
        return empty_out
    sparts = sorted(set(_stable_part(sorted(corpus_ids), num_parts).tolist()))
    doc_files = [
        f
        for h in sparts
        for f in sorted(
            glob.glob(os.path.join(index_dir, "docs", f"spart={h}", "*.parquet"))
        )
    ]
    corpus_payload = rd.read_parquet(doc_files, columns=[id_column, "shingles"])
    items = corpus_payload.union(inc_rows.select_columns([id_column, "shingles"]))

    from .pairs import attach_pair_payload

    attached = attach_pair_payload(pairs, items, id_column, "shingles")
    return (
        attached.map_batches(
            lambda b: _score_attached_jaccard(b, id_type, min_jaccard),
            batch_format="pyarrow",
        )
        .rename_columns({"id_a": "dup_of", "id_b": "new_id"})
        .select_columns(["new_id", "dup_of", "jaccard"])
    )


def extend_minhash_index(
    shard: rd.Dataset,
    index_dir: str,
    concurrency=None,
) -> None:
    """Append a shard's documents into an existing index
    (``build_minhash_index``) — the write half of the incremental
    lifecycle: dedup an arriving shard against the index, then extend
    the index with its survivors so the NEXT shard sees them too.

    Appends are new parquet files inside the existing hive partitions
    (never rewrites); parameters come from the stored sidecar so the
    shard is hashed exactly like the corpus. Caller owns id uniqueness
    across shards (duplicate ids would self-pair on later lookups)."""
    import json
    import os

    with open(os.path.join(index_dir, "params.json")) as f:
        params = json.load(f)
    num_parts = params["num_parts"]
    id_column = params["id_column"]

    rows = shard.map_batches(
        MinHashIndexRows,
        fn_constructor_kwargs={
            "num_perm": params["num_perm"], "shingle_k": params["shingle_k"],
            "column": params["column"], "id_column": id_column,
            "seed": params.get("seed", 42),
        },
        batch_format="pyarrow",
        concurrency=concurrency or pinned_pool(8),
    ).materialize()  # feeds both partitioned appends below

    # sorted-by-partition-column writes for the same file-count reason
    # as build_minhash_index (appends must not re-fragment the index)
    rows.map_batches(
        lambda b: _add_spart(b, id_column, num_parts), batch_format="pyarrow"
    ).sort("spart").write_parquet(
        os.path.join(index_dir, "docs"), partition_cols=["spart"]
    )
    rows.map_batches(
        lambda b: _bands_with_part(b, params["num_bands"], num_parts, id_column),
        batch_format="pyarrow",
    ).sort("part").write_parquet(
        os.path.join(index_dir, "bands"), partition_cols=["part"]
    )


# ------------------------------------------ duplicated substrings -----


def _gram_position_rows(
    batch: pa.Table, k: int, id_column: str, column: str
) -> pa.Table:
    """[id, text] batch → one row per k-token window: (gram_hash, id,
    pos). Window hashes come from the shared vectorized rolling kernel
    (``batch_shingle_hashes``: one polars hash over the batch's tokens +
    an order-sensitive polynomial per window) — no gram strings are ever
    built. The hash is only the duplicate-detection KEY, never
    oracle-visible (the oracle groups by gram STRING), so any
    collision-negligible 64-bit hash gives identical spans; the first
    version md5-hashed each distinct space-joined gram and that loop
    dominated the map stage."""
    per_doc = batch_shingle_hashes(
        batch[column].to_pylist(), _TOKEN_RE, k,
        whole_doc_if_short=False,  # a doc can't contain a window longer
    )                              # than itself — <k-token docs emit none
    counts = np.array([len(w) for w in per_doc], dtype=np.int64)
    ids = batch[id_column].combine_chunks()
    if counts.sum():
        hashes = np.concatenate([w for w in per_doc if len(w)]).view(np.int64)
        id_idx = np.repeat(np.arange(len(counts)), counts)
        pos = np.concatenate([np.arange(c) for c in counts if c])
        id_col = ids.take(pa.array(id_idx))
    else:
        hashes = np.empty(0, dtype=np.int64)
        pos = np.empty(0, dtype=np.int64)
        id_col = ids[:0]
    return pa.table(
        {
            "gram_hash": pa.array(hashes),
            id_column: id_col,
            "pos": pa.array(pos, type=pa.int64()),
        }
    )


def duplicate_spans(
    ds: rd.Dataset,
    k: int = 8,
    id_column: str = "doc_id",
    column: str = "text",
) -> rd.Dataset:
    """Exact duplicated-substring detection (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" target,
    re-shaped for Ray Data): every maximal token span of length >= ``k``
    whose every k-token window occurs at least twice in the CORPUS
    (across documents or within one) is returned as (id, span_start,
    span_end) — token positions, end exclusive. Downstream curation cuts
    these spans instead of dropping whole documents.

    Distributed shape (suffix arrays don't partition; k-window hashing
    does): one linear map emits (gram_hash, id, pos) rows; per-batch
    partial counts -> ONE hash-keyed count finds duplicated grams
    (payload never moves); a bucketed semi-join keeps only duplicated
    windows; one id-keyed shuffle merges adjacent positions into maximal
    spans with a vectorized boundary scan (the `expand_bucketed_pairs`
    island shape — no per-document Python).
    """
    from ..functions.partitioning import shuffle_partitions
    from .relational import semi_join

    id_type = arrow_types(ds)[id_column]
    rows = ds.map_batches(
        lambda b: _gram_position_rows(b, k, id_column, column),
        batch_format="pyarrow",
    ).materialize()  # feeds the count AND the semi-join probe

    partials = rows.map_batches(
        lambda b: (
            b.group_by("gram_hash").aggregate([("pos", "count")])
            .rename_columns(["gram_hash", "n"])
        ),
        batch_format="pyarrow",
    )
    dup_hashes = (
        partials.groupby("gram_hash").sum("n")
        .map_batches(
            lambda b: b.filter(
                pc.greater_equal(b["sum(n)"], 2)
            ).select(["gram_hash"]),
            batch_format="pyarrow",
        )
    )
    dup_rows = semi_join(rows, dup_hashes, "gram_hash", "gram_hash")

    n_buckets = shuffle_partitions(16, ds)

    def bucketize(batch: pa.Table) -> pa.Table:
        h = np.asarray(batch["__idh"].combine_chunks(), dtype=np.int64)
        return batch.append_column(
            "__bucket",
            pa.array((h.view(np.uint64) % np.uint64(n_buckets)).astype(np.int32)),
        )

    def add_idh(batch: pa.Table) -> pa.Table:
        # one hash per DISTINCT id, gathered back — dup_rows has one row
        # per duplicated window, so a boilerplate-heavy doc repeats its
        # id thousands of times; the key never leaves the pipeline but
        # stays md5-stable for layout determinism
        ids = np.array(batch[id_column].to_pylist(), dtype=object)
        if len(ids):
            uniq, inverse = np.unique(ids, return_inverse=True)
            idh = _stable_part(uniq.tolist(), 1 << 62)[inverse]
        else:
            idh = np.empty(0, dtype=np.int64)
        return batch.append_column("__idh", pa.array(idh))

    def merge_islands(df):
        import pandas as pd

        if len(df) == 0:
            return pd.DataFrame(
                {id_column: df[id_column][:0],
                 "span_start": np.array([], dtype=np.int64),
                 "span_end": np.array([], dtype=np.int64)}
            )
        df = df.sort_values([id_column, "pos"], kind="mergesort")
        ids = df[id_column].to_numpy()
        pos = df["pos"].to_numpy()
        boundary = np.ones(len(df), dtype=bool)
        boundary[1:] = (ids[1:] != ids[:-1]) | (pos[1:] != pos[:-1] + 1)
        island = np.cumsum(boundary) - 1
        starts = pos[boundary]
        ends = np.zeros(island[-1] + 1, dtype=np.int64)
        np.maximum.at(ends, island, pos)
        return pd.DataFrame(
            {
                id_column: ids[boundary],
                "span_start": starts,
                "span_end": ends + k,
            }
        )

    spans = (
        dup_rows.map_batches(add_idh, batch_format="pyarrow")
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(merge_islands, batch_format="pandas")
    )
    return spans.map_batches(
        lambda t: pa.table(
            {
                id_column: pc.cast(t[id_column], id_type),
                "span_start": pc.cast(t["span_start"], pa.int64()),
                "span_end": pc.cast(t["span_end"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def cut_spans(
    docs: rd.Dataset,
    spans: rd.Dataset,
    id_column: str = "doc_id",
    column: str = "text",
) -> rd.Dataset:
    """Remove token spans from documents — the cutting half of the
    Lee et al. 2022 dedup (``duplicate_spans`` finds, this removes):
    returns (id, clean_text) where ``clean_text`` is the document's
    NORMALIZED token sequence (the dedup pipeline's token space,
    lowercased, space-joined) minus every token position covered by a
    span. Documents left with zero tokens are dropped.

    Shape: both sides bucket on a stable id hash and meet in ONE keyed
    shuffle; each bucket cuts its documents with a per-doc boolean mask
    over token positions — span lists are grouped per doc inside the
    bucket, so no driver-side state and no broadcast (the span set is
    proportional to duplicated content, which at 100 TB can be huge).
    """
    from ..functions.partitioning import shuffle_partitions

    id_type = arrow_types(docs)[id_column]
    n_buckets = shuffle_partitions(16, docs)

    def doc_rows(batch: pa.Table) -> pa.Table:
        b = batch.select([id_column, column])
        bucket = _stable_part(b[id_column].to_pylist(), n_buckets)
        return pa.table({
            id_column: b[id_column],
            column: b[column],
            "span_start": pa.array([None] * b.num_rows, type=pa.int64()),
            "span_end": pa.array([None] * b.num_rows, type=pa.int64()),
            "__bucket": pa.array(bucket.astype(np.int32)),
        })

    def span_rows(batch: pa.Table) -> pa.Table:
        bucket = _stable_part(batch[id_column].to_pylist(), n_buckets)
        return pa.table({
            id_column: batch[id_column],
            column: pa.array([None] * batch.num_rows, type=pa.string()),
            "span_start": pc.cast(batch["span_start"], pa.int64()),
            "span_end": pc.cast(batch["span_end"], pa.int64()),
            "__bucket": pa.array(bucket.astype(np.int32)),
        })

    both = docs.map_batches(doc_rows, batch_format="pyarrow").union(
        spans.map_batches(span_rows, batch_format="pyarrow")
    )

    def cut(df):
        import pandas as pd

        # discriminate sides on span_start (always set for span rows,
        # always NULL for doc rows) — text null-ness would misroute a
        # null-TEXT document onto the span side and crash on int(NaN)
        is_doc = df["span_start"].isnull()
        span_map: dict = {}
        for rid, s, e in zip(
            df.loc[~is_doc, id_column],
            df.loc[~is_doc, "span_start"],
            df.loc[~is_doc, "span_end"],
        ):
            span_map.setdefault(rid, []).append((int(s), int(e)))
        out_ids, out_texts = [], []
        for rid, text in zip(df.loc[is_doc, id_column], df.loc[is_doc, column]):
            toks = _TOKEN_RE.findall(text.lower()) if text else []
            if not toks:
                continue
            keep = np.ones(len(toks), dtype=bool)
            for s, e in span_map.get(rid, ()):
                keep[s:e] = False
            if not keep.any():
                continue
            out_ids.append(rid)
            out_texts.append(" ".join(t for t, k in zip(toks, keep) if k))
        return pd.DataFrame({id_column: out_ids, "clean_text": out_texts})

    return (
        both.groupby("__bucket")
        .map_groups(cut, batch_format="pandas")
        .map_batches(
            lambda t: pa.table({
                id_column: pc.cast(t[id_column], id_type),
                "clean_text": pc.cast(t["clean_text"], pa.string()),
            }),
            batch_format="pyarrow",
        )
    )


def select_survivors(
    labels: rd.Dataset,
    docs: rd.Dataset,
    id_column: str = "doc_id",
    column: str = "text",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Quality-aware survivor selection: one row per near-duplicate
    component — the HIGHEST-token-count member (ties: lowest id) plus
    the component size. The curation refinement over the blind min-id
    policy (``_min_id_survivors``): when a cluster holds a full document
    and its truncated scrapes, keep the fullest copy, not the one whose
    id happens to sort first.

    ``labels`` is ``connected_components`` output (``id_column``,
    ``component``); ``docs`` is the corpus. Scale shape: the corpus is
    pruned FIRST with the distributed semi-join (only near-dup members
    are ever scored — at 100 TB the cluster membership is a small
    fraction of the corpus), scoring is one vectorized
    ``token_count_batch`` pass, label⋈score and survivor⋈size run on
    the bucketed ``lookup_join`` (no broadcast, no empty-partition
    schema loss), and the per-component argmax is the two-phase
    ``top_n_per_group`` — the shuffle moves one candidate row per
    component per batch, never document text.

    Returns ``(component, id_column, n_tokens, n_docs)``.
    """
    from ..functions.partitioning import shuffle_partitions
    from .relational import lookup_join, semi_join
    from .sampling import top_n_per_group
    from .textstats import token_count_batch

    labels = labels.materialize()  # reused by 3 consumers; labels are small
    n = num_partitions or shuffle_partitions(8, docs)

    members = semi_join(
        docs.select_columns([id_column, column]), labels,
        id_column, id_column, num_partitions=n,
    )
    scores = members.map_batches(
        lambda b: token_count_batch(b, column=column).select(
            [id_column, "n_tokens"]),
        batch_format="pyarrow",
    )
    scored = lookup_join(
        labels, scores, id_column, id_column,
        payload=["n_tokens"], num_partitions=n,
    )
    top1 = top_n_per_group(
        scored, "component", "n_tokens", n=1, id_column=id_column,
    )
    sizes = labels.groupby("component").count().map_batches(
        lambda b: pa.table({
            "component": b["component"],
            "n_docs": pc.cast(b["count()"], pa.int64()),
        }),
        batch_format="pyarrow",
    )
    return lookup_join(
        top1, sizes, "component", "component",
        payload=["n_docs"], num_partitions=n,
    ).map_batches(
        lambda b: b.select(["component", id_column, "n_tokens", "n_docs"]),
        batch_format="pyarrow",
    )


def exact_drop_stats(
    ds: rd.Dataset,
    group_column: str = "source",
    id_column: str = "doc_id",
    column: str = "text",
) -> rd.Dataset:
    """Per-group exact-duplicate rate: for each ``group_column`` value,
    how many documents an exact dedup (min-id survivor per md5
    token-sequence fingerprint, the :func:`dedup_exact` policy) would
    drop, and the drop fraction — the "which source is mostly copies?"
    report a curation run reads before spending near-dup budget.

    Scale shape: fingerprints are one vectorized map pass; the ONLY
    all-to-all is one bucket-keyed shuffle (``hash(fingerprint) % P`` —
    every copy of a fingerprint lands in one bucket group, the
    ``exact_dropped_ids`` shape), in-bucket survivor marking is one
    pandas sort + boundary scan (no per-key Python calls), and the
    per-group partial counts leaving each bucket are ``groups × 1``
    rows, folded by a tiny final groupby.

    Returns ``(group_column, n_docs, n_dropped, drop_rate)``.
    """
    import pandas as pd

    from ..functions.hashing import hash_str_array
    from ..functions.partitioning import shuffle_partitions

    n_buckets = shuffle_partitions(8, ds)

    def fp_bucket(batch: pa.Table) -> pa.Table:
        b = fingerprint_batch(batch, column).select(
            [id_column, group_column, "fingerprint"])
        h = hash_str_array(b["fingerprint"].to_pylist())
        return b.append_column(
            "__bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int32)))

    def bucket_stats(df: "pd.DataFrame") -> "pd.DataFrame":
        if len(df) == 0:
            empty = np.array([], dtype="int64")
            return pd.DataFrame({group_column: df[group_column],
                                 "n_docs": empty, "n_dropped": empty})
        df = df.sort_values(["fingerprint", id_column], kind="mergesort")
        f = df["fingerprint"].to_numpy()
        first = np.ones(len(df), dtype=bool)
        first[1:] = f[1:] != f[:-1]
        agg = (
            df.assign(__dropped=~first)
            # dropna=False: a null group value is a real group (SQL
            # GROUP BY keeps it) — dropping it would undercount docs
            .groupby(group_column, sort=False, dropna=False)
            .agg(n_docs=("__dropped", "size"), n_dropped=("__dropped", "sum"))
            .reset_index()
        )
        agg["n_docs"] = agg["n_docs"].astype("int64")
        agg["n_dropped"] = agg["n_dropped"].astype("int64")
        return agg

    def finish(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch["sum(n_docs)"], pa.int64())
        d = pc.cast(batch["sum(n_dropped)"], pa.int64())
        return pa.table({
            group_column: batch[group_column],
            "n_docs": n,
            "n_dropped": d,
            "drop_rate": pc.divide(
                pc.cast(d, pa.float64()), pc.cast(n, pa.float64())),
        })

    return (
        ds.map_batches(fp_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_stats, batch_format="pandas")
        .groupby(group_column)
        .sum(["n_docs", "n_dropped"])
        .map_batches(finish, batch_format="pyarrow")
    )


# ------------------------------------------- edit-distance near-dup -----
#
# Levenshtein near-duplicates on a normalized text prefix, blocked by
# SYMMETRIC DELETION neighborhoods (the SymSpell scheme, public): if
# lev(a, b) <= k then an optimal alignment's matched subsequence c is
# reachable from BOTH a and b by <= k single-character deletions — so
# emitting every <=k-deletion variant of each key and matching variant
# EQUALITY is a complete blocking (no false negatives); false candidates
# are removed by an exact banded-DP verify on the pair set.
#
# Scale shape: variant generation is fully vectorized (strings of one
# length become a (n, L) uint32 codepoint matrix; deletion variants are
# precomputed keep-index gathers; hashing is one polynomial pass per
# variant width) and emits (variant_hash, id) rows — C(L,2)+L+1 rows
# per doc (301 at L=24), each 16 bytes, NOT the variant strings. One
# keyed shuffle groups candidates (the shared `expand_bucketed_pairs`
# capped-bucket expansion), then `attach_pair_payload` joins the two
# key strings onto each DISTINCT candidate pair for the exact verify —
# keys are shipped once per pair, never per variant.

_KEEP_IDX_CACHE: dict = {}


def _keep_indices(length: int, deletions: int) -> np.ndarray:
    """(m, length-deletions) matrix of positions KEPT after deleting
    ``deletions`` positions from a ``length``-char string."""
    key = (length, deletions)
    got = _KEEP_IDX_CACHE.get(key)
    if got is None:
        from itertools import combinations

        keep = length - deletions
        if keep == 0:
            got = np.zeros((1, 0), dtype=np.int64)  # the empty variant
        else:
            got = np.array(
                [c for c in combinations(range(length), keep)],
                dtype=np.int64,
            ).reshape(-1, keep)
        _KEEP_IDX_CACHE[key] = got
    return got


_POLY_B = np.uint64(1099511628211)  # FNV-1a prime, odd => mixes mod 2^64


def _poly_hash_rows(mat: np.ndarray) -> np.ndarray:
    """(n, w) uint64 codepoints → (n,) uint64 content hashes. Pure
    function of the row's VALUES AND WIDTH (width is mixed in last), so
    equal variant texts hash equal regardless of the source string."""
    h = np.zeros(mat.shape[0], dtype=np.uint64)
    for col in range(mat.shape[1]):
        h = h * _POLY_B + mat[:, col].astype(np.uint64)
    return h * _POLY_B + np.uint64(mat.shape[1] + 1)


def normalized_prefix(col, prefix: int):
    """lower → collapse [ \\t\\n\\r]+ runs to one space → strip spaces →
    first ``prefix`` codepoints. Mirrors the DuckDB oracle expression
    substr(trim(regexp_replace(lower(text), '[ \\t\\n\\r]+', ' ', 'g')), 1, P)
    exactly (both RE2; DuckDB trim strips ASCII spaces, which is all
    that survives the collapse)."""
    s = pc.utf8_lower(col)
    s = pc.replace_substring_regex(s, pattern="[ \\t\\n\\r]+", replacement=" ")
    s = pc.utf8_trim(s, characters=" ")
    return pc.utf8_slice_codeunits(s, 0, prefix)


def _variant_rows(batch: pa.Table, column: str, id_column: str,
                  k: int, prefix: int) -> pa.Table:
    """One (vh, id) row per <=k-deletion variant of each row's
    normalized prefix key. Empty keys emit nothing."""
    keys = normalized_prefix(batch[column], prefix).to_pylist()
    ids_np = np.asarray(batch[id_column].combine_chunks())
    # group rows by key length; each length-class is one vectorized gather
    by_len: dict[int, list[int]] = {}
    for i, s in enumerate(keys):
        if s:
            by_len.setdefault(len(s), []).append(i)
    out_h: list[np.ndarray] = []
    out_i: list[np.ndarray] = []
    # bound the materialized (rows, variants, width) gather tensor to
    # ~8M uint64 elements (64 MB): map_batches hands whole BLOCKS here,
    # and an unchunked 100k-row block at prefix 24 / k=2 would build a
    # ~5 GB tensor
    _CHUNK_ELEMS = 8_000_000
    for length, rows in by_len.items():
        mat = np.frombuffer(
            "".join(keys[i] for i in rows).encode("utf-32-le"),
            dtype=np.uint32,
        ).reshape(len(rows), length).astype(np.uint64)
        row_ids = ids_np[rows]
        for j in range(min(k, length) + 1):
            keep = _keep_indices(length, j)          # (m, length-j)
            if keep.shape[1] == 0:                   # the empty variant
                h = _poly_hash_rows(mat[:, :0])
                out_h.append(h)
                out_i.append(row_ids)
                continue
            per_row = keep.shape[0] * keep.shape[1]
            step = max(1, _CHUNK_ELEMS // per_row)
            for s in range(0, mat.shape[0], step):
                var = mat[s:s + step, keep]          # (chunk, m, len-j)
                h = _poly_hash_rows(
                    var.reshape(-1, keep.shape[1]))  # (chunk*m,)
                out_h.append(h)
                out_i.append(np.repeat(row_ids[s:s + step], keep.shape[0]))
    if not out_h:
        return pa.table({
            "vh": pa.array([], type=pa.int64()),
            id_column: batch[id_column].slice(0, 0),
        })
    h = np.concatenate(out_h)
    ids = np.concatenate(out_i)
    # deleting either of two EQUAL characters yields the same variant
    # text — dedupe (id, vh) here (each doc's variants are all in this
    # batch) or the same doc lands twice in one bucket and the pair
    # expansion emits a bogus self-pair; also shrinks the shuffle
    order = np.lexsort((h, ids))
    h, ids = h[order], ids[order]
    keep = np.ones(len(h), dtype=bool)
    keep[1:] = (h[1:] != h[:-1]) | (ids[1:] != ids[:-1])
    return pa.table({
        "vh": pa.array(h[keep].view(np.int64)),
        id_column: pa.array(ids[keep]),
    })


def _lev_banded(a: str, b: str, k: int) -> int:
    """Levenshtein distance if <= k else k+1 (banded DP, O(len·k))."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return k + 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        lo, hi = max(1, i - k), min(lb, i + k)
        cur = [k + 1] * (lb + 1)
        cur[0] = i
        ca = a[i - 1]
        for j in range(lo, hi + 1):
            cost = 0 if ca == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        if min(cur[lo:hi + 1]) > k:
            return k + 1
        prev = cur
    return prev[lb] if prev[lb] <= k else k + 1


def edit_distance_pairs(
    ds: rd.Dataset,
    k: int = 2,
    prefix: int = 24,
    column: str = "text",
    id_column: str = "doc_id",
    max_bucket: int = 64,
) -> rd.Dataset:
    """All pairs whose normalized ``prefix``-char keys are within
    Levenshtein distance ``k``: (id_a, id_b, dist), id_a < id_b.

    Complete by the deletion-neighborhood pigeonhole above, EXCEPT
    buckets over ``max_bucket`` (dropped with a warning, like every LSH
    family member here — at web scale the near-empty-key buckets
    degenerate and exact-dup clusters should be collapsed by
    ``dedup_exact`` first). Distance is codepoint-level; the DuckDB
    ``levenshtein`` oracle is byte-level, identical on ASCII corpora
    (the test tables are ASCII-only)."""
    from ..functions.partitioning import shuffle_partitions

    from .pairs import attach_pair_payload

    id_type = arrow_types(ds)[id_column]
    slim = ds.select_columns([id_column, column])
    bands = slim.map_batches(
        lambda b: _variant_rows(b, column, id_column, k, prefix),
        batch_format="pyarrow",
    )
    cands = expand_bucketed_pairs(
        bands, ["vh"], id_column, id_type,
        max_bucket, shuffle_partitions(16, ds),
    )

    def build_keys(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_column: batch[id_column],
            "key": normalized_prefix(batch[column], prefix),
        })

    attached = attach_pair_payload(
        cands, slim, id_column, "key",
        raw_columns=[column], payload_builder=build_keys,
    )

    def verify(batch: pa.Table) -> pa.Table:
        ka = batch["payload_a"].to_pylist()
        kb = batch["payload_b"].to_pylist()
        dist = np.fromiter(
            (_lev_banded(x or "", y or "", k) for x, y in zip(ka, kb)),
            dtype=np.int64, count=len(ka),
        )
        # id_a != id_b is structural (variants are deduped per doc);
        # keep the guard so a future generator can't smuggle self-pairs
        keep = (dist <= k) & (
            np.asarray(batch["id_a"].combine_chunks())
            != np.asarray(batch["id_b"].combine_chunks()))
        return pa.table({
            "id_a": pc.cast(batch["id_a"].filter(pa.array(keep)), id_type),
            "id_b": pc.cast(batch["id_b"].filter(pa.array(keep)), id_type),
            "dist": pa.array(dist[keep]),
        })

    return attached.map_batches(verify, batch_format="pyarrow")


def edit_dup_dropped_ids(
    docs: rd.Dataset,
    id_column: str = "doc_id",
    column: str = "text",
    k: int = 2,
    prefix: int = 24,
    max_bucket: int = 64,
) -> rd.Dataset:
    """Edit-distance near-dup DROP-list: ``edit_distance_pairs``
    candidates (already exact-verified by the banded DP) under the same
    keep-min survivor policy as ``near_dup_dropped_ids`` — pairs come
    sorted ``id_a < id_b``, so the distinct ``id_b`` set keeps the
    smallest id of each chain. Output column is always ``doc_id``."""
    # materialize once: the variant-band scan and the payload join are
    # two independent consumers of the doc stream, and Ray re-executes
    # derived lineage per consumer (the hazard near_dup_dropped_ids
    # documents) — without this the staged read + text join runs twice
    docs = docs.materialize()
    pairs = edit_distance_pairs(
        docs, k=k, prefix=prefix, column=column, id_column=id_column,
        max_bucket=max_bucket,
    )
    return (
        pairs.groupby("id_b").count()
        .drop_columns(["count()"])
        .rename_columns({"id_b": "doc_id"})
    )


def content_defined_chunks(
    ds: rd.Dataset,
    id_column: str = "doc_id",
    column: str = "text",
    mask_mod: int = 64,
) -> rd.Dataset:
    """Content-defined chunking at token granularity: a chunk boundary
    falls AFTER any token whose md5 32-bit prefix is ``0 (mod
    mask_mod)`` — the LBFS/Rabin content-defined rule (Muthitacharoen
    et al. 2001, public method), expected chunk length ``mask_mod``
    tokens. Unlike ``chunk_dedup``'s fixed windows, an edit near a
    document's head shifts every downstream FIXED window but leaves CDC
    boundaries untouched outside the edited chunk — the property that
    keeps chunk-level dedup effective on lightly-edited boilerplate.

    Returns ``(doc_id, chunk_idx, n_tokens, chunk_hash)``; chunk_hash =
    md5 hex of the space-joined lowered tokens (the ``chunk_dedup``
    convention, DuckDB-reproducible). One map pass, NO shuffle; the
    boundary hash is computed once per DISTINCT token per batch, one
    md5 per emitted chunk. Feed the output to a ``groupby(chunk_hash)``
    (as ``chunk_dedup`` does) for corpus-wide duplicate-chunk tables.
    """
    import hashlib

    def chunks(batch: pa.Table) -> pa.Table:
        bcache: dict[str, bool] = {}
        out_id, out_ci, out_n, out_h = [], [], [], []
        for doc_id, text in zip(batch[id_column].to_pylist(),
                                batch[column].to_pylist()):
            if doc_id is None:
                continue
            toks = _TOKEN_RE.findall(text.lower()) if text else []
            ci, start = 0, 0
            for i, t in enumerate(toks):
                b = bcache.get(t)
                if b is None:
                    b = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) \
                        % mask_mod == 0
                    bcache[t] = b
                if b:
                    chunk = " ".join(toks[start:i + 1])
                    out_id.append(doc_id)
                    out_ci.append(ci)
                    out_n.append(i + 1 - start)
                    out_h.append(hashlib.md5(chunk.encode()).hexdigest())
                    ci, start = ci + 1, i + 1
            if start < len(toks):
                chunk = " ".join(toks[start:])
                out_id.append(doc_id)
                out_ci.append(ci)
                out_n.append(len(toks) - start)
                out_h.append(hashlib.md5(chunk.encode()).hexdigest())
        return pa.table({
            id_column: pa.array(out_id, type=batch[id_column].type),
            "chunk_idx": pa.array(out_ci, type=pa.int64()),
            "n_tokens": pa.array(out_n, type=pa.int64()),
            "chunk_hash": pa.array(out_h, type=pa.string()),
        })

    return ds.map_batches(chunks, batch_format="pyarrow")
