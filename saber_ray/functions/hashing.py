"""Deterministic hashing kernels: span-invariant hashes, fingerprints,
MinHash and SimHash signatures.

Everything here must be stable across processes and Python versions (no
``hash()``), because hashes cross task boundaries inside Ray pipelines and
land in checkpoint manifests.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE = (1 << 61) - 1
_MAX_H = np.uint64((1 << 32) - 1)


def stable_u64(data: bytes | str) -> int:
    """First 8 bytes of blake2b as unsigned int — stable across processes."""
    if isinstance(data, str):
        data = data.encode("utf-8", "surrogatepass")
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big")


def stable_u64_md5(data: bytes | str) -> int:
    """First 8 bytes of md5 as unsigned int (big-endian).

    md5 (not blake2b) so a DuckDB oracle can reproduce it exactly:
    ``('0x' || substr(md5(tok), 1, 16))::UBIGINT`` — used by SimHash so
    the hamming-distance oracle is SQL-checkable end to end.
    """
    if isinstance(data, str):
        data = data.encode("utf-8", "surrogatepass")
    return int.from_bytes(hashlib.md5(data).digest()[:8], "big")


def stable_hex(data: bytes | str, size: int = 16) -> str:
    if isinstance(data, str):
        data = data.encode("utf-8", "surrogatepass")
    return hashlib.blake2b(data, digest_size=size).hexdigest()


def span_sequence_hash(kinds, texts, media_refs) -> str:
    """Hash of one document's span sequence ``(kind, text, media_ref, order)``.

    This is the per-row invariant the north rule requires: it is computed on
    the input and re-asserted at every stage boundary, proving the pipeline
    annotates documents without rewriting them.
    """
    h = hashlib.blake2b(digest_size=16)
    for i, (k, t, m) in enumerate(zip(kinds, texts, media_refs)):
        h.update(str(i).encode())
        h.update(b"\x1f")
        h.update((k or "").encode("utf-8", "surrogatepass"))
        h.update(b"\x1f")
        h.update((t or "").encode("utf-8", "surrogatepass"))
        h.update(b"\x1f")
        h.update((m or "").encode("utf-8", "surrogatepass"))
        h.update(b"\x1e")
    return h.hexdigest()


def rolling_fingerprint(tokens: list[str], base: int = 1_000_003) -> int:
    """Order-sensitive polynomial rolling hash of a token sequence.

    Document fingerprint: equal token sequences → equal fingerprint;
    cheap to compute incrementally at 100 TB scale.
    """
    acc = 0
    for tok in tokens:
        acc = (acc * base + stable_u64(tok)) % _MERSENNE
    return acc


# odd multiplier for multiply-shift hashing (golden-ratio constant)
_MULT = np.uint64(0x9E3779B97F4A7C15)


def make_minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Per-permutation 64-bit xor keys (and a second key vector kept for
    API symmetry) for xor → multiply-shift permutations.

    ``h_i(x) = ((x ^ k_i) * MULT) mod 2^64`` — the uint64 wraparound IS
    the modulus, so the family is exact in numpy (an affine (a·x+b) mod p
    family silently overflows uint64 for 61-bit coefficients, and
    restricting coefficients to 32 bits measurably biases the Jaccard
    estimate).
    """
    rng = np.random.RandomState(seed)
    k1 = rng.randint(0, 1 << 63, size=num_perm, dtype=np.uint64) << np.uint64(1)
    k1 |= rng.randint(0, 2, size=num_perm, dtype=np.uint64)
    k2 = rng.randint(0, 1 << 63, size=num_perm, dtype=np.uint64)
    return k1, k2


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) from uint64 shingle hashes.

    xor → multiply-shift permutation per row (MinHash construction,
    Broder 1997, with a numpy-exact hash family — see
    ``make_minhash_params``), min over shingles. Empty input → all-max
    signature (matches nothing). ``b`` is accepted for API symmetry and
    used as a second xor key.
    """
    num_perm = len(a)
    if len(shingle_hashes) == 0:
        return np.full(num_perm, _MAX_H, dtype=np.uint64)
    x = shingle_hashes.astype(np.uint64)
    # [num_perm, n] — fine for per-document shingle counts
    with np.errstate(over="ignore"):
        vals = ((x[None, :] ^ a[:, None]) * _MULT) ^ b[:, None]
    return (vals.min(axis=1) & _MAX_H).astype(np.uint64)


_FNV_PRIME = np.uint64(1099511628211)


def hash_str_array(values, seed: int = 0) -> np.ndarray:
    """Vectorized uint64 hash of a string sequence (polars' Rust-side
    row hash — one call per batch instead of one hashlib call per
    value). polars is a baked-in dependency; there is deliberately NO
    silent fallback (two tasks hashing the same key differently is a
    correctness bug, see functions/bloom.py). Stable within a job: every
    worker runs the same polars build."""
    import polars as pl

    if not len(values):
        return np.empty(0, dtype=np.uint64)
    return pl.Series(values).hash(seed=seed).to_numpy().astype(np.uint64)


def rolling_shingle_hashes(
    token_hashes: np.ndarray, k: int, whole_doc_if_short: bool = False
) -> np.ndarray:
    """uint64 hash of every k-token window, vectorized: an order-
    sensitive polynomial over the per-token hashes (k shifted
    multiply-adds over the whole array — O(k·n) numpy ops, no per-
    shingle string building or hashlib calls; this was the dominant map
    cost of the dedup family at corpus scale).

    Documents shorter than ``k`` yield ONE hash over all tokens when
    ``whole_doc_if_short`` (MinHash semantics — a short doc still has a
    signature) and NO hashes otherwise (decontamination semantics — a
    doc can't contain an n-gram longer than itself). Empty input →
    empty output either way.
    """
    th = np.asarray(token_hashes, dtype=np.uint64)
    n = len(th)
    if n == 0:
        return th[:0]
    if n < k:
        if not whole_doc_if_short:
            return th[:0]
        k = n
    m = n - k + 1
    acc = np.zeros(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            acc = acc * _FNV_PRIME + th[j : j + m]
    return acc


def batch_shingle_hashes(
    texts, token_re, k: int, whole_doc_if_short: bool = False
) -> list[np.ndarray]:
    """Per-document k-shingle hash arrays for a batch of texts: tokenize
    each text (C-level regex findall), hash ALL tokens of the batch in
    ONE vectorized call, then roll each document's window hashes in
    numpy. The one shingle/hash recipe shared by MinHash signatures,
    Jaccard verification and decontamination — divergence between a
    builder and a membership test would silently stop them matching."""
    toks_per_doc = [token_re.findall(t.lower()) if t else [] for t in texts]
    flat: list[str] = []
    for toks in toks_per_doc:
        flat.extend(toks)
    th = hash_str_array(flat)
    out, pos = [], 0
    for toks in toks_per_doc:
        h = th[pos : pos + len(toks)]
        pos += len(toks)
        out.append(rolling_shingle_hashes(h, k, whole_doc_if_short))
    return out


def simhash64(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash (Charikar 2002) over uint64 token hashes."""
    if len(token_hashes) == 0:
        return 0
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int64
    )
    if weights is None:
        weights = np.ones(len(token_hashes), dtype=np.int64)
    votes = ((bits * 2 - 1) * weights[:, None]).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def simhash64_many(token_hashes: np.ndarray, doc_lengths: np.ndarray) -> np.ndarray:
    """Batched ``simhash64``: one ``[N_tokens, 64]`` ±1 bit-vote matrix
    and one ``np.add.reduceat`` segment-sum for a whole batch of
    documents, instead of a Python-level ``simhash64`` call per
    document.

    ``token_hashes`` concatenates every document's uint64 token hashes
    in document order; ``doc_lengths[i]`` is document i's token count.
    Returns one uint64 signature per document; empty documents get 0
    (matching ``simhash64``'s empty-input return — callers null them
    out). Bit-for-bit identical to mapping ``simhash64`` over the
    per-document slices (asserted in tests)."""
    doc_lengths = np.asarray(doc_lengths, dtype=np.int64)
    out = np.zeros(len(doc_lengths), dtype=np.uint64)
    valid = doc_lengths > 0
    if not valid.any():
        return out
    # [N, 64] 0/1 uint8 bit matrix (8× less memory traffic than the
    # naive ±1 int64 expansion — measured 1.44 s → 0.1 s per 100k
    # tokens): astype('<u8') pins little-endian byte order so column j
    # is bit j of the hash, then one segment-sum of ones per document.
    bits = np.unpackbits(
        token_hashes.astype("<u8").view(np.uint8).reshape(-1, 8),
        axis=1, bitorder="little",
    )
    # reduceat segment starts: only non-empty documents (an empty
    # segment would alias the next document's first row, not sum to 0)
    offsets = np.concatenate(([0], np.cumsum(doc_lengths)[:-1]))
    ones = np.add.reduceat(bits, offsets[valid], axis=0, dtype=np.int64)
    # ±1 vote sum = 2*ones - n; bit set iff the sum is strictly > 0
    votes = 2 * ones > doc_lengths[valid, None]
    packed = (
        votes.astype(np.uint64) << np.arange(64, dtype=np.uint64)
    ).sum(axis=1, dtype=np.uint64)
    out[valid] = packed
    return out


def hamming64(x: int, y: int) -> int:
    return bin(x ^ y).count("1")

def md5_key32(value, salt: str = "") -> int:
    """md5-based uniform key in [0, 2^32): the ONE deterministic-sampling
    / bucketing key recipe (DuckDB replica:
    ``CAST('0x' || substring(md5(salt || CAST(v AS VARCHAR)), 1, 8) AS BIGINT)``)
    shared by stages/sampling.py and stages/packing.py."""
    import hashlib as _hashlib

    return int(_hashlib.md5((salt + str(value)).encode("utf-8")).hexdigest()[:8], 16)
