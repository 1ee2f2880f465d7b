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


def make_minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) coefficient vectors for num_perm universal-hash permutations.

    Coefficients are 32-bit and inputs are masked to 32 bits so
    ``a * x + b`` < 2^64 exactly — no silent uint64 wraparound, the
    universal-hash guarantee actually holds for the computed family.
    """
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 32, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, 1 << 32, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) from uint64 shingle hashes.

    ``(a * x + b) mod p`` universal hashing, min over shingles, per
    permutation — the standard MinHash construction (Broder 1997).
    Empty input → all-max signature (matches nothing).
    """
    num_perm = len(a)
    if len(shingle_hashes) == 0:
        return np.full(num_perm, _MAX_H, dtype=np.uint64)
    # mask inputs to 32 bits: with 32-bit (a, b) the affine transform
    # stays < 2^64, so the mod-p result is exact (no uint64 wraparound)
    x = shingle_hashes.astype(np.uint64) & _MAX_H
    # [num_perm, n] — fine for per-document shingle counts
    vals = (np.outer(a, x) + b[:, None]) % _MERSENNE
    return (vals.min(axis=1) & _MAX_H).astype(np.uint64)


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


def hamming64(x: int, y: int) -> int:
    return bin(x ^ y).count("1")
