"""Deterministic 64-bit hashing of tokens, shingles and urls.

The reference assigns record identity via a mutex-guarded global counter
(``FileMapper``, /root/reference/vptree/vptree.go:16-36). That cannot exist on
a cluster; instead identity is a coordination-free deterministic hash of the
record key (url). All hashes here are stable across processes and runs —
Python's builtin ``hash()`` is salted per process and is never used.
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = ["hash_token", "hash_tokens", "shingle_hashes", "hash_urls", "hash_url"]

# Odd multipliers (splitmix64 constants) for positional mixing of the k token
# hashes inside one shingle — vectorizable, no string concat per shingle.
_MIX = np.array(
    [0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB,
     0xD6E8FEB86659FD93, 0xA5A5A5A5A5A5A5A5, 0xC2B2AE3D27D4EB4F,
     0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)


def hash_token(token: str) -> int:
    """Stable 64-bit hash of one token (blake2b/8)."""
    return int.from_bytes(hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "little")


def hash_tokens(tokens: list[str], cache: dict[str, int] | None = None) -> np.ndarray:
    """Stable uint64 hash per token. ``cache`` memoizes across calls — pass a
    per-actor dict so a Zipfian vocabulary amortizes to near-zero hashing cost
    (stateful-actor pattern; the reference's analog is per-worker loop state,
    /root/reference/dedupe.go:52-65)."""
    if cache is None:
        return np.fromiter((hash_token(t) for t in tokens), dtype=np.uint64, count=len(tokens))
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = cache.get(t)
        if h is None:
            h = hash_token(t)
            cache[t] = h
        out[i] = h
    return out


def shingle_hashes(token_hashes: np.ndarray, k: int) -> np.ndarray:
    """uint64 hash of each k-token shingle, vectorized.

    Combines k consecutive token hashes with position-dependent odd
    multipliers plus a finalizing mix. A document with fewer than k tokens
    yields a single shingle over what it has (so empty/short docs still get
    a signature — the analog of the reference hashing degenerate images
    rather than erroring, /root/reference/utils/resize.go:379-382).
    """
    n = len(token_hashes)
    if n == 0:
        return np.array([0xE220A8397B1DCDAF], dtype=np.uint64)  # canonical empty-doc shingle
    if n < k:
        k = n
    with np.errstate(over="ignore"):
        acc = np.zeros(n - k + 1, dtype=np.uint64)
        for j in range(k):
            acc = (acc + token_hashes[j : n - k + 1 + j] * _MIX[j % len(_MIX)])
        # splitmix64 finalizer
        acc ^= acc >> np.uint64(30)
        acc *= np.uint64(0xBF58476D1CE4E5B9)
        acc ^= acc >> np.uint64(27)
        acc *= np.uint64(0x94D049BB133111EB)
        acc ^= acc >> np.uint64(31)
    return acc


def shingle_hashes_flat(
    flat_hashes: np.ndarray, lens: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Batch-vectorized ``shingle_hashes``: one call for a whole batch.

    ``flat_hashes`` concatenates every document's token hashes; ``lens`` is
    the token count per document. Returns (flat_shingles, offsets) where
    ``offsets`` (len n_docs+1) delimits each document's shingles. Produces
    EXACTLY the same values as per-doc ``shingle_hashes`` (tests enforce it);
    docs shorter than ``k`` (including empty) fall back to the per-doc path —
    a loop over only those docs.
    """
    n_docs = len(lens)
    lens = np.asarray(lens, dtype=np.int64)
    counts = np.where(lens >= k, lens - k + 1, 1)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    out = np.empty(offsets[-1], dtype=np.uint64)

    T = len(flat_hashes)
    if T and k <= T:
        # global sliding accumulate over the flat array; a window starting at
        # position i is a real shingle iff it doesn't cross a doc boundary
        with np.errstate(over="ignore"):
            acc = np.zeros(T - k + 1, dtype=np.uint64)
            for j in range(k):
                acc = acc + flat_hashes[j : T - k + 1 + j] * _MIX[j % len(_MIX)]
            acc ^= acc >> np.uint64(30)
            acc *= np.uint64(0xBF58476D1CE4E5B9)
            acc ^= acc >> np.uint64(27)
            acc *= np.uint64(0x94D049BB133111EB)
            acc ^= acc >> np.uint64(31)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        valid = doc_idx[: T - k + 1] == doc_idx[k - 1 :]
        # valid windows appear in doc order, so they map 1:1 onto the output
        # slots of the long (len >= k) docs
        long_slots = np.repeat(lens >= k, counts)
        out[long_slots] = acc[valid]
    # short + empty docs: per-doc fallback (rare)
    tok_offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=tok_offsets[1:])
    for d in np.flatnonzero(lens < k):
        sh = shingle_hashes(flat_hashes[tok_offsets[d] : tok_offsets[d + 1]], k)
        out[offsets[d] : offsets[d + 1]] = sh
    return out, offsets


def hash_url(url: str) -> int:
    """Deterministic int64 (non-negative) doc id from a url.

    64-bit blake2b truncated to 63 bits so ids fit Arrow int64. At the
    10^12-doc design point a 63-bit space gives a ~3e-8 per-pair collision
    probability (~tens of spurious merges corpus-wide); callers needing zero
    collisions can switch to the 128-bit variant (two columns) — documented
    trade-off, SURVEY.md §1.3.
    """
    v = int.from_bytes(hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest(), "little")
    return v & 0x7FFFFFFFFFFFFFFF


def hash_urls(urls) -> np.ndarray:
    """Vectorized-at-API-level id minting for a batch of urls → int64."""
    return np.fromiter((hash_url(u) for u in urls), dtype=np.int64, count=len(urls))
