"""64-bit SimHash over token shingles — vectorized.

The analog of the reference's single-hash DCT path
(/root/reference/hash/hash.go:81-155): project a record to a fixed 64-bit
signature whose Hamming distance tracks content similarity. Where the
reference thresholds 64 DCT coefficients against their median to set bits
(hash.go:142-153), SimHash sets bit *b* to the sign of the sum over shingle
hashes of (+1 if shingle-bit *b* else −1).
"""

from __future__ import annotations

import numpy as np

from dedupe_ray.functions.hashing import hash_tokens, shingle_hashes
from dedupe_ray.functions.text import normalize_tokens

__all__ = ["simhash64", "simhash64_batch", "simhash_from_shingles", "simhash_from_flat"]

_BITS = np.arange(64, dtype=np.uint64)


def simhash_from_shingles(shingles: np.ndarray) -> int:
    """SimHash of one document's uint64 shingle-hash array."""
    # (n, 64) of {0,1}; column sums vs n/2 give the sign of (+1/-1) sums.
    bits = (shingles[:, None] >> _BITS) & np.uint64(1)
    counts = bits.sum(axis=0, dtype=np.int64)
    sig = np.where(counts * 2 > len(shingles), np.uint64(1) << _BITS, np.uint64(0))
    return int(np.bitwise_or.reduce(sig))


def simhash_from_flat(flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """SimHash per document from a flattened shingle-hash array.

    ``flat`` concatenates every document's shingle hashes; ``offsets`` (len
    n_docs+1) delimits each document. 64 CONTIGUOUS 1-D shift/mask/reduceat
    passes with a reused buffer — numpy's uint64 2-D broadcast path is ~50×
    slower (scalar inner loop + per-op temps), so this shape matters.
    """
    n_docs = len(offsets) - 1
    if len(flat) == 0 or n_docs == 0:
        return np.zeros(n_docs, dtype=np.uint64)
    idx = offsets[:-1].astype(np.int64)
    lens = np.diff(offsets).astype(np.uint64)
    sig = np.zeros(n_docs, dtype=np.uint64)
    buf = np.empty_like(flat)
    one = np.uint64(1)
    for bit in range(64):
        np.right_shift(flat, np.uint64(bit), out=buf)
        buf &= one
        counts = np.add.reduceat(buf, idx)
        sig |= (counts * np.uint64(2) > lens).astype(np.uint64) << np.uint64(bit)
    return sig


def simhash64(text: str, shingle_size: int = 3, cache: dict | None = None) -> int:
    """SimHash of one raw text (tokenize → shingle → hash)."""
    toks = normalize_tokens(text)
    return simhash_from_shingles(shingle_hashes(hash_tokens(toks, cache), shingle_size))


def simhash64_batch(texts, shingle_size: int = 3, cache: dict | None = None) -> np.ndarray:
    """SimHash per text for a batch → uint64 ndarray (flattened reduceat path)."""
    parts = []
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    total = 0
    for i, t in enumerate(texts):
        sh = shingle_hashes(hash_tokens(normalize_tokens(t), cache), shingle_size)
        parts.append(sh)
        total += len(sh)
        offsets[i + 1] = total
    if not parts:
        return np.zeros(0, dtype=np.uint64)
    return simhash_from_flat(np.concatenate(parts), offsets)
