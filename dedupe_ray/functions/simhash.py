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
    n_docs+1) delimits each document. One ``np.add.reduceat`` per run instead
    of a Python loop per doc — this is the batch hot path.
    """
    n_docs = len(offsets) - 1
    if len(flat) == 0:
        return np.zeros(n_docs, dtype=np.uint64)
    bits = ((flat[:, None] >> _BITS) & np.uint64(1)).astype(np.int64)
    sums = np.add.reduceat(bits, offsets[:-1].astype(np.int64), axis=0)
    # reduceat with repeated indices (empty docs) returns the row at the index;
    # empty docs are impossible here because shingle_hashes never returns [].
    lens = np.diff(offsets).astype(np.int64)
    sig = np.where(sums * 2 > lens[:, None], np.uint64(1) << _BITS, np.uint64(0))
    return np.bitwise_or.reduce(sig, axis=1)


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
