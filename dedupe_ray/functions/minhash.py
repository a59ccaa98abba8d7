"""K-permutation MinHash signatures — vectorized, mergeable.

The analog of the reference's multi-slot DHASH signature
(/root/reference/dedupe.go:26-28: two 64-bit hashes compared by summed
Hamming): a K-slot sketch whose slot-equality rate estimates Jaccard
similarity of the shingle sets. Slots are uint32 (standard; 128 slots =
512 B/doc).
"""

from __future__ import annotations

import numpy as np

from dedupe_ray.functions.hashing import hash_tokens, shingle_hashes
from dedupe_ray.functions.text import normalize_tokens

__all__ = ["MinHasher"]

_MERSENNE61 = np.uint64((1 << 61) - 1)


class MinHasher:
    """Stateful minhash kernel: permutation parameters are generated once from
    ``seed`` and reused per batch — hold one instance per actor
    (stateful-stage pattern; analog of per-worker state in
    /root/reference/dedupe.go:52-65).
    """

    def __init__(self, num_perms: int = 128, shingle_size: int = 3, seed: int = 12345):
        self.num_perms = num_perms
        self.shingle_size = shingle_size
        rng = np.random.default_rng(seed)
        # Multiply-shift universal hashing: h_j(x) = (a_j·x) >> 32 with a_j
        # odd — 2 ops per value vs ~6 for a Mersenne-prime scheme, same
        # minwise behavior in practice (Dietzfelbinger et al. multiply-shift).
        self.a = rng.integers(0, 1 << 63, size=num_perms, dtype=np.uint64) * 2 + 1
        self.token_cache: dict[str, int] = {}

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        """(num_perms,) uint32 signature of one shingle-hash set."""
        out = np.empty(self.num_perms, dtype=np.uint32)
        buf = np.empty_like(shingles)
        with np.errstate(over="ignore"):
            for j in range(self.num_perms):
                np.multiply(shingles, self.a[j], out=buf)
                buf >>= np.uint64(32)
                out[j] = buf.min()
        return out

    def signatures_flat(self, flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """(n_docs, num_perms) signatures from flattened shingle hashes via
        ``np.minimum.reduceat`` — the batch hot path.

        One CONTIGUOUS 1-D multiply/shift/reduceat per permutation into a
        reused buffer: ~50× faster than the equivalent 2-D broadcast on
        numpy's uint64 path (which falls off the SIMD loop and allocates a
        (n_shingles × chunk) temp per op)."""
        n_docs = len(offsets) - 1
        out = np.empty((n_docs, self.num_perms), dtype=np.uint32)
        if n_docs == 0:
            return out
        idx = offsets[:-1].astype(np.int64)
        buf = np.empty_like(flat)
        with np.errstate(over="ignore"):
            for j in range(self.num_perms):
                np.multiply(flat, self.a[j], out=buf)
                buf >>= np.uint64(32)
                out[:, j] = np.minimum.reduceat(buf, idx).astype(np.uint32)
        return out

    def text_signature(self, text: str) -> np.ndarray:
        toks = normalize_tokens(text)
        sh = shingle_hashes(hash_tokens(toks, self.token_cache), self.shingle_size)
        return self.signature(sh)

    def batch_signatures(self, texts) -> np.ndarray:
        """(n_texts, num_perms) uint32 signatures for a batch of raw texts."""
        parts, total = [], 0
        offsets = np.zeros(len(texts) + 1, dtype=np.int64)
        for i, t in enumerate(texts):
            sh = shingle_hashes(
                hash_tokens(normalize_tokens(t), self.token_cache), self.shingle_size
            )
            parts.append(sh)
            total += len(sh)
            offsets[i + 1] = total
        if not parts:
            return np.empty((0, self.num_perms), dtype=np.uint32)
        return self.signatures_flat(np.concatenate(parts), offsets)
