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
        # Multiply-shift universal hashing: h_j(x) = (a_j·x + b_j) >> 32 with
        # a_j odd — 2 ops per value vs ~6 for a Mersenne-prime scheme, same
        # minwise behavior in practice (Dietzfelbinger et al. multiply-shift).
        self.a = rng.integers(0, 1 << 63, size=num_perms, dtype=np.uint64) * 2 + 1
        self.b = rng.integers(0, 1 << 32, size=num_perms, dtype=np.uint64)
        self.token_cache: dict[str, int] = {}

    def _perm_values(self, shingles: np.ndarray, j0: int, j1: int) -> np.ndarray:
        """(n_shingles, j1-j0) permuted values, uint32."""
        with np.errstate(over="ignore"):
            v = shingles[:, None] * self.a[None, j0:j1] + self.b[None, j0:j1]
        return (v >> np.uint64(32)).astype(np.uint32)

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        """(num_perms,) uint32 signature of one shingle-hash set."""
        out = np.empty(self.num_perms, dtype=np.uint32)
        for j0 in range(0, self.num_perms, 32):
            j1 = min(j0 + 32, self.num_perms)
            out[j0:j1] = self._perm_values(shingles, j0, j1).min(axis=0)
        return out

    def signatures_flat(self, flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """(n_docs, num_perms) signatures from flattened shingle hashes via
        ``np.minimum.reduceat`` — the batch hot path. Permutations are
        processed in chunks of 32 to bound the (n_shingles × chunk) temp."""
        n_docs = len(offsets) - 1
        out = np.empty((n_docs, self.num_perms), dtype=np.uint32)
        idx = offsets[:-1].astype(np.int64)
        for j0 in range(0, self.num_perms, 32):
            j1 = min(j0 + 32, self.num_perms)
            vals = self._perm_values(flat, j0, j1)
            out[:, j0:j1] = np.minimum.reduceat(vals, idx, axis=0)
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
