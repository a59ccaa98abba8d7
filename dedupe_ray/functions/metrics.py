"""Pairwise metrics: Hamming, Jaccard (exact + minhash estimate), Jaro-Winkler.

``hamming64`` is the direct analog of the reference's metric
(/root/reference/hash/hash.go:157-159 popcount-of-xor; summed over slots in
/root/reference/vptree/vptree.go:60-69) — here vectorized over uint64 arrays.
"""

from __future__ import annotations

import numpy as np

__all__ = ["hamming64", "jaccard_minhash", "jaccard_exact", "jaro_winkler", "jaro_winkler_pairs"]

_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def hamming64(a, b) -> np.ndarray | int:
    """Popcount(XOR) per element pair for uint64 scalars/arrays."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    x = np.bitwise_xor(a, b)
    counts = _POPCNT8[x.reshape(-1).view(np.uint8)].reshape(*x.shape, 8).sum(axis=-1, dtype=np.int64)
    return int(counts) if counts.shape == () else counts


def jaccard_minhash(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray | float:
    """Estimated Jaccard = fraction of equal minhash slots.

    Accepts (K,) pairs → float, or (n, K) arrays → (n,) floats.
    """
    sig_a = np.asarray(sig_a)
    sig_b = np.asarray(sig_b)
    eq = (sig_a == sig_b).mean(axis=-1)
    return float(eq) if eq.shape == () else eq


def jaccard_exact(set_a: set, set_b: set) -> float:
    """Exact Jaccard of two sets (test oracle / small-side verification)."""
    if not set_a and not set_b:
        return 1.0
    inter = len(set_a & set_b)
    return inter / (len(set_a) + len(set_b) - inter)


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler similarity in [0, 1] (standard definition, 4-char prefix cap)."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    a1 = np.frombuffer(s1.encode("utf-32-le"), dtype=np.uint32)
    a2 = np.frombuffer(s2.encode("utf-32-le"), dtype=np.uint32)
    m2_used = np.zeros(len2, dtype=bool)
    m1_idx = []
    m2_idx = []
    for i in range(len1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not m2_used[j] and a2[j] == a1[i]:
                m2_used[j] = True
                m1_idx.append(i)
                m2_idx.append(j)
                break
    m = len(m1_idx)
    if m == 0:
        return 0.0
    # transpositions: matched chars of s1 in order vs matched chars of s2 in order
    t = int((a1[m1_idx] != a2[np.sort(m2_idx)]).sum()) // 2
    jaro = (m / len1 + m / len2 + (m - t) / m) / 3.0
    prefix = 0
    for c1, c2 in zip(s1[:4], s2[:4]):
        if c1 != c2:
            break
        prefix += 1
    return jaro + prefix * prefix_weight * (1.0 - jaro)


def jaro_winkler_pairs(left: list[str], right: list[str]) -> np.ndarray:
    """Jaro-Winkler per aligned pair (batched API; per-pair loop inside)."""
    return np.array([jaro_winkler(a, b) for a, b in zip(left, right)], dtype=np.float64)
