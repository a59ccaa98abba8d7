"""Document fingerprinting — winnowing over character k-gram rolling hashes.

Schleimer/Wilkerson/Aiken winnowing (SIGMOD 2003, public algorithm): hash
every k-char gram, slide a window of w hashes, keep each window's minimum
(rightmost on ties). The selected hash set is a compact position-robust
fingerprint usable for containment / plagiarism-style overlap detection.
"""

from __future__ import annotations

import numpy as np

__all__ = ["winnow_fingerprint", "char_kgram_hashes"]

_BASE = np.uint64(1_000_003)


def char_kgram_hashes(text: str, k: int = 8) -> np.ndarray:
    """Rolling polynomial hashes of every k-char gram (lowercased), uint64."""
    s = text.lower().encode("utf-8")
    a = np.frombuffer(s, dtype=np.uint8).astype(np.uint64)
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    if n < k:
        k = n
    with np.errstate(over="ignore"):
        # power matrix trick: h_i = sum_j a[i+j] * BASE^(k-1-j), via strided windows
        win = np.lib.stride_tricks.sliding_window_view(a, k)
        powers = _BASE ** np.arange(k - 1, -1, -1, dtype=np.uint64)
        h = (win * powers[None, :]).sum(axis=1, dtype=np.uint64)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
    return h


def winnow_fingerprint(text: str, k: int = 8, window: int = 16) -> np.ndarray:
    """Sorted unique selected hashes (the fingerprint), uint64."""
    h = char_kgram_hashes(text, k)
    n = len(h)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    if n <= window:
        return np.unique(h.min(keepdims=True))
    win = np.lib.stride_tricks.sliding_window_view(h, window)
    # rightmost minimum per window: reverse, argmin finds first == rightmost
    rev = win[:, ::-1]
    idx = (window - 1) - rev.argmin(axis=1)
    sel = win[np.arange(len(win)), idx]
    return np.unique(sel)
