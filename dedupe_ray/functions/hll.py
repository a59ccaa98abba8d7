"""HyperLogLog distinct-count sketch — numpy, mergeable, deterministic.

Flajolet et al. 2007 (public algorithm) with the standard bias correction
and linear-counting small-range fallback. Designed for the partial-aggregate
pattern (ray_guide: "emit one serialized sketch per batch and merge them in
a second, tiny stage"): each batch produces one (2^p,) uint8 register array;
register-wise ``np.maximum`` merges partials from any number of batches /
nodes; estimation happens once at the end.
"""

from __future__ import annotations

import numpy as np

__all__ = ["HllSketch"]


class HllSketch:
    def __init__(self, p: int = 12):
        if not 4 <= p <= 18:
            raise ValueError(p)
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        if self.m >= 128:
            self.alpha = 0.7213 / (1 + 1.079 / self.m)
        elif self.m == 64:
            self.alpha = 0.709
        elif self.m == 32:
            self.alpha = 0.697
        else:
            self.alpha = 0.673

    def add_hashes(self, hashes: np.ndarray) -> None:
        """Fold a batch of uint64 hashes into the registers (vectorized)."""
        h = np.asarray(hashes, dtype=np.uint64)
        if len(h) == 0:
            return
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)  # remaining bits, left-aligned
        # rank = position of the first 1-bit in the remaining 64-p bits, +1
        nbits = 64 - self.p
        rank = np.full(len(h), nbits + 1, dtype=np.uint8)
        found = np.zeros(len(h), dtype=bool)
        for b in range(nbits):
            hit = (~found) & ((rest >> np.uint64(63 - b)) & np.uint64(1)).astype(bool)
            rank[hit] = b + 1
            found |= hit
        # scatter-max into registers, grouped by index
        order = np.argsort(idx, kind="stable")
        si, sr = idx[order], rank[order]
        first = np.r_[True, si[1:] != si[:-1]]
        # within each index run, max rank: reduceat
        seg_max = np.maximum.reduceat(sr, np.flatnonzero(first))
        tgt = si[first]
        self.registers[tgt] = np.maximum(self.registers[tgt], seg_max)

    def merge(self, other: "HllSketch | np.ndarray") -> "HllSketch":
        regs = other.registers if isinstance(other, HllSketch) else np.asarray(other, dtype=np.uint8)
        np.maximum(self.registers, regs, out=self.registers)
        return self

    def estimate(self) -> float:
        regs = self.registers.astype(np.float64)
        raw = self.alpha * self.m * self.m / np.sum(np.exp2(-regs))
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * self.m and zeros:
            return self.m * np.log(self.m / zeros)  # linear counting
        return raw
