"""Mergeable weighted quantile summary — pure numpy kernel (no Ray).

The exact-histogram quantile path (`events_value_quantiles`) relies on
bounded-distinct metric columns; this summary is the scale path for
UNBOUNDED value domains (latencies, byte sizes): each partial is at most
``k`` (value, weight) points, merging is concat + re-compress, and the rank
error after one merge level is ≤ ~2·W/k (GK/KLL-family bound for a uniform
cumulative-weight grid; deterministic — no sampling — so results are
reproducible run-to-run and testable against the exact sibling).

Points are always ACTUAL data values (the compressor selects order
statistics, never interpolates), so quantile queries return elements of the
dataset — the same PERCENTILE_DISC semantics as the exact path.
"""

from __future__ import annotations

import numpy as np

__all__ = ["compress", "merge", "quantile"]


def compress(values: np.ndarray, weights: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Reduce a weighted value multiset to ≤ ``k`` points on a uniform
    cumulative-weight grid. Inputs need not be sorted; outputs are sorted,
    total weight is preserved exactly."""
    o = np.argsort(values, kind="stable")
    values, weights = values[o], weights[o].astype(np.int64)
    if len(values) <= k:
        return values, weights
    cum = np.cumsum(weights)
    total = int(cum[-1])
    # k bucket boundaries by cumulative weight; each kept point is the order
    # statistic at the bucket's upper grid edge, carrying the bucket's weight
    grid = np.ceil(np.arange(1, k + 1) * (total / k)).astype(np.int64)
    # float64 grid can round the last edge below ``total`` once total weight
    # exceeds 2^53, silently dropping the maximum value — pin the final grid
    # point to the exact total so weight preservation holds at any scale
    grid[-1] = total
    np.minimum(grid, total, out=grid)
    idx = np.searchsorted(cum, grid, side="left")
    idx = np.minimum(idx, len(values) - 1)
    uniq_idx = np.unique(idx)
    vals = values[uniq_idx]
    bucket_cum = cum[uniq_idx]
    w = np.diff(np.r_[np.int64(0), bucket_cum])
    return vals, w


def merge(
    parts: list[tuple[np.ndarray, np.ndarray]], k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Merge summaries: concat and re-compress (associative up to the error
    bound; weight-exact)."""
    vals = np.concatenate([p[0] for p in parts])
    ws = np.concatenate([p[1] for p in parts])
    return compress(vals, ws, k)


def quantile(vals: np.ndarray, weights: np.ndarray, p: float) -> float:
    """PERCENTILE_DISC over a sorted summary: smallest value whose
    cumulative weight reaches ⌈p·W⌉."""
    cum = np.cumsum(weights.astype(np.int64))
    total = int(cum[-1])
    target = int(np.ceil(p * total))
    i = int(np.searchsorted(cum, max(target, 1), side="left"))
    return float(vals[min(i, len(vals) - 1)])
