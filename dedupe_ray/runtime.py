"""Tiny runtime helpers shared by the block-sizing policies.

The three block-count formulas (table reads, synthetic-page expansion,
pre-sort band bundling) are deliberately tuned per stage — see PROFILE.md —
but they share the same cluster-CPU probe, which lives here so it cannot
drift.
"""

from __future__ import annotations

import ray

__all__ = ["cluster_cpus"]


def cluster_cpus(default: int = 8) -> int:
    """CPU count of the current Ray cluster; ``default`` when no session is
    initialised yet (the caller owns session lifecycle — library code never
    calls ray.init)."""
    try:
        return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        return default
