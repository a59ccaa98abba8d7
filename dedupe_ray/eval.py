"""Evaluation helpers — pairwise F1 on labeled pairs (BASELINE.json:metric)."""

from __future__ import annotations

import pyarrow as pa

__all__ = ["pairwise_f1"]


def pairwise_f1(assignment: pa.Table, labeled_pairs: pa.Table) -> dict:
    """Precision/recall/F1 of "same cluster" predictions over labeled pairs.

    ``assignment``: (url, cluster_id); ``labeled_pairs``: (url_a, url_b, is_dup).
    """
    cl = dict(
        zip(assignment.column("url").to_pylist(), assignment.column("cluster_id").to_pylist())
    )
    tp = fp = fn = tn = 0
    for a, b, is_dup in zip(
        labeled_pairs.column("url_a").to_pylist(),
        labeled_pairs.column("url_b").to_pylist(),
        labeled_pairs.column("is_dup").to_pylist(),
    ):
        pred = cl.get(a) is not None and cl.get(a) == cl.get(b)
        if pred and is_dup:
            tp += 1
        elif pred and not is_dup:
            fp += 1
        elif not pred and is_dup:
            fn += 1
        else:
            tn += 1
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "tn": tn,
    }
