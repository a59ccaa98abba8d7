"""Containment / partial-overlap detection via winnowing fingerprints.

Near-dup Jaccard misses ASYMMETRIC overlap — a page quoting half of another
page, boilerplate-wrapped syndicated articles, training-data substring duplication
(Lee et al., "Deduplicating Training Data Makes Language Models Better",
ACL 2022 — public work). Winnowing fingerprints (functions/fingerprint.py,
Schleimer et al. SIGMOD 2003) are position-robust substring samples, so
shared fingerprints ≈ shared substrings:

    docs → winnow fingerprints (per-doc set of uint64)
         → each fingerprint hash IS a band key (flat emission)
         → candidate pairs from shared-fingerprint buckets (the usual
           sort + vectorized pair scan, hot hashes salted)
         → containment score = |fp_a ∩ fp_b| / min(|fp_a|, |fp_b|)
           verified driver-side on the candidate slice

Returns pairs with containment ≥ threshold — a superset of near-dup pairs
that includes one-sided inclusions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from dedupe_ray.functions.fingerprint import winnow_fingerprint
from dedupe_ray.stages.candidates import candidate_edges

__all__ = ["containment_pairs"]


def containment_pairs(
    docs: "ray.data.Dataset",
    threshold: float = 0.5,
    k: int = 8,
    window: int = 16,
    min_fingerprints: int = 4,
    max_bucket_size: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """(src, dst, containment) for all pairs sharing enough winnowed
    substrings. Docs with fewer than ``min_fingerprints`` selected hashes are
    skipped (too short to measure containment meaningfully)."""

    def _fps(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_key, out_id = [], []
        for i, t in zip(ids, texts):
            fp = winnow_fingerprint(t or "", k=k, window=window)
            if len(fp) < min_fingerprints:
                continue
            out_key.append(fp)
            out_id.append(np.full(len(fp), i, dtype=np.int64))
        if not out_key:
            return pa.table({"band_key": pa.array([], pa.uint64()),
                             "doc_id": pa.array([], pa.int64())})
        return pa.table(
            {"band_key": pa.array(np.concatenate(out_key), pa.uint64()),
             "doc_id": pa.array(np.concatenate(out_id), pa.int64())}
        )

    banded = docs.map_batches(_fps, batch_format="pyarrow", batch_size=None)
    cand = candidate_edges(banded, max_bucket_size).materialize()
    parts = list(cand.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    if not parts:
        return pa.table({"src": pa.array([], pa.int64()),
                         "dst": pa.array([], pa.int64()),
                         "containment": pa.array([], pa.float64())})
    tbl = pa.concat_tables(parts)
    pairs = np.unique(
        np.stack([tbl.column("src").to_numpy(zero_copy_only=False),
                  tbl.column("dst").to_numpy(zero_copy_only=False)], axis=1),
        axis=0,
    )
    want = np.unique(pairs.reshape(-1))
    want_ref = ray.put(want)

    def _slim(batch: pa.Table) -> pa.Table:
        w = ray.get(want_ref)
        mask = np.isin(batch.column(id_col).to_numpy(zero_copy_only=False), w)
        return batch.select([id_col, text_col]).filter(pa.array(mask))

    slim = pa.concat_tables(
        list(docs.map_batches(_slim, batch_format="pyarrow", batch_size=None)
             .iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    )
    fps = {
        i: set(winnow_fingerprint(t or "", k=k, window=window).tolist())
        for i, t in zip(slim.column(id_col).to_pylist(), slim.column(text_col).to_pylist())
    }
    src, dst, score = [], [], []
    for a, b in pairs.tolist():
        fa, fb = fps.get(a), fps.get(b)
        if not fa or not fb:
            continue
        c = len(fa & fb) / min(len(fa), len(fb))
        if c >= threshold:
            src.append(a)
            dst.append(b)
            score.append(c)
    return pa.table(
        {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64()),
         "containment": pa.array(score, pa.float64())}
    )
