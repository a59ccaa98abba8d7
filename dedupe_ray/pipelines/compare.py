"""Target-vs-corpus lookup — the reference's ``Compare`` semi-join.

``Compare`` (/root/reference/dedupe.go:127-146) hashes one target image,
builds a tree over the corpus, and returns the target's within-radius
neighbors. Here the target's signature is computed driver-side, broadcast
into a single streaming ``map_batches`` filter over the corpus signatures —
NO shuffle at all (SURVEY.md §2.5 D2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from dedupe_ray.config import NearDupConfig, SimHashConfig
from dedupe_ray.functions.metrics import hamming64
from dedupe_ray.functions.minhash import MinHasher
from dedupe_ray.functions.simhash import simhash64

__all__ = ["compare"]


def compare(
    signatures: "ray.data.Dataset",
    target_text: str,
    config: NearDupConfig | None = None,
    exclude_self: bool = True,
) -> "ray.data.Dataset":
    """Rows of ``signatures`` within the configured match radius of
    ``target_text`` → (url, doc_id, score). Excludes exact self-identity by
    signature equality when ``exclude_self`` (the analog of ``Within``
    skipping the target ID, /root/reference/vptree/vptree.go:113) is False —
    by default the target text itself IS allowed to match (Compare returns
    neighbors of an external target)."""
    config = config or NearDupConfig()
    cfg = config.signature()
    if isinstance(cfg, SimHashConfig):
        target_sig = np.uint64(simhash64(target_text, cfg.shingle_size))
        ref = ray.put(target_sig)

        def _score(batch: pa.Table) -> pa.Table:
            t = ray.get(ref)
            sims = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
            d = hamming64(sims, t)
            keep = d <= cfg.threshold
            out = batch.filter(pa.array(keep))
            return out.append_column(
                "score", pa.array(1.0 - np.asarray(d)[keep] / 64.0, pa.float64())
            )

    else:
        mh = MinHasher(cfg.num_perms, cfg.shingle_size, cfg.seed, cfg.scheme)
        target_sig = mh.text_signature(target_text)
        ref = ray.put(target_sig)

        def _score(batch: pa.Table) -> pa.Table:
            t = ray.get(ref)
            n = batch.num_rows
            flat = batch.column("minhash").combine_chunks().flatten().to_numpy(
                zero_copy_only=False
            )
            sigs = flat.reshape(n, cfg.num_perms)
            est = (sigs == t[None, :]).mean(axis=1)
            keep = est >= cfg.threshold
            out = batch.filter(pa.array(keep))
            return out.append_column("score", pa.array(est[keep], pa.float64()))

    return signatures.map_batches(_score, batch_format="pyarrow", batch_size=None)
