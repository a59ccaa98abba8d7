"""Incremental dedup: match a NEW batch of pages against an EXISTING corpus.

The production shape of the reference's ``Compare`` (one target vs corpus,
/root/reference/dedupe.go:127-146) generalized to batch-vs-corpus: a fresh
crawl increment is deduped against the already-signed corpus WITHOUT
shuffling the corpus. The increment is the small side:

  1. sign the increment; collect ITS band keys to the driver (bounded by
     |increment| × B × 8 bytes);
  2. stream the corpus signatures through one ``map_batches`` band-filter —
     only corpus rows sharing a band with the increment survive (no corpus
     shuffle, no corpus materialization);
  3. candidate pairs within the union of (increment ∪ surviving corpus)
     banded rows, then exact verification — the normal machinery on a small
     dataset.

Returns cross edges (new ↔ corpus), internal edges (new ↔ new), and a
per-new-page verdict (duplicate_of corpus doc or fresh).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from dedupe_ray.config import NearDupConfig
from dedupe_ray.pipelines.neardup import signatures_dataset
from dedupe_ray.stages.banding import band_emitter
from dedupe_ray.stages.candidates import candidate_edges, verify_edges

__all__ = ["incremental_match"]


def incremental_match(
    new_pages: "ray.data.Dataset",
    corpus_signatures: "ray.data.Dataset",
    config: NearDupConfig | None = None,
    extract: bool = True,
) -> dict:
    """Match an increment against a signed corpus.

    Returns ``{"edges": Table(src, dst, score), "new_status": Table(doc_id,
    url, duplicate_of)}`` where ``duplicate_of`` is the matched corpus/new
    doc id (lowest-scored-first tie-break by id) or null for fresh pages.
    Both new-internal and cross edges are included.
    """
    config = config or NearDupConfig()
    emit = band_emitter(config.signature())

    new_sigs = signatures_dataset(new_pages, config, extract=extract).materialize()
    new_banded_tbl = pa.concat_tables(
        list(
            new_sigs.map_batches(emit, batch_format="pyarrow", batch_size=None)
            .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        )
    )
    new_keys = np.unique(new_banded_tbl.column("band_key").to_numpy(zero_copy_only=False))
    keys_ref = ray.put(new_keys)

    def _band_filter(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        banded = emit(batch)
        mask = np.isin(banded.column("band_key").to_numpy(zero_copy_only=False), keys)
        return banded.filter(pa.array(mask))

    # ONE streaming pass over the corpus — no shuffle, no materialization
    corpus_hits = corpus_signatures.map_batches(
        _band_filter, batch_format="pyarrow", batch_size=None
    )
    banded_all = corpus_hits.union(ray.data.from_arrow(new_banded_tbl))
    cand = candidate_edges(banded_all, config.max_bucket_size).materialize()

    # verification needs signatures from BOTH sides
    all_sigs = corpus_signatures.union(new_sigs)
    edges = pa.concat_tables(
        list(
            verify_edges(cand, all_sigs, config).iter_batches(
                batch_size=1 << 20, batch_format="pyarrow"
            )
        )
        or [pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
                      "score": pa.array([], pa.float64())})]
    )

    new_ids = np.sort(
        np.concatenate(
            [
                b.column("doc_id").to_numpy(zero_copy_only=False)
                for b in new_sigs.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
            ]
        )
    ) if new_sigs.count() else np.zeros(0, np.int64)
    urls_by_id: dict[int, str] = {}
    for b in new_sigs.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        urls_by_id.update(zip(b.column("doc_id").to_pylist(), b.column("url").to_pylist()))

    dup_of: dict[int, int] = {}
    src = edges.column("src").to_numpy(zero_copy_only=False)
    dst = edges.column("dst").to_numpy(zero_copy_only=False)
    for s, d in zip(src.tolist(), dst.tolist()):
        for a, b_ in ((s, d), (d, s)):
            if np.searchsorted(new_ids, a) < len(new_ids) and new_ids[
                np.searchsorted(new_ids, a)
            ] == a:
                best = dup_of.get(a)
                if best is None or b_ < best:
                    dup_of[a] = b_
    status = pa.table(
        {
            "doc_id": pa.array(new_ids, pa.int64()),
            "url": pa.array([urls_by_id[int(i)] for i in new_ids], pa.string()),
            "duplicate_of": pa.array(
                [dup_of.get(int(i)) for i in new_ids], pa.int64()
            ),
        }
    )
    return {"edges": edges, "new_status": status}
