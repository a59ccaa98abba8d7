"""Exact deduplication: hash-partitioned keep-first per content hash.

The degenerate (radius 0) case of the reference's dedup — identical
signatures only. Content identity = 128-bit blake2b of the exact text bytes
(collision-free in practice), so the wide step shuffles 16-byte keys, never
the text itself.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from dedupe_ray.stages.groupapply import sorted_group_apply

__all__ = ["exact_dedup", "content_hash_column"]


def content_hash_column(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append ``content_hash: string`` (blake2b-128 hex of utf-8 text)."""
    texts = batch.column(text_col).to_pylist()
    hashes = [
        hashlib.blake2b((t or "").encode("utf-8"), digest_size=16).hexdigest() for t in texts
    ]
    return batch.append_column("content_hash", pa.array(hashes, pa.string()))


def exact_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    order_cols: tuple[str, ...] = ("doc_id",),
) -> "ray.data.Dataset":
    """Keep exactly one row per distinct ``text_col`` value — the survivor is
    the minimum of ``order_cols`` (deterministic; defaults to min doc_id,
    mirroring "first member survives", /root/reference/cmd/dedupe/main.go:228-230).

    One shuffle, keyed on the 128-bit content hash.
    """
    hashed = ds.map_batches(
        lambda b: content_hash_column(b, text_col), batch_format="pyarrow", batch_size=None
    )

    def _first_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return block
        keys = np.asarray(block.column("content_hash").to_pylist(), dtype=object)
        # fully vectorized keep-first: lexsort rows by (key, *order_cols) and
        # take the first row of each key run — no per-group Python
        order_arrays = [
            block.column(c).to_numpy(zero_copy_only=False) for c in reversed(order_cols)
        ]
        order = np.lexsort((*order_arrays, keys))
        sorted_keys = keys[order]
        first = np.r_[True, sorted_keys[1:] != sorted_keys[:-1]]
        return block.take(pa.array(np.sort(order[first]), pa.int64()))

    return sorted_group_apply(hashed, "content_hash", _first_block)
