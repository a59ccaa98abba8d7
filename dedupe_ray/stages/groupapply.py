"""``sorted_group_apply`` — vectorized grouped apply without per-group calls.

``GroupedData.map_groups`` costs one Python call per group; LSH banding
produces millions of (mostly singleton) buckets, so per-group dispatch would
dominate. This helper relies on the same physical guarantee ``map_groups``
itself uses (ray/data/grouped_data.py: sort by key, then
``map_batches(batch_size=None)`` — a key never straddles two blocks after the
range-partitioned sort) but hands the WHOLE sorted block to a vectorized
function that does its own ``np.unique``-style grouping: one Python call per
block instead of per group.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa

import ray.data

__all__ = ["sorted_group_apply"]


def sorted_group_apply(
    ds: "ray.data.Dataset",
    key: str | list[str],
    block_fn: Callable[[pa.Table], pa.Table],
    **map_kwargs,
) -> "ray.data.Dataset":
    """Sort ``ds`` by ``key`` (str or composite list) and apply ``block_fn``
    to each whole sorted block (Arrow table; all rows of any given key value
    are in exactly one block). ``block_fn`` must handle multiple groups per
    block (vectorized)."""
    return ds.sort(key).map_batches(
        block_fn, batch_size=None, batch_format="pyarrow", **map_kwargs
    )
