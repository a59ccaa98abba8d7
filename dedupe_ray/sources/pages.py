"""Sources: read a pages corpus from parquet / json / csv into the canonical
schema.

The reference's source layer walks directories and classifies inputs by
extension (``FindImages`` / ``ImageOrDir`` / ``isImage``,
/root/reference/utils/file.go:25-118). Here the classification is by file
format, and every format funnels into the one canonical PAGES_SCHEMA
(url, warc_ts, html, text, lang) with missing optional columns filled with
nulls — so downstream stages never branch on provenance.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data

from dedupe_ray.fixtures.pages import PAGES_SCHEMA

__all__ = ["read_pages", "coerce_pages_schema"]

_READERS = {
    ".parquet": ray.data.read_parquet,
    ".json": ray.data.read_json,
    ".jsonl": ray.data.read_json,
    ".csv": ray.data.read_csv,
}

_REQUIRED = ("url",)
_OPTIONAL_DEFAULTS = {
    "warc_ts": pa.timestamp("us"),
    "html": pa.binary(),
    "text": pa.string(),
    "lang": pa.string(),
}


def coerce_pages_schema(batch: pa.Table) -> pa.Table:
    """Project a batch onto PAGES_SCHEMA: required ``url``; missing optional
    columns become nulls; extra columns are dropped; types are cast."""
    if "url" not in batch.column_names:
        raise ValueError(f"pages input lacks required column 'url'; has {batch.column_names}")
    cols = {}
    cols["url"] = batch.column("url").cast(pa.string())
    for name, typ in _OPTIONAL_DEFAULTS.items():
        if name in batch.column_names:
            col = batch.column(name)
            if name == "html" and pa.types.is_string(col.type):
                # text-format sources (csv/json) carry html as string
                col = col.cast(pa.binary())
            cols[name] = col.cast(typ)
        else:
            cols[name] = pa.nulls(batch.num_rows, typ)
    return pa.table(cols, schema=PAGES_SCHEMA)


def _uniform_stripped_schema(paths: list[str], max_check: int = 32):
    """Metadata-free common schema of a parquet file group, or None when
    files disagree (mixed providers) or the group is too large to footer-
    check cheaply — callers then fall back to Ray's own schema resolution
    and the downstream coercion map."""
    import pyarrow.parquet as pq

    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p))
                if f.endswith(".parquet")
            )
        else:
            files.append(p)
    if not files or len(files) > max_check:
        return None
    try:
        schemas = [pq.read_schema(f).remove_metadata() for f in files]
    except Exception:
        return None
    first = schemas[0]
    return first if all(s.equals(first) for s in schemas[1:]) else None


def parquet_row_count(paths: list[str] | str) -> int | None:
    """Total row count from parquet FILE METADATA only — no read, no Ray
    execution. The cheap probe that lets sizing decisions (block counts,
    band bundle sizes) run on lazy pipelines without materializing them.
    Returns None when any file's footer isn't readable."""
    import glob

    import pyarrow.parquet as pq

    if isinstance(paths, str):
        paths = [paths]
    rows = 0
    for p in paths:
        files = (
            glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True)
            if os.path.isdir(p)
            else [p]
        )
        for f in files:
            try:
                rows += pq.ParquetFile(f).metadata.num_rows
            except Exception:
                return None
    return rows


def _parquet_blocks(paths: list[str]) -> int | None:
    """Explicit block count for parquet inputs (row count from file
    metadata): Ray's default 2×CPUs split makes tiny blocks whose ~50 ms
    per-task executor dispatch dominates small corpora — target ≥8k
    rows/block, floor 8 blocks, cap at the CPU count. Returns None (use the
    default splitting) when metadata isn't cheaply available."""
    rows = parquet_row_count(paths)
    if rows is None:
        return None
    if rows < 1000:
        return 1
    from dedupe_ray.runtime import cluster_cpus

    # the CPU cap lifts past 64k rows/block — blocks bound per-task heap as
    # well as dispatch count (the ×400-corpus lesson, PROFILE.md)
    return int(min(max(rows // 8000, 8), max(8, cluster_cpus(), rows // 65536)))


def read_pages(paths: list[str] | str) -> "ray.data.Dataset":
    """Read one or more pages files (parquet/json/jsonl/csv, may be mixed)
    and coerce to the canonical schema. Directories are read as parquet."""
    if isinstance(paths, str):
        paths = [paths]
    by_reader: dict = {}
    for p in paths:
        ext = os.path.splitext(p)[1].lower() if not os.path.isdir(p) else ".parquet"
        reader = _READERS.get(ext)
        if reader is None:
            raise ValueError(f"unsupported pages format {ext!r} for {p}")
        by_reader.setdefault(reader, []).append(p)
    ds = None
    for reader, group in by_reader.items():
        kwargs = {}
        if reader is ray.data.read_parquet:
            nb = _parquet_blocks(group)
            if nb is not None:
                kwargs["override_num_blocks"] = nb
            sch = _uniform_stripped_schema(group)
            if sch is not None:
                # metadata-free schema at the source: with explicit block
                # counts the read op hashes block schemas before any strip
                # stage runs, and parquet metadata is unhashable on
                # pyarrow 16 (see queries.read_table)
                kwargs["schema"] = sch
        part = reader(group, **kwargs).map_batches(
            coerce_pages_schema, batch_format="pyarrow", batch_size=None
        )
        ds = part if ds is None else ds.union(part)
    return ds
