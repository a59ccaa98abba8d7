"""Text-extraction stage: ``html: binary`` → ``text: string`` + ``doc_id``.

The analog of the reference's decode step (``LoadImage``,
/root/reference/utils/file.go:14-23) as a Ray Data ``map_batches`` transform:
stateless, Arrow in / Arrow out, malformed payloads degrade to a deterministic
replacement string instead of failing the job (drop-and-continue,
/root/reference/dedupe.go:55-58).
"""

from __future__ import annotations

import pyarrow as pa

from dedupe_ray.functions.hashing import hash_urls
from dedupe_ray.functions.text import extract_text_batch

__all__ = ["ExtractText", "mint_doc_ids"]


def mint_doc_ids(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Append a deterministic int64 ``doc_id`` derived from the url — the
    coordination-free replacement for the reference's mutex id counter
    (``FileMapper``, /root/reference/vptree/vptree.go:16-36)."""
    ids = hash_urls(batch.column(url_col).to_pylist())
    return batch.append_column("doc_id", pa.array(ids, pa.int64()))


class ExtractText:
    """map_batches callable: extract ``text`` from ``html`` (and mint doc ids).

    ``overwrite=False`` keeps an existing non-null ``text`` column and only
    fills rows where it is null (re-extraction avoidance); the flagship
    pipeline uses ``overwrite=True`` so the per-url byte-identical invariant
    is exercised on every run.
    """

    def __init__(self, html_col: str = "html", text_col: str = "text",
                 overwrite: bool = True, drop_html: bool = True,
                 mint_ids: bool = True, mark_quarantine: bool = False):
        self.html_col = html_col
        self.text_col = text_col
        self.overwrite = overwrite
        self.drop_html = drop_html
        self.mint_ids = mint_ids
        self.mark_quarantine = mark_quarantine

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.html_col).to_pylist()
        texts = extract_text_batch(p if p is not None else b"" for p in payloads)
        arr = pa.array(texts, pa.string())
        if self.mark_quarantine:
            # quarantine marker instead of job failure (drop-and-continue,
            # /root/reference/dedupe.go:55-58): null/empty payload or an
            # extraction that yielded no text → extract_ok = False; the row
            # survives so a downstream filter / quarantine sink can route it
            ok = [bool(p) and bool(t) for p, t in zip(payloads, texts)]
            batch = batch.append_column("extract_ok", pa.array(ok, pa.bool_()))
        if self.text_col in batch.column_names:
            if self.overwrite:
                batch = batch.set_column(
                    batch.schema.get_field_index(self.text_col), self.text_col, arr
                )
            else:
                old = batch.column(self.text_col)
                import pyarrow.compute as pc

                merged = pc.coalesce(old, arr)
                batch = batch.set_column(
                    batch.schema.get_field_index(self.text_col), self.text_col, merged
                )
        else:
            batch = batch.append_column(self.text_col, arr)
        if self.drop_html:
            batch = batch.drop_columns([self.html_col])
        if self.mint_ids and "doc_id" not in batch.column_names:
            batch = mint_doc_ids(batch)
        return batch
