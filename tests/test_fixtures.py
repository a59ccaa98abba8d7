"""Fixture-generator invariants: determinism, schema, extraction parity.

The byte-identical extraction check here IS the per-row invariant from
BASELINE.json:input_hint — the engine's extractor must reproduce the oracle
``text`` column exactly, for every url.
"""

from __future__ import annotations

import numpy as np

from dedupe_ray.fixtures.pages import PAGES_SCHEMA, generate_pages
from dedupe_ray.functions.text import extract_text


def test_deterministic():
    f1 = generate_pages(n_pages=200, seed=42)
    f2 = generate_pages(n_pages=200, seed=42)
    assert f1.pages.equals(f2.pages)
    assert f1.labeled_pairs.equals(f2.labeled_pairs)
    f3 = generate_pages(n_pages=200, seed=43)
    assert not f3.pages.equals(f1.pages)


def test_schema_and_shape():
    f = generate_pages(n_pages=300, seed=42)
    assert f.pages.schema.equals(PAGES_SCHEMA)
    assert f.pages.num_rows == 300
    urls = f.pages.column("url").to_pylist()
    assert len(set(urls)) == len(urls), "urls must be unique keys"
    labels = f.labeled_pairs
    assert labels.num_rows > 0
    assert bool(np.any(labels.column("is_dup").to_numpy(zero_copy_only=False)))
    assert not bool(np.all(labels.column("is_dup").to_numpy(zero_copy_only=False)))


def test_extraction_byte_identical():
    """extract_text(html) == oracle text, byte for byte, for every url."""
    f = generate_pages(n_pages=400, seed=42)
    htmls = f.pages.column("html").to_pylist()
    texts = f.pages.column("text").to_pylist()
    urls = f.pages.column("url").to_pylist()
    for url, html, text in zip(urls, htmls, texts):
        got = extract_text(html)
        assert got == text, f"extraction mismatch for {url!r}"


def test_cluster_structure():
    f = generate_pages(n_pages=500, seed=42)
    sizes = [len(v) for v in f.clusters.values()]
    assert max(sizes) >= 2
    n_in_clusters = sum(s for s in sizes if s >= 2)
    assert 0.2 < n_in_clusters / f.pages.num_rows < 0.6
    # hot-boilerplate pages exist and are all singleton clusters
    t = f.truth.to_pydict()
    hot = [c for c, tr in zip(t["true_cluster"], t["transform"]) if tr == "hot_boiler"]
    assert len(hot) > 0 and len(set(hot)) == len(hot)
