"""dedupe_ray — a Ray-Data-native near-duplicate record-linkage engine.

Generalizes the capability of the reference (alexgQQ/dedupe, a Go CLI that
finds groups of images whose perceptual-hash signatures lie within a Hamming
radius — /root/reference/dedupe.go:101-123) to Common-Crawl-style web text at
cluster scale, expressed as idiomatic Ray Data pipelines:

    read_parquet(pages)
      → map_batches(extract_text)        # html → byte-identical text
      → map_batches(SignatureStage)      # +simhash:uint64, +minhash:list<u32>
      → band emission (vectorized)       # ×B rows (band_key, doc_id)
      → groupby(band_key)                # THE shuffle (LSH blocking)
      → candidate pairs → verify         # Hamming / Jaccard / Jaro-Winkler
      → connected components             # distributed star-contraction
      → write_parquet(clusters)

Layers:
- ``functions/`` — pure, deterministic, vectorized kernels (numpy/pyarrow),
  no Ray imports. Unit-testable in isolation.
- ``stages/``    — Ray Data batch transforms (map_batches callables, actor
  pools, groupby compositions).
- ``sources/``   — readers for the canonical tables.
- ``pipelines/`` — end-to-end compositions (flagship near-dup, exact dedup,
  compare/lookup, text stats, ANN).
- ``state/``     — per-partition checkpoint / lineage / resume.
- ``fixtures/``  — deterministic synthetic `pages` generator + labeled pairs.

Nothing here calls ``ray.init()``; the driver / bench / tests own the session.
"""

from dedupe_ray.config import (  # noqa: F401
    MinHashConfig,
    NearDupConfig,
    SimHashConfig,
    SIGNATURE_ALGOS,
)


def __getattr__(name):
    # lazy re-exports so `import dedupe_ray` stays light (no Ray import)
    if name in ("near_duplicates", "signatures_dataset", "match_edges"):
        from dedupe_ray.pipelines import neardup

        return getattr(neardup, name)
    if name == "exact_dedup":
        from dedupe_ray.pipelines.exact import exact_dedup

        return exact_dedup
    if name == "compare":
        from dedupe_ray.pipelines.compare import compare

        return compare
    raise AttributeError(name)


__version__ = "0.1.0"
