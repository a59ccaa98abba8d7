"""Checkpointed flagship runner — resumable, with lineage + metrics.

Splits the flagship into restartable stages, each committed as partitioned
parquet with a lineage sidecar (state/checkpoint.py). A rerun with the same
config + input fingerprint skips finished stages (north_rule: "resumable
from checkpoint with per-partition lineage + metrics").
"""

from __future__ import annotations

import os
from typing import Sequence

import ray.data

from dedupe_ray.config import NearDupConfig
from dedupe_ray.pipelines.neardup import assign_clusters, match_edges, signatures_dataset
from dedupe_ray.stages.clustering import connected_components
from dedupe_ray.state.checkpoint import CheckpointedRun

__all__ = ["run_neardup_checkpointed"]


def _input_fingerprint(paths: Sequence[str]) -> str:
    """Cheap stable fingerprint of the input files (path, size, mtime)."""
    import hashlib

    h = hashlib.sha256()
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{p}:{st.st_size}:{int(st.st_mtime)}".encode())
    return h.hexdigest()[:16]


def run_neardup_checkpointed(
    input_paths: Sequence[str],
    out_root: str,
    config: NearDupConfig | None = None,
    extract: bool = True,
    quarantine: bool = False,
) -> dict:
    """read input parquet → checkpointed signatures / edges / clusters /
    final assignment under ``out_root``. Returns the run metrics.

    ``quarantine=True`` routes rows whose extraction produced no text to a
    ``quarantine`` checkpoint instead of signing them (drop-and-continue,
    /root/reference/dedupe.go:55-58, but with the dropped records kept
    auditable instead of discarded)."""
    config = config or NearDupConfig()
    run = CheckpointedRun(out_root, config.config_hash(), _input_fingerprint(input_paths))

    if extract and quarantine:
        import pyarrow.compute as pc

        from dedupe_ray.stages.extract import ExtractText

        def _extracted():
            from dedupe_ray.sources import read_pages

            return read_pages(list(input_paths)).map_batches(
                lambda b: ExtractText(mark_quarantine=True)(b),
                batch_format="pyarrow", batch_size=None,
            )

        run.stage(
            "quarantine",
            lambda: _extracted().map_batches(
                lambda b: b.filter(pc.equal(b.column("extract_ok"), False))
                .select(["url", "warc_ts"]),
                batch_format="pyarrow",
            ),
        )
        sigs = run.stage(
            "signatures",
            lambda: signatures_dataset(
                _extracted().map_batches(
                    lambda b: b.filter(pc.equal(b.column("extract_ok"), True))
                    .drop_columns(["extract_ok"]),
                    batch_format="pyarrow",
                ),
                config,
                extract=False,
            ),
            upstream=["quarantine"],
        )
    else:
        from dedupe_ray.sources import read_pages

        sigs = run.stage(
            "signatures",
            lambda: signatures_dataset(read_pages(list(input_paths)), config,
                                       extract=extract),
        )
    edges = run.stage(
        "edges",
        # row count from the signatures checkpoint's lineage sidecar (or its
        # parquet footers) — the metadata path: no materialize, no
        # double-execution of the checkpoint read (VERDICT r4 #6)
        lambda: match_edges(sigs, config, n_rows=run.stage_rows("signatures")),
        upstream=["signatures"],
    )
    clusters = run.stage(
        "clusters",
        lambda: connected_components(
            edges.materialize(), method=config.cc_method,
            local_max_edges=config.cc_local_max_edges,
        ),
        upstream=["edges"],
    )
    def _assignment():
        out = assign_clusters(sigs, clusters)
        # drop columns by what the OUTPUT actually carries — the join
        # stamping path already excludes the heavy signature columns, and
        # dropping by the input schema would crash there
        heavy = [c for c in ("minhash", "simhash", "text", "html")
                 if c in out.schema().names]
        return out.drop_columns(heavy) if heavy else out

    run.stage("assignment", _assignment, upstream=["signatures", "clusters"])
    run.write_run_manifest()
    return run.metrics
