"""Per-stage checkpointing with lineage + metrics sidecars and resume.

The reference recomputes everything on every run (SURVEY.md §4.1 —
"Checkpoint / resume: none"). At 10^12 documents a restart must skip
finished work (north_rule: "resumable from checkpoint with per-partition
lineage + metrics"). Layout:

    <root>/<stage>/part-*.parquet     stage output (partitioned parquet,
                                      many files — never one giant file)
    <root>/<stage>/_LINEAGE.json      config hash, input fingerprint, row
                                      count, wall time, ray version —
                                      written AFTER the data (atomic-rename
                                      of the temp dir makes it the commit
                                      marker)

``stage(name, fn)`` runs ``fn`` → Dataset → write_parquet, or skips and
re-reads when a matching _LINEAGE.json (same config hash + same upstream
fingerprint) already exists. Writes go to ``<stage>.tmp-<pid>`` and are
renamed into place, so a crashed writer can never be mistaken for a
finished stage.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import time

import ray
import ray.data

logger = logging.getLogger(__name__)

__all__ = ["CheckpointedRun"]

_LINEAGE = "_LINEAGE.json"


class CheckpointedRun:
    def __init__(self, root: str, config_hash: str, input_fingerprint: str = ""):
        self.root = root
        self.config_hash = config_hash
        self.input_fingerprint = input_fingerprint
        self.metrics: dict[str, dict] = {}
        os.makedirs(root, exist_ok=True)

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _lineage_path(self, name: str) -> str:
        return os.path.join(self._stage_dir(name), _LINEAGE)

    def stage_rows(self, name: str) -> int | None:
        """Row count of a finished stage from its lineage sidecar, falling
        back to the checkpoint's parquet footers — metadata only, never
        executes a Dataset. Lets downstream sizing decisions (e.g.
        ``match_edges`` band bundling) avoid materializing the stage read."""
        try:
            with open(self._lineage_path(name)) as f:
                rows = json.load(f).get("rows")
            if isinstance(rows, int):
                return rows
        except (OSError, json.JSONDecodeError):
            pass
        from dedupe_ray.sources.pages import parquet_row_count

        d = self._stage_dir(name)
        return parquet_row_count(d) if os.path.isdir(d) else None

    def completed(self, name: str, upstream: list[str]) -> bool:
        p = self._lineage_path(name)
        if not os.path.exists(p):
            return False
        try:
            with open(p) as f:
                lin = json.load(f)
        except (OSError, json.JSONDecodeError):
            return False
        return (
            lin.get("config_hash") == self.config_hash
            and lin.get("input_fingerprint") == self.input_fingerprint
            and lin.get("upstream") == upstream
        )

    def stage(
        self,
        name: str,
        fn,
        upstream: list[str] | None = None,
        extra_metrics: dict | None = None,
        partition_cols: list[str] | None = None,
    ) -> "ray.data.Dataset":
        """Run (or resume) one stage. ``fn() -> Dataset``; the result is
        written to partitioned parquet and re-read, so downstream stages
        consume the checkpoint, not the live lineage. ``partition_cols``
        hive-partitions the stage output (one directory per value) so later
        consumers can PRUNE whole partitions by path."""
        upstream = upstream or []
        final = self._stage_dir(name)
        if self.completed(name, upstream):
            logger.info("stage %s: resume from checkpoint %s", name, final)
            self.metrics[name] = {"resumed": True}
            return ray.data.read_parquet(final)
        tmp = f"{final}.tmp-{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        t0 = time.monotonic()
        ds = fn()
        if partition_cols:
            ds.write_parquet(tmp, partition_cols=partition_cols)
        else:
            ds.write_parquet(tmp)
        # a zero-row dataset writes NO files — commit an explicit empty
        # parquet so the checkpoint stays readable (schema preserved)
        os.makedirs(tmp, exist_ok=True)
        import glob as _glob

        if not _glob.glob(os.path.join(tmp, "**", "*.parquet"), recursive=True):
            import pyarrow as pa
            import pyarrow.parquet as pq

            schema = ds.schema()
            arrow_schema = getattr(schema, "base_schema", None) if schema else None
            empty = (
                pa.table(
                    {f.name: pa.nulls(0, f.type) for f in arrow_schema}
                )
                if arrow_schema is not None
                else pa.table({"__empty__": pa.nulls(0, pa.int8())})
            )
            pq.write_table(empty, os.path.join(tmp, "empty.parquet"))
        wall = time.monotonic() - t0
        out = ray.data.read_parquet(tmp)
        n_rows = out.count()
        lineage = {
            "stage": name,
            "config_hash": self.config_hash,
            "input_fingerprint": self.input_fingerprint,
            "upstream": upstream,
            "rows": n_rows,
            "wall_sec": round(wall, 3),
            "ray_version": ray.__version__,
            **(extra_metrics or {}),
        }
        with open(os.path.join(tmp, _LINEAGE), "w") as f:
            json.dump(lineage, f, indent=2)
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)
        self.metrics[name] = lineage
        logger.info("stage %s: %d rows in %.2fs → %s", name, n_rows, wall, final)
        return ray.data.read_parquet(final)

    def write_run_manifest(self) -> None:
        with open(os.path.join(self.root, "_RUN.json"), "w") as f:
            json.dump(
                {
                    "config_hash": self.config_hash,
                    "input_fingerprint": self.input_fingerprint,
                    "stages": self.metrics,
                },
                f,
                indent=2,
            )
