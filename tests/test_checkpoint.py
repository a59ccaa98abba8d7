"""Checkpoint/resume + CLI tests."""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dedupe_ray.config import NearDupConfig
from dedupe_ray.fixtures.pages import generate_pages


@pytest.fixture(scope="module")
def pages_parquet(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages_in")
    f = generate_pages(n_pages=300, seed=42)
    pq.write_table(f.pages, str(d / "pages.parquet"))
    return str(d / "pages.parquet")


def test_checkpointed_run_and_resume(ray_session, pages_parquet, tmp_path):
    from dedupe_ray.pipelines.runner import run_neardup_checkpointed

    out = str(tmp_path / "run1")
    m1 = run_neardup_checkpointed([pages_parquet], out, NearDupConfig())
    assert not m1["signatures"].get("resumed")
    assert m1["assignment"]["rows"] == 300
    for stage in ("signatures", "edges", "clusters", "assignment"):
        assert os.path.exists(os.path.join(out, stage, "_LINEAGE.json")), stage
        lin = json.load(open(os.path.join(out, stage, "_LINEAGE.json")))
        assert lin["config_hash"] == NearDupConfig().config_hash()
        assert "wall_sec" in lin and "rows" in lin

    # resume: everything skipped
    m2 = run_neardup_checkpointed([pages_parquet], out, NearDupConfig())
    assert all(m2[s].get("resumed") for s in ("signatures", "edges", "clusters", "assignment"))

    # invalidate one mid stage → downstream recomputes, upstream resumes
    shutil.rmtree(os.path.join(out, "edges"))
    m3 = run_neardup_checkpointed([pages_parquet], out, NearDupConfig())
    assert m3["signatures"].get("resumed")
    assert not m3["edges"].get("resumed")

    # config change → full recompute
    m4 = run_neardup_checkpointed(
        [pages_parquet], out, NearDupConfig().with_threshold(0.7)
    )
    assert not m4["signatures"].get("resumed")


def test_cli_dedup_and_compare(ray_session, pages_parquet, tmp_path, capsys):
    from dedupe_ray.cli import main

    out = str(tmp_path / "cli_out")
    rc = main(
        ["dedup", "--input", pages_parquet, "--output", out, "--keep-canonical-only"]
    )
    assert rc == 0
    surv = pq.read_table(f"{out}/survivors")
    assign = pq.read_table(f"{out}/assignment")
    assert 0 < surv.num_rows < assign.num_rows
    assert set(surv.column("is_canonical").to_pylist()) == {True}

    f = generate_pages(n_pages=300, seed=42)
    target_url = f.pages.column("url").to_pylist()[0]
    rc = main(
        ["compare", "--input", pages_parquet, "--no-extract", "--target-url", target_url]
    )
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("https://")]
    assert any(target_url in l for l in lines)


def test_empty_stage_checkpoint_roundtrip(ray_session, pages_parquet, tmp_path):
    """A stage producing ZERO rows (e.g. nothing quarantined) must still
    commit a readable checkpoint and resume cleanly."""
    from dedupe_ray.pipelines.runner import run_neardup_checkpointed

    out = str(tmp_path / "qrun")
    m = run_neardup_checkpointed([pages_parquet], out, NearDupConfig(), quarantine=True)
    assert m["quarantine"]["rows"] == 0  # fixture pages all extract fine
    assert m["assignment"]["rows"] == 300
    m2 = run_neardup_checkpointed([pages_parquet], out, NearDupConfig(), quarantine=True)
    assert m2["quarantine"].get("resumed")
