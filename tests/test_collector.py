"""Collector product-surface tests: run_collection persists every
catalog artifact and the snapshot diff classifies changes correctly."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hive_metadata_collect_spark.collector import (
    ARTIFACTS,
    run_collection,
    snapshot_diff,
)


def test_run_collection_writes_all_artifacts(spark, sf_dir, tmp_path):
    out = str(tmp_path / "snap1")
    manifest = run_collection(spark, sf_dir, out)
    rows = {r["artifact"]: r["n_rows"] for r in manifest.collect()}
    assert set(rows) == set(ARTIFACTS)
    assert all(n > 0 for n in rows.values()), rows
    # read one artifact back and sanity-check its schema
    inv = spark.read.parquet(f"{out}/metastore_denorm")
    assert {"db_name", "table_name", "n_columns", "n_rows"} <= set(inv.columns)


def test_snapshot_diff_classifies_changes(spark, sf_dir, tmp_path):
    prev = str(tmp_path / "prev")
    cur = str(tmp_path / "cur")
    base = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "table_name string, n_rows long"
    )
    base.write.mode("overwrite").parquet(f"{prev}/table_stats")
    changed = spark.createDataFrame(
        [("a", 1), ("b", 20), ("d", 4)], "table_name string, n_rows long"
    )
    changed.write.mode("overwrite").parquet(f"{cur}/table_stats")
    out = {
        r["table_name"]: r["change_type"]
        for r in snapshot_diff(spark, prev, cur, "table_stats", "table_name").collect()
    }
    assert out == {
        "a": "unchanged",
        "b": "changed",
        "c": "delete",
        "d": "insert",
    }
