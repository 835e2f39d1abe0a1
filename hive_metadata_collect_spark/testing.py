"""Local oracle-parity gate (SURVEY.md §5.3).

Runs a registered operator's Spark DataFrame and its DuckDB oracle SQL
on the same fixture dir and compares row count, column-name set, and an
order-insensitive canonical value rendering — a strictly-stricter local
stand-in for the driver's t2 hash. Operators are only *declared*
(registered with an oracle) after passing this gate.
"""

from __future__ import annotations

import datetime
import math
import os
from decimal import Decimal

import duckdb
import numpy as np

from hive_metadata_collect_spark.sources.fixtures import TABLES

# Floats rendered at 12 significant digits: engine-order-dependent
# accumulations are explicitly ROUNDed identically on both sides, so
# any residual diff at 12g is a real semantic divergence.
_FLOAT_FMT = ".12g"


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET timezone='UTC'")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):  # multi-file table (tools/make_sf10x.py)
            path = os.path.join(path, "*.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float) or isinstance(v, np.floating):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # collapse -0.0
        return format(float(v), _FLOAT_FMT)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, Decimal):
        return format(float(v), _FLOAT_FMT)
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat(timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "{"
            + ",".join(f"{k}:{canon_value(v[k])}" for k in sorted(v))
            + "}"
        )
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    """Column-name-sorted, order-insensitive canonical form."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(canon_value(row[i]) for i in order) for row in rows)


def compare_frames(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    """Assert Spark result == DuckDB result (raises AssertionError)."""
    spark_cols = list(spark_df.columns)
    spark_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = canon_rows(spark_cols, spark_rows)
    d = canon_rows(duck_cols, duck_rows)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        raise AssertionError(
            f"value mismatch ({sum(1 for a, b in zip(s, d) if a != b)} rows differ); "
            f"first diffs (spark, duck): {diffs}"
        )
