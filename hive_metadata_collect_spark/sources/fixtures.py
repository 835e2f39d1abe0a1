"""Parquet fixture sources (TESTDATA.md).

At fixture scale these are single files; at 100 TB the same call reads
a date-partitioned parquet/iceberg layout and Catalyst applies
partition pruning + predicate pushdown + column pruning automatically —
operators therefore always express filters/projections declaratively
and never pre-materialize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
        # rejects outright. Read nanos as raw long, then floor-truncate
        # to a microsecond timestamp — identical to DuckDB's ns→µs
        # conversion, so oracle timestamps hash-match.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
