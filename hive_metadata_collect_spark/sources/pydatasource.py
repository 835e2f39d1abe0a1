"""Spark 4 Python Data Source API demo — a custom PARTITIONED source
serving deterministic Hive-metastore-shaped rows (`DBS`/`TBLS`
denormalized), the live-path surface a metadata collector reads in
production (there via JDBC; here via the new-in-Spark-4
`pyspark.sql.datasource` API so the connector pattern itself is
exercised and testable offline).

Scale notes: `partitions()` is the datasource's parallelism contract —
each InputPartition becomes one Spark task reading an independent key
range (exactly how a JDBC `partitionColumn/lowerBound/upperBound` read
shards the metastore). The generator yields plain tuples; Arrow
batching happens in the executor shim.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from hive_metadata_collect_spark.registry import register

#: deterministic catalog shape: 4 read partitions × 25 tables
_N_PARTS = 4
_TBLS_PER_PART = 25
_EPOCH = datetime.datetime(2024, 1, 1)

_SCHEMA = (
    "tbl_id int, db_name string, tbl_name string, owner string, "
    "tbl_type string, create_time timestamp"
)


class MetastoreSource(DataSource):
    """`format("hmcs_metastore")` — deterministic TBLS⋈DBS rows."""

    @classmethod
    def name(cls) -> str:
        return "hmcs_metastore"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> "MetastoreReader":
        return MetastoreReader()

    def simpleStreamReader(self, schema) -> "MetastoreStreamReader":
        return MetastoreStreamReader()


class MetastoreReader(DataSourceReader):
    def partitions(self):
        # one task per key range — the JDBC partitionColumn pattern
        return [InputPartition(i) for i in range(_N_PARTS)]

    def read(self, partition):
        base = partition.value * _TBLS_PER_PART
        for j in range(_TBLS_PER_PART):
            tbl_id = base + j
            yield (
                tbl_id,
                f"db_{tbl_id % 10}",
                f"tbl_{tbl_id}",
                f"owner_{tbl_id % 7}",
                "MANAGED_TABLE" if tbl_id % 5 else "EXTERNAL_TABLE",
                _EPOCH + datetime.timedelta(days=tbl_id),
            )


@register(
    "src_python_datasource",
    survey_row=75,
    oracle="""
    WITH t AS (
        SELECT i AS tbl_id,
               'db_' || (i % 10) AS db_name,
               'owner_' || (i % 7) AS owner,
               CASE WHEN i % 5 = 0 THEN 'EXTERNAL_TABLE'
                    ELSE 'MANAGED_TABLE' END AS tbl_type,
               TIMESTAMP '2024-01-01' + INTERVAL (i) DAY AS create_time
        FROM unnest(range(100)) AS u(i)
    )
    SELECT db_name,
           count(*)::BIGINT AS n_tables,
           count(DISTINCT owner)::BIGINT AS n_owners,
           sum(CASE WHEN tbl_type = 'EXTERNAL_TABLE' THEN 1 ELSE 0 END)::BIGINT
               AS n_external,
           max(create_time) AS newest_table
    FROM t
    GROUP BY db_name
    """,
)
def src_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read through the custom Python Data Source (Spark 4 API) and
    roll the metastore rows up per database — the collector's
    inventory query running against a CONNECTOR instead of parquet.
    The source reports 4 input partitions, so the scan runs as 4
    parallel tasks (the JDBC key-range sharding pattern); the oracle
    regenerates the same deterministic rows relationally. sf_dir is
    unused: the source IS the data (a live connector has no fixture
    directory), which is exactly what the API demonstrates."""
    spark.dataSource.register(MetastoreSource)
    t = spark.read.format("hmcs_metastore").load()
    return t.groupBy("db_name").agg(
        F.count(F.lit(1)).alias("n_tables"),
        F.countDistinct("owner").alias("n_owners"),
        F.sum(
            F.when(F.col("tbl_type") == "EXTERNAL_TABLE", 1).otherwise(0)
        ).alias("n_external"),
        F.max("create_time").alias("newest_table"),
    )


class MetastoreStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the connector: the audit-log tail a collector
    ingests incrementally. Offsets are plain dicts ({"tbl_id": n} —
    the high-watermark pattern of any CDC/JDBC incremental pull);
    each micro-batch serves the rows between two watermarks. Spark
    checkpoints the offset, so restarts resume exactly where the
    previous run stopped (exercised in tests/test_streaming.py)."""

    def initialOffset(self) -> dict:
        return {"tbl_id": 0}

    def read(self, start: dict):
        lo = start["tbl_id"]
        hi = min(lo + _TBLS_PER_PART, _N_PARTS * _TBLS_PER_PART)
        # the runner calls next() on this AND pickles it into its
        # prefetch cache → must be an ITERATOR that pickles: a
        # list-iterator is both (a generator pickles not at all, a
        # bare list iterates not at all)
        return iter(_rows_between(lo, hi)), {"tbl_id": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(_rows_between(start["tbl_id"], end["tbl_id"]))


def _rows_between(lo: int, hi: int) -> list:
    return [
        (
            tbl_id,
            f"db_{tbl_id % 10}",
            f"tbl_{tbl_id}",
            f"owner_{tbl_id % 7}",
            "MANAGED_TABLE" if tbl_id % 5 else "EXTERNAL_TABLE",
            _EPOCH + datetime.timedelta(days=tbl_id),
        )
        for tbl_id in range(lo, hi)
    ]
