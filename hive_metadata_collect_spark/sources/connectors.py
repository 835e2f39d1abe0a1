"""Live connectors for a production deployment — SURVEY.md §2.1.

A Hive-metadata collector's real inputs are (a) the metastore RDBMS
and (b) an audit/query-log stream; its outputs land in a reporting
store. None of these endpoints exist in this offline environment, so
each connector validates its arguments eagerly and defers the network
touch to Spark's own datasource (jdbc/kafka) — the operator surface
is identical on a cluster.

Scale notes: JDBC reads MUST be partitioned (partitionColumn/bounds/
numPartitions) or the whole table funnels through one task; Kafka
parallelism follows topic partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# The public Hive metastore schema tables a collector reads
# (Apache Hive metastore DDL — public knowledge; SURVEY.md §1.1).
METASTORE_TABLES = [
    "DBS",
    "TBLS",
    "SDS",
    "COLUMNS_V2",
    "PARTITIONS",
    "PARTITION_KEYS",
    "PARTITION_KEY_VALS",
    "TABLE_PARAMS",
    "PARTITION_PARAMS",
    "SERDES",
    "SERDE_PARAMS",
]


def read_metastore_table(
    spark: SparkSession,
    jdbc_url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 16,
    **options: str,
) -> DataFrame:
    """Read one Hive-metastore table over JDBC as a DataFrame.

    Example (live cluster):
        read_metastore_table(spark, "jdbc:mysql://ms:3306/hive", "TBLS",
                             partition_column="TBL_ID",
                             lower_bound=0, upper_bound=10_000_000)
    """
    if table not in METASTORE_TABLES:
        raise KeyError(f"not a Hive metastore table: {table!r}")
    reader = (
        spark.read.format("jdbc")
        .option("url", jdbc_url)
        .option("dbtable", table)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower/upper bounds")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_audit_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Audit/query-log stream from Kafka (value = JSON event payload);
    pipe into streaming/streams.py operators after from_json."""
    if not bootstrap_servers or not topic:
        raise ValueError("bootstrap_servers and topic are required")
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def write_report(
    df: DataFrame, jdbc_url: str, table: str, mode: str = "append", **options: str
) -> None:
    """Sink a collector result frame to the reporting RDBMS."""
    writer = df.write.format("jdbc").option("url", jdbc_url).option(
        "dbtable", table
    ).mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
