"""Sort / limit / top-k / set operators — SURVEY.md §2.6 (#36–41).

Scale notes: #37 compiles to TakeOrderedAndProject — per-partition
top-k heaps + a k-row driver merge, never a global sort. #36's global
sort is a range-partitioned exchange (sampled bounds), the one
operator here that genuinely needs a full shuffle. Set ops are
hash-based: union is free (no shuffle), distinct/intersect/except
shuffle on the full row hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_metadata_collect_spark.registry import register
from hive_metadata_collect_spark.sources.fixtures import load_table


@register(
    "sort_multikey_nulls",
    survey_row=36,
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    ORDER BY o_orderstatus ASC NULLS LAST, o_totalprice DESC NULLS LAST,
             o_orderkey ASC
    LIMIT 100
    """,
)
def sort_multikey_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null placement; LIMIT makes the
    sort order observable through the order-insensitive oracle hash."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(
            F.col("o_orderstatus").asc_nulls_last(),
            F.col("o_totalprice").desc_nulls_last(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


@register(
    "limit_topk_global",
    survey_row=37,
    oracle="""
    SELECT o_custkey, round(sum(o_totalprice), 2) AS sum_spent
    FROM orders
    GROUP BY o_custkey
    ORDER BY sum_spent DESC, o_custkey ASC
    LIMIT 10
    """,
)
def limit_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 customers by spend. orderBy().limit() is planned
    as TakeOrderedAndProject (per-partition heaps, no global sort);
    ordering on the ROUNDED measure keeps rank boundaries engine-
    deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("sum_spent"))
        .orderBy(F.col("sum_spent").desc(), F.col("o_custkey").asc())
        .limit(10)
    )


@register(
    "set_union_all",
    survey_row=38,
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (duplicates kept — rows in both slices appear twice)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderpriority"
    )
    b = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderpriority"
    )
    return a.unionAll(b)


@register(
    "set_union_distinct",
    survey_row=39,
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union (one hash-distinct shuffle after the free bag union)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderpriority"
    )
    b = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderpriority"
    )
    return a.union(b).distinct()


@register(
    "set_intersect",
    survey_row=40,
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct keys present in both sets (left-semi under the hood)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return building.intersect(big)


@register(
    "set_except",
    survey_row=41,
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct keys in A but not B (left-anti under the hood)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return building.subtract(big)


@register(
    "set_intersect_all",
    survey_row=40,
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 200000
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL: duplicates survive up to the minimum
    multiplicity on each side (the bag-semantics sibling of #40's
    set intersect)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 200000).select("o_custkey")
    return a.intersectAll(b)


@register(
    "set_except_all",
    survey_row=41,
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 200000
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL: each left occurrence is cancelled by at
    most one right occurrence (bag difference). Completes the bag
    set-op pair with set_intersect_all; like it, Spark plans this as
    a single hash aggregation counting multiplicities per side — one
    shuffle on the value, no join."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 200000).select("o_custkey")
    return a.exceptAll(b)


@register(
    "sort_skyline_2d",
    survey_row=36,
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
    """,
)
def sort_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts not strictly dominated on
    (price low, size high). The naive formulation is an all-pairs
    NOT EXISTS (the oracle — quadratic); the distributed form used
    here is linear: reduce to one max-size row per distinct price
    (hash agg), compute the running best size over STRICTLY cheaper
    prices on that bounded aggregate (window over |distinct prices|
    rows), then broadcast the per-price frontier back onto the fact.
    A row survives iff it carries its price group's max size AND
    beats every cheaper group's best. At 100 TB the window input is
    the distinct-price aggregate (bounded, e.g. cents-grid), never
    the fact table, and the join-back is a broadcast."""
    from pyspark.sql import Window

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    per_price = p.groupBy("p_retailprice").agg(
        F.max("p_size").alias("best_here")
    )
    w = Window.orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier = per_price.withColumn("best_cheaper", F.max("best_here").over(w))
    return (
        p.join(F.broadcast(frontier), "p_retailprice")
        .filter(
            (F.col("p_size") == F.col("best_here"))
            & (
                F.col("best_cheaper").isNull()
                | (F.col("p_size") > F.col("best_cheaper"))
            )
        )
        .select("p_partkey", "p_retailprice", "p_size")
    )


@register(
    "set_union_by_name",
    survey_row=38,
    oracle="""
    SELECT o_orderkey AS rec_key, o_totalprice AS amount,
           o_orderpriority AS priority
    FROM orders WHERE o_orderstatus = 'O'
    UNION ALL BY NAME
    SELECT c_custkey AS rec_key, c_acctbal AS amount,
           c_mktsegment AS segment
    FROM customer WHERE c_acctbal > 5000
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two feeds whose schemas drifted apart
    (each has a column the other lacks) unioned BY NAME, missing
    columns null-filled — `unionByName(allowMissingColumns=True)`,
    the call a long-lived ingest pipeline makes when v2 of a feed
    adds a field. Positional unionAll would mis-bind columns here.
    No shuffle: union is plan-level concatenation."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("rec_key"),
        F.col("o_totalprice").alias("amount"),
        F.col("o_orderpriority").alias("priority"),
    )
    b = c.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("rec_key"),
        F.col("c_acctbal").alias("amount"),
        F.col("c_mktsegment").alias("segment"),
    )
    return a.unionByName(b, allowMissingColumns=True)
