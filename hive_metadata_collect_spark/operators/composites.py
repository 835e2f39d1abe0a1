"""Composite analytical queries — full TPC-H-shaped pipelines that
exercise many operators at once (scan → filter → multi-join → agg →
sort/limit). These are the end-to-end shapes a catalog's reporting
layer actually runs; each is a single declarative plan so Catalyst
can reorder joins, push predicates into every scan, and pick
broadcast sides from stats.

Scale notes: every composite keeps the fact table (lineitem) on the
probe side of broadcast joins and aggregates BEFORE the final sort;
top-k sorts compile to TakeOrderedAndProject (per-partition heaps, no
global sort). Money math uses DECIMAL where exactness matters
(agg_decimal_money) — float sums drift at 100 TB row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hive_metadata_collect_spark.registry import register
from hive_metadata_collect_spark.sources.fixtures import load_table


@register(
    "tpch_q3_shipping_priority",
    survey_row=9,
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1997-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customers ⋈ date-bounded orders
    ⋈ late-shipped lineitems → top-10 open orders by revenue. The two
    dimension sides are filtered first so stats-based broadcast picks
    them; lineitem never shuffles before the aggregate. Final ordering
    is deterministic (revenue DESC, then keys) so the oracle hash is
    stable."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1997-01-01"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q10_returned_items",
    survey_row=9,
    oracle="""
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           c.c_acctbal, n.n_name, c.c_mktsegment
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name, c.c_mktsegment
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer in
    one order-date year — 3 dimension joins onto the filtered fact,
    then top-20. nation is broadcast unconditionally (25 rows);
    customer/orders go through stats-based selection."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "c_custkey", "c_name", "revenue", "c_acctbal", "n_name",
            "c_mktsegment",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "win_range_interval_frame",
    survey_row=33,
    oracle="""
    SELECT event_id, user_id, ts,
           round(avg(value) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ), 4) AS avg_1h,
           count(*) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           )::BIGINT AS n_1h
    FROM events
    WHERE user_id % 50 = 0
    """,
)
def win_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window: per-user trailing-1-hour average and
    count at every event — the sensor-rollup frame ROWS windows can't
    express (row offsets ≠ time offsets under irregular sampling).
    Spark's rangeBetween needs a numeric ordering column, so ts is
    ordered as epoch MICROseconds with a 3_600_000_000-µs trailing
    frame — exactly equivalent to the oracle's INTERVAL 1 HOUR frame
    on microsecond timestamps, including peer semantics (only
    exact-ts ties are RANGE peers; epoch *seconds* would truncate and
    merge same-second events into one peer group). One shuffle on
    user_id; the frame scan is a single sorted pass per partition."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 50 == 0
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.avg("value").over(w), 4).alias("avg_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


@register(
    "tpch_q18_large_orders",
    survey_row=23,
    oracle="""
    WITH big AS (
        SELECT l_orderkey
        FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(l_quantity) > 150
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM orders o
    JOIN big ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 25
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a
    threshold — a HAVING-filtered aggregate of the fact used as a semi
    filter back onto the fact. The `big` keys frame is aggregated
    FIRST (|orders|-bounded, heavily filtered by the HAVING) so AQE
    can broadcast it into both probe joins; lineitem is scanned twice
    but never shuffled on a non-key."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(li.select("l_orderkey", "l_quantity"), "l_orderkey")
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )


@register(
    "tpch_q12_shipmode",
    survey_row=23,
    oracle="""
    SELECT l_linestatus,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_returnflag IN ('R', 'A')
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
)
def tpch_q12_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape on the fixture's columns (the fixture lineitem
    carries no shipmode/commitdate/receiptdate, so the channel is
    l_linestatus and the line filter is returnflag + a one-year
    shipdate band): urgent-vs-other priority split per line status —
    the conditional two-channel aggregation pattern (one pass, two
    CASE counters; never two filtered scans). The IN-list and both
    date predicates push into the lineitem scan; orders contributes
    only o_orderpriority, so the join input is two narrow columns and
    AQE broadcasts the smaller side. Single shuffle: the 2-group
    final agg."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "A")
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q14_promo_share",
    survey_row=23,
    oracle="""
    SELECT round(
               100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                THEN l_extendedprice * (1 - l_discount)
                                ELSE 0 END)
               / sum(l_extendedprice * (1 - l_discount)), 4
           ) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate < DATE '1996-02-01'
    """,
)
def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — a conditional numerator
    over a global denominator computed in ONE aggregation (the
    two-scan formulation doubles the join). The one-month shipdate
    predicate pushes into the lineitem scan; part contributes only
    p_type, a narrow broadcastable side. Output is a single ratio
    row — the shuffle carries two partial sums per task."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0.0)
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias(
                "promo_revenue_pct"
            )
        )
    )


@register(
    "tpch_q6_forecast_revenue",
    survey_row=23,
    oracle="""
    SELECT round(sum(l_extendedprice::DECIMAL(12,2)
                      * l_discount::DECIMAL(12,2)), 2)::DOUBLE AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate forecast — no join at all.
    All four predicates (date band, discount band, quantity cap) push
    into the parquet scan as PushedFilters; the plan is a single
    whole-stage-codegen span ending in a 1-row partial+final agg, the
    cheapest possible shape at any scale (bytes read is the only
    cost)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        # DECIMAL accumulation (r9 sf10 sweep class), DOUBLE out
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * F.col("l_discount").cast("decimal(12,2)")
            ),
            2,
        )
        .cast("double")
        .alias("revenue")
    )


@register(
    "tpch_q5_local_supplier_volume",
    survey_row=23,
    oracle="""
    SELECT n_name,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                          (CAST(1 AS DECIMAL(5,4)) -
                           CAST(l_discount AS DECIMAL(5,4)))), 2)
                AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue from LOCAL fulfilment (customer and supplier
    share a nation) per Asian nation — the classic 6-table star with a
    non-key equality (c_nationkey = s_nationkey) riding on the
    supplier join. nation⋈region pre-filters to the 5 Asian nations
    and broadcasts; supplier is dim-sized and broadcasts; lineitem
    shuffles once for the orders join (the only big⋈big edge), and
    the 5-group agg is map-side combined."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asian_nations = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select("n_nationkey", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(
            F.broadcast(asian_nations),
            s.s_nationkey == asian_nations.n_nationkey,
        )
        .groupBy("n_name")
        .agg(
            # DECIMAL accumulation (the join_multiway_star r7 fix):
            # round(sum(double),2) flips its last cent by one ULP at
            # sf1 — caught by the full sf1 sweep this round
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    * (
                        F.lit(1).cast("decimal(5,4)")
                        - F.col("l_discount").cast("decimal(5,4)")
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "tpch_q4_order_priority",
    survey_row=23,
    oracle="""
    SELECT o_orderpriority, count(*)::BIGINT AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (fixture has no commitdate/receiptdate, so "late"
    is shipped >30 days after order date): priority histogram of H1-1996
    orders with at least one late line — the EXISTS compiles to a LEFT
    SEMI join, so lineitem rows are never duplicated into the agg and
    each order is counted exactly once. The date band pushes into the
    orders scan; the semi join is the one shuffle."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (
                li.l_shipdate
                > o.o_orderdate + F.expr("INTERVAL 30 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q7_volume_shipping",
    survey_row=23,
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           year(l_shipdate)::INT AS l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_13')
        OR (n1.n_name = 'NATION_13' AND n2.n_name = 'NATION_12'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by ship
    year. The nation pair predicate is applied to the two BROADCAST
    nation dims (each filtered to 2 rows before the join), so the
    disjunction prunes suppliers and customers before lineitem ever
    joins orders — the OR never becomes a join condition, which would
    defeat hash-join planning."""
    pair = ("NATION_12", "NATION_13")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*pair)
    )
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    sn = s.join(F.broadcast(n1), s.s_nationkey == F.col("n1_key")).select(
        "s_suppkey", "supp_nation"
    )
    cn = c.join(F.broadcast(n2), c.c_nationkey == F.col("n2_key")).select(
        "c_custkey", "cust_nation"
    )
    return (
        li.join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cn, o.o_custkey == cn.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q8_market_share",
    survey_row=23,
    oracle="""
    SELECT year(o_orderdate)::INT AS o_year,
           round(sum(CASE WHEN n2.n_name = 'NATION_3'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4
           ) AS mkt_share
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
    JOIN region r ON n1.n_regionkey = r.r_regionkey
    JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    WHERE r_name = 'AMERICA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND p_type = 'ECONOMY'
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of ECONOMY-part volume sold into
    the AMERICA region, by order year — numerator and denominator in
    ONE aggregation (conditional sum / total sum), never two scans.
    All four dims (part filtered to one type, supplier+nation flag,
    customer-nations-in-region) broadcast; lineitem⋈orders is the
    single big shuffle."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    amer_keys = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("amer_nationkey")
    )
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(amer_keys),
        F.col("c_nationkey") == F.col("amer_nationkey"),
    ).select("c_custkey")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.round(F.sum(target) / F.sum(vol), 4).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "tpch_q9_product_profit",
    survey_row=23,
    oracle="""
    SELECT n_name AS nation,
           year(o_orderdate)::INT AS o_year,
           round(sum(l_extendedprice::DECIMAL(12,2)
                         * (1 - l_discount::DECIMAL(12,2))
                     - 0.5 * p_retailprice::DECIMAL(12,2)
                         * l_quantity::DECIMAL(12,2)), 2)::DOUBLE AS sum_profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p_name LIKE '%rod%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (fixture has no partsupp, so unit cost is proxied
    at half retail price): profit on '%rod%' parts per supplier nation
    per order year. The LIKE filter prunes part BEFORE broadcast;
    supplier⋈nation folds to a 10-row broadcast dim; lineitem⋈orders
    is the one big shuffle and the agg is map-side combined on
    (nation, year). The amount mixes a SUBTRACTION of two float
    products — the one shape where round(sum,2) flips last-ULP
    between engines — so the money math runs on DECIMAL(12,2) (exact,
    associative) per the agg_decimal_money convention. The FINAL
    rounded sum is then cast to DOUBLE on both engines: the driver's
    pandas-path hash is dtype-sensitive (Spark DECIMAL -> object
    Decimals, DuckDB -> float64 — the r8 hash miss), and a post-round
    2-dp value is exactly representable enough that the double cast
    is presentation-only."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("rod")
    ).select("p_partkey", "p_retailprice")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    d = lambda c: F.col(c).cast("decimal(12,2)")
    amount = (
        d("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - d("l_discount"))
        - F.lit("0.5").cast("decimal(2,1)") * d("p_retailprice") * d("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "nation", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(F.round(F.sum(amount), 2).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "tpch_q13_customer_distribution",
    survey_row=23,
    oracle="""
    SELECT c_count, count(*)::BIGINT AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (fixture orders carry no comment column, so the
    exclusion rides on o_orderpriority): order-count histogram over ALL
    customers including zero-order ones — the left join with the
    exclusion predicate IN the join condition (not WHERE, which would
    turn it inner). Two aggregations: per-customer count (shuffle on
    custkey) then the tiny histogram rollup."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "tpch_q15_top_supplier",
    survey_row=23,
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               round(sum(l_extendedprice * (1 - l_discount)), 2)
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with maximum quarterly revenue — the
    "view + scalar-max self-reference" pattern. The 1-row max agg is
    broadcast back onto the per-supplier revenue (scalar-subquery
    shape), avoiding a global window sort over all suppliers. Revenue
    is rounded BEFORE the max compare on both engines so the equality
    is on identical doubles."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(
            F.broadcast(max_rev),
            F.col("total_revenue") == F.col("max_revenue"),
        )
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q16_supplier_part_diversity",
    survey_row=23,
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_nationkey IN (0, 1)
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_part_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (fixture has no partsupp, so the part-supplier
    relation is derived from lineitem; the supplier exclusion rides on
    nationkey instead of the comment column): distinct supplier count
    per (brand, type, size) bucket with an excluded-supplier NOT IN.
    The NOT IN compiles to a LEFT ANTI join against the (tiny,
    broadcast) excluded set — never a per-row subquery. part's three
    predicates prune it before broadcast; the only shuffle is the
    distinct agg."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    excluded = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey").isin(0, 1)
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(
            F.broadcast(excluded),
            li.l_suppkey == excluded.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q17_small_quantity_revenue",
    survey_row=23,
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p_brand = 'Brand#13'
      AND l_quantity < (
          SELECT 0.5 * avg(l_quantity)
          FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (brand filter only; fixture has no container):
    revenue that would be lost by dropping small-quantity orders for
    one brand's parts. The correlated AVG subquery is decorrelated
    into a per-part aggregate joined back — the per-part threshold dim
    is |part|-sized and broadcast. Quantities are integral doubles, so
    the avg is an exact division and the threshold compare is
    deterministic on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#13"
    ).select("p_partkey")
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(
            F.broadcast(thresholds),
            F.col("l_partkey") == F.col("t_partkey"),
        )
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


@register(
    "tpch_q19_discounted_revenue",
    survey_row=23,
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (brand+size bands instead of brand+container):
    revenue under three OR'd brand/size/quantity band combinations.
    The join stays a plain equi hash join on partkey; the disjunction
    is a post-join filter mixing columns from both sides — Catalyst
    still pushes the derivable per-side residuals (brand/size union,
    quantity 1-30 envelope) into the scans."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(band)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "tpch_q20_volume_suppliers",
    survey_row=23,
    oracle="""
    SELECT s_name, round(s_acctbal, 2) AS s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'blue%'
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey
        HAVING avg(l_quantity) > 25.5
    )
    ORDER BY s_name
    """,
)
def tpch_q20_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (fixture has no partsupp availqty, so the
    "excess supply" signal is a per-supplier average shipped quantity
    threshold on one part family): suppliers qualified by a HAVING
    aggregate, consumed as a LEFT SEMI join. The IN-subquery never
    materializes per-row; the part LIKE filter broadcasts; avg over
    integral quantities is exact so the HAVING cut is deterministic."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("blue")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    qualified = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.avg("l_quantity").alias("avg_qty"))
        .filter(F.col("avg_qty") > 25.5)
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(
            F.broadcast(qualified),
            s.s_suppkey == qualified.l_suppkey,
            "left_semi",
        )
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


@register(
    "tpch_q21_waiting_suppliers",
    survey_row=23,
    oracle="""
    SELECT s_name, count(*)::BIGINT AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (fixture has no commitdate/receiptdate, so
    "kept the order waiting" is shipped >60 days after order date):
    late lines by the SOLE late supplier on a multi-supplier finished
    order. The EXISTS / NOT-EXISTS pair is decorrelated into a
    SINGLE-PASS cascade with NO join-back to the raw lines: per
    (order, supplier) count late lines, then per order count
    suppliers / late suppliers and carry the sole late supplier's id
    and late-line count via max_by, then roll up per supplier name.
    No Expand (a countDistinct pair would double the data through
    one), and the fact joins orders exactly once — measured ~35 %
    faster than the join-back formulation at sf0.1. numwait ≡ the
    late l1 rows of the sole late supplier, so the
    correlated-subquery oracle is unchanged.

    ONE wide exchange (round-8): lineitem barely collapses under the
    (order, supplier) partial agg (~1 line per pair in TPC-H), so
    the old back-to-back groupBys paid two full-width shuffles —
    hash(orderkey, suppkey) then hash(orderkey). An explicit
    repartition on l_orderkey satisfies BOTH aggregations (subset
    rule: hash(orderkey) clusters (orderkey, suppkey) too), so the
    whole cascade pipelines in place after a single fact-width
    exchange; only the kilobyte s_name rollup shuffles again.
    Measured 1.31 → 1.01 s warm at sf0.1, identical rows."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    # r11: the orders side is HALF THE ORDERS TABLE (status F), so
    # broadcasting it only pays while it is genuinely small — at sf10
    # that broadcast builds a 7.3M-entry map per the 32 threads and
    # measured 8.3 s vs 6.3 s for joining it SHUFFLE_HASH on the very
    # exchange the cascade already creates (repartition(l_orderkey)
    # satisfies the join AND both aggregations — the orders exchange
    # is the only added cost, and it is narrow). Plan-time stats gate,
    # same device as join_multiway_star.
    o_est = int(
        str(o._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    if o_est < 8 << 20:
        lines = li.join(
            F.broadcast(o), li.l_orderkey == o.o_orderkey
        ).repartition("l_orderkey")
    else:
        lines = li.repartition("l_orderkey").join(
            o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey
        )
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).cast("int")
    per_supp = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(late).alias("n_late_lines")
    )
    late_weight = F.when(
        F.col("n_late_lines") > 0, F.col("n_late_lines")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum((F.col("n_late_lines") > 0).cast("int")).alias(
            "n_late_suppliers"
        ),
        F.max_by("l_suppkey", late_weight).alias("late_supp"),
        F.max(late_weight).alias("late_lines"),
    )
    qual = per_order.filter(
        (F.col("n_suppliers") >= 2) & (F.col("n_late_suppliers") == 1)
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        qual.join(F.broadcast(s), F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("late_lines").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "tpch_q21_bucketed",
    survey_row=23,
    oracle="""
    SELECT s_name, count(*)::BIGINT AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def tpch_q21_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 ON A BUCKETED LINEITEM LAYOUT — the r8-verdict lever for
    the suite's stubbornest residual: the unbucketed form's one
    remaining fact-width exchange (hash(l_orderkey) feeding the
    per-(order,supplier) cascade) disappears when lineitem is stored
    `bucketBy(8, l_orderkey) sortBy(l_orderkey)` — the groupBys
    consume the bucket spec directly and the whole cascade pipelines
    over the scan (plan: one fewer Exchange; tests/test_plans.py
    asserts no exchange between the scan and the first aggregate).
    MEASURED (warm best-of-5, local[32]): sf0.1 1.13 → 0.66 s, sf1
    1.07 → 0.87 s, rows identical — so the unbucketed q21's ~1 s
    residual is STORAGE-LAYOUT-BOUND, not plan-bound, which is the
    honest closure for its perf-weak mark: at 100 TB the fact table
    IS bucket-partitioned on its join key (the pay-once-at-write
    pattern of join_bucketed_colocated), and this op is the plan
    such a deployment runs. The bucketed write happens once at
    frame-build time per (sf, session) — the serving path never pays
    it, mirroring the production write-once amortization; the
    headline bench keeps timing the UNBUCKETED form so the BASELINE
    pairing stays on identical storage for both engines."""
    import os

    scratch = os.path.join(
        os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ),
        ".scratch",
    )
    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    # Key the cached bucketed copy on a fingerprint of the SOURCE
    # parquet (mtime+size over the path and its direct children), not
    # just the sf-dir basename: if the source under sf_dir is ever
    # regenerated, a basename-only key would silently serve the stale
    # bucketed rows (r9 advisory). A changed source now hashes to a
    # new table/path and triggers a fresh bucketed write.
    src = os.path.join(sf_dir, "lineitem.parquet")
    stats = [os.stat(src)]
    if os.path.isdir(src):
        stats += [
            os.stat(os.path.join(src, f)) for f in sorted(os.listdir(src))
        ]
    fp = abs(hash(tuple((s.st_mtime_ns, s.st_size) for s in stats))) % 10**8
    name = f"bk_q21_lineitem_{sf_tag}_{fp:08d}"
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    have = name in [t.name for t in spark.catalog.listTables()]
    if have and not os.path.isdir(os.path.join(scratch, name)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        have = False
    if not have:
        (
            li.write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", os.path.join(scratch, name))
            .format("parquet")
            .saveAsTable(name)
        )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    lines = spark.table(name).join(
        F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey")
    )
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).cast("int")
    per_supp = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(late).alias("n_late_lines")
    )
    late_weight = F.when(F.col("n_late_lines") > 0, F.col("n_late_lines"))
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum((F.col("n_late_lines") > 0).cast("int")).alias(
            "n_late_suppliers"
        ),
        F.max_by("l_suppkey", late_weight).alias("late_supp"),
        F.max(late_weight).alias("late_lines"),
    )
    qual = per_order.filter(
        (F.col("n_suppliers") >= 2) & (F.col("n_late_suppliers") == 1)
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        qual.join(F.broadcast(s), F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("late_lines").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "tpch_q22_global_sales_opportunity",
    survey_row=23,
    oracle="""
    SELECT cntrycode, count(*)::BIGINT AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM (
        SELECT c_nationkey % 10 AS cntrycode, c_acctbal
        FROM customer c
        WHERE c_nationkey % 10 IN (1, 2, 3, 4, 5)
          AND c_acctbal > (
              SELECT round(avg(c_acctbal), 2)
              FROM customer
              WHERE c_acctbal > 0.0
                AND c_nationkey % 10 IN (1, 2, 3, 4, 5)
          )
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '1999-01-01'
          )
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (fixture customers have no phone, so the country
    code is nationkey mod 10): dormant-but-wealthy customers — above
    the positive-balance average for the candidate codes, with NO
    NO recent orders (none since 1999 — every fixture customer has
    SOME order, so "no orders ever" would be vacuous). The scalar avg
    is a 1-row broadcast (rounded to cents on both engines so the
    threshold compare is ULP-stable); the NOT EXISTS is a LEFT ANTI
    join on custkey against the date-pruned order keys.
    Shuffles: the anti join plus the 5-group rollup."""
    c = load_table(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.col("c_nationkey") % 10
    )
    candidates = c.filter(F.col("cntrycode").isin(1, 2, 3, 4, 5))
    avg_bal = candidates.filter(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 2).alias("avg_bal")
    )
    o_keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        candidates.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o_keys, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@register(
    "tpch_q2_min_cost_supplier",
    survey_row=9,
    oracle="""
    WITH ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               min(l_extendedprice / l_quantity) AS ps_supplycost
        FROM lineitem
        GROUP BY 1, 2
    ),
    eu AS (
        SELECT ps.ps_partkey, ps.ps_supplycost,
               s.s_name, s.s_acctbal, n.n_name
        FROM ps
        JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    m AS (
        SELECT *, min(ps_supplycost) OVER (PARTITION BY ps_partkey) AS mc
        FROM eu
    )
    SELECT round(m.s_acctbal, 2) AS s_acctbal, m.s_name, m.n_name,
           p.p_partkey, p.p_name,
           floor(m.ps_supplycost * 10000) / 10000 AS supply_cost
    FROM m
    JOIN part p ON p.p_partkey = m.ps_partkey
    WHERE m.ps_supplycost = m.mc
      AND p.p_size BETWEEN 10 AND 25
      AND p.p_type = 'STANDARD'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape, completing the 22-query suite (Q1 is
    agg_pricing_summary): for every mid-size STANDARD part, the
    EUROPE supplier quoting the minimum supply cost. The fixture has
    no partsupp table, so the supply relation is DERIVED from
    lineitem — min observed unit price per (part, supplier) — the
    same adaptation tpch_q16/q20 use. The correlated min-cost
    subquery of spec Q2 becomes a window min over the part partition
    (one shuffle on partkey instead of a rejoin); region→nation→
    supplier is a broadcast chain onto the derived supply relation;
    top-100 compiles to TakeOrderedAndProject. Doubles stay RAW
    through the min and the equality compare (per-row division and
    min are bitwise-deterministic on both engines); the displayed
    cost is TRUNCATED (floor·10⁴) rather than rounded — floor over
    identical doubles is bitwise-deterministic, where decimal-string
    HALF_UP rounding can differ between engines exactly at .5
    boundaries."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_sup = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 25) & (F.col("p_type") == "STANDARD")
    )
    # BOTH dimension restrictions commute below the aggregation AND
    # the window: EUROPE is on a group key (suppkey), and the part
    # size/type predicate is on the WINDOW PARTITION key (partkey) —
    # the per-part min cost is computed only over that part's own
    # suppliers, so dropping other parts cannot change it. Semi-reduce
    # lineitem through both broadcast dims BEFORE the (part, supplier)
    # agg: the fact-width groupBy runs on the ~1/20 of rows that can
    # reach the output (filter-below-agg + filter-below-window; the
    # EUROPE-only form was already ~35 % faster at sf0.1). The shuffle
    # carries ONLY (partkey, suppkey, cost) — supplier name/acctbal/
    # nation are re-attached by broadcast AFTER the min-cost filter,
    # keeping three strings out of every shuffled row.
    eu_li = li.join(
        F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey")
    ).join(
        F.broadcast(eu_sup.select("s_suppkey")),
        li.l_suppkey == F.col("s_suppkey"),
    )
    eu = eu_li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "ps_supplycost"
        )
    )
    w = Window.partitionBy("ps_partkey")
    m = eu.withColumn("mc", F.min("ps_supplycost").over(w)).filter(
        F.col("ps_supplycost") == F.col("mc")
    )
    return (
        m.join(F.broadcast(eu_sup), m.ps_suppkey == eu_sup.s_suppkey)
        .join(F.broadcast(p), m.ps_partkey == p.p_partkey)
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            (F.floor(F.col("ps_supplycost") * 10000) / 10000).alias(
                "supply_cost"
            ),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q11_important_stock",
    survey_row=9,
    oracle="""
    WITH ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               min(l_extendedprice / l_quantity) AS ps_supplycost,
               sum(l_quantity) AS ps_availqty
        FROM lineitem
        GROUP BY 1, 2
    ),
    val AS (
        SELECT ps.ps_partkey,
               sum(CAST(round(ps.ps_supplycost * ps.ps_availqty, 4)
                        AS DECIMAL(18,4))) AS v
        FROM ps
        JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name IN ('NATION_3', 'NATION_7', 'NATION_12')
        GROUP BY ps.ps_partkey
    ),
    tot AS (SELECT sum(v) AS s, count(*) AS cnt FROM val)
    SELECT val.ps_partkey AS p_partkey,
           round(CAST(val.v AS DOUBLE), 2) AS part_value
    FROM val, tot
    WHERE val.v * tot.cnt > 2 * tot.s
    ORDER BY part_value DESC, p_partkey
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose inventory value at the target
    nations' suppliers exceeds a global threshold. Spec Q11's
    FRACTION scales with 1/SF; here the threshold is scale-INVARIANT
    — value > 2× the mean part value — so the query is meaningful at
    every fixture SF and at 100 TB without retuning. The supply
    relation is derived from lineitem (no partsupp in the fixture;
    availqty = total quantity supplied, cost = min unit price). The
    inventory products are rounded to 4 digits then accumulated in
    DECIMAL(18,4) on BOTH engines: decimal sums are associative, so
    the per-part values and the grand total are exact regardless of
    partition order — the threshold compare (v·cnt > 2·Σv, all
    decimal/integer math) cannot flicker at any scale. The 1-row
    total broadcasts; the only wide exchanges are the two groupBys."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "ps_supplycost"
        ),
        F.sum("l_quantity").alias("ps_availqty"),
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7", "NATION_12")
    )
    sup = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey"
    )
    val = (
        ps.join(F.broadcast(sup), ps.ps_suppkey == sup.s_suppkey)
        .groupBy("ps_partkey")
        .agg(
            F.sum(
                F.round(
                    F.col("ps_supplycost") * F.col("ps_availqty"), 4
                ).cast("decimal(18,4)")
            ).alias("v")
        )
    )
    tot = val.agg(F.sum("v").alias("s"), F.count("*").alias("cnt"))
    return (
        val.join(F.broadcast(tot))
        .filter(F.col("v") * F.col("cnt") > 2 * F.col("s"))
        .select(
            F.col("ps_partkey").alias("p_partkey"),
            F.round(F.col("v").cast("double"), 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )
