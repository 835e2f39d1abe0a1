"""Batch-equivalent forms of the streaming operators — SURVEY.md §2.8
(#51–56). These are what the driver's DuckDB oracle hashes; the true
Structured Streaming forms (identical semantics, incremental
execution) live in streaming/streams.py and are smoke-tested against
these in tests/test_streaming.py.

Scale notes: tumbling/sliding windows are plain hash aggregates on a
derived time key (the sliding form fans each event out to
window/slide rows *before* the shuffle — partial aggregation still
collapses it). Session windows and dedup are one shuffle on the
entity key + a per-partition sort; watermarking is a pure filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hive_metadata_collect_spark.registry import register
from hive_metadata_collect_spark.sources.fixtures import load_table


@register(
    "stream_tumbling_counts",
    survey_row=51,
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events per 1-hour tumbling window × type (usage heat per hour).
    F.window(ts, '1 hour') is epoch-aligned — identical bucketing to
    date_trunc('hour')."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "stream_sliding_counts",
    survey_row=52,
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) - k.k * INTERVAL '15 minutes'
               AS window_start,
           count(*) AS n_events
    FROM events
    CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
    GROUP BY 1
    """,
)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 15 minutes: each event lands in 4
    overlapping windows (window/slide fan-out, then count)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
    )


@register(
    "stream_session_windows",
    survey_row=53,
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), sessions AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id
                   ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    )
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
           round((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0, 6)
               AS duration_secs
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap
    (sessionized audit log). Uses the native session_window primitive;
    the oracle proves equivalence to gaps-and-islands SQL.
    session_window.end = last_event + gap, so duration = end - start
    - gap. Boundary semantics (found by tests/test_property_parity.py):
    Spark merges an event at EXACTLY prev_ts + gap into the session, so
    the gaps-and-islands split condition is strictly-greater-than."""
    ev = load_table(spark, sf_dir, "events")
    grouped = ev.groupBy("user_id", F.session_window("ts", "30 minutes")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    dur_us = (
        F.unix_micros("session_window.end")
        - F.unix_micros("session_window.start")
        - F.lit(30 * 60 * 1_000_000)
    )
    return grouped.select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        "n_events",
        F.round(dur_us / 1e6, 6).alias("duration_secs"),
    )


@register(
    "stream_dedup_keys",
    survey_row=54,
    oracle="""
    SELECT event_id, user_id, event_type, ts
    FROM (
        SELECT event_id, user_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts ASC, event_id ASC) AS rn
        FROM events
    ) t WHERE rn = 1
    """,
)
def stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the FIRST event per (user, type) by time.
    Batch dropDuplicates picks an arbitrary row — this form pins the
    winner deterministically; the streaming twin is
    dropDuplicatesWithinWatermark (streams.py)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        ev.select(
            "event_id", "user_id", "event_type", "ts", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "stream_watermark_late",
    survey_row=55,
    oracle="""
    WITH marked AS (
        SELECT ts,
               max(ts) OVER (ORDER BY event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_seen
        FROM events
    )
    SELECT date_trunc('hour', ts) AS window_start, count(*) AS n_kept
    FROM marked
    WHERE max_seen IS NULL OR ts >= max_seen - INTERVAL 10 MINUTE
    GROUP BY 1
    """,
)
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics, batch-replayed: with arrival order =
    event_id, an event is LATE (dropped) if its event time lags the
    max seen so far by over 10 minutes; survivors feed a 1h tumbling
    count. The streaming twin is withWatermark('ts','10 minutes')."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.orderBy(F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = ev.select("ts", F.max("ts").over(w).alias("max_seen"))
    kept = marked.filter(
        F.col("max_seen").isNull()
        | (F.col("ts") >= F.col("max_seen") - F.expr("INTERVAL 10 MINUTES"))
    )
    return (
        kept.groupBy(F.date_trunc("hour", "ts").alias("window_start"))
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


@register(
    "stream_stateful_running",
    survey_row=56,
    oracle="""
    SELECT event_id, user_id, ts,
           row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
               AS running_count
    FROM events
    """,
)
def stream_stateful_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running event count — the batch equivalent of a
    custom stateful operator (streaming twin: transformWithState /
    applyInPandasWithState keeping a per-key counter, streams.py)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "event_id", "user_id", "ts", F.row_number().over(w).alias("running_count")
    )


# Static enrichment dim for the stream-static join: event_type → tier
# and weight. In production this is the broadcastable dim table a
# stream joins on every micro-batch (reloaded per batch if mutable).
EVENT_TIERS = [
    ("click", "engage", 1.0),
    ("view", "engage", 0.5),
    ("purchase", "convert", 5.0),
    ("signup", "convert", 3.0),
    ("error", "ops", 0.0),
]


@register(
    "stream_static_join",
    survey_row=51,
    oracle="""
    SELECT e.event_type, d.tier,
           count(*) AS n_events,
           round(sum(e.value * d.weight), 2) AS weighted_value
    FROM events e
    JOIN (VALUES ('click', 'engage', 1.0), ('view', 'engage', 0.5),
                 ('purchase', 'convert', 5.0), ('signup', 'convert', 3.0),
                 ('error', 'ops', 0.0)) AS d(event_type, tier, weight)
      ON e.event_type = d.event_type
    GROUP BY e.event_type, d.tier
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (batch-equivalent): every event
    joins a small static dim and aggregates per (type, tier). The dim
    is explicitly broadcast — in the streaming form (streams.py
    static_join_stream) the same broadcast happens per micro-batch,
    which is why stream-static joins need no watermark or state."""
    ev = load_table(spark, sf_dir, "events")
    dim = F.broadcast(
        spark.createDataFrame(EVENT_TIERS, ["event_type", "tier", "weight"])
    )
    return (
        ev.join(dim, "event_type")
        .groupBy("event_type", "tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value") * F.col("weight")), 2).alias(
                "weighted_value"
            ),
        )
    )


@register(
    "stream_stream_join",
    survey_row=52,
    oracle="""
    SELECT v.user_id,
           v.event_id AS view_id,
           c.event_id AS click_id,
           CAST(date_diff('second', v.ts, c.ts) AS BIGINT) AS gap_s
    FROM events v
    JOIN events c
      ON v.user_id = c.user_id
     AND v.event_type = 'view'
     AND c.event_type = 'click'
     AND c.ts > v.ts
     AND c.ts <= v.ts + INTERVAL 10 MINUTE
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream join, batch-equivalent: every click matched to
    the views it followed within 10 minutes, per user. The equi key
    (user_id) keeps this one shuffle per side with a range residual —
    never a time-only cross join. In the streaming form
    (streams.py stream_stream_join_stream) the same predicate plus
    watermarks on BOTH sides bounds the join state: a buffered view
    can be evicted once the click watermark passes view.ts + 10min."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("event_id").alias("view_id"), F.col("ts").alias("v_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    return (
        v.join(
            c,
            (v["user_id"] == c["c_user"])
            & (c["c_ts"] > v["v_ts"])
            & (c["c_ts"] <= v["v_ts"] + F.expr("INTERVAL 10 MINUTE")),
        )
        .select(
            "user_id",
            "view_id",
            "click_id",
            # date_diff('second') counts boundary crossings: truncate
            # EACH side to seconds, then subtract (not floor of the
            # microsecond delta — differs when fractional parts wrap).
            (F.unix_timestamp("c_ts") - F.unix_timestamp("v_ts")).alias("gap_s"),
        )
    )


@register(
    "stream_sliding_topk",
    survey_row=52,
    oracle="""
    WITH windowed AS (
        SELECT time_bucket(INTERVAL '15 minutes', ts)
                   - k.k * INTERVAL '15 minutes' AS window_start,
               event_type,
               count(*) AS n
        FROM events
        CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT window_start, event_type, n,
               row_number() OVER (
                   PARTITION BY window_start
                   ORDER BY n DESC, event_type) AS rk
        FROM windowed
    )
    SELECT window_start, event_type, n::BIGINT AS n, rk::INT AS rk
    FROM ranked WHERE rk <= 3
    """,
)
def stream_sliding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRENDING-NOW over sliding windows: top-3 event types per 1-hour
    window sliding every 15 minutes — the sliding fan-out (each event
    lands in 4 overlapping windows) COMPOSED with per-window ranking
    (deterministic tie-break on type name). In the streaming twin the
    rank runs in the foreachBatch sink over the windowed aggregate
    (rank is not an incremental streaming op); the batch form here IS
    that sink query, which is why it hash-checks. Shuffles: the
    (window, type) agg, then the |windows|-bounded rank — the fan-out
    multiplies rows by windows/slide (4×), the known cost of sliding
    semantics."""
    ev = load_table(spark, sf_dir, "events")
    windowed = (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"), "event_type", "n"
        )
    )
    w = Window.partitionBy("window_start").orderBy(
        F.desc("n"), F.asc("event_type")
    )
    return (
        windowed.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 3)
    )


@register(
    "stream_threshold_alerts",
    survey_row=56,
    oracle="""
    WITH buckets AS (
        SELECT event_type,
               time_bucket(INTERVAL '15 minutes', ts) AS bucket,
               count(*) AS n
        FROM events
        GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type, bucket, n,
               avg(n) OVER (PARTITION BY event_type) AS mean_n,
               lag(n) OVER (PARTITION BY event_type ORDER BY bucket)
                   AS prev_n
        FROM buckets
    )
    SELECT event_type, bucket, n::BIGINT AS n,
           round(mean_n, 4) AS mean_n
    FROM stats
    WHERE n > 1.5 * mean_n
      AND (prev_n IS NULL OR prev_n <= 1.5 * mean_n)
    ORDER BY event_type, bucket
    """,
)
def stream_threshold_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RISING-EDGE alerting — the anti-alert-fatigue contract: fire
    when a metric CROSSES its threshold, not on every breaching
    bucket (`cat_anomaly_zscore` flags all outliers; a pager needs
    the transition). Per-type 15-minute rates, threshold 1.5× the
    type's mean rate, alert iff this bucket breaches AND the previous
    one didn't (lag over the bucket order; a leading NULL counts as
    below — first-bucket breaches do page). The threshold compare is
    identical-double on both engines (mean = exact int sum / count).
    Streaming twin: the bucket counts are the tumbling aggregate and
    the edge detector runs stateful per key (flatMapGroupsWithState
    keeping one previous-bucket value); the batch form is the same
    dataflow with lag standing in for the state cell. Shuffles: the
    bucket agg and the |type|-partition window."""
    ev = load_table(spark, sf_dir, "events")
    buckets = ev.groupBy(
        "event_type",
        F.window("ts", "15 minutes")["start"].alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("bucket")
    stats = buckets.select(
        "event_type",
        "bucket",
        "n",
        F.avg("n").over(wt).alias("mean_n"),
        F.lag("n").over(wo).alias("prev_n"),
    )
    breach = F.col("n") > 1.5 * F.col("mean_n")
    prev_ok = F.col("prev_n").isNull() | (
        F.col("prev_n") <= 1.5 * F.col("mean_n")
    )
    return (
        stats.filter(breach & prev_ok)
        .select(
            "event_type", "bucket", "n", F.round("mean_n", 4).alias("mean_n")
        )
        .orderBy("event_type", "bucket")
    )


@register(
    "stream_cdc_apply",
    survey_row=56,
    oracle="""
    WITH ch AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN event_type = 'signup' THEN 'I'
                    WHEN event_type = 'error'  THEN 'D'
                    ELSE 'U' END AS op
        FROM events
    ), r AS (
        SELECT user_id, op, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n_changes
        FROM ch
    )
    SELECT user_id, round(value, 4) AS last_value, n_changes
    FROM r WHERE rn = 1 AND op <> 'D'
    """,
)
def stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture APPLY: an I/U/D change feed (synthesized
    from the audit stream: signup=insert, error=delete tombstone,
    rest=update) reduced to current state — last writer per key wins,
    a trailing delete removes the key entirely. The replication
    target every CDC pipeline ultimately maintains.

    Batch form: one max_by per key ordered by the (ts, event_id)
    version vector — a single hash aggregation, no window sort. The
    streaming twin is foreachBatch-MERGE per micro-batch (the
    sink-side idempotent upsert of stream_sink_python_datasource),
    with the same last-writer-wins reduce applied WITHIN each batch
    first — correctness does not depend on batch boundaries because
    max_by over (ts, event_id) is associative across batches."""
    ev = load_table(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
    )
    last = (
        ev.select("user_id", "ts", "event_id", "value", op.alias("op"))
        .groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("op", "value"), F.struct("ts", "event_id")
            ).alias("last"),
            F.count(F.lit(1)).alias("n_changes"),
        )
    )
    return last.filter(F.col("last.op") != "D").select(
        "user_id",
        F.round("last.value", 4).alias("last_value"),
        "n_changes",
    )


@register(
    "stream_stream_left_outer",
    survey_row=52,
    oracle="""
    SELECT v.user_id,
           v.event_id AS view_id,
           c.event_id AS click_id,
           c.event_id IS NULL AS timed_out
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON v.user_id = c.user_id
     AND c.ts > v.ts
     AND c.ts <= v.ts + INTERVAL 10 MINUTE
    """,
)
def stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER stream-stream join, batch-equivalent — the
    abandoned-view feed: every view paired with the clicks that
    followed it within 10 minutes, and views with NO click emitted
    once anyway with a timed_out marker. This is the outer-join
    variant streaming engines only gained after watermarks existed:
    the null row for a view can be emitted only when the click-side
    watermark passes view.ts + 10min, proving no match can still
    arrive — the streaming twin runs the same predicate with
    watermarks on both sides, and the state bound is identical to
    the inner form (buffered views evict at the same watermark).

    Batch form: the time-bounded predicate keeps the LEFT join one
    shuffle per side on user_id with a range residual. The
    timed-out rows are exactly the null-extended rows — no second
    anti-join pass, the outer join IS the timeout detector."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    return (
        v.join(
            c,
            (v["user_id"] == c["c_user"])
            & (c["c_ts"] > v["v_ts"])
            & (c["c_ts"] <= v["v_ts"] + F.expr("INTERVAL 10 MINUTE")),
            "left_outer",
        )
        .select(
            "user_id",
            "view_id",
            "click_id",
            F.col("click_id").isNull().alias("timed_out"),
        )
    )


@register(
    "stream_late_drop_accounting",
    survey_row=55,
    oracle="""
    WITH arr AS (
        SELECT event_type, ts,
               max(ts) OVER (
                   ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   - INTERVAL 10 MINUTE AS wm
        FROM events
    )
    SELECT event_type,
           count(*) FILTER (WHERE ts < wm)::BIGINT AS n_dropped,
           count(*) FILTER (WHERE wm IS NULL OR ts >= wm)::BIGINT
               AS n_kept,
           coalesce(max(CASE WHEN ts < wm
                    THEN date_diff('second', ts, wm) END), 0)::BIGINT
               AS max_lateness_s
    FROM arr GROUP BY event_type
    """,
)
def stream_late_drop_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark DROP accounting — the observability metric every
    production streaming job carries next to `stream_watermark_late`
    (which computes the surviving aggregate; this op quantifies what
    the watermark cost): replaying the stream in arrival order
    (event_id), the watermark before each row is max(event time so
    far) − 10 min, and a row is dropped iff its event time is
    already behind that watermark. Emits per-type dropped/kept
    counts and the worst lateness — the number you tune the delay
    against.

    The arrival replay is one running-max window over arrival order
    (the batch-eq mirror of the engine's internal watermark
    register); in the live form these counts come free from the
    StreamingQueryProgress numDroppedRows metric, and this op is the
    deterministic oracle for them. The window is global-ordered by
    design — arrival order IS a single logical sequence; at scale
    the same accounting shards by source partition (watermark = min
    across shards), which is one groupBy away."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    arr = ev.select(
        "event_type",
        "ts",
        (F.max("ts").over(w) - F.expr("INTERVAL 10 MINUTE")).alias("wm"),
    )
    dropped = F.col("ts") < F.col("wm")
    return arr.groupBy("event_type").agg(
        F.count(F.when(dropped, 1)).alias("n_dropped"),
        F.count(F.when(F.col("wm").isNull() | (F.col("ts") >= F.col("wm")), 1)).alias(
            "n_kept"
        ),
        F.coalesce(
            F.max(
                F.when(
                    dropped,
                    F.unix_timestamp("wm") - F.unix_timestamp("ts"),
                )
            ),
            F.lit(0),
        ).alias("max_lateness_s"),
    )


@register(
    "stream_token_bucket",
    survey_row=56,
    oracle="""
    WITH RECURSIVE seq AS (
        SELECT user_id, CAST(epoch(ts) AS BIGINT) AS ep,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    step AS (
        SELECT user_id, rn, ep,
               TRUE AS allowed,
               4::BIGINT AS tokens_after
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT q.user_id, q.rn, q.ep,
               least(5, s.tokens_after + (q.ep - s.ep) // 600) >= 1
                   AS allowed,
               least(5, s.tokens_after + (q.ep - s.ep) // 600)
                 - CASE WHEN least(5, s.tokens_after
                                      + (q.ep - s.ep) // 600) >= 1
                        THEN 1 ELSE 0 END AS tokens_after
        FROM step s JOIN seq q
          ON q.user_id = s.user_id AND q.rn = s.rn + 1
    )
    SELECT user_id,
           count(*) FILTER (WHERE allowed)::BIGINT AS n_allowed,
           count(*) FILTER (WHERE NOT allowed)::BIGINT AS n_denied,
           max_by(tokens_after, rn)::BIGINT AS tokens_end
    FROM step GROUP BY user_id
    """,
)
def stream_token_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN-BUCKET rate limiting replayed per key (cap 5, cost 1,
    refill 1 token / 10 min of event-time gap, integer refill per
    gap) — the admission-control state machine API gateways and
    ingestion quotas run. Unlike `win_cusum_alarm`'s recurrence,
    the two-sided clamp (bucket can neither exceed cap nor go
    negative) has NO prefix-sum closed form — this is the honest
    case where per-key sequential state is irreducible, and the
    distributed answer is the same one `cat_funnel_strict` uses:
    one shuffle on the key, sort_array + F.aggregate folding the
    automaton inside codegen — sequential per key, parallel across
    keys, which is exactly the streaming engine's own state layout
    (the live twin would be transformWithState keyed on user).

    The oracle replays the identical automaton by recursive-CTE
    single-stepping (rn → rn+1 per user) — maximally different
    execution, same fixpoint. All state is integer (epoch seconds,
    integer refill), so there is nothing to round."""
    ev = load_table(spark, sf_dir, "events")

    def step(st, e):
        # tokens_pre bound once; the expression tree is shared by all
        # four state fields
        refill = F.when(st["last"].isNull(), F.lit(0).cast("long")).otherwise(
            F.floor((e["ep"] - st["last"]) / 600).cast("long")
        )
        tokens_pre = F.least(F.lit(5).cast("long"), st["tokens"] + refill)
        allowed = tokens_pre >= 1
        return F.struct(
            (tokens_pre - F.when(allowed, 1).otherwise(0).cast("long")).alias(
                "tokens"
            ),
            e["ep"].cast("long").alias("last"),
            (st["n_allowed"] + F.when(allowed, 1).otherwise(0).cast("long")).alias(
                "n_allowed"
            ),
            (st["n_denied"] + F.when(allowed, 0).otherwise(1).cast("long")).alias(
                "n_denied"
            ),
        )

    folded = (
        ev.select(
            "user_id",
            F.struct(
                F.unix_timestamp("ts").alias("ep"), F.col("event_id")
            ).alias("e"),
        )
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("e")).alias("evs"))
        .select(
            "user_id",
            F.aggregate(
                "evs",
                F.struct(
                    F.lit(5).cast("long").alias("tokens"),
                    F.lit(None).cast("long").alias("last"),
                    F.lit(0).cast("long").alias("n_allowed"),
                    F.lit(0).cast("long").alias("n_denied"),
                ),
                step,
            ).alias("st"),
        )
    )
    return folded.select(
        "user_id",
        F.col("st.n_allowed").alias("n_allowed"),
        F.col("st.n_denied").alias("n_denied"),
        F.col("st.tokens").alias("tokens_end"),
    )


@register(
    "stream_disorder_profile",
    survey_row=55,
    oracle="""
    WITH ranks AS (
        SELECT event_type,
               row_number() OVER (ORDER BY event_id) AS arrival_rk,
               row_number() OVER (ORDER BY ts, event_id) AS time_rk
        FROM events
    )
    SELECT event_type,
           max(arrival_rk - time_rk)::BIGINT AS max_early_by,
           max(time_rk - arrival_rk)::BIGINT AS max_late_by,
           count(*) FILTER (WHERE arrival_rk <> time_rk)::BIGINT
               AS n_displaced,
           round(count(*) FILTER (WHERE arrival_rk <> time_rk)
                 * 1.0 / count(*), 6) AS displaced_frac
    FROM ranks GROUP BY event_type
    """,
)
def stream_disorder_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream DISORDER profile — the measurement that SIZES a
    watermark before you pick one (`stream_late_drop_accounting`
    scores a chosen delay; this op tells you what delay the stream
    actually needs): rank every event by arrival order and by event
    time, and the rank displacement distribution IS the reorder
    requirement — max displacement bounds the reorder-buffer depth,
    the displaced fraction says how much of the stream is affected
    at all. Ties pinned by event_id in the time ranking.

    Two global-order windows sharing the replay frame (arrival
    order is one logical sequence, as in the drop-accounting op; at
    scale the same profile shards per source partition), then a
    per-type rollup of pure integer rank arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    ranks = ev.select(
        "event_type",
        F.row_number().over(Window.orderBy("event_id")).alias("arrival_rk"),
        F.row_number().over(Window.orderBy("ts", "event_id")).alias("time_rk"),
    )
    disp = F.col("arrival_rk") - F.col("time_rk")
    return ranks.groupBy("event_type").agg(
        F.max(disp).cast("long").alias("max_early_by"),
        F.max(-disp).cast("long").alias("max_late_by"),
        F.count(F.when(disp != 0, 1)).alias("n_displaced"),
        F.round(F.count(F.when(disp != 0, 1)) / F.count(F.lit(1)), 6).alias(
            "displaced_frac"
        ),
    )


@register(
    "stream_state_size_estimate",
    survey_row=54,
    oracle="""
    WITH windows_ AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win,
               count(DISTINCT user_id) AS keys_alive,
               count(*) AS n_events
        FROM events GROUP BY 1
    )
    SELECT count(*)::BIGINT AS n_windows,
           max(keys_alive)::BIGINT AS peak_state_keys,
           round(avg(keys_alive), 2) AS mean_state_keys,
           (max(keys_alive) * 72)::BIGINT AS peak_state_bytes_est,
           max_by(win, keys_alive * 100000000
                       - CAST(floor(epoch(win)) AS BIGINT) / 3600)
               AS peak_window
    FROM windows_
    """,
)
def stream_state_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming STATE-SIZE estimation — the capacity-planning
    number every stateful-streaming deployment needs BEFORE launch
    (dedup/session state lives per key until the watermark expires
    it; undersized state stores spill or OOM mid-incident): replay
    the stream in 1-hour TTL windows, count keys alive per window
    (= the dedup-state population under a 1h watermark), and report
    the peak/mean population plus a bytes estimate at ~72 bytes per
    RocksDB dedup entry (key + timestamp + store overhead — the
    sizing constant, not a measurement). Earliest peak window
    pinned via the scalar-composite tie rule.

    One per-window distinct-count aggregate — the batch-eq mirror
    of what StreamingQueryProgress's stateOperators.numRowsTotal
    reports live, and the deterministic oracle for it (the same
    relationship stream_late_drop_accounting has to
    numDroppedRows)."""
    ev = load_table(spark, sf_dir, "events")
    windows_ = ev.groupBy(
        F.date_trunc("hour", "ts").alias("win")
    ).agg(
        F.countDistinct("user_id").alias("keys_alive"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return windows_.agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.max("keys_alive").cast("long").alias("peak_state_keys"),
        F.round(F.avg("keys_alive"), 2).alias("mean_state_keys"),
        (F.max("keys_alive") * 72).cast("long").alias("peak_state_bytes_est"),
        F.max_by(
            "win",
            F.col("keys_alive") * 100000000
            - F.floor(F.unix_timestamp("win") / 3600).cast("long"),
        ).alias("peak_window"),
    )
