"""PySpark-native analytics engine with the capability set of a
Hive-metadata-collector-class data-catalog tool, plus LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).

Built from scratch against the public PySpark 4.x API. The operator
inventory and semantics are specified in SURVEY.md §2 (the reference
checkout is empty — see SURVEY.md §0 — so no reference file citations
exist anywhere in this package; each operator docstring instead cites
its SURVEY.md §2 row number).

Architecture: everything is a declarative DataFrame plan — Catalyst
does pushdown/pruning/join-selection; AQE handles runtime re-planning
and skew. No RDDs. Python UDFs only where semantics genuinely require
them (Arrow-batched pandas UDFs, never row-at-a-time in hot paths).
"""

from hive_metadata_collect_spark.registry import load_all, oracle_sql, queries
from hive_metadata_collect_spark.session import get_spark

__all__ = ["get_spark", "queries", "oracle_sql", "load_all"]
