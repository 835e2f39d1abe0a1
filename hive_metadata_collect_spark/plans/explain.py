"""Physical-plan inspection helpers.

The engine's scale story rests on verifiable plan properties —
filters reaching the parquet scan, dims broadcasting, top-k never
globally sorting, aggregates running partial+final. These helpers
expose the executed plan as text so tests (tests/test_plans.py) can
assert those properties instead of trusting comments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Final (post-AQE where applicable) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def scan_summary(df: DataFrame) -> str:
    """The FileScan lines (contain PushedFilters / ReadSchema)."""
    return "\n".join(
        line
        for line in df._jdf.queryExecution().executedPlan()
        .toString()
        .splitlines()
        if "FileScan" in line or "PushedFilters" in line or "ReadSchema" in line
    )


def has_node(df: DataFrame, node: str) -> bool:
    return node in physical_plan(df)


def assert_plan(df: DataFrame, *, contains: tuple[str, ...] = (), absent: tuple[str, ...] = ()) -> None:
    plan = physical_plan(df)
    for node in contains:
        assert node in plan, f"expected {node} in plan:\n{plan}"
    for node in absent:
        assert node not in plan, f"did not expect {node} in plan:\n{plan}"
