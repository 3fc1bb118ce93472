"""Physical-plan audit helpers.

We rely on Catalyst rather than hand-scheduling (SURVEY.md §4); these
helpers let tests pin the plan properties that matter at 100 TB: filters
reaching the parquet scan, pruned read schemas, and broadcast joins for
small dimensions. If a refactor silently loses pushdown, the plan-audit
test fails even though results stay correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def has_pushed_filters(df: DataFrame, fragment: str = "") -> bool:
    """True if the scan carries pushed filters (optionally matching text)."""
    plan = explain_str(df)
    if "PushedFilters: []" in plan and "PushedFilters: [" not in plan.replace(
        "PushedFilters: []", ""
    ):
        return False
    return ("PushedFilters: [" in plan.replace("PushedFilters: []", "")) and (
        fragment in plan
    )


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (column-pruning check)."""
    plan = explain_str(df)
    cols: list[str] = []
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(p.split(":")[0] for p in inner.split(",") if p)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)
