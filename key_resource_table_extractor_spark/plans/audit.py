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


# --------------------------------------------------------------------------
# single-partition hazard sweep
# --------------------------------------------------------------------------

# A SinglePartition exchange is harmless when everything below it is
# already bounded: an aggregate's output is group-cardinality, a limit's
# output is the limit. Only a raw scan flowing straight into one task
# (the unpartitioned-window-over-a-table shape) is the scale-killer.
_BOUNDING_NODES = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "TakeOrderedAndProject",
    "CollectLimit",
    "GlobalLimit",
    "LocalLimit",
)


def _parse_plan_trees(plan: str) -> list[list[tuple[int, int, str]]]:
    """Parse formatted-explain tree blocks into (depth, node_id, name)."""
    import re

    # prefix includes '*' (whole-stage-codegen marker on non-AQE plans);
    # a trailing ", Statistics(...)" rides AQE final-plan query stages
    node_re = re.compile(
        r"^([\s:+|*-]*)([A-Za-z][\w .]*?)\s*\((\d+)\)"
        r"(?:,\s*Statistics\(.*\))?\s*$"
    )
    trees: list[list[tuple[int, int, str]]] = []
    current: list[tuple[int, int, str]] = []
    for line in plan.splitlines():
        m = node_re.match(line)
        if m:
            prefix, name, nid = m.groups()
            current.append((len(prefix) // 3, int(nid), name.strip()))
        elif current:
            trees.append(current)
            current = []
    if current:
        trees.append(current)
    return trees


def single_partition_hazards(df: DataFrame) -> list[str]:
    """Exchange SinglePartition nodes fed by a raw scan with no aggregate
    or limit anywhere between the scan and the exchange — i.e. plans that
    move an unbounded table through one task. Returns one description per
    offending node; empty list = plan is single-partition-safe."""
    import re

    plan = explain_str(df)
    # node detail blocks: "(n) Name" header through the next "(m) ..." header
    single_ids: set[int] = set()
    blocks = re.split(r"(?m)^(?=\(\d+\) )", plan)
    for block in blocks:
        m = re.match(r"\((\d+)\) Exchange\b", block)
        if m and re.search(r"(?m)^Arguments: SinglePartition", block):
            single_ids.add(int(m.group(1)))
    if not single_ids:
        return []
    hazards: list[str] = []
    for tree in _parse_plan_trees(plan):
        for i, (depth, nid, name) in enumerate(tree):
            if nid not in single_ids:
                continue
            # walk the subtree under this exchange; prune any branch that
            # passes through a bounding node before its scan
            j = i + 1
            while j < len(tree) and tree[j][0] > depth:
                d, _, child = tree[j]
                if child.startswith(_BOUNDING_NODES):
                    k = j + 1
                    while k < len(tree) and tree[k][0] > d:
                        k += 1
                    j = k
                    continue
                if child.startswith("Scan"):
                    hazards.append(
                        f"Exchange SinglePartition ({nid}) over raw {child}"
                    )
                    break
                j += 1
    return hazards
