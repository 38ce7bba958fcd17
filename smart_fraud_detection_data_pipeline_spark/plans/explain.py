"""Physical-plan inspection helpers — the engine's own scale lint.

The 100 TB contract is a property of the PLAN, not the result: a query
that answers correctly through a SortMergeJoin where a broadcast was
intended, or a scan that reads 11 columns for a 4-column projection,
will collapse at three orders of magnitude more data. These helpers
expose the executed plan as strings/counters so tests (tests/
test_plans.py) can assert plan shape the same way they assert values:

- broadcast joins stay broadcast (no surprise SortMergeJoin),
- filters/projections reach the parquet scan (PushedFilters/ReadSchema),
- aggregations are partial+final (map-side combine before the shuffle),
- expressions stay inside WholeStageCodegen spans.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The executed (physical) plan as text, after AQE planning."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """explain('formatted') output as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def plan_counts(df: DataFrame) -> dict[str, int]:
    """Occurrence counts of the plan nodes that matter at scale."""
    plan = executed_plan(df)
    return {
        "broadcast_hash_join": len(re.findall(r"BroadcastHashJoin", plan)),
        "sort_merge_join": len(re.findall(r"SortMergeJoin", plan)),
        "nested_loop_join": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "exchange": len(re.findall(r"Exchange (?:hash|range|Single)", plan)),
        # the skew.spread_input under-split guard emits exactly this kind
        # (keyless, deterministic); counted separately so map-only plan
        # tests can pin "keyed exchanges == 0 AND roundrobin <= 1"
        "roundrobin": len(re.findall(r"Exchange RoundRobinPartitioning", plan)),
        "hash_aggregate": len(re.findall(r"HashAggregate", plan)),
        "sort": len(re.findall(r"\bSort\b", plan)),
        # codegen stages render as "*(n)" markers in plan text (and as
        # WholeStageCodegen nodes in formatted explain)
        "wholestage_codegen": len(
            set(re.findall(r"\*\((\d+)\)", plan))
            | set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
        ),
    }


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters clause(s) of the scan nodes ('' if none)."""
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))
    return "; ".join(m)


def partition_filters(df: DataFrame) -> str:
    """The PartitionFilters clause(s) of the scan nodes ('' if none) —
    non-empty means the scan prunes Hive partitions before listing files."""
    m = re.findall(r"PartitionFilters: \[([^\]]*)\]", formatted_plan(df))
    return "; ".join(m)


def read_schema(df: DataFrame) -> str:
    """The ReadSchema clause(s) of the scan nodes."""
    m = re.findall(r"ReadSchema: ([^\n]*)", formatted_plan(df))
    return "; ".join(m)
