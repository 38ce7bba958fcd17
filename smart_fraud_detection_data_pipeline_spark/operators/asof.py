"""As-of and interval (range) joins — temporal operators Spark lacks natively.

Neither exists in the reference (SURVEY §2.3: equi-joins only) but both
are staples of event-timeline feature engineering (training-data
pipelines: "state as of event time", "activity in the window after").
Both are compositions of existing DataFrame ops — no UDFs:

- `asof_join`: for each left row, the single latest right row with
  right_ts ≤ left_ts (backward; "forward" = earliest ≥), matched on
  equi-keys. Plan: equi-join on keys → inequality filter → row_number
  over the left PRIMARY key ordered by right_ts — one shuffle on the
  equi-keys plus one on the left key. Left rows without a match
  survive with null right columns (left-outer semantics).
- `interval_join`: pairs (l, r) with shared keys and r_ts inside
  [l_ts + lo, l_ts + hi]. Plan: equi-join + range predicate.

Scale notes: the equi-key join bounds fan-out to per-key cross
products; at 100 TB the move is bucketing both sides on the equi-key
(co-located join, no shuffle) and, when a key's timeline is long,
range-bucketing time (join on (key, time_bucket) with bucket-boundary
duplication) so the inequality filter works on small buckets. The
row_number dedup keeps at most one row per left row, so output size =
|left|.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_key: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tie_break: str | None = None,
    tie_break_direction: str = "desc",
) -> DataFrame:
    """Left as-of join: latest right row at-or-before each left row.

    ``left_key`` must uniquely identify left rows (their primary key).
    ``tie_break`` (a right column) resolves equal right_ts;
    ``tie_break_direction`` ("desc" default, or "asc") picks which end
    of the tie wins — forward joins usually want "asc" (lowest id =
    first-created among simultaneous events). Right columns must not
    collide with left columns except the `on` keys (rename beforehand).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")
    if tie_break_direction not in ("desc", "asc"):
        raise ValueError(f"unknown tie_break_direction: {tie_break_direction}")
    cond: Column = (
        (F.col(right_ts) <= F.col(left_ts))
        if direction == "backward"
        else (F.col(right_ts) >= F.col(left_ts))
    )
    # A right row with NULL right_ts can never satisfy the inequality
    # (an untimed event has no as-of position) and must be dropped
    # BEFORE the join: the isNull() disjunct below exists to keep the
    # left join's null-EXTENDED rows, and without this filter it also
    # admits real NULL-ts right rows — which then win rn=1 whenever
    # they are a left row's only candidate, where SQL's `right_ts <=
    # left_ts` predicate yields no match (fuzz-sweep rule, seed 303).
    right = right.where(F.col(right_ts).isNotNull())
    joined = left.join(right, on=list(on), how="left").where(
        cond | F.col(right_ts).isNull()
    )
    order = [
        F.col(right_ts).desc_nulls_last()
        if direction == "backward"
        else F.col(right_ts).asc_nulls_last()
    ]
    if tie_break:
        order.append(
            F.col(tie_break).desc_nulls_last()
            if tie_break_direction == "desc"
            else F.col(tie_break).asc_nulls_last()
        )
    w = Window.partitionBy(left_key).orderBy(*order)
    ranked = joined.withColumn("__rn", F.row_number().over(w))
    matched = ranked.where(F.col("__rn") == 1).drop("__rn")
    # left rows whose every right candidate failed the inequality were
    # dropped by the filter (inner-ish); restore them with null right cols
    missing = left.join(matched.select(left_key), on=left_key, how="left_anti")
    right_cols = [c for c in matched.columns if c not in left.columns]
    for c in right_cols:
        missing = missing.withColumn(c, F.lit(None).cast(dict(matched.dtypes)[c]))
    return matched.unionByName(missing.select(*matched.columns))


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "10 minutes",
) -> DataFrame:
    """Pairs where right_ts ∈ (left_ts + lower, left_ts + upper].

    Strict lower bound excludes the anchor row itself when left and
    right are the same table.
    """
    lo = F.col(left_ts) + F.expr(f"INTERVAL {lower}")
    hi = F.col(left_ts) + F.expr(f"INTERVAL {upper}")
    return left.join(
        right,
        on=list(on),
        how="inner",
    ).where((F.col(right_ts) > lo) & (F.col(right_ts) <= hi))
