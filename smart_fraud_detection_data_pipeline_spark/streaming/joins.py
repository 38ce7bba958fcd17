"""Stream-stream interval joins, with a hot-key escape hatch.

Spark's stream-stream join keeps symmetric per-key state hashed on the
EQUALITY keys only; the time-range condition bounds state *retention*
(watermark eviction), not state *lookup*. A hot key therefore both
serializes (all its state lives in one shuffle partition) and
quadratically re-scans: every arriving row of the key iterates the
key's entire buffered opposite-side state, filtering by the time
predicate row by row — 10⁶ buffered rows × 10⁵ probes is 10¹¹
predicate evaluations in a single task.

``bucket_seconds`` is the streaming twin of the batch
``interval_join(bucket_seconds=...)`` hatch (operators/asof.py): add
floor(event_time / bucket) to the join EQUALITY keys. Each right row
lives in exactly one (key, bucket); each left row probes only the
buckets its window can reach (an explode over ceil(window/bucket)+1
bucket ids), so every qualifying pair is produced exactly once —
bit-identical output, pinned in tests/test_streaming.py — and a probe
iterates a bucket's occupancy instead of the key's whole timeline.
State for the left grows by the small probe fan-out; lookup cost drops
from |key state| to |bucket occupancy| and the hot key's state spreads
across (key, bucket) shuffle partitions. Measured in
tools/stream_hotkey_bench.py; numbers in SCALING.md.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streaming(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    window_seconds: int = 600,
    how: str = "inner",
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Join two WATERMARKED streams on key equality plus
    ``right_time ∈ (left_time, left_time + window_seconds]`` — the
    error→follow-up shape. Returns all columns of both inputs (minus
    the internal bucket columns); callers project.

    ``bucket_seconds`` enables the hot-key split described in the
    module docstring. Output is bit-identical either way: the bucket
    id is a pure function of the row's event time, the probe range
    covers every bucket the window can reach (second-truncation on
    both sides keeps the coverage proof exact — trunc(f) never exceeds
    trunc(e) + window when f <= e + window), and each right row joins
    from exactly one bucket, so no pair is produced twice.

    ``how='leftOuter'`` composes with bucketing through a second
    stateful stage (round 10): the per-copy outer join alone would
    null-extend an unmatched left row once per probed bucket, and a
    left row matched in one bucket would STILL null-extend from its
    other buckets — so the copies are merged downstream by a windowed
    aggregation keyed on the (unique) left row, which re-emits every
    matched pair and exactly one null-extension iff ALL copies were
    unmatched. Spark ≥3.5 supports the time-interval-join →
    aggregation chain in append mode (probed on 4.1: eviction-emitted
    null rows pass the downstream late-record filter). CONTRACT: left
    rows must be unique across ALL their columns (carry a unique id) —
    the consolidation groups by the full left row, so true duplicate
    left rows would merge. The contract is now ENFORCED (round 11,
    VERDICT r10 #5): a unique unmatched left row consolidates exactly
    n_probe+1 null-extended copies, so an all-unmatched group with any
    other copy count can only be merged duplicates and the stage
    raises instead of silently emitting one null row for two inputs
    (duplicates whose copies matched need no guard — each duplicate's
    matches are collected and re-emitted, so multiplicity is already
    correct). Matched pairs emit when the merge window closes rather
    than on arrival (the latency cost of the hatch); state for the
    merge stage is keyed by the unique left row, so it is skew-free by
    construction.

    ``how='rightOuter'`` (round 11) needs NO consolidation stage: the
    probe explode duplicates only the LEFT side, while each right row
    lives in exactly one (key, bucket) — a qualifying pair always
    meets inside the right row's own bucket, so a matched right row
    never null-extends, an unmatched one null-extends exactly once,
    and the per-copy join is bit-identical to the plain rightOuter by
    itself. ``how='fullOuter'`` composes the two: the leftOuter
    consolidation branch carries every matched pair and the
    left-null-extensions; a second rightOuter join filtered to its
    null-extensions (left event time NULL — impossible on a match)
    carries the right side's. The price is two stateful joins' worth
    of state on the same inputs; the alternative — one fullOuter
    per-copy join consolidated downstream — is unimplementable in
    append mode because unmatched right rows reach the merge
    aggregation with a NULL left event time, and a streaming
    aggregation silently drops NULL event-time rows (the
    adversarial-sweep rule), so the right-null extensions would never
    emit.
    """
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_time) > F.col(left_time))
        & (
            F.col(right_time)
            <= F.col(left_time) + F.expr(f"INTERVAL {window_seconds} SECONDS")
        )
    )
    if bucket_seconds is None:
        return left.join(right, cond, how)
    _SUPPORTED = (
        "inner", "leftOuter", "left_outer", "rightOuter", "right_outer",
        "fullOuter", "full_outer",
    )
    if how not in _SUPPORTED:
        raise ValueError(
            f"bucket_seconds composes with {_SUPPORTED} joins only"
        )
    n_probe = math.ceil(window_seconds / bucket_seconds)
    lb = left.withColumn(
        "__probe_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(left_time).cast("long") / bucket_seconds),
                F.floor(F.col(left_time).cast("long") / bucket_seconds)
                + F.lit(n_probe),
            )
        ),
    )
    rb = right.withColumn(
        "__bucket", F.floor(F.col(right_time).cast("long") / bucket_seconds)
    )
    bcond = cond & (F.col("__probe_bucket") == F.col("__bucket"))
    if how == "inner":
        return lb.join(rb, bcond, how).drop("__probe_bucket", "__bucket")
    if how in ("rightOuter", "right_outer"):
        # bit-identical by itself: only the LEFT side is copied, each
        # right row sits in exactly one (key, bucket), and any
        # qualifying pair meets there — so matched right rows never
        # null-extend and unmatched ones null-extend exactly once
        return lb.join(rb, bcond, how).drop("__probe_bucket", "__bucket")
    # leftOuter (and the left half of fullOuter): per-copy join, then
    # consolidate copies per left row.
    from pyspark.sql.types import StructType

    left_cols = [c for c in left.columns]
    right_cols = [c for c in right.columns]
    right_struct_type = StructType(
        [f for f in right.schema.fields if f.name in right_cols]
    )
    j = lb.join(rb, bcond, "leftOuter").select(
        *left_cols,
        # null marker: the right EVENT TIME is non-null on every real
        # match (the join's range predicate requires it) and null on a
        # null-extension — struct(all-null fields) itself is NOT null,
        # so the struct must be gated, not collected raw
        F.when(
            F.col(right_time).isNotNull(),
            F.struct(*[F.col(c) for c in right_cols]),
        ).alias("__m"),
    )
    # a UNIQUE unmatched left row consolidates exactly n_probe+1
    # null-extended copies; an all-unmatched group with any other count
    # is merged duplicates — fail fast instead of emitting one null row
    # for several input rows (VERDICT r10 #5)
    dup_guard = F.assert_true(
        (F.size("__ms") > 0) | (F.col("__n") == F.lit(n_probe + 1)),
        F.lit(
            f"interval_join_streaming(how='{how}', bucket_seconds=...): "
            "duplicate left rows detected; the consolidation stage "
            "requires left rows unique across all columns (carry a "
            "unique id)"
        ),
    )
    merged = (
        # left_time is among the group keys and still carries the
        # propagated event-time watermark, which is what bounds this
        # stage's state (a second window() column would make the agg
        # see two event-time columns and fail analysis)
        j.groupBy(*[F.col(c) for c in left_cols])
        # collect_list skips the gated-null __m of unmatched copies
        .agg(
            F.collect_list("__m").alias("__ms"),
            F.count(F.lit(1)).alias("__n"),
        )
        .select(
            *left_cols,
            F.explode(
                F.when(F.size("__ms") > 0, F.col("__ms")).otherwise(
                    # dup_guard returns NULL when it passes (assert_true
                    # semantics), keeping it inside the live expression
                    # tree so the optimizer cannot prune the check
                    F.when(
                        dup_guard.isNull(),
                        F.array(F.lit(None).cast(right_struct_type)),
                    )
                )
            ).alias("__m"),
        )
    )
    left_half = merged.select(
        *left_cols, *[F.col(f"__m.{c}").alias(c) for c in right_cols]
    )
    if how in ("leftOuter", "left_outer"):
        return left_half
    # fullOuter: add the right side's null-extensions from a second
    # (rightOuter) join, filtered to rows no left copy reached — the
    # left event time is NULL exactly on those (a match requires it
    # non-null via the range predicate). Two joins' state is the price;
    # see the docstring for why one consolidated fullOuter can't work.
    right_half = (
        lb.join(rb, bcond, "rightOuter")
        .where(F.col(left_time).isNull())
        .drop("__probe_bucket", "__bucket")
        .select(*left_cols, *right_cols)
    )
    return left_half.unionByName(right_half)
