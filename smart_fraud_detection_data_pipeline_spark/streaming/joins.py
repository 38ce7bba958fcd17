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

    Outer joins compose with bucketing ONLY for the matched rows'
    timing; the left explode would emit one null-extended row per
    probed bucket for an unmatched left row, so ``how != 'inner'``
    with ``bucket_seconds`` is rejected rather than silently
    double-emitting.
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
    if how != "inner":
        raise ValueError(
            "bucket_seconds composes with inner joins only: an outer "
            "join would null-extend an unmatched left row once per "
            "probed bucket"
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
    return (
        lb.join(rb, cond & (F.col("__probe_bucket") == F.col("__bucket")), how)
        .drop("__probe_bucket", "__bucket")
    )
