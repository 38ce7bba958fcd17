"""As-of and interval (range) joins — temporal operators Spark lacks natively.

Neither exists in the reference (SURVEY §2.3: equi-joins only) but both
are staples of event-timeline feature engineering (training-data
pipelines: "state as of event time", "activity in the window after").
Both are compositions of existing DataFrame ops — no UDFs.

- `asof_join`: for each left row, the single latest right row with
  right_ts ≤ left_ts (backward; "forward" = earliest ≥), matched on
  equi-keys, left-outer semantics (unmatched lefts keep null right
  columns). Implemented as a UNION-MERGE, not a pair join: tag each
  side, shuffle ONCE on the equi-keys, sort each key's merged timeline
  by event time, and carry the most recent right row to each left row
  with ``last(<right payload struct>, ignorenulls) OVER (... ROWS
  UNBOUNDED PRECEDING)``. Cost is O(n log n) per key with NO
  intermediate pair materialization — the naive equi-join → inequality
  → row_number plan materializes |L_k|×|R_k| rows per key before the
  rank prune, which collapses on low-cardinality or skewed keys
  (measured: a 512×-scaled fuzz fixture with 60 users and a 111k-event
  hot key ground a single rank-sort task for >10 minutes; the merge
  form runs in seconds on the same data). The right payload rides in
  ONE struct column so the carried values always come from the same
  right row — per-column ``last(ignorenulls)`` would resurrect older
  rows' values wherever a newer right row holds a legitimate NULL.
- `interval_join`: pairs (l, r) with shared keys and r_ts inside
  (l_ts + lo, l_ts + hi]. Plan: equi-join + range predicate. Its
  OUTPUT is the pair set, so a pair-sized intermediate is inherent,
  not a plan defect.

Scale notes: the merge as-of shuffles each side once on the equi-keys
and sorts the merged run — the same machinery as a sort-merge join, so
AQE skew handling and spillable sorts apply. A hot key is still a
single sorted run (Amdahl), but n log n instead of n². When a single
key's timeline outgrows one task, pass ``bucket_seconds`` to
range-bucket time: the merge window then partitions on
(key, time_bucket) — splitting a hot key's timeline across tasks — and
a per-bucket carry pass (one row per non-empty bucket, computed at
bucket granularity so it never re-concentrates the hot key) hands each
bucket the winning right row from all earlier buckets, which
``coalesce`` applies to rows whose bucket has no earlier right.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: Internal column names used by the union-merge; asserted absent from
#: both inputs (ADVICE r5 #2 — silent collision would corrupt results).
_RESERVED = ("__t", "__side", "__r", "__m", "__b", "__co", "__carry", "__rn")


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
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: latest right row at-or-before each left row
    (``direction="backward"``; "forward" = earliest at-or-after).

    ``left_key`` is retained for API stability; the merge formulation
    needs no left primary key (the join-based one required uniqueness
    for its rank prune — a precondition this implementation drops).
    ``tie_break`` (a right column) resolves equal right_ts;
    ``tie_break_direction`` ("desc" default, or "asc") picks which end
    of the tie wins — forward joins usually want "asc" (lowest id =
    first-created among simultaneous events). Right columns must not
    collide with left columns except the `on` keys (rename beforehand).

    Semantics pinned by the oracle gate and fuzz sweeps:
    - A right row with NULL ``right_ts`` can never match (an untimed
      row has no as-of position) — dropped up front (fuzz seed 303).
    - A left row with NULL ``left_ts`` or a NULL equi-key matches
      nothing (SQL inequality / equi-join semantics) and survives with
      null right columns; a right row with a NULL equi-key matches
      nothing and is dropped.

    ``bucket_seconds`` (opt-in) splits each key's timeline into
    fixed-width time buckets so a hot key no longer concentrates in one
    task: the merge window partitions on (key, bucket) and a
    bucket-granular carry pass (one row per non-empty bucket) supplies
    the latest right row from earlier buckets. Bit-identical to the
    unbucketed plan — pinned by the equivalence tests
    (tests/test_asof.py), the hash-gated `asof_last_purchase_bucketed`
    oracle twin (incl. `make_fuzz_fixtures.py --hotkey` seeds), and a
    digest-certified 10⁷-row-hot-key run (`tools/asof_hotkey_bench.py`:
    13 M events, one user holding 10 M — bucketed 5.3 s vs 46.7 s
    unbucketed on local[32], 8.9×; the carry frames broadcast back,
    pinned in tests/test_plans.py). Costs ~3 extra small exchanges, so
    leave it off unless one key's timeline outgrows a task (~10⁶+ rows).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")
    if tie_break_direction not in ("desc", "asc"):
        raise ValueError(f"unknown tie_break_direction: {tie_break_direction}")
    for name in _RESERVED:
        if name in left.columns or name in right.columns:
            raise ValueError(f"column name {name!r} is reserved by asof_join")
    on = list(on)
    right_cols = [c for c in right.columns if c not in on]
    left_rest = [c for c in left.columns if c not in on]

    # Rights that can never match: NULL event time (no as-of position)
    # or NULL equi-key (SQL equi-join semantics — NULL matches nothing).
    right = right.where(F.col(right_ts).isNotNull())
    for k in on:
        right = right.where(F.col(k).isNotNull())

    # Tag and align the two sides for the union: lefts carry their
    # payload plus a NULL right-struct; rights carry only the struct.
    # __side orders rights before lefts at equal timestamps, so an
    # exact-tie right (right_ts == left_ts) is visible to the left row
    # under both directions' inclusive bounds.
    payload = F.struct(*[F.col(c) for c in right_cols]).alias("__r")
    # Null struct type from the schema object, not a hand-joined DDL
    # string (ADVICE r5 #2: a right column named with DDL
    # metacharacters — space/comma/colon — misparses the string form).
    null_payload = F.lit(None).cast(
        StructType([f for f in right.schema.fields if f.name not in on])
    ).alias("__r")
    lefts = left.select(
        *on,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        *left_rest,
        null_payload,
    )
    rights = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes if c not in on],
        payload,
    )
    merged = lefts.unionByName(rights)

    # Sort each key's merged timeline so "the winning right row" is the
    # nearest PRECEDING __r in sort order:
    #   backward: time ascending  -> most recent right at-or-before
    #   forward:  time descending -> earliest right at-or-after
    # NULL left timestamps sort to the FRONT (before every right) so
    # last() finds nothing for them. Among rights sharing a timestamp
    # the winner must sort LAST, i.e. tie_break in the OPPOSITE of the
    # winning direction ("desc" winner = max tie_break -> sort asc).
    if direction == "backward":
        order = [F.col("__t").asc_nulls_first(), F.col("__side").asc()]
        rev = [F.col("__t").desc_nulls_last(), F.col("__side").desc()]
    else:
        order = [F.col("__t").desc_nulls_first(), F.col("__side").asc()]
        rev = [F.col("__t").asc_nulls_last(), F.col("__side").desc()]
    if tie_break:
        if tie_break_direction == "desc":
            order.append(F.col("__r")[tie_break].asc_nulls_first())
            rev.append(F.col("__r")[tie_break].desc_nulls_last())
        else:
            order.append(F.col("__r")[tie_break].desc_nulls_first())
            rev.append(F.col("__r")[tie_break].asc_nulls_last())

    if bucket_seconds is None:
        w = (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = merged.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    else:
        # Hot-key split (VERDICT r5 #3): partition the merge window on
        # (key, time bucket) so one key's timeline spreads across tasks.
        # A left row whose bucket holds no earlier right must inherit the
        # winning right from PRECEDING buckets — computed at bucket
        # granularity (one row per non-empty bucket) so the carry pass
        # never re-concentrates the hot key, then joined back and
        # coalesced under the in-bucket carry. NULL-ts lefts land in
        # bucket NULL; their carry join misses and __m stays NULL —
        # exactly the unbucketed semantics (nothing precedes them).
        merged = merged.withColumn(
            "__b",
            F.floor(
                F.col("__t").cast("timestamp").cast("double") / F.lit(float(bucket_seconds))
            ),
        )
        w_local = (
            Window.partitionBy(*on, "__b")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        local = merged.withColumn("__m", F.last("__r", ignorenulls=True).over(w_local))
        # Carry-out per (key, bucket): the right row sorting LAST under
        # `order` = FIRST under the exact reversal `rev`.
        w_co = Window.partitionBy(*on, "__b").orderBy(*rev)
        carry_out = (
            merged.where(F.col("__side") == 0)
            .withColumn("__rn", F.row_number().over(w_co))
            .where(F.col("__rn") == 1)
            .select(*on, "__b", F.col("__r").alias("__co"))
        )
        # Carry-in per bucket: latest carry-out among strictly earlier
        # buckets, traversed in time order (asc for backward, desc for
        # forward — same direction the row sort walks time).
        b_order = (
            F.col("__b").asc_nulls_first()
            if direction == "backward"
            else F.col("__b").desc_nulls_first()
        )
        w_carry = (
            Window.partitionBy(*on)
            .orderBy(b_order)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carries = (
            merged.select(*on, "__b")
            .distinct()
            .join(carry_out, on=on + ["__b"], how="left")
            .withColumn("__carry", F.last("__co", ignorenulls=True).over(w_carry))
            .select(*on, "__b", "__carry")
        )
        carried = local.join(carries, on=on + ["__b"], how="left").withColumn(
            "__m", F.coalesce(F.col("__m"), F.col("__carry"))
        )

    # Column order parity with the previous join-based implementation
    # (on keys, then remaining left columns, then right columns) and
    # with the registered oracles.
    return carried.where(F.col("__side") == 1).select(
        *on,
        *left_rest,
        *[F.col("__m")[c].alias(c) for c in right_cols],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Pairs where right_ts ∈ (left_ts + lower, left_ts + upper].

    Strict lower bound excludes the anchor row itself when left and
    right are the same table.

    Default plan: equi-join on the keys with the range conjunct inside
    the join condition — pairs stream through the join, but each key
    still ENUMERATES |L_k|×|R_k| combinations before the range filter,
    which serializes on a hot key exactly like the as-of sort did.
    ``bucket_seconds`` (opt-in) joins on (key, time-bucket) instead:
    each left row probes only the ⌈(upper−lower)/bucket⌉+1 buckets its
    window can touch (an in-row sequence explode), each right row lands
    in exactly ONE bucket — so every qualifying pair is produced exactly
    once (no dedup pass) and per-task fan-out is bounded by per-(key,
    bucket) products, not per-key. Same output bit-for-bit (pinned by
    tests + the shared-oracle `error_burst_window_bucketed` query).
    Measured (SCALING.md): a 200k-row single hot key ground the default
    plan past 560 s (one task, ~8×10⁹ enumerated combos) where the
    bucketed plan returns the identical 1.85 M pairs in 4.6 s.
    Pick bucket_seconds ≈ the window width: much smaller multiplies
    probe rows, much larger stops splitting the hot key.
    Untimed rows never pair (NULL ts has no bucket — both engines'
    inequality semantics already exclude them in the default plan)."""
    lo = F.col(left_ts) + F.expr(f"INTERVAL {lower}")
    hi = F.col(left_ts) + F.expr(f"INTERVAL {upper}")
    if bucket_seconds is None:
        return left.join(
            right,
            on=list(on),
            how="inner",
        ).where((F.col(right_ts) > lo) & (F.col(right_ts) <= hi))
    if "__b" in left.columns or "__b" in right.columns:
        raise ValueError("column name '__b' is reserved by interval_join")
    step = float(bucket_seconds)
    lo_b = F.floor(lo.cast("timestamp").cast("double") / F.lit(step)).cast("long")
    hi_b = F.floor(hi.cast("timestamp").cast("double") / F.lit(step)).cast("long")
    probes = left.where(F.col(left_ts).isNotNull()).withColumn(
        "__b", F.explode(F.sequence(lo_b, hi_b))
    )
    rb = right.withColumn(
        "__b",
        F.floor(
            F.col(right_ts).cast("timestamp").cast("double") / F.lit(step)
        ).cast("long"),
    ).where(F.col("__b").isNotNull())
    return (
        probes.join(rb, [*on, "__b"], how="inner")
        .where((F.col(right_ts) > lo) & (F.col(right_ts) <= hi))
        .drop("__b")
    )
