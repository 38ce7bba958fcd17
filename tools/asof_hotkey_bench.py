"""Measure the as-of `bucket_seconds` hot-key split (VERDICT r6 #1).

The union-merge as-of join shuffles once on the equi-key and sorts each
key's merged timeline inside one task. A hot key therefore serializes:
one task sorts and window-scans the whole timeline while 31 cores idle.
`bucket_seconds` re-partitions the merge window on (key, time-bucket)
so the hot timeline spreads across tasks, at the cost of a bucket-
granular carry pass (tiny, broadcast back — pinned in
tests/test_plans.py::test_asof_bucketed_carry_broadcasts).

This tool measures that trade at the scale where it matters — a single
~10⁷-row hot key, which no oracle can check (the join-based SQL
materializes |L_k|×|R_k| pairs; DuckDB would need ~10¹³ rows) — so
certification here is bucketed-vs-unbucketed BIT-EQUALITY (row count +
order-insensitive md5 digest over every output column) plus wall time.
The oracle-gate twin lives in `make_fuzz_fixtures.py --hotkey` at
default scale, where the SQL twin still runs.

Fixture: vectorized, seeded — `hot_n` events on ONE user spread over 30
days, plus a `tail_n` Zipf-ish remainder over 50 ordinary users; ~20%
are 'purchase' (the right side). Generation is numpy-only so 10⁷ rows
build in seconds (the fuzz generator's per-row props loops would take
minutes and fuzz nothing this measurement needs).

Usage: python tools/asof_hotkey_bench.py [--hot N] [--tail N]
                                         [--bucket SECONDS] [--reps K]
Prints one JSON line: timings (min over reps), equality verdict, speedup.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smart_fraud_detection_data_pipeline_spark.operators.asof import asof_join
from smart_fraud_detection_data_pipeline_spark.session import get_spark

EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]
SPAN_DAYS = 30.0


def build_fixture(path: str, hot_n: int, tail_n: int, seed: int = 707) -> None:
    rng = np.random.default_rng(seed)
    n = hot_n + tail_n
    user = np.empty(n, dtype="int64")
    user[:hot_n] = 1
    user[hot_n:] = rng.integers(2, 52, tail_n)
    base = np.datetime64("2024-01-01", "us")
    offs = (rng.random(n) * SPAN_DAYS * 86_400e6).astype("int64")
    ts = base + offs.astype("timedelta64[us]")
    table = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype="int64") + 1),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": pa.array(user),
            "event_type": pa.array(
                [EVENT_TYPES[i] for i in rng.integers(0, len(EVENT_TYPES), n)],
                type=pa.string(),
            ),
            "value": pa.array(rng.uniform(-50.0, 500.0, n), type=pa.float64()),
        }
    )
    os.makedirs(path, exist_ok=True)
    pq.write_table(table, os.path.join(path, "events.parquet"))


def _asof(spark, path: str, bucket_seconds: int | None) -> DataFrame:
    ev = spark.read.parquet(os.path.join(path, "events.parquet")).select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = (
        spark.read.parquet(os.path.join(path, "events.parquet"))
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    return asof_join(
        ev,
        purchases,
        on=["user_id"],
        left_key="event_id",
        left_ts="ts",
        right_ts="purchase_ts",
        tie_break="purchase_id",
        bucket_seconds=bucket_seconds,
    )


def digest(df: DataFrame) -> tuple[int, str]:
    """(row count, order-insensitive digest): sum over rows of the first
    15 hex chars of md5(all columns) — collision-safe enough to certify
    bit-equality of two plans over the same engine."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("∅")) for c in df.columns]
    h = F.conv(F.substring(F.md5(F.concat_ws("\x1f", *cols)), 1, 15), 16, 10)
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(h.cast("decimal(38,0)")).alias("d"),
    ).first()
    return int(row["n"]), str(row["d"])


def timed(df: DataFrame, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hot", type=int, default=10_000_000)
    ap.add_argument("--tail", type=int, default=3_000_000)
    ap.add_argument("--bucket", type=int, default=6 * 3600)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    path = f"/tmp/sf_asof_hotkey_{args.hot}_{args.tail}"
    if not os.path.exists(os.path.join(path, "events.parquet")):
        build_fixture(path, args.hot, args.tail)
    spark = get_spark("asof_hotkey_bench")

    plain = _asof(spark, path, None)
    bucketed = _asof(spark, path, args.bucket)
    n0, d0 = digest(plain)
    n1, d1 = digest(bucketed)
    equal = (n0, d0) == (n1, d1)
    t_plain = timed(plain, args.reps)
    t_bucketed = timed(bucketed, args.reps)
    print(
        json.dumps(
            {
                "hot_rows": args.hot,
                "tail_rows": args.tail,
                "bucket_seconds": args.bucket,
                "rows": n0,
                "bit_identical": equal,
                "unbucketed_sec": round(t_plain, 2),
                "bucketed_sec": round(t_bucketed, 2),
                "speedup": round(t_plain / t_bucketed, 2),
            }
        )
    )
    if not args.keep:
        shutil.rmtree(path, ignore_errors=True)
    return 0 if equal else 1


if __name__ == "__main__":
    raise SystemExit(main())
