"""Streaming state growth under long input (ST4 at scale).

The reference's streaming jobs never evict state — at 100 TB/day the
state store OOMs. These tests drive >=20 sequential micro-batches of
time-ordered input through the engine's two heaviest stateful shapes
(the chained windowed rollup and the watermark-bounded stream-stream
left join) and pin, via ``lastProgress.stateOperators``, that state
PLATEAUS: rows are removed once the watermark passes, and the in-store
row count stays bounded by the watermark horizon instead of growing
with the lifetime of the stream.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from smart_fraud_detection_data_pipeline_spark.streaming import sinks as SK

N_FILES = 20
MINUTES_PER_FILE = 5
ROWS_PER_SEC = 1  # 1 row/s → 300 rows per file, 6000 total
N_USERS = 10


@pytest.fixture(scope="module")
def long_stream_dir(spark, tmp_path_factory):
    """100 minutes of event time as 20 time-ordered files, one file per
    5-minute slice, so availableNow + maxFilesPerTrigger=1 yields >=20
    sequential micro-batches with monotonically advancing watermark."""
    d = str(tmp_path_factory.mktemp("longstream"))
    base = F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    for i in range(N_FILES):
        lo, hi = i * MINUTES_PER_FILE * 60, (i + 1) * MINUTES_PER_FILE * 60
        (
            spark.range(lo, hi, 1, 1)
            .select(
                F.col("id").alias("event_id"),
                (base + F.make_dt_interval(secs=F.col("id"))).alias("ts"),
                (F.col("id") % N_USERS).alias("user_id"),
                (F.col("id") % 97 / 10.0).alias("value"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(d)
        )
    return d


def _drain(stream_df, tmp_path, name):
    out, ckpt = os.path.join(str(tmp_path), "out"), os.path.join(str(tmp_path), "ck")
    q = SK.start_foreach_batch(
        stream_df,
        SK.parquet_batch_sink(out, partitions=None),
        ckpt,
        output_mode="append",
        available_now=True,
        query_name=name,
    )
    q.awaitTermination(600)
    return q, out


def _state_series(q):
    """[(numRowsTotal per operator, numRowsRemoved per operator)] for every
    non-empty micro-batch, in batch order."""
    series = []
    for p in q.recentProgress:
        ops = p.get("stateOperators") or []
        if ops:
            series.append(
                (
                    [op["numRowsTotal"] for op in ops],
                    [op.get("numRowsRemoved", 0) for op in ops],
                )
            )
    return series


def test_chained_rollup_state_plateaus(spark, long_stream_dir, tmp_path):
    """stream_windowed_rollup's shape: 1-min agg chained into 5-min agg,
    15-min watermark. Lifetime windows ~= 100 min x 10 users = ~1000 fine
    + ~200 coarse; in-store state must stay bounded by the watermark
    horizon (~15-20 min of open windows), nowhere near lifetime."""
    schema = spark.read.parquet(long_stream_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(long_stream_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "15 minutes")
    )
    minute = stream.groupBy(F.window("ts", "1 minute"), "user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("minute_sum_dec"),
        F.count(F.lit(1)).alias("minute_n"),
    )
    five = minute.groupBy(
        F.window(F.window_time("window"), "5 minutes").alias("w5"), "user_id"
    ).agg(F.sum("minute_sum_dec").cast("double").alias("total_spent"))
    out_df = five.select(
        "user_id", "total_spent",
        F.date_format("w5.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
    )

    q, out = _drain(out_df, tmp_path, "rollup_state_plateau")
    series = _state_series(q)
    assert len(series) >= N_FILES, f"expected >={N_FILES} micro-batches, got {len(series)}"

    emitted = spark.read.parquet(out).count()
    lifetime_fine = (N_FILES * MINUTES_PER_FILE) * N_USERS  # ~1000 1-min windows
    # Coarse 5-min windows: 20 per user over 100 min; the last ~4 per
    # user stay open behind the 15-min watermark at availableNow drain.
    closed_coarse = (N_FILES * MINUTES_PER_FILE // 5 - 4) * N_USERS
    assert emitted >= closed_coarse, (emitted, closed_coarse)

    totals = [sum(t) for t, _ in series]
    removed = sum(sum(r) for _, r in series)
    # Eviction actually happened, repeatedly — not just at shutdown.
    # Bounds are LIFETIME RATIOS, not horizon arithmetic: exact eviction
    # timing relative to micro-batch boundaries is a Spark scheduling
    # detail that shifts across minor versions, but the plateau property
    # itself — peak state a small fraction of lifetime state, eviction
    # spread over the run — is version-independent (ADVICE r5 #4).
    lifetime_all = lifetime_fine + lifetime_fine // 5  # fine + coarse windows
    batches_with_removal = sum(1 for _, r in series if sum(r) > 0)
    assert removed >= lifetime_fine * 0.5, (removed, lifetime_fine)
    assert batches_with_removal >= N_FILES // 3, batches_with_removal
    # Plateau: peak in-store state stays a fraction of lifetime windows.
    assert max(totals) < 0.5 * lifetime_all, (max(totals), lifetime_all)
    # No terminal growth: the run's last third never doubles the
    # steady-state peak reached by mid-run.
    third = len(totals) // 3
    assert max(totals[-third:]) <= max(totals[third : 2 * third]) * 2


def test_stream_stream_left_join_state_plateaus(spark, long_stream_dir, tmp_path):
    """stream_stream_left_join's shape: two watermarked streams joined on
    key + a 2-minute event-time band. Both join state stores must evict
    rows as the watermark passes; peak state is a horizon of rows per
    side, not the 6000-row lifetime."""
    schema = spark.read.parquet(long_stream_dir).schema

    def side(alias):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(long_stream_dir)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "10 minutes")
            .select(
                F.col("event_id").alias(f"{alias}_id"),
                F.col("user_id").alias(f"{alias}_user"),
                F.col("ts").alias(f"{alias}_ts"),
            )
        )

    left, right = side("l"), side("r")
    joined = left.join(
        right,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 2 MINUTES")),
        "left_outer",
    )

    q, out = _drain(joined, tmp_path, "ssjoin_state_plateau")
    series = _state_series(q)
    assert len(series) >= N_FILES

    lifetime_rows = N_FILES * MINUTES_PER_FILE * 60 * ROWS_PER_SEC  # 6000/side
    totals = [sum(t) for t, _ in series]
    removed = sum(sum(r) for _, r in series)
    # Most of the lifetime input is evicted; only rows still inside the
    # final watermark horizon survive the availableNow drain.
    assert removed >= lifetime_rows * 0.8, (removed, lifetime_rows)
    # Peak state: both sides hold ~a horizon (10 min watermark + 2 min
    # band + current 5-min batch) of rows.
    horizon_rows_per_side = (10 + 2 + 2 * MINUTES_PER_FILE) * 60 * ROWS_PER_SEC
    assert max(totals) <= horizon_rows_per_side * 2 * 1.5, max(totals)
    third = len(totals) // 3
    assert max(totals[-third:]) <= max(totals[third : 2 * third]) * 1.5
    assert spark.read.parquet(out).count() >= lifetime_rows  # left rows all emitted
