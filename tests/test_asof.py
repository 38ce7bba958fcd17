"""Unit tests for as-of and interval joins."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row

from smart_fraud_detection_data_pipeline_spark.operators.asof import asof_join, interval_join

T0 = datetime.datetime(2024, 1, 1)


def _m(minutes):
    return T0 + datetime.timedelta(minutes=minutes)


def _frames(spark):
    left = spark.createDataFrame(
        [
            Row(id=1, k="a", ts=_m(10)),
            Row(id=2, k="a", ts=_m(30)),
            Row(id=3, k="b", ts=_m(5)),   # no right rows for key b at/before
            Row(id=4, k="c", ts=_m(5)),   # key c absent from right entirely
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", r_ts=_m(0), payload="a0"),
            Row(k="a", r_ts=_m(20), payload="a20"),
            Row(k="b", r_ts=_m(50), payload="b50"),  # after left's ts
        ]
    )
    return left, right


def test_asof_backward(spark):
    left, right = _frames(spark)
    out = {
        r.id: r.payload
        for r in asof_join(
            left, right, on=["k"], left_key="id", left_ts="ts", right_ts="r_ts"
        ).collect()
    }
    assert out == {1: "a0", 2: "a20", 3: None, 4: None}


def test_asof_forward(spark):
    left, right = _frames(spark)
    out = {
        r.id: r.payload
        for r in asof_join(
            left,
            right,
            on=["k"],
            left_key="id",
            left_ts="ts",
            right_ts="r_ts",
            direction="forward",
        ).collect()
    }
    assert out == {1: "a20", 2: None, 3: "b50", 4: None}


def test_asof_output_size_equals_left(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["k"], left_key="id", left_ts="ts", right_ts="r_ts"
    )
    assert out.count() == left.count()


def test_asof_tie_break_directions(spark):
    # Two right rows share the exact timestamp: "desc" (default) picks the
    # highest tie_break value, "asc" the lowest — the forward/oracle
    # convention (ADVICE r3: asof_next_error ties must match the SQL twin).
    left = spark.createDataFrame([Row(id=1, k="a", ts=_m(0))])
    right = spark.createDataFrame(
        [
            Row(k="a", r_id=7, r_ts=_m(5), payload="hi"),
            Row(k="a", r_id=3, r_ts=_m(5), payload="lo"),
        ]
    )
    kw = dict(on=["k"], left_key="id", left_ts="ts", right_ts="r_ts",
              direction="forward", tie_break="r_id")
    assert asof_join(left, right, **kw).collect()[0].r_id == 7
    assert (
        asof_join(left, right, tie_break_direction="asc", **kw).collect()[0].r_id
        == 3
    )
    with pytest.raises(ValueError, match="unknown tie_break_direction"):
        asof_join(left, right, tie_break_direction="up", **kw)


def test_asof_null_ts_rows(spark):
    """Untimed rows never participate: a NULL-ts RIGHT row is not an
    as-of candidate even when it is a key's only right row (the SQL
    `right_ts <= left_ts` semantics — fuzz seed 303), and a NULL-ts
    LEFT row survives with null right columns."""
    left = spark.createDataFrame(
        [
            Row(id=1, k="a", ts=_m(10)),
            Row(id=2, k="d", ts=_m(10)),  # key d's only right row is untimed
            Row(id=3, k="a", ts=None),    # untimed left row
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", r_ts=_m(0), payload="a0"),
            Row(k="d", r_ts=None, payload="d-null"),
        ]
    )
    out = {
        r.id: r.payload
        for r in asof_join(
            left, right, on=["k"], left_key="id", left_ts="ts", right_ts="r_ts"
        ).collect()
    }
    assert out == {1: "a0", 2: None, 3: None}


def test_asof_bucketed_equals_unbucketed(spark):
    """The opt-in hot-key time-bucket split (VERDICT r5 #3) must be
    bit-identical to the single-window merge on every pinned scenario —
    including buckets holding no right rows (carry from earlier
    buckets), NULL-ts rows, and tie-break resolution across a bucket
    boundary."""
    left, right = _frames(spark)
    kw = dict(on=["k"], left_key="id", left_ts="ts", right_ts="r_ts")
    for direction in ("backward", "forward"):
        base = sorted(
            asof_join(left, right, direction=direction, **kw).collect(),
            key=lambda r: r.id,
        )
        for secs in (60, 600, 7 * 86400):  # 1 min (many empty buckets) .. 1 wk (all in one)
            got = sorted(
                asof_join(
                    left, right, direction=direction, bucket_seconds=secs, **kw
                ).collect(),
                key=lambda r: r.id,
            )
            assert got == base, (direction, secs)


def test_asof_bucketed_randomized_equivalence(spark):
    """Seeded random timelines (3 keys × 200 events, duplicate
    timestamps, NULL ts on both sides): bucketed output must equal the
    unbucketed merge row-for-row under both directions with a
    tie_break."""
    import random

    rng = random.Random(606)
    lefts, rights = [], []
    for i in range(200):
        k = rng.choice(["a", "b", "c"])
        ts = None if rng.random() < 0.05 else _m(rng.randrange(0, 3000))
        lefts.append(Row(id=i, k=k, ts=ts))
    for j in range(150):
        k = rng.choice(["a", "b", "c", "d"])
        ts = None if rng.random() < 0.05 else _m(rng.randrange(0, 3000))
        rights.append(Row(k=k, r_id=j, r_ts=ts, payload=f"p{j}"))
    left = spark.createDataFrame(lefts)
    right = spark.createDataFrame(rights)
    kw = dict(on=["k"], left_key="id", left_ts="ts", right_ts="r_ts",
              tie_break="r_id")
    for direction in ("backward", "forward"):
        base = sorted(
            asof_join(left, right, direction=direction, **kw).collect(),
            key=lambda r: r.id,
        )
        got = sorted(
            asof_join(
                left, right, direction=direction, bucket_seconds=3600, **kw
            ).collect(),
            key=lambda r: r.id,
        )
        assert got == base, direction


def test_asof_rejects_reserved_columns(spark):
    left, right = _frames(spark)
    bad = left.withColumnRenamed("id", "__side")
    with pytest.raises(ValueError, match="reserved"):
        asof_join(bad, right, on=["k"], left_key="__side", left_ts="ts",
                  right_ts="r_ts")


def test_asof_rejects_bad_direction(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="unknown direction"):
        asof_join(
            left, right, on=["k"], left_key="id", left_ts="ts", right_ts="r_ts",
            direction="sideways",
        )


def test_interval_join_bounds(spark):
    left = spark.createDataFrame([Row(id=1, k="a", ts=_m(0))])
    right = spark.createDataFrame(
        [
            Row(k="a", r_id=10, r_ts=_m(0)),    # excluded: strict lower bound
            Row(k="a", r_id=11, r_ts=_m(5)),    # in
            Row(k="a", r_id=12, r_ts=_m(10)),   # in: inclusive upper
            Row(k="a", r_id=13, r_ts=_m(11)),   # out
            Row(k="b", r_id=14, r_ts=_m(5)),    # wrong key
        ]
    )
    out = interval_join(
        left, right, on=["k"], left_ts="ts", right_ts="r_ts",
        lower="0 seconds", upper="10 minutes",
    )
    assert {r.r_id for r in out.collect()} == {11, 12}


def test_interval_join_bucketed_equals_default(spark):
    """The opt-in time-bucket plan must reproduce the default equi-join
    + range plan pair-for-pair: seeded random timelines with duplicate
    and NULL timestamps on both sides, several bucket widths (narrower,
    equal, and wider than the window)."""
    import random

    rng = random.Random(707)
    lefts, rights = [], []
    for i in range(150):
        k = rng.choice(["a", "b", "c"])
        ts = None if rng.random() < 0.05 else _m(rng.randrange(0, 600))
        lefts.append(Row(id=i, k=k, ts=ts))
    for j in range(200):
        k = rng.choice(["a", "b", "c", "d"])
        ts = None if rng.random() < 0.05 else _m(rng.randrange(0, 600))
        rights.append(Row(k=k, r_id=j, r_ts=ts))
    left = spark.createDataFrame(lefts)
    right = spark.createDataFrame(rights)
    kw = dict(on=["k"], left_ts="ts", right_ts="r_ts",
              lower="0 seconds", upper="10 minutes")
    base = sorted(
        (r.id, r.r_id)
        for r in interval_join(left, right, **kw).collect()
    )
    assert base  # the fixture must actually produce pairs
    for secs in (120, 600, 3600):
        got = sorted(
            (r.id, r.r_id)
            for r in interval_join(left, right, bucket_seconds=secs, **kw).collect()
        )
        assert got == base, secs


def test_interval_join_bucketed_reserved_column(spark):
    left = spark.createDataFrame([Row(id=1, k="a", ts=_m(0), __b=1)])
    right = spark.createDataFrame([Row(k="a", r_id=1, r_ts=_m(1))])
    with pytest.raises(ValueError, match="reserved"):
        interval_join(left, right, on=["k"], left_ts="ts", right_ts="r_ts",
                      bucket_seconds=600)
