"""Property-based tests (hypothesis) for the core operator semantics.

SURVEY §5 item 4: cheap invariants that hold for ALL inputs, not just
fixtures — dedup survivor laws against a pandas reference, merge
algebra, exact-decimal sum equality with Python's Decimal.
"""

from __future__ import annotations

from decimal import Decimal

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from smart_fraud_detection_data_pipeline_spark.functions.numeric import exact_sum_double
from smart_fraud_detection_data_pipeline_spark.operators.dedup import dedup_keep_last
from smart_fraud_detection_data_pipeline_spark.operators.merge import merge_upsert

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.integers(min_value=0, max_value=100),  # payload
        st.integers(min_value=0, max_value=9),  # batch/order
    ),
    min_size=1,
    max_size=40,
)


@given(rows=rows_strategy)
@SETTINGS
def test_dedup_keep_last_matches_pandas(spark, rows):
    """dedup_keep_last == pandas sort+drop_duplicates(keep='last'), for
    any input, when the order column is made unique per key."""
    pdf = pd.DataFrame(rows, columns=["k", "v", "b"])
    # unique tiebreak within key: add a sequence column (the operators'
    # contract requires a deterministic final order column)
    pdf["seq"] = range(len(pdf))
    df = spark.createDataFrame(pdf)
    got = dedup_keep_last(df, ["k"], ["b", "seq"]).toPandas()
    want = (
        pdf.sort_values(["b", "seq"], kind="mergesort")
        .drop_duplicates(subset=["k"], keep="last")
        .sort_values("k")
        .reset_index(drop=True)
    )
    got = got.sort_values("k").reset_index(drop=True)[want.columns]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@given(rows=rows_strategy)
@SETTINGS
def test_dedup_exactly_one_row_per_key(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "v", "b"])
    pdf["seq"] = range(len(pdf))
    out = dedup_keep_last(spark.createDataFrame(pdf), ["k"], ["seq"]).toPandas()
    assert sorted(out.k.unique()) == sorted(pdf.k.unique())
    assert len(out) == pdf.k.nunique()


@given(
    target=st.dictionaries(
        st.integers(0, 6), st.integers(0, 50), min_size=0, max_size=7
    ),
    source=st.dictionaries(
        st.integers(0, 6), st.integers(51, 99), min_size=0, max_size=7
    ),
)
@SETTINGS
def test_merge_upsert_dict_semantics(spark, target, source):
    """merge_upsert == {**target, **source} on key→value maps."""
    if not target and not source:
        return
    schema = "k long, v long"
    t = spark.createDataFrame(list(target.items()), schema)
    s = spark.createDataFrame(list(source.items()), schema)
    got = {r.k: r.v for r in merge_upsert(t, s, ["k"]).collect()}
    assert got == {**target, **source}


@given(
    values=st.lists(
        st.decimals(
            min_value=Decimal("-99999.99"),
            max_value=Decimal("99999.99"),
            places=2,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=60,
    )
)
@SETTINGS
def test_exact_sum_matches_decimal_arithmetic(spark, values):
    """The decimal-accumulated double sum equals exact Decimal math — the
    cross-engine determinism claim, property-tested."""
    pdf = pd.DataFrame({"v": [float(v) for v in values]})
    got = (
        spark.createDataFrame(pdf).agg(exact_sum_double("v").alias("s")).collect()[0].s
    )
    want = float(sum(values))
    assert got == want


def test_run_pipeline_rejects_unknown_mode(spark, tmp_path):
    from smart_fraud_detection_data_pipeline_spark.sources.generator import synthetic_transactions
    from smart_fraud_detection_data_pipeline_spark.streaming import pipeline as P

    d = str(tmp_path / "in")
    synthetic_transactions(spark, 10).coalesce(1).write.parquet(d)
    schema = spark.read.parquet(d).schema
    stream = spark.readStream.schema(schema).parquet(d)
    with pytest.raises(ValueError, match="unknown mode"):
        P.run_pipeline(spark, stream, None, None, str(tmp_path / "o"), mode="bogus")


def test_snapshot_diff_reconstructs_new_snapshot(spark, sf_dir):
    """CDC soundness: applying the change set to the OLD snapshot must
    reproduce the NEW snapshot exactly — delete the 'delete' keys, then
    upsert the 'insert'/'update' new values. Checked set-wise on
    (key, price) at sf0.001."""
    from pyspark.sql import functions as F

    from smart_fraud_detection_data_pipeline_spark.queries import registry

    q = {s.name: s.spark_fn for s in registry()}
    diff = q["orders_snapshot_diff"](spark, sf_dir)

    from smart_fraud_detection_data_pipeline_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    a = orders.where(
        F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp_ntz")
    ).select("o_orderkey", dec("o_totalprice").cast("double").alias("price"))
    bump = (
        F.when(F.col("o_orderkey") % 10 == 0, F.lit(1000)).otherwise(F.lit(0))
    ).cast("decimal(18,2)")
    b = orders.where(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz")
    ).select(
        "o_orderkey", (dec("o_totalprice") + bump).cast("double").alias("price")
    )

    changed = diff.where(F.col("change_type") != "delete").select(
        "o_orderkey", F.col("new_price").alias("price")
    )
    reconstructed = (
        a.join(diff.select("o_orderkey"), "o_orderkey", "left_anti")
        .unionByName(changed)
    )
    assert reconstructed.exceptAll(b).count() == 0
    assert b.exceptAll(reconstructed).count() == 0


def test_ohlc_matches_pandas_reference(spark, sf_dir):
    """OHLC per (user, hour) must equal a pandas groupby with
    total-order (ts, event_id) first/last picks."""
    from pyspark.sql import functions as F

    from smart_fraud_detection_data_pipeline_spark.queries import registry
    from smart_fraud_detection_data_pipeline_spark.sources.tables import load_table

    q = {s.name: s.spark_fn for s in registry()}
    got = {
        (r.user_id, r.window_start): (
            r.open_value, r.high_value, r.low_value, r.close_value, r.n_events
        )
        for r in q["user_value_ohlc"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    ).toPandas()
    ev["h"] = ev["ts"].dt.floor("h")
    ev = ev.sort_values(["user_id", "h", "ts", "event_id"])
    ref = ev.groupby(["user_id", "h"]).agg(
        open_value=("value", "first"),
        high_value=("value", "max"),
        low_value=("value", "min"),
        close_value=("value", "last"),
        n=("value", "size"),
    )
    assert len(got) == len(ref)
    for (uid, h), r in ref.iterrows():
        key = (uid, h.strftime("%Y-%m-%d %H:%M:%S"))
        assert got[key] == (
            r.open_value, r.high_value, r.low_value, r.close_value, r.n
        ), key
