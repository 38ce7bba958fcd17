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
