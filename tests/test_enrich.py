"""Unit + property tests for the enrichment operator (P2-P5, J1/J2).

Edge cases from FIXTURES.md: dangling FKs → null dim columns; null
country on either side → country_mismatch = 0 (null != semantics,
spark.py:149-152); null base_price/discount → discounted_price null.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from smart_fraud_detection_data_pipeline_spark.operators.enrich import enrich_transactions

TS = datetime.datetime(2024, 1, 2, 3, 4, 5)


def _mini(spark):
    tx = spark.createDataFrame(
        [
            # user 1 matches, product 1 matches, mismatch countries, high value
            Row(transaction_id="t1", user_id=1, product_id=1, amount=600.0, timestamp=TS),
            # user 2 matches (null country), product 1 → mismatch must be 0
            Row(transaction_id="t2", user_id=2, product_id=1, amount=100.0, timestamp=TS),
            # dangling user FK → null user cols; product 2 null price/discount
            Row(transaction_id="t3", user_id=99, product_id=2, amount=501.0, timestamp=TS),
            # same countries → no mismatch; amount exactly at threshold (not >)
            Row(transaction_id="t4", user_id=3, product_id=1, amount=500.0, timestamp=TS),
        ]
    )
    users = spark.createDataFrame(
        [
            Row(user_id=1, name="a", country="UK"),
            Row(user_id=2, name="b", country=None),
            Row(user_id=3, name="c", country="DE"),
        ]
    )
    products = spark.createDataFrame(
        [
            Row(product_id=1, name="p1", country="DE", base_price=100.0, discount=10.0),
            Row(product_id=2, name="p2", country="US", base_price=None, discount=5.0),
        ]
    )
    return tx, users, products


def test_enrich_semantics(spark):
    tx, users, products = _mini(spark)
    out = enrich_transactions(tx, users, products).orderBy("transaction_id")
    rows = {r.transaction_id: r for r in out.collect()}

    assert len(rows) == 4  # left joins keep every fact row

    r1 = rows["t1"]
    assert (r1.country_mismatch, r1.high_value_flag, r1.fraud_score) == (1, 1, 1.0)
    assert r1.discounted_price == 100.0 - 100.0 * 10.0 / 100

    # null user country → mismatch 0 (null != 'DE' is null → otherwise)
    assert rows["t2"].country_mismatch == 0
    assert rows["t2"].fraud_score == 0.0

    # dangling FK: user cols null, mismatch 0, high value 1
    r3 = rows["t3"]
    assert r3.user_name is None and r3.user_country is None
    assert (r3.country_mismatch, r3.high_value_flag, r3.fraud_score) == (0, 1, 0.5)
    assert r3.discounted_price is None  # null base_price

    # equal countries, amount == threshold → both flags 0
    r4 = rows["t4"]
    assert (r4.country_mismatch, r4.high_value_flag, r4.fraud_score) == (0, 0, 0.0)
    assert (r4.tx_year, r4.tx_month, r4.tx_day) == (2024, 1, 2)


def test_fraud_score_domain(spark, sf_dir):
    from smart_fraud_detection_data_pipeline_spark.queries import q_fraud_enrich

    out = q_fraud_enrich(spark, sf_dir)
    bad = out.where(~F.col("fraud_score").isin(0.0, 0.5, 1.0)).count()
    assert bad == 0
    # discounted_price null iff base_price or discount null
    incons = out.where(
        F.col("discounted_price").isNull()
        != (F.col("base_price").isNull() | F.col("discount").isNull())
    ).count()
    assert incons == 0


def test_enrich_plan_is_broadcast_and_shuffle_free(spark, sf_dir):
    """The enrichment must compile to broadcast hash joins — zero exchanges."""
    from smart_fraud_detection_data_pipeline_spark.queries import q_fraud_enrich

    plan = q_fraud_enrich(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
