"""Fraud-enrichment operator: dimension joins + rule-based score columns.

Reference parity (spark.py:126-168):
- P1  pre-join column renames to disambiguate `country`/`name`
       (spark.py:130-134)
- J1/J2 stream-static LEFT OUTER equi-joins fact->users, ->products
       (spark.py:140-143); unmatched facts keep null dimension attrs
- P2  `country_mismatch` = when(user_country != product_country, 1)
       .otherwise(0) — null on either side → 0 (spark.py:149-152)
- P3  `high_value_flag` = when(amount > 500, 1).otherwise(0)
       (spark.py:153-156)
- P4  `fraud_score` = 0.5*country_mismatch + 0.5*high_value_flag
       (spark.py:157-160)
- P5  `discounted_price` = null-guarded base_price - base_price*discount/100
       (spark.py:161-167)
- F3  partition columns tx_year/tx_month/tx_day from event time
       (spark.py:221-225)

Scale design: the dimension sides are orders of magnitude smaller than
the fact stream (2000 users / 500 products in the reference; customer/
part/supplier here), so both joins are explicit ``broadcast()`` hash
joins — zero shuffles for the whole enrichment at any fact size. The
computed columns are pure Catalyst column expressions (no UDFs), so the
entire operator stays inside one WholeStageCodegen span over the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HIGH_VALUE_THRESHOLD = 500.0


def mismatch_flag(left: Column, right: Column) -> Column:
    """1 when both sides non-null and different, else 0 (P2 null semantics:
    ``null != x`` is null → otherwise(0))."""
    return F.when(left != right, F.lit(1)).otherwise(F.lit(0))


def high_value_flag(amount: Column, threshold: float = HIGH_VALUE_THRESHOLD) -> Column:
    """1 when amount strictly exceeds the threshold (P3)."""
    return F.when(amount > F.lit(threshold), F.lit(1)).otherwise(F.lit(0))


def fraud_score(country_mismatch: Column, high_value: Column) -> Column:
    """Weighted rule score ∈ {0.0, 0.5, 1.0} (P4)."""
    return (country_mismatch * F.lit(0.5) + high_value * F.lit(0.5)).cast("double")


def discounted_price(base_price: Column, discount_pct: Column) -> Column:
    """base_price less discount%, null when either input is null (P5)."""
    return F.when(
        base_price.isNotNull() & discount_pct.isNotNull(),
        base_price - base_price * discount_pct / F.lit(100),
    ).otherwise(F.lit(None).cast("double"))


def add_event_date_parts(df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    """Derive tx_year/tx_month/tx_day partition columns from event time (F3)."""
    t = F.col(ts_col)
    return (
        df.withColumn("tx_year", F.year(t))
        .withColumn("tx_month", F.month(t))
        .withColumn("tx_day", F.dayofmonth(t))
    )


def enrich_transactions(
    transactions: DataFrame,
    users: DataFrame,
    products: DataFrame,
    *,
    user_key: str = "user_id",
    product_key: str = "product_id",
    amount_col: str = "amount",
    ts_col: str = "timestamp",
    threshold: float = HIGH_VALUE_THRESHOLD,
    with_date_parts: bool = True,
) -> DataFrame:
    """Reference-shaped enrichment on TRANSACTION/USER/PRODUCT schemas.

    Works identically for batch and streaming `transactions` (stream-static
    joins are stateless). Dimension sides are broadcast.
    """
    users_r = (
        users.withColumnRenamed("country", "user_country")
        .withColumnRenamed("name", "user_name")
    )
    products_r = (
        products.withColumnRenamed("country", "product_country")
        .withColumnRenamed("name", "product_name")
    )
    out = (
        transactions.join(F.broadcast(users_r), on=user_key, how="left_outer")
        .join(F.broadcast(products_r), on=product_key, how="left_outer")
        .withColumn(
            "country_mismatch", mismatch_flag(F.col("user_country"), F.col("product_country"))
        )
        .withColumn("high_value_flag", high_value_flag(F.col(amount_col), threshold))
        .withColumn(
            "fraud_score", fraud_score(F.col("country_mismatch"), F.col("high_value_flag"))
        )
        .withColumn(
            "discounted_price", discounted_price(F.col("base_price"), F.col("discount"))
        )
    )
    if with_date_parts:
        out = add_event_date_parts(out, ts_col)
    return out
