"""Query catalog: every implemented operator as a (Spark, oracle-SQL) pair.

This is the engine's correctness surface. Each entry maps a SURVEY.md §2
operator (or an extension operator) onto the driver's testdata star
schema (TESTDATA.md / FIXTURES.md §B) twice: once as an idiomatic
PySpark DataFrame program, once as ANSI SQL for the DuckDB oracle. The
driver executes both at sf=0.01 and compares row counts, schemas and
order-insensitive value hashes — so every computed column is aliased
identically on both sides, every float aggregate uses the exact-decimal
pattern (functions.numeric), and every CASE/cast is written to produce
bit-identical doubles in both engines.

Testdata mapping (FIXTURES.md §B): events ↦ transactions
(event_id↦transaction_id, ts↦timestamp, value↦amount,
event_type↦payment_method/category analog), customer ↦ users
(c_nationkey↦user country), part+supplier ↦ products
(p_type↦category, p_retailprice↦base_price, p_size↦discount%,
s_nationkey↦product country). events carries no product FK, so a
deterministic one is derived: product_id = event_id % |part|,
supplier of a part = p_partkey % |supplier| — same derivation in both
engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smart_fraud_detection_data_pipeline_spark.functions.numeric import exact_sum_double
from smart_fraud_detection_data_pipeline_spark.operators import enrich as E
from smart_fraud_detection_data_pipeline_spark.operators import trends as T
from smart_fraud_detection_data_pipeline_spark.operators.dedup import dedup_keep_last, union_slices
from smart_fraud_detection_data_pipeline_spark.operators.merge import merge_upsert
from smart_fraud_detection_data_pipeline_spark.sources.tables import load_table


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver runs rows-only check (documented why)


_REGISTRY: list[QuerySpec] = []


def _register(name: str, oracle: str | None):
    def deco(fn):
        _REGISTRY.append(QuerySpec(name, fn, oracle))
        return fn

    return deco


def registry() -> list[QuerySpec]:
    return list(_REGISTRY)


# ---------------------------------------------------------------------------
# Shared testdata→reference-shape adapters
# ---------------------------------------------------------------------------

def _transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as the reference's transaction stream shape (FIXTURES §B)."""
    ev = load_table(spark, sf_dir, "events")
    n_part = load_table(spark, sf_dir, "part").count()
    return ev.select(
        F.col("event_id").alias("transaction_id"),
        F.col("user_id"),
        F.pmod(F.col("event_id"), F.lit(n_part)).alias("product_id"),
        F.col("value").alias("amount"),
        F.col("event_type").alias("payment_method"),
        F.col("ts").alias("timestamp"),
    )


def _users_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer as the users dimension (c_nationkey plays `country`)."""
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("country"),
    )


def _products_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part ⨝ supplier as the products dimension; supplier's nation plays
    the product `country`, p_size plays the discount percentage."""
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    n_supp = supp.count()
    return (
        part.join(
            F.broadcast(supp),
            F.pmod(F.col("p_partkey"), F.lit(n_supp)) == F.col("s_suppkey"),
            "left_outer",
        )
        .select(
            F.col("p_partkey").alias("product_id"),
            F.col("p_name").alias("name"),
            F.col("p_type").alias("category"),
            F.col("p_retailprice").alias("base_price"),
            F.col("s_nationkey").alias("country"),
            F.col("p_size").cast("double").alias("discount"),
        )
    )


# Oracle CTE fragments mirroring the adapters (DuckDB SQL).
_SQL_TX = """
tx AS (
  SELECT event_id AS transaction_id,
         user_id,
         event_id % (SELECT count(*) FROM part) AS product_id,
         value AS amount,
         event_type AS payment_method,
         CAST(ts AS TIMESTAMP) AS "timestamp"
  FROM events
)"""

_SQL_USERS = """
u AS (
  SELECT c_custkey AS user_id, c_name AS user_name, c_nationkey AS user_country
  FROM customer
)"""

_SQL_PRODUCTS = """
p AS (
  SELECT p_partkey AS product_id, p_name AS product_name, p_type AS category,
         p_retailprice AS base_price, s_nationkey AS product_country,
         CAST(p_size AS DOUBLE) AS discount
  FROM part LEFT JOIN supplier
    ON s_suppkey = p_partkey % (SELECT count(*) FROM supplier)
)"""


# ---------------------------------------------------------------------------
# Flagship: fraud enrichment (S6, P1-P6, J1/J2, F3-F5 — spark.py:126-168)
# ---------------------------------------------------------------------------

@_register(
    "fraud_enrich",
    f"""
WITH {_SQL_TX}, {_SQL_USERS}, {_SQL_PRODUCTS}
SELECT t.transaction_id, t.user_id, t.product_id, t.amount, t.payment_method,
       t."timestamp",
       u.user_name, u.user_country,
       p.product_name, p.category, p.base_price, p.discount, p.product_country,
       CASE WHEN u.user_country <> p.product_country THEN 1 ELSE 0 END AS country_mismatch,
       CASE WHEN t.amount > 500 THEN 1 ELSE 0 END AS high_value_flag,
       CAST((CASE WHEN u.user_country <> p.product_country THEN 1 ELSE 0 END) * 0.5
            + (CASE WHEN t.amount > 500 THEN 1 ELSE 0 END) * 0.5 AS DOUBLE) AS fraud_score,
       CASE WHEN p.base_price IS NOT NULL AND p.discount IS NOT NULL
            THEN p.base_price - p.base_price * p.discount / 100 END AS discounted_price,
       CAST(year(t."timestamp") AS INTEGER) AS tx_year,
       CAST(month(t."timestamp") AS INTEGER) AS tx_month,
       CAST(day(t."timestamp") AS INTEGER) AS tx_day
FROM tx t
LEFT JOIN u ON t.user_id = u.user_id
LEFT JOIN p ON t.product_id = p.product_id
""",
)
def q_fraud_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: two broadcast left joins + rule-score columns, zero shuffles."""
    out = E.enrich_transactions(
        _transactions(spark, sf_dir),
        _users_dim(spark, sf_dir),
        _products_dim(spark, sf_dir),
    )
    return out.select(
        "transaction_id",
        "user_id",
        "product_id",
        "amount",
        "payment_method",
        "timestamp",
        "user_name",
        "user_country",
        "product_name",
        "category",
        "base_price",
        "discount",
        "product_country",
        "country_mismatch",
        "high_value_flag",
        "fraud_score",
        "discounted_price",
        "tx_year",
        "tx_month",
        "tx_day",
    )


# ---------------------------------------------------------------------------
# Windowed trends (A1-A3, F1/F2, ST2 — spark.py:171-200)
# ---------------------------------------------------------------------------

_SQL_TRENDS = """
SELECT {key_out},
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS {sum_alias},
       COUNT(DISTINCT event_id) AS num_transactions,
       strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       strftime(date_trunc('minute', ts) + INTERVAL 1 MINUTE, '%Y-%m-%d %H:%M:%S') AS window_end
FROM events
GROUP BY {key_in}, date_trunc('minute', ts)
"""


@_register(
    "user_spend_trends",
    _SQL_TRENDS.format(key_out="user_id", key_in="user_id", sum_alias="total_spent"),
)
def q_user_spend_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 with exact distinct counts (oracle-checkable twin of the HLL query)."""
    return T.user_spend_trends(_transactions(spark, sf_dir), exact=True)


@_register(
    "category_trends",
    _SQL_TRENDS.format(
        key_out="event_type AS category", key_in="event_type", sum_alias="total_sales"
    ),
)
def q_category_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: event_type plays the product category (FIXTURES §B)."""
    tx = _transactions(spark, sf_dir).withColumnRenamed("payment_method", "category")
    return T.category_trends(tx, exact=True)


@_register("user_spend_trends_approx", None)  # A3: HLL++ is approximate → rows-only
def q_user_spend_trends_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 faithful mode: approx_count_distinct (HyperLogLog++, rsd 0.05).

    Not oracle-hashable by construction (SURVEY §2 A3) — sketches merge
    associatively, which is the point at 100 TB: one shuffle, bounded
    memory, no expand-distinct blowup.
    """
    return T.user_spend_trends(_transactions(spark, sf_dir), exact=False)


# ---------------------------------------------------------------------------
# Dedup + upsert (A5/A6/A7/A8/J3 — the warehouse entry point, natively)
# ---------------------------------------------------------------------------

@_register(
    "dedup_keep_last",
    """
WITH unioned AS (
  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value, 1 AS batch_id FROM events
  UNION ALL
  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value * 2 AS value, 2 AS batch_id
  FROM events WHERE event_id % 3 = 0
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY batch_id DESC) AS rn
  FROM unioned
)
SELECT event_id, ts, user_id, value, batch_id FROM ranked WHERE rn = 1
""",
)
def q_dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+A6: union of two overlapping load slices, keep-last per key.

    Models the reference's complete-mode re-emission → loader dedup
    contract (ST4 + load_fraud_records...py:154-157): batch 2 re-emits a
    third of the keys with updated values; exactly the batch-2 row must
    survive.
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    batch1 = ev.withColumn("batch_id", F.lit(1))
    batch2 = (
        ev.where(F.col("event_id") % 3 == 0)
        .withColumn("value", F.col("value") * 2)
        .withColumn("batch_id", F.lit(2))
    )
    return dedup_keep_last(union_slices(batch1, batch2), ["event_id"], ["batch_id"])


@_register(
    "merge_upsert",
    """
WITH t AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
         COUNT(*) AS num_orders
  FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01' GROUP BY o_custkey
), s AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
         COUNT(*) AS num_orders
  FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01' GROUP BY o_custkey
)
SELECT COALESCE(s.o_custkey, t.o_custkey) AS o_custkey,
       CASE WHEN s.o_custkey IS NOT NULL THEN s.total_price ELSE t.total_price END AS total_price,
       CASE WHEN s.o_custkey IS NOT NULL THEN s.num_orders ELSE t.num_orders END AS num_orders
FROM t FULL OUTER JOIN s ON t.o_custkey = s.o_custkey
""",
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/J3: keyed upsert — new-period per-customer totals overwrite the
    old snapshot, unmatched old rows survive (MERGE semantics as a pure
    DataFrame transform; see operators.merge for the scale notes)."""
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1999-01-01").cast("timestamp_ntz")

    def totals(df):
        return df.groupBy("o_custkey").agg(
            exact_sum_double("o_totalprice").alias("total_price"),
            F.count(F.lit(1)).alias("num_orders"),
        )

    target = totals(orders.where(F.col("o_orderdate") < cutoff))
    source = totals(orders.where(F.col("o_orderdate") >= cutoff))
    return merge_upsert(target, source, ["o_custkey"])


# ---------------------------------------------------------------------------
# Relational coverage: scan/filter pushdown, agg, join, top-k
# ---------------------------------------------------------------------------

@_register(
    "pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped scan+filter+agg: exercises predicate pushdown,
    column pruning, partial aggregation, exact-decimal money math."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@_register(
    "top_customers",
    """
SELECT c.c_custkey, c.c_name,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
       COUNT(*) AS num_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
ORDER BY total_spent DESC, c_custkey
LIMIT 10
""",
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + global top-k. The ORDER BY ... LIMIT compiles to
    TakeOrderedAndProject — per-partition top-k then a k-row merge on the
    driver, no global sort shuffle (the plan that survives 100 TB)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            exact_sum_double("o_totalprice").alias("total_spent"),
            F.count(F.lit(1)).alias("num_orders"),
        )
        .orderBy(F.col("total_spent").desc(), F.col("c_custkey"))
        .limit(10)
    )


@_register(
    "scan_filter_project",
    """
SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_returnflag = 'N' AND l_quantity > 25
""",
)
def q_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/P-filters: projection+predicates that must reach the parquet scan
    (PushedFilters + 4-column ReadSchema — verified in tests/plans)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp_ntz"))
            & (F.col("l_returnflag") == "N")
            & (F.col("l_quantity") > 25)
        )
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    )


@_register(
    "customers_no_big_order",
    """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000
)
""",
)
def q_customers_no_big_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (beyond-reference join coverage): customers with no
    order above 300k. The filter lands on the probe side pre-join."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@_register(
    "customers_with_big_order",
    """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000
)
""",
)
def q_customers_with_big_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (beyond-reference join coverage)."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )
