"""Plan-shape assertions: the 100 TB contract as tests.

Each assertion encodes a property that keeps a query viable at three
orders of magnitude more data — broadcast joins for dimension
enrichment, pushdown into the parquet scan, partial aggregation before
the shuffle, top-k without a global sort.
"""

from __future__ import annotations

from smart_fraud_detection_data_pipeline_spark.plans import explain as X
from smart_fraud_detection_data_pipeline_spark.queries import registry

Q = {s.name: s.spark_fn for s in registry()}


def test_enrichment_is_broadcast_only(spark, sf_dir):
    """Dimension enrichment must be shuffle-free: broadcast joins, no
    SortMergeJoin, no hash-partition exchange of the fact side."""
    c = X.plan_counts(Q["fraud_enrich"](spark, sf_dir))
    assert c["broadcast_hash_join"] >= 2
    assert c["sort_merge_join"] == 0
    assert c["exchange"] == 0


def test_scan_filter_pushdown_and_pruning(spark, sf_dir):
    df = Q["scan_filter_project"](spark, sf_dir)
    pushed = X.pushed_filters(df)
    assert "l_returnflag" in pushed and "l_quantity" in pushed
    schema = X.read_schema(df)
    # column pruning: the 11-column lineitem scan reads only what's needed
    assert "l_extendedprice" in schema
    for unused in ("l_tax", "l_comment", "l_suppkey"):
        assert unused not in schema


def test_trends_shuffle_budget(spark, sf_dir):
    """Windowed trends: the exact-distinct variant pays exactly the
    2-shuffle expand plan (per-id pre-agg + final), the HLL variant
    exactly 1 shuffle — the reason approx is the default in streaming
    and the 100 TB path."""
    exact = X.plan_counts(Q["user_spend_trends"](spark, sf_dir))
    assert exact["exchange"] == 2
    assert exact["hash_aggregate"] >= 3  # partial, per-id merge, final

    approx = X.plan_counts(Q["user_spend_trends_approx"](spark, sf_dir))
    assert approx["exchange"] == 1
    assert approx["hash_aggregate"] == 2  # partial + final, sketches merge


def test_topk_avoids_global_sort(spark, sf_dir):
    """ORDER BY + LIMIT must compile to TakeOrderedAndProject, not a
    full sort shuffle."""
    plan = X.executed_plan(Q["top_customers"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_enrichment_wholestage_codegen(spark, sf_dir):
    """Score columns are pure Catalyst expressions — they must run inside
    WholeStageCodegen, not as interpreted projections. (AQE defers
    codegen staging to runtime, so inspect with AQE off.)"""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        c = X.plan_counts(Q["fraud_enrich"](spark, sf_dir))
        assert c["wholestage_codegen"] >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_exact_dedup_single_shuffle(spark, sf_dir):
    c = X.plan_counts(Q["doc_dedup_exact"](spark, sf_dir))
    assert c["exchange"] == 1  # one shuffle on the digest
    assert c["hash_aggregate"] >= 2


def test_text_profile_is_map_only(spark, sf_dir):
    """The whole text-analysis profile must be a narrow projection —
    zero shuffles at any scale."""
    c = X.plan_counts(Q["doc_profile"](spark, sf_dir))
    assert c["exchange"] == 0
    assert c["sort_merge_join"] == 0
