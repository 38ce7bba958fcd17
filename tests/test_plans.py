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
    2-shuffle expand plan (per-id pre-agg + final), the HLL OPERATOR
    exactly 1 shuffle — the reason approx is the default in streaming
    and the 100 TB path. The pin targets the operator directly: the
    REGISTERED user_spend_trends_approx is now the self-checking gate
    (VERDICT r6 #2) and deliberately pays the expand a second time to
    compare sketch vs exact."""
    from smart_fraud_detection_data_pipeline_spark.operators import trends as T
    from smart_fraud_detection_data_pipeline_spark.queries import _transactions

    exact = X.plan_counts(Q["user_spend_trends"](spark, sf_dir))
    assert exact["exchange"] == 2
    assert exact["hash_aggregate"] >= 3  # partial, per-id merge, final

    approx = X.plan_counts(
        T.user_spend_trends(_transactions(spark, sf_dir), exact=False)
    )
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


def test_correlated_exists_decorrelates_to_semi_join(spark, sf_dir):
    """The correlated EXISTS (TPC-H Q4 shape) must decorrelate into a
    hash semi-join, never a per-row nested-loop re-scan of lineitem."""
    plan = X.executed_plan(Q["late_shipment_orders"](spark, sf_dir))
    assert "LeftSemi" in plan
    c = X.plan_counts(Q["late_shipment_orders"](spark, sf_dir))
    assert c["nested_loop_join"] == 0


def test_scalar_subquery_avg_prefilters_before_agg(spark, sf_dir):
    """Q17 shape: the per-part average must aggregate only brand-
    surviving partkeys (broadcast semi-join upstream of the groupBy) —
    at 100 TB the difference between aggregating 1% and 100% of
    lineitem."""
    df = Q["small_quantity_revenue"](spark, sf_dir)
    plan = X.executed_plan(df)
    assert plan.count("LeftSemi") >= 1
    c = X.plan_counts(df)
    assert c["broadcast_hash_join"] >= 2  # semi filter + avg join
    assert c["nested_loop_join"] == 0


def test_cohort_and_funnel_shuffle_budgets(spark, sf_dir):
    """Cohort: the custkey repartition serves distinct AND window — 2
    exchanges total. Funnel: per-user conditional MINs then a scalar
    rollup — 2 exchanges, no self-joins at all."""
    cohort = X.plan_counts(Q["cohort_retention"](spark, sf_dir))
    assert cohort["exchange"] == 2
    funnel = X.plan_counts(Q["user_funnel"](spark, sf_dir))
    assert funnel["exchange"] == 2
    assert funnel["sort_merge_join"] == funnel["broadcast_hash_join"] == 0


def test_correlated_min_where_decorrelates(spark, sf_dir):
    """Q2 shape: correlated scalar MIN in WHERE must become one per-key
    aggregate (partial+final) joined back — 1 exchange, no nested loop."""
    c = X.plan_counts(Q["min_cost_suppliers"](spark, sf_dir))
    assert c["nested_loop_join"] == 0
    assert c["exchange"] == 1
    assert c["hash_aggregate"] == 2


def test_lateral_topk_decorrelates_to_window_group_limit(spark, sf_dir):
    """The correlated LATERAL (per-nation top-2) must decorrelate into
    WindowGroupLimit + broadcast join — per-partition partial top-k
    below the shuffle, never a per-outer-row re-scan."""
    plan = X.executed_plan(Q["nation_top_customers_lateral"](spark, sf_dir))
    assert "WindowGroupLimit" in plan
    c = X.plan_counts(Q["nation_top_customers_lateral"](spark, sf_dir))
    assert c["nested_loop_join"] == 0
    assert c["broadcast_hash_join"] >= 1


def test_incremental_merge_prunes_partitions(spark, sf_dir, tmp_path):
    """merge_upsert_partitioned against a Hive-partitioned parquet target
    must push its partition-scope filters into the scan as
    PartitionFilters — both branches (touched IN, untouched NOT IN) prune
    BEFORE file listing, so merge cost scales with the source months,
    not the target's history."""
    from pyspark.sql import functions as F

    from smart_fraud_detection_data_pipeline_spark.operators.merge import (
        merge_upsert_partitioned,
    )
    from smart_fraud_detection_data_pipeline_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.withColumn("order_month", F.date_format("o_orderdate", "yyyy-MM"))
        .groupBy("order_month", "o_custkey")
        .agg(F.count(F.lit(1)).alias("num_orders"))
    )
    path = str(tmp_path / "snapshot")
    monthly.write.partitionBy("order_month").parquet(path)
    target = spark.read.parquet(path)

    source = monthly.where(F.col("order_month") == "2001-07").withColumn(
        "num_orders", F.col("num_orders") + 1
    )
    merged = merge_upsert_partitioned(
        target, source, ["order_month", "o_custkey"], "order_month"
    )
    pf = X.partition_filters(merged)
    assert "order_month" in pf  # both target scans prune on the partition col
    assert "2001-07" in pf
    # and the result is the full snapshot with exactly that month restated
    assert merged.count() == monthly.count()
    restated = merged.join(
        monthly.withColumnRenamed("num_orders", "old_n"),
        ["order_month", "o_custkey"],
    ).where(F.col("num_orders") != F.col("old_n"))
    assert restated.select("order_month").distinct().collect()[0][0] == "2001-07"


def test_vocab_topk_no_global_sort(spark, sf_dir):
    """Vocabulary building: one shuffle for the ngram counts, then
    TakeOrderedAndProject for the cut — a global sort of the full vocab
    would be the scale bug."""
    df = Q["vocab_top_ngrams"](spark, sf_dir)
    assert "TakeOrderedAndProject" in X.executed_plan(df)
    assert X.plan_counts(df)["exchange"] == 1


def test_winsorize_broadcasts_thresholds(spark, sf_dir):
    """The clamp join must broadcast the 5-row threshold table — the
    fact stream is never reshuffled for it (its only exchange is the
    percentile aggregation itself)."""
    c = X.plan_counts(Q["value_winsorized"](spark, sf_dir))
    assert c["broadcast_hash_join"] == 1
    assert c["sort_merge_join"] == 0


def test_text_profile_is_map_only(spark, sf_dir):
    """The whole text-analysis profile must be a narrow projection —
    zero KEYED shuffles at any scale. The one exchange allowed is the
    round-robin spread of an under-split scan (skew.spread_input, a
    no-op at production split counts), and it must stay round-robin:
    a keyed exchange appearing here means the fold grew a shuffle."""
    c = X.plan_counts(Q["doc_profile"](spark, sf_dir))
    assert c["exchange"] == 0
    assert c["roundrobin"] <= 1
    assert c["sort_merge_join"] == 0
    # same contract for the repetition quality rule
    r = X.plan_counts(Q["doc_repetition"](spark, sf_dir))
    assert r["exchange"] == 0
    assert r["roundrobin"] <= 1
    assert r["sort_merge_join"] == 0


def test_nation_trade_volume_dims_broadcast(spark, sf_dir):
    """Q7 shape: both nation-filtered dimension arms (customer+nation,
    supplier+nation) must broadcast — the only shuffle that grows with
    data is the fact-side order-key join/agg."""
    df = Q["nation_trade_volume"](spark, sf_dir)
    c = X.plan_counts(df)
    assert c["broadcast_hash_join"] >= 4
    assert c["sort_merge_join"] == 0
    assert c["nested_loop_join"] == 0


def test_large_volume_customers_single_fact_shuffle(spark, sf_dir):
    """Q18 shape: exactly one data-sized shuffle (the lineitem order-key
    aggregation); the HAVING survivors broadcast into orders and the
    top-100 compiles to TakeOrderedAndProject, not a global sort."""
    df = Q["large_volume_customers"](spark, sf_dir)
    c = X.plan_counts(df)
    assert c["exchange"] == 1
    assert c["broadcast_hash_join"] == 2
    assert "TakeOrderedAndProject" in X.executed_plan(df)


def test_late_sole_suppliers_shares_orderkey_partitioning(spark, sf_dir):
    """Q21 shape: EXISTS + NOT EXISTS collapsed into a groupBy plus
    window aggregates over ONE explicit order-key repartition (the
    former persist + self-join is gone — no cached partitions, one
    fewer shuffle); nothing falls back to a nested loop."""
    df = Q["late_sole_suppliers"](spark, sf_dir)
    plan = X.executed_plan(df)
    assert "REPARTITION_BY_COL" in plan  # the single fact shuffle
    assert "InMemoryTableScan" not in plan  # no persisted intermediate
    c = X.plan_counts(df)
    assert c["nested_loop_join"] == 0
    # groupBy(l_orderkey, l_suppkey) + window(l_orderkey) both reuse the
    # explicit repartition: the only other exchange is the join with
    # orders (broadcast under AQE) — allow <=2 total just in case AQE
    # chooses SMJ for it at larger SFs.
    assert c["exchange"] <= 2


def test_idle_rich_customers_anti_join_and_scalar_stats(spark, sf_dir):
    """Q22 shape: NOT EXISTS must decorrelate to a hash anti-join (never
    a per-row re-scan of orders); the 1-row stats CTE joins as a
    broadcast nested loop, which is scalar and free."""
    df = Q["idle_rich_customers"](spark, sf_dir)
    plan = X.executed_plan(df)
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan.split("LeftAnti")[1]


def test_decontaminate_never_shuffles_train_side(spark, sf_dir):
    """Decontamination: the training corpus is the 100 TB side — it may
    only be read map-side (broadcast semi-join of the eval gram set).
    The exchanges in the plan are all eval-sized: eval-gram distinct,
    hit-gram distinct, final per-doc agg."""
    df = Q["doc_decontaminate"](spark, sf_dir)
    c = X.plan_counts(df)
    assert c["broadcast_hash_join"] == 2  # semi-join in, hit set back
    assert c["sort_merge_join"] == 0
    assert c["exchange"] == 3
    assert "LeftSemi" in X.executed_plan(df)


def test_stratified_sample_uses_window_group_limit(spark, sf_dir):
    """Exact-k stratified sampling must push the rank<=k cut below the
    stratum shuffle (WindowGroupLimit): each map partition forwards at
    most k rows per stratum, so a skewed stratum never materializes its
    full rank."""
    df = Q["doc_sample_stratified"](spark, sf_dir)
    plan = X.executed_plan(df)
    assert "WindowGroupLimit" in plan
    assert X.plan_counts(df)["exchange"] == 1


def test_runtime_bloom_filter_reaches_fact_scan(spark, sf_dir):
    """Runtime filter injection (the 100 TB lever when the dim side is
    too big to broadcast): with broadcast off, a selective dimension
    filter must still reach the fact side as a bloom-filter
    might_contain predicate ABOVE the scan — rows drop before the
    shuffle, turning a full-fact exchange into a filtered one. The two
    size thresholds are lowered only because local testdata sits far
    under the 10 GB production defaults."""
    from pyspark.sql import functions as F

    from smart_fraud_detection_data_pipeline_spark.sources.tables import load_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = X.executed_plan(j)
        assert "might_contain" in plan, "runtime bloom filter not injected"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_multi_distinct_pays_expand(spark, sf_dir):
    """Two exact DISTINCT clauses + plain aggregates in one GROUP BY
    must compile to an Expand (input replicated once per distinct
    clause before the shuffle) — pinned so the cost model is explicit:
    row volume into the exchange is 3x, which is exactly why the HLL
    variant exists for the 100 TB path."""
    df = Q["multi_distinct_stats"](spark, sf_dir)
    plan = X.executed_plan(df)
    assert "Expand" in plan
    assert X.plan_counts(df)["exchange"] == 2  # expanded partial + final


def test_winnow_fingerprints_map_only_and_pairs_shuffle_budget(spark, sf_dir):
    """Winnowing selection must stay a narrow projection (both HOF folds
    in-row — no explode before selection, no shuffle); the pairs query
    pays exactly two shuffles: fingerprint inverted index + pair count."""
    c = X.plan_counts(Q["doc_winnow"](spark, sf_dir))
    assert c["exchange"] == 0
    assert c["roundrobin"] <= 1  # spread_input only — never a keyed shuffle
    assert c["sort_merge_join"] == 0
    p = X.plan_counts(Q["doc_winnow_pairs"](spark, sf_dir))
    assert p["exchange"] == 2
    assert p["roundrobin"] <= 1
    assert p["sort_merge_join"] == 0


def test_profit_star_join_broadcasts_all_dims(spark, sf_dir):
    """TPC-H Q9 shape: part/supplier/nation all broadcast — the fact
    table reaches the (nation, year) aggregation without ever being
    shuffled for a join; one exchange total."""
    c = X.plan_counts(Q["nation_year_profit"](spark, sf_dir))
    assert c["broadcast_hash_join"] == 3
    assert c["sort_merge_join"] == 0
    assert c["exchange"] == 1


def test_order_distribution_preaggregates_before_join(spark, sf_dir):
    """TPC-H Q13 shape: orders must pre-aggregate to per-custkey counts
    BEFORE joining customer — the per-order rows cross exactly one
    exchange, and the plan never sort-merge-joins raw orders."""
    df = Q["customer_order_distribution"](spark, sf_dir)
    plan = X.executed_plan(df)
    # the orders-side aggregate sits below the join in the plan tree
    assert plan.index("HashAggregate") < plan.index("Join")
    c = X.plan_counts(df)
    assert c["exchange"] <= 3


def test_disjunctive_baskets_push_to_both_scans(spark, sf_dir):
    """TPC-H Q19 shape: the OR-of-ANDs predicate must decompose per
    table — quantity range union onto the lineitem scan, brand/size
    disjunction onto the part scan."""
    pushed = X.pushed_filters(Q["brand_basket_revenue"](spark, sf_dir))
    assert "l_quantity" in pushed
    assert "p_brand" in pushed


def test_prolific_suppliers_all_semi_joins_broadcast(spark, sf_dir):
    """TPC-H Q20 shape: both IN subqueries become broadcast LEFT SEMI
    joins; neither lineitem nor supplier is shuffled for a join."""
    plan = X.executed_plan(Q["prolific_red_part_suppliers"](spark, sf_dir))
    assert plan.count("LeftSemi") == 2
    assert "SortMergeJoin" not in plan


def _physical_section(plan: str) -> str:
    """The '== Physical Plan ==' slice of an explainInternal(True) dump."""
    return plan.split("== Physical Plan ==", 1)[1]


def test_stream_stream_join_state_plan(spark, tmp_path):
    """VERDICT r2 next #5: pin the stream-stream join's STATE plan the
    way batch joins are pinned — exactly one StreamingSymmetricHashJoin
    (watermark-bounded dual state stores), a watermark on BOTH inputs,
    and no fallback to an unbounded batch join operator."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    d = str(tmp_path / "in")
    rows = [
        (1, 100, "2024-01-01 00:00:00", "error"),
        (2, 100, "2024-01-01 00:02:00", "click"),
    ]
    schema = "event_id bigint, user_id bigint, ts_str string, event_type string"
    spark.createDataFrame(rows, schema).select(
        "event_id", "user_id",
        F.col("ts_str").cast("timestamp").alias("ts"), "event_type",
    ).coalesce(1).write.mode("append").parquet(d)

    def reader():
        return spark.readStream.schema(spark.read.parquet(d).schema).parquet(d)

    errors = (
        reader().where(F.col("event_type") == "error")
        .select(F.col("event_id").alias("err_id"), "user_id",
                F.col("ts").alias("err_time"))
        .withWatermark("err_time", "15 minutes")
    )
    follows = (
        reader()
        .select(F.col("event_id").alias("follow_id"),
                F.col("user_id").alias("f_user"), F.col("ts").alias("f_time"))
        .withWatermark("f_time", "15 minutes")
    )
    pairs = errors.join(
        follows,
        (F.col("user_id") == F.col("f_user"))
        & (F.col("f_time") > F.col("err_time"))
        & (F.col("f_time") <= F.col("err_time") + F.expr("INTERVAL 10 MINUTES")),
        "inner",
    ).select("err_id", "follow_id")
    q = (
        pairs.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination(120)
        phys = _physical_section(q._jsq.explainInternal(True))
    finally:
        q.stop()
    assert phys.count("StreamingSymmetricHashJoin") == 1
    assert phys.count("EventTimeWatermark") == 2  # one per input stream
    # state is keyed on the equi-join key only; range condition filters state
    assert "user_id" in phys
    for banned in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert banned not in phys


def test_streaming_agg_state_store_save_restore(spark, tmp_path):
    """Windowed streaming aggregation must run through exactly one
    StateStoreRestore/StateStoreSave pair (per-key incremental state),
    with partial aggregation BELOW the restore — four HashAggregates in
    the canonical partial/merge sandwich, not a stateless re-agg."""
    from pyspark.sql import functions as F

    d = str(tmp_path / "in")
    rows = [(100, 5.0, "2024-01-01 00:00:00"), (100, 7.0, "2024-01-01 00:20:00")]
    spark.createDataFrame(rows, "user_id bigint, amount double, ts_str string").select(
        "user_id", "amount", F.col("ts_str").cast("timestamp").alias("ts"),
    ).coalesce(1).write.mode("append").parquet(d)
    agg = (
        spark.readStream.schema(spark.read.parquet(d).schema).parquet(d)
        .withWatermark("ts", "15 minutes")
        .groupBy(F.window("ts", "1 minute"), "user_id")
        .agg(F.sum("amount").alias("total"))
    )
    q = (
        agg.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination(120)
        phys = _physical_section(q._jsq.explainInternal(True))
    finally:
        q.stop()
    assert phys.count("StateStoreRestore") == 1
    assert phys.count("StateStoreSave") == 1
    assert phys.count("EventTimeWatermark") == 1


def test_chunk_overlap_map_only(spark, sf_dir):
    """Chunking is explode-over-scan: zero exchanges, zero joins — the
    shape that scales linearly with corpus bytes."""
    c = X.plan_counts(Q["doc_chunk_overlap"](spark, sf_dir))
    assert c["exchange"] == 0
    assert c["sort_merge_join"] == 0 and c["broadcast_hash_join"] == 0


def test_pii_redact_map_only(spark, sf_dir):
    """Regex scrubbing must stay a pure projection over the scan (plus
    at most the round-robin under-split spread, never a keyed one)."""
    c = X.plan_counts(Q["events_pii_redact"](spark, sf_dir))
    assert c["exchange"] == 0
    assert c["roundrobin"] <= 1


def test_quantized_topk_broadcasts_queries_not_corpus(spark, sf_dir):
    """Int8 top-k: queries broadcast into a nested-loop over the corpus
    (corpus never shuffles for the join); the only exchange is the
    window top-k's hash partition on query_id."""
    plan = X.executed_plan(Q["embed_quantized_topk"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    c = X.plan_counts(Q["embed_quantized_topk"](spark, sf_dir))
    assert c["exchange"] <= 1
    assert c["sort_merge_join"] == 0


def test_market_share_single_fact_shuffle(spark, sf_dir):
    """TPC-H Q8 shape: five broadcast dims; only lineitem↔orders pays a
    shuffle pair (plus the final 2-row year aggregation)."""
    c = X.plan_counts(Q["nation_market_share"](spark, sf_dir))
    assert c["broadcast_hash_join"] >= 4
    assert c["sort_merge_join"] <= 1  # lineitem↔orders may SMJ under AQE
    plan = X.executed_plan(Q["nation_market_share"](spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_returned_items_topk_no_global_sort(spark, sf_dir):
    """TPC-H Q10 shape: LIMIT 20 under ORDER BY must be
    TakeOrderedAndProject, never a global Sort+Exchange."""
    plan = X.executed_plan(Q["returned_item_losses"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_dynamic_partition_pruning_reaches_fact_scan(spark, sf_dir, tmp_path):
    """DPP: a fact table Hive-partitioned on the join key must receive a
    runtime dynamicpruning subquery from the dim side's selective
    predicate — at 100 TB the fact scan lists only the partitions the
    dim filter selects, instead of every partition plus a post-join
    drop. Complements the bloom-filter test (row-level runtime filter)
    with the partition-level one."""
    from pyspark.sql import functions as F

    from smart_fraud_detection_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").drop("props")
    path = str(tmp_path / "events_by_type")
    ev.write.partitionBy("event_type").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("error", 1), ("click", 0), ("view", 0), ("signup", 0), ("purchase", 0)],
        "event_type: string, is_alert: int",
    )
    joined = fact.join(dim.where(F.col("is_alert") == 1), "event_type").groupBy(
        "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    plan = X.formatted_plan(joined)
    assert "dynamicpruning" in plan.lower(), "DPP subquery not injected"
    rows = joined.collect()
    assert [r.event_type for r in rows] == ["error"]
    assert rows[0].n == ev.where(F.col("event_type") == "error").count()


def test_ohlc_single_shuffle_serves_windows_and_agg(spark, sf_dir):
    """OHLC downsample: both row_number specs (asc + desc) and the final
    aggregation share ONE hash exchange on (user_id, hour) — adding the
    open/close picks must not add shuffles over a plain windowed agg."""
    c = X.plan_counts(Q["user_value_ohlc"](spark, sf_dir))
    assert c["exchange"] == 1
    assert c["sort_merge_join"] == 0


def test_scd2_single_exchange_map_shaped(spark, sf_dir):
    """SCD2 interval build: one user-partitioned exchange, no joins —
    output size = input size, so the build scales with the fact scan."""
    c = X.plan_counts(Q["user_scd2_intervals"](spark, sf_dir))
    assert c["exchange"] == 1
    assert c["broadcast_hash_join"] == 0 and c["sort_merge_join"] == 0


def test_snapshot_diff_pushes_both_snapshot_filters(spark, sf_dir):
    """CDC diff: the full-outer join pays its two key exchanges, and each
    snapshot's date predicate reaches its parquet scan."""
    df = Q["orders_snapshot_diff"](spark, sf_dir)
    c = X.plan_counts(df)
    assert c["sort_merge_join"] == 1
    assert c["exchange"] == 2
    pushed = X.pushed_filters(df)
    assert "LessThan(o_orderdate" in pushed
    assert "GreaterThanOrEqual(o_orderdate" in pushed


def test_tfidf_cosine_pairs_posting_lists_not_self_join(spark, sf_dir):
    """Sparse cosine: pairs must come from in-row posting-list expansion
    (Generate over collect_list), never a token self-join that shuffles
    the weight table twice and materializes both pair orders; the
    checkpointed weight frame caps the whole plan at 4 exchanges."""
    df = Q["doc_tfidf_cosine_pairs"](spark, sf_dir)
    plan = X.executed_plan(df)
    assert "Generate" in plan  # explode of the pair combinations
    c = X.plan_counts(df)
    assert c["exchange"] <= 4
    assert c["sort_merge_join"] == 0


def test_event_transitions_single_shuffle(spark, sf_dir):
    """Markov transitions: lead() window and the (user_id, ...) groupBy
    share one user_id exchange."""
    c = X.plan_counts(Q["user_event_transitions"](spark, sf_dir))
    assert c["exchange"] == 1


def test_unigram_logprob_vocab_broadcasts(spark, sf_dir):
    """LM quality signal: the Zipf-small vocabulary aggregate must
    broadcast back onto the exploded tokens — the fact side pays only
    its own per-doc aggregation shuffle, never a join shuffle."""
    df = Q["doc_unigram_logprob"](spark, sf_dir)
    c = X.plan_counts(df)
    assert c["broadcast_hash_join"] == 1
    assert c["sort_merge_join"] == 0
    assert c["exchange"] <= 2  # vocab count + per-doc agg


def test_training_export_no_global_sort(spark, sf_dir):
    """The end-to-end export composite: the pack stage must hash-
    partition on shard (window sort within partitions), never a global
    range sort; the near-dup stage is the only join-heavy phase."""
    df = Q["corpus_training_export"](spark, sf_dir)
    plan = X.executed_plan(df)
    assert "rangepartitioning" not in plan.lower()
    c = X.plan_counts(df)
    assert c["nested_loop_join"] == 0


def test_txn_velocity_single_exchange_range_frame(spark, sf_dir):
    """Velocity features: one user_id hash exchange; the trailing window
    is a RANGE frame inside the sort — no self-join, no interval
    explosion."""
    c = X.plan_counts(Q["user_txn_velocity"](spark, sf_dir))
    assert c["exchange"] == 1
    assert c["sort_merge_join"] == 0 and c["broadcast_hash_join"] == 0


def test_asof_merge_single_exchange(spark, sf_dir):
    """Unbucketed as-of union-merge: the whole operator is ONE hash
    exchange on the equi-key (union both sides, sort the timeline,
    carry with last(ignorenulls)) — no join node, no pair
    materialization."""
    c = X.plan_counts(Q["asof_last_purchase"](spark, sf_dir))
    assert c["exchange"] == 1
    assert c["sort_merge_join"] == 0 and c["broadcast_hash_join"] == 0
    assert c["nested_loop_join"] == 0


def test_asof_bucketed_carry_broadcasts(spark, sf_dir):
    """bucket_seconds hot-key split: the merge window repartitions on
    (key, bucket) and the bucket-granular carry frames — one row per
    non-empty bucket, tiny by construction — must BROADCAST back onto
    the fact, never sort-merge-join it; total exchanges stay bounded
    (fact on (key,bucket), carry-out, carry-in window, distinct
    buckets), none of them a second full-fact reshuffle on the bare
    key."""
    c = X.plan_counts(Q["asof_last_purchase_bucketed"](spark, sf_dir))
    assert c["broadcast_hash_join"] == 2  # carry-out->carries, carries->fact
    assert c["sort_merge_join"] == 0
    assert c["nested_loop_join"] == 0
    assert c["exchange"] <= 4


def test_interval_bucketed_no_nested_loop(spark, sf_dir):
    """Bucketed interval join: the (key, bucket) equi-join must stay a
    hash/sort join (never BroadcastNestedLoopJoin — the plan a pure
    range predicate degenerates to), with the range conjunct applied
    inside/after it; exchange count bounded."""
    c = X.plan_counts(Q["error_burst_window_bucketed"](spark, sf_dir))
    assert c["nested_loop_join"] == 0
    assert c["exchange"] <= 3


def test_semantic_dedup_is_cluster_equijoin(spark, sf_dir):
    """SemDeDup's pair generation must be an EQUI-join on the cluster id
    (cost Σ cluster², shuffled on the cluster key) — never a nested-loop
    all-pairs scan — and the survivor join back is broadcastable (the
    dup list is at most one row per removed vector). Assignment itself
    is a map-only projection, so the exchange budget stays at the pair
    join + the per-vector min aggregation."""
    c = X.plan_counts(Q["embed_semantic_dedup"](spark, sf_dir))
    assert c["nested_loop_join"] == 0
    assert c["sort_merge_join"] + c["broadcast_hash_join"] >= 1
    assert c["exchange"] <= 3


def test_incremental_dedup_probe_shape(spark, sf_dir):
    """Incremental dedup must stay candidate-bounded: the probe is an
    EQUI-join on (band, key) — never a nested loop — and the whole
    admit/reject decision fits a bounded exchange budget (delta
    buckets + candidate dedup + verification joins). The base corpus
    is never self-paired; its only appearance is as the probed side of
    the bucket join."""
    c = X.plan_counts(Q["doc_dedup_incremental"](spark, sf_dir))
    assert c["nested_loop_join"] == 0
    assert c["sort_merge_join"] + c["broadcast_hash_join"] >= 2
    assert c["exchange"] <= 5


def test_bloom_decontaminate_train_lineage_is_map_only(spark, sf_dir):
    """Bloom decontamination is THE map-only scale path: the returned
    train-side frame must contain zero shuffle exchanges — only the
    1-row bitmap broadcast (a BroadcastNestedLoopJoin, free). The
    eval-side bitmap build runs as a separate bounded job before this
    plan exists. (No codegen assertion: exists/forall HOFs evaluate
    outside whole-stage codegen by design — still JVM-side, no Python.)"""
    from pyspark.sql import functions as F

    from smart_fraud_detection_data_pipeline_spark.operators.textdedup import (
        bloom_contamination_flags,
    )
    from smart_fraud_detection_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.where(F.col("doc_id") % 10 == 0)
    tr = docs.where(F.col("doc_id") % 10 != 0)
    df = bloom_contamination_flags(tr, ev)
    c = X.plan_counts(df)
    assert c["exchange"] == 0
    assert c["sort_merge_join"] == 0
    assert c["nested_loop_join"] == 1  # the 32 KB bitmap broadcast


def test_heavy_hitters_shuffle_is_candidate_bounded(spark, sf_dir):
    """The Misra-Gries vocabulary plan must never shuffle the full
    token stream by token: the only exchanges are the candidate
    distinct (<= slots x partitions rows), the 1-row total, and the
    recount groupBy AFTER the broadcast semi-join prunes the stream to
    candidate tokens. The semi-join itself must be broadcast (the
    candidate set is filter-sized) — a SortMergeJoin here would be the
    full-vocabulary shuffle this operator exists to avoid."""
    from smart_fraud_detection_data_pipeline_spark.operators.vocab import (
        heavy_hitter_tokens,
    )
    from smart_fraud_detection_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    df = heavy_hitter_tokens(docs)
    c = X.plan_counts(df)
    assert c["sort_merge_join"] == 0
    assert c["broadcast_hash_join"] == 1  # candidate semi-join
    assert c["nested_loop_join"] == 1  # 1-row total broadcast
    assert c["exchange"] <= 3
    assert "LeftSemi" in X.executed_plan(df)


def test_schema_evolution_scan_is_pure_scan(spark, sf_dir):
    """mergeSchema reconciliation happens at planning time (footer
    merge): the evolved-dataset read must stay a plain parquet scan —
    zero exchanges, no join, and the union schema (event_type included)
    visible in ReadSchema."""
    from smart_fraud_detection_data_pipeline_spark.queries import registry

    q = {s.name: s.spark_fn for s in registry()}["schema_evolution_scan"]
    df = q(spark, sf_dir)
    c = X.plan_counts(df)
    assert c["exchange"] == 0
    assert c["broadcast_hash_join"] + c["sort_merge_join"] + c["nested_loop_join"] == 0
    assert "event_type" in X.read_schema(df)


def test_repeated_passages_exchange_carries_hashes(spark, sf_dir):
    """The corpus-wide aggregation must key on the xxhash64 column, and
    passage strings may only appear in the candidate-bounded recovery
    join (a broadcast) — never a SortMergeJoin over the gram stream."""
    from smart_fraud_detection_data_pipeline_spark.operators.textdedup import (
        repeated_passages,
    )
    from smart_fraud_detection_data_pipeline_spark.sources.tables import load_table

    df = repeated_passages(load_table(spark, sf_dir, "documents"))
    c = X.plan_counts(df)
    assert c["sort_merge_join"] == 0
    assert c["broadcast_hash_join"] == 1  # stats broadcast back for text recovery
    plan = X.executed_plan(df)
    assert "xxhash64" in plan


def test_strip_boilerplate_plan_shape(spark, sf_dir):
    """Round 11: the cleaning twin of repeated_passages keeps its scale
    shape — the qualifying set broadcasts back onto the gram stream
    (bounded-candidate probe, no SortMergeJoin over grams), the
    corpus-wide exchange keys on xxhash64, and the doc-side rebuild
    join stays a single doc-keyed join, never a cartesian."""
    from smart_fraud_detection_data_pipeline_spark.operators.textdedup import (
        strip_boilerplate,
    )
    from smart_fraud_detection_data_pipeline_spark.sources.tables import load_table

    df = strip_boilerplate(load_table(spark, sf_dir, "documents"))
    c = X.plan_counts(df)
    assert c["nested_loop_join"] == 0
    assert c["broadcast_hash_join"] >= 1  # qualifying hashes broadcast
    assert "xxhash64" in X.executed_plan(df)


def test_cms_probe_broadcast_guard(spark, sf_dir):
    """Round 12 (VERDICT r11 #4): the CMS probe vocabulary broadcast is
    count-guarded. Below the cap the probe rides broadcast joins; above
    it (cap forced to 0) the hint is GONE from the analyzed plan —
    AQE may still broadcast adaptively once actual sizes are known,
    which is the safe outcome, so the assertion targets ResolvedHint,
    never the executed join (the repeated_passages r8 rule)."""
    from smart_fraud_detection_data_pipeline_spark.operators.vocab import (
        cms_token_estimates,
    )
    from smart_fraud_detection_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    hinted = cms_token_estimates(docs)
    assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()
    guarded = cms_token_estimates(docs, broadcast_limit=0)
    analyzed = guarded._jdf.queryExecution().analyzed().toString()
    # the sketch broadcast (bounded by depth x width) legitimately stays;
    # the guard must have stripped the PROBE-side hints: with the cap at
    # 0 the probe frame is hint-free, so strictly fewer hints than the
    # hinted plan
    assert analyzed.count("ResolvedHint") < (
        hinted._jdf.queryExecution().analyzed().toString().count("ResolvedHint")
    )
    # same output either way (guard changes strategy, not semantics)
    a = {r.token: (r.est_count, r.exact_count) for r in hinted.collect()}
    b = {r.token: (r.est_count, r.exact_count) for r in guarded.collect()}
    assert a == b


def test_bm25_topk_pruned_plan_shape(spark, sf_dir):
    """Round 12: the pruned tier's per-query side is broadcast-bounded —
    query terms, candidate triples, per-term bounds, and per-query
    stats all broadcast; the only nested-loop node is the benign 1-row
    corpus-stats attach; no cartesian over corpus x queries."""
    from pyspark.sql import functions as F

    from smart_fraud_detection_data_pipeline_spark.operators.similarity import (
        bm25_topk_pruned,
    )
    from smart_fraud_detection_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    q = docs.where(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_distinct(
            F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 5)
        ).alias("terms"),
    )
    df = bm25_topk_pruned(docs, q, k=10, m=24)
    c = X.plan_counts(df)
    assert c["nested_loop_join"] <= 1  # the 1-row stats cross only
    assert c["broadcast_hash_join"] >= 3  # qterms, triples, qstats/ubq
    # the r13 broadcast guards checkpoint qterms/triples, cutting the
    # final plan at those boundaries — the xxhash64 token projection
    # lives upstream of the cut, so pin it via the checkpointed scan
    # SCHEMA (VERDICT r13 #8): __tok must be a LONG attribute (the #nL
    # suffix). A revert to raw-string tokens would checkpoint a string
    # __tok (no L suffix) and fail here — the type, not the name, is
    # what only the hash projection can produce.
    import re

    plan = X.executed_plan(df)
    assert re.search(r"__tok#\d+L", plan), "checkpointed __tok is not a hashed long"
    assert "ExistingRDD" in plan
    # and the guard hints are present under the default cap
    assert "ResolvedHint" in df._jdf.queryExecution().analyzed().toString()


def test_bm25_topk_indexed_query_plan_shape(spark, sf_dir):
    """Round 13: the persisted-index query path never rescans the
    corpus — candidates come from the stored champion lists, the
    rescore joins stored postings restricted to the query vocabulary,
    and the per-query side broadcasts under the count guard. The only
    nested-loop nodes are the 1-row stats attaches (impact + ub);
    guard hints are present under the default cap and stripped at 0."""
    from pyspark.sql import functions as F

    from smart_fraud_detection_data_pipeline_spark.operators.similarity import (
        bm25_index_build,
        bm25_topk_indexed,
    )
    from smart_fraud_detection_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    q = docs.where(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_distinct(
            F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 5)
        ).alias("terms"),
    )
    idx = bm25_index_build(docs, m=24)
    df = bm25_topk_indexed(idx, q, k=10)
    c = X.plan_counts(df)
    assert c["nested_loop_join"] <= 2  # the two 1-row stats crosses
    assert c["broadcast_hash_join"] >= 3  # qtoks/qterms/triples/ubq...
    assert "ResolvedHint" in df._jdf.queryExecution().analyzed().toString()
    guarded = bm25_topk_indexed(idx, q, k=10, broadcast_limit=0)
    n_h = df._jdf.queryExecution().analyzed().toString().count("ResolvedHint")
    n_g = guarded._jdf.queryExecution().analyzed().toString().count(
        "ResolvedHint"
    )
    assert n_g < n_h
    assert sorted(map(tuple, guarded.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_merge_upsert_delete_single_join_plan(spark):
    """The tombstone verb must not change the merge plan class: ONE
    full-outer join, the delete as a post-join filter — no extra
    exchange, no second join, no cartesian."""
    from pyspark.sql import Row

    from smart_fraud_detection_data_pipeline_spark.operators.merge import merge_upsert

    target = spark.createDataFrame([Row(k=1, v=1.0)], "k int, v double")
    source = spark.createDataFrame(
        [Row(k=1, v=2.0, is_del=True)], "k int, v double, is_del boolean"
    )
    plain = merge_upsert(target, source.drop("is_del"), ["k"])
    tomb = merge_upsert(target, source, ["k"], delete_col="is_del")
    cp, ct = X.plan_counts(plain), X.plan_counts(tomb)
    joins = lambda c: (  # noqa: E731
        c["sort_merge_join"] + c["broadcast_hash_join"] + c["nested_loop_join"]
    )
    assert joins(ct) == joins(cp) == 1
    assert ct["exchange"] == cp["exchange"]


def test_minhash_index_compact_plan(spark):
    """Compaction must be two ANTI-joins keyed on the id with NO
    broadcast hint (AQE sizes the tombstone side at runtime — the
    broadcast-size-guard rule) and no join of any other class."""
    from pyspark.sql import Row

    from smart_fraud_detection_data_pipeline_spark.operators.textdedup import (
        minhash_index,
        minhash_index_compact,
    )

    base = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta gamma delta epsilon zeta")]
    )
    deletes = spark.createDataFrame([Row(doc_id=1)], "doc_id bigint")
    buckets, sets = minhash_index_compact(minhash_index(base), deletes)
    for leg in (buckets, sets):
        assert "ResolvedHint" not in leg._jdf.queryExecution().analyzed().toString()
        plan = X.executed_plan(leg)
        assert "LeftAnti" in plan


def test_fraud_ml_score_exact_side_is_score_bounded(spark, sf_dir):
    """The contract report's only global-order window must run over the
    per-SCORE aggregate (bounded by the 6-dp rounding grid), never the
    fact table. Since the r9 localCheckpoint conversion, that window
    executes inside the eager checkpoint job of the `per` frame — so
    the FINAL plan must contain NO Window at all (proving no
    fact-table sort survives to the consuming plan) and must read the
    bounded per-score columns back from the checkpoint scan; the
    window's input boundedness is pinned by checking the checkpointed
    schema is the per-score aggregate, not fact rows."""
    from smart_fraud_detection_data_pipeline_spark.queries import registry

    q = {s.name: s.spark_fn for s in registry()}["fraud_ml_score"]
    plan = X.executed_plan(q(spark, sf_dir))
    assert "Window" not in plan  # nothing global-sorts in the live plan
    # the checkpointed per-score frame feeds back in: its columns are
    # the score + cumulative counts, one row per distinct 6-dp score
    assert "ExistingRDD[ml_fraud_probability" in plan
    assert "__neg_below" in plan and "__cnt_below" in plan
    # and the fact-side aggregate (per year/month/day) is present
    assert "tx_year" in plan


def test_pq_family_plans_are_scan_join_topk(spark, sf_dir):
    """The round-9b quantized-search tier keeps the 100 TB shape: the
    corpus lineage is scan -> Arrow encode -> ONE broadcast-hash join
    on the probe/ADC frame -> the single top-k window exchange. No
    sort-merge join, no corpus repartition, exactly one hash exchange
    (the per-query window)."""
    from smart_fraud_detection_data_pipeline_spark.plans.explain import executed_plan

    c = X.plan_counts(Q["embed_ivfpq_ann"](spark, sf_dir))
    assert c["exchange"] == 1  # only the top-k window
    assert c["sort_merge_join"] == 0
    assert c["broadcast_hash_join"] == 1  # cell-id equi-join on the probe frame

    c = X.plan_counts(Q["embed_pq_ann"](spark, sf_dir))
    assert c["exchange"] == 1
    assert c["sort_merge_join"] == 0
    assert c["nested_loop_join"] == 1  # keyless broadcast of the tiny ADC frame

    # the rerank stage joins the shortlist back without a corpus sort:
    # broadcast joins only, two window exchanges total (shortlist + rerank)
    c = X.plan_counts(Q["embed_pq_rerank"](spark, sf_dir))
    assert c["sort_merge_join"] == 0
    assert c["exchange"] <= 2
    plan = executed_plan(Q["embed_ivfpq_ann"](spark, sf_dir))
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan  # the Arrow tier
