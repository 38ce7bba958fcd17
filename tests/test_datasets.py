"""Training-dataset assembly: deterministic splits + sequence packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from smart_fraud_detection_data_pipeline_spark.operators import datasets as DS
from smart_fraud_detection_data_pipeline_spark.plans import explain as X
from smart_fraud_detection_data_pipeline_spark.sources.tables import load_table


def test_split_assign_stable_under_corpus_growth(spark):
    """The whole point of hash splits: growing the corpus must never
    move an existing document between splits."""
    small = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    s_small = {r.doc_id: r.split for r in DS.split_assign(small).collect()}
    s_big = {r.doc_id: r.split for r in DS.split_assign(big).collect()}
    assert all(s_big[d] == s for d, s in s_small.items())


def test_split_assign_proportions_and_salt(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    counts = {
        r.split: r["count"]
        for r in DS.split_assign(df).groupBy("split").count().collect()
    }
    n = sum(counts.values())
    assert n == 2000
    assert abs(counts["train"] / n - 0.8) < 0.05
    assert abs(counts["val"] / n - 0.1) < 0.03
    assert abs(counts["test"] / n - 0.1) < 0.03
    # a different salt reshuffles assignments
    resalted = {r.doc_id: r.split for r in DS.split_assign(df, salt="v2").collect()}
    base = {r.doc_id: r.split for r in DS.split_assign(df).collect()}
    assert any(resalted[d] != base[d] for d in base)


def test_pack_sequences_invariants(spark, sf_dir):
    budget = 512
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("n_tokens")
    )
    packed = DS.pack_sequences(docs, budget=budget, n_shards=4).collect()

    bins: dict[tuple, list] = {}
    for r in packed:
        bins.setdefault((r.shard, r.bin_id), []).append(r)
    for (shard, bin_id), rows in bins.items():
        rows.sort(key=lambda r: r.seq_pos)
        # seq_pos contiguous from 1
        assert [r.seq_pos for r in rows] == list(range(1, len(rows) + 1))
        # streaming fill: bin k closes exactly when the shard's running
        # total crosses budget*(k+1), so cumulatively bins 0..k hold at
        # least that many tokens (a straddler's overflow eats into the
        # NEXT bin's budget, never creates a gap) — and dropping bin k's
        # last document dips back under the boundary (nothing skipped).
        cum_through = sum(
            r.n_tokens
            for (s, b), rs in bins.items()
            if s == shard and b <= bin_id
            for r in rs
        )
        last_bin = max(b for s, b in bins if s == shard)
        if bin_id != last_bin:
            assert cum_through >= budget * (bin_id + 1)
        assert cum_through - rows[-1].n_tokens < budget * (bin_id + 1)


def test_pack_sequences_oversized_doc_gets_own_bin(spark):
    rows = [(0, 10), (1, 5000), (2, 10), (3, 20)]  # doc 1 >> budget
    df = spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")
    packed = {
        r.doc_id: (r.bin_id, r.seq_pos)
        for r in DS.pack_sequences(df, budget=100, n_shards=1).collect()
    }
    assert packed[0] == (0, 1)
    assert packed[1] == (0, 2)  # joins the bin it straddles...
    assert packed[2][0] == 50  # ...and everything after starts far beyond
    assert packed[3][0] == 50


def test_split_is_map_only_and_packing_single_shuffle(spark, sf_dir):
    from smart_fraud_detection_data_pipeline_spark.queries import registry

    Q = {s.name: s.spark_fn for s in registry()}
    split = X.plan_counts(Q["doc_split_assign"](spark, sf_dir))
    assert split["exchange"] == 0  # pure projection at any scale

    pack = X.plan_counts(Q["doc_pack_sequences"](spark, sf_dir))
    # one hash partition on shard; the (shard, bin_id) window reuses it
    assert pack["exchange"] == 1
    assert pack["sort_merge_join"] == 0


def test_temperature_mix_upsamples_small_sources(spark):
    """alpha=0.5 on a skewed corpus: the big source subsamples while the
    small source saturates at keep-everything (rate>1 → thr 10^6). The
    big source counts 17 rows (16 + a NULL-id row — strata count ALL
    their rows): w=(√17,1,1)→tw≈6.123106, tn=19, rate_big =
    9.5·(4.123106/6.123106)/17 = 0.3762935… → thr 376294. NULL id is
    never kept (no deterministic bucket); NULL source is its own
    stratum; every kept decision equals the bucket rule exactly."""
    rows = [(i, "big") for i in range(1, 17)] + [(100, "small"), (None, "big"), (200, None)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = DS.temperature_mix(df, alpha=0.5, frac=0.5)
    got = {(r.doc_id, r.source): (r.mix_thr, r.kept) for r in out.collect()}
    assert len(got) == len(rows)
    assert got[(100, "small")] == (1000000, True)   # saturated: always kept
    assert got[(None, "big")][1] is False           # NULL id -> never kept
    assert got[(200, None)][0] is not None          # NULL source has a rate
    big_thr = got[(1, "big")][0]
    assert big_thr == 376294
    # the keep decision is exactly the integer bucket rule
    kept_rule = {
        r.doc_id: r.bucket < big_thr
        for r in df.where("source = 'big' AND doc_id IS NOT NULL")
        .select("doc_id", DS.mix_bucket(F.col("doc_id")).alias("bucket"))
        .collect()
    }
    for (did, src), (_, kept) in got.items():
        if src == "big" and did is not None:
            assert kept == kept_rule[did]


def test_temperature_mix_is_broadcast_only(spark, sf_dir):
    """The corpus never shuffles: rates are a broadcast dim, the
    decision a map-only projection — only the tiny count/total
    aggregations exchange."""
    from smart_fraud_detection_data_pipeline_spark.queries import registry

    Q = {s.name: s.spark_fn for s in registry()}
    c = X.plan_counts(Q["doc_mix_temperature"](spark, sf_dir))
    assert c["broadcast_hash_join"] >= 1
    # the one nested loop is the 1-row totals crossJoin — scalar and free
    assert c["nested_loop_join"] <= 1
    assert c["sort_merge_join"] == 0


def test_budget_mix_fill_order_and_overrides(spark):
    """Token-budget mixing: per-source fill in doc_id order, the
    straddling doc is kept (budgets are floors), per-source overrides
    apply, a NULL source is its own stratum, and the audit columns
    reconstruct the decision exactly."""
    rows = [
        # source a: 40+40+40 tokens, budget 100 -> docs 1,2,3 kept
        # (doc 3 straddles: cum_before 80 < 100), doc 4 dropped
        (1, "a", 40), (2, "a", 40), (3, "a", 40), (4, "a", 40),
        # source b: override budget 10 -> only doc 5 (straddler) kept
        (5, "b", 50), (6, "b", 5),
        # NULL source: default budget, both kept
        (7, None, 30), (8, None, 60),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_tokens bigint")
    out = {r.doc_id: (r.cum_before, r.kept) for r in
           DS.budget_mix(df, budget=100, budgets={"b": 10}).collect()}
    assert out == {
        1: (0, True), 2: (40, True), 3: (80, True), 4: (120, False),
        5: (0, True), 6: (50, False),
        7: (0, True), 8: (30, True),
    }


def test_budget_mix_single_shuffle(spark, sf_dir):
    """One hash exchange on the source key, no joins — the quota is a
    window decision, not a join decision."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    counted = docs.select(
        "doc_id", "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias("n_tokens"),
    )
    c = X.plan_counts(DS.budget_mix(counted, budget=800))
    assert c["exchange"] == 1
    assert c["broadcast_hash_join"] + c["sort_merge_join"] + c["nested_loop_join"] == 0
