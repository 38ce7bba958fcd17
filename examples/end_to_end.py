"""End-to-end example: composing the public package API outside the registry.

Runs the reference pipeline's full batch path (enrich -> trends -> dedup ->
warehouse upsert), a training-data pass over ``documents``/``embeddings``
(near-dup candidates + exact ANN baseline), and the streaming variant of
the fraud pipeline (availableNow micro-batches into parquet sinks) — all
with the same operators the 161-query registry verifies against DuckDB.

Usage:
    python examples/end_to_end.py [sf_dir]        # default /root/testdata/sf0.001

Everything here is the public API: ``get_spark``, ``sources.tables``,
``operators.*``, ``streaming.pipeline``. No registry internals.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smart_fraud_detection_data_pipeline_spark import get_spark
from smart_fraud_detection_data_pipeline_spark.operators.dedup import dedup_keep_last
from smart_fraud_detection_data_pipeline_spark.operators.enrich import enrich_transactions
from smart_fraud_detection_data_pipeline_spark.operators.merge import merge_upsert
from smart_fraud_detection_data_pipeline_spark.operators.similarity import cosine_topk
from smart_fraud_detection_data_pipeline_spark.operators.textdedup import minhash_lsh_pairs
from smart_fraud_detection_data_pipeline_spark.operators.trends import user_spend_trends
from smart_fraud_detection_data_pipeline_spark.sources.tables import load_table, stream_table
from smart_fraud_detection_data_pipeline_spark.streaming.pipeline import (
    read_trends_deduped,
    run_pipeline,
)


# --------------------------------------------------------------------------
# Adapting the TPC-H-ish testdata to the reference's transaction shape.
# A real deployment reads these shapes directly from Kafka / object
# storage; here `events` plays the transaction stream and
# `customer` / `part x supplier` play the two dimensions.
# --------------------------------------------------------------------------

def transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_part = load_table(spark, sf_dir, "part").count()
    return load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("transaction_id"),
        "user_id",
        F.pmod("event_id", F.lit(n_part)).alias("product_id"),
        F.col("value").alias("amount"),
        F.col("event_type").alias("payment_method"),
        F.col("ts").alias("timestamp"),
    )


def users_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("country"),
    )


def products_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    n_supp = supp.count()
    return part.join(
        F.broadcast(supp),
        F.pmod("p_partkey", F.lit(n_supp)) == F.col("s_suppkey"),
        "left_outer",
    ).select(
        F.col("p_partkey").alias("product_id"),
        F.col("p_name").alias("name"),
        F.col("p_type").alias("category"),
        F.col("p_retailprice").alias("base_price"),
        F.col("s_nationkey").alias("country"),
        F.col("p_size").cast("double").alias("discount"),
    )


def batch_demo(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    tx, users, products = (
        transactions(spark, sf_dir),
        users_dim(spark, sf_dir),
        products_dim(spark, sf_dir),
    )

    # 1. Fraud enrichment: two broadcast left joins + rule columns, zero
    #    shuffles (the dimensions broadcast; the fact table never moves).
    enriched = enrich_transactions(tx, users, products)
    print(f"enriched: {enriched.count()} rows, "
          f"{enriched.where('fraud_score >= 0.5').count()} flagged")

    # 2. Windowed spend trends (1-minute tumbling windows, exact distincts).
    trends = user_spend_trends(tx, exact=True)
    print(f"user_spend_trends: {trends.count()} window rows")

    # 3. Keyed keep-last dedup, then upsert into a warehouse table.
    latest = dedup_keep_last(
        enriched.select("transaction_id", "user_id", "amount", "timestamp"),
        keys=["transaction_id"],
        order_by=["timestamp"],
    )
    target_path = os.path.join(out_dir, "warehouse", "fraud_records")
    latest.limit(0).write.mode("overwrite").parquet(target_path)  # empty target
    merged = merge_upsert(
        spark.read.parquet(target_path), latest, keys=["transaction_id"]
    )
    merged.write.mode("overwrite").parquet(target_path + "_v2")
    print(f"merge_upsert: {spark.read.parquet(target_path + '_v2').count()} rows")

    # 4. Training-data pass: MinHash-LSH near-dup candidates over documents
    #    (banded buckets, never all-pairs) + exact cosine top-k baseline
    #    over embeddings (broadcast queries, corpus never shuffles).
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, text_col="text", id_col="doc_id", threshold=0.4)
    print(f"minhash_lsh_pairs: {pairs.count()} near-dup candidate pairs")

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    topk = cosine_topk(emb, queries, k=3)
    print("cosine_topk sample:")
    topk.show(6, truncate=False)


def streaming_demo(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    # The same pipeline, streaming: events arrive as a file stream
    # (stand-in for the Kafka consumer), availableNow drains them in
    # micro-batches through watermark + windowed state into parquet.
    n_part = load_table(spark, sf_dir, "part").count()
    stream_tx = stream_table(spark, sf_dir, "events", max_files_per_trigger=1).select(
        F.col("event_id").alias("transaction_id"),
        "user_id",
        F.pmod("event_id", F.lit(n_part)).alias("product_id"),
        F.col("value").alias("amount"),
        F.col("event_type").alias("payment_method"),
        F.col("ts").alias("timestamp"),
    )
    qs = run_pipeline(
        spark,
        stream_tx,
        users_dim(spark, sf_dir),
        products_dim(spark, sf_dir),
        out_dir=os.path.join(out_dir, "stream"),
        mode="faithful",  # complete-mode re-emission + keep-last contract
        available_now=True,
    )
    qs.await_all(timeout_sec=300)

    fraud = spark.read.parquet(os.path.join(out_dir, "stream", "fraud_records"))
    trends = read_trends_deduped(
        spark,
        os.path.join(out_dir, "stream", "user_spend_trends"),
        key_cols=["user_id", "window_start"],
    )
    print(f"streaming fraud_records: {fraud.count()} rows; "
          f"deduped trends: {trends.count()} rows")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("end-to-end-example")
    with tempfile.TemporaryDirectory(prefix="sfdp_example_") as out_dir:
        batch_demo(spark, sf_dir, out_dir)
        streaming_demo(spark, sf_dir, out_dir)
    print("example finished OK")


if __name__ == "__main__":
    main()
