"""S2/S3: Kafka source/sink — flag-gated (no broker in the test env).

Reference parity: the producer publishes keyed JSON to topic
`transactions` (transaction_producer.py:35-41) and the consumer
subscribes with earliest offsets (consumer.py:51-59). In this engine
both directions are one-liners on Structured Streaming's Kafka
connector; exactly-once lands free with checkpoints (the reference's
manual-commit consumer is at-most-once — it commits BEFORE flushing,
consumer.py:92 vs :111).

These helpers build plans only; they fail at `start()` if no broker or
kafka package is reachable, which is why they stay out of the query
catalog and tests (SURVEY §7 risk register).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smart_fraud_detection_data_pipeline_spark.schemas import TRANSACTION_SCHEMA

DEFAULT_TOPIC = "transactions"


def kafka_transaction_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = DEFAULT_TOPIC,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S3: subscribe + JSON-decode into the transaction schema."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), TRANSACTION_SCHEMA).alias("t")
    ).select("t.*")


def kafka_transaction_sink(
    df: DataFrame,
    bootstrap_servers: str,
    checkpoint: str,
    topic: str = DEFAULT_TOPIC,
):
    """S2: keyed JSON publish (key = transaction_id, value = row JSON)."""
    return (
        df.select(
            F.col("transaction_id").alias("key"),
            F.to_json(F.struct(*df.columns)).alias("value"),
        )
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
