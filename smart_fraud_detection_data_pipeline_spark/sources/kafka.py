"""S2/S3: Kafka source/sink — connector-gated (no broker in the test env).

Reference parity: the producer publishes keyed JSON to topic
`transactions` (transaction_producer.py:35-41) and the consumer
subscribes with earliest offsets, manual commit (consumer.py:51-59). In
this engine both directions are one-liners on Structured Streaming's
Kafka connector; exactly-once lands free with checkpoints (the
reference's manual-commit consumer is at-most-once — it commits BEFORE
flushing, consumer.py:92 vs :111).

The serde and option-building layers are pure and fully unit-tested
(tests/test_kafka.py): `encode_transactions`/`decode_transactions` are
plain DataFrame transforms (work on batch or streaming frames alike),
and `kafka_source_options`/`kafka_sink_options` pin the exact connector
configuration. Only the final `.readStream.format("kafka")` /
`.writeStream.format("kafka")` wiring needs the spark-sql-kafka package
plus a broker, which the test env lacks — those two calls are the whole
untestable surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smart_fraud_detection_data_pipeline_spark.schemas import TRANSACTION_SCHEMA

DEFAULT_TOPIC = "transactions"

#: JSON timestamp formats. The reference producer emits
#: `datetime.utcnow().isoformat()` (microseconds, no zone —
#: transaction_producer.py:21) — but isoformat() OMITS the fraction
#: when micros are exactly 0, so the decode side makes it optional.
#: Spark's default to_json format drops sub-seconds, so the encode side
#: pins the 6-digit form to keep the round-trip lossless at
#: microsecond precision.
JSON_TS_WRITE_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
JSON_TS_READ_FORMAT = "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]"


def encode_transactions(df: DataFrame) -> DataFrame:
    """S2 serde half: rows → (key, value) keyed-JSON pairs.

    key = transaction_id (the producer's partitioning key,
    transaction_producer.py:37), value = the full row as JSON. Pure
    transform: applies to a batch frame for testing or a streaming
    frame for the real sink.
    """
    return df.select(
        F.col("transaction_id").alias("key"),
        F.to_json(
            F.struct(*df.columns), {"timestampFormat": JSON_TS_WRITE_FORMAT}
        ).alias("value"),
    )


def decode_transactions(raw: DataFrame) -> DataFrame:
    """S3 serde half: Kafka records → typed transaction rows.

    Expects the connector's wire schema (binary `value`); casts to
    string and JSON-decodes into TRANSACTION_SCHEMA (the consumer's
    json.loads, consumer.py:84). Malformed payloads yield a row of
    nulls (PERMISSIVE), matching the reference's log-and-continue.
    """
    return raw.select(
        F.from_json(
            F.col("value").cast("string"),
            TRANSACTION_SCHEMA,
            {"timestampFormat": JSON_TS_READ_FORMAT},
        ).alias("t")
    ).select("t.*")


def kafka_source_options(
    bootstrap_servers: str,
    topic: str = DEFAULT_TOPIC,
    starting_offsets: str = "earliest",
) -> dict[str, str]:
    """Connector options for the consumer side (consumer.py:51-57:
    bootstrap.servers + subscribe + auto.offset.reset=earliest)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def kafka_sink_options(
    bootstrap_servers: str,
    checkpoint: str,
    topic: str = DEFAULT_TOPIC,
) -> dict[str, str]:
    """Connector options for the producer side; the checkpoint gives
    exactly-once where the reference's manual commit is at-most-once."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "checkpointLocation": checkpoint,
    }


def kafka_transaction_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = DEFAULT_TOPIC,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S3: subscribe + JSON-decode into the transaction schema.

    Requires the spark-sql-kafka connector on the classpath; raises
    Spark's data-source-not-found error otherwise (pinned in tests).
    """
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(
        bootstrap_servers, topic, starting_offsets
    ).items():
        reader = reader.option(k, v)
    return decode_transactions(reader.load())


def kafka_transaction_sink(
    df: DataFrame,
    bootstrap_servers: str,
    checkpoint: str,
    topic: str = DEFAULT_TOPIC,
    *,
    available_now: bool = False,
):
    """S2: keyed JSON publish (key = transaction_id, value = row JSON).

    ``available_now=True`` drains the current source backlog and stops —
    the bounded form the broker integration test uses; the default is
    the reference's continuous publish."""
    writer = encode_transactions(df).writeStream.format("kafka")
    for k, v in kafka_sink_options(bootstrap_servers, checkpoint, topic).items():
        writer = writer.option(k, v)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
