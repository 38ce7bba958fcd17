"""S6/S5 CSV source parity (VERDICT r1 next-#3).

The reference ingests CSV: the Kafka consumer lands header CSVs under
raw/<topic>/year=/month=/day= (consumer.py:111-129) and the Spark job
reads them with hand-written StructTypes applied BY POSITION — its
producer emits `transaction_time` but the schema names the field
`timestamp` (transaction_producer.py:21 vs spark.py:74, :102-120).
These tests close the S4 → S5/S6 loop in that exact format: micro-batch
CSV sink → batch scan, → streaming scan, and a CSV-backed fraud
enrichment that must equal the parquet-backed flagship row-for-row.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from smart_fraud_detection_data_pipeline_spark.queries import (
    _REGISTRY,
    _products_dim,
    _transactions,
    _users_dim,
)
from smart_fraud_detection_data_pipeline_spark.operators.enrich import enrich_transactions
from smart_fraud_detection_data_pipeline_spark.sources.tables import (
    load_csv_table,
    stream_csv_table,
)
from smart_fraud_detection_data_pipeline_spark.streaming.sinks import csv_ingest_sink

#: Hand-written by-name StructType, reference style (spark.py:66-75).
#: The CSV header for the event-time column says `transaction_time`;
#: this schema deliberately calls it `timestamp` — by-position mapping.
TX_CSV_SCHEMA = StructType(
    [
        StructField("transaction_id", LongType()),
        StructField("user_id", LongType()),
        StructField("product_id", LongType()),
        StructField("amount", DoubleType()),
        StructField("payment_method", StringType()),
        StructField("timestamp", TimestampNTZType()),
    ]
)

_PARTS = [
    StructField("year", IntegerType()),
    StructField("month", IntegerType()),
    StructField("day", IntegerType()),
]


def _stage_csv(spark, sf_dir, tmp_path) -> tuple[str, list]:
    """Run the S4 sink once: transactions → year=/month=/day= CSVs.

    Emits the reference producer's header (`transaction_time`) so the
    read side must rely on positional schema application.
    """
    tx = _transactions(spark, sf_dir).withColumnRenamed(
        "timestamp", "transaction_time"
    )
    src = str(tmp_path / "parquet_src")
    tx.coalesce(2).write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = csv_ingest_sink(
        stream, str(tmp_path / "raw"), str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)
    expected = sorted(
        _transactions(spark, sf_dir).collect(), key=lambda r: r.transaction_id
    )
    return str(tmp_path / "raw"), expected


def test_csv_batch_roundtrip_by_position(spark, sf_dir, tmp_path):
    """S4 sink → S6 batch scan: schema by position (header name differs),
    microsecond timestamps and doubles survive the text hop."""
    raw, expected = _stage_csv(spark, sf_dir, tmp_path)
    back = load_csv_table(spark, raw, TX_CSV_SCHEMA)
    # processing-date partition columns are discovered and appended
    assert {"year", "month", "day"} <= set(back.columns)
    got = sorted(
        back.select(*TX_CSV_SCHEMA.fieldNames()).collect(),
        key=lambda r: r.transaction_id,
    )
    assert got == expected


def test_csv_streaming_scan_roundtrip(spark, sf_dir, tmp_path):
    """S4 sink → S5 streaming scan (spark.py:102-106): the streaming CSV
    source over the partitioned layout yields the same rows."""
    raw, expected = _stage_csv(spark, sf_dir, tmp_path)
    schema = StructType(list(TX_CSV_SCHEMA.fields) + _PARTS)
    stream = stream_csv_table(spark, raw, schema)
    assert stream.isStreaming
    out = str(tmp_path / "echo")
    q = (
        stream.select(*TX_CSV_SCHEMA.fieldNames())
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "echo_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        spark.read.parquet(out).collect(), key=lambda r: r.transaction_id
    )
    assert got == expected


def test_csv_backed_fraud_enrich_matches_parquet(spark, sf_dir, tmp_path):
    """The flagship enrichment fed from the CSV round-trip must equal the
    parquet-backed catalog query row-for-row (VERDICT done-criterion)."""
    raw, _ = _stage_csv(spark, sf_dir, tmp_path)
    tx_csv = load_csv_table(spark, raw, TX_CSV_SCHEMA).select(
        *TX_CSV_SCHEMA.fieldNames()
    )
    cols = [
        "transaction_id", "user_id", "product_id", "amount", "payment_method",
        "timestamp", "user_name", "user_country", "product_name", "category",
        "base_price", "discount", "product_country", "country_mismatch",
        "high_value_flag", "fraud_score", "discounted_price",
        "tx_year", "tx_month", "tx_day",
    ]
    got = (
        enrich_transactions(
            tx_csv, _users_dim(spark, sf_dir), _products_dim(spark, sf_dir)
        )
        .select(*cols)
        .collect()
    )
    flagship = next(s for s in _REGISTRY if s.name == "fraud_enrich")
    want = flagship.spark_fn(spark, sf_dir).collect()
    key = lambda r: r.transaction_id  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)
