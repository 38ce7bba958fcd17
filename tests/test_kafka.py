"""S2/S3 Kafka serde + plan-construction coverage (VERDICT r1 next-#1).

No broker or spark-sql-kafka package exists in this env, so the tests
pin everything short of the socket: the keyed-JSON encode
(transaction_producer.py:35-41 semantics), the JSON decode
(consumer.py:84), losslessness of the round-trip on TRANSACTION_SCHEMA
(including NULLs, unicode, and microsecond timestamps), malformed-row
behavior, and the exact connector options the streaming wiring passes.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from smart_fraud_detection_data_pipeline_spark.schemas import TRANSACTION_SCHEMA
from smart_fraud_detection_data_pipeline_spark.sources.kafka import (
    DEFAULT_TOPIC,
    decode_transactions,
    encode_transactions,
    kafka_sink_options,
    kafka_source_options,
    kafka_transaction_source,
)

HERE = os.path.dirname(os.path.abspath(__file__))


def _sample_rows():
    return [
        Row(
            transaction_id="T1000001",
            user_id=42,
            product_id=7,
            store_id="S3",
            amount=1234.56,
            payment_method="credit_card",
            country="Germany",
            timestamp=dt.datetime(2024, 5, 17, 12, 34, 56, 789123),
        ),
        # unicode + boundary numerics
        Row(
            transaction_id="T9999999",
            user_id=2000,
            product_id=500,
            store_id="S5",
            amount=0.01,
            payment_method="paypal",
            country="Þórshöfn",
            timestamp=dt.datetime(1999, 12, 31, 23, 59, 59, 1),
        ),
        # every nullable field null except the key
        Row(
            transaction_id="T0000000",
            user_id=None,
            product_id=None,
            store_id=None,
            amount=None,
            payment_method=None,
            country=None,
            timestamp=None,
        ),
    ]


def _tx_df(spark):
    return spark.createDataFrame(_sample_rows(), TRANSACTION_SCHEMA)


def test_encode_shape_and_key(spark):
    """Producer contract: key = transaction_id, value = full-row JSON."""
    out = encode_transactions(_tx_df(spark)).collect()
    assert [r.key for r in out] == ["T1000001", "T9999999", "T0000000"]
    payload = json.loads(out[0].value)
    assert payload["transaction_id"] == "T1000001"
    assert payload["user_id"] == 42
    assert payload["amount"] == 1234.56
    assert payload["country"] == "Germany"
    # microseconds survive serialization (reference emits isoformat())
    assert payload["timestamp"].endswith(".789123")


def test_roundtrip_lossless_on_transaction_schema(spark):
    """encode → wire (binary value, as Kafka delivers) → decode == input."""
    df = _tx_df(spark)
    wire = encode_transactions(df).select(
        F.col("key"), F.col("value").cast("binary").alias("value")
    )
    back = decode_transactions(wire)
    assert back.schema == TRANSACTION_SCHEMA
    assert back.collect() == df.collect()


def test_decode_reference_isoformat_without_micros(spark):
    """datetime.isoformat() omits the fraction when micros == 0; the
    decoder must parse both forms (optional-fraction read format)."""
    payloads = [
        ("T1", "2024-05-17T12:34:56"),
        ("T2", "2024-05-17T12:34:56.123456"),
    ]
    wire = spark.createDataFrame(
        [
            (
                tid,
                json.dumps(
                    {
                        "transaction_id": tid,
                        "user_id": 1,
                        "product_id": 2,
                        "store_id": "S1",
                        "amount": 10.0,
                        "payment_method": "cash",
                        "country": "UK",
                        "timestamp": ts,
                    }
                ).encode(),
            )
            for tid, ts in payloads
        ],
        "key string, value binary",
    )
    got = {r.transaction_id: r.timestamp for r in decode_transactions(wire).collect()}
    assert got == {
        "T1": dt.datetime(2024, 5, 17, 12, 34, 56),
        "T2": dt.datetime(2024, 5, 17, 12, 34, 56, 123456),
    }


def test_decode_malformed_yields_null_row(spark):
    """PERMISSIVE decode: a broken payload becomes an all-null row, the
    stream keeps going (the reference logs and continues)."""
    wire = spark.createDataFrame(
        [("k1", bytearray(b"{not json")), ("k2", None)],
        "key string, value binary",
    )
    rows = decode_transactions(wire).collect()
    assert len(rows) == 2
    assert all(v is None for row in rows for v in row)


def test_connector_options_pinned():
    """The wiring must pass exactly the reference's consumer/producer
    config (consumer.py:51-57, transaction_producer.py:10)."""
    assert kafka_source_options("broker:29092") == {
        "kafka.bootstrap.servers": "broker:29092",
        "subscribe": "transactions",
        "startingOffsets": "earliest",
    }
    assert kafka_source_options("b:1", topic="other", starting_offsets="latest") == {
        "kafka.bootstrap.servers": "b:1",
        "subscribe": "other",
        "startingOffsets": "latest",
    }
    assert kafka_sink_options("broker:29092", "/ckpt") == {
        "kafka.bootstrap.servers": "broker:29092",
        "topic": "transactions",
        "checkpointLocation": "/ckpt",
    }
    assert DEFAULT_TOPIC == "transactions"


def test_source_resolves_kafka_format(spark):
    """Plan pin: the source asks Spark for the `kafka` data source. With
    the connector absent (this env) that must fail with the
    kafka-specific missing-source error — proving the format string and
    option plumbing reach the resolver; with the connector present the
    plan must build."""
    try:
        df = kafka_transaction_source(spark, "localhost:29092")
    except Exception as exc:  # noqa: BLE001 - asserting on the message
        msg = str(exc).upper()
        assert "KAFKA" in msg
    else:
        assert df.isStreaming
        assert df.schema == TRANSACTION_SCHEMA


# ---------------------------------------------------------------------------
# Broker-backed integration (VERDICT r4 task 7): runs only when the
# operator points KAFKA_BOOTSTRAP at a live broker. The round-trip runs
# in its own JVM (tests/kafka_roundtrip_main.py) because the connector
# jars must be on the classpath at session LAUNCH — the shared fixture
# session can't add them retroactively.
# ---------------------------------------------------------------------------

@pytest.mark.skipif(
    not os.environ.get("KAFKA_BOOTSTRAP"),
    reason="set KAFKA_BOOTSTRAP=host:port (and have the spark-sql-kafka "
    "package resolvable) to run the live-broker round-trip",
)
def test_broker_roundtrip_matches_file_twin(tmp_path):
    """synthetic transactions → kafka_transaction_sink (streaming
    publish, availableNow) → broker → kafka_transaction_source →
    parquet, hash-compared against the frame that never left the
    process. Catches the option/auth mistakes (startingOffsets, serde
    drift, offset semantics) no connector-less test can."""
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "kafka_roundtrip_main.py"), str(tmp_path)],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, f"\n--- stdout ---\n{proc.stdout}\n--- stderr ---\n{proc.stderr}"
    assert "ROUNDTRIP OK" in proc.stdout
