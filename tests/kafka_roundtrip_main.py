"""Broker-backed Kafka round-trip, run in its OWN JVM (the connector
jars must be on the classpath at session launch, which the shared test
session can't retrofit). Invoked by tests/test_kafka.py's integration
test when KAFKA_BOOTSTRAP is set; runnable by hand against any broker:

    KAFKA_BOOTSTRAP=localhost:9092 python tests/kafka_roundtrip_main.py /tmp/scratch

Wire path under test (the two calls no mock can reach —
sources/kafka.py:113,128): synthetic transactions staged to parquet →
file stream → ``kafka_transaction_sink`` (streaming keyed-JSON publish,
availableNow) → broker → ``kafka_transaction_source`` (subscribe +
decode) → parquet drain → md5 row-hash compared against the file-based
twin frame that never left the process. Prints ROUNDTRIP OK / MISMATCH;
exit 0 only on OK.

Connector resolution: env SPARK_KAFKA_PACKAGE overrides the default
``org.apache.spark:spark-sql-kafka-0-10_2.13:<pyspark version>``
(fetched via Ivy — needs a warm cache or network); or set
SPARK_KAFKA_JARS to a comma-separated list of local jars.
"""

from __future__ import annotations

import os
import sys
import uuid


def main(scratch: str) -> int:
    bootstrap = os.environ["KAFKA_BOOTSTRAP"]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import pyspark
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    builder = (
        SparkSession.builder.appName("kafka-roundtrip")
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    jars = os.environ.get("SPARK_KAFKA_JARS")
    if jars:
        builder = builder.config("spark.jars", jars)
    else:
        pkg = os.environ.get(
            "SPARK_KAFKA_PACKAGE",
            f"org.apache.spark:spark-sql-kafka-0-10_2.13:{pyspark.__version__}",
        )
        builder = builder.config("spark.jars.packages", pkg)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from smart_fraud_detection_data_pipeline_spark.sources.generator import (
        synthetic_transactions,
    )
    from smart_fraud_detection_data_pipeline_spark.sources.kafka import (
        kafka_transaction_sink,
        kafka_transaction_source,
    )

    topic = f"sfdp_roundtrip_{uuid.uuid4().hex[:8]}"  # fresh, collision-free
    staged = os.path.join(scratch, "staged")
    out = os.path.join(scratch, "out")

    # Deterministic fixture (the streaming generator's rand() is not
    # replay-deterministic by design — generator.py) staged to parquet so
    # the PUBLISH side still exercises the streaming sink.
    tx = synthetic_transactions(spark, 500)
    tx.write.mode("overwrite").parquet(staged)

    stream = spark.readStream.schema(tx.schema).parquet(staged)
    pub = kafka_transaction_sink(
        stream,
        bootstrap,
        os.path.join(scratch, "ckpt_pub"),
        topic,
        available_now=True,
    )
    pub.awaitTermination(120)

    sub = kafka_transaction_source(spark, bootstrap, topic)
    q = (
        sub.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(scratch, "ckpt_sub"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def row_hash(df):
        cols = sorted(df.columns)
        one = df.select(
            F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]))
            .alias("h")
        )
        return one.agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long"))).first()[0], df.count()

    want = spark.read.parquet(staged)
    got = spark.read.parquet(out)
    h_want, n_want = row_hash(want)
    h_got, n_got = row_hash(got)
    ok = (h_want, n_want) == (h_got, n_got)
    print(f"rows want={n_want} got={n_got} hash want={h_want} got={h_got}")
    print("ROUNDTRIP OK" if ok else "ROUNDTRIP MISMATCH")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfdp_kafka_roundtrip"))
