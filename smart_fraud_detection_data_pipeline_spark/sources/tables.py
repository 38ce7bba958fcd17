"""Batch + streaming table sources over the testdata star schema.

Reference parity: S5 (streaming CSV scan, spark.py:102-106), S6 (batch
CSV dimension scans, spark.py:109-120), S11-S13 (the pandas/boto3
object-listing + partition-recovery path of the loaders,
load_fraud_records...py:107-141 — all of which is built into Spark's
file index / partition discovery).

Scale notes: parquet scans get predicate pushdown + column pruning from
Catalyst for free as long as callers express filters/selects on the
DataFrame (never collect-then-filter). At 100 TB the reading knobs that
matter are ``spark.sql.files.maxPartitionBytes`` (set in session.py) and
partition-pruning via Hive-style directory layout, which
``sinks.write_partitioned_parquet`` produces.
"""

from __future__ import annotations

import os

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smart_fraud_detection_data_pipeline_spark import TABLES

#: CSV timestamp formats (shared with streaming.sinks.csv_ingest_sink).
#: Write pins 6-digit fractions so microseconds survive the text hop
#: (Spark's default CSV format truncates to millis); read makes the
#: fraction optional so hand-written or reference-produced CSVs without
#: sub-seconds still parse.
CSV_TS_WRITE_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
CSV_TS_READ_FORMAT = "yyyy-MM-dd HH:mm:ss[.SSSSSS]"


def _csv_options(header: bool) -> dict[str, str]:
    return {
        "header": "true" if header else "false",
        # By-POSITION schema application, ignoring header names — the
        # reference semantic: its producer emits `transaction_time` but
        # the hand-written StructType names the field `timestamp`
        # (transaction_producer.py:21 vs spark.py:74) and Spark maps by
        # position when an explicit schema is given.
        "enforceSchema": "true",
        "timestampFormat": CSV_TS_READ_FORMAT,
        "timestampNTZFormat": CSV_TS_READ_FORMAT,
    }


def _ensure_ts_confs(spark: SparkSession) -> None:
    """Runtime confs every source path needs, set in ONE place.

    The caller may hand us a vanilla session (the verify driver does).
    Both are runtime-settable SQL confs. UTC matters because
    date_format/year/month render timestamps in the session timezone and
    the oracle renders them naively; nanosAsLong makes TIMESTAMP(NANOS)
    parquet columns readable (Spark has no nanosecond type).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


@lru_cache(maxsize=None)
def _nano_ts_columns(path: str) -> tuple[str, ...]:
    """Columns stored as TIMESTAMP(NANOS) in the parquet footer.

    Spark has no nanosecond timestamp type; with
    ``spark.sql.legacy.parquet.nanosAsLong`` those columns surface as
    long nanos and we convert to micros (lossless here — the testdata
    carries micro precision). Footer-only read, cached per path.
    Directories (multi-file tables, the streaming-fixture layout) are
    probed via their first member parquet file — members share a schema.
    """
    import glob

    import pyarrow.parquet as pq
    import pyarrow.types as pat

    if os.path.isdir(path):
        members = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not members:
            raise FileNotFoundError(f"no parquet files under {path}")
        path = members[0]
    schema = pq.read_schema(path)
    return tuple(
        f.name
        for f in schema
        if pat.is_timestamp(f.type) and f.type.unit == "ns"
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Batch-read one testdata table (columnar parquet, schema from footer)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    _ensure_ts_confs(spark)
    df = spark.read.parquet(path)
    for c in _nano_ts_columns(path):
        # Integer division: ts is ~1.7e18 nanos, beyond double's 2^53 —
        # `div` stays in long arithmetic.
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # Naive (NTZ) timestamps end-to-end: the source data is naive UTC and
    # the DuckDB oracle is naive — keeping Spark's tz-aware TimestampType
    # would make the same wall-clock instant a different Arrow type.
    # Under the UTC session tz this cast is wall-clock-preserving.
    for f in df.schema.fields:
        if f.dataType.typeName() == "timestamp":
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp_ntz"))
    return df


def load_csv_table(spark: SparkSession, path: str, schema, *, header: bool = True) -> DataFrame:
    """S6 as the reference writes it: batch CSV scan with an explicit
    hand-written schema applied by position (spark.py:109-120).

    Timestamp columns are cast to TIMESTAMP_NTZ after the read so CSV-
    and parquet-backed pipelines produce identical types end-to-end.
    """
    _ensure_ts_confs(spark)
    reader = spark.read.format("csv").schema(schema)
    for k, v in _csv_options(header).items():
        reader = reader.option(k, v)
    df = reader.load(path)
    for f in df.schema.fields:
        if f.dataType.typeName() == "timestamp":
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp_ntz"))
    return df


def stream_csv_table(
    spark: SparkSession,
    path: str,
    schema,
    *,
    header: bool = True,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S5: streaming CSV scan with explicit schema (spark.py:102-106).

    Reads the year=/month=/day= layout `csv_ingest_sink` produces when
    `schema` includes the partition columns; point it at a leaf
    directory otherwise. Timestamps are cast to NTZ as in the batch
    path — including the same UTC session-tz self-set, so TimestampType
    schemas parse identically under a vanilla (non-UTC) driver session.
    """
    _ensure_ts_confs(spark)
    reader = spark.readStream.format("csv").schema(schema)
    for k, v in _csv_options(header).items():
        reader = reader.option(k, v)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.load(path)
    for f in df.schema.fields:
        if f.dataType.typeName() == "timestamp":
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp_ntz"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    """Batch-read several testdata tables; returns {name: DataFrame}."""
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_temp_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register each table as a temp view so spark.sql() queries run on them."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def stream_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming read of a testdata table (file source ≙ S5).

    Structured Streaming file sources need an explicit schema; we take it
    from a batch read of the same path (footer only — no data scan).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    _ensure_ts_confs(spark)
    schema = spark.read.parquet(path).schema
    nano_cols = _nano_ts_columns(path)
    # The file stream source only accepts directories; testdata tables are
    # single files, so stage a symlink inside a temp directory.
    if os.path.isfile(path):
        import tempfile

        d = tempfile.mkdtemp(prefix=f"stream_{name}_")
        os.symlink(path, os.path.join(d, f"{name}.parquet"))
        path = d
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.load(path)
    # Same timestamp normalization as load_table, so callers see identical
    # types whether the table is stored as TIMESTAMP(NANOS) (legacy long
    # read) or TIMESTAMP(MICROS): everything surfaces as TIMESTAMP_NTZ.
    for c in nano_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    for f in df.schema.fields:
        if f.dataType.typeName() == "timestamp":
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp_ntz"))
    return df
