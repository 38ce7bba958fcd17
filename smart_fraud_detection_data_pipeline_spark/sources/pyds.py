"""S1 via the Spark 4 Python DataSource API: the extensibility door.

The engine's production generator (sources/generator.py) is a PLAN —
spark.range + seeded rand() runs JVM-side and is the fast path. This
module re-expresses the same source through pyspark.sql.datasource so
the engine demonstrably supports custom Python connectors — the API a
user would reach for when the upstream is a bespoke feed (a proprietary
wire format, a paginated HTTP API, a message queue Spark has no
connector for). Reference parity: the Kafka producer's row loop
(src/kafka/producer/transaction_producer.py:12-41) IS such a bespoke
source; here its value domains come back as a first-class
`spark.read.format(...)` with planned partitions.

Scale/physics: rows surface through Python workers + Arrow — a
per-row Python cost the JVM generator does not pay. The partition
planning is the part that matters at scale: the id range splits into
`n_partitions` independent slices, so throughput scales linearly with
executors exactly like any file source. Determinism comes from hashing
(seed, row id) — md5 per row, no RNG state shared across partitions,
so any partitioning yields the same multiset of rows.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from smart_fraud_detection_data_pipeline_spark.sources.generator import (
    BASE_TS,
    COUNTRIES,
    PAYMENT_METHODS,
    ROWS_PER_SECOND,
)

_SCHEMA = (
    "transaction_id string, user_id int, product_id int, store_id string, "
    "amount double, payment_method string, country string, "
    "timestamp timestamp_ntz"
)


def _row(i: int, seed: int, base: datetime):
    """Deterministic transaction for row id i: fields are carved from
    md5(seed:i) — stable across runs, partitionings and engines."""
    h = hashlib.md5(f"{seed}:{i}".encode()).digest()
    u32 = [int.from_bytes(h[j : j + 4], "big") for j in range(0, 16, 4)]
    return (
        "T" + str(i % 9000000 + 1000000),
        u32[0] % 2000 + 1,
        u32[1] % 500 + 1,
        "S" + str(u32[2] % 5 + 1),
        round((u32[3] % 499000) / 100.0 + 10.0, 2),  # [10, 5000) in cents
        PAYMENT_METHODS[h[0] % len(PAYMENT_METHODS)],
        COUNTRIES[h[1] % len(COUNTRIES)],
        base + timedelta(seconds=i // ROWS_PER_SECOND),
    )


class _RangeSlice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticTransactionsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.seed = int(options.get("seed", 41))

    def partitions(self):
        step = max(1, -(-self.n_rows // self.n_partitions))
        return [
            _RangeSlice(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition):
        base = datetime.fromisoformat(BASE_TS)
        for i in range(partition.start, partition.end):
            yield _row(i, self.seed, base)


class SyntheticTransactionsDataSource(DataSource):
    """spark.read.format("synthetic_transactions_py").option("n_rows", N)"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_transactions_py"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema):
        return SyntheticTransactionsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticTransactionsDataSource)
