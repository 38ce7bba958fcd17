"""Multimodal column plumbing: binary payloads + typed metadata + Arrow UDFs.

Extension surface (SURVEY §7 step 6). The engine treats image/audio/
video as opaque `binary` columns with a typed metadata struct, processed
by Arrow-batched `mapInPandas` — the Spark-side plumbing (schema,
batching, partitioning) is real and tested; the actual media DECODING is
stubbed (`decode_image` raises NotImplementedError) because codec
libraries aren't in this environment. `extract_byte_features` is the
deterministic fake decoder standing in for a real one: it exercises the
exact same Arrow batch shape a Pillow/ffmpeg-backed decoder would.

Scale notes: media payloads dominate row size, so the rules are
(1) never shuffle payload bytes — derive features first, then drop the
payload before any wide transform; (2) size input partitions by bytes
(`spark.sql.files.maxPartitionBytes`), not rows; (3) mapInPandas streams
Arrow batches, so executor memory is bounded by batch size
(`spark.sql.execution.arrow.maxRecordsPerBatch`), not partition size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the (stubbed) feature extractor — what a real image
#: decode would produce per payload.
FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, byte_mean double, byte_entropy_proxy double, format string"
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", fmt: str = "txt"
) -> DataFrame:
    """Model a multimodal table: payload binary + metadata struct.

    For testdata the payload is the utf-8 encoding of `text`; in a real
    pipeline this column comes straight from the source (parquet BINARY /
    image dirs) and everything downstream is format-agnostic.
    """
    payload = F.col(text_col).cast("binary")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.lit(fmt).alias("format"),
        ),
    )


def decode_image(payload: bytes) -> object:
    """STUB: real image decode (Pillow/libjpeg) is unavailable in this
    environment. The Arrow plumbing around it (extract_byte_features) is
    real; swap this function for an actual decoder in production."""
    raise NotImplementedError(
        "image decoding requires a codec library not present in this environment"
    )


def extract_byte_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Deterministic fake decode: per payload, byte count, mean byte value,
    and a distinct-byte entropy proxy. Shape-identical to a real decoder
    (mapInPandas over payload → small numeric feature frame, payload
    dropped on output so no downstream operator ever shuffles bytes).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "byte_mean": payloads.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                    "byte_entropy_proxy": payloads.map(
                        lambda b: float(len(set(b))) / 256.0
                    ),
                    "format": pdf["format"],
                }
            )

    narrow = df.select(
        "doc_id", "payload", F.col("media_meta.format").alias("format")
    )
    return narrow.mapInPandas(batches, schema=FEATURE_SCHEMA)
