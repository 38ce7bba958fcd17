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


def extract_byte_features(df: DataFrame, decoder=None) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    `decoder(payload: bytes) -> (byte_mean, byte_entropy_proxy)` is
    pluggable: the default is a deterministic byte decoder (mean byte
    value + distinct-byte entropy proxy); production swaps in a real
    codec-backed function WITHOUT touching the Spark plumbing — same
    mapInPandas path, same FEATURE_SCHEMA out (the drop-in contract is
    pinned by a test). Payload is dropped on output so no downstream
    operator ever shuffles bytes. Decoders must be closures (or
    otherwise cloudpickle-by-value) per the repo UDF rule.

    NULL payloads are EXCLUDED (a missing media object has no
    features; a real decoder pipeline must not die on one —
    adversarial-sweep rule, mirrored by the oracle's text IS NOT NULL).
    """
    if decoder is None:

        def decoder(payload: bytes):
            n = len(payload)
            mean = float(sum(payload)) / n if n else 0.0
            return mean, float(len(set(payload))) / 256.0

    decode = decoder

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf["payload"].map(decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "byte_mean": decoded.map(lambda t: t[0]),
                    "byte_entropy_proxy": decoded.map(lambda t: t[1]),
                    "format": pdf["format"],
                }
            )

    narrow = df.where(F.col("payload").isNotNull()).select(
        "doc_id", "payload", F.col("media_meta.format").alias("format")
    )
    return narrow.mapInPandas(batches, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes int, frame_digest string"

RESIZE_SCHEMA = "doc_id long, resized_mean double, resized_digest string"


def sample_frames(df: DataFrame, frame_size: int = 64, every: int = 2) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: chunk the byte
    stream into fixed-size frames, keep every `every`-th, emit one ROW
    per kept frame — the 1→N fan-out shape a real ffmpeg frame sampler
    has (one video row in, many frame rows out of the same Arrow batch).

    The "decode" is deterministic byte chunking standing in for a codec
    (same contract as extract_byte_features); a real implementation
    swaps the chunk loop for keyframe extraction and keeps everything
    else. Output carries per-frame size + digest, never the frame
    bytes — payloads must not outlive the map stage (module scale rule
    #1). Map-only: no shuffle at any corpus size.

    The digest is md5 over the chunk's lowercase HEX encoding (not the
    raw bytes): hex is injective, so identity properties are identical,
    and it is reproducible by a SQL oracle on any byte content — the
    oracle engine has no blob md5, and digesting text instead would
    silently predicate correctness on an ASCII-only corpus
    (adversarial-sweep rule). NULL payloads are excluded, same as
    extract_byte_features.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, sizes, digests = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max((len(payload) + frame_size - 1) // frame_size, 1)
                for i in range(0, n_frames, every):
                    chunk = payload[i * frame_size : (i + 1) * frame_size]
                    ids.append(doc_id)
                    idxs.append(i)
                    sizes.append(len(chunk))
                    digests.append(
                        hashlib.md5(bytes(chunk).hex().encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_bytes": pd.Series(sizes, dtype="int32"),
                    "frame_digest": pd.Series(digests, dtype="object"),
                }
            )

    return (
        df.where(F.col("payload").isNotNull())
        .select("doc_id", "payload")
        .mapInPandas(batches, schema=FRAME_SCHEMA)
    )


def resize_payload(df: DataFrame, width: int = 16) -> DataFrame:
    """Resize plumbing: nearest-neighbor downsample of the payload byte
    signal to a FIXED width — the 1-D analogue of an image resize, with
    the same two properties a real one has: constant output size
    regardless of input size (what makes downstream batches rectangular
    for training) and a deterministic sampling grid
    (position j ↦ byte ⌊j·(n−1)/(w−1)⌋). Emits the resized signal's
    mean and digest, not the bytes. Map-only Arrow stage; swap the
    strided gather for Pillow's `resize` when codecs exist.

    Digest over the lowercase hex encoding and NULL payloads excluded —
    same rationale as sample_frames.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            means, digests = [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                n = len(b)
                if n == 0:
                    sampled = b""
                else:
                    sampled = bytes(
                        b[(j * (n - 1)) // (width - 1)] for j in range(width)
                    )
                means.append(
                    float(sum(sampled)) / width if sampled else 0.0
                )
                digests.append(hashlib.md5(sampled.hex().encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "resized_mean": pd.Series(means, dtype="float64"),
                    "resized_digest": pd.Series(digests, dtype="object"),
                }
            )

    return (
        df.where(F.col("payload").isNotNull())
        .select("doc_id", "payload")
        .mapInPandas(batches, schema=RESIZE_SCHEMA)
    )
