"""Training-dataset assembly operators: deterministic splits + packing.

The last mile of an LLM data pipeline, after cleaning/dedup: assign
every document to train/val/test REPRODUCIBLY (no RNG — re-running the
pipeline on a grown corpus must keep every old document in its old
split), and pack variable-length documents into fixed token-budget
sequences for the trainer.

Both are pure Catalyst expressions:

- `split_assign`: bucket = first 8 hex digits of md5(id || salt) mod
  100 — a map-only projection, no shuffle, stable under corpus growth
  and engine-portable (md5 is the one hash DuckDB and Spark share, so
  the assignment is oracle-checkable bit-for-bit).
- `pack_sequences`: shard by id mod n_shards, order within the shard,
  and cut bins where the running token count crosses the budget:
  bin_id = floor(cumulative_tokens_before / budget). One window scan
  per shard — shards are independent, so packing parallelizes across
  the cluster and no global sort exists anywhere. Streaming-fill rule:
  a document straddling a boundary joins the bin it STARTED in (so a
  bin may overflow, never underfill — cumulatively, bins 0..k always
  hold >= budget*(k+1) tokens). Bin ids are token-offset buckets, not
  dense ranks: a document far longer than the budget overflows its
  current bin and the ids it spans are simply skipped.

At 100 TB: both are embarrassingly parallel. Packing's only shuffle is
the hash partition on `shard`; n_shards controls parallelism and bin
locality (a trainer reading shard s gets its bins contiguously).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TRAIN_PCT = 80
VAL_PCT = 10  # test = the remainder


def split_bucket(id_col: Column, *, salt: str = "") -> Column:
    """Deterministic 0-99 bucket from md5 of the id (+ optional salt)."""
    digest = F.md5(F.concat(id_col.cast("string"), F.lit(salt)))
    return F.pmod(
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint"), F.lit(100)
    )


def split_assign(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    salt: str = "",
    train_pct: int = TRAIN_PCT,
    val_pct: int = VAL_PCT,
) -> DataFrame:
    """Attach (bucket, split) columns: train/val/test by hash bucket."""
    bucket = split_bucket(F.col(id_col), salt=salt)
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("bucket", bucket).withColumn("split", split)


MIX_RESOLUTION = 1_000_000


def mix_bucket(id_col: Column, *, salt: str = "") -> Column:
    """Deterministic 0..999999 bucket from md5 of the id (+ salt) — the
    fine-grained twin of split_bucket for per-source sampling rates."""
    digest = F.md5(F.concat(id_col.cast("string"), F.lit(salt)))
    return F.pmod(
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint"),
        F.lit(MIX_RESOLUTION),
    )


def temperature_mix(
    df: DataFrame,
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    frac: float = 0.5,
    salt: str = "",
) -> DataFrame:
    """Deterministic temperature-weighted source mixing — the data-mixing
    step of corpus assembly (multinomial temperature sampling as in
    public multilingual-LM recipes: target share of source s ∝ n_s^alpha,
    alpha<1 upsamples small sources relative to their natural share).

    Realized by per-source SUBSAMPLING, no RNG: source s keeps a doc iff
    md5-bucket(id) < thr_s, where thr_s encodes the acceptance rate
    r_s = min(1, frac·N·p_s / n_s) with p_s = w_s / Σw and
    w_s = pow(n_s, alpha). Engine-portability discipline: pow output is
    6-dp-quantized (floor(x·1e6+0.5)/1e6 — the transcendental rule), Σw
    runs in DECIMAL (order-independent), and the acceptance test is an
    INTEGER comparison (bucket < floor(r·1e6+0.5)), so the keep set is
    bit-identical across engines and runs.

    Scale: one count aggregation (map-side partial), a handful-of-rows
    rate table broadcast back — the corpus itself never shuffles; the
    decision is a map-only projection. The join back is NULL-SAFE on
    the source key (a NULL source is its own stratum; isin()/equi-join
    would silently drop it — routing rule). NULL ids hash to NULL and
    are never kept (no deterministic bucket to keep them by). Output:
    (id, source, mix_thr, kept) for every input row.
    """
    counts = df.groupBy(F.col(source_col).alias("__src")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    w = F.floor(
        F.pow(F.col("__n").cast("double"), F.lit(alpha)) * F.lit(1e6) + F.lit(0.5)
    ) / F.lit(1e6)
    wts = counts.withColumn("__w", w)
    tot = wts.agg(
        F.sum(F.col("__w").cast("decimal(28,6)")).cast("double").alias("__tw"),
        F.sum("__n").cast("double").alias("__tn"),
    )
    rate = F.least(
        F.lit(1.0),
        (F.lit(frac) * F.col("__tn"))
        * (F.col("__w") / F.col("__tw"))
        / F.col("__n").cast("double"),
    )
    thr = F.floor(rate * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    rates = wts.crossJoin(F.broadcast(tot)).select(
        "__src", thr.alias("mix_thr")
    )
    bucket = mix_bucket(F.col(id_col), salt=salt)
    return (
        df.join(
            F.broadcast(rates),
            F.col(source_col).eqNullSafe(F.col("__src")),
            "left",
        )
        .select(
            F.col(id_col),
            F.col(source_col),
            F.col("mix_thr"),
            F.coalesce(bucket < F.col("mix_thr"), F.lit(False)).alias("kept"),
        )
    )


def budget_mix(
    df: DataFrame,
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 100_000,
    budgets: dict | None = None,
) -> DataFrame:
    """Token-budget source mixing — the quota-based sibling of
    `temperature_mix` (rate-based): each source contributes documents
    in deterministic ``id_col`` order until its TOKEN budget fills
    (the composition recipe public LLM-data mixers express as
    "x billion tokens from source s"). A document is kept iff the
    tokens accumulated before it are still under the source's budget —
    the straddling document is included, the same fill convention as
    `pack_sequences`, so a budget is a floor, never undershot while
    the source has data.

    Deterministic, no RNG: one cumulative-sum window per source over
    exact int64 token counts; the keep decision is an integer compare.
    Rows with a NULL token count would ride the quota for free (SUM
    skips NULLs) — filter them out first (documents with NULL text
    have no token count; text-op entry rule).
    ``budgets`` overrides the default per source (keyed by source
    value; a None key sets the NULL-source stratum's budget — NULL is
    its own stratum, as everywhere in the split/mix family).

    Scale: ONE shuffle (hash partition on source) and a within-
    partition sort — no global sort, no joins. A single hot source
    serializes its own partition's cumsum; at real scale the order key
    is time-like, so the standard fix is cutting the window at
    ingest-partition boundaries and carrying the budget remainder —
    the same hot-key note as asof_join's bucket_seconds. Output keeps
    every input row with (cum_before, kept) so the caller can audit
    what the quota excluded.
    """
    w = (
        Window.partitionBy(source_col)
        .orderBy(F.asc_nulls_first(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("bigint")
    if budgets:
        limit = F.lit(budget)
        for src, amt in budgets.items():
            cond = (
                F.col(source_col).isNull()
                if src is None
                else F.col(source_col).eqNullSafe(F.lit(src))
            )
            limit = F.when(cond, F.lit(amt)).otherwise(limit)
    else:
        limit = F.lit(budget)
    return df.select(
        F.col(id_col),
        F.col(source_col),
        F.col(tokens_col).cast("bigint").alias(tokens_col),
        cum_before.alias("cum_before"),
        (cum_before < limit).alias("kept"),
    )


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    n_shards: int = 8,
) -> DataFrame:
    """Assign each document a (shard, bin_id, seq_pos) packing slot.

    Within a shard documents are taken in id order and poured into
    bins of `budget` tokens (streaming fill — see module docstring for
    the boundary/overflow rules; bin ids may be sparse). Output keeps
    the input columns and adds shard / bin_id / seq_pos.
    """
    shard = F.pmod(F.col(id_col), F.lit(n_shards))
    out = df.withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy(id_col)
    cum_before = F.coalesce(
        F.sum(tokens_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    out = out.withColumn(
        "bin_id", F.floor(cum_before / F.lit(budget)).cast("bigint")
    )
    pos_w = Window.partitionBy("shard", "bin_id").orderBy(id_col)
    return out.withColumn(
        "seq_pos", F.row_number().over(pos_w).cast("bigint")
    )


def stratified_sample_exact_k(
    df: DataFrame,
    *,
    strata_col: str,
    id_col: str = "doc_id",
    k: int = 10,
    salt: str = "",
) -> DataFrame:
    """Exactly k rows per stratum, chosen by md5 order — a deterministic
    reservoir sample. Unlike sampleBy (Bernoulli per-row: approximate
    counts, RNG-seeded, engine-specific), ranking by a keyed hash gives
    EXACT per-stratum counts, reproducibility across runs and engines,
    and stability under row order. One shuffle on the stratum key; the
    per-partition WindowGroupLimit keeps only k rows per stratum below
    the exchange, so skewed strata never materialize their full rank.
    Ties are impossible (md5 of distinct ids is distinct), and the id
    tiebreak pins the order anyway.
    """
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(strata_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def chunk_documents(
    df: DataFrame,
    *,
    size: int = 128,
    stride: int = 96,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size overlapping character chunks —
    the context-window packing precursor (chunk k starts at k·stride,
    spans `size` chars, so consecutive chunks overlap by size−stride).

    Pure built-ins: sequence → explode → substr, no Python. Map-only
    (the explode is a per-row fan-out, not a shuffle), so it scales
    linearly with corpus bytes; output rows carry the chunk text, so at
    100 TB follow with a projection/digest before any wide operator.
    Empty documents still produce one (empty) chunk — rows must never
    vanish silently from a training corpus.
    """
    text = F.col(text_col)
    n_chunks = F.greatest(
        F.ceil(F.length(text) / F.lit(float(stride))), F.lit(1)
    ).cast("int")
    idx = F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_idx")
    out = df.select(F.col(id_col), text.alias("__t"), idx)
    chunk = F.substr(
        F.col("__t"), F.col("chunk_idx") * stride + F.lit(1), F.lit(size)
    )
    return out.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        chunk.alias("chunk"),
        F.length(chunk).cast("int").alias("chunk_len"),
    )
