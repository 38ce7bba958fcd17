"""Corpus-vocabulary operators: exact heavy hitters in two bounded passes.

Extension surface (SURVEY §7 step 6): vocabulary construction over a
100 TB corpus. The naive plan — explode every token and groupBy — is
one shuffle whose key cardinality is the FULL distinct vocabulary
(billions of keys for web-scale corpora, Zipf tail included), and the
map-side partial agg only absorbs the head. `heavy_hitter_tokens`
replaces it with the Misra–Gries summary (Misra & Gries 1982; merge
rule per Agarwal et al., "Mergeable Summaries", PODS'12):

1. ONE map-only pass: each partition folds its tokens into a k-slot
   summary (an Arrow `mapInPandas` that keeps one dict per PARTITION —
   per-batch exact Counters merged under the MG compression rule, so
   the Python work is C-speed Counter arithmetic, never a per-row UDF
   call). A partition emits at most k candidate rows.
2. Exact recount of the candidate set only: candidates (≤ k ×
   #partitions rows — filter-sized, not corpus-sized) broadcast back;
   the exploded token stream is semi-joined map-side against them, so
   the ONLY corpus-wide shuffle keys on ≤ that many distinct tokens.

Correctness is EXACT, not approximate: MG guarantees any token with
global frequency > N/(k+1) survives pass 1 (undercount across merges
is bounded by N/(k+1), so a dropped token cannot exceed it), and the
recount then applies the exact integer threshold `count · inv > N`.
With slots = inv the guarantee window N/(inv+1) sits strictly below
the emitted threshold N/inv, so the output is the exact heavy-hitter
set — independent of partitioning, row order, and batch size (the
shuffle-partition and local-cluster recerts ride through this), which
is what lets the DuckDB oracle recompute it with a plain GROUP BY ...
HAVING. The threshold is an integer cross-multiply (never a float
fraction) so boundary tokens cannot flip between engines.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitter_tokens(
    df: DataFrame,
    *,
    text_col: str = "text",
    inv_threshold: int = 64,
    slots: int | None = None,
) -> DataFrame:
    """All tokens occurring more than N/inv_threshold times across the
    corpus (N = total token occurrences, NULL-text docs excluded), with
    exact counts: (token, n_occurrences).

    ``slots`` (default = inv_threshold) sizes the per-partition summary;
    any value >= inv_threshold preserves exactness, larger values only
    shrink pass-1 undercount (irrelevant here — pass 2 recounts).

    Tokenization is whitespace split of trim(lower(text)) — the same
    scheme as `vocab_top_ngrams`, so an empty-after-trim document
    contributes a single '' token on both engines.
    """
    if slots is None:
        slots = inv_threshold
    if slots < inv_threshold:
        raise ValueError(
            "slots < inv_threshold would break the Misra-Gries guarantee "
            f"(need > N/{inv_threshold} to survive, summary only keeps "
            f"> N/{slots + 1})"
        )
    toks = df.where(F.col(text_col).isNotNull()).select(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__toks")
    )

    k = slots  # close over plain ints only (cloudpickle by-value)

    def mg_summaries(batches: Iterator) -> Iterator:  # pragma: no cover
        # One Misra-Gries dict per PARTITION: mapInPandas hands every
        # Arrow batch of the partition through this single iterator.
        # Per batch: exact Counter (C-speed), then the mergeable-MG
        # compression — subtract the (k+1)-th largest count from all
        # entries and drop the non-positive ones. Undercount per
        # compression is bounded by what pigeonhole allows, summing to
        # <= n_p/(k+1) over the partition.
        import collections

        import numpy as np
        import pandas as pd

        state: collections.Counter = collections.Counter()
        for batch in batches:
            if len(batch) == 0:
                continue
            # One vectorized count per Arrow batch (np.concatenate +
            # value_counts are C loops; a per-row Counter.update was
            # measured 4x slower on a 5M-token partition).
            counts = pd.Series(
                np.concatenate(list(batch["__toks"]))
            ).value_counts()
            state.update(counts.to_dict())
            if len(state) > k:
                kth = sorted(state.values(), reverse=True)[k]
                state = collections.Counter(
                    {t: c - kth for t, c in state.items() if c > kth}
                )
        yield pd.DataFrame({"token": list(state.keys())})

    candidates = (
        toks.mapInPandas(mg_summaries, "token string").distinct()
    )
    totals = toks.agg(
        F.sum(F.size("__toks")).cast("bigint").alias("__n")
    ).withColumn("__n", F.coalesce(F.col("__n"), F.lit(0)))
    return (
        toks.select(F.explode("__toks").alias("token"))
        .join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(totals))
        .where(F.col("n_occurrences") * inv_threshold > F.col("__n"))
        .select("token", "n_occurrences")
    )
