"""MLlib-backed operators: learned IVF centroids and a fraud scorer.

The reference computes fraud scores with hand-written rules
(spark.py:147-168); the north-star architecture names MLlib as the
modeling layer on top of the same feature pipeline. Two integrations:

- `kmeans_centroids`: fit MLlib KMeans over the embedding column and
  return centroids as plain lists — a drop-in coarse quantizer for
  `similarity.ivf_ann_topk` (learned cells adapt to data density,
  unlike the sampled ones). Seeded → deterministic.
- `train_fraud_scorer` / `score_transactions`: logistic regression on
  the enrichment features, trained against the rule-based flag as the
  (weak) label — the standard bootstrap when no human fraud labels
  exist yet. Inference is a single JVM-side pipeline transform: no
  Python in the scoring loop, so it streams (the fitted model applies
  to a streaming DataFrame unchanged).

Gated import: everything degrades with a clear ImportError if pyspark.ml
is unavailable in a stripped runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:
    from pyspark.ml.classification import LogisticRegression, LogisticRegressionModel
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import array_to_vector, vector_to_array

    HAVE_ML = True
except ImportError:  # pragma: no cover - full pyspark always has ml
    HAVE_ML = False

SEED = 42


def _require_ml() -> None:
    if not HAVE_ML:
        raise ImportError("pyspark.ml is required for MLlib-backed operators")


def kmeans_centroids(
    corpus: DataFrame, k: int, *, vec_col: str = "embedding", max_iter: int = 10
) -> list[list[float]]:
    """Learned IVF coarse quantizer: seeded KMeans over the embeddings.
    NULL vectors are excluded — MLlib's vector conversion rejects them,
    and an absent vector belongs to no cluster (adversarial-sweep rule).
    """
    _require_ml()
    corpus = corpus.where(F.col(vec_col).isNotNull())
    feats = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    # MLlib KMeans dies with an ArrayIndexOutOfBounds during init when k
    # approaches the number of (near-)distinct points (adversarial-sweep
    # finding on a tiny corpus with duplicate vectors; the exact feasible
    # k is an MLlib internal — 5 of 7 distinct points in the probe). A
    # deterministic halving ladder recovers: k=1 always fits, so this
    # terminates in ≤ log2(k) retries, and on healthy corpora (k ≪ n)
    # the first fit succeeds with no extra work.
    while True:
        try:
            model = KMeans(k=k, seed=SEED, maxIter=max_iter).fit(feats)
            break
        except Exception:
            # Checked only in the failure path: an EMPTY corpus has no
            # centroids at all (the empty-partition-day case), and
            # MLlib's k floor is 2.
            if feats.isEmpty():
                return []
            if k <= 2:
                raise
            k = max(k // 2, 2)
    return [list(map(float, c)) for c in model.clusterCenters()]


FEATURE_COLS = ("amount", "country_mismatch", "high_value_flag", "discounted_price")


def train_fraud_scorer(enriched: DataFrame) -> "LogisticRegressionModel":
    """Fit a logistic regression on the enrichment features.

    Label = the rule score thresholded (fraud_score >= 0.5, i.e. any
    rule fired): weak
    supervision from the rule engine, the standard cold-start before
    human labels arrive. Nulls (failed dimension joins) are imputed to 0
    — the same "absence of evidence is not fraud" convention as P2.
    """
    _require_ml()
    prepped = enriched.select(
        *[F.coalesce(F.col(c), F.lit(0.0)).cast("double").alias(c) for c in FEATURE_COLS],
        (F.col("fraud_score") >= 0.5).cast("double").alias("label"),
    )
    assembler = VectorAssembler(inputCols=list(FEATURE_COLS), outputCol="features")
    # maxIter=8 (r14, was 20): each LBFGS iteration is one driver-
    # scheduled treeAggregate job; the label is an exact function of two
    # features, so the fit separates perfectly long before the cap
    # (measured at sf0.1: 0 errors and 0.92 mean-probability separation
    # from iteration 5 on; maxIter=20 ran 13 iterations for identical
    # contract margins — AUC ~1.0 vs the 0.9 floor).
    lr = LogisticRegression(maxIter=8, regParam=0.01)
    return lr.fit(assembler.transform(prepped))


def score_transactions(
    model: "LogisticRegressionModel",
    enriched: DataFrame,
    *,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Attach ml_fraud_probability to enriched rows (JVM-side transform).

    ``keep`` threads extra enrichment columns through the transform so
    downstream consumers (the contract report, per-period rollups) never
    re-join the fact stream against its own scores — the transform is a
    map-only projection, and a keyed re-join would add a fact-sized
    shuffle for columns that were already on the row."""
    _require_ml()
    prepped = enriched.select(
        "transaction_id",
        *keep,
        *[F.coalesce(F.col(c), F.lit(0.0)).cast("double").alias(f"__f_{c}") for c in FEATURE_COLS],
    )
    assembler = VectorAssembler(
        inputCols=[f"__f_{c}" for c in FEATURE_COLS], outputCol="features"
    )
    scored = model.transform(assembler.transform(prepped))
    prob = vector_to_array(F.col("probability"))[1]
    return scored.select(
        "transaction_id", *keep, F.round(prob, 6).alias("ml_fraud_probability")
    )


def fraud_score_contract_report(enriched: DataFrame) -> DataFrame:
    """Train + score + certify in one plan: per-(tx_year, tx_month)
    deterministic counts the oracle recomputes exactly, plus three
    dataset-level contract booleans about the LEARNED model that the
    oracle asserts TRUE — the pattern that turns an un-SQL-able MLlib
    fit into a full hash gate (VERDICT r7 #3; same approach as the
    KMeans recall gate and the two-tier sketch contracts).

    Output columns:

    - ``tx_year, tx_month, tx_day, n_rows, n_flagged`` — integer-exact facts
      about the RULE side (label = fraud_score >= 0.5 =
      country_mismatch OR high_value_flag), a pure SQL recompute.
    - ``auc_ok`` — tie-averaged rank AUC of the model score against the
      rule label is >= 0.9 (trivially TRUE when a class is empty). The
      label is an exact function of two of the four features, so any
      sane fit ranks near-perfectly; 0.9 is a ~10σ-style hard floor
      only an implementation bug can cross, robust to ulp-level
      coefficient drift across treeAggregate orders.
    - ``accuracy_ok`` — errors at the fixed 0.5 probability threshold
      are <= max(2, 10% of rows): the two-tier straggler shape
      (CLAUDE.md), not a per-row band, so boundary rows on tiny or
      skewed fixtures cannot flake the gate.
    - ``calibration_monotone`` — empirical flagged-rate in the TOP
      prediction quartile >= rate in the BOTTOM quartile (empty band →
      TRUE). Head-vs-tail monotonicity is the robust form: per-decile
      strict monotonicity fails on a single inverted row (the per-row-
      3σ mistake all over again).

    Scale shape: scoring is map-only (JVM pipeline transform with
    passthrough columns — no re-join); the AUC/quartile exact side
    aggregates to per-SCORE counts first (<= 1e6+1 distinct values, the
    6-dp rounding grid), so the only global-order window runs over that
    bounded frame, never the fact table. The fact frame is persisted
    once and feeds the per-score agg, the accuracy agg, the band rates
    and the per-month rollup."""
    from pyspark.sql import Window

    _require_ml()
    model = train_fraud_scorer(enriched)
    scored = score_transactions(
        model,
        enriched.withColumn(
            "__flag", (F.col("fraud_score") >= 0.5).cast("int")
        ),
        keep=("tx_year", "tx_month", "tx_day", "__flag"),
    )
    prob = F.col("ml_fraud_probability")
    # localCheckpoint, not persist: the frame outlives this function
    # (the returned report references it), and on the shared long-lived
    # session a persist with no unpersist accumulates in the block
    # manager across the 145-query harness. Checkpoint blocks free with
    # the DataFrame (the tfidf_cosine_pairs discipline).
    rows = scored.localCheckpoint(eager=False)

    per_score = (
        rows.groupBy("ml_fraud_probability")
        .agg(F.sum("__flag").alias("__np"), F.count(F.lit(1)).alias("__nt"))
        .withColumn("__nn", F.col("__nt") - F.col("__np"))
    )
    wcum = Window.orderBy("ml_fraud_probability").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # per feeds BOTH the totals agg and the quartile-boundary agg —
    # materialize so the per-score groupBy + window run once (the
    # materialize-reused-branches invariant); localCheckpoint so the
    # block frees with the frame instead of lingering on the shared
    # session.
    per = per_score.select(
        "*",
        F.coalesce(F.sum("__nn").over(wcum), F.lit(0)).alias("__neg_below"),
        F.coalesce(F.sum("__nt").over(wcum), F.lit(0)).alias("__cnt_below"),
    ).localCheckpoint(eager=False)
    tot = per.agg(
        F.sum(
            F.col("__np") * (F.col("__neg_below") + F.col("__nn") / F.lit(2.0))
        ).alias("__auc_num"),
        F.sum("__np").alias("__pos"),
        F.sum("__nn").alias("__neg"),
        F.sum("__nt").alias("__n"),
    )
    # Quartile boundaries from the per-score cumulative counts (small
    # frame) — never a global sort of the fact table.
    bounds = (
        per.crossJoin(F.broadcast(tot))
        .agg(
            F.min(
                F.when(
                    F.col("__cnt_below") + F.col("__nt")
                    >= F.ceil(F.col("__n") / F.lit(4.0)),
                    prob,
                )
            ).alias("__b1"),
            F.min(
                F.when(
                    F.col("__cnt_below") + F.col("__nt")
                    >= F.ceil(F.col("__n") * F.lit(3.0) / F.lit(4.0)),
                    prob,
                )
            ).alias("__b3"),
            F.min("__auc_num").alias("__auc_num"),
            F.min("__pos").alias("__pos"),
            F.min("__neg").alias("__neg"),
            F.min("__n").alias("__n"),
        )
    )
    stats = rows.crossJoin(F.broadcast(bounds)).agg(
        F.min("__auc_num").alias("__auc_num"),
        F.min("__pos").alias("__pos"),
        F.min("__neg").alias("__neg"),
        F.min("__n").alias("__n"),
        F.sum(F.when(prob <= F.col("__b1"), F.col("__flag")).otherwise(F.lit(0))).alias("__bot_pos"),
        F.sum(F.when(prob <= F.col("__b1"), F.lit(1)).otherwise(F.lit(0))).alias("__bot_n"),
        F.sum(F.when(prob > F.col("__b3"), F.col("__flag")).otherwise(F.lit(0))).alias("__top_pos"),
        F.sum(F.when(prob > F.col("__b3"), F.lit(1)).otherwise(F.lit(0))).alias("__top_n"),
        F.sum(
            F.when((prob >= F.lit(0.5)).cast("int") != F.col("__flag"), F.lit(1)).otherwise(F.lit(0))
        ).alias("__errors"),
    )
    contract = stats.select(
        (
            (F.col("__pos") == 0)
            | (F.col("__neg") == 0)
            | (
                F.col("__auc_num") / (F.col("__pos") * F.col("__neg"))
                >= F.lit(0.9)
            )
        ).alias("auc_ok"),
        (
            F.col("__errors")
            <= F.greatest(F.lit(2.0), F.col("__n") * F.lit(0.1))
        ).alias("accuracy_ok"),
        (
            (F.col("__bot_n") == 0)
            | (F.col("__top_n") == 0)
            | (
                F.col("__top_pos") / F.col("__top_n")
                >= F.col("__bot_pos") / F.col("__bot_n")
            )
        ).alias("calibration_monotone"),
    )
    groups = rows.groupBy("tx_year", "tx_month", "tx_day").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("__flag").alias("n_flagged"),
    )
    return groups.crossJoin(F.broadcast(contract)).select(
        "tx_year",
        "tx_month",
        "tx_day",
        "n_rows",
        "n_flagged",
        "auc_ok",
        "accuracy_ok",
        "calibration_monotone",
    )
