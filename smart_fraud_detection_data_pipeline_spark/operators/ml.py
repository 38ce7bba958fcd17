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
    lr = LogisticRegression(maxIter=20, regParam=0.01)
    return lr.fit(assembler.transform(prepped))


def score_transactions(model: "LogisticRegressionModel", enriched: DataFrame) -> DataFrame:
    """Attach ml_fraud_probability to enriched rows (JVM-side transform)."""
    _require_ml()
    prepped = enriched.select(
        "transaction_id",
        *[F.coalesce(F.col(c), F.lit(0.0)).cast("double").alias(f"__f_{c}") for c in FEATURE_COLS],
    )
    assembler = VectorAssembler(
        inputCols=[f"__f_{c}" for c in FEATURE_COLS], outputCol="features"
    )
    scored = model.transform(assembler.transform(prepped))
    prob = vector_to_array(F.col("probability"))[1]
    return scored.select(
        "transaction_id", F.round(prob, 6).alias("ml_fraud_probability")
    )
