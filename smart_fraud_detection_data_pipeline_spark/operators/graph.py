"""Connected components: near-duplicate pairs → dedup clusters.

Pairwise similarity (textdedup/similarity) gives EDGES; deduplication
policy needs CLUSTERS — "keep one document per connected component of
the similarity graph". This is the one genuinely iterative algorithm in
the engine: min-label propagation over DataFrame joins, driven to a
fixpoint by the driver loop (the standard Spark pattern for bounded
iterative graph algorithms without GraphX).

Convergence: each vertex's label is the min vertex id it has seen; a
round propagates labels one hop, so rounds ≤ graph diameter (near-dup
components are tiny — diameter 2-3; `max_iter` bounds pathological
chains). Each round is one shuffle (join) + one aggregation; labels are
localCheckpoint-ed each round — persist alone caches DATA but the plan
tree still doubles per iteration until plan stringification itself
OOMs (observed at diameter 9). Truncating lineage per round is the
non-negotiable discipline of iterative DataFrame algorithms.

The oracle (queries.py) expresses the same fixpoint as a recursive CTE
(transitive closure + min over the reachable set) — iterative Spark vs
recursive SQL, hash-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Label every vertex with the min vertex id of its component.

    ``vertices``: one column `id_col`. ``edges``: undirected pairs
    (src, dst). Isolated vertices keep their own id as component.
    Returns (id, component).
    """
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = vertices.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("component")
    ).localCheckpoint()

    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels, und.b == labels.id)
            .groupBy("a")
            .agg(F.min("component").alias("n_comp"))
        )
        # Carry the previous label INSIDE the checkpointed frame: the
        # convergence probe then scans the already-materialized rows
        # instead of re-joining new labels against old (one fewer join
        # job per round — measured on the catalog query).
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.a, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("n_comp"), F.col("component"))
                ).alias("component"),
                F.col("component").alias("__prev"),
            )
            .localCheckpoint()  # truncate lineage — see module docstring
        )
        changed = (
            new_labels.where(F.col("component") != F.col("__prev")).limit(1).count()
        )
        labels = new_labels.drop("__prev")
        if changed == 0:
            break
    else:
        # Loop exhausted with changed > 0: a component with diameter >
        # max_iter has NOT reached its fixpoint and the labels are
        # partial. Silent divergence is worse than noise (ADVICE r1).
        import warnings

        warnings.warn(
            f"connected_components did not converge in {max_iter} "
            "iterations; labels for components with diameter > "
            f"{max_iter} are partial. Raise max_iter.",
            RuntimeWarning,
            stacklevel=2,
        )
    und.unpersist()
    return labels
