"""Tests for connected components (min-label propagation)."""

from __future__ import annotations

from pyspark.sql import Row

from smart_fraud_detection_data_pipeline_spark.operators.graph import connected_components


def _cc(spark, n_vertices, edge_pairs):
    vertices = spark.createDataFrame([Row(id=i) for i in range(n_vertices)])
    edges = spark.createDataFrame([Row(src=a, dst=b) for a, b in edge_pairs])
    return {
        r.id: r.component for r in connected_components(vertices, edges).collect()
    }


def test_chain_triangle_isolated(spark):
    # chain 0-1-2-3, triangle 4-5-6, isolated 7
    out = _cc(spark, 8, [(0, 1), (1, 2), (2, 3), (4, 5), (5, 6), (4, 6)])
    assert out == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 4, 7: 7}


def test_long_chain_converges(spark):
    # diameter 9: needs several propagation rounds
    out = _cc(spark, 10, [(i, i + 1) for i in range(9)])
    assert set(out.values()) == {0}


def test_direction_irrelevant(spark):
    a = _cc(spark, 4, [(0, 3), (3, 1)])
    b = _cc(spark, 4, [(3, 0), (1, 3)])
    assert a == b == {0: 0, 1: 0, 3: 0, 2: 2}


def test_nonconvergence_warns(spark):
    """Component diameter > max_iter must WARN, not silently return
    partial labels (ADVICE r1)."""
    import warnings

    import pytest

    n = 8
    vertices = spark.createDataFrame([Row(id=i) for i in range(n)])
    edges = spark.createDataFrame([Row(src=i, dst=i + 1) for i in range(n - 1)])
    with pytest.warns(RuntimeWarning, match="did not converge"):
        connected_components(vertices, edges, max_iter=2).collect()
    # and a converged run stays silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out = connected_components(vertices, edges, max_iter=n + 1).collect()
    assert {r.component for r in out} == {0}
