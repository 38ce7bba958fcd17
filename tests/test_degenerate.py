"""Pytest pins for the degenerate-input rules (CLAUDE.md, round 5).

The oracle sweeps over /tmp/sf_adversarial and /tmp/sf_empty are the
full gates; these tests pin the OPERATOR-level behaviors they rely on,
so a regression surfaces in the fast suite without DuckDB or fixture
generation. Each test names the rule it guards.
"""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_merge_additive_null_plus_null_is_null(spark):
    """SQL SUM over an all-NULL group is NULL; incremental maintenance
    must agree with a full recompute, so NULL+NULL combines to NULL
    (and NULL+x to x)."""
    from smart_fraud_detection_data_pipeline_spark.operators.merge import merge_additive

    base = spark.createDataFrame(
        [Row(k=1, s=None, n=1), Row(k=2, s=10.0, n=2), Row(k=3, s=None, n=1)],
        "k int, s double, n int",
    )
    delta = spark.createDataFrame(
        [Row(k=1, s=None, n=1), Row(k=2, s=5.0, n=1), Row(k=4, s=2.0, n=1)],
        "k int, s double, n int",
    )
    out = {
        r.k: (r.s, r.n)
        for r in merge_additive(
            base, delta, ["k"], sum_cols=["s"], count_cols=["n"]
        ).collect()
    }
    assert out[1] == (None, 2)      # NULL + NULL -> NULL
    assert out[2] == (15.0, 3)
    assert out[3] == (None, 1)      # NULL + missing -> NULL
    assert out[4] == (2.0, 1)       # missing + value -> value


def test_trimmed_mean_skips_nulls(spark):
    """NULL measures are excluded before the rank cut — a NaN would
    poison the int64 cents protocol (np.rint(nan).astype(int64))."""
    from smart_fraud_detection_data_pipeline_spark.functions.pandas_aggs import (
        make_trimmed_mean,
    )

    df = spark.createDataFrame(
        [Row(g="a", id=i, v=float(i)) for i in range(1, 11)]
        + [Row(g="a", id=99, v=None)],
        "g string, id long, v double",
    )
    got = (
        df.groupBy("g")
        .agg(make_trimmed_mean(0.1)(F.col("v"), F.col("id")).alias("tm"))
        .collect()[0]
        .tm
    )
    # 10 non-null values 1..10, trim 1 from each end -> mean(2..9) = 5.5
    assert got == pytest.approx(5.5)


def test_null_text_produces_no_pairs(spark):
    """A NULL-text document must not pair with an empty-text document:
    split(NULL) -> concat_ws skip manufactures the same '' shingle
    without the operator-entry filter."""
    from smart_fraud_detection_data_pipeline_spark.operators import textdedup as TD

    docs = spark.createDataFrame(
        [Row(doc_id=1, text=""), Row(doc_id=2, text=None),
         Row(doc_id=3, text="a b c d e f g h i j"),
         Row(doc_id=4, text="a b c d e f g h i j")],
        "doc_id long, text string",
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in TD.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert pairs == {(3, 4)}


def test_read_or_empty_missing_dir(spark, tmp_path):
    """A foreachBatch output dir may not exist (every batch empty);
    readers get an empty frame with the sink input's schema, plus the
    reemit sink's batch_id when asked."""
    from smart_fraud_detection_data_pipeline_spark.streaming.sinks import read_or_empty

    like = spark.createDataFrame([], "a long, b string")
    out = read_or_empty(spark, str(tmp_path / "nope"), like)
    assert out.count() == 0 and out.columns == ["a", "b"]
    out2 = read_or_empty(spark, str(tmp_path / "nope"), like, with_batch_id=True)
    assert out2.columns == ["a", "b", "batch_id"]


def test_kmeans_centroids_degenerate(spark):
    """Empty corpus -> no centroids; k near the near-distinct point
    count -> the halving ladder recovers instead of AIOOBE."""
    from smart_fraud_detection_data_pipeline_spark.operators import ml as ML

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert ML.kmeans_centroids(empty, k=4) == []

    dup = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i % 3), 1.0]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    cents = ML.kmeans_centroids(dup, k=6)  # only 3 distinct points
    assert 1 <= len(cents) <= 6 and all(len(c) == 2 for c in cents)


def test_ann_empty_corpus_empty_result(spark):
    """ANN over an empty (or all-NULL-vector) corpus returns an empty
    frame with the output schema, never a dim-probe crash."""
    from smart_fraud_detection_data_pipeline_spark.operators import similarity as S

    corpus = spark.createDataFrame(
        [Row(vec_id=1, embedding=None)], "vec_id long, embedding array<float>"
    )
    queries = spark.createDataFrame(
        [Row(query_id=1, embedding=[1.0] * 4)], "query_id long, embedding array<float>"
    )
    for fn in (S.srp_ann_topk, S.ivf_ann_topk):
        out = fn(corpus, queries, k=3)
        assert out.count() == 0
        assert out.columns == ["query_id", "vec_id", "cosine_sim", "rank"]


def test_rollup_empty_input_emits_nothing(spark):
    """Spark's grouping-sets Expand emits NO grand-total row over empty
    input (ANSI/DuckDB emit one) — the oracle pins this with HAVING
    COUNT(*) > 0; if a Spark version starts emitting the row, this
    fails and the pins must flip."""
    empty = spark.createDataFrame([], "a string, b string, v double")
    assert empty.rollup("a", "b").agg(F.count(F.lit(1))).count() == 0
    assert empty.cube("a", "b").agg(F.count(F.lit(1))).count() == 0


def test_multimodal_null_payload_excluded(spark):
    """NULL payloads are excluded from feature/frame/resize extraction,
    and digests are md5 over the lowercase hex encoding."""
    from smart_fraud_detection_data_pipeline_spark.operators import multimodal as MM

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="abcd"), Row(doc_id=2, text=None)],
        "doc_id long, text string",
    )
    mm = MM.attach_binary_payload(docs)
    feats = MM.extract_byte_features(mm).collect()
    assert [r.doc_id for r in feats] == [1]
    frames = MM.sample_frames(mm, frame_size=2, every=1).collect()
    assert {r.doc_id for r in frames} == {1}
    assert frames[0].frame_digest == hashlib.md5(b"ab".hex().encode()).hexdigest()


def test_from_json_int_map_conformance(spark):
    """Pin Jackson's map<string,int> conformance (fuzz seeds 2929/3131/
    4242x8): only an integral JSON lexeme within int32 range parses;
    a float lexeme (even 3.0), a quoted digit, a boolean, or an
    out-of-range integer nulls the WHOLE map; a JSON null KEEPS its
    entry with a NULL value. The events_props_map oracle mirrors this
    with json_type IN (BIGINT, UBIGINT, NULL) + a range check — if a
    Spark upgrade loosens the parse, this fails and the oracle must
    follow."""
    cases = [
        ('{"k": 53}', {"k": 53}),
        ('{"k": -5}', {"k": -5}),
        ('{"k": 2147483647}', {"k": 2147483647}),
        ('{"k": null}', {"k": None}),       # null value keeps its entry
        ('{"k": 3.5}', None),
        ('{"k": 3.0}', None),               # exactly integral, still a float lexeme
        ('{"k": "3"}', None),               # no string->int coercion
        ('{"k": true}', None),
        ('{"k": 2147483648}', None),        # int32 overflow
        ('{"k": 18446744073709551615}', None),  # uint64 range: > int64 max too
        ('{"a": 1, "b": 18446744073709551615}', None),  # ADVICE r5: one uint64
        # value must null the whole multi-key map (oracle's bool_and must
        # see FALSE, not a skipped NULL, for the out-of-BIGINT cast)
        ('{"a": 1, "b": "x"}', None),       # one bad value nulls ALL entries
        ('not json', None),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "props string")
    got = [
        r.m
        for r in df.select(
            F.from_json("props", "map<string,int>").alias("m")
        ).collect()
    ]
    assert got == [c[1] for c in cases]
