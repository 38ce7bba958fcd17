"""Python UDTF surface: registration, lateral invocation, builtin parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from smart_fraud_detection_data_pipeline_spark.functions.udtfs import make_tokenize_udtf
from smart_fraud_detection_data_pipeline_spark.sources.tables import load_table


def test_tokenize_udtf_matches_posexplode(spark, sf_dir):
    """The UDTF must agree row-for-row with its builtin twin
    posexplode(split(...)) over the real corpus — pinning both the UDTF
    wiring and the documented migration path onto the fast builtin."""
    spark.udtf.register("tokenize", make_tokenize_udtf())
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("docs_udtf")

    via_udtf = spark.sql(
        "SELECT doc_id, s.pos, s.token FROM docs_udtf, LATERAL tokenize(text) s"
    )
    via_builtin = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "token"),
    )
    assert via_udtf.count() == via_builtin.count() > 0
    assert via_udtf.exceptAll(via_builtin).count() == 0
    assert via_builtin.exceptAll(via_udtf).count() == 0


def test_tokenize_udtf_empty_and_null_text(spark):
    spark.udtf.register("tokenize_edge", make_tokenize_udtf())
    spark.createDataFrame(
        [(1, ""), (2, None), (3, "  x  ")], "doc_id long, text string"
    ).createOrReplaceTempView("edge_docs")
    rows = spark.sql(
        "SELECT doc_id, s.pos, s.token FROM edge_docs, LATERAL tokenize_edge(text) s"
    ).collect()
    # empty/null emit nothing; whitespace-padded emits the bare token
    assert [(r.doc_id, r.pos, r.token) for r in rows] == [(3, 0, "x")]
