"""smart_fraud_detection_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference pipeline ``thakare2912/Smart-Fraud-Detection-Data-Pipeline``
(streaming fraud enrichment, windowed trend aggregation, keyed dedup +
warehouse upsert), extended with the operators a large-scale (100 TB)
training-data pipeline needs: text dedup (exact / MinHash-LSH / SimHash /
n-gram Jaccard), embedding similarity search, text analysis, and
multimodal column plumbing.

Everything is expressed against the public PySpark DataFrame / SQL /
Structured Streaming API so Catalyst + Tungsten pick the physical plan:
broadcast hash joins for dimension enrichment, partial+final hash
aggregation for trends, AQE for skew/coalescing at scale.
"""

__version__ = "0.1.0"

from smart_fraud_detection_data_pipeline_spark.session import get_spark, s3a_conf  # noqa: F401

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
