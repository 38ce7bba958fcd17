"""Operator library — one module per family (see README coverage table).

Import the modules, not names: each module is a cohesive operator family
with its own scale notes.
"""

from smart_fraud_detection_data_pipeline_spark.operators import (  # noqa: F401
    asof,
    bucketing,
    datasets,
    dedup,
    enrich,
    graph,
    loaders,
    merge,
    ml,
    multimodal,
    quality,
    similarity,
    skew,
    textdedup,
    textstats,
    trends,
)
