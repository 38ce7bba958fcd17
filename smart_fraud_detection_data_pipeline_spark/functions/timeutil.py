"""Event-time helpers for the trend operators.

Reference parity: F1 (``F.window(ts, "1 minute")`` — spark.py:174,189)
and F2 (``date_format(..., "yyyy-MM-dd HH:mm:ss")`` stringification of
window bounds — spark.py:181-183,197-199). The stringified bounds are a
load-bearing reference semantic: the warehouse stores them as STRING.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from smart_fraud_detection_data_pipeline_spark.schemas import TREND_WINDOW_FORMAT


def minute_window(ts: Column | str, duration: str = "1 minute") -> Column:
    """Tumbling event-time window column (struct<start,end>)."""
    return F.window(ts, duration)


def stringify_window(df: DataFrame, window_col: str = "window") -> DataFrame:
    """Flatten a window struct to `window_start`/`window_end` strings and drop it.

    Mirrors spark.py:181-183: ``date_format(window.start, 'yyyy-MM-dd
    HH:mm:ss')`` — minute-aligned tumbling windows lose nothing here.
    """
    return (
        df.withColumn(
            "window_start", F.date_format(F.col(f"{window_col}.start"), TREND_WINDOW_FORMAT)
        )
        .withColumn("window_end", F.date_format(F.col(f"{window_col}.end"), TREND_WINDOW_FORMAT))
        .drop(window_col)
    )
