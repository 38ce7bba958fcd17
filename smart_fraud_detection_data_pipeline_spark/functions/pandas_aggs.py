"""Arrow GROUPED_AGG pandas UDFs — custom aggregates beyond builtins.

Completes the engine's Arrow UDF surface (mapInPandas for batch
transforms, applyInPandasWithState / transformWithState for streaming
state, UDTF for table functions, and here SCALAR-to-GROUPED_AGG for
custom reductions). Builtins first, always — a pandas aggregate ships
each group's values through Arrow — but a robust statistic with no
Catalyst equivalent (trimmed mean, winsorized variance, custom M-
estimators) is the legitimate use.

`make_trimmed_mean` trims by RANK, not by interpolated quantile value,
deliberately: a count cut (drop the lowest/highest floor(n*trim) rows
under a total (value, id) order) is bit-deterministic across engines,
while quantile-interpolated bounds invite last-bit membership flips.
Money exactness matches the engine-wide convention: per-row integer
cents, summed exactly, divided once.
"""
# NOTE: no `from __future__ import annotations` here — pandas_udf infers
# the GROUPED_AGG flavor from REAL type hints (pd.Series -> float);
# stringified annotations break the inference.


def make_trimmed_mean(trim: float = 0.1):
    """Build a GROUPED_AGG pandas UDF: mean of `value` after dropping
    the lowest and highest floor(n*trim) rows per group, ordered by
    (value, id) so ties cut identically everywhere. Closure, as every
    Python UDF in this engine must be (cloudpickle by-value)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def trimmed_mean(v: pd.Series, ids: pd.Series) -> float:
        vs = v.to_numpy()
        order = np.lexsort((ids.to_numpy(), vs))
        vs = vs[order]
        k = int(len(vs) * trim)
        kept = vs[k : len(vs) - k] if k else vs
        cents = np.rint(kept * 100).astype("int64").sum()
        return float(cents) / 100.0 / len(kept)

    return trimmed_mean


def make_robust_zscore(schema: str):
    """Build the GROUPED_MAP (applyInPandas) transform: per-group robust
    z-score (value - median) / MAD, emitted row-per-row. The grouped-map
    door, pinned to the hash gate the way the UDTF is pinned to its
    builtin twin: this statistic is chosen exactly BECAUSE a window
    formulation also exists (the oracle), so the Arrow path is held to
    bit-parity — median interpolation and float64 division are the same
    IEEE ops in pandas and the SQL engines. Rounding happens OUTSIDE
    (F.round after the transform) so both engines round the same way.
    A zero-MAD group (constant values) yields z = 0.0. Closure, as
    every Python UDF in this engine must be (cloudpickle by-value)."""
    import pandas as pd

    def robust_z(pdf: pd.DataFrame) -> pd.DataFrame:
        med = pdf["value"].median()
        mad = (pdf["value"] - med).abs().median()
        z = (pdf["value"] - med) / mad if mad else pdf["value"] * 0.0
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "robust_z": z,
            }
        )

    return robust_z
