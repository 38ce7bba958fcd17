"""The end-to-end example in examples/ must stay runnable against the
public API — it is the user-facing composition document (README §Running).

The batch half runs here (cheap at sf0.001); the streaming half reuses
run_pipeline, which tests/test_streaming.py exercises on its own fixtures,
so this test only needs to prove the example's wiring (adapters → operators
→ sinks) composes.
"""

from __future__ import annotations

import importlib
import os
import sys

EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)


def _load_example():
    if EXAMPLES not in sys.path:
        sys.path.insert(0, EXAMPLES)
    return importlib.import_module("end_to_end")


def test_example_batch_demo_runs(spark, sf_dir, tmp_path, capsys):
    ex = _load_example()
    # Expected counts derive from the fixture, not a literal: the demo
    # enriches every event and upserts them all (ADVICE r5 #3).
    n_events = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
    ex.batch_demo(spark, sf_dir, str(tmp_path))
    out = capsys.readouterr().out
    assert f"enriched: {n_events} rows" in out
    assert f"merge_upsert: {n_events} rows" in out


def test_example_adapters_match_registry_shapes(spark, sf_dir):
    """The example's inline adapters must produce the same schema the
    registry's verified fraud_enrich query consumes."""
    ex = _load_example()
    tx = ex.transactions(spark, sf_dir)
    assert set(tx.columns) == {
        "transaction_id", "user_id", "product_id", "amount",
        "payment_method", "timestamp",
    }
    assert dict(tx.dtypes)["timestamp"] == "timestamp_ntz"
    users = ex.users_dim(spark, sf_dir)
    products = ex.products_dim(spark, sf_dir)
    assert {"user_id", "name", "country"} <= set(users.columns)
    assert {"product_id", "category", "base_price", "discount"} <= set(
        products.columns
    )
