"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Prints the full JSON line first:
  {"metric": "total_query_time", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": X}
then ENDS stdout with a compact summary line (no per-query map) that
always fits the driver's 2000-char tail capture:
  {"metric": ..., "value": N, "unit": "sec", "sf": X, "n": Q, "errors_n": E}
Set SPARK_GRAFT_BENCH_OUT=path to also write the full artifact to a file.

Each query materializes fully via the noop sink (distributed execution,
no driver collect). A shared warm session amortizes JVM startup, mirroring
a long-lived cluster context.

Set SPARK_GRAFT_BENCH_REPEAT=N (default 1, the driver contract) to run
every query N times and record the MEDIAN — sub-2s queries jitter by
2-3x single-shot on a busy machine, which round 4->5 showed can read as
phantom per-query "regressions". Optionally restrict to a comma-
separated SPARK_GRAFT_BENCH_ONLY=name1,name2 subset when adjudicating
a specific drift.

REPEAT is for SUBSET adjudication, not full-registry artifacts: 129xN
executions in one shared session age the JVM (GC pressure, listener
and scratch accumulation) and inflate the tail by ~10-30% (measured:
204 s median-of-3 vs 190 s single-shot on the same quiet host), so a
full REPEAT run is not comparable to the driver's single-shot pass.

SPARK_GRAFT_BENCH_TIER=iter (round 9, VERDICT r8 #8) is the
development-iteration tier: it runs every query NOT in the
provably-stable sub-second set (_STABLE_SUBSEC — under 1 s in both the
r7 and r8 full artifacts) plus a deterministic 1-in-5 md5 slice of
that set, rotatable via SPARK_GRAFT_BENCH_SLICE=0..4 so five
iterations cover the whole registry. The default tier stays FULL —
the driver contract, the per-round artifacts, and every cert-chain
run are unchanged; `iter` only exists so a mid-round perf loop costs
~the expensive half of the registry instead of all 146 queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from smart_fraud_detection_data_pipeline_spark import get_spark  # noqa: E402
from smart_fraud_detection_data_pipeline_spark.queries import registry  # noqa: E402

#: Queries measured under 1 s in BOTH of the two most recent full
#: sf0.1 artifacts (refreshed each round: r7+r8 seeded the set, r10
#: promoted the 9 names sub-second in BOTH BENCH_local_r9 and _r9b) —
#: the provably-stable cheap tail. The `iter` tier samples these
#: 1-in-5 per run instead of rerunning all of them every iteration;
#: full runs ignore this set.
_STABLE_SUBSEC = frozenset({
    "brand_supplier_counts", "doc_dedup_exact", "doc_mix_token_budget",
    "error_burst_window_bucketed", "multimodal_image_decode",
    "session_windows", "synthetic_transactions", "value_quantiles_approx",
    "vocab_heavy_hitters",
    "amount_benford", "asof_last_purchase", "asof_next_error",
    "brand_basket_revenue", "cohort_retention", "customer_activity_set_ops",
    "customer_order_distribution", "customer_order_seq",
    "customers_no_big_order", "customers_with_big_order",
    "data_quality_report", "dedup_keep_last", "doc_chunk_overlap",
    "doc_mix_temperature", "doc_pack_sequences", "doc_sample_stratified",
    "doc_split_assign", "embed_cosine_topk", "embed_label_centroid_dist",
    "error_burst_window", "event_type_trimmed_mean", "events_json_props",
    "events_jsonl_roundtrip", "events_props_map", "events_variant_props",
    "forecast_revenue_change", "idle_rich_customers", "important_part_value",
    "lang_id_confusion", "late_shipment_orders", "min_cost_suppliers",
    "multi_distinct_stats", "multimodal_byte_features",
    "multimodal_frame_sample", "multimodal_meta", "multimodal_resize",
    "nation_top_customers_lateral", "nation_year_profit",
    "not_in_null_semantics", "observed_quality", "order_priority_late_ship",
    "orders_cube", "orders_grouping_sets", "orders_rollup",
    "orders_snapshot_diff", "prolific_red_part_suppliers",
    "promo_revenue_pct", "regional_revenue", "returned_item_losses",
    "returnflag_priority_mix", "salted_category_totals", "salted_user_join",
    "scan_filter_project", "schema_evolution_scan", "shipping_priority",
    "sliding_window_trends", "small_quantity_revenue", "sql_pricing_summary",
    "time_layout_scan", "top_customers", "top_supplier_revenue",
    "user_event_transitions", "user_event_type_pivot",
    "user_event_type_unpivot", "user_funnel", "user_scd2_intervals",
    "user_txn_velocity", "user_value_ewma", "user_value_lag_delta",
    "user_value_ohlc", "user_value_trend", "value_quantiles",
    "value_winsorized", "vocab_top_ngrams",
})


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # "sf" label: numeric for the driver's sf-named dirs, else the dir
    # basename (e.g. a fuzz fixture used for scale-curve measurement).
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf: float | str = float(base.replace("sf", "") or 0.1)
    except ValueError:
        sf = base
    spark = get_spark("bench")

    # Warm the JVM (whole-stage codegen, parquet reader, broadcast
    # machinery) on a real query at the smallest sf so per-query times
    # measure query execution, not first-use compilation.
    specs = registry()
    specs[0].spark_fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()

    repeat = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "1")))
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        wanted = {n.strip() for n in only.split(",") if n.strip()}
        specs = [s for s in specs if s.name in wanted]
    # SKIP: exclude named queries — used by the scale-curve runs where a
    # query's OUTPUT is inherently quadratic on a skew-stress fixture
    # (e.g. the stream-stream interval joins emit 1.03e9 pairs on the
    # seed-3000 x512 fixture's 60-user key space; SCALING.md).
    skip = os.environ.get("SPARK_GRAFT_BENCH_SKIP")
    if skip:
        dropped = {n.strip() for n in skip.split(",") if n.strip()}
        specs = [s for s in specs if s.name not in dropped]
    if os.environ.get("SPARK_GRAFT_BENCH_TIER") == "iter":
        import hashlib

        sl = int(os.environ.get("SPARK_GRAFT_BENCH_SLICE", "0")) % 5
        specs = [
            s
            for s in specs
            if s.name not in _STABLE_SUBSEC
            or int(hashlib.md5(s.name.encode()).hexdigest(), 16) % 5 == sl
        ]

    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for spec in specs:
        # Per-query fault isolation: one broken query must never zero the
        # whole bench artifact (round-2 postmortem). Errors are recorded
        # and the run continues.
        try:
            if spec.prepare is not None:
                # fixture staging is harness work, not operator work — keep
                # it off the clock so streaming numbers measure streaming
                spec.prepare(spark, sf_dir)
            samples = []
            for _ in range(repeat):
                t0 = time.time()
                spec.spark_fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.time() - t0)
            samples.sort()
            times[spec.name] = round(samples[len(samples) // 2], 3)
        except Exception as exc:  # noqa: BLE001 — isolation is the point
            errors[spec.name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"[bench] ERROR {spec.name}: {errors[spec.name]}", file=sys.stderr)

    out = {
        "metric": "total_query_time",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    # Full artifact (the per-query map) goes FIRST on stdout and, when
    # SPARK_GRAFT_BENCH_OUT is set, to that file. The LAST stdout line
    # is a compact summary that always fits the driver's 2000-char tail
    # capture — round 10's 4.5 KB one-liner overflowed it and the driver
    # recorded `parsed: null` (VERDICT r10 #2).
    print(json.dumps(out))
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(out, fh)
    compact = {
        "metric": "total_query_time",
        "value": out["value"],
        "unit": "sec",
        "sf": sf,
        "n": len(times),
        "errors_n": len(errors),
    }
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
