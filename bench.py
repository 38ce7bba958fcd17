"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "total_query_time", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": X}

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
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
