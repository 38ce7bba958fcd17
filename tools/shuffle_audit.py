"""Measured shuffle/spill audit over the headline batch queries.

PLAN_AUDIT.md proves the *shape* of every physical plan (broadcasts
where expected, no cartesian products, pushed filters). This tool
measures what those plans actually *move*: per-query aggregate task
metrics from Spark's status REST API — input bytes, shuffle read/write
bytes, memory/disk spill, task count — so the 100 TB story rests on
numbers, not inference. At scale the dominant cost of a distributed
plan is bytes exchanged; a query whose shuffle volume is a small
fraction of its input survives a 1000× scale-up, one that shuffles its
whole input does not.

Method: one shared session with the UI enabled; for each query,
snapshot the completed-stage set, run the query to the noop sink
(distributed materialization, no driver collect), then attribute every
newly completed stage's metrics to that query. AQE stage reuse/skips
are handled naturally (skipped stages report zero).

Hard checks (exit non-zero on violation):
- queries tagged ``map_only`` must report ZERO shuffle write bytes;
- queries tagged ``spread_map`` (map work behind skew.spread_input's
  conditional round-robin of an under-split scan — r13) must shuffle
  NO MORE RECORDS than they read: the spread moves each pruned input
  row exactly once and adds no keyed exchange. At production split
  counts the guard is a no-op and the plan is map_only again;
- no query may spill to disk at the audited SF (local[32], 128 GiB —
  a spill here means partition sizing is badly wrong);
- ``warehouse_load_incremental`` must read strictly less input than
  ``warehouse_load`` (partition pruning must reach the file scan).

Usage: python tools/shuffle_audit.py [sf_dir] [query ...]
Writes SHUFFLE_AUDIT.md at the repo root and prints a one-line summary.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from smart_fraud_detection_data_pipeline_spark import get_spark  # noqa: E402
from smart_fraud_detection_data_pipeline_spark.queries import registry  # noqa: E402

#: Audited queries → (shape tag, why this shape is the scale story).
#: Tags: map_only = no exchange at all; broadcast_join = dims broadcast,
#: fact side never shuffles; partial_agg = map-side combine then one
#: keyed exchange of partial aggregates; topk = per-partition limit then
#: single tiny final; keyed_shuffle = one full exchange on the dedup/
#: window key (irreducible for exact semantics); bounded_candidates =
#: inverted-index/bucket blocking, exchange carries candidates not
#: all-pairs; composite = multi-stage pipeline of the above.
HEADLINE: dict[str, tuple[str, str]] = {
    "scan_filter_project": ("map_only", "filter+project pushed to scan"),
    "doc_profile": ("spread_map", "per-doc JVM column expressions; conditional input spread (fingerprint fold)"),
    "events_pii_redact": ("spread_map", "JVM regex over rows; conditional input spread"),
    "doc_winnow": ("spread_map", "per-doc fingerprinting; conditional input spread"),
    "fraud_enrich": ("broadcast_join", "dims broadcast; fact never shuffles"),
    "embed_cosine_topk": ("broadcast_join", "query side broadcast (exact tier)"),
    "pricing_summary": ("partial_agg", "6-col rollup, partial agg first"),
    "user_spend_trends": ("partial_agg", "windowed agg, map-side combine"),
    "doc_dedup_exact": ("partial_agg", "md5 groupBy"),
    "top_customers": ("topk", "TakeOrderedAndProject"),
    "dedup_keep_last": ("keyed_shuffle", "row_number over key"),
    "nation_year_profit": ("composite", "TPC-H Q9 multi-join"),
    "salted_user_join": ("composite", "salted skew join"),
    "doc_minhash_lsh": ("bounded_candidates", "banded LSH buckets"),
    "doc_ngram_jaccard_capped": ("bounded_candidates", "inverted index, max_df cut"),
    "doc_simhash_pairs": (
        "bounded_candidates",
        "auto-rung pigeonhole bands; residual shuffle = true pairs (output-bound)",
    ),
    "doc_tfidf_cosine_pairs": ("bounded_candidates", "posting-list prefix cut"),
    "doc_winnow_pairs": ("bounded_candidates", "fingerprint inverted index"),
    "embed_srp_ann": ("bounded_candidates", "SRP hamming buckets"),
    "corpus_training_export": ("composite", "clean→split→pack pipeline"),
    "doc_decontaminate": ("broadcast_join", "exchange is eval-side grams only (fixed-size); train side map-only semi-join"),
    "asof_last_purchase": ("keyed_shuffle", "union+window as-of, one exchange on key"),
    "user_scd2_intervals": ("keyed_shuffle", "one sort exchange, then map-shaped intervals"),
    "user_txn_velocity": ("keyed_shuffle", "RANGE frame on one user_id exchange"),
    "session_windows": ("keyed_shuffle", "gap sessionization per user"),
    "orders_cube": ("partial_agg", "cube grouping after partial agg"),
    "salted_category_totals": ("partial_agg", "salted two-stage agg"),
    "warehouse_load": ("composite", "full-prefix rescan (reference contract)"),
    "warehouse_load_incremental": ("composite", "partition-pruned incremental"),
    # round 7
    "multimodal_image_decode": ("map_only", "Arrow decode; payload never shuffles"),
    "asof_last_purchase_bucketed": (
        "keyed_shuffle",
        "(key,bucket) merge + bucket-granular broadcast carry (hot-key split)",
    ),
    "error_burst_window_bucketed": (
        "bounded_candidates",
        "(key,bucket) interval join; pair output inherent, fan-out bounded per bucket",
    ),
    "embed_semantic_dedup": (
        "bounded_candidates",
        "cluster equi-join: pair cost Σ cluster², assignment map-only",
    ),
    "doc_dedup_incremental": (
        "bounded_candidates",
        "(band,key) index probe: delta-side work only, base never re-paired",
    ),
    "doc_decontaminate_bloom": (
        "broadcast_join",
        "fixed 32 KB bitmap broadcast; train probe map-only (exact side is the verification harness)",
    ),
    "vocab_heavy_hitters": (
        "bounded_candidates",
        "MG summaries map-only; recount shuffle keys on <= slots x partitions tokens",
    ),
    "schema_evolution_scan": (
        "map_only",
        "mergeSchema footer merge at planning time; evolved read is a pure scan",
    ),
    "warehouse_compaction": (
        "composite",
        "coalesce rewrite is narrow (no exchange); the read-back scan dominates",
    ),
    "merge_upsert_delete": (
        "keyed_shuffle",
        "one full-outer join on the key; tombstone DELETE is a post-join filter",
    ),
    "fraud_ml_score": (
        "composite",
        "map-only JVM scoring; exact AUC side aggregates to per-score counts first",
    ),
    "embed_semantic_dedup_kmeans": (
        "bounded_candidates",
        "learned cells; within-cell equi-join, Sigma-cell^2 not n^2",
    ),
    "doc_bm25_topk": (
        "bounded_candidates",
        "query vocab broadcasts; tf/dl aggs structural, scoring bounded by matching docs",
    ),
    "doc_bm25_topk_pruned": (
        "bounded_candidates",
        "champion lists: per-query work <= m x |terms|; rescore probe map-side",
    ),
    "doc_mix_token_budget": (
        "keyed_shuffle",
        "one hash exchange on source; quota is a window decision, no joins",
    ),
}


def _fmt(n: float) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if abs(n) < 1024:
            return f"{n:.1f} {unit}" if unit != "B" else f"{int(n)} B"
        n /= 1024
    return f"{n:.1f} TB"


class StageMeter:
    """Diff-based stage metric attribution via the status REST API."""

    FIELDS = (
        "numTasks",
        "inputBytes",
        "inputRecords",
        "shuffleReadBytes",
        "shuffleWriteBytes",
        "shuffleWriteRecords",
        "memoryBytesSpilled",
        "diskBytesSpilled",
    )

    def __init__(self, spark):
        ui = spark.sparkContext.uiWebUrl
        if ui is None:
            # getOrCreate attached to a pre-existing session whose UI is
            # disabled (DEFAULT_CONF turns it off); extra_conf cannot
            # re-enable it after the fact (ADVICE r5 #3).
            raise RuntimeError(
                "shuffle_audit needs a fresh SparkSession with "
                "spark.ui.enabled=true — stop the existing session (or run "
                "this tool in its own process) and retry"
            )
        self._base = f"{ui}/api/v1/applications/{spark.sparkContext.applicationId}"
        self._seen: set[tuple[int, int]] = set()
        self.failed_stages: list[str] = []

    def _stages(self) -> list[dict]:
        with urllib.request.urlopen(f"{self._base}/stages", timeout=30) as r:
            return json.load(r)

    def snapshot(self) -> None:
        self._seen = {(s["stageId"], s["attemptId"]) for s in self._stages()}

    def delta(self) -> dict[str, int]:
        out = dict.fromkeys(self.FIELDS, 0)
        out["stages"] = 0
        for s in self._stages():
            key = (s["stageId"], s["attemptId"])
            if key in self._seen or s.get("status") not in ("COMPLETE", "FAILED"):
                continue
            if s.get("status") == "FAILED":
                # Surface rather than fold into the query's numbers
                # (ADVICE r5 #3: a retried stage would double-count and
                # a genuinely failed one should fail the audit).
                self.failed_stages.append(
                    f"stage {s['stageId']}.{s['attemptId']} ({s.get('name', '?')})"
                )
                continue
            out["stages"] += 1
            for f in self.FIELDS:
                out[f] += int(s.get(f) or 0)
        return out


def main() -> int:
    import time

    argv = list(sys.argv[1:])
    # --out PATH redirects the markdown artifact (scale-curve runs must
    # not clobber the default sf0.1 SHUFFLE_AUDIT.md)
    out_md = os.path.join(_REPO, "SHUFFLE_AUDIT.md")
    if "--out" in argv:
        i = argv.index("--out")
        out_md = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    wanted = set(argv[1:]) or set(HEADLINE)
    spark = get_spark("shuffle_audit", extra_conf={"spark.ui.enabled": "true"})
    meter = StageMeter(spark)

    specs = [s for s in registry() if s.name in wanted]
    rows: list[dict] = []
    for spec in specs:
        if spec.prepare is not None:
            spec.prepare(spark, sf_dir)
        meter.snapshot()
        t0 = time.time()
        spec.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = round(time.time() - t0, 2)
        m = meter.delta()
        tag, why = HEADLINE.get(spec.name, ("", ""))
        rows.append({"name": spec.name, "tag": tag, "why": why, "wall": wall, **m})
        print(
            f"[audit] {spec.name}: in={_fmt(m['inputBytes'])} "
            f"shuffle_w={_fmt(m['shuffleWriteBytes'])} "
            f"spill={_fmt(m['memoryBytesSpilled'] + m['diskBytesSpilled'])}",
            file=sys.stderr,
        )

    violations: list[str] = [
        f"FAILED stage during audit: {s}" for s in meter.failed_stages
    ]
    by_name = {r["name"]: r for r in rows}
    for r in rows:
        if r["tag"] == "map_only" and r["shuffleWriteBytes"] > 0:
            violations.append(
                f"{r['name']}: tagged map_only but wrote "
                f"{_fmt(r['shuffleWriteBytes'])} of shuffle"
            )
        if (
            r["tag"] == "spread_map"
            and r["shuffleWriteRecords"] > r["inputRecords"]
        ):
            violations.append(
                f"{r['name']}: tagged spread_map but shuffled "
                f"{r['shuffleWriteRecords']} records > "
                f"{r['inputRecords']} read — more than the one-pass "
                "round-robin spread can explain"
            )
        if r["diskBytesSpilled"] > 0:
            violations.append(
                f"{r['name']}: spilled {_fmt(r['diskBytesSpilled'])} to disk"
            )
    full, inc = by_name.get("warehouse_load"), by_name.get("warehouse_load_incremental")
    if full and inc and not inc["inputBytes"] < full["inputBytes"]:
        violations.append(
            "warehouse_load_incremental read "
            f"{_fmt(inc['inputBytes'])} ≥ full rescan {_fmt(full['inputBytes'])} "
            "— partition pruning not reaching the scan"
        )

    lines = [
        "# Shuffle audit — measured bytes moved per headline query",
        "",
        f"SF dir: `{sf_dir}`. Aggregate task metrics per query (status REST",
        "API, stage-diff attribution; AQE on). `shufRec/inRec` is shuffle",
        "records written as a fraction of input records read — the",
        "encoding-independent number that predicts 100 TB cost (exchanges,",
        "not scans, are the scale bottleneck; byte ratios mislead here",
        "because parquet input is snappy-compressed columnar while shuffle",
        "blocks are row-oriented, so a full-row exchange can show more",
        "bytes than a tiny compressed scan). A record ratio ≤1 means the",
        "exchange carries no more rows than were read; well under 1 means",
        "map-side reduction is doing its job. Ratios >1 appear only on",
        "`bounded_candidates`/`composite` text-dedup queries, where the",
        "exchange unit is index POSTINGS (shingles/fingerprints/terms),",
        "not documents — fan-out per doc is bounded by construction",
        "(shingle count × max_df cut), so the ratio is a constant factor,",
        "not a growth rate. Regenerate with",
        "`python tools/shuffle_audit.py`.",
        "",
        "| query | shape | wall s | input | in rows | shuffle W | shuffle W rows | shufRec/inRec | spill | tasks |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        ratio = (
            f"{r['shuffleWriteRecords'] / r['inputRecords']:.3f}"
            if r["inputRecords"]
            else "—"
        )
        spill = r["memoryBytesSpilled"] + r["diskBytesSpilled"]
        lines.append(
            f"| {r['name']} | {r['tag']} | {r['wall']} | {_fmt(r['inputBytes'])} "
            f"| {r['inputRecords']} "
            f"| {_fmt(r['shuffleWriteBytes'])} | {r['shuffleWriteRecords']} "
            f"| {ratio} | {_fmt(spill)} | {r['numTasks']} |"
        )
    lines += ["", "## Shape notes", ""]
    for r in rows:
        if r["why"]:
            lines.append(f"- **{r['name']}** ({r['tag']}): {r['why']}")
    lines += ["", "## Hard checks", ""]
    if violations:
        lines += [f"- ❌ {v}" for v in violations]
    else:
        lines += [
            "- ✅ every `map_only` query wrote 0 shuffle bytes",
            "- ✅ every `spread_map` query shuffled no more records than it read (round-robin spread only, no row amplification)",
            "- ✅ zero disk spill across all audited queries",
            "- ✅ incremental warehouse load reads strictly less input than the full rescan (partition pruning reaches the scan)",
        ]
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")

    print(
        json.dumps(
            {
                "queries": len(rows),
                "violations": violations,
                "total_input": sum(r["inputBytes"] for r in rows),
                "total_shuffle_write": sum(r["shuffleWriteBytes"] for r in rows),
            }
        )
    )
    spark.stop()
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
