"""Corpus-vocabulary operators: exact heavy hitters in two bounded passes.

Extension surface (SURVEY §7 step 6): vocabulary construction over a
100 TB corpus. The naive plan — explode every token and groupBy — is
one shuffle whose key cardinality is the FULL distinct vocabulary
(billions of keys for web-scale corpora, Zipf tail included), and the
map-side partial agg only absorbs the head. `heavy_hitter_tokens`
replaces it with the Misra–Gries summary (Misra & Gries 1982; merge
rule per Agarwal et al., "Mergeable Summaries", PODS'12):

1. ONE map-only pass: each partition folds its tokens into a k-slot
   summary (an Arrow `mapInPandas` that keeps one dict per PARTITION —
   per-batch exact Counters merged under the MG compression rule, so
   the Python work is C-speed Counter arithmetic, never a per-row UDF
   call). A partition emits at most k candidate rows.
2. Exact recount of the candidate set only: candidates (≤ k ×
   #partitions rows — filter-sized, not corpus-sized) broadcast back;
   the exploded token stream is semi-joined map-side against them, so
   the ONLY corpus-wide shuffle keys on ≤ that many distinct tokens.

Correctness is EXACT, not approximate: MG guarantees any token with
global frequency > N/(k+1) survives pass 1 (undercount across merges
is bounded by N/(k+1), so a dropped token cannot exceed it), and the
recount then applies the exact integer threshold `count · inv > N`.
With slots = inv the guarantee window N/(inv+1) sits strictly below
the emitted threshold N/inv, so the output is the exact heavy-hitter
set — independent of partitioning, row order, and batch size (the
shuffle-partition and local-cluster recerts ride through this), which
is what lets the DuckDB oracle recompute it with a plain GROUP BY ...
HAVING. The threshold is an integer cross-multiply (never a float
fraction) so boundary tokens cannot flip between engines.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smart_fraud_detection_data_pipeline_spark.operators.skew import spread_input


def heavy_hitter_tokens(
    df: DataFrame,
    *,
    text_col: str = "text",
    inv_threshold: int = 64,
    slots: int | None = None,
) -> DataFrame:
    """All tokens occurring more than N/inv_threshold times across the
    corpus (N = total token occurrences, NULL-text docs excluded), with
    exact counts: (token, n_occurrences).

    ``slots`` (default = inv_threshold) sizes the per-partition summary;
    any value >= inv_threshold preserves exactness, larger values only
    shrink pass-1 undercount (irrelevant here — pass 2 recounts).

    Tokenization is whitespace split of trim(lower(text)) — the same
    scheme as `vocab_top_ngrams`, so an empty-after-trim document
    contributes a single '' token on both engines.
    """
    if slots is None:
        slots = inv_threshold
    if slots < inv_threshold:
        raise ValueError(
            "slots < inv_threshold would break the Misra-Gries guarantee "
            f"(need > N/{inv_threshold} to survive, summary only keeps "
            f"> N/{slots + 1})"
        )
    toks = df.where(F.col(text_col).isNotNull()).select(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__toks")
    )

    k = slots  # close over plain ints only (cloudpickle by-value)

    def mg_summaries(batches: Iterator) -> Iterator:  # pragma: no cover
        # One Misra-Gries dict per PARTITION: mapInPandas hands every
        # Arrow batch of the partition through this single iterator.
        # Per batch: exact Counter (C-speed), then the mergeable-MG
        # compression — subtract the (k+1)-th largest count from all
        # entries and drop the non-positive ones. Undercount per
        # compression is bounded by what pigeonhole allows, summing to
        # <= n_p/(k+1) over the partition.
        import collections

        import numpy as np
        import pandas as pd

        state: collections.Counter = collections.Counter()
        for batch in batches:
            if len(batch) == 0:
                continue
            # One vectorized count per Arrow batch (np.concatenate +
            # value_counts are C loops; a per-row Counter.update was
            # measured 4x slower on a 5M-token partition).
            counts = pd.Series(
                np.concatenate(list(batch["__toks"]))
            ).value_counts()
            state.update(counts.to_dict())
            if len(state) > k:
                kth = sorted(state.values(), reverse=True)[k]
                state = collections.Counter(
                    {t: c - kth for t, c in state.items() if c > kth}
                )
        yield pd.DataFrame({"token": list(state.keys())})

    candidates = (
        toks.mapInPandas(mg_summaries, "token string").distinct()
    )
    totals = toks.agg(
        F.sum(F.size("__toks")).cast("bigint").alias("__n")
    ).withColumn("__n", F.coalesce(F.col("__n"), F.lit(0)))
    return (
        toks.select(F.explode("__toks").alias("token"))
        .join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(totals))
        .where(F.col("n_occurrences") * inv_threshold > F.col("__n"))
        .select("token", "n_occurrences")
    )


# --- Count-Min sketch — round 11 ---------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_bucket(token, row, width: int):
    """Row-salted md5 bucket: 'cms<r>:<token>' → first 8 hex digits →
    int mod width. md5 is the one cross-engine hash (CLAUDE.md), and
    both operands are non-negative so Spark pmod == DuckDB %."""
    digest = F.md5(
        F.concat(F.lit("cms"), row.cast("string"), F.lit(":"), token)
    )
    return F.pmod(
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint"), F.lit(width)
    )


def cms_token_estimates(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    probe_mod: int = 97,
    broadcast_limit: int = 1_000_000,
) -> DataFrame:
    """Count-Min sketch token-frequency estimation (Cormode &
    Muthukrishnan 2005, J. Algorithms — the classic mergeable
    frequency sketch) with the exact side attached, per the self-check
    pattern: the sketch is depth×width integer counters (bucket =
    row-salted md5, fully deterministic — no RNG state), built in ONE
    partial-aggregated pass whose exchange carries at most depth×width
    keys regardless of corpus size; a probe vocabulary (distinct
    tokens of every ``probe_mod``-th document, the bm25 sampling
    convention) is estimated via min-over-rows and recounted exactly
    (probe-restricted semi-join recount, the heavy-hitters pass-2
    shape). Output per probe token: (token, est_count, exact_count,
    overcount_ok) where overcount_ok pins CMS's HARD guarantee — an
    estimate can never undercount (every occurrence lands in every
    row's counted bucket). Everything is integer-exact and
    deterministic, so this is a FULL hash gate: the oracle recomputes
    the sketch itself, not just the exact side — unlike HLL, where
    the estimator is engine-internal and only a two-tier contract can
    face the gate.

    Tokenization matches heavy_hitter_tokens (trim(lower), whitespace
    split, '' for empty-after-trim docs; NULL text excluded). At
    100 TB the sketch is the point: a 4×1024 int64 grid (32 KB)
    absorbs any token stream with one tiny exchange, merges
    associatively across partitions/days, and answers point queries
    without ever shuffling on the unbounded vocabulary.

    The probe broadcast is GUARDED (VERDICT r11 #4, the
    `repeated_passages` pattern at textdedup.py): the probe vocabulary
    grows with the corpus (Heaps-law sublinear but unbounded), so it is
    localCheckpoint-ed (eager materialize — three consumers anyway),
    counted once, and above ``broadcast_limit`` rows the semi-join and
    the estimate probe fall back to shuffle joins on the token key
    instead of a driver-side OOM. Same output either way."""
    # spread an under-split scan first: three consumers (sketch, probe,
    # exact recount) each re-derive the token stream from the scan, so a
    # single-split file serializes 3× the tokenize+md5 work (no-op at
    # production split counts)
    toks = spread_input(
        df.where(F.col(text_col).isNotNull()).select(F.col(id_col), F.col(text_col))
    ).select(
        F.col(id_col),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("token"),
    )
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r")
    sketch = (
        toks.select("token", rows)
        .select("r", _cms_bucket(F.col("token"), F.col("r"), width).alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probe = (
        toks.where(F.col(id_col) % probe_mod == 0)
        .select("token")
        .distinct()
        .localCheckpoint()
    )
    probe_b = F.broadcast(probe) if probe.count() <= broadcast_limit else probe
    exact = (
        toks.join(probe_b, "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    pb = probe.select("token", rows).select(
        "token", "r", _cms_bucket(F.col("token"), F.col("r"), width).alias("bucket")
    )
    est = (
        pb.join(F.broadcast(sketch), ["r", "bucket"])
        .groupBy("token")
        .agg(F.min("cnt").alias("est_count"))
    )
    return est.join(exact, "token").select(
        "token",
        "est_count",
        "exact_count",
        (F.col("est_count") >= F.col("exact_count")).alias("overcount_ok"),
    )


# --- BPE merge learning — round 9 --------------------------------------------

#: Unit separator framing for BPE symbol sequences: every symbol is
#: individually bracketed ("\x1fsym\x1f" joined back to back), so a
#: merge of pair (l, r) is ONE string replace of "\x1fl\x1f\x1fr\x1f"
#: with "\x1flr\x1f" — and both Spark's and DuckDB's replace() scan
#: left-to-right non-overlapping, which is exactly BPE's greedy
#: within-word merge order (verified identical on the aaa/(a,a) overlap
#: and abab/(a,b) adjacent cases). Words containing the separator byte
#: are excluded on both engines (the encoding fence).
BPE_SEP = "\x1f"


def bpe_learn_merges(
    df: DataFrame,
    *,
    n_merges: int = 8,
    text_col: str = "text",
    resident: bool | None = None,
) -> DataFrame:
    """Learn byte-pair-encoding merges from the corpus — the REAL
    tokenizer-training step (Sennrich et al. 2016, "Neural Machine
    Translation of Rare Words with Subword Units", ACL — public arXiv
    1508.07909), not the regex approximation in textstats.subtoken
    count. Classic word-level BPE: build the (word, count) VOCAB once,
    start from character sequences, then repeatedly merge the most
    frequent adjacent symbol pair (count DESC, then lexicographic
    (left, right) — a total order on integer counts and binary-collated
    strings, so the learned merges are deterministic and engine-exact).

    Output: one row per learned merge, (rank, left, right, pair_count)
    — stops early when no pair remains (single-char vocab). The DuckDB
    twin recomputes all of it from the table via n_merges generated
    CTE stages (queries.py::_bpe_oracle_sql), making this a FULL hash
    gate with zero floats anywhere.

    Scale shape: the corpus is scanned ONCE (token explode → word
    counts, the only corpus-wide shuffle); the merge loop then runs on
    the distinct-word vocab (Heaps' law: ≪ corpus) — DRIVER-RESIDENT
    with incremental pair counts by default (round 10: thousands of
    merges/sec, the shape a production 32k-merge train needs), or as
    per-merge Spark jobs when the vocab outgrows one machine. Both
    paths emit bit-identical tables — see bpe_merge_list.
    """
    spark = df.sparkSession
    out_schema = "rank int, left string, right string, pair_count bigint"
    return spark.createDataFrame(
        bpe_merge_list(
            df, n_merges=n_merges, text_col=text_col, resident=resident
        ),
        out_schema,
    )


def bpe_merge_list(
    df: DataFrame,
    *,
    n_merges: int = 8,
    text_col: str = "text",
    resident: bool | None = None,
    resident_max_vocab: int = 2_000_000,
) -> list[tuple[int, str, str, int]]:
    """The bpe_learn_merges loop, returning the merges as driver-side
    tuples (rank, left, right, pair_count) — the form bpe_apply embeds
    as replace literals.

    Two executions of the SAME algorithm (VERDICT r9 #2):

    - resident (the default whenever the distinct-word vocab fits
      `resident_max_vocab` rows): ONE corpus scan builds the (word,
      count) vocab, one bounded collect brings it to the driver (Heaps'
      law: the vocab is ≪ the corpus — sf0.1's 60k docs hold ~247k
      distinct words), and the merge loop runs in-process with
      incrementally-maintained pair counts. This is how a production
      32k-merge train must run: the distributed loop's ~0.8 s/merge
      fixed job latency would cost ~7 hours of driver time at 32k
      merges, while the resident loop is measured in merges/SECOND
      (SCALING.md §bpe). Equality with the distributed form is pinned
      at 8 and 256 merges in tests/test_textops.py.
    - distributed (resident=False, or auto when the vocab outgrows the
      cap): the round-9 loop — per merge, one tiny Spark job over the
      localCheckpoint-ed vocab frame plus a 1-row collect. Keeps BPE
      learnable even when the vocab itself cannot fit one machine
      (unbounded token universes, e.g. byte-noise corpora).

    Both paths order pairs by (count DESC, left ASC, right ASC) with
    binary collation — Python's code-point compare and Spark's UTF8
    binary compare induce the same total order (UTF-8 is
    order-preserving), so the learned tables are bit-identical and the
    oracle's chained-CTE re-learn gates whichever path ran."""
    sep = BPE_SEP
    words = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.explode(
                F.split(F.trim(F.col(text_col)), r"\s+")
            ).alias("word")
        )
        .where((F.col("word") != "") & ~F.col("word").contains(sep))
    )
    wc = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # The distinct-word vocab is tiny next to the corpus (Heaps'
        # law), but the distributed loop launches a job over it per
        # merge — at 32 shuffle partitions that is 32 tasks per
        # iteration of pure scheduling overhead (measured 7.2 s ->
        # 3.4 s at sf0.1 from this coalesce). One partition is right
        # up to multi-million-word vocabularies; shard again if a
        # production vocab outgrows an executor.
        .coalesce(1)
        .localCheckpoint()  # the loop(s) re-read this tiny frame
    )
    if resident is None:
        resident = wc.count() <= resident_max_vocab
    if resident:
        pairs = [(r["word"], int(r["cnt"])) for r in wc.collect()]
        return _bpe_resident_merges(pairs, n_merges)
    vocab = wc.select(
        "cnt",
        F.expr(
            "concat(char(31), array_join(transform("
            "sequence(1, char_length(word)), "
            "i -> substring(word, i, 1)), char(31) || char(31)), char(31))"
        ).alias("seq"),
    ).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        # Stage the split array as a projected attribute BEFORE the
        # indexing lambda (the CLAUDE.md HOF rule: an outer-array
        # expression indexed inside transform() re-evaluates per
        # element otherwise). The guard matters on both engines:
        # Spark's sequence(1, 0) is DESCENDING [1, 0], not empty, so a
        # single-symbol word would fabricate a bogus pair.
        staged = vocab.select(
            "cnt",
            F.expr(
                "split(substring(seq, 2, char_length(seq) - 2), "
                "char(31) || char(31))"
            ).alias("syms"),
        )
        pairs = staged.select(
            "cnt",
            F.explode(
                F.expr(
                    "CASE WHEN size(syms) >= 2 THEN "
                    "transform(sequence(1, size(syms) - 1), "
                    "i -> struct(syms[i - 1] AS l, syms[i] AS r)) "
                    "ELSE array() END"
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("total"))
            .orderBy(F.desc("total"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, total = best[0].l, best[0].r, int(best[0].total)
        merges.append((rank, l, r, total))
        pat = F.lit(sep + l + sep + sep + r + sep)
        rep = F.lit(sep + l + r + sep)
        # re-checkpoint per iteration: without it the replace chain
        # grows the lineage and every iteration re-analyzes a deeper
        # plan (driver time, not executor time)
        vocab = vocab.select(
            "cnt", F.replace(F.col("seq"), pat, rep).alias("seq")
        ).localCheckpoint()
    return merges


def _bpe_resident_merges(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """The driver-resident merge loop: the textbook Sennrich et al.
    incremental form. Pair counts are maintained, not recounted — a
    merge touches only the words that contain its pair (pair_words is
    a SUPERSET index: words are added when they gain a pair and lazily
    skipped once they no longer hold it, so bookkeeping stays O(touched
    words) per merge). Symbol rewriting is the same left-to-right
    non-overlapping greedy pass as the distributed form's framed
    string replace (positionally identical on aaa/(a,a) overlap and
    abab adjacency — see BPE_SEP), and pair selection uses the same
    (count DESC, left, right) total order, so the two paths emit
    bit-identical merge tables.

    Selection is a LAZY MAX-HEAP (round 11, VERDICT r10 #6): the r10
    loop re-scanned every pair count per merge — O(|pairs|) selection
    dominated on pathological uniform-random vocabularies where merges
    touch few words (12–23 merges/s at 200k words). Heap entries are
    (-count, left, right) so heapq's min order IS the selection order;
    a pair's entry is re-pushed only when its count settles after a
    merge (one push per touched pair, not per intermediate +/-), and
    pops discard entries whose count no longer matches the live table
    — the standard stale-entry scheme, exact because every live
    (pair, count) state was pushed when it was reached, so the true
    maximum is always present. The heap is rebuilt from the live table
    whenever stale entries outnumber it 4:1, bounding memory at
    O(|pairs|). Per-merge cost is now O(touched words · word length +
    touched pairs · log |pairs|) with no O(|vocab|) or O(|pairs|)
    term; measured worst-case throughput in SCALING.md §round-11."""
    import heapq
    from collections import Counter, defaultdict

    words: list[list[str]] = [list(w) for w, _ in word_counts]
    counts: list[int] = [c for _, c in word_counts]
    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for idx, syms in enumerate(words):
        c = counts[idx]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] += c
            pair_words[p].add(idx)
    heap: list[tuple[int, str, str]] = [
        (-c, l, r) for (l, r), c in pair_counts.items()
    ]
    heapq.heapify(heap)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        # pop to the first LIVE entry (count still matches the table)
        while heap:
            negc, left, right = heap[0]
            if pair_counts.get((left, right)) == -negc:
                break
            heapq.heappop(heap)
        if not heap:
            break
        negc, left, right = heapq.heappop(heap)
        total = -negc
        merges.append((rank, left, right, int(total)))
        merged = left + right
        touched: set[tuple[str, str]] = set()
        for idx in pair_words.pop((left, right), ()):  # superset index
            syms = words[idx]
            c = counts[idx]
            # subtract the word's CURRENT pairs (exact: stale index
            # members simply subtract and re-add the same multiset)
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] -= c
                touched.add(p)
                if pair_counts[p] <= 0:
                    del pair_counts[p]
            out: list[str] = []
            i = 0
            n = len(syms)
            while i < n:
                if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[idx] = out
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                pair_counts[p] += c
                pair_words[p].add(idx)
                touched.add(p)
        for p in touched:
            c2 = pair_counts.get(p)
            if c2 is not None:
                heapq.heappush(heap, (-c2, p[0], p[1]))
        if len(heap) > 4 * len(pair_counts) + 64:
            heap = [(-c2, l2, r2) for (l2, r2), c2 in pair_counts.items()]
            heapq.heapify(heap)
    return merges


def bpe_vocabulary(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    *,
    text_col: str = "text",
) -> DataFrame:
    """The final token VOCABULARY a learned tokenizer ships alongside
    its merge table (round 10): apply the merges to the word vocab and
    count every surviving symbol's corpus occurrences — (token,
    n_occurrences). This is the artifact that sizes the embedding
    matrix and drives id assignment; its long tail is also the
    standard diagnostic for under-trained merges.

    Same exclusions as the learner (NULL text, empty words, separator
    bytes); zero floats, so a FULL hash gate — the oracle re-learns
    the merges through the shared CTE chain and re-splits the final
    vocab stage. Scale shape: one corpus scan for word counts (the
    only corpus-wide shuffle), then everything runs on the Heaps'-law
    word vocab; the token explode fans out by symbols-per-word and
    regroups on the (small) token space."""
    sep = BPE_SEP
    words = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
        )
        .where((F.col("word") != "") & ~F.col("word").contains(sep))
    )
    framed = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt")).select(
        "cnt",
        F.expr(
            "concat(char(31), array_join(transform("
            "sequence(1, char_length(word)), "
            "i -> substring(word, i, 1)), char(31) || char(31)), char(31))"
        ).alias("seq"),
    )
    seq = F.col("seq")
    for _rank, l, r, _total in merges:
        seq = F.replace(
            seq, F.lit(sep + l + sep + sep + r + sep), F.lit(sep + l + r + sep)
        )
    # stage the merged seq, then the split array, each as a projected
    # attribute (the staged-HOF rule) before the explode
    staged = framed.select("cnt", seq.alias("seq")).select(
        "cnt",
        F.split(
            F.expr("substring(seq, 2, char_length(seq) - 2)"),
            sep + sep,
        ).alias("syms"),
    )
    return (
        staged.select("cnt", F.explode("syms").alias("token"))
        .groupBy("token")
        .agg(F.sum("cnt").cast("bigint").alias("n_occurrences"))
    )


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents with LEARNED BPE merges — the inference half
    of the tokenizer (bpe_merge_list is the training half): per word,
    start from the sentinel-framed character sequence and apply every
    merge in rank order as one left-to-right string replace (greedy
    within-word order, identical on both engines — see BPE_SEP). Emits
    per-document token statistics plus an md5 DIGEST of the full framed
    token stream (words joined by chr(30) in document order), so a
    wrong merge order, a boundary leak across words, or an off-by-one
    in the framing flips the digest and fails the hash gate.

    Exclusions mirror the learner: NULL text at entry, empty words and
    words containing the separator byte; documents left with zero
    valid words disappear on BOTH engines (the degenerate-input rule).

    Scale shape: one corpus scan — posexplode words, frame + chained
    replaces as a single map-side projection (the merge table is a
    driver literal; production vocabularies embed it as a broadcast
    join or a pandas UDF over a trie instead of n chained replaces,
    same one-scan shape), then one per-doc aggregation whose collect
    fold is ordered by word position (array_sort before join — the
    collect+sort rule)."""
    sep = BPE_SEP
    # the chained per-word replaces below run map-side straight off the
    # scan; spread an under-split input first (no-op at production)
    words = (
        spread_input(
            df.where(F.col(text_col).isNotNull()).select(
                F.col(id_col), F.col(text_col)
            )
        )
        .select(
            F.col(id_col),
            F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
                "pos", "word"
            ),
        )
        .where((F.col("word") != "") & ~F.col("word").contains(sep))
    )
    framed = words.select(
        id_col,
        "pos",
        F.char_length("word").alias("wlen"),
        F.expr(
            "concat(char(31), array_join(transform("
            "sequence(1, char_length(word)), "
            "i -> substring(word, i, 1)), char(31) || char(31)), char(31))"
        ).alias("seq"),
    )
    seq = F.col("seq")
    for _rank, l, r, _total in merges:
        seq = F.replace(
            seq, F.lit(sep + l + sep + sep + r + sep), F.lit(sep + l + r + sep)
        )
    tokenized = framed.select(
        id_col,
        "pos",
        "wlen",
        seq.alias("seq"),
    ).select(
        id_col,
        "pos",
        "wlen",
        "seq",
        (
            (F.char_length("seq") - F.char_length(F.replace("seq", F.lit(sep))))
            / 2
        )
        .cast("bigint")
        .alias("n_toks"),
    )
    return tokenized.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_toks").alias("n_tokens"),
        F.sum("wlen").cast("bigint").alias("n_chars"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "seq"))),
                    lambda s: s.seq,
                ),
                "\x1e",
            )
        ).alias("token_digest"),
    )
