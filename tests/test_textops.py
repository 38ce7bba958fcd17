"""Tests for text dedup (exact/Jaccard/MinHash/SimHash) and text analysis."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from smart_fraud_detection_data_pipeline_spark.operators import textdedup as TD
from smart_fraud_detection_data_pipeline_spark.operators import textstats as TS


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=2, text="the quick brown fox jumps over the lazy cat"),  # near dup of 1
            Row(doc_id=3, text="the  quick brown fox jumps over the lazy dog"),  # dup of 1 modulo whitespace
            Row(doc_id=4, text="completely different words about spark engines here"),
        ]
    )


def test_exact_dup_groups(spark):
    out = TD.exact_dup_groups(_docs(spark)).collect()
    groups = {r.canonical_id: r.n_docs for r in out}
    assert groups[1] == 2  # docs 1+3 normalize to the same text
    assert groups[2] == 1 and groups[4] == 1
    assert len(out) == 3


def test_ngram_jaccard_pairs(spark):
    out = TD.ngram_jaccard_pairs(_docs(spark), threshold=0.3).collect()
    pairs = {(r.id_a, r.id_b): r.jaccard for r in out}
    assert (1, 3) in pairs and pairs[(1, 3)] == 1.0  # identical shingle sets
    assert (1, 2) in pairs and 0.3 <= pairs[(1, 2)] < 1.0
    assert (1, 4) not in pairs


def test_ngram_jaccard_max_df_bounds_fanout(spark):
    """The max_df cut must bound per-shingle pair fan-out at C(max_df, 2):
    a stopword shingle shared by every doc generates ZERO pairs instead of
    C(n_docs, 2) (the 100 TB scale-killer, VERDICT r1 #2)."""
    n_docs, max_df = 40, 5
    # every doc contains the same stopword trigram; each doc also has a
    # unique tail so docs are otherwise dissimilar
    rows = [
        Row(doc_id=i, text=f"the quick fox u{i}a u{i}b u{i}c") for i in range(n_docs)
    ]
    df = spark.createDataFrame(rows)

    # uncapped: the hot shingle alone links every doc pair
    uncapped = TD.ngram_jaccard_pairs(df, threshold=0.0)
    assert uncapped.count() == n_docs * (n_docs - 1) // 2

    # capped: hot shingles (df > max_df) leave the index entirely, so no
    # pair is generated through them — fan-out collapses to zero here
    capped = TD.ngram_jaccard_pairs(df, threshold=0.0, max_df=max_df)
    assert capped.count() == 0

    # the index itself is bounded: no surviving shingle has df > max_df
    idx = TD.shingle_index(df, max_df=max_df)
    assert idx.groupBy("shingle").count().agg(F.max("count")).first()[0] is None or \
        idx.groupBy("shingle").count().agg(F.max("count")).first()[0] <= max_df


def test_minhash_pairs_subset_of_exact(spark, sf_dir):
    from smart_fraud_detection_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.id_a, r.id_b) for r in TD.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    lsh = {(r.id_a, r.id_b) for r in TD.minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert lsh <= exact  # verification guarantees no false positives
    if exact:
        assert len(lsh) / len(exact) >= 0.5  # banded LSH recall on near-dups


def test_simhash_deterministic_and_sensitive(spark):
    df = _docs(spark).select("doc_id", TD.simhash(F.col("text")).alias("h"))
    h = {r.doc_id: r.h for r in df.collect()}
    h2 = {r.doc_id: r.h for r in df.collect()}
    assert h == h2  # same plan, same hashes
    assert h[1] != h[4]  # different docs differ
    # near-dups land close in hamming space
    ham = bin(h[1] ^ h[2]).count("1")
    assert ham <= 20


def test_simhash_pairs_finds_near_dup(spark):
    out = TD.simhash_pairs(_docs(spark), max_hamming=20).collect()
    pairs = {(r.id_a, r.id_b) for r in out}
    assert (1, 3) in pairs  # exact dup → hamming 0 (after normalize-free hash of same tokens)


def test_lang_id_and_quality(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat and the dog of a house"),
            Row(doc_id=2, text="der hund und die katze ist ein tier"),
            Row(doc_id=3, text="xyzzy plugh foobar"),
            Row(doc_id=4, text=""),
        ]
    )
    out = {r.doc_id: r for r in TS.text_profile(df).collect()}
    assert out[1].lang_pred == "en"
    assert out[2].lang_pred == "de"
    assert out[3].lang_pred == "unknown"
    assert out[1].stopword_ratio > 0.3
    assert 0.0 <= out[1].quality_score <= 1.0
    assert out[3].punct_ratio == 0.0


def test_fingerprint_stability(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="abcdefghij"), Row(doc_id=2, text="abcdefghij"), Row(doc_id=3, text="short")]
    )
    out = {r.doc_id: r.f for r in df.select("doc_id", TS.fingerprint(F.col("text")).alias("f")).collect()}
    assert out[1] == out[2]  # same text → same fingerprint
    assert len(out[3]) == 32  # <8 chars falls back to md5(text)


def test_minhash_signatures_shape_and_determinism(spark):
    df = _docs(spark)
    s1 = TD.minhash_signatures(df, num_perm=6)
    assert s1.columns == ["doc_id"] + [f"sig_{i}" for i in range(6)]
    r1 = {tuple(r) for r in s1.collect()}
    r2 = {tuple(r) for r in TD.minhash_signatures(df, num_perm=6).collect()}
    assert r1 == r2  # md5-salted permutations are stateless
    # identical docs (modulo whitespace) share identical signatures
    rows = {r.doc_id: tuple(r)[1:] for r in s1.collect()}
    assert rows[1] == rows[3]


def test_shingle_index_counts(spark):
    df = _docs(spark)
    idx = TD.shingle_index(df)
    from pyspark.sql import functions as F2

    sizes = df.select(F2.size(TD.shingles(F2.col("text"))).alias("n")).collect()
    assert idx.count() == sum(r.n for r in sizes)
    # max_df cut removes shingles shared by all near-dup docs
    cut = TD.shingle_index(df, max_df=1)
    assert cut.count() < idx.count()


def test_ppjoin_matches_count_and_prefix_methods(spark, sf_dir):
    """The PPJoin positional filter is a pure candidate PRUNE: results
    must equal the exact count-based and prefix-filter methods
    pair-for-pair on the real corpus."""
    from smart_fraud_detection_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")

    def pairs(method):
        return {
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in TD.ngram_jaccard_pairs(
                docs, threshold=0.5, method=method
            ).collect()
        }

    count_pairs = pairs("count")
    assert count_pairs  # corpus has planted near-dups
    assert pairs("ppjoin") == count_pairs
    assert pairs("prefix") == count_pairs


def test_ppjoin_positional_bound_is_safe_on_edge_pairs(spark):
    """Pairs exactly AT the threshold must survive the positional prune
    (the bound is an upper bound, never an excluder of true matches)."""
    rows = [
        # docs sharing exactly half their 3-gram shingles (jaccard ~0.5 area)
        Row(doc_id=1, text="a b c d e f g h"),
        Row(doc_id=2, text="a b c d e x y z"),
        Row(doc_id=3, text="p q r s t u v w"),
    ]
    df = spark.createDataFrame(rows)
    for method in ("count", "ppjoin"):
        got = {
            (r.id_a, r.id_b)
            for r in TD.ngram_jaccard_pairs(df, threshold=0.3, method=method).collect()
        }
        assert got == {(1, 2)}


def test_bigram_coverage_short_docs(spark, tmp_path):
    """ADVICE r3: a <=1-token doc must emit zero bigrams (DuckDB
    generate_series(1,0) is empty) — not throw INVALID_ARRAY_INDEX from
    Spark's DESCENDING sequence(1, 0). Runs the registered query AND its
    oracle on a fixture that contains exactly those docs."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entrymod
    from tools.oracle_check import compare

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["single", "   ", "two tokens", "three little tokens"],
            "lang": ["en"] * 4,
            "source": ["fixture"] * 4,
            "n_chars": [6, 3, 10, 19],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    name = "doc_bigram_coverage"
    sdf = entrymod.queries()[name](spark, str(tmp_path)).toPandas()
    assert set(sdf.doc_id) == {3, 4}  # 0/1-token docs dropped, no crash
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'")
    odf = con.sql(entrymod.oracle_sql()[name]).df()
    con.close()
    assert not compare(sdf, odf)


def test_winnow_guarantee_and_pairs(spark):
    """Winnowing contract (Schleimer et al. '03): two docs sharing a
    substring of length >= k + w - 1 MUST share a fingerprint; docs with
    no k-char common substring must not pair."""
    from pyspark.sql import Row

    shared = "0123456789abcdefghijklmnopqrstuvwxyzABCD"  # 40 chars >= k+w-1=35
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="left context totally unlike. " + shared),
            Row(doc_id=2, text=shared + " trailing words that differ entirely."),
            Row(doc_id=3, text="no overlap with the other documents at all, none."),
        ]
    )
    out = TD.winnow_pairs(docs, k=24, w=12, min_shared=1).collect()
    pairs = {(r.doc_a, r.doc_b) for r in out}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_winnow_selection_properties(spark):
    """Every selected fingerprint is a real k-gram hash; selection is
    deterministic; count is bounded by the window count."""
    docs = _docs(spark)
    hashed = docs.select("doc_id", TS.kgram_hashes(F.col("text"), 8).alias("h"))
    sel = hashed.select(
        "doc_id", F.col("h"), TS.winnow(F.col("h"), 4).alias("fps")
    ).collect()
    for r in sel:
        assert len(r.fps) == len(set(r.fps))  # distinct
        assert set(r.fps) <= set(r.h)  # selections come from the gram hashes
        assert 1 <= len(r.fps) <= max(len(r.h) - 3, 1)
    again = hashed.select(TS.winnow(F.col("h"), 4).alias("fps")).collect()
    assert [r.fps for r in again] == [r.fps for r in sel]


def test_tfidf_cosine_pairs_semantics(spark):
    """Identical docs must score cosine 1.0; docs sharing no token must
    not pair at all (posting lists never emit them); near-dups land in
    between and above the threshold."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma delta"),
            Row(doc_id=2, text="alpha beta gamma delta"),      # exact dup of 1
            Row(doc_id=3, text="alpha beta gamma epsilon"),    # near dup
            Row(doc_id=4, text="zeta eta theta iota"),         # disjoint
        ]
    )
    out = {(r.doc_a, r.doc_b): r.cosine_sim
           for r in TD.tfidf_cosine_pairs(docs, max_df=10, threshold=0.1).collect()}
    assert out[(1, 2)] == 1.0
    assert 0.1 <= out[(1, 3)] < 1.0 and out[(1, 3)] == out[(2, 3)]
    assert all(4 not in p for p in out)


def test_incremental_dedup_contract(spark):
    """Incremental admit/reject against a base index: a delta doc that
    near-dups a base doc is rejected with dup_of = that base id; a
    delta doc that near-dups only a LATER delta doc survives while the
    later one is rejected against it; base docs never appear in the
    output; NULL-text and NULL-id delta docs are excluded."""
    base = spark.createDataFrame(
        [
            Row(doc_id=10, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=20, text="entirely unrelated base content about spark engines"),
            Row(doc_id=None, text="the quick brown fox jumps over the lazy dog"),
        ]
    )
    delta = spark.createDataFrame(
        [
            # exact copy of base 10 -> rejected, dup_of=10
            Row(doc_id=31, text="the quick brown fox jumps over the lazy dog"),
            # novel -> admitted
            Row(doc_id=32, text="completely fresh delta document with new words"),
            # copy of 32 (a LOWER delta id) -> rejected, dup_of=32
            Row(doc_id=33, text="completely fresh delta document with new words"),
            Row(doc_id=34, text=None),   # NULL text -> excluded
            Row(doc_id=None, text="id-less delta doc"),  # NULL id -> excluded
        ]
    )
    out = TD.incremental_minhash_dedup(base, delta, threshold=0.5)
    got = {r.doc_id: (r.dup_of, r.keep) for r in out.collect()}
    assert set(got) == {31, 32, 33}
    assert got[31] == (10, False)   # base match wins (not the NULL-id copy)
    assert got[32] == (None, True)
    assert got[33] == (32, False)   # earlier-delta match
    assert all((d is None) == k for d, k in got.values())


def test_incremental_dedup_prebuilt_index_and_empty_delta(spark):
    """The prebuilt-index path must equal the build-from-base path (the
    production flow persists the index once), and an empty delta yields
    an empty frame with the output schema."""
    base = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta gamma delta epsilon zeta")]
    )
    delta = spark.createDataFrame(
        [Row(doc_id=2, text="alpha beta gamma delta epsilon zeta")]
    )
    idx = TD.minhash_index(base)
    via_index = TD.incremental_minhash_dedup(None, delta, index=idx)
    via_base = TD.incremental_minhash_dedup(base, delta)
    assert via_index.collect() == via_base.collect()
    empty = delta.limit(0)
    out = TD.incremental_minhash_dedup(base, empty)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["doc_id", "dup_of", "keep"]


def test_minhash_index_compaction_forgets(spark):
    """Tombstone compaction (VERDICT r8 #4): after retracting a base
    doc, (a) its re-submitted text is admitted as novel, (b) a probe
    doc whose ONLY near-dup was the retracted doc flips from rejected
    to admitted, (c) matches against surviving base docs still reject,
    (d) NULL tombstone ids are inert, and (e) the compacted index holds
    no rows for the retracted id in either leg."""
    base = spark.createDataFrame(
        [
            Row(doc_id=10, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=20, text="entirely unrelated base content about spark engines"),
        ]
    )
    idx = TD.minhash_index(base)
    deletes = spark.createDataFrame(
        [Row(doc_id=10), Row(doc_id=None), Row(doc_id=999)],  # (d): inert NULL + unknown id
        "doc_id bigint",
    )
    compacted = TD.minhash_index_compact(idx, deletes)
    # (e) both legs forget id 10 entirely
    buckets, sets = compacted
    assert buckets.where(F.col("doc_id") == 10).count() == 0
    assert sets.where(F.col("doc_id") == 10).count() == 0
    assert sets.where(F.col("doc_id") == 20).count() == 1
    probe = spark.createDataFrame(
        [
            # (a) the retracted text itself, re-submitted under its old id
            Row(doc_id=10, text="the quick brown fox jumps over the lazy dog"),
            # (b) near-dup of ONLY the retracted doc -> admitted now...
            Row(doc_id=31, text="the quick brown fox jumps over the lazy dog"),
            # (c) ...while a copy of the SURVIVING doc still rejects
            Row(doc_id=32, text="entirely unrelated base content about spark engines"),
        ]
    )
    out = TD.incremental_minhash_dedup(None, probe, index=compacted)
    got = {r.doc_id: (r.dup_of, r.keep) for r in out.collect()}
    assert got[10] == (None, True)    # (a) forgotten -> novel
    assert got[31] == (10, False)     # (b) within-probe match to the lower id
    assert got[32] == (20, False)     # (c) surviving index entry still bites
    # and against the UNCOMPACTED index both 10-alikes reject
    pre = {
        r.doc_id: r.keep
        for r in TD.incremental_minhash_dedup(
            None, probe.where(F.col("doc_id") != 10), index=idx
        ).collect()
    }
    assert pre[31] is False


def test_bloom_contamination_no_false_negatives(spark):
    """The Bloom decontamination flag must catch EVERY train doc that
    exactly shares a gram with the eval corpus (false negatives are
    impossible by construction — this pins the bit build/probe pair),
    and at 2^18 bits / a handful of eval grams the false-positive
    probability is ~1e-16, so the disjoint doc must stay unflagged."""
    train = _docs(spark)  # docs 1-3 share 3-grams; doc 4 is disjoint
    eval_df = spark.createDataFrame(
        [Row(doc_id=100, text="the quick brown fox jumps over the lazy dog")]
    )
    out = {r.doc_id: r for r in TD.bloom_contamination_flags(train, eval_df).collect()}
    exact = {
        r["doc_id"]: r.n_hit > 0
        for r in TD.cross_corpus_containment(eval_df, train).collect()
    }
    assert exact[1] and exact[2] and exact[3] and not exact[4]
    for doc_id, hit in exact.items():
        if hit:
            assert out[doc_id].bloom_hit, f"false negative on doc {doc_id}"
    assert not out[4].bloom_hit
    assert out[1].n_grams == 7  # 9 tokens -> 7 distinct 3-grams


def test_bloom_contamination_empty_eval_and_null_text(spark):
    """An empty eval corpus folds to an all-zero bitmap (flags nothing);
    NULL-text train docs are excluded like every other text op."""
    train = _docs(spark).union(
        spark.createDataFrame([(9, None)], "doc_id bigint, text string")
    )
    empty_eval = _docs(spark).where(F.lit(False))
    out = TD.bloom_contamination_flags(train, empty_eval).collect()
    assert {r.doc_id for r in out} == {1, 2, 3, 4}  # NULL text absent
    assert not any(r.bloom_hit for r in out)


def test_heavy_hitters_exact_and_partition_independent(spark):
    """The Misra-Gries two-pass plan must equal the naive exact groupBy
    under ANY partitioning (the summary is lossy per partition, but the
    recount pass restores exactness) — including a single partition and
    a partition count larger than the row count."""
    from smart_fraud_detection_data_pipeline_spark.operators.vocab import (
        heavy_hitter_tokens,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=("spark " * 5 + f"rare{i} unique{i}")) for i in range(20)]
    )
    naive = (
        docs.select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token")
        )
        .groupBy("token")
        .count()
    )
    n = naive.agg(F.sum("count")).first()[0]
    expected = sorted(
        (r.token, r["count"]) for r in naive.collect() if r["count"] * 8 > n
    )
    for parts in (1, 7, 32):
        got = sorted(
            (r.token, r.n_occurrences)
            for r in heavy_hitter_tokens(
                docs.repartition(parts), inv_threshold=8
            ).collect()
        )
        assert got == expected, f"partitioning {parts} changed the result"
    assert expected and expected[0][0] == "spark"


def test_heavy_hitters_guards_and_empty(spark):
    """slots below the threshold inverse breaks the survival guarantee
    and must be rejected; an all-NULL/empty corpus yields zero rows."""
    import pytest

    from smart_fraud_detection_data_pipeline_spark.operators.vocab import (
        heavy_hitter_tokens,
    )

    docs = spark.createDataFrame([(1, None)], "doc_id bigint, text string")
    assert heavy_hitter_tokens(docs).count() == 0
    assert heavy_hitter_tokens(docs.limit(0)).count() == 0
    with pytest.raises(ValueError):
        heavy_hitter_tokens(docs, inv_threshold=64, slots=32)


def test_cms_token_estimates_guarantee_and_exactness(spark):
    """Round 11: CMS estimates can never undercount (hard one-sided
    guarantee — every occurrence lands in every row's bucket), the
    exact side is a true recount, and at a width far beyond the
    vocabulary the deterministic md5 buckets collide rarely enough
    that most probe estimates are exact. doc 0 (doc_id % 97 == 0)
    defines the probe vocabulary; NULL text is excluded."""
    from smart_fraud_detection_data_pipeline_spark.operators.vocab import (
        cms_token_estimates,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="alpha beta alpha GAMMA"),
            Row(doc_id=1, text="alpha beta beta delta"),
            Row(doc_id=2, text="gamma gamma epsilon"),
            Row(doc_id=3, text=None),
        ]
    )
    out = {r.token: r for r in cms_token_estimates(docs, width=4096).collect()}
    # probe = doc 0's tokens, lowercased
    assert set(out) == {"alpha", "beta", "gamma"}
    assert out["alpha"].exact_count == 3  # 2 in doc0 + 1 in doc1
    assert out["beta"].exact_count == 3
    assert out["gamma"].exact_count == 3  # GAMMA lowered + 2 in doc2
    assert all(r.overcount_ok for r in out.values())
    assert all(r.est_count >= r.exact_count for r in out.values())
    # width 4096 >> vocab: at least one estimate must be collision-free
    assert any(r.est_count == r.exact_count for r in out.values())
    # empty / all-NULL corpus -> empty probe -> empty output
    assert cms_token_estimates(docs.where("doc_id = 3")).count() == 0


def test_repeated_passages_counts_and_short_docs(spark):
    """Passage counts are occurrence-wise (a footer repeated inside one
    doc counts each occurrence), df is distinct-doc-wise, and docs
    shorter than the window contribute their whole token sequence as
    one passage (the shingles convention)."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="common footer text a b c unique1 common footer text a b c"),
            Row(doc_id=2, text="prefix2 common footer text a b c suffix2"),
            Row(doc_id=3, text="tiny doc"),
            Row(doc_id=4, text="tiny doc"),
            Row(doc_id=5, text=None),
        ]
    )
    out = {
        r.passage: (r.n_docs, r.n_occurrences)
        for r in TD.repeated_passages(docs, length=6, min_df=2).collect()
    }
    assert out["common footer text a b c"] == (2, 3)  # twice in doc1, once in doc2
    assert out["tiny doc"] == (2, 2)  # short docs -> whole-sequence passage
    assert all("None" not in p for p in out)  # NULL text excluded


def test_strip_boilerplate_coverage_and_edges(spark):
    """Round 11: token-coverage removal of qualifying passages —
    overlapping windows merge their coverage, untouched docs pass
    through verbatim, a fully-boilerplate doc comes back '', short
    docs are covered by their whole-sequence gram, NULL text excluded."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="keep1 common footer text a b c keep2"),
            Row(doc_id=2, text="common footer text a b c x common footer text a b c"),
            Row(doc_id=3, text="totally unique document body here now"),
            Row(doc_id=4, text="tiny doc"),
            Row(doc_id=5, text="tiny doc"),
            Row(doc_id=6, text=None),
        ]
    )
    out = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in TD.strip_boilerplate(docs, length=6, min_df=2).collect()
    }
    assert out[1] == ("keep1 keep2", 6)
    # doc2: both occurrences covered; 'x' sits inside the overlapping
    # second window ('text a b c x common' does NOT qualify, but the
    # two qualifying 6-grams cover positions 1-6 and 8-13; position 7
    # = 'x' survives)
    assert out[2] == ("x", 12)
    assert out[3] == ("totally unique document body here now", 0)
    assert out[4] == ("", 2) and out[5] == ("", 2)
    assert 6 not in out  # NULL text excluded on entry


def test_repeated_passages_min_df_and_exactness(spark, sf_dir):
    """min_df is a hard exact filter (not a candidate heuristic): raising
    it must produce exactly the subset with n_docs >= the new bar."""
    from smart_fraud_detection_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    at2 = {(r.passage, r.n_docs) for r in TD.repeated_passages(docs, length=8).collect()}
    at3 = {(r.passage, r.n_docs) for r in TD.repeated_passages(docs, length=8, min_df=3).collect()}
    assert at3 == {x for x in at2 if x[1] >= 3}


def _random_corpus(seed, n_docs=40, vocab=30, max_len=30):
    import random

    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    docs = []
    for i in range(n_docs):
        n = rng.randint(1, max_len)
        docs.append((i, " ".join(rng.choice(words) for _ in range(n))))
    return docs


def test_bloom_no_false_negatives_randomized(spark):
    """Property, 3 seeds: on random corpora the Bloom flag must contain
    the exact contamination set EXACTLY (no false negatives, ever) —
    the same invariant the registered contract column gates, checked
    here against a direct Python recompute instead of the oracle."""
    for seed in (11, 23, 47):
        docs = _random_corpus(seed)
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        ev = df.where(F.col("doc_id") % 5 == 0)
        tr = df.where(F.col("doc_id") % 5 != 0)
        got = {r.doc_id: r.bloom_hit for r in TD.bloom_contamination_flags(tr, ev, n=3).collect()}

        def grams(text, n=3):
            t = text.split()
            if len(t) <= n:
                return {" ".join(t)}
            return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}

        ev_grams = set().union(*(grams(t) for i, t in docs if i % 5 == 0))
        for i, t in docs:
            if i % 5 != 0 and grams(t) & ev_grams:
                assert got[i], f"seed {seed}: false negative on doc {i}"


def test_bpe_learn_merges_hand_corpus(spark):
    """BPE learning on a hand corpus with a fully derivable merge
    sequence: 'low' x5 + 'lower' x2 + 'lowest' (classic Sennrich
    example shape). Pair counts over the word VOCAB weighted by word
    frequency: (l,o) and (o,w) both appear in all 8 word occurrences;
    lexicographic tie-break picks (l,o) first, then ('lo','w') merges
    to 'low', etc. Also: early stop when no pairs remain, empty corpus,
    NULL text exclusion, and the separator-byte fence."""
    from smart_fraud_detection_data_pipeline_spark.operators.vocab import (
        bpe_learn_merges,
    )

    docs = spark.createDataFrame(
        [(1, "low low low low low"), (2, "lower lower"), (3, "lowest"),
         (4, None)],
        "doc_id bigint, text string",
    )
    out = bpe_learn_merges(docs, n_merges=4).collect()
    got = [(r.rank, r.left, r.right, r.pair_count) for r in out]
    # counts: (l,o)=8, (o,w)=8 -> tie, (l,o) wins lexicographically;
    # then ('lo','w')=8; then 'low' is a full word for 5 occurrences,
    # remaining pairs: ('low','e')=3; after that merge the 'e' is
    # consumed into 'lowe', so the next pair is ('lowe','r')=2.
    assert got[0] == (0, "l", "o", 8)
    assert got[1] == (1, "lo", "w", 8)
    assert got[2] == (2, "low", "e", 3)
    assert got[3] == (3, "lowe", "r", 2)
    # early stop: a single-char vocab has no pairs at all
    tiny = spark.createDataFrame([(1, "a a b")], "doc_id bigint, text string")
    assert bpe_learn_merges(tiny, n_merges=4).count() == 0
    # empty corpus
    assert bpe_learn_merges(docs.where(F.lit(False)), n_merges=4).count() == 0
    # separator-byte words are fenced out, not corrupted
    sep_doc = spark.createDataFrame(
        [(1, "ab ab ab x\x1fy x\x1fy x\x1fy x\x1fy")],
        "doc_id bigint, text string",
    )
    rows = bpe_learn_merges(sep_doc, n_merges=1).collect()
    assert [(r.left, r.right, r.pair_count) for r in rows] == [("a", "b", 3)]


def test_bpe_apply_hand_corpus(spark):
    """BPE apply (round 9b) on the same Sennrich-shaped corpus: after
    the 4 learned merges ((l,o), (lo,w), (low,e), (lowe,r)), 'low'
    tokenizes to [low], 'lower' to [lower], 'lowest' to [lowe, s, t] —
    token counts and the word-ordered digest are derivable by hand via
    the same framing."""
    import hashlib

    from smart_fraud_detection_data_pipeline_spark.operators.vocab import (
        bpe_apply,
        bpe_merge_list,
    )

    docs = spark.createDataFrame(
        [(1, "low low low low low"), (2, "lower lower"), (3, "lowest"),
         (4, None), (5, "   ")],
        "doc_id bigint, text string",
    )
    merges = bpe_merge_list(docs, n_merges=4)
    assert [(m[1], m[2]) for m in merges] == [
        ("l", "o"), ("lo", "w"), ("low", "e"), ("lowe", "r")
    ]
    out = {r.doc_id: r for r in bpe_apply(docs, merges).collect()}
    # NULL text and whitespace-only docs vanish (no valid words)
    assert set(out) == {1, 2, 3}
    assert (out[1].n_words, out[1].n_tokens, out[1].n_chars) == (5, 5, 15)
    assert (out[2].n_words, out[2].n_tokens, out[2].n_chars) == (2, 2, 10)
    assert (out[3].n_words, out[3].n_tokens, out[3].n_chars) == (1, 3, 6)

    def frame(toks):
        return "\x1f" + "\x1f\x1f".join(toks) + "\x1f"

    assert out[3].token_digest == hashlib.md5(
        frame(["lowe", "s", "t"]).encode()
    ).hexdigest()
    assert out[1].token_digest == hashlib.md5(
        "\x1e".join([frame(["low"])] * 5).encode()
    ).hexdigest()

    # zero merges: pure character tokenization
    out0 = {r.doc_id: r for r in bpe_apply(docs, []).collect()}
    assert out0[1].n_tokens == 15 and out0[3].n_tokens == 6


def test_heavy_hitters_matches_bruteforce_randomized(spark):
    """Property, 3 seeds x 2 partitionings: the MG two-pass plan equals
    a pure-Python exact count on random skewed corpora (docs salted
    with a few hot tokens so the threshold set is non-trivial)."""
    import collections

    for seed in (5, 17, 29):
        docs = [
            (i, f"hot{i % 2} " * (i % 3 + 1) + t)
            for i, t in _random_corpus(seed, n_docs=30)
        ]
        counts = collections.Counter(
            tok for _, t in docs for tok in t.strip().lower().split()
        )
        n = sum(counts.values())
        expected = sorted((t, c) for t, c in counts.items() if c * 16 > n)
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        from smart_fraud_detection_data_pipeline_spark.operators.vocab import (
            heavy_hitter_tokens,
        )

        for parts in (1, 13):
            got = sorted(
                (r.token, r.n_occurrences)
                for r in heavy_hitter_tokens(
                    df.repartition(parts), inv_threshold=16
                ).collect()
            )
            assert got == expected, f"seed {seed} parts {parts}"


def test_repeated_passages_matches_bruteforce_randomized(spark):
    """Property, 3 seeds: repeated_passages equals a pure-Python window
    count (occurrence-wise, whole-sequence fallback for short docs)."""
    import collections

    L = 4
    for seed in (7, 19, 31):
        docs = _random_corpus(seed, n_docs=25, vocab=8, max_len=12)
        occ = collections.Counter()
        by_doc = collections.defaultdict(set)
        for i, t in docs:
            toks = t.strip().split()
            wins = (
                [" ".join(toks)]
                if len(toks) <= L
                else [" ".join(toks[j : j + L]) for j in range(len(toks) - L + 1)]
            )
            for w in wins:
                occ[w] += 1
                by_doc[w].add(i)
        expected = sorted(
            (w, len(by_doc[w]), occ[w]) for w in occ if len(by_doc[w]) >= 2
        )
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        got = sorted(
            (r.passage, r.n_docs, r.n_occurrences)
            for r in TD.repeated_passages(df, length=L).collect()
        )
        assert got == expected, f"seed {seed}"


def test_containment_null_corpus_text_never_matches_empty_docs(spark):
    """Fuzz seed 6007: a NULL-text doc in the CONTAINMENT corpus must
    contribute no grams. Before the fix, split(NULL) -> slice ->
    concat_ws manufactured the '' gram on the corpus side of
    cross_corpus_containment (its eval side was already filtered), so
    an empty-string probe doc spuriously 'appeared' in the corpus —
    flipping exact_hit in doc_decontaminate_bloom's exact harness and
    with it the impossible-looking bloom_caught_all contract."""
    corpus = spark.createDataFrame(
        [(1, None), (2, "real words only here")], "doc_id bigint, text string"
    )
    probes = spark.createDataFrame(
        [(10, ""), (11, "real words only"), (12, "unrelated stuff entirely")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r.n_hit for r in TD.cross_corpus_containment(corpus, probes).collect()}
    assert got[10] == 0  # '' probe must NOT match the NULL-text corpus doc
    assert got[11] > 0  # real containment still detected
    assert got[12] == 0
    flags = {
        r.doc_id: r.bloom_hit
        for r in TD.bloom_contamination_flags(probes, corpus).collect()
    }
    assert not flags[10]  # bloom agrees: NULL corpus text sets no bits


def test_repeated_passages_broadcast_guard_fallback(spark):
    """Above broadcast_limit qualifying passages the recovery join must
    fall back to a shuffle join (VERDICT r7 #7 — a degenerate corpus
    with min_df=2 over near-unique long docs can qualify a stats frame
    no driver should broadcast) and produce the identical report."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=" ".join(f"w{i % 3}_{j}" for j in range(40)))
            for i in range(6)
        ]
    )
    normal = {
        (r.passage, r.n_docs, r.n_occurrences)
        for r in TD.repeated_passages(docs, length=4, min_df=2).collect()
    }
    assert len(normal) > 1  # every 4-gram of each of the 3 texts qualifies
    forced = TD.repeated_passages(docs, length=4, min_df=2, broadcast_limit=1)
    got = {(r.passage, r.n_docs, r.n_occurrences) for r in forced.collect()}
    assert got == normal
    # The guard removes the unconditional PLANNER-side broadcast hint;
    # AQE may still broadcast adaptively once the ACTUAL build size is
    # known to be small — which is exactly the safe behavior (the OOM
    # risk is the unconditional hint, not the size-informed runtime
    # choice). So assert on the hint, not the executed join.
    assert "ResolvedHint" not in forced._jdf.queryExecution().analyzed().toString()
    unguarded = TD.repeated_passages(docs, length=4, min_df=2)
    assert "ResolvedHint" in unguarded._jdf.queryExecution().analyzed().toString()


def test_bpe_resident_equals_distributed(spark, sf_dir):
    """VERDICT r9 #2: the driver-resident merge loop and the
    distributed per-merge-job loop are the SAME algorithm — equal
    merge tables at 8 merges on the real documents fixture and at 256
    merges (deep enough to exercise exhaustion, multi-char symbol
    pairs, and long tie chains) on a mixed corpus."""
    from smart_fraud_detection_data_pipeline_spark.operators.vocab import (
        bpe_merge_list,
    )
    from smart_fraud_detection_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    r8 = bpe_merge_list(docs, n_merges=8, resident=True)
    d8 = bpe_merge_list(docs, n_merges=8, resident=False)
    assert r8 == d8 and len(r8) == 8

    # deep run: a corpus small enough that 256 distributed iterations
    # stay test-speed, rich enough that ~the full merge budget is used
    rows = [
        (i, " ".join(
            f"w{(i * 31 + j * 17) % 97:x}x{(i + j) % 13}" for j in range(20)
        ))
        for i in range(60)
    ]
    small = spark.createDataFrame(rows, "doc_id bigint, text string")
    r256 = bpe_merge_list(small, n_merges=256, resident=True)
    d256 = bpe_merge_list(small, n_merges=256, resident=False)
    assert r256 == d256
    assert len(r256) > 100  # the budget is genuinely exercised


def test_bpe_heap_selection_equals_exhaustive_scan():
    """Round 11: the lazy max-heap selection must reproduce the r10
    exhaustive-scan selection exactly — same (count DESC, left, right)
    total order through stale entries, rebuilds, and tie chains — on
    seeded random vocabularies run to exhaustion (driver-side only, no
    Spark; the distributed pin above covers the cluster path)."""
    import random
    from collections import Counter, defaultdict

    from smart_fraud_detection_data_pipeline_spark.operators.vocab import (
        _bpe_resident_merges,
    )

    def reference(word_counts, n_merges):
        # the r10 loop verbatim: full pair-table scan per merge
        words = [list(w) for w, _ in word_counts]
        counts = [c for _, c in word_counts]
        pc: Counter = Counter()
        pw: defaultdict = defaultdict(set)
        for idx, syms in enumerate(words):
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] += counts[idx]
                pw[p].add(idx)
        merges = []
        for rank in range(n_merges):
            if not pc:
                break
            (l, r), total = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            merges.append((rank, l, r, int(total)))
            merged = l + r
            for idx in pw.pop((l, r), ()):
                syms, c = words[idx], counts[idx]
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    pc[p] -= c
                    if pc[p] <= 0:
                        del pc[p]
                out, i, n = [], 0, len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == l and syms[i + 1] == r:
                        out.append(merged)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                words[idx] = out
                for i in range(len(out) - 1):
                    p = (out[i], out[i + 1])
                    pc[p] += c
                    pw[p].add(idx)
        return merges

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        # tiny alphabet → dense tie chains; duplicate words → counts > 1
        vocab = [
            ("".join(rng.choice("ab") for _ in range(rng.randint(1, 9))),
             rng.randint(1, 5))
            for _ in range(300)
        ]
        for n in (1, 17, 10_000):  # 10k = run to exhaustion
            assert _bpe_resident_merges(list(vocab), n) == reference(
                list(vocab), n
            ), f"seed={seed} n={n}"


def test_streaming_compaction_flips_admission(spark, tmp_path):
    """VERDICT r9 #6, the constructed flip: the SAME text is rejected
    by the pre-compaction micro-batch (its base near-dup is live) and
    ADMITTED by the post-compaction one (the near-dup was tombstoned
    between batches) — proving the mid-stream index swap changes
    admission, not just re-verifying static behavior."""
    from smart_fraud_detection_data_pipeline_spark.queries import (
        q_dedup_streaming_compaction,
    )

    t_dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (9, t_dup, "en", "web", len(t_dup)),        # base, tombstoned (9%3=0)
        (7, "one two three four five six seven", "en", "web", 33),  # survivor
        (10, t_dup, "en", "web", len(t_dup)),        # delta half1 (pre-compaction)
        (15, t_dup, "en", "web", len(t_dup)),        # delta half2 (post-compaction)
        (25, "unique raven quartz vex jolt wizard fjord", "en", "web", 41),  # half2, novel
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: (r.dup_of, r.keep)
        for r in q_dedup_streaming_compaction(spark, str(tmp_path)).collect()
    }
    # batch 1 (pre-compaction): doc 10 rejected against live doc 9
    assert out[10] == (9, False)
    # batch 2 (post-compaction): the SAME text is admitted — doc 9 is gone
    assert out[15] == (None, True)
    assert out[25] == (None, True)
    assert set(out) == {10, 15, 25}


def test_bpe_vocabulary_hand_corpus(spark):
    """Round-10: the vocabulary table on the Sennrich corpus after 4
    merges is fully derivable — 'low'->[low]x5, 'lower'->[lower]x2,
    'lowest'->[lowe,s,t]x1."""
    from smart_fraud_detection_data_pipeline_spark.operators.vocab import (
        bpe_merge_list,
        bpe_vocabulary,
    )

    docs = spark.createDataFrame(
        [(1, "low low low low low"), (2, "lower lower"), (3, "lowest"),
         (4, None)],
        "doc_id bigint, text string",
    )
    merges = bpe_merge_list(docs, n_merges=4)
    got = {r.token: r.n_occurrences for r in bpe_vocabulary(docs, merges).collect()}
    assert got == {"low": 5, "lower": 2, "lowe": 1, "s": 1, "t": 1}
    # zero merges: pure character counts
    got0 = {r.token: r.n_occurrences
            for r in bpe_vocabulary(docs, []).collect()}
    assert got0["l"] == 8 and got0["o"] == 8 and got0["w"] == 8
    assert got0["e"] == 3 and got0["r"] == 2 and got0["s"] == 1
