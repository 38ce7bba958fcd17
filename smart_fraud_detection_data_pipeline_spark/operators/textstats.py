"""Text-analysis operators over a document table (extension surface).

Beyond the reference's operator set (SURVEY §7 step 6): the text-side
primitives a 100 TB training-data pipeline needs — token counting,
quality scoring, language ID, and document fingerprinting. All are pure
Catalyst column expressions (no Python UDFs): at scale each is a single
narrow projection over the scan — no shuffle, no Arrow exchange, full
WholeStageCodegen.

Determinism contract: every function here has an exact DuckDB-SQL twin
(queries.py) — hence md5 (present in both engines) rather than
xxhash64/murmur for anything hashed, and explicit DOUBLE casts before
ratio math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic. Deliberately small + hardcoded: the heuristic must be
#: reproducible in ANSI SQL, not tuned. Tie order = this dict's order.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is", "in"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu"),
    "fr": ("le", "la", "et", "les", "des", "est", "un"),
    "es": ("el", "la", "los", "las", "es", "un", "una"),
}

#: "BPE-ish" word-piece pattern: runs of letters, runs of digits, or a
#: single non-alphanumeric symbol — a public-domain approximation of how
#: byte-pair tokenizers split before merges.
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _member_of(words: tuple[str, ...]):
    """One-arg lambda factory for F.filter (pyspark introspects the lambda
    signature, so extra default args would be treated as lambda params)."""
    return lambda t: t.isin(*words)


def tokens(text: Column) -> Column:
    """Whitespace tokens (empty string → one empty token, as in SQL split)."""
    return F.split(F.trim(text), "\\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def wordpiece_count(text: Column) -> Column:
    """BPE-ish sub-token count via regexp extraction."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 0))


def quality_columns(text: Column, toks: Column | None = None) -> dict[str, Column]:
    """Quality-scoring signal columns (length/punct/stopword ratios).

    score = 0.4*len_score + 0.3*(1-punct_ratio) + 0.3*stopword_ratio,
    len_score = least(n_tokens/100, 1). All-double arithmetic with
    explicit casts so the SQL twin is bit-identical.

    Pass a pre-PROJECTED ``toks`` column when composing with other
    token consumers: these columns reference the token array several
    times, and Catalyst inlines (re-splits) a shared expression at
    every reference — a staged projection is the difference between
    one split per row and five (measured 8x on doc_repetition).
    """
    toks = tokens(text) if toks is None else toks
    n_tok = F.size(toks).cast("double")
    n_char = F.length(text).cast("double")
    n_punct = (
        F.length(text) - F.length(F.regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))
    ).cast("double")
    all_stops = tuple({w for ws in LANG_STOPWORDS.values() for w in ws})
    n_stop = F.size(F.filter(toks, _member_of(all_stops))).cast("double")
    punct_ratio = F.when(n_char > 0, n_punct / n_char).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    score = (
        F.lit(0.4) * len_score + F.lit(0.3) * (F.lit(1.0) - punct_ratio) + F.lit(0.3) * stop_ratio
    )
    return {
        "n_tokens": F.size(toks),
        "n_punct": n_punct.cast("long"),
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "quality_score": score,
    }


def lang_scores(text: Column, ltoks: Column | None = None) -> dict[str, Column]:
    """Stopword-hit count per language (the language-ID signal).

    ``ltoks``: pre-projected lowercased token array (see quality_columns
    on why staging matters — each language's filter re-tokenizes
    otherwise)."""
    toks = tokens(F.lower(text)) if ltoks is None else ltoks
    return {
        lang: F.size(F.filter(toks, _member_of(words)))
        for lang, words in LANG_STOPWORDS.items()
    }


def lang_id(text: Column, scores: dict[str, Column] | None = None) -> Column:
    """Argmax language by stopword hits; CJK-character presence trumps all;
    ties break in LANG_STOPWORDS order; zero hits → 'unknown'.

    The argmax is a sort of a 5-struct array — each score column is
    referenced exactly TWICE (winner check + name pick) instead of the
    O(L) references a comparison fold costs; with Catalyst's
    inline-at-every-reference expansion that bounds re-computation of
    the score expressions. Pass pre-projected ``scores`` (from
    lang_scores over a staged token column) to cut it to attribute
    references."""
    scores = lang_scores(text) if scores is None else scores
    has_cjk = F.length(F.regexp_replace(text, "[^\\u4e00-\\u9fff]", "")) > 0
    langs = list(scores)
    # ascending sort of (-score, ordinal): max score first, earliest
    # language on ties — the fold's exact semantics.
    best = F.array_sort(
        F.array(
            *[
                F.struct(
                    (-scores[lang]).alias("neg"), F.lit(i).alias("i")
                )
                for i, lang in enumerate(langs)
            ]
        )
    )[0]
    name = F.element_at(
        F.array(*[F.lit(lang) for lang in langs]), best["i"] + 1
    )
    picked = F.when(best["neg"] < 0, name).otherwise(F.lit("unknown"))
    return F.when(has_cjk, F.lit("zh")).otherwise(picked)


def fingerprint(text: Column, ngram: int = 8) -> Column:
    """Rolling-hash document fingerprint: min md5 over all character
    n-grams (winnowing with window = whole doc). Documents shorter than
    the n-gram get md5(text). O(len) md5 calls per doc, embarrassingly
    parallel, no shuffle.
    """
    n = F.length(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(ngram - 1), F.lit(1))),
        lambda i: F.md5(F.substring(text, i, ngram).cast("binary")),
    )
    return F.array_min(grams)


def kgram_hashes(text: Column, k: int = 24) -> Column:
    """md5 hash of every character k-gram, in position order. The
    winnowing input: O(len) md5 calls per doc, computed in-row (no
    explode — the text never amplifies into per-gram rows). Documents
    shorter than k hash as a single whole-text gram (substring clips
    identically in Spark and DuckDB)."""
    g = F.greatest(F.length(text) - F.lit(k - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), g),
        lambda i: F.md5(F.substring(text, i, k).cast("binary")),
    )


def winnow(hashes: Column, w: int = 12) -> Column:
    """MOSS winnowing selection (Schleimer, Wilkerson & Aiken, SIGMOD'03):
    slide a w-hash window over the k-gram hashes, keep each window's min,
    distinct the selections. Guarantee: two documents sharing any
    substring of length >= k + w - 1 share at least one fingerprint, and
    no match shorter than k is ever detected — the local-window analogue
    of `fingerprint` (window = whole doc) that enables PARTIAL-overlap
    detection. Expected density 2/(w+1) fingerprints per gram.

    Pass a materialized column (select kgram_hashes into its own
    projection first): `hashes` is referenced twice here (size + slice)
    and Catalyst does not CSE expensive expressions (CLAUDE.md).
    """
    n_win = F.greatest(F.size(hashes) - F.lit(w - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_win),
            lambda j: F.array_min(F.slice(hashes, j, w)),
        )
    )


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """All text-analysis signals over a STAGED tokenization (still one
    scan, no shuffle): the token arrays and per-language scores are
    projected once and every signal references the attributes — without
    the staging Catalyst re-splits the text at each of the ~15
    references (8x measured on the repetition twin)."""
    from smart_fraud_detection_data_pipeline_spark.operators.skew import spread_input

    t = F.col(text_col)
    # spread an under-split scan first: the min-md5 fingerprint fold
    # dominates (measured 3.1 s -> 1.0 s at sf0.1; no-op at production
    # split counts)
    staged = spread_input(df.select(F.col(id_col), t)).select(
        F.col(id_col),
        t.alias("__text"),
        tokens(t).alias("__toks"),
        tokens(F.lower(t)).alias("__ltoks"),
    )
    t = F.col("__text")
    scored = staged.select(
        F.col(id_col),
        "__text",
        "__toks",
        *[
            c.alias(f"__s_{lang}")
            for lang, c in lang_scores(t, ltoks=F.col("__ltoks")).items()
        ],
    )
    qc = quality_columns(t, toks=F.col("__toks"))
    scores = {lang: F.col(f"__s_{lang}") for lang in LANG_STOPWORDS}
    return scored.select(
        F.col(id_col),
        F.size(F.col("__toks")).alias("n_tokens"),
        wordpiece_count(t).alias("n_wordpieces"),
        qc["punct_ratio"].alias("punct_ratio"),
        qc["stopword_ratio"].alias("stopword_ratio"),
        qc["quality_score"].alias("quality_score"),
        lang_id(t, scores=scores).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )


#: PII patterns kept to syntax valid AND equivalent in both Java regex
#: (Spark) and RE2 (DuckDB oracle): plain character classes, no
#: lookaround, no backrefs.
EMAIL_PATTERN = "[A-Za-z0-9_.]+@[A-Za-z0-9.-]+"
NUMBER_PATTERN = "[0-9]{3,}"


def redact_pii(text: Column) -> dict[str, Column]:
    """PII scrubbing signal columns: emails → <EMAIL> first, then long
    digit runs → <NUM> (order matters — emails may contain digits), plus
    match counts for audit. Pure column expressions (JVM regex, no UDF):
    map-only at any scale, and the counts come from the SAME patterns
    applied to the original text, so redacted/count can never drift."""
    after_email = F.regexp_replace(text, EMAIL_PATTERN, "<EMAIL>")
    return {
        "redacted": F.regexp_replace(after_email, NUMBER_PATTERN, "<NUM>"),
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(EMAIL_PATTERN), 0)).cast(
            "bigint"
        ),
        "n_numbers": F.size(
            F.regexp_extract_all(after_email, F.lit(NUMBER_PATTERN), 0)
        ).cast("bigint"),
    }
