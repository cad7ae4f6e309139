"""Corpus-hygiene and data-selection operators for large-scale
training-data pipelines: benchmark decontamination, repetition-based
quality stats, substring-level dedup, PII redaction, C4 line-level
cleaning, DSIR importance weighting + (top-k / Gumbel) selection, and
bigram-LM perplexity scoring.

All are public-method reimplementations over the `documents` table
shape (doc_id, text, ...):

- ``decontaminate``: n-gram-overlap contamination flagging (the GPT-3 /
  Pile/Dolma decontamination recipe: a training document is contaminated
  when it shares any length-n token window with an eval/benchmark text).
- ``repetition_stats``: Gopher-style repetition quality signals (Rae et
  al. 2021 §A1.1): the fraction of n-gram occurrences that are duplicates
  and the share held by the single most frequent n-gram — the two signals
  that catch boilerplate/template spam that per-token stats miss.
- ``redact_pii``: regex scrubbing of emails / IPv4 / long digit runs with
  per-document hit counts — patterns restricted to the syntax subset that
  Java regex (Spark) and RE2 (DuckDB, the oracle engine) interpret
  identically.

Scale notes (the 100 TB shapes):

- Decontamination broadcasts the DISTINCT benchmark n-gram set (eval
  suites are MBs, corpora are TBs) onto the exploded corpus n-grams — one
  broadcast hash join, no shuffle of corpus text; the per-doc rollup is a
  partial-agg-friendly groupBy(doc_id). Corpus n-grams are generated
  JVM-side (sequence + slice under whole-stage codegen), never in Python.
- Repetition stats shuffle once on (doc_id, gram) — hash aggregation with
  map-side combine; nothing is ever collected to the driver and no
  per-doc data structure exceeds the gram multiset already being counted.
- Redaction is a pure projection (regexp_replace / regexp_count chains):
  zero shuffles, full codegen.

Reference anchor: the reference engine (pgolo/pilsner) has no corpus
operators — these come from the driver brief's training-data-pipeline
mandate; cited methods are public literature.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pilsner_spark.functions.text import tokens

__all__ = [
    "ngram_array",
    "doc_ngrams",
    "decontaminate",
    "repetition_stats",
    "substring_dedup",
    "PII_PATTERNS",
    "redact_pii",
    "c4_line_filter",
    "GOPHER_STOPWORDS",
    "gopher_quality_rules",
    "importance_weights",
    "select_top_k_by_weight",
    "gumbel_sample_by_weight",
    "bigram_logprob_score",
    "cross_doc_line_dedup",
    "nb_quality_classifier",
    "bucket_llr_table",
    "nb_classifier_weights",
    "nb_classifier_projection",
]


def ngram_array(text: Column, n: int) -> Column:
    """Array of space-joined word n-grams (whitespace tokens), JVM-side:
    slice windows out of the token array under codegen — no explode, no
    Python. Empty when the document has fewer than ``n`` tokens."""
    toks = tokens(text)
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def doc_ngrams(
    docs: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, gram) — one row per n-gram OCCURRENCE (duplicates kept;
    callers that need the set distinct() it)."""
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(ngram_array(F.col(text_col), n)).alias("gram")
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flag training documents sharing any word n-gram with a benchmark /
    eval set (the decontamination pass every pretraining pipeline runs
    before training: GPT-3 appendix C uses 13-gram overlap; ``n`` is the
    knob, smaller here because the synthetic docs are short).

    Returns one row per CONTAMINATED document: (doc_id, n_hits = distinct
    matched n-grams, first_hit = lexicographically first matched gram —
    the audit sample). Clean documents are absent; an anti-join of the
    corpus against this result is the decontaminated training set.

    Physical shape: benchmark grams are distinct'd (tiny — eval suites)
    and BROADCAST onto the exploded corpus grams, so corpus text crosses
    no exchange; the only shuffle is the final groupBy(doc_id) rollup,
    which partial-aggregates map-side. At 100 TB the corpus side stays
    a single scan + broadcast-hash-join + one agg.
    """
    bench_grams = doc_ngrams(benchmark, n, id_col, text_col).select("gram").distinct()
    corpus = doc_ngrams(docs, n, id_col, text_col)
    # dedup AFTER the broadcast filter (countDistinct), so the full corpus
    # gram multiset never crosses an exchange — only matched grams do
    return (
        corpus.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram").alias("n_hits"),
            F.min("gram").alias("first_hit"),
        )
    )


def repetition_stats(
    docs: DataFrame, n: int = 2, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style within-document repetition signals over word n-grams:

    - ``dup_ngram_frac``: fraction of n-gram occurrences that are repeats
      (1 - distinct/total) — boilerplate and looped generations score high;
    - ``top_ngram_frac``: share of all n-gram occurrences held by the most
      frequent single n-gram (Gopher's "top n-gram character fraction",
      token-counted here) — template spam scores high even when the
      duplicate mass is spread thin.

    Documents with fewer than ``n`` tokens emit 0.0 for both (nothing to
    repeat), keeping the filter total over the corpus.

    One shuffle on (doc_id, gram) with map-side partial aggregation, then
    a doc-level re-aggregation of the (already tiny) per-gram counts —
    the scalable alternative to per-doc in-array counting, whose nested
    ``filter(grams, ...)`` scan is O(len²) per document and melts on long
    documents.
    """
    per_gram = (
        doc_ngrams(docs, n, id_col, text_col)
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("total"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    out = stats.select(
        "doc_id",
        F.round(1.0 - F.col("n_distinct") / F.col("total"), 6).alias("dup_ngram_frac"),
        F.round(F.col("top_c") / F.col("total"), 6).alias("top_ngram_frac"),
    )
    # total coverage: docs too short to have any n-gram get explicit zeros
    short = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")).filter(
        F.size(tokens(F.col("_t"))) < n
    )
    return out.unionByName(
        short.select("doc_id", F.lit(0.0).alias("dup_ngram_frac"), F.lit(0.0).alias("top_ngram_frac"))
    )


def substring_dedup(
    docs: DataFrame, n: int = 10, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Substring-level exact dedup (the Lee et al. 2021 "Deduplicating
    Training Data Makes Language Models Better" recipe, window-hash form):
    find every length-``n`` token window occurring in more than one
    document, keep ONE canonical copy (the occurrence in the minimum
    doc_id holding that window), and strip the covered tokens from every
    other document — whole-doc and near-dup dedup both miss this shape
    (boilerplate headers, quoted passages, license blocks pasted into
    otherwise-unique documents).

    Returns one row per input document: (doc_id, n_tokens, n_removed,
    cleaned_text) where cleaned_text drops exactly the tokens covered by
    some non-canonical duplicated window (overlapping windows merge
    naturally — a token survives iff no such window covers it).

    Physical shape: two shuffles, both hash aggregations with map-side
    partial — (1) groupBy window md5 for (n_docs, min_doc); (2) groupBy
    doc_id collecting the (bounded-by-doc-length) covered window starts —
    plus one shuffle join of window occurrences against the duplicate
    window table. The window table is O(total tokens) rows but only
    (hash, pos) wide; full text crosses nothing. The suffix-array original
    is inherently sequential; the fixed-window-hash form is the
    embarrassingly-parallel equivalent used at corpus scale.
    """
    toks = tokens(F.col(text_col))
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("ts"))
    wins = base.select(
        "doc_id",
        F.explode(
            F.when(F.size("ts") < n, F.array().cast("array<struct<pos:int,wh:string>>")).otherwise(
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - (n - 1)),
                    lambda i: F.struct(
                        i.cast("int").alias("pos"),
                        F.md5(F.array_join(F.slice(F.col("ts"), i, n), " ")).alias("wh"),
                    ),
                )
            )
        ).alias("w"),
    ).select("doc_id", F.col("w.pos").alias("pos"), F.col("w.wh").alias("wh"))
    dup = (
        wins.groupBy("wh")
        .agg(F.countDistinct("doc_id").alias("n_docs"), F.min("doc_id").alias("canon_doc"))
        .filter(F.col("n_docs") > 1)
    )
    covered = (
        wins.join(dup, "wh")
        .filter(F.col("doc_id") != F.col("canon_doc"))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("pos")).alias("starts"))
    )
    cleaned = base.join(covered, "doc_id", "left").select(
        "doc_id",
        F.size("ts").alias("n_tokens"),
        F.coalesce(F.col("starts"), F.array().cast("array<int>")).alias("starts"),
        "ts",
    )
    # sequence(1, 0) DESCENDS in Spark — guard the empty-doc case explicitly
    positions = F.when(F.size("ts") == 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(1), F.size("ts")).cast("array<int>")
    )
    keep = F.filter(
        positions,
        lambda i: ~F.exists(F.col("starts"), lambda s: (s <= i) & (i < s + n)),
    )
    return cleaned.select(
        "doc_id",
        "n_tokens",
        (F.size("ts") - F.size(keep)).alias("n_removed"),
        F.array_join(F.transform(keep, lambda i: F.element_at(F.col("ts"), i)), " ").alias(
            "cleaned_text"
        ),
    )


def c4_line_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_sep: str = "\n",
    min_words_per_line: int = 5,
    require_terminal_punct: bool = True,
    line_blocklist: tuple = ("javascript",),
    doc_blocklist: tuple = ("lorem ipsum", "{"),
    min_lines_kept: int = 3,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2 — the
    heuristics behind the C4 pretraining corpus): keep only lines that end
    in terminal punctuation AND carry at least ``min_words_per_line``
    whitespace words AND contain no blocklisted phrase; drop whole
    documents that mention a document-level blocklist phrase (C4's
    "lorem ipsum" / "{" / bad-word rule) or that retain fewer than
    ``min_lines_kept`` lines (C4's three-sentence floor).

    Returns one row per input document — dropped documents stay visible
    (no silent truncation): (doc_id, n_lines, n_lines_kept, doc_kept,
    cleaned_text) with cleaned_text = kept lines rejoined by a newline
    ('' when doc_kept is false).

    Physical shape: a pure projection — split / transform / filter /
    array_join under whole-stage codegen, zero shuffles, zero UDFs; at
    100 TB this runs at scan speed and composes with the other hygiene
    passes in one stage. ``line_sep`` is a Java-regex in the RE2-common
    subset so the DuckDB oracle splits identically."""
    lines = F.filter(
        F.transform(F.split(F.col(text_col), line_sep), lambda l: F.trim(l)),
        lambda l: l != "",
    )

    def _line_ok(l):
        ok = F.size(F.filter(F.split(l, " "), lambda w: w != "")) >= min_words_per_line
        if require_terminal_punct:
            ok = ok & l.rlike('[.!?"]$')
        for phrase in line_blocklist:
            ok = ok & ~F.lower(l).contains(phrase.lower())
        return ok

    kept = F.filter(lines, _line_ok)
    doc_bad = F.lit(False)
    for phrase in doc_blocklist:
        doc_bad = doc_bad | F.lower(F.col(text_col)).contains(phrase.lower())
    doc_kept = (~doc_bad) & (F.size(kept) >= min_lines_kept)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_lines_kept"),
        doc_kept.alias("doc_kept"),
        F.when(doc_kept, F.array_join(kept, "\n")).otherwise(F.lit("")).alias("cleaned_text"),
    )


# Gopher's quality-filter stopword list (Rae et al. 2021 §A1.1): a document
# must contain at least two of these to survive the "stop word" rule.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Full Gopher quality-rule set (Rae et al. 2021 §A1.1, the MassiveText
    document filter; defaults are the paper's thresholds): word-count
    bounds, mean-word-length bounds, symbol-to-word ratio ('#' chars plus
    '...'/'…' ellipses per word), bullet-started and ellipsis-ended line
    fractions, fraction of words containing an alphabetic character, and a
    minimum count of Gopher's eight stopwords.

    Returns one row per input document — every signal plus the combined
    ``gopher_keep`` verdict, so callers can filter, re-threshold, or audit
    which rule fired without recomputing (no silent truncation: dropped
    documents stay visible with gopher_keep = false).

    Physical shape: a pure projection — token/line arrays with
    filter/aggregate higher-order functions under whole-stage codegen, no
    UDF, no explode, zero shuffles; at 100 TB this runs at scan speed
    column-pruned to (id, text). Ratios are rounded to 6 places and every
    construct (space-split tokens, '\\n'-split trimmed lines, leftmost
    non-overlapping replace counting, Java∩RE2 regexes) is engine-portable
    so the DuckDB oracle reproduces the verdict bit-for-bit.
    """
    t = F.col(text_col)
    toks = tokens(t)
    nw = F.size(toks)
    sum_len = F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x))
    mean_wl = F.when(nw == 0, F.lit(0.0)).otherwise(F.round(sum_len / nw, 6))
    # symbol counting via length deltas (leftmost non-overlapping replace —
    # identical in Java and DuckDB); '...' removes 3 chars per occurrence
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_dots = ((F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / F.lit(3)).cast("long")
    n_uni = F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit("")))
    symbol_ratio = F.when(nw == 0, F.lit(0.0)).otherwise(
        F.round((n_hash + n_dots + n_uni) / nw, 6)
    )
    lines = F.filter(F.transform(F.split(t, "\n"), lambda x: F.trim(x)), lambda x: x != "")
    nl = F.size(lines)
    n_bullet = F.size(F.filter(lines, lambda x: x.rlike("^[-*•]")))
    n_ellip = F.size(F.filter(lines, lambda x: x.rlike("(\\.\\.\\.|…)$")))
    bullet_frac = F.when(nl == 0, F.lit(0.0)).otherwise(F.round(n_bullet / nl, 6))
    ellip_frac = F.when(nl == 0, F.lit(0.0)).otherwise(F.round(n_ellip / nl, 6))
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))
    alpha_frac = F.when(nw == 0, F.lit(0.0)).otherwise(F.round(n_alpha / nw, 6))
    stop_hits = F.size(F.filter(toks, lambda x: F.lower(x).isin(GOPHER_STOPWORDS)))
    keep = (
        (nw >= min_words)
        & (nw <= max_words)
        & (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_word_ratio)
        & (bullet_frac <= max_bullet_line_frac)
        & (ellip_frac <= max_ellipsis_line_frac)
        & (alpha_frac >= min_alpha_word_frac)
        & (stop_hits >= min_stopword_hits)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        nw.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_word_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ellip_frac.alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.alias("stopword_hits"),
        keep.alias("gopher_keep"),
    )


def bucket_llr_table(
    target: DataFrame = None,
    raw: DataFrame = None,
    n_buckets: int = 64,
    ngram_n: int = 1,
    smoothing: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    counts: DataFrame = None,
) -> DataFrame:
    """The hashed-n-gram log-likelihood-ratio table shared by DSIR
    importance weighting and the NB quality classifier: per feature
    bucket, ln(p_target/p_raw) under add-``smoothing`` estimates, rounded
    to 6 dp, plus the integer micro-unit form summations use for
    order-independent engine-exact rollups. O(n_buckets) rows — always
    broadcastable. An EMPTY distribution coalesces its total to 0, so the
    add-k estimate degrades to uniform — weights stay finite, never
    silently null.

    Pass ``counts`` — a precomputed (bucket, ct, cr) table — to skip the
    two distribution scans entirely (the classifier builds it in ONE
    labeled pass over its train set; target/raw are then unused)."""
    from pilsner_spark.functions.text import md5_long

    if counts is not None:
        counts = counts.localCheckpoint()
        t_counts = counts.select("bucket", "ct")
        r_counts = counts.select("bucket", "cr")
        session = counts.sparkSession
    else:

        def grams(d):
            return doc_ngrams(d, ngram_n, id_col, text_col).select(
                F.pmod(md5_long(F.col("gram")), F.lit(n_buckets)).alias("bucket")
            )

        def dist(d, cname):
            return grams(d).groupBy("bucket").agg(F.count(F.lit(1)).alias(cname))

        # materialize the two O(n_buckets) count tables: the ratios plan
        # references each TWICE (per-bucket counts + the totals cross
        # join), and without the checkpoint every reference re-scans the
        # corpus-scale gram stream — 4 corpus scans where 2 suffice (same
        # recompute trap as salt_oversized_blocks; the checkpointed
        # tables are bytes)
        t_counts = dist(target, "ct").localCheckpoint()
        r_counts = dist(raw, "cr").localCheckpoint()
        session = target.sparkSession
    # cover all buckets (a candidate gram may hash to a bucket unseen in
    # either distribution — smoothing still defines its ratio)
    all_buckets = session.range(n_buckets).select(
        F.col("id").cast("bigint").alias("bucket")
    )
    s = float(smoothing)
    return (
        all_buckets.join(t_counts, "bucket", "left")
        .join(r_counts, "bucket", "left")
        .select(
            "bucket",
            F.coalesce(F.col("ct"), F.lit(0)).alias("ct"),
            F.coalesce(F.col("cr"), F.lit(0)).alias("cr"),
        )
        .crossJoin(
            t_counts.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("tt")).crossJoin(
                r_counts.agg(F.coalesce(F.sum("cr"), F.lit(0)).alias("tr"))
            )
        )
        .select(
            "bucket",
            F.round(
                F.log((F.col("ct") + s) / (F.col("tt") + s * n_buckets))
                - F.log((F.col("cr") + s) / (F.col("tr") + s * n_buckets)),
                6,
            ).alias("llr"),
        )
        .withColumn("llr_micro", F.round(F.col("llr") * 1e6).cast("bigint"))
    )


def importance_weights(
    docs: DataFrame,
    target: DataFrame = None,
    raw: DataFrame = None,
    n_buckets: int = 64,
    ngram_n: int = 1,
    smoothing: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    counts: DataFrame = None,
) -> DataFrame:
    """DSIR-style data selection with importance resampling (Xie et al.
    2023): score every candidate document by how much more likely its
    hashed n-gram bag is under a TARGET distribution (the domain you want
    more of — e.g. curated/wiki-like text) than under the RAW corpus
    distribution. Selection then keeps the top-weight documents (or
    Gumbel-resamples on the weights — a downstream choice on this column).

    Features are hashed n-grams: bucket = md5_long(gram) mod ``n_buckets``
    (engine-portable, no vocabulary is ever collected). Both distributions
    are add-``smoothing`` estimates over the buckets; each document's
    log-weight is the sum over its gram OCCURRENCES of
    ln(p_target(bucket) / p_raw(bucket)).

    Returns (doc_id, n_grams, log_weight) for every candidate document
    (docs with no grams get log_weight 0.0). ``raw`` defaults to ``docs``
    itself — the usual DSIR setup where candidates define the raw
    distribution.

    Physical shape: the two distribution tables aggregate to ``n_buckets``
    rows each (hash agg with map-side partials over the exploded grams)
    and BROADCAST onto the candidates' gram stream — corpus text never
    shuffles; the only wide exchange is the final groupBy(doc_id) rollup.
    Per-gram log-ratios are rounded to 6 dp and summed in integer
    micro-units so the rollup is order-independent and byte-identical
    across engines (float sums are not associative)."""
    if raw is None and counts is None:
        raw = docs
    from pilsner_spark.functions.text import md5_long

    ratios = bucket_llr_table(
        target, raw, n_buckets=n_buckets, ngram_n=ngram_n, smoothing=smoothing,
        id_col=id_col, text_col=text_col, counts=counts,
    )
    doc_grams = doc_ngrams(docs, ngram_n, id_col, text_col).select(
        "doc_id", F.pmod(md5_long(F.col("gram")), F.lit(n_buckets)).alias("bucket")
    )
    scored = (
        doc_grams.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"), F.sum("llr_micro").alias("micro"))
        .select("doc_id", "n_grams", F.round(F.col("micro") / 1e6, 6).alias("log_weight"))
    )
    # total coverage: gram-less docs score 0.0 (nothing to weigh)
    from pilsner_spark.functions.text import tokens as _toks

    empty = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")).filter(
        F.size(_toks(F.col("_t"))) < ngram_n
    )
    return scored.unionByName(
        empty.select("doc_id", F.lit(0).cast("bigint").alias("n_grams"), F.lit(0.0).alias("log_weight"))
    )


def select_top_k_by_weight(
    scored: DataFrame,
    k: int,
    weight_col: str = "log_weight",
    id_col: str = "doc_id",
) -> DataFrame:
    """The SELECTION step completing DSIR: keep exactly the ``k``
    highest-weight documents, deterministically (ties broken by id) — the
    deterministic-top-k variant of the paper's Gumbel resampling (swap the
    sort key for weight + Gumbel(seed, id) noise to get the sampled
    variant; the machinery is identical).

    A bare ``row_number() over (order by weight desc)`` funnels the whole
    corpus through ONE task. Instead the 6-dp weight (an exact integer in
    micro-units, see ``importance_weights``) is embedded into a fixed-width
    hex sort key whose LEXICOGRAPHIC order equals weight-descending, and
    ``blocking.global_sort_ranks`` computes the global rank with its
    bucketed two-level construction — per-bucket counts prefix-scan on a
    tiny table and broadcast back; no single-partition window ever sees the
    corpus. Returns the selected rows of ``scored`` unchanged.

    The key is RANGE-NORMALIZED: one cheap (min, max) aggregation pins the
    weight span and the key becomes (max_micro - micro) at exactly the hex
    width of the span, so the leading characters vary across the data and
    the adaptive prefix bucketer gets real fan-out. A fixed wide offset
    (e.g. 2^62 - micro) looks order-preserving too but leaves a long
    CONSTANT hex prefix — every row in one bucket, the exact single-task
    funnel this construction exists to avoid (same failure the ADVICE r3
    note caught on zero-padded numeric sort keys).
    """
    from pilsner_spark.operators.blocking import global_sort_ranks

    micro = F.round(F.col(weight_col) * 1e6).cast("bigint")
    lo, hi = scored.agg(F.min(micro), F.max(micro)).first()
    if hi is None:  # empty input
        return scored
    span = max(int(hi) - int(lo), 1)
    width = len(format(span, "x"))
    keyed = scored.withColumn(
        "_sk", F.lpad(F.conv((F.lit(int(hi)) - micro).cast("string"), 10, 16), width, "0")
    )
    ranks = global_sort_ranks(keyed, "_sk", id_col, bucket_prefix_len="auto")
    sel = ranks.filter(F.col("rank") <= k).select(F.col("id").alias(id_col))
    return scored.join(sel, id_col)


def gumbel_sample_by_weight(
    scored: DataFrame,
    k: int,
    temperature: float = 1.0,
    seed: str = "dsir",
    weight_col: str = "log_weight",
    id_col: str = "doc_id",
) -> DataFrame:
    """The DSIR paper's actual resampling: Gumbel-top-k sampling WITHOUT
    replacement — draw k documents with probability proportional to
    exp(weight / temperature), by perturbing each weight with standard
    Gumbel noise and taking the top k (the Gumbel-max trick; one pass, no
    sequential draws). Deterministic: the Gumbel variate derives from
    md5(seed, id), so the same seed + corpus reproduces the same sample on
    any engine and any partitioning — same device as
    ``packing.deterministic_split``. Higher ``temperature`` flattens the
    draw toward uniform; ``temperature -> 0`` recovers the deterministic
    ``select_top_k_by_weight``.

    Physical shape: a pure projection (the perturbed key) on top of the
    same bucketed two-level top-k as ``select_top_k_by_weight`` — nothing
    new shuffles. Returns the sampled rows of ``scored`` unchanged."""
    space = float(16 ** 13)
    u = (
        F.conv(
            F.substring(F.md5(F.concat_ws("#", F.lit(seed), F.col(id_col).cast("string"))), 1, 13),
            16,
            10,
        ).cast("long")
        + 1.0
    ) / (space + 2.0)  # uniform in (0, 1), endpoints excluded
    perturbed = F.round(F.col(weight_col) / float(temperature) - F.log(-F.log(u)), 6)
    keyed = scored.withColumn("_pw", perturbed)
    return select_top_k_by_weight(keyed, k, weight_col="_pw", id_col=id_col).drop("_pw")


def bigram_logprob_score(
    docs: DataFrame,
    lm_docs: DataFrame,
    smoothing: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Perplexity-style quality scoring (the CCNet recipe, Wenzek et al.
    2020: score every document under a language model trained on a
    high-quality corpus; low log-prob = far from the target register).
    The LM here is the relational stand-in — an add-k-smoothed bigram
    model over whitespace tokens: P(w2 | w1) = (c(w1 w2) + k) /
    (c(w1) + k * V), with V = distinct LM unigrams; OOV words fall back to
    the same smoothed estimate with zero counts.

    Returns (doc_id, n_bigrams, avg_logprob) for EVERY candidate document
    (docs with < 2 tokens get 0 bigrams and 0.0 — total coverage, same
    contract as repetition_stats). ``avg_logprob`` is the mean natural-log
    bigram probability — the negated, length-normalized proxy for
    perplexity (filter on a threshold or a quantile downstream).

    Physical shape: the two LM count tables are hash aggregations of the
    LM corpus (map-side partials); the score join shuffles on the gram
    keys — bigram counts can exceed memory at 100 TB, so unlike the DSIR
    bucket tables they are NOT broadcast; Spark's AQE picks broadcast
    automatically when a small LM fits. Per-bigram log-probs round to 6 dp
    and sum in integer micro-units (order-independent, engine-exact);
    the per-doc rollup is one hash aggregation."""
    toks = tokens(F.col(text_col))
    bi = F.when(
        F.size(toks) < 2, F.array().cast("array<struct<w1:string,w2:string>>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"), F.element_at(toks, i + 1).alias("w2")
            ),
        )
    )

    def doc_bigrams(d):
        return d.select(
            F.col(id_col).alias("doc_id"), F.explode(bi).alias("b")
        ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))

    lm_bi = doc_bigrams(lm_docs).groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    lm_uni = (
        lm_docs.select(F.explode(tokens(F.col(text_col))).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = lm_uni.agg(F.count(F.lit(1)).alias("v"))
    k = float(smoothing)
    scored = (
        doc_bigrams(docs)
        .join(lm_bi, ["w1", "w2"], "left")
        .join(lm_uni, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "lp_micro",
            F.round(
                F.round(
                    F.log(
                        (F.coalesce(F.col("c2"), F.lit(0)) + k)
                        / (F.coalesce(F.col("c1"), F.lit(0)) + k * F.col("v"))
                    ),
                    6,
                )
                * 1e6
            ).cast("bigint"),
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("lp_micro").alias("micro"))
        .select(
            "doc_id",
            "n_bigrams",
            F.round(F.col("micro") / 1e6 / F.col("n_bigrams"), 6).alias("avg_logprob"),
        )
    )
    short = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")).filter(
        F.size(tokens(F.col("_t"))) < 2
    )
    return scored.unionByName(
        short.select(
            "doc_id", F.lit(0).cast("bigint").alias("n_bigrams"), F.lit(0.0).alias("avg_logprob")
        )
    )


# Patterns limited to the Java-regex ∩ RE2 common subset (no backrefs, no
# lookaround, no \b) so the DuckDB oracle replays them byte-identically.
# Order matters: emails before digit runs (an email's digits must not be
# half-eaten by the number pass first).
PII_PATTERNS = [
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"),
    ("ipv4", "([0-9]{1,3}\\.){3}[0-9]{1,3}"),
    ("long_digits", "[0-9]{9,}"),
]


def redact_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Scrub emails / IPv4 addresses / 9+-digit runs (phone/SSN/account
    shapes), replacing each with ``<PII:kind>`` and counting hits per
    kind — the pre-training privacy pass. Pure projection: a chain of
    regexp_count + regexp_replace expressions, zero shuffles, whole-stage
    codegen; at 100 TB this is scan-speed.

    Returns (doc_id, redacted, n_email, n_ipv4, n_long_digits).
    """
    out_cols = [F.col(id_col).alias("doc_id")]
    redacted = F.col(text_col)
    for kind, pat in PII_PATTERNS:
        out_cols.append(F.regexp_count(redacted, F.lit(pat)).alias(f"n_{kind}"))
        redacted = F.regexp_replace(redacted, pat, f"<PII:{kind}>")
    return docs.select(*out_cols, redacted.alias("redacted")).select(
        "doc_id", "redacted", *[f"n_{k}" for k, _ in PII_PATTERNS]
    )


def cross_doc_line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_sep: str = "\n",
    min_occurrences: int = 2,
) -> DataFrame:
    """Corpus-level line dedup (the OTHER C4 dedup rule, Raffel et al.
    2020 §2.2: "we removed any line that occurred more than once in the
    data set" — applied per line, keeping one canonical occurrence):
    every trimmed non-empty line occurring >= ``min_occurrences`` times
    ACROSS THE WHOLE CORPUS (including repeats inside one document) is
    stripped everywhere except its canonical occurrence, the minimum
    (doc_id, line_idx). Complements ``c4_line_filter`` (per-doc
    heuristics, no corpus state) and ``substring_dedup`` (token windows,
    not line-aligned): boilerplate lines — cookie banners, nav menus,
    signatures — are exactly line-aligned repeats.

    Returns one row per input document: (doc_id, n_lines, n_lines_kept,
    cleaned_text), cleaned_text = surviving lines rejoined by a newline.
    Dropped-to-empty documents stay visible (no silent truncation).

    ``line_sep`` is a LITERAL separator string (quoted before it reaches
    Java's regex engine), so '.', '|' or '\\r\\n' split exactly as typed —
    unlike ``c4_line_filter``, whose line_sep is documented as a Java
    regex for pattern callers.

    Physical shape: lines explode to (doc_id, idx, line-md5) — text
    itself never leaves its doc row twice — then (1) ONE hash agg by line
    hash (map-side partials collapse hot boilerplate lines per partition,
    so the shuffle is skew-proof) yields the occurrence count + canonical
    occurrence per distinct line; (2) one shuffle join of occurrences
    against the >=min_occurrences subset marks the non-canonical drops
    (a mega-hot line key lands on one reducer here — AQE skew-join
    splits it; enable spark.sql.adaptive.skewJoin at scale); (3) one
    groupBy(doc_id) rollup of dropped indices rejoins the doc table.
    Everything JVM-side, no UDFs."""
    # \Q...\E literal-quotes the separator for Java's regex engine
    # (java.util.regex.Pattern.quote semantics, embedded \E handled)
    sep_literal = "\\Q" + line_sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    lines_arr = F.filter(
        F.transform(F.split(F.col(text_col), sep_literal), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    base = docs.select(F.col(id_col).alias("doc_id"), lines_arr.alias("ls"))
    ex = base.select(
        "doc_id", F.posexplode("ls").alias("idx0", "line")
    ).select("doc_id", (F.col("idx0") + 1).alias("i"), F.md5("line").alias("lh"))
    dup = (
        ex.groupBy("lh")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.min(F.struct(F.col("doc_id").alias("d"), F.col("i").alias("ci"))).alias("canon"),
        )
        .filter(F.col("n_occ") >= min_occurrences)
    )
    drops = (
        ex.join(dup, "lh")
        .filter((F.col("doc_id") != F.col("canon.d")) | (F.col("i") != F.col("canon.ci")))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("i")).alias("di"))
    )
    joined = base.join(drops, "doc_id", "left").select(
        "doc_id", "ls", F.coalesce(F.col("di"), F.array().cast("array<int>")).alias("di")
    )
    # sequence(1, 0) DESCENDS in Spark — guard the empty-doc case explicitly
    positions = F.when(F.size("ls") == 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(1), F.size("ls")).cast("array<int>")
    )
    keep = F.filter(positions, lambda i: ~F.exists(F.col("di"), lambda d: d == i))
    return joined.select(
        "doc_id",
        F.size("ls").alias("n_lines"),
        F.size(keep).alias("n_lines_kept"),
        F.array_join(F.transform(keep, lambda i: F.element_at(F.col("ls"), i)), "\n").alias(
            "cleaned_text"
        ),
    )



def _labeled_bucket_counts(
    train: DataFrame,
    n_buckets: int,
    ngram_n: int,
    label_col: str,
    text_col: str,
) -> DataFrame:
    """(bucket, ct, cr) — BOTH class distributions counted in ONE scan of
    the labeled train set (conditional sums), instead of one scan per
    class. Shared by the classifier's distributed and serving paths."""
    from pilsner_spark.functions.text import md5_long

    ex = train.select(
        (F.col(label_col).cast("double") >= 0.5).alias("pos"),
        F.explode(ngram_array(F.col(text_col), ngram_n)).alias("gram"),
    )
    return (
        ex.select(F.pmod(md5_long(F.col("gram")), F.lit(n_buckets)).alias("bucket"), "pos")
        .groupBy("bucket")
        .agg(
            F.sum(F.col("pos").cast("long")).alias("ct"),
            F.sum((~F.col("pos")).cast("long")).alias("cr"),
        )
    )


def nb_quality_classifier(
    docs: DataFrame,
    train: DataFrame,
    threshold: float = 0.5,
    n_buckets: int = 64,
    ngram_n: int = 1,
    smoothing: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
) -> DataFrame:
    """Supervised model-based quality filtering (the fastText-classifier
    step of CCNet/GPT-3/DataComp pipelines, Wenzek et al. 2020 §4.3 /
    Brown et al. 2020 §A): a multinomial Naive Bayes linear classifier
    over hashed n-grams — log-odds weight per feature bucket learned from
    a labeled train set (label >= 0.5 is the quality class), every
    candidate document scored by summed bucket log-odds + class log-prior
    and squashed to a probability.

    NB is the distributed-training-friendly member of the linear-filter
    family: training is pure counting (no iterations, no state), so at
    100 TB it is exactly two hash aggregations — the same physical shape
    a trained fastText model's SERVING side has. The feature/scoring
    machinery is shared with :func:`importance_weights` (an NB classifier
    IS the DSIR log-likelihood ratio with labeled classes + a prior).

    Returns (doc_id, n_grams, logit, prob, keep): logit = class log-prior
    + summed per-gram log-odds (6 dp), prob = sigmoid(logit) (6 dp),
    keep = prob >= ``threshold``. Gram-less documents score the prior
    alone. Both classes must be non-empty.

    Physical shape: BOTH class distributions are counted in ONE scan of
    the labeled train set (conditional sums — not one filtered scan per
    class), aggregate to ``n_buckets`` rows and broadcast; no collected
    vocabulary; candidate text crosses only the per-doc rollup exchange."""
    scored = importance_weights(
        docs, n_buckets=n_buckets, ngram_n=ngram_n,
        smoothing=smoothing, id_col=id_col, text_col=text_col,
        counts=_labeled_bucket_counts(train, n_buckets, ngram_n, label_col, text_col),
    )
    s = float(smoothing)
    # the prior is one tiny aggregate over the labeled train set — collect
    # it so an empty class fails LOUDLY here (lazily it would surface as
    # silent null weights: an empty class makes the class distribution's
    # total null inside importance_weights' log ratios)
    counts_row = train.agg(
        F.sum((F.col(label_col).cast("double") >= 0.5).cast("long")).alias("n_pos"),
        F.sum((F.col(label_col).cast("double") < 0.5).cast("long")).alias("n_neg"),
    ).first()
    n_pos, n_neg = counts_row["n_pos"] or 0, counts_row["n_neg"] or 0
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            f"nb_quality_classifier needs both classes in train: "
            f"n_pos={n_pos}, n_neg={n_neg} (label_col={label_col!r}, >= 0.5 is positive)"
        )
    log_prior = round(math.log((n_pos + s) / (n_neg + s)), 6)
    logit = F.round(F.col("log_weight") + F.lit(log_prior), 6)
    return (
        scored
        .withColumn("logit", logit)
        .withColumn("prob", F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit"))), 6))
        .select(
            "doc_id",
            "n_grams",
            "logit",
            "prob",
            (F.col("prob") >= threshold).alias("keep"),
        )
    )


def nb_classifier_weights(
    train: DataFrame,
    n_buckets: int = 64,
    ngram_n: int = 1,
    smoothing: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
):
    """Train-and-collect: the NB classifier's serving artifact —
    (micro_weights, log_prior) where micro_weights[bucket] is the
    per-bucket log-odds in integer micro-units (a list of ``n_buckets``
    ints — bytes, not gigabytes) and log_prior the 6-dp class prior.
    Training stays distributed (two hash aggs via
    :func:`bucket_llr_table`); only the O(n_buckets) result is collected.
    Fails loudly on an empty class, like :func:`nb_quality_classifier`."""
    counts_row = train.agg(
        F.sum((F.col(label_col).cast("double") >= 0.5).cast("long")).alias("n_pos"),
        F.sum((F.col(label_col).cast("double") < 0.5).cast("long")).alias("n_neg"),
    ).first()
    n_pos, n_neg = counts_row["n_pos"] or 0, counts_row["n_neg"] or 0
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            f"nb_classifier_weights needs both classes in train: "
            f"n_pos={n_pos}, n_neg={n_neg} (label_col={label_col!r}, >= 0.5 is positive)"
        )
    s = float(smoothing)
    ratios = bucket_llr_table(
        n_buckets=n_buckets, ngram_n=ngram_n, smoothing=smoothing,
        id_col=id_col, text_col=text_col,
        counts=_labeled_bucket_counts(train, n_buckets, ngram_n, label_col, text_col),
    )
    micro = [0] * n_buckets
    for r in ratios.select("bucket", "llr_micro").collect():
        micro[int(r["bucket"])] = int(r["llr_micro"])
    return micro, round(math.log((n_pos + s) / (n_neg + s)), 6)


def nb_classifier_projection(
    docs: DataFrame,
    micro_weights,
    log_prior: float,
    threshold: float = 0.5,
    ngram_n: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SERVING form of the NB quality filter: the collected weights
    (:func:`nb_classifier_weights`) become an array literal and the score
    a pure per-row projection — token buckets hashed in-row, micro-unit
    weights summed by a JVM ``aggregate`` expression, sigmoid'd. Output
    schema and numbers identical to :func:`nb_quality_classifier` (integer
    micro-unit sums are order-independent, so in-row summation == the
    distributed rollup bit-for-bit).

    Being a projection, it has ZERO shuffles, runs at scan speed inside
    whole-stage codegen, and composes with Structured Streaming in append
    mode unchanged (the other hygiene projections' contract) — score a
    live ingest stream with weights trained on yesterday's corpus.

    Honest bound: the weights become ONE CreateArray expression, which is
    fine up to a few thousand buckets but bloats codegen beyond that —
    for very wide feature spaces (>= ~10^4 buckets) use the distributed
    form (:func:`nb_quality_classifier`), whose weight table broadcasts
    as data, not as an expression tree."""
    from pilsner_spark.functions.text import md5_long

    n_buckets = len(micro_weights)
    arr = F.array(*[F.lit(int(m)).cast("bigint") for m in micro_weights])
    grams = ngram_array(F.col(text_col), ngram_n)
    micro_sum = F.aggregate(
        grams,
        F.lit(0).cast("bigint"),
        lambda acc, g: acc
        + F.element_at(arr, F.pmod(md5_long(g), F.lit(n_buckets)).cast("int") + 1),
    )
    lw = F.round(micro_sum / 1e6, 6)
    logit = F.round(lw + F.lit(float(log_prior)), 6)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(grams).cast("bigint").alias("n_grams"),
        logit.alias("logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("prob"),
        (F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6) >= threshold).alias("keep"),
    )
