"""Corpus-hygiene operators: decontamination, repetition stats, PII
redaction (operators/text_filters.py) — hand-computed goldens."""

import pytest
from pyspark.sql import functions as F

from pilsner_spark.operators.text_filters import (
    decontaminate,
    ngram_array,
    redact_pii,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_ngram_array_windows_and_short_docs(spark):
    out = spark.range(1).select(
        ngram_array(F.lit("a b c d"), 3).alias("g3"),
        ngram_array(F.lit("a b"), 3).alias("short"),
    ).first()
    assert out.g3 == ["a b c", "b c d"]
    assert out.short == []


def test_decontaminate_flags_shared_ngrams_only(spark):
    """Doc 1 shares the 3-gram 'x y z' with the benchmark twice (counted
    once — distinct grams), doc 2 shares nothing, doc 3 shares two
    DIFFERENT grams; first_hit is the lexicographic min."""
    bench = _docs(spark, [(100, "p q x y z r s t")])
    corpus = _docs(
        spark,
        [
            (1, "a x y z b x y z"),
            (2, "totally clean words here"),
            (3, "q x y z r s"),  # grams 'q x y', 'x y z', 'y z r', 'z r s' — 4 hits
        ],
    )
    got = {r.doc_id: (r.n_hits, r.first_hit) for r in decontaminate(corpus, bench, n=3).collect()}
    assert got == {1: (1, "x y z"), 3: (4, "q x y")}


def test_repetition_stats_hand_computed(spark):
    """'a b a b a' 2-grams: [a b, b a, a b, b a] -> total 4, distinct 2,
    top 2: dup = 0.5, top = 0.5. 'a b c' -> 2 distinct 2-grams: dup 0,
    top 1/2. A 1-token doc is short -> explicit zeros (total coverage)."""
    docs = _docs(spark, [(1, "a b a b a"), (2, "a b c"), (3, "solo")])
    got = {r.doc_id: (r.dup_ngram_frac, r.top_ngram_frac) for r in repetition_stats(docs, n=2).collect()}
    assert got[1] == (0.5, 0.5)
    assert got[2] == (0.0, 0.5)
    assert got[3] == (0.0, 0.0)


def test_redact_pii_counts_and_ordering(spark):
    """Email digits must be consumed by the email pass (not half-eaten by
    the digit-run pass); IPv4 and 9+-digit runs each redact with their own
    tag; clean text passes through byte-identical."""
    docs = _docs(
        spark,
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "node 192.168.001.250 port"),
            (3, "acct 987654321012 end"),
            (4, "clean text stays clean"),
            (5, "combo a@b.co 10.0.0.1 123456789"),
        ],
    )
    got = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert got[1].redacted == "mail <PII:email> now"
    assert (got[1].n_email, got[1].n_ipv4, got[1].n_long_digits) == (1, 0, 0)
    assert got[2].redacted == "node <PII:ipv4> port"
    assert got[3].redacted == "acct <PII:long_digits> end"
    assert got[4].redacted == "clean text stays clean"
    assert got[5].redacted == "combo <PII:email> <PII:ipv4> <PII:long_digits>"
    assert (got[5].n_email, got[5].n_ipv4, got[5].n_long_digits) == (1, 1, 1)


def test_substring_dedup_strips_noncanonical_windows(spark):
    """A 3-token window shared by docs 1/2/3 survives only in the canonical
    (minimum) doc; overlapping duplicated windows merge; unique text and
    short/empty docs pass through untouched."""
    from pilsner_spark.operators.text_filters import substring_dedup

    docs = _docs(
        spark,
        [
            (1, "intro words x y z closing remarks"),
            (2, "different start x y z different end"),
            (3, "x y z w q"),  # windows 'x y z' and 'y z w' and 'z w q'
            (4, "totally unique content lives here"),
            (5, "a b"),  # shorter than n: no windows
            (6, ""),
        ],
    )
    got = {r.doc_id: r for r in substring_dedup(docs, n=3).collect()}
    # doc 1 is canonical for 'x y z': nothing removed
    assert got[1].n_removed == 0 and got[1].cleaned_text == "intro words x y z closing remarks"
    # doc 2 loses exactly the 3 covered tokens
    assert got[2].n_removed == 3
    assert got[2].cleaned_text == "different start different end"
    # doc 3: only window 'x y z' (pos 1) is duplicated -> tokens 1..3 go
    assert got[3].n_removed == 3 and got[3].cleaned_text == "w q"
    assert got[4].n_removed == 0 and got[4].cleaned_text == "totally unique content lives here"
    assert got[5].n_removed == 0 and got[5].cleaned_text == "a b"
    assert got[6].n_removed == 0 and got[6].cleaned_text == ""


def test_incremental_dedup_cross_snapshot_only(spark):
    """Cross-snapshot dedup: an exact copy flags 'exact' (and is excluded
    from near_dup — strongest reason wins), a near-copy flags 'near_dup',
    unrelated text is absent; old-vs-old pairs are never emitted."""
    from pilsner_spark.operators.dedup import incremental_dedup

    old = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),  # old near-dup of 1: must NOT appear
        ],
    )
    new = _docs(
        spark,
        [
            (10, "the quick brown fox jumps over the lazy dog"),   # exact copy of 1
            (11, "the quick brown fox jumps over the lazy wolf"),  # near-dup
            (12, "completely unrelated words appear in this one"),
        ],
    )
    got = {r.doc_id: (r.matched_id, r.reason) for r in
           incremental_dedup(new, old, jaccard_threshold=0.7).collect()}
    assert got[10] == (1, "exact")
    assert got[11][1] == "near_dup" and got[11][0] in (1, 2)
    assert set(got) == {10, 11}


def test_decontaminate_plan_broadcasts_benchmark(spark):
    """Scale shape: the benchmark gram set is broadcast; the corpus side
    reaches the join without an exchange of its own grams."""
    bench = _docs(spark, [(100, "x y z w v")])
    corpus = _docs(spark, [(1, "a x y z w b")])
    plan = decontaminate(corpus, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_c4_line_filter_each_rule(spark):
    """One document exercising every C4 rule: a keepable line, a too-short
    line, a no-terminal-punct line, a blocklisted line; plus a doc killed
    by the document blocklist and a doc below the kept-lines floor."""
    from pilsner_spark.operators.text_filters import c4_line_filter

    rows = [
        (1, "the cat sat on the mat.\nshort line.\nno terminal punct here\nthe spam javascript line is long.\nanother fine sentence appears here!"),
        (2, "lorem ipsum dolor sit amet.\na perfectly good long sentence here.\nanother good long sentence right here."),
        (3, "only one good long sentence here."),
    ]
    out = {
        r.doc_id: r
        for r in c4_line_filter(
            _docs(spark, rows), min_words_per_line=5, min_lines_kept=2
        ).collect()
    }
    # doc 1: 5 lines in; kept = line 1 (6 words, '.') and line 5 ('!');
    # 'short line.' < 5 words, line 3 lacks terminal punct, line 4 has
    # 'javascript'
    assert (out[1].n_lines, out[1].n_lines_kept, out[1].doc_kept) == (5, 2, True)
    assert out[1].cleaned_text == "the cat sat on the mat.\nanother fine sentence appears here!"
    # doc 2: all three lines pass the line rules (the lorem-ipsum line is
    # itself 5 words + terminal punct) but the DOC blocklist kills the page
    assert (out[2].n_lines_kept, out[2].doc_kept, out[2].cleaned_text) == (3, False, "")
    # doc 3: one kept line < min_lines_kept=2 floor
    assert (out[3].n_lines_kept, out[3].doc_kept) == (1, False)


def test_gopher_quality_rules_each_rule(spark):
    """One document per Gopher rule (Rae et al. 2021 §A1.1), thresholds
    shrunk to hand-checkable sizes; doc 1 passes everything."""
    from pilsner_spark.operators.text_filters import gopher_quality_rules

    rows = [
        (1, "the cat sat on mat"),  # 5 words, mean 2.8, stop 'the' -> keep
        (2, "the cat"),  # fails min_words=5
        (3, "the a b c d e f g h i j"),  # 11 words > max_words=10
        (4, "the absolutely extraordinary incomprehensible catastrophic"),  # mean 10.8 > 6
        (5, "the cat # # sat on mat ..."),  # 2 '#' + 1 '...' over 8 words = 0.375 > 0.2
        (6, "- the cat sat\n- on a mat\nplain line here"),  # 2/3 bullet lines > 0.5
        (7, "the cat sat fine...\nok fine go on then...\nplain line"),  # 2/3 ellipsis lines
        (8, "the 123 456 789 000"),  # alpha 1/5 < 0.8
        (9, "cat sat mat dog bird"),  # 0 stopword hits < 1
        (10, ""),  # empty: all signals zero, keep false
    ]
    out = {
        r.doc_id: r
        for r in gopher_quality_rules(
            _docs(spark, rows),
            min_words=5,
            max_words=10,
            min_mean_word_len=2.0,
            max_mean_word_len=6.0,
            max_symbol_word_ratio=0.2,
            max_bullet_line_frac=0.5,
            max_ellipsis_line_frac=0.5,
            min_alpha_word_frac=0.8,
            min_stopword_hits=1,
        ).collect()
    }
    assert {d: out[d].gopher_keep for d in out} == {
        1: True, 2: False, 3: False, 4: False, 5: False,
        6: False, 7: False, 8: False, 9: False, 10: False,
    }
    assert (out[1].n_words, out[1].mean_word_len, out[1].stopword_hits) == (5, 2.8, 1)
    assert out[4].mean_word_len == 10.8
    assert out[5].symbol_word_ratio == 0.375
    assert out[6].bullet_line_frac == 0.666667
    assert out[7].ellipsis_line_frac == 0.666667
    assert out[8].alpha_word_frac == 0.2
    assert out[9].stopword_hits == 0
    assert (out[10].n_words, out[10].mean_word_len, out[10].symbol_word_ratio) == (0, 0.0, 0.0)


def test_gopher_quality_rules_is_pure_projection(spark):
    """The full rule set must stay a single codegen'd projection: no
    exchange, no UDF, no explode in the executed plan."""
    from pilsner_spark.operators.text_filters import gopher_quality_rules

    plan = (
        gopher_quality_rules(_docs(spark, [(1, "the cat sat on mat")]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_importance_weights_orders_target_like_docs_first(spark):
    """Docs made of target-domain grams must outweigh raw-only docs; the
    gram-less doc gets an explicit 0.0 (total coverage)."""
    from pilsner_spark.operators.text_filters import importance_weights

    target = _docs(spark, [(100, "alpha beta alpha beta gamma")])
    docs = _docs(
        spark,
        [
            (1, "alpha beta alpha"),      # pure target vocabulary
            (2, "zzz qqq www rrr"),       # unseen-in-target vocabulary
            (3, ""),                       # no grams at all
        ],
    )
    out = {r.doc_id: r for r in importance_weights(docs, target, n_buckets=32).collect()}
    assert out[1].log_weight > out[2].log_weight
    assert out[1].log_weight > 0.0 and out[2].log_weight < 0.0
    assert (out[3].n_grams, out[3].log_weight) == (0, 0.0)
    assert out[1].n_grams == 3 and out[2].n_grams == 4


def test_importance_weights_sum_is_order_independent(spark):
    """The per-doc rollup sums integer micro-units — repartitioning the
    gram stream (different accumulation order) must not move the result
    even in the last decimal."""
    from pilsner_spark.operators.text_filters import importance_weights

    rows = [(i, " ".join(f"w{j}" for j in range(i % 7 + 1))) for i in range(1, 40)]
    docs = _docs(spark, rows)
    target = _docs(spark, [(0, "w0 w1 w2")])
    a = {r.doc_id: r.log_weight for r in importance_weights(docs, target).collect()}
    b = {
        r.doc_id: r.log_weight
        for r in importance_weights(docs.repartition(7), target).collect()
    }
    assert a == b


def test_select_top_k_by_weight_exact_and_tie_stable(spark):
    """Selection keeps exactly the k highest weights with ties broken by
    id — identical to a naive global sort, including negative weights and
    a tie straddling the cut."""
    from pilsner_spark.operators.text_filters import select_top_k_by_weight

    rows = [
        (1, 0.5), (2, -0.25), (3, 1.75), (4, 0.5), (5, 0.5),
        (6, -1.5), (7, 2.0), (8, 0.0),
    ]
    scored = spark.createDataFrame(rows, "doc_id long, log_weight double")
    got = sorted(r.doc_id for r in select_top_k_by_weight(scored, k=4).collect())
    # order: 7(2.0), 3(1.75), then the 0.5 tie 1,4,5 -> ids 1 and 4 make the cut
    assert got == [1, 3, 4, 7]
    # k beyond the table returns everything
    assert len(select_top_k_by_weight(scored, k=100).collect()) == 8


def test_gumbel_sample_deterministic_and_weight_biased(spark):
    """Gumbel-top-k: same seed reproduces the same sample regardless of
    partitioning; different seeds differ; heavier weights are sampled far
    more often (probability ∝ exp(weight/T))."""
    from pilsner_spark.operators.text_filters import gumbel_sample_by_weight

    rows = [(i, 3.0 if i <= 10 else -3.0) for i in range(1, 101)]
    scored = spark.createDataFrame(rows, "doc_id long, log_weight double")
    a = sorted(r.doc_id for r in gumbel_sample_by_weight(scored, k=10, seed="s1").collect())
    b = sorted(
        r.doc_id
        for r in gumbel_sample_by_weight(scored.repartition(7), k=10, seed="s1").collect()
    )
    c = sorted(r.doc_id for r in gumbel_sample_by_weight(scored, k=10, seed="s2").collect())
    assert a == b and len(a) == 10
    assert a != c
    # the 10 heavy docs (weight +3 vs -3, a 403x odds ratio each) dominate
    heavy = sum(1 for d in a if d <= 10)
    assert heavy >= 8, a


def test_bigram_logprob_hand_computed(spark):
    """Add-1 bigram LM on a 2-bigram corpus, hand-computed probabilities:
    seen bigram scores ln((1+1)/(1+V)), unseen-context OOV scores
    ln(1/(0+V)); short docs get explicit zeros (total coverage)."""
    import math

    from pilsner_spark.operators.text_filters import bigram_logprob_score

    lm = _docs(spark, [(100, "a b c")])  # bigrams: (a,b), (b,c); V=3
    docs = _docs(spark, [(1, "a b"), (2, "z q"), (3, "solo"), (4, "")])
    got = {r.doc_id: r for r in bigram_logprob_score(docs, lm).collect()}
    # doc 1: P(b|a) = (1+1)/(1+3) = 0.5
    assert got[1].n_bigrams == 1
    assert got[1].avg_logprob == pytest.approx(round(round(math.log(0.5), 6), 6), abs=1e-6)
    # doc 2: c2=0, c1(z)=0 -> (0+1)/(0+3)
    assert got[2].avg_logprob == pytest.approx(round(math.log(1 / 3), 6), abs=1e-6)
    assert got[1].avg_logprob > got[2].avg_logprob  # in-domain scores higher
    assert (got[3].n_bigrams, got[3].avg_logprob) == (0, 0.0)
    assert (got[4].n_bigrams, got[4].avg_logprob) == (0, 0.0)


def test_cross_doc_line_dedup_keeps_canonical_only(spark):
    """Corpus-level line dedup: a line repeated across (or within) docs
    survives only at its minimum (doc_id, line_idx) occurrence; unique
    lines always survive; min_occurrences=3 spares a twice-seen line;
    empty docs pass through with 0 lines."""
    from pilsner_spark.operators.text_filters import cross_doc_line_dedup

    docs = spark.createDataFrame(
        [
            (1, "cookie banner\nunique one"),
            (2, "cookie banner\ncookie banner\nunique two"),
            (3, "twice seen\nunique three"),
            (4, "twice seen"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in cross_doc_line_dedup(docs).collect()}
    assert got[1].cleaned_text == "cookie banner\nunique one"  # canonical kept
    assert got[2].cleaned_text == "unique two"  # both repeats stripped (incl. within-doc)
    assert (got[2].n_lines, got[2].n_lines_kept) == (3, 1)
    assert got[3].cleaned_text == "twice seen\nunique three"  # canonical of the pair
    assert got[4].cleaned_text == ""  # non-canonical occurrence dropped to empty, still visible
    assert (got[5].n_lines, got[5].n_lines_kept, got[5].cleaned_text) == (0, 0, "")
    assert set(got) == {1, 2, 3, 4, 5}
    # a raised threshold spares the twice-seen line
    spared = {r.doc_id: r for r in cross_doc_line_dedup(docs, min_occurrences=3).collect()}
    assert spared[4].cleaned_text == "twice seen"
    assert spared[2].cleaned_text == "unique two"  # 3 occurrences still dedup


def test_cross_doc_line_dedup_line_sep_is_literal(spark):
    """ADVICE r4: line_sep must split LITERALLY — a '.' or '|' separator
    previously hit Java-regex semantics ('.' matched everything, exploding
    each doc into empty lines)."""
    from pilsner_spark.operators.text_filters import cross_doc_line_dedup

    docs = spark.createDataFrame(
        [(1, "repeat.unique a"), (2, "repeat.unique b")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in cross_doc_line_dedup(docs, line_sep=".").collect()}
    assert (got[1].n_lines, got[1].cleaned_text) == (2, "repeat\nunique a")
    assert (got[2].n_lines, got[2].cleaned_text) == (2, "unique b")

    piped = spark.createDataFrame([(1, "x|y"), (2, "x|z")], "doc_id long, text string")
    got = {r.doc_id: r for r in cross_doc_line_dedup(piped, line_sep="|").collect()}
    assert got[2].cleaned_text == "z"


def test_nb_quality_classifier_separates_and_scores_prior(spark):
    """NB classifier: clearly-separable vocabularies classify correctly;
    a gram-less document scores the class prior alone; probabilities are
    monotone in the logit and keep == (prob >= threshold)."""
    import math

    from pilsner_spark.operators.text_filters import nb_quality_classifier

    train = spark.createDataFrame(
        [
            (1, "good clean prose text", 1.0),
            (2, "good curated quality words", 1.0),
            (3, "spam spam junk junk", 0.0),
            (4, "junk garbage spam noise", 0.0),
        ],
        "doc_id long, text string, label double",
    )
    docs = spark.createDataFrame(
        [
            (10, "good quality prose"),
            (11, "spam junk garbage"),
            (12, ""),  # gram-less: prior alone
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in nb_quality_classifier(docs, train).collect()}
    assert got[10].keep and not got[11].keep
    assert got[10].prob > 0.5 > got[11].prob
    # balanced classes: prior = ln(3/3) = 0 -> empty doc sits at 0.5 exactly
    assert (got[12].n_grams, got[12].logit, got[12].prob) == (0, 0.0, 0.5)
    assert got[12].keep  # >= threshold inclusive
    for r in got.values():
        assert r.prob == round(1.0 / (1.0 + math.exp(-r.logit)), 6)


def test_nb_quality_classifier_empty_class_fails_loudly(spark):
    import pytest

    from pilsner_spark.operators.text_filters import nb_quality_classifier

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    all_pos = spark.createDataFrame([(1, "a b", 1.0)], "doc_id long, text string, label double")
    with pytest.raises(ValueError, match="both classes"):
        nb_quality_classifier(docs, all_pos)


def test_importance_weights_empty_target_degrades_to_uniform(spark):
    """An empty target distribution must not produce silent null weights:
    the add-k estimate degrades to uniform — every weight finite, and the
    llr reduces to ln(1/n_buckets) - ln(p_raw(bucket)) per gram."""
    from pilsner_spark.operators.text_filters import importance_weights

    docs = spark.createDataFrame([(1, "a b"), (2, "c d")], "doc_id long, text string")
    empty = spark.createDataFrame([], "doc_id long, text string")
    rows = importance_weights(docs, target=empty, n_buckets=8).collect()
    assert len(rows) == 2
    assert all(r.log_weight is not None for r in rows)


def test_nb_classifier_projection_matches_distributed(spark):
    """The serving projection (collected weights as an array literal,
    in-row micro-unit sum) must equal nb_quality_classifier row-for-row —
    integer sums are order-independent, so in-row == distributed rollup."""
    from pilsner_spark.operators.text_filters import (
        nb_classifier_projection,
        nb_classifier_weights,
        nb_quality_classifier,
    )

    train = spark.createDataFrame(
        [
            (1, "good clean prose text", 1.0),
            (2, "good curated quality words", 1.0),
            (3, "spam spam junk junk", 0.0),
            (4, "junk garbage spam noise", 0.0),
        ],
        "doc_id long, text string, label double",
    )
    docs = spark.createDataFrame(
        [(10, "good quality prose"), (11, "spam junk garbage"), (12, "")],
        "doc_id long, text string",
    )
    batch = {r.doc_id: (r.n_grams, r.logit, r.prob, r.keep)
             for r in nb_quality_classifier(docs, train).collect()}
    micro, prior = nb_classifier_weights(train)
    served = {r.doc_id: (r.n_grams, r.logit, r.prob, r.keep)
              for r in nb_classifier_projection(docs, micro, prior).collect()}
    assert served == batch
    # projection plan: zero shuffles, zero Python — streamable by contract
    plan = nb_classifier_projection(docs, micro, prior)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan
