"""Recognition pipeline over one string: layer merge, disambiguation,
span post-processing (the reference's parse-side operators Q1, Q8-Q11;
/root/reference/pilsner/utility.py:523-795).

The per-string functions here run inside Arrow-batched pandas UDFs on
executors; none of them touch Spark. Spans per string are few, so the
sequential post-processing is negligible next to the scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Set, Tuple

from pilsner_spark.core.model import CompiledModel
from pilsner_spark.core.normalize import NormResult, normalize_with_map


@dataclass
class MergedSpan:
    """One recognized span in original coordinates, merged across
    normalization layers (flatten_layers semantics, utility.py:589-664)."""

    begin: int
    end: int
    ids: List[int]  # dictionary line ids, layer order then commit order
    attrs: Dict[int, Dict[str, List[str]]]  # line id -> {attr: [values]}
    src_by_iid: Dict[int, int]  # iid -> layer index (last contributor wins)
    o2n_by_iid: Dict[int, List[List[int]]]  # iid -> that layer's o2n map


def merge_layers(
    model: CompiledModel,
    layers: Sequence[Tuple[NormResult, List[Tuple[List[int], str, int, int]]]],
    attrs_out: Optional[Sequence[str]] = None,
) -> List[MergedSpan]:
    """Union matches from all normalization layers, remap offsets to the
    original string via each layer's n2o map, and merge by mapped span
    (utility.py:627-659)."""
    spans: Dict[Tuple[int, int], MergedSpan] = {}
    for layer_index, (nr, matches) in enumerate(layers):
        for ids, _label, b, e in matches:
            loc = (nr.n2o[b], nr.n2o[e])
            span = spans.get(loc)
            if span is None:
                span = MergedSpan(begin=loc[0], end=loc[1], ids=[], attrs={}, src_by_iid={}, o2n_by_iid={})
                spans[loc] = span
            span.ids.extend(ids)
            for n in ids:
                span.attrs[n] = model.attrs_for_line(n, attrs_out)
                iid = model.line_iid[n]
                span.src_by_iid[iid] = layer_index
                span.o2n_by_iid[iid] = nr.o2n
    return list(spans.values())


def disambiguate(
    model: CompiledModel,
    merged: List[MergedSpan],
    srcs: Sequence[str],
    word_separator: str = " ",
) -> List[MergedSpan]:
    """Context-keyword disambiguation for spans whose labels map to more
    than one entity (utility.py:523-587).

    For each ambiguous span, every candidate entity's context window is the
    slice of *its own layer's* normalized string between the neighboring
    spans' boundaries (remapped through that layer's o2n map); the candidate
    whose distinctive keywords (own keyword set minus a rival's) overlap the
    context most wins; ties keep all.

    Deviation from the reference (intentional): ambiguity is judged on the
    number of *distinct* entities, where the reference counts candidate line
    ids and can erase a span matched twice by the same entity
    (utility.py:551-586 with a single-key kwd comprehension); its own tests
    never exercise that path.
    """
    ms = sorted(merged, key=lambda m: m.begin)
    for k, span in enumerate(ms):
        iids = [model.line_iid[n] for n in span.ids]
        cand = list(dict.fromkeys(iids))
        if len(cand) < 2:
            continue
        context: Dict[int, Set[str]] = {}
        for i in cand:
            src = srcs[span.src_by_iid[i]]
            o2n = span.o2n_by_iid[i]
            lo, hi = 0, len(src)
            if k > 0:
                prev_end = ms[k - 1].end
                lo = max(lo, o2n[prev_end][1])
            if k < len(ms) - 1:
                next_begin = ms[k + 1].begin
                hi = min(hi, o2n[next_begin][0])
            context[i] = set(src[lo:hi].split(word_separator))
        keyword_sets = {i: model.keywords.get(i, frozenset()) for i in cand}
        # distinctive keywords: own set minus the last rival's in candidate
        # order — reproducing the reference's overwriting dict comprehension
        # (utility.py:575) exactly, including its >2-candidate behavior
        distinctive: Dict[int, frozenset] = {}
        for i in cand:
            last_other = None
            for j in cand:
                if j != i:
                    last_other = j
            distinctive[i] = keyword_sets[i] - keyword_sets[last_other] if last_other is not None else keyword_sets[i]
        best = 0
        winners: Set[int] = set()
        for i in cand:
            score = len(distinctive[i] & context[i])
            if score > best:
                best = score
                winners.clear()
            if score == best:
                winners.add(i)
        span.ids = [n for n in span.ids if model.line_iid[n] in winners]
        span.attrs = {n: a for n, a in span.attrs.items() if model.line_iid[n] in winners}
    return ms


def flatten_spans(spans: Sequence[MergedSpan]) -> Dict[Tuple[int, int], Dict[str, Set[str]]]:
    """Explode spans to (begin, end, attr, value) rows, drop rows strictly
    nested inside the previously kept span, regroup (utility.py:666-697)."""
    entries: List[Tuple[int, int, str, str]] = []
    for span in spans:
        for n in span.ids:
            for name, values in span.attrs[n].items():
                for value in values:
                    entries.append((span.begin, span.end, name, value))
    if not entries:
        return {}
    entries = sorted(sorted(entries, key=lambda x: -x[1]), key=lambda x: x[0])
    kept = [entries[0]]
    for q in entries[1:]:
        K = kept[-1]
        if (K[0] <= q[0] < K[1] and K[0] < q[1] < K[1]) or (
            K[0] < q[0] < K[1] and K[0] < q[1] <= K[1]
        ):
            continue
        kept.append(q)
    out: Dict[Tuple[int, int], Dict[str, Set[str]]] = {}
    for b, e, name, value in kept:
        out.setdefault((b, e), {}).setdefault(name, set()).add(value)
    return out


def reduce_spans(segments: Set[Tuple[int, int]]) -> List[Tuple[int, int]]:
    """Overlap reduction: keep the longer of two intersecting spans, leftmost
    wins ties; displaced spans may be recovered from the merged group
    (utility.py:699-729, golden ut_utility.py:396-400)."""

    def intersects(a: Tuple[int, int], b: Tuple[int, int]) -> bool:
        return a[0] <= b[0] <= a[1]

    def length(seg: Tuple[int, int]) -> int:
        return seg[1] - seg[0]

    groups: List[List[Tuple[int, int]]] = [
        [x] for x in sorted(sorted(segments, key=length), key=lambda x: x[0])
    ]
    for i in range(len(groups) - 1):
        if not groups[i]:
            continue
        head, nxt = groups[i][0], groups[i + 1][0]
        if not intersects(head, nxt):
            continue
        if length(head) >= length(nxt):
            groups[i + 1] = groups[i]
            groups[i] = []
        else:
            for j in range(1, len(groups[i])):
                if not intersects(groups[i][j], nxt):
                    groups[i][0] = groups[i][j]
                    break
            else:
                groups[i + 1] += groups[i]
                groups[i] = []
    return [g[0] for g in groups if g]


@dataclass
class Mention:
    """Pipeline-facing span: resolved entities for one recognized region."""

    begin: int
    end: int
    line_ids: List[int]
    iids: List[int]
    entity_ids: List[str]
    attrs: Dict[int, Dict[str, List[str]]] = field(default_factory=dict)


def _pipeline(
    model: CompiledModel,
    text: str,
    attrs_where: Optional[dict],
    attrs_out: Optional[Sequence[str]],
    matcher_shards: Optional[Sequence[dict]] = None,
) -> Tuple[List[MergedSpan], Dict[Tuple[int, int], Dict[str, Set[str]]], List[Tuple[int, int]]]:
    """``matcher_shards``: B10 sharded scan — each unit scanned once per
    shard, matches unioned into one layer before merge/disambiguation/
    reduction (the reference's multi-trie union, utility.py:438-517).
    Attribute prefilters apply to the dictionary BEFORE sharding, so the
    two options are mutually exclusive here."""
    if matcher_shards is not None and attrs_where:
        raise ValueError("attrs_where must be applied before sharding the matchers")
    matchers = model.filtered_matchers(attrs_where)
    layers: List[Tuple[NormResult, list]] = []
    for unit, cfg in model.normalizers.items():  # insertion order == add order
        nr = normalize_with_map(text, cfg, model.word_separator)
        if matcher_shards is None:
            scans = matchers[unit].scan(nr.normalized)
        else:
            scans = [m for shard in matcher_shards for m in shard[unit].scan(nr.normalized)]
        layers.append((nr, scans))
    merged = merge_layers(model, layers, attrs_out)
    if model.has_keywords:
        merged = disambiguate(model, merged, [nr.normalized for nr, _ in layers])
    flat = flatten_spans(merged)
    kept = reduce_spans(set(flat.keys()))
    return merged, flat, kept


def parse(
    model: CompiledModel,
    text: str,
    attrs_where: Optional[dict] = None,
    attrs_out: Optional[Sequence[str]] = None,
) -> Dict[Tuple[int, int], Dict[str, Set[str]]]:
    """Full recognition over one string — the reference's ``Utility.parse``
    (utility.py:731-795). Returns {(begin, end): {attr: {values}}} with
    ``[begin, end)`` offsets into the original string."""
    _, flat, kept = _pipeline(model, text, attrs_where, attrs_out)
    return {loc: flat[loc] for loc in kept}


def extract_mentions(
    model: CompiledModel,
    text: str,
    attrs_where: Optional[dict] = None,
    attrs_out: Optional[Sequence[str]] = None,
    matcher_shards: Optional[Sequence[dict]] = None,
) -> List[Mention]:
    """Entity mentions for the ER pipeline: surviving spans with resolved
    line/entity ids (post-disambiguation, post span reduction)."""
    merged, _flat, kept = _pipeline(model, text, attrs_where, attrs_out, matcher_shards)
    by_loc = {(m.begin, m.end): m for m in merged if m.ids}
    out: List[Mention] = []
    for loc in sorted(kept):
        span = by_loc.get(loc)
        if span is None:
            continue
        iids = list(dict.fromkeys(model.line_iid[n] for n in span.ids))
        entities = list(dict.fromkeys(model.line_entity[n] for n in span.ids))
        out.append(
            Mention(
                begin=loc[0],
                end=loc[1],
                line_ids=list(span.ids),
                iids=iids,
                entity_ids=entities,
                attrs=span.attrs,
            )
        )
    return out
