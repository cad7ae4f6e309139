"""String normalization with character index maps (sic-rule subset).

The reference engine (pgolo/pilsner) delegates normalization to the public
``sic`` package; the rule surface it actually exercises is small (see
SURVEY.md §2.4, evidence in /root/reference/test/assets/*.xml and
misc/example/*.xml):

* ``<setting name="cs" value="0"/>``       — case folding
* ``<setting name="bypass" value="1"/>``   — identity normalizer
* ``<split where="lmr" value="s"/>``       — split tokens around substring
  occurrences anchored left / middle / right (only when both sides nonempty)
* ``<token to="Y" from="X"/>``             — whole-token rewrite; ``to=""``
  removes the token together with one adjacent separator
* ``<character to="Y" from="X"/>``         — character rewrite (pilsner uses
  this to strip the reserved control chars, model.py:199-206)
* default tokenization                     — every non-alphanumeric,
  non-separator character becomes its own token
  (golden: ``'string_value'`` → ``'string _ value'``, ut_model.py:182)

This module reimplements exactly that subset from scratch, maintaining two
index maps the downstream span logic requires (utility.py:637, 783-784):

* ``n2o[i]``  — original index of normalized character ``i``
* ``o2n[j]``  — ``[min, max]`` normalized index for original character ``j``;
  characters erased by normalization carry the last previously-emitted
  normalized index (golden shape: ut_utility.py:314-330 fixture maps)

All functions are pure and operate on single strings; the Spark layer wraps
them in Arrow-batched pandas UDFs (one vectorized call per batch, plain
Python only inside the batch loop).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

# Reserved control characters stripped from every input (model.py:28-31):
# '\x07' ignore-flag, '\x03' terminal-flag, '\x05' attrs-slot.
RESERVED_CHARS = "\x03\x05\x07"
_RESERVED_SET = frozenset(RESERVED_CHARS)

_KIND_SEP = 0
_KIND_TOK = 1


@dataclass(frozen=True)
class Rule:
    """One normalization rule, applied in document order."""

    kind: str  # 'token' | 'split' | 'character'
    frm: str = ""
    to: str = ""
    where: str = ""  # for 'split': subset of 'lmr'


@dataclass(frozen=True)
class NormalizerConfig:
    """Parsed normalizer definition (the sic-XML subset)."""

    name: str
    lowercase: bool = False  # <setting name="cs" value="0"/>
    bypass: bool = False  # <setting name="bypass" value="1"/>
    rules: Tuple[Rule, ...] = field(default_factory=tuple)


@dataclass(frozen=True)
class NormResult:
    """Normalized string plus both character maps."""

    normalized: str
    n2o: List[int]  # normalized index -> original index
    o2n: List[List[int]]  # original index -> [min, max] normalized index


def normalizer_from_xml_string(xml_text: str) -> NormalizerConfig:
    """Parse a sic-style tokenizer XML document into a NormalizerConfig."""
    root = ET.fromstring(xml_text)
    name = root.attrib.get("name", "")
    lowercase = False
    bypass = False
    rules: List[Rule] = []
    for child in root:
        if child.tag == "setting":
            sname = child.attrib.get("name")
            svalue = child.attrib.get("value")
            if sname == "cs" and svalue == "0":
                lowercase = True
            elif sname == "bypass" and svalue == "1":
                bypass = True
        elif child.tag == "split":
            rules.append(
                Rule(kind="split", frm=child.attrib["value"], where=child.attrib.get("where", "lmr"))
            )
        elif child.tag == "token":
            rules.append(Rule(kind="token", frm=child.attrib["from"], to=child.attrib.get("to", "")))
        elif child.tag == "character":
            rules.append(Rule(kind="character", frm=child.attrib["from"], to=child.attrib.get("to", "")))
    return NormalizerConfig(name=name, lowercase=lowercase, bypass=bypass, rules=tuple(rules))


def load_normalizer_xml(path: str) -> NormalizerConfig:
    with open(path, encoding="utf8") as f:
        return normalizer_from_xml_string(f.read())


def config_to_xml(cfg: NormalizerConfig) -> str:
    """Serialize a NormalizerConfig back to the sic-style tokenizer XML it
    was parsed from — the exact inverse of :func:`normalizer_from_xml_string`
    (round-trip pinned by test). This is the reference engine's own
    normalizer CONFIG format (its ``add_normalizer`` compiles an XML file,
    model.py:188-213), so exported configs are directly loadable there."""
    from xml.sax.saxutils import quoteattr

    parts = [f"<tokenizer name={quoteattr(cfg.name or 'exported')}>"]
    if cfg.lowercase:
        parts.append('  <setting name="cs" value="0"/>')
    if cfg.bypass:
        parts.append('  <setting name="bypass" value="1"/>')
    for r in cfg.rules:
        if r.kind == "split":
            parts.append(f"  <split where={quoteattr(r.where)} value={quoteattr(r.frm)}/>")
        elif r.kind == "token":
            parts.append(f"  <token to={quoteattr(r.to)} from={quoteattr(r.frm)}/>")
        elif r.kind == "character":
            parts.append(f"  <character to={quoteattr(r.to)} from={quoteattr(r.frm)}/>")
    parts.append("</tokenizer>")
    return "\n".join(parts)


BYPASS = NormalizerConfig(name="bypass", bypass=True)


# ---------------------------------------------------------------------------
# Segment machinery: a segment is (kind, [(char, orig_index), ...])
# ---------------------------------------------------------------------------


def _initial_segments(pairs: Sequence[Tuple[str, int]], sep: str):
    """Split the tagged character stream on the word separator, then break
    punctuation characters out into their own tokens."""
    segs = []
    cur: list = []
    cur_kind = None
    for c, i in pairs:
        kind = _KIND_SEP if c == sep else _KIND_TOK
        if kind != cur_kind:
            if cur:
                segs.append((cur_kind, cur))
            cur, cur_kind = [], kind
        cur.append((c, i))
    if cur:
        segs.append((cur_kind, cur))

    # punctuation breakout: inside each token, every char that is neither
    # alphanumeric nor the separator becomes a standalone token, with a
    # separator inserted between adjacent pieces. The inserted separator
    # inherits the original index of the following piece's first character.
    out = []
    for kind, chars in segs:
        if kind == _KIND_SEP:
            out.append((kind, chars))
            continue
        pieces: list = []
        run: list = []
        for c, i in chars:
            if c.isalnum():
                run.append((c, i))
            else:
                if run:
                    pieces.append(run)
                    run = []
                pieces.append([(c, i)])
        if run:
            pieces.append(run)
        for k, piece in enumerate(pieces):
            if k > 0:
                out.append((_KIND_SEP, [(sep, piece[0][1])]))
            out.append((_KIND_TOK, piece))
    return out


def _seg_text(chars) -> str:
    return "".join(c for c, _ in chars)


def _apply_token_rule(segs, frm: str, to: str, sep: str):
    """Whole-token rewrite. Removal (to='') also swallows the separator
    immediately before the token (or after it, when the token leads)."""
    res: list = []
    drop_next_sep = False
    for kind, chars in segs:
        if drop_next_sep and kind == _KIND_SEP:
            drop_next_sep = False
            continue
        drop_next_sep = False
        if kind == _KIND_TOK and _seg_text(chars) == frm:
            if to == "":
                if res and res[-1][0] == _KIND_SEP:
                    res.pop()
                else:
                    drop_next_sep = True
                continue
            origs = [i for _, i in chars]
            new_chars = [(c, origs[min(j, len(origs) - 1)]) for j, c in enumerate(to)]
            res.append((_KIND_TOK, new_chars))
        else:
            res.append((kind, chars))
    return res


def _split_cuts(token: str, value: str, where: str):
    """Cut positions for one split rule over one token. A cut at position p
    splits token[:p] | token[p:]; both sides must be nonempty."""
    cuts = set()
    n, m = len(token), len(value)
    if m == 0 or m >= n:
        return cuts
    if "l" in where and token.startswith(value):
        cuts.add(m)
    if "r" in where and token.endswith(value):
        cuts.add(n - m)
    if "m" in where:
        pos = token.find(value, 1)
        while 0 < pos and pos + m < n:
            cuts.add(pos)
            cuts.add(pos + m)
            pos = token.find(value, pos + m)
        # guard: a middle occurrence that touches either edge is the l/r case
        cuts.discard(0)
        cuts.discard(n)
    return cuts


def _apply_split_rule(segs, value: str, where: str, sep: str):
    res: list = []
    for kind, chars in segs:
        if kind == _KIND_SEP:
            res.append((kind, chars))
            continue
        token = _seg_text(chars)
        cuts = sorted(_split_cuts(token, value, where))
        if not cuts:
            res.append((kind, chars))
            continue
        bounds = [0] + cuts + [len(token)]
        for k in range(len(bounds) - 1):
            piece = chars[bounds[k] : bounds[k + 1]]
            if k > 0:
                res.append((_KIND_SEP, [(sep, piece[0][1])]))
            res.append((_KIND_TOK, piece))
    return res


def _build_maps(pairs, original_length: int) -> NormResult:
    normalized = "".join(c for c, _ in pairs)
    n2o = [i for _, i in pairs]
    by_orig: dict = {}
    for pos, (_, i) in enumerate(pairs):
        lohi = by_orig.get(i)
        if lohi is None:
            by_orig[i] = [pos, pos]
        else:
            if pos < lohi[0]:
                lohi[0] = pos
            if pos > lohi[1]:
                lohi[1] = pos
    o2n: List[List[int]] = []
    last = 0
    for j in range(original_length):
        lohi = by_orig.get(j)
        if lohi is not None:
            o2n.append(list(lohi))
            last = lohi[1]
        else:
            o2n.append([last, last])
    return NormResult(normalized=normalized, n2o=n2o, o2n=o2n)


def normalize_with_map(text: str, cfg: NormalizerConfig, word_separator: str = " ") -> NormResult:
    """Normalize *text* under *cfg*, returning the string plus index maps.

    Reserved control characters are stripped from every input regardless of
    configuration, matching pilsner's behavior of appending strip rules to
    every normalization unit (model.py:199-206; golden span shift
    ut_utility.py:432-437).
    """
    pairs = [(c, i) for i, c in enumerate(text) if c not in _RESERVED_SET]
    if cfg.bypass:
        return _build_maps(pairs, len(text))
    if cfg.lowercase:
        pairs = [(c.lower(), i) for c, i in pairs]
    # character rules rewrite the raw stream before tokenization
    for rule in cfg.rules:
        if rule.kind != "character":
            continue
        if rule.to == "":
            pairs = [(c, i) for c, i in pairs if c != rule.frm]
        else:
            pairs = [(rule.to if c == rule.frm else c, i) for c, i in pairs]
    segs = _initial_segments(pairs, word_separator)
    for rule in cfg.rules:
        if rule.kind == "token":
            segs = _apply_token_rule(segs, rule.frm, rule.to, word_separator)
        elif rule.kind == "split":
            segs = _apply_split_rule(segs, rule.frm, rule.where, word_separator)
    flat = [pair for _, chars in segs for pair in chars]
    return _build_maps(flat, len(text))


def normalize(text: str, cfg: NormalizerConfig, word_separator: str = " ") -> str:
    """Normalized string only (dictionary-compile side needs no maps)."""
    return normalize_with_map(text, cfg, word_separator).normalized
