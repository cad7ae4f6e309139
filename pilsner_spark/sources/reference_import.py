"""Importer for reference pilsner model files (the migration path).

The reference persists a compiled model as pickled character tries plus a
SQLite attribute store (model.py:94-187):

* ``<prefix>.normalizers`` — pickle {default unit, word separator,
  tokenizer option, {unit: sic-compiled normalizer payload}}
* ``<prefix>.<N>.dictionary`` — pickle per trie section:
  {'~content': {unit: char-trie}, '~specs': field specs, '~compressed': int,
  ...}; a trie node maps characters (or multi-character radix segments when
  compressed, model.py:pack_subtrie) to child nodes; a terminus carries
  ``'\\x03'`` -> [line ids] and optionally ``'\\x07'`` (stoplisted label,
  utility.py:128-149)
* ``<prefix>.keywords`` — pickle {'~content': {iid: keyword token set},
  '~internal_id_map': {line id: iid}}
* ``<prefix>.attributes`` — SQLite table attrs(n, iid, attr_name,
  attr_value) (model.py:222)

This module walks those files into the engine's :class:`CompiledModel` /
relational tables so an existing compiled model migrates without
recompiling from the source dictionary. The trie content is stored already
normalized, so the matcher import needs no normalizer. Query-side
normalization comes from, in priority order: (1) caller-supplied tokenizer
XML / configs, (2) best-effort interpretation of the pickled sic payloads
in ``.normalizers`` (:mod:`pilsner_spark.sources.sic_payload` — makes the
common migration zero-config), (3) the bypass normalizer (matching still
works for pre-normalized text). Every unit's resolution and every other
degradation (e.g. lost iids in simple models) is recorded in the returned
model's ``import_report`` and logged — degradations are never silent.
"""

from __future__ import annotations

import logging
import os
import sqlite3
from typing import Dict, Iterator, List, Optional, Tuple

from pilsner_spark.core.model import CompiledModel, SynonymRecord
from pilsner_spark.core.normalize import BYPASS
from pilsner_spark.core.scan import TokenIndexedMatcher
from pilsner_spark.sources.sic_payload import parse_sic_payload, tolerant_pickle_load

_LOG = logging.getLogger(__name__)

# reference Model key constants (model.py:23-37)
ENTITY_KEY = "\x03"
ATTRS_KEY = "\x05"
IGNORE_KEY = "\x07"
CONTENT_KEY = "~content"
SPECS_KEY = "~specs"
COMPRESSED_KEY = "~compressed"
WORD_SEPARATOR_KEY = "~word_separator"
TOKENIZER_OPTION_KEY = "~tokenizer_option"
NORMALIZER_KEY = "~normalization"
DEFAULT_NORMALIZER_KEY = "~default_normalizer"
INTERNAL_ID_KEY = "~internal_id_map"

_RESERVED = {ENTITY_KEY, ATTRS_KEY, IGNORE_KEY}


def walk_reference_trie(node: dict, prefix: str = "") -> Iterator[Tuple[str, List[int], bool]]:
    """Yield (normalized label, line ids, ignored) for every terminus.

    Radix-compressed tries need no special casing: a compressed edge is
    just a multi-character key, and the accumulated prefix concatenates
    segments the same way the scanner consumes them.
    """
    if ENTITY_KEY in node:
        yield prefix, list(node[ENTITY_KEY]), IGNORE_KEY in node
    for key, child in node.items():
        if key in _RESERVED:
            continue
        yield from walk_reference_trie(child, prefix + key)


def _load_attrs(path: str) -> Tuple[Dict[int, Dict[str, List[str]]], Dict[int, int]]:
    """Read the attrs SQLite into {line: {attr: [values]}} + {line: iid}."""
    con = sqlite3.connect(path)
    try:
        rows = con.execute("select n, iid, attr_name, attr_value from attrs").fetchall()
    finally:
        con.close()
    attrs: Dict[int, Dict[str, List[str]]] = {}
    line_iid: Dict[int, int] = {}
    for n, iid, name, value in rows:
        attrs.setdefault(n, {}).setdefault(name, []).append(value)
        line_iid[n] = iid
    for per_line in attrs.values():
        for values in per_line.values():
            values.sort()  # the reference iterates an unordered set here
    return attrs, line_iid


def _id_field_name(specs: Optional[dict]) -> Optional[str]:
    """The field name whose column is the entity id (specs['id'] tuple's
    column index matches exactly one field)."""
    if not specs or not specs.get("id"):
        return None
    id_idx = specs["id"][0]
    for name, spec in specs.get("fields", {}).items():
        if spec[0] == id_idx:
            return name
    return None


def import_reference_model(
    prefix: str,
    normalizers: Optional[Dict[str, object]] = None,
    normalizer_map: Optional[Dict[str, str]] = None,
    allow_tokenizer_option_divergence: bool = False,
) -> CompiledModel:
    """Build a :class:`CompiledModel` from reference model files at
    ``<prefix>.{normalizers,*.dictionary,keywords,attributes}``.

    ``normalizers``: {unit name: tokenizer XML / NormalizerConfig} for
    query-side normalization (must use the same unit names the model was
    compiled with); omit it entirely for zero-config migration — each
    unit's pickled sic payload is interpreted (sic_payload module), and
    units whose payload is unrecognizable degrade to bypass with an
    ``import_report`` entry. ``normalizer_map``: dictionary tag -> unit
    routing. The returned model carries ``import_report`` =
    {'units': {unit: 'caller'|'payload'|'bypass'}, 'degraded_lines': int}.

    A model compiled with ``tokenizer_option != 0`` is REFUSED by default
    (ValueError): this engine implements option-0 tokenization (SURVEY
    §2.4 — the option is an opaque mode flag the reference passes through
    to ``sic``, never exercised nonzero in its tests, examples, or docs,
    and ``sic`` is not importable here to pin the alternative semantics),
    so serving such a model would silently normalize query text
    differently than the pipeline that compiled it. Pass
    ``allow_tokenizer_option_divergence=True`` to downgrade the refusal to
    a warning when the caller knows their labels are unaffected (e.g.
    single-token labels, where tokenization mode cannot matter).
    """
    report: Dict[str, object] = {"units": {}, "degraded_lines": 0}
    with open(f"{prefix}.normalizers", "rb") as f:
        norm_meta = tolerant_pickle_load(f)
    with open(f"{prefix}.keywords", "rb") as f:
        kw = tolerant_pickle_load(f)

    model = CompiledModel(word_separator=norm_meta.get(WORD_SEPARATOR_KEY, " "))
    tokenizer_option = norm_meta.get(TOKENIZER_OPTION_KEY, 0) or 0
    report["tokenizer_option"] = int(tokenizer_option)
    if tokenizer_option != 0:
        message = (
            f"import_reference_model: model was compiled with tokenizer_option="
            f"{tokenizer_option}; this engine implements option 0 semantics "
            "(reference model.py:44/60/120 — the flag is passed through to sic, "
            "whose nonzero modes are not reproducible here), so query-time "
            "normalization would diverge from the originating pipeline. Pass "
            "allow_tokenizer_option_divergence=True to import anyway."
        )
        if not allow_tokenizer_option_divergence:
            raise ValueError(message)
        _LOG.warning(message)
    payloads = norm_meta.get(NORMALIZER_KEY, {}) or {}
    ref_units = list(payloads)
    for unit in ref_units:
        cfg = (normalizers or {}).get(unit)
        if cfg is not None:
            report["units"][unit] = "caller"
        else:
            cfg, status = parse_sic_payload(payloads.get(unit))
            if cfg is not None:
                report["units"][unit] = "payload"
            else:
                cfg = BYPASS
                report["units"][unit] = "bypass"
                _LOG.warning(
                    "import_reference_model: unit %r payload unrecognized (%s) and no "
                    "config supplied — degrading to bypass normalization",
                    unit,
                    status,
                )
        model.add_normalizer(unit, cfg)
    default = norm_meta.get(DEFAULT_NORMALIZER_KEY) or (ref_units[0] if ref_units else "")
    if default:
        model.default_normalizer = default
    if normalizer_map:
        model.normalizer_map = dict(normalizer_map)

    line_iid: Dict[int, int] = dict(kw.get(INTERNAL_ID_KEY, {}))
    attrs_path = f"{prefix}.attributes"
    simple = not os.path.exists(attrs_path)
    attrs: Dict[int, Dict[str, List[str]]] = {}
    if not simple:
        attrs, attr_line_iid = _load_attrs(attrs_path)
        for n, iid in attr_line_iid.items():
            line_iid.setdefault(n, iid)
    model.simple = simple
    model.attrs = attrs

    # dictionary sections, in the reference's own load order (model.py:170)
    directory = os.path.dirname(prefix) or "."
    base = os.path.basename(prefix)
    section_files = sorted(
        f for f in os.listdir(directory) if f.startswith(base + ".") and f.endswith(".dictionary")
    )
    model.matchers = {
        unit: TokenIndexedMatcher(word_separator=model.word_separator) for unit in model.normalizers
    }
    id_field = None
    entries: List[Tuple[int, str, str, bool]] = []  # (line_id, unit, norm_label, ignored)
    for fname in section_files:
        with open(os.path.join(directory, fname), "rb") as f:
            section = tolerant_pickle_load(f)
        id_field = id_field or _id_field_name(section.get(SPECS_KEY))
        for unit, trie in section.get(CONTENT_KEY, {}).items():
            if unit not in model.matchers:  # unit missing from .normalizers
                model.add_normalizer(unit, BYPASS)
                report["units"].setdefault(unit, "bypass")
                model.matchers[unit] = TokenIndexedMatcher(word_separator=model.word_separator)
            for norm_label, line_ids, ignored in walk_reference_trie(trie):
                for line_id in line_ids:
                    entries.append((line_id, unit, norm_label, ignored))

    entries.sort(key=lambda t: t[0])  # rebuild in original line order
    for line_id, unit, norm_label, ignored in entries:
        iid = line_iid.get(line_id)
        if iid is None:
            # Models saved with simple=True and include_keywords=False have
            # an EMPTY internal_id_map and no .attributes file: the line->iid
            # association is genuinely lost. Degrade per-line (iid = line_id,
            # entity = 'line:<n>') so every line stays a DISTINCT entity —
            # a constant fallback would silently merge the whole dictionary
            # into one entity in any ER run using the imported model.
            iid = line_id
            report["degraded_lines"] = int(report["degraded_lines"]) + 1
            entity = f"line:{line_id}"
        else:
            entity = None
        if entity is None and id_field and line_id in attrs and id_field in attrs[line_id]:
            entity = attrs[line_id][id_field][0]
        if entity is None:
            # entity string not persisted (store_attributes else-branch
            # state is not saved) — degrade to the dense iid
            entity = f"iid:{iid}"
        model.matchers[unit].add(norm_label, line_id)
        if ignored:
            model.matchers[unit].set_ignored(norm_label)
        model.line_iid[line_id] = iid
        model.line_entity[line_id] = entity
        model.synonyms.append(
            SynonymRecord(line_id=line_id, iid=iid, entity_id=entity, normalizer=unit, norm_label=norm_label)
        )

    model.keywords = {iid: frozenset(tokens) for iid, tokens in kw.get(CONTENT_KEY, {}).items()}
    model.has_keywords = bool(model.keywords) or bool(kw.get(CONTENT_KEY))
    if report["degraded_lines"]:
        _LOG.warning(
            "import_reference_model: %d dictionary lines had no persisted iid "
            "(simple model without keywords) — imported as per-line entities",
            report["degraded_lines"],
        )
    model.import_report = report
    return model
