"""Exporter to the reference pilsner model format (the reverse migration
path, closing the round-3 gap: the importer read the reference's
pickle+SQLite layout, but a user migrating gradually — compile in Spark,
serve with a reference pilsner install — had no path back).

Writes exactly the file set the reference's ``Model.save`` produces
(reference model.py:94-141) and ``Model.load`` consumes (model.py:143-187):

* ``<prefix>.normalizers``   — pickle {default unit, word separator,
  tokenizer option, {unit: payload}}. The per-unit payload is the unit's
  tokenizer XML (the reference's own normalizer CONFIG format — its
  ``add_normalizer`` compiles XML, model.py:188-213). A genuine ``sic``
  compiled ``.data`` blob cannot be produced without the sic package
  (absent in this environment, stated plainly); the XML payload is
  (a) round-tripped exactly by this engine's importer
  (:mod:`pilsner_spark.sources.sic_payload` parses embedded XML) and
  (b) written ALSO as sidecar ``<prefix>.<unit>.tokenizer.xml`` files a
  reference install loads directly via ``model.add_normalizer(unit, path)``.
* ``<prefix>.0.dictionary``  — pickle of one trie section: an UNCOMPRESSED
  character trie per normalization unit (COMPRESSED_KEY=0 — valid in the
  reference, whose compression is an optional compile flag) whose terminus
  nodes carry ENTITY_KEY -> [line ids] and IGNORE_KEY=[] for stoplisted
  labels (reference utility.py:128-149 sets exactly that), plus a specs
  block naming the id/value columns.
* ``<prefix>.keywords``      — pickle {'~content': {iid: keyword token
  set}, '~internal_id_map': {line id: iid}}.
* ``<prefix>.attributes``    — SQLite ``attrs(n, iid, attr_name,
  attr_value)`` (reference model.py:222), one row per value, including the
  id field so entity strings survive the round trip.

Round trip pinned by test: compile the sample dictionary in Spark ->
export -> re-import with :func:`import_reference_model` -> identical parse
spans on the reference's golden text.
"""

from __future__ import annotations

import os
import pickle
import sqlite3
from typing import Dict, Optional

from pilsner_spark.core.model import CompiledModel
from pilsner_spark.core.normalize import config_to_xml
from pilsner_spark.sources.reference_import import (
    COMPRESSED_KEY,
    CONTENT_KEY,
    DEFAULT_NORMALIZER_KEY,
    ENTITY_KEY,
    IGNORE_KEY,
    INTERNAL_ID_KEY,
    NORMALIZER_KEY,
    SPECS_KEY,
    TOKENIZER_OPTION_KEY,
    WORD_SEPARATOR_KEY,
)


def _discover_id_field(model: CompiledModel) -> Optional[str]:
    """The attr name whose value is the entity id on every line (compile
    keeps the id column as a regular attribute, dictionary.py:113-121) —
    lets the export name the id column what the source dictionary did."""
    lines = [n for n in model.line_entity if n in model.attrs]
    if not lines:
        return None
    candidates = None
    for n in lines:
        here = {
            name
            for name, values in model.attrs[n].items()
            if values == [model.line_entity[n]]
        }
        candidates = here if candidates is None else (candidates & here)
        if not candidates:
            return None
    return sorted(candidates)[0]


def _insert_label(trie: dict, label: str, line_id: int, ignored: bool) -> None:
    """Insert one normalized label as an uncompressed character path."""
    node = trie
    for ch in label:
        node = node.setdefault(ch, {})
    node.setdefault(ENTITY_KEY, []).append(line_id)
    if ignored:
        node[IGNORE_KEY] = []  # reference ignore_node sets exactly this


def export_reference_model(
    model: CompiledModel, prefix: str, id_field: Optional[str] = None
) -> Dict[str, object]:
    """Write ``model`` as reference pilsner files at ``<prefix>.*``.

    ``id_field``: name for the entity-id column in specs/attributes;
    defaults to auto-discovery from the compiled attrs (falls back to
    ``'entity_id'`` — the rows are then synthesized so entity strings
    still survive). Returns a manifest {file kind: path} plus counts.
    """
    if id_field is None:
        id_field = _discover_id_field(model) or "entity_id"

    # --- .normalizers + sidecar XML configs --------------------------------
    payloads: Dict[str, str] = {}
    xml_paths = []
    for unit, cfg in model.normalizers.items():
        xml = config_to_xml(cfg)
        payloads[unit] = xml
        xml_path = f"{prefix}.{unit}.tokenizer.xml"
        with open(xml_path, "w", encoding="utf8") as f:
            f.write(xml + "\n")
        xml_paths.append(xml_path)
    normalizers = {
        DEFAULT_NORMALIZER_KEY: model.default_normalizer,
        WORD_SEPARATOR_KEY: model.word_separator,
        TOKENIZER_OPTION_KEY: 0,  # the engine pins option 0 (SURVEY §2.4)
        NORMALIZER_KEY: payloads,
    }
    with open(f"{prefix}.normalizers", "wb") as f:
        pickle.dump(normalizers, f)

    # --- .0.dictionary ------------------------------------------------------
    # synthetic specs: column 0 = entity id, column 1 = the label; remaining
    # attr names follow in sorted order. spec tuple layout mirrors the
    # reference's compile_dict_specs (utility.py:51-81):
    # (column index, delimiter, normalizer_flag, value_flag)
    attr_names = sorted(
        {name for per_line in model.attrs.values() for name in per_line} - {id_field}
    )
    fields = {id_field: (0, "", False, False), "label": (1, "", False, True)}
    for i, name in enumerate(attr_names):
        fields[name] = (2 + i, "", False, False)
    specs = {
        "fields": fields,
        "id": fields[id_field],
        "value": fields["label"],
        "tokenizer": None,
    }
    content: Dict[str, dict] = {unit: {} for unit in model.normalizers}
    n_labels = 0
    for rec in model.synonyms:
        matcher = model.matchers.get(rec.normalizer)
        entry = matcher.by_label.get(rec.norm_label) if matcher else None
        ignored = bool(entry.ignored) if entry is not None else False
        _insert_label(
            content.setdefault(rec.normalizer, {}), rec.norm_label, rec.line_id, ignored
        )
        n_labels += 1
    section = {
        CONTENT_KEY: content,
        SPECS_KEY: specs,
        COMPRESSED_KEY: 0,
        TOKENIZER_OPTION_KEY: 0,
        WORD_SEPARATOR_KEY: model.word_separator,
    }
    with open(f"{prefix}.0.dictionary", "wb") as f:
        pickle.dump(section, f)

    # --- .keywords ----------------------------------------------------------
    keywords = {
        CONTENT_KEY: {iid: set(tokens) for iid, tokens in model.keywords.items()},
        INTERNAL_ID_KEY: dict(model.line_iid),
    }
    with open(f"{prefix}.keywords", "wb") as f:
        pickle.dump(keywords, f)

    # --- .attributes (SQLite) ------------------------------------------------
    attrs_path = f"{prefix}.attributes"
    if os.path.exists(attrs_path):
        os.remove(attrs_path)
    con = sqlite3.connect(attrs_path)
    try:
        cur = con.cursor()
        cur.execute(
            "create table attrs (n integer, iid integer, attr_name text, attr_value text);"
        )
        n_attr_rows = 0
        for line_id, iid in sorted(model.line_iid.items()):
            per_line = dict(model.attrs.get(line_id, {}))
            # the id column must be present for entity-string recovery on
            # import, even for simple models that never stored attrs
            entity = model.line_entity.get(line_id)
            if entity is not None and per_line.get(id_field) != [entity]:
                per_line[id_field] = [entity]
            for name in sorted(per_line):
                for value in per_line[name]:
                    cur.execute(
                        "insert into attrs (n, iid, attr_name, attr_value) values (?, ?, ?, ?);",
                        (line_id, iid, name, value),
                    )
                    n_attr_rows += 1
        con.commit()
    finally:
        con.close()

    return {
        "normalizers": f"{prefix}.normalizers",
        "dictionary": f"{prefix}.0.dictionary",
        "keywords": f"{prefix}.keywords",
        "attributes": attrs_path,
        "tokenizer_xml": xml_paths,
        "id_field": id_field,
        "n_labels": n_labels,
        "n_attr_rows": n_attr_rows,
    }
