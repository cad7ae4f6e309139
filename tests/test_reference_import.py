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


def test_walk_trie_handles_radix_segments():
    trie = {"ab": {"cd": {ENTITY_KEY: [3]}, ENTITY_KEY: [1], "x": {ENTITY_KEY: [2], IGNORE_KEY: []}}}
    got = sorted(walk_reference_trie(trie))
    assert got == [("ab", [1], False), ("abcd", [3], False), ("abx", [2], True)]
