"""Model EXPORT to the reference format (VERDICT r3 item 7): compile in
Spark -> export_reference_model -> re-import with import_reference_model
(zero-config) -> identical synonym tables, keywords, attributes, and parse
spans on the reference's golden text. The reference engine itself cannot
run here (its `sic` dependency is absent), so the round trip is pinned
through this engine's importer, which reads exactly the reference
Model.save file layout (model.py:94-187) the exporter writes."""

import pickle
import sqlite3

from pilsner_spark.core.normalize import (
    config_to_xml,
    normalize,
    normalizer_from_xml_string,
)
from pilsner_spark.core.parse import extract_mentions, parse
from pilsner_spark.sources.reference_export import export_reference_model
from pilsner_spark.sources.reference_import import (
    CONTENT_KEY,
    INTERNAL_ID_KEY,
    import_reference_model,
    walk_reference_trie,
)
from pilsner_spark.sources.sample_dictionary import (
    T1_XML,
    T2_XML,
    build_sample_model,
)

GOLDEN = "this is awwsome white refrigerator o refrigerator, is it tors not conflicting refrigerator hey"


def test_config_to_xml_roundtrip():
    """config_to_xml is the exact inverse of normalizer_from_xml_string."""
    for xml in (T1_XML, T2_XML):
        cfg = normalizer_from_xml_string(xml)
        assert normalizer_from_xml_string(config_to_xml(cfg)) == cfg


def test_export_roundtrip_parse_parity(tmp_path):
    """Spark-compiled model -> reference files -> zero-config re-import:
    identical synonym tables (line ids, iids, entity strings, units,
    normalized labels), keywords, attributes, and golden parse spans."""
    native = build_sample_model()
    prefix = str(tmp_path / "exported")
    manifest = export_reference_model(native, prefix)
    assert manifest["id_field"] == "entity_id"  # discovered from attrs
    assert manifest["n_labels"] == len(native.synonyms)

    imported = import_reference_model(prefix)  # NO caller-supplied configs
    # normalizer payloads are exported XML — the zero-config interpreter
    # must recover them exactly (never degrade to bypass)
    assert set(imported.import_report["units"].values()) == {"payload"}
    assert imported.import_report["degraded_lines"] == 0

    imp_rows = sorted(
        (r.line_id, r.iid, r.entity_id, r.normalizer, r.norm_label) for r in imported.synonyms
    )
    nat_rows = sorted(
        (r.line_id, r.iid, r.entity_id, r.normalizer, r.norm_label) for r in native.synonyms
    )
    assert imp_rows == nat_rows
    assert imported.keywords == native.keywords
    assert imported.attrs == native.attrs
    assert parse(imported, GOLDEN) == parse(native, GOLDEN)
    for text in (GOLDEN, "awesome white refrigerators here", "nothing to see"):
        a = [(m.begin, m.end, m.entity_ids) for m in extract_mentions(imported, text)]
        b = [(m.begin, m.end, m.entity_ids) for m in extract_mentions(native, text)]
        assert a == b


def test_export_file_layout_is_reference_shaped(tmp_path):
    """The written files match the reference Model.save structures
    byte-for-structure: an uncompressed char trie whose termini carry
    '\\x03' line-id lists, the keywords pickle with '~internal_id_map',
    and the attrs SQLite table (n, iid, attr_name, attr_value)."""
    native = build_sample_model()
    prefix = str(tmp_path / "exported")
    export_reference_model(native, prefix)

    with open(f"{prefix}.0.dictionary", "rb") as f:
        section = pickle.load(f)
    labels = {
        (unit, label): sorted(ids)
        for unit, trie in section[CONTENT_KEY].items()
        for label, ids, _ign in walk_reference_trie(trie)
    }
    expected: dict = {}
    for r in native.synonyms:  # shared labels carry ALL their line ids at
        expected.setdefault((r.normalizer, r.norm_label), []).append(r.line_id)  # one terminus
    assert labels == {k: sorted(v) for k, v in expected.items()}

    with open(f"{prefix}.keywords", "rb") as f:
        kw = pickle.load(f)
    assert kw[INTERNAL_ID_KEY] == native.line_iid
    assert kw[CONTENT_KEY] == {iid: set(t) for iid, t in native.keywords.items()}

    con = sqlite3.connect(f"{prefix}.attributes")
    try:
        rows = con.execute(
            "select n, iid, attr_name, attr_value from attrs order by n, attr_name, attr_value"
        ).fetchall()
    finally:
        con.close()
    assert rows  # every line carries at least the id field
    by_line = {}
    for n, iid, name, value in rows:
        assert iid == native.line_iid[n]
        by_line.setdefault(n, {}).setdefault(name, []).append(value)
    for n, per_line in by_line.items():
        assert per_line["entity_id"] == [native.line_entity[n]]


def test_export_preserves_ignore_tags(tmp_path):
    """A stoplisted label (set_ignored — reference ignore_node) must stay
    suppressed through export -> import."""
    native = build_sample_model()
    # stoplist the normalized form of 'it' in its unit, as the reference
    # ignore tests do
    target = normalize("it", native.normalizers["t2"], " ")
    assert native.matchers["t2"].set_ignored(target)
    prefix = str(tmp_path / "exported_ign")
    export_reference_model(native, prefix)
    imported = import_reference_model(prefix)
    entry = imported.matchers["t2"].by_label[target]
    assert entry.ignored
    assert parse(imported, GOLDEN) == parse(native, GOLDEN)
