"""Distributed dictionary compile must agree with the driver-side kernel."""

import os

from conftest import FIXTURES, SAMPLE_FIELDS, T1_XML, T2_XML, build_sample_model

from pilsner_spark.core.normalize import normalizer_from_xml_string
from pilsner_spark.core.parse import parse
from pilsner_spark.sources.dictionary_io import compile_dictionary_df, to_local_model

NORMALIZERS = {"t1": normalizer_from_xml_string(T1_XML), "t2": normalizer_from_xml_string(T2_XML)}
NMAP = {"tokenizer1": "t1", "tokenizer2": "t2"}


def _compile(spark):
    return compile_dictionary_df(
        spark,
        os.path.join(FIXTURES, "sample_dictionary.txt"),
        SAMPLE_FIELDS,
        normalizers=NORMALIZERS,
        normalizer_map=NMAP,
        default_normalizer="t1",
    )


def test_distributed_compile_parity(spark, sample_model):
    """Every model table from the DataFrame compile path equals the
    driver-side kernel compile (B1-B12 parity)."""
    tables = _compile(spark)
    expected = sample_model.to_tables()
    got_syn = sorted(tuple(r) for r in tables["synonyms"].collect())
    assert got_syn == sorted(expected["synonyms"])
    got_attrs = sorted(tuple(r) for r in tables["attrs"].collect())
    assert got_attrs == sorted(expected["attrs"])
    got_kw = sorted((r.iid, tuple(r.tokens)) for r in tables["keywords"].collect())
    assert got_kw == sorted((iid, tuple(toks)) for iid, toks in expected["keywords"])
    got_ids = sorted(tuple(r) for r in tables["id_map"].collect())
    assert got_ids == sorted(expected["id_map"])


def test_pipe_delimited_dictionary_splits_literally(spark, tmp_path):
    """Regex-special column separators ('|') and attr delimiters ('+') must
    split literally, not on every character (the reference splits literally,
    model.py:322)."""
    path = str(tmp_path / "pipe_dict.txt")
    with open(path, "w") as f:
        f.write("E1|alpha beta|x+y\nE2|gamma|z\n")
    fields = [
        {"name": "entity_id", "include": True, "delimiter": None, "id_flag": True, "normalizer_flag": False, "value_flag": False},
        {"name": "label", "include": True, "delimiter": None, "id_flag": False, "normalizer_flag": False, "value_flag": True},
        {"name": "tags", "include": True, "delimiter": "+", "id_flag": False, "normalizer_flag": False, "value_flag": False},
    ]
    from pilsner_spark.core.normalize import BYPASS

    tables = compile_dictionary_df(
        spark, path, fields, normalizers={"bypass": BYPASS}, column_separator="|"
    )
    syn = sorted((r.line_id, r.entity_id, r.norm_label) for r in tables["synonyms"].collect())
    assert syn == [(0, "E1", "alpha beta"), (1, "E2", "gamma")]
    tags = sorted(
        (r.n, r.attr_value) for r in tables["attrs"].collect() if r.attr_name == "tags"
    )
    assert tags == [(0, "x"), (0, "y"), (1, "z")]


def test_local_model_roundtrip_parse(spark, sample_model):
    """A model rebuilt from the distributed tables parses identically
    (the golden flagship string) — B14/B15 relational persistence."""
    tables = _compile(spark)
    model = to_local_model(tables, NORMALIZERS, NMAP, "t1")
    text = "this is awwsome white refrigerator o refrigerator, is it tors not conflicting refrigerator hey"
    assert parse(model, text) == parse(sample_model, text)
