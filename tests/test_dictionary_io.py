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


def test_local_model_roundtrip_parse(spark, sample_model):
    """A model rebuilt from the distributed tables parses identically
    (the golden flagship string) — B14/B15 relational persistence."""
    tables = _compile(spark)
    model = to_local_model(tables, NORMALIZERS, NMAP, "t1")
    text = "this is awwsome white refrigerator o refrigerator, is it tors not conflicting refrigerator hey"
    assert parse(model, text) == parse(sample_model, text)
