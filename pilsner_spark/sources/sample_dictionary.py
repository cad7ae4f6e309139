"""The pilsner test-suite dictionary as a built-in resource.

Content is the reference's fixture data (test/assets/sample_dictionary.txt
and tokenizer{1,2}.xml) — the source of the golden entity assignments the
pipeline must reproduce as labeled pairs (north_rule; FIXTURES.md §2-3).
"""

from __future__ import annotations

from pilsner_spark.core.dictionary import compile_specs, fields_from_dicts, rows_from_lines
from pilsner_spark.core.model import CompiledModel

SAMPLE_DICTIONARY_LINES = [
    "tokenizer1\tentity2\tawesome white refrigerators\tC,D,E",
    "tokenizer1\tentity2\tawesome white refrigeratorx\tD,E",
    "tokenizer2\tentity2\tconflicting refrigerator\tD,E",
    "tokenizer2\tentity1\tawesome white refrigerators\tA,B,C",
    "tokenizer1\tentity1\tawesome white refrigerator\tA,B,C",
    "tokenizer2\tentity1\tawwsome white refrigerator\tA,B,C",
    "tokenizer2\tentity2\tit\tA,B,C",
    "tokenizer2\tentity1\to\tA,B,C",
    "tokenizer2\tentity1\tconflicting refrigerator\tA,B,C",
]

SAMPLE_FIELDS = [
    {"name": "normalizer", "include": True, "delimiter": None, "id_flag": False, "normalizer_flag": True, "value_flag": False},
    {"name": "entity_id", "include": True, "delimiter": None, "id_flag": True, "normalizer_flag": False, "value_flag": False},
    {"name": "label", "include": True, "delimiter": None, "id_flag": False, "normalizer_flag": False, "value_flag": True},
    {"name": "some_attribute", "include": True, "delimiter": ",", "id_flag": False, "normalizer_flag": False, "value_flag": False},
]

T1_XML = """<?xml version="1.0" encoding="UTF-8"?>
<tokenizer name="t1">
  <setting name="cs" value="0" />
  <split where="lmr" value="tors" />
</tokenizer>"""

T2_XML = """<?xml version="1.0" encoding="UTF-8"?>
<tokenizer name="t2">
  <setting name="cs" value="0" />
  <token to="" from="white" />
</tokenizer>"""


def build_sample_model(simple: bool = False) -> CompiledModel:
    """Compile the reference test-suite model (ut_utility.py:18-50 setup)."""
    specs = compile_specs(fields_from_dicts(SAMPLE_FIELDS))
    rows = rows_from_lines(SAMPLE_DICTIONARY_LINES, specs)
    model = CompiledModel(simple=simple)
    model.add_normalizer("t1", T1_XML)
    model.add_normalizer("t2", T2_XML)
    model.normalizer_map = {"tokenizer1": "t1", "tokenizer2": "t2"}
    return model.compile_rows(rows, include_keywords=True)
