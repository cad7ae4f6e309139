"""Golden tests for the sic-subset normalizer (SURVEY.md §2.4).

Expected strings come from the reference's test expectations:
ut_model.py:164-183 (tokenization), ut_utility.py:126-159/203-224
(normalized trie contents pin t1/t2 outputs), misc/example (splits/rewrites).
"""

from conftest import CUSTOM_XML, DEFAULT_XML, T1_XML, T2_XML

from pilsner_spark.core.normalize import (
    BYPASS,
    normalize,
    normalize_with_map,
    normalizer_from_xml_string,
)

T1 = normalizer_from_xml_string(T1_XML)
T2 = normalizer_from_xml_string(T2_XML)
DEFAULT = normalizer_from_xml_string(DEFAULT_XML)
CUSTOM = normalizer_from_xml_string(CUSTOM_XML)


def test_xml_parsing():
    assert T1.lowercase and not T1.bypass
    assert T1.rules[0].kind == "split" and T1.rules[0].frm == "tors" and T1.rules[0].where == "lmr"
    assert T2.rules[0].kind == "token" and T2.rules[0].frm == "white" and T2.rules[0].to == ""


def test_punctuation_tokenization():
    # golden: ut_model.py:182
    assert normalize("string_value", T1) == "string _ value"
    assert normalize("refrigerator, is", T2) == "refrigerator , is"


def test_case_folding():
    assert normalize("Daniorerio", CUSTOM) == "daniorerio"


def test_split_rules():
    # golden trie content ut_utility.py:219 (t1 branch)
    assert normalize("awesome white refrigerators", T1) == "awesome white refrigera tors"
    # split must not fire when one side would be empty ('tors' token itself)
    assert normalize("is it tors not", T1) == "is it tors not"
    # right-anchored split (misc/example/default_normalizer.xml)
    assert normalize("Daniorerio", DEFAULT) == "danio rerio"
    assert normalize("danio rerio", DEFAULT) == "danio rerio"


def test_token_rules():
    # golden trie content ut_utility.py:219 (t2 branch)
    assert normalize("awesome white refrigerators", T2) == "awesome refrigerators"
    assert normalize("awwsome white refrigerator", T2) == "awwsome refrigerator"
    # rewrite (misc/example/custom_normalizer.xml)
    assert normalize("water lily", CUSTOM) == "water lilies"
    assert normalize("water lilies", CUSTOM) == "water lilies"
    # removal (misc/example/default_normalizer.xml)
    assert normalize("big scary eagle", DEFAULT) == "big eagle"
    # leading-token removal swallows the following separator
    assert normalize("white cat", T2) == "cat"


def test_reserved_chars_stripped_everywhere():
    # model.py:199-206; golden span shift ut_utility.py:432-437
    assert normalize("awesome\x03 white refrigerator", T1) == "awesome white refrigerator"
    assert normalize("a\x07b\x05c", BYPASS) == "abc"


def test_bypass_identity():
    assert normalize("Awesome White_Refrigerators", BYPASS) == "Awesome White_Refrigerators"


def test_map_identity_when_no_rewrites():
    r = normalize_with_map("this is fine", T2)
    assert r.normalized == "this is fine"
    assert r.n2o == list(range(12))
    assert r.o2n == [[i, i] for i in range(12)]


def test_map_token_removal():
    # 'this is awwsome white refrigerator' -> t2 removes 'white' plus the
    # separator before it; surviving separator is the original one at 21
    # (map shape golden: ut_utility.py:329-330 fixture)
    text = "this is awwsome white refrigerator"
    r = normalize_with_map(text, T2)
    assert r.normalized == "this is awwsome refrigerator"
    assert r.n2o[15] == 21  # surviving separator
    assert r.n2o[16] == 22  # 'r' of refrigerator
    assert r.o2n[15] == [14, 14] and r.o2n[20] == [14, 14]  # erased chars carry last emit
    assert r.o2n[21] == [15, 15]


def test_map_punctuation_insertion():
    # 'refrigerator,' -> 'refrigerator ,': inserted separator and the comma
    # both map to the comma's original index (fixture map ut_utility.py:315)
    text = "refrigerator, x"
    r = normalize_with_map(text, T1)
    assert r.normalized == "refrigerator , x"
    assert r.n2o[12] == 12 and r.n2o[13] == 12
    assert r.o2n[12] == [12, 13]
    assert r.n2o[15] == 14


def test_map_full_parse_string():
    # the test_parse source (ut_utility.py:404): t2 layer offsets must remap
    # to the golden original spans (8,34) (35,36) (54,56) (66,90)
    text = "this is awwsome white refrigerator o refrigerator, is it tors not conflicting refrigerator hey"
    r = normalize_with_map(text, T2)
    assert (
        r.normalized
        == "this is awwsome refrigerator o refrigerator , is it tors not conflicting refrigerator hey"
    )
    assert r.n2o[8] == 8 and r.n2o[28] == 34
    assert r.n2o[29] == 35 and r.n2o[30] == 36
    assert r.n2o[49] == 54 and r.n2o[51] == 56
    assert r.n2o[61] == 66 and r.n2o[85] == 90


def test_reserved_char_map_shift():
    # ut_utility.py:432-437: '\x03' erased, span end shifts by one
    text = "this is awesome\x03 white refrigerator hey hey"
    r = normalize_with_map(text, T1)
    assert r.normalized == "this is awesome white refrigerator hey hey"
    assert r.n2o[8] == 8 and r.n2o[34] == 35
