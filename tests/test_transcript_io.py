"""JSONL / delimited transcript ingestion (sources/transcript_io.py):
schema-enforced PERMISSIVE parse, every rejected line accounted for in
the ledger — none silently dropped, valid + ledger rows == input lines."""

import os

from pyspark.sql import functions as F

from pilsner_spark.sources.transcript_io import (
    read_delimited_transcripts,
    read_jsonl_transcripts,
)

GOOD1 = '{"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hello there", "tool": "none", "ts": "2026-01-02T03:04:05.000Z"}'
GOOD2 = '{"conv_id": "c1", "turn_idx": 1, "role": "assistant", "text": "hi", "tool": "none", "ts": null}'
MALFORMED = '{"conv_id": "c2", "turn_idx": 0, "role": "user", "text": "unterminated'
MISSING = '{"conv_id": "c3", "role": "user", "tool": "none"}'  # no turn_idx/text
WRONG_TYPE = '{"conv_id": "c4", "turn_idx": "zero", "role": "user", "text": "x"}'


def test_jsonl_ingest_splits_valid_and_ledger(spark, tmp_path):
    p = tmp_path / "shard.jsonl"
    p.write_text("\n".join([GOOD1, MALFORMED, GOOD2, MISSING, WRONG_TYPE]) + "\n")
    valid, ledger = read_jsonl_transcripts(spark, str(p))
    rows = {(r.conv_id, r.turn_idx): r for r in valid.collect()}
    led = ledger.collect()
    assert set(rows) == {("c1", 0), ("c1", 1)}
    assert rows[("c1", 0)].text == "hello there"
    assert rows[("c1", 0)].ts is not None and rows[("c1", 1)].ts is None
    # schema is the north-rule shape, corrupt column gone
    assert valid.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    # every rejected line is in the ledger with a reason; nothing vanishes
    assert len(led) == 3
    reasons = sorted(r.reason for r in led)
    assert "malformed_json" in reasons and "missing_required_field" in reasons
    assert valid.count() + ledger.count() == 5
    # the raw malformed line is preserved verbatim for audit
    assert any(r.raw_line == MALFORMED for r in led)


def test_delimited_ingest_contract(spark, tmp_path):
    p = tmp_path / "shard.tsv"
    lines = [
        "conv_id\tturn_idx\trole\ttext\ttool\tts",
        "c1\t0\tuser\thello\tnone\t2026-01-02T03:04:05.000Z",
        "c2\tnot_an_int\tuser\tbroken\tnone\t",  # wrong type -> corrupt
        "c3\t1\tassistant\t\t\t",  # empty text -> missing required
    ]
    p.write_text("\n".join(lines) + "\n")
    valid, ledger = read_delimited_transcripts(spark, str(p), sep="\t")
    assert {(r.conv_id, r.turn_idx) for r in valid.collect()} == {("c1", 0)}
    assert ledger.count() == 2
    assert valid.count() + ledger.count() == 3


def test_jsonl_ingest_is_pure_projection(spark, tmp_path):
    """Scale shape: the split is filter/projection over ONE scan — no
    shuffle (Exchange) and no Python in either branch's plan."""
    p = tmp_path / "shard2.jsonl"
    p.write_text(GOOD1 + "\n")
    valid, ledger = read_jsonl_transcripts(spark, str(p))
    for df in (valid, ledger):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "EvalPython" not in plan and "MapInPandas" not in plan
