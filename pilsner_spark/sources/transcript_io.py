"""Raw transcript ingestion: JSONL (and delimited) crawls -> the
north-rule transcript schema, with a corrupt-record ledger.

A 100 TB corpus does not arrive as clean parquet — it arrives as
millions of JSONL (or TSV) shards with malformed lines, missing fields,
and wrong types mixed in. This module is the ingestion edge of the
pipeline: enforce the (conv_id, turn_idx, role, text, tool, ts) schema
declaratively so Catalyst keeps the scan schema-pruned, and account for
every rejected line instead of silently dropping it (the same
no-silent-truncation rule the rest of the repo follows).

Physical shape: `spark.read.json` / `.csv` with an EXPLICIT schema
(never inferSchema — schema inference is a full extra pass over 100 TB)
in PERMISSIVE mode with `columnNameOfCorruptRecord`: malformed lines
land in the corrupt column instead of killing the job (DROPMALFORMED
hides them; FAILFAST dies at scale on one bad shard). The returned
(valid, ledger) pair are two independent LAZY frames over the same
scan+parse plan: an action on each re-reads and re-parses the shards
(PERMISSIVE parse results are NOT cached across actions), so consuming
both costs TWO passes. At ingestion scale, materialize once and derive
both from the written table — write `valid` (plus the corrupt column)
to parquet in the same job, or checkpoint the parsed frame — rather
than caching 100 TB of parse output in executor memory. Each frame by
itself is a pure projection: zero shuffles, zero UDFs.

Reference anchor: pgolo/pilsner ingests delimited dictionary files
(utility.py:66-121, its only reader); transcripts are the north-rule
extension, and JSONL is the interchange format of public corpus
pipelines (C4/Dolma/RedPajama all ship JSONL shards).
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["TRANSCRIPT_SCHEMA", "read_jsonl_transcripts", "read_delimited_transcripts"]

# the north-rule input shape (BASELINE.json input_hint), plus the corrupt
# column PERMISSIVE mode fills for unparseable lines
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

_CORRUPT = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    return T.StructType(list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())])


def _split_ledger(raw: DataFrame, reason: str) -> Tuple[DataFrame, DataFrame]:
    """(valid, ledger): a row is rejected when the corrupt column is set
    OR a required field is null after parsing (a syntactically fine JSON
    object missing conv_id/turn_idx/text is still unusable). The ledger
    carries the raw line for audit — bounded output: corrupt lines only."""
    required_ok = (
        F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull() & F.col("text").isNotNull()
    )
    ok = F.col(_CORRUPT).isNull() & required_ok
    valid = raw.filter(ok).drop(_CORRUPT)
    ledger = raw.filter(~ok).select(
        F.coalesce(F.col(_CORRUPT), F.to_json(F.struct([c for c in raw.columns if c != _CORRUPT]))).alias("raw_line"),
        F.when(F.col(_CORRUPT).isNotNull(), F.lit(reason))
        .otherwise(F.lit("missing_required_field"))
        .alias("reason"),
    )
    return valid, ledger


def read_jsonl_transcripts(
    spark: SparkSession, path: str, ts_format: str | None = None
) -> Tuple[DataFrame, DataFrame]:
    """Read JSONL transcript shards under ``path``. Returns
    (transcripts, ledger): transcripts in the north-rule schema, ledger =
    (raw_line, reason) for every rejected line. Both are lazy views of the
    same parse plan — see the module docstring for the two-pass caveat."""
    reader = (
        spark.read.schema(_with_corrupt(TRANSCRIPT_SCHEMA))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
    )
    if ts_format:
        reader = reader.option("timestampFormat", ts_format)
    return _split_ledger(reader.json(path), "malformed_json")


def read_delimited_transcripts(
    spark: SparkSession,
    path: str,
    sep: str = "\t",
    header: bool = True,
    ts_format: str | None = None,
) -> Tuple[DataFrame, DataFrame]:
    """Same contract over delimited (TSV/CSV) shards — the reference's
    own ingestion format, extended with the ledger."""
    reader = (
        spark.read.schema(_with_corrupt(TRANSCRIPT_SCHEMA))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("sep", sep)
        .option("header", str(header).lower())
    )
    if ts_format:
        reader = reader.option("timestampFormat", ts_format)
    return _split_ledger(reader.csv(path), "malformed_line")
