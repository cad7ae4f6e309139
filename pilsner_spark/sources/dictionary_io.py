"""Distributed dictionary compilation: delimited file -> model tables.

The Spark-side equivalent of the reference's build pipeline (B1-B13,
SURVEY.md §2.1): reads the dictionary with ``spark.read`` (B1/B2), assigns
stable line numbers and dense first-seen internal ids (B4), normalizes
synonyms under the routed normalization unit (B5, Arrow UDF), melts
attributes to the long layout with list explode (B6/B7), and builds the
keyword table from normalized-synonym collisions (B12). Output tables match
``CompiledModel.to_tables()`` exactly — tested for parity with the
driver-side compile — so either path can feed the broadcast matcher.

Scale notes:
* line numbers come from ``monotonically_increasing_id`` + ``row_number``
  ordered by (input file name, mid): Spark orders a text scan's splits by
  length descending ACROSS files but in byte-offset order WITHIN each file,
  so sorting by file name first restores a deterministic (lexicographic
  file, byte offset) order for multi-file globs, and single-file reads
  reproduce the reference's line order exactly;
* the dense-id ranking is a window over *distinct entities* (not rows) —
  the only global ordering in the build, on the smallest possible input;
* ``to_local_model`` collects only the compiled synonym table (strings +
  ids, no tries) to build the broadcast matcher; for dictionaries beyond
  driver memory the matcher shards by first-token hash (same scan
  semantics, N broadcasts) — sharding hook documented on the function.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pilsner_spark.core.dictionary import DictSpecs, compile_specs, fields_from_dicts
from pilsner_spark.core.model import CompiledModel
from pilsner_spark.core.normalize import NormalizerConfig, normalize


def read_dictionary_file(
    spark: SparkSession,
    path: str,
    fields: Sequence,
    column_separator: str = "\t",
    column_enclosure: str = "",
) -> DataFrame:
    """B1/B2: delimited scan with stable line numbers.

    Returns (line_id, entity_id, synonym, normalizer_tag, <attr columns>).
    """
    field_specs = fields_from_dicts(fields) if fields and isinstance(fields[0], dict) else list(fields)
    specs: DictSpecs = compile_specs(field_specs)
    # Stable line numbers without leaving the DataFrame API (input_hint:
    # no per-row Python): monotonically_increasing_id encodes the scan
    # partition index in its high bits; within one file, split partitions
    # are generated in byte-offset order, but ACROSS files Spark sorts
    # splits by length descending — so the window orders by (file, _mid)
    # to get deterministic (lexicographic file, byte offset) line numbers
    # for multi-file globs too. row_number densifies. The global window
    # runs over the dictionary only — small by construction (labels, not
    # corpus).
    raw = (
        spark.read.text(path)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_fn", F.input_file_name())
        .withColumn("line_id", F.row_number().over(Window.orderBy("_fn", "_mid")) - 1)
        .select(F.col("line_id").cast("bigint"), "value")
    )
    # F.split's pattern argument is a regex: escape the separator so a
    # dictionary delimited by '|', '.', or '+' splits literally (the
    # reference splits literally, model.py:322), not on every character
    cells = F.split(F.col("value"), re.escape(column_separator))
    cols = [F.col("line_id")]
    for name, (idx, _delim, _n, _v) in specs.fields.items():
        c = F.element_at(cells, idx + 1)
        if column_enclosure:
            c = F.regexp_replace(c, f"^[{column_enclosure}]+|[{column_enclosure}]+$", "")
        cols.append(c.alias(name))
    all_names = list(specs.fields.keys())
    id_name = [n for n, s in specs.fields.items() if s[0] == specs.id_index][0]
    value_name = [n for n, s in specs.fields.items() if s[0] == specs.value_index][0]
    tag_name = next((n for n, s in specs.fields.items() if s[0] == specs.tokenizer_index), None)
    df = raw.select(*cols).withColumnRenamed(id_name, "entity_id").withColumnRenamed(value_name, "synonym")
    if tag_name:
        df = df.withColumn("normalizer_tag", F.col(tag_name))
    else:
        df = df.withColumn("normalizer_tag", F.lit(None).cast("string"))
    return df


def assign_internal_ids_df(rows: DataFrame) -> DataFrame:
    """B4: dense internal ids in first-seen order of entity_id values
    (model.py:324-330) — order derives from explicit line numbers, never
    from partition layout. The global window ranks distinct entities only."""
    firsts = rows.groupBy("entity_id").agg(F.min("line_id").alias("first_line"))
    w = Window.orderBy("first_line")
    iids = firsts.select("entity_id", (F.dense_rank().over(w) - 1).cast("bigint").alias("iid"))
    return rows.join(iids, "entity_id")


def normalize_synonyms_df(
    rows: DataFrame,
    normalizers: Dict[str, NormalizerConfig],
    normalizer_map: Dict[str, str],
    default_normalizer: str,
    word_separator: str = " ",
) -> DataFrame:
    """B5: route each row's tag to a normalization unit (model.py:344-351)
    and normalize the synonym inside an Arrow-batched pandas UDF."""
    spark = rows.sparkSession
    bc = spark.sparkContext.broadcast((normalizers, normalizer_map, default_normalizer, word_separator))

    @F.pandas_udf("unit string, norm_label string")
    def norm_udf(tags: pd.Series, synonyms: pd.Series) -> pd.DataFrame:
        units, nmap, default, sep = bc.value
        names, labels = [], []
        for tag, syn in zip(tags, synonyms):
            unit = nmap.get(tag) if tag is not None and tag in nmap else None
            if unit is None or unit not in units:
                unit = default
            names.append(unit)
            labels.append(normalize(syn or "", units[unit], sep))
        return pd.DataFrame({"unit": names, "norm_label": labels})

    out = rows.withColumn("_n", norm_udf(F.col("normalizer_tag"), F.col("synonym")))
    # 'unit' rather than 'normalizer': a dictionary column may itself be
    # named 'normalizer' (the sample fixture's tag column is)
    return out.select(
        *rows.columns, F.col("_n").getField("unit").alias("unit"), F.col("_n").getField("norm_label").alias("norm_label")
    )


def attrs_table(rows: DataFrame, fields: Sequence) -> DataFrame:
    """B6/B7: melt attribute columns to (n, iid, attr_name, attr_value);
    delimited cells exploded + deduped (values sorted for determinism, as
    in the kernel — the reference iterates an unordered set here)."""
    field_specs = fields_from_dicts(fields) if fields and isinstance(fields[0], dict) else list(fields)
    parts = []
    for f in field_specs:
        if not f.include or f.value_flag:
            continue
        col_name = "entity_id" if f.id_flag else f.name
        value = F.col(col_name)
        if f.delimiter:
            # literal split — the delimiter is not a regex (see B1 above)
            exploded = F.explode(
                F.array_sort(F.array_distinct(F.split(value, re.escape(f.delimiter))))
            ).alias("attr_value")
        else:
            exploded = value.alias("attr_value")
        parts.append(
            rows.select(
                F.col("line_id").alias("n"),
                F.col("iid"),
                F.lit(f.name).alias("attr_name"),
                exploded,
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def keywords_table(compiled: DataFrame, word_separator: str = " ", disambiguate_all: bool = False) -> DataFrame:
    """B12: entities whose normalized synonyms collide across entities get
    the union of all their synonyms' tokens (utility.py:250-269)."""
    groups = compiled.groupBy("norm_label").agg(F.countDistinct("iid").alias("n_iids"))
    if disambiguate_all:
        ambiguous_iids = compiled.select("iid").distinct()
    else:
        ambiguous_iids = (
            compiled.join(groups.filter(F.col("n_iids") > 1).select("norm_label"), "norm_label", "left_semi")
            .select("iid")
            .distinct()
        )
    return (
        compiled.join(ambiguous_iids, "iid", "left_semi")
        .select("iid", F.explode(F.split("norm_label", word_separator)).alias("token"))
        .groupBy("iid")
        .agg(F.array_sort(F.collect_set("token")).alias("tokens"))
    )


def compile_dictionary_df(
    spark: SparkSession,
    path: str,
    fields: Sequence,
    normalizers: Dict[str, NormalizerConfig],
    normalizer_map: Optional[Dict[str, str]] = None,
    default_normalizer: Optional[str] = None,
    word_separator: str = " ",
    column_separator: str = "\t",
    column_enclosure: str = "",
    disambiguate_all: bool = False,
) -> Dict[str, DataFrame]:
    """Full distributed compile: returns the model tables
    {'synonyms', 'attrs', 'keywords', 'id_map'} (same layouts as
    CompiledModel.to_tables())."""
    default = default_normalizer or next(iter(normalizers))
    nmap = normalizer_map or {name: name for name in normalizers}
    rows = read_dictionary_file(spark, path, fields, column_separator, column_enclosure)
    rows = assign_internal_ids_df(rows)
    compiled = normalize_synonyms_df(rows, normalizers, nmap, default, word_separator)
    synonyms = compiled.select("line_id", "iid", "entity_id", F.col("unit").alias("normalizer"), "norm_label")
    return {
        "synonyms": synonyms,
        "attrs": attrs_table(compiled, fields),
        "keywords": keywords_table(compiled, word_separator, disambiguate_all),
        "id_map": compiled.select("line_id", "iid"),
    }


def to_local_model(
    tables: Dict[str, DataFrame],
    normalizers: Dict[str, NormalizerConfig],
    normalizer_map: Optional[Dict[str, str]] = None,
    default_normalizer: Optional[str] = None,
    word_separator: str = " ",
    simple: bool = False,
) -> CompiledModel:
    """Materialize the broadcastable matcher from the compiled tables.

    Collects only (norm_label, line_id, normalizer) strings plus the attr
    rows — no trie objects. For dictionaries beyond driver memory, shard
    this collect by ``pmod(xxhash64(split(norm_label,' ')[0]), N)`` and
    broadcast one matcher shard per scan pass (identical semantics: the
    scan unions matches across shards exactly like the reference unions
    its ``item_limit`` tries, utility.py:438-517)."""
    model = CompiledModel(word_separator=word_separator, simple=simple)
    model.normalizers = dict(normalizers)
    model.normalizer_map = normalizer_map or {n: n for n in normalizers}
    model.default_normalizer = default_normalizer or next(iter(normalizers))
    from pilsner_spark.core.scan import TokenIndexedMatcher

    model.matchers = {name: TokenIndexedMatcher(word_separator=word_separator) for name in normalizers}
    for r in tables["synonyms"].orderBy("line_id").collect():
        model.matchers[r.normalizer].add(r.norm_label, r.line_id)
        model.line_iid[r.line_id] = r.iid
        model.line_entity[r.line_id] = r.entity_id
        model.synonyms.append(
            __import__("pilsner_spark.core.model", fromlist=["SynonymRecord"]).SynonymRecord(
                line_id=r.line_id, iid=r.iid, entity_id=r.entity_id, normalizer=r.normalizer, norm_label=r.norm_label
            )
        )
    if not simple:
        for r in tables["attrs"].collect():
            model.attrs.setdefault(r.n, {}).setdefault(r.attr_name, []).append(r.attr_value)
    model.keywords = {r.iid: frozenset(r.tokens) for r in tables["keywords"].collect()}
    model.has_keywords = True
    return model
