"""Deterministic synthetic transcript corpus (the pipeline's input table).

Schema per BASELINE.json ``input_hint``:
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)`` plus ground-truth side columns ``planted_entity`` /
``planted_label`` (dropped from the pipeline input view, used only for
labeled pairs and audits).

Generation is **fully JVM-side and distributed**: every value is a pure
function of (seed, conv ordinal, turn ordinal) through ``xxhash64``, so the
corpus is reproducible at any scale and parallelism without a driver-side
loop — the same construction works for 10^3 and 10^12 turns. Conversation
lengths are Zipf-skewed (a small fraction of very long conversations) to
exercise salting/AQE on hot blocking keys, following the corpus design of
the reference's performance harness (test/performance.py:7-15, 103-115:
random filler words with planted dictionary labels).
"""

from __future__ import annotations

import random
import string
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH_SECONDS = 1704067200  # 2024-01-01T00:00:00Z, fixed

ROLES = ["user", "assistant", "tool"]
TOOLS = ["none", "search", "code"]


@dataclass(frozen=True)
class Plant:
    """One plantable dictionary label with its ground-truth entity and an
    optional disambiguating keyword injected next to it."""

    label: str
    entity: str
    keyword: str = ""


# The pilsner test-suite plants (sample_dictionary.txt): per-entity synonyms
# plus the ambiguous surface 'conflicting refrigerator', which belongs to
# both entities and is resolvable only through context keywords — the
# hardest labeled pair (FIXTURES.md §5, golden ut_utility.py:402-412).
SAMPLE_PLANTS: Tuple[Plant, ...] = (
    Plant("awesome white refrigerator", "entity1"),
    Plant("awwsome white refrigerator", "entity1"),
    Plant("conflicting refrigerator", "entity1", keyword="awwsome"),
    Plant("awesome white refrigerators", "entity2"),
    Plant("awesome white refrigeratorx", "entity2"),
    Plant("conflicting refrigerator", "entity2", keyword="tors"),
    Plant("it", "entity2"),
)


def filler_vocab(size: int = 400, seed: int = 42, forbidden: Sequence[str] = ()) -> List[str]:
    """Deterministic filler-word vocabulary (3-10 lowercase chars), with any
    token colliding with dictionary/keyword tokens removed."""
    rng = random.Random(seed)
    banned = set(forbidden)
    out: List[str] = []
    seen = set()
    while len(out) < size:
        w = "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(3, 10)))
        if w in banned or w in seen:
            continue
        seen.add(w)
        out.append(w)
    return out


def synthetic_plants(n_entities: int, synonyms_per_entity: int = 3, seed: int = 42) -> List[Plant]:
    """Large unambiguous dictionary for throughput runs (reference
    performance.py shape: n entities x 1-5 labels). Synonyms of one entity
    share a base token so blocked pairs still co-occur."""
    rng = random.Random(seed * 7 + 1)
    plants: List[Plant] = []
    seen_bases = set()
    for k in range(n_entities):
        while True:
            base = "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(5, 9)))
            if base not in seen_bases:
                seen_bases.add(base)
                break
        n_syn = 1 + (k % synonyms_per_entity)
        for s in range(n_syn):
            variant = "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(3, 6)))
            label = f"{base} {variant}" if s else base
            plants.append(Plant(label=label, entity=f"syn_{k:06d}"))
    return plants


def _h(*cols) -> "F.Column":
    return F.xxhash64(*cols)


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 500,
    seed: int = 42,
    plants: Sequence[Plant] = SAMPLE_PLANTS,
    plant_rate: float = 0.75,
    vocab_size: int = 400,
    hot_conv_every: int = 40,
    hot_conv_turns: int = 120,
    hard_conv_every: Optional[int] = None,
    hard_conv_turns: int = 12,
) -> DataFrame:
    """Generate the transcripts table + ground truth, distributed.

    Every 1/*hot_conv_every* conversation is 'hot' (*hot_conv_turns* turns)
    — the skew that blocking/salting must absorb; the rest have 3-14 turns.

    ``hard_conv_every`` (opt-in) plants the hard slice that makes the
    string-similarity features earn the F1 instead of riding on
    ``shared_entity``: every 1/*hard_conv_every* conversation becomes a
    TEMPLATE conversation — all its turns share one conversation-level
    filler template, so turn texts are near-identical except for the
    planted surface. Alternating kinds:

    * **hard-negative** conversations cycle DIFFERENT entities' surfaces
      through the shared template: near-identical texts (high JW/Jaccard)
      with different ground-truth entities — false positives unless the
      scorer respects conflicting dictionary resolutions.
    * **typo-positive** conversations plant ONE entity; odd turns carry a
      corrupted surface ('zz' + label[1:], absent from the dictionary) so
      the mention scan cannot resolve them — those turns reach their
      entity's cluster only via a similarity edge to a clean template twin
      (false negatives unless JW/Jaccard actually work).

    ``plant_style`` records the slice per turn: plain | hard_neg |
    typo_clean | typo | null.
    """
    forbidden = {t for p in plants for t in p.label.split()} | {p.keyword for p in plants if p.keyword}
    vocab = filler_vocab(vocab_size, seed, sorted(forbidden))
    vocab_col = F.array(*[F.lit(w) for w in vocab])
    labels_col = F.array(*[F.lit(p.label) for p in plants])
    keywords_col = F.array(*[F.lit(p.keyword) for p in plants])
    entities_col = F.array(*[F.lit(p.entity) for p in plants])
    n_plants = len(plants)
    v = len(vocab)
    s = F.lit(seed)

    hard_enabled = hard_conv_every is not None
    # hard ids sit at id % hard_conv_every == 1, disjoint from the hot
    # convs at id % hot_conv_every == 0
    is_hard = (
        (F.col("id") % hard_conv_every == 1) if hard_enabled else F.lit(False)
    )
    # alternate hard kinds: 0 = hard-negative templates, 1 = typo-positives
    hard_kind = (
        F.pmod((F.col("id") / hard_conv_every).cast("bigint"), F.lit(2))
        if hard_enabled
        else F.lit(0)
    )

    conv = (
        spark.range(n_convs)
        .withColumn("conv_id", F.format_string("conv_%08d", F.col("id")))
        .withColumn(
            "n_turns",
            F.when(is_hard, F.lit(hard_conv_turns))
            .when(F.col("id") % hot_conv_every == 0, F.lit(hot_conv_turns))
            .otherwise(
                (F.pmod(_h(s, F.col("id"), F.lit("len")), F.lit(12)) + F.lit(3)).cast("int")
            ),
        )
    )
    turns = conv.select(
        "id",
        "conv_id",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    ).withColumn("turn_idx", F.col("turn_idx").cast("int"))

    def words(tag: str, count_col, conv_level: bool = False):
        """count_col deterministic filler words joined by single spaces.
        ``conv_level`` drops turn_idx from the hash so every turn of the
        conversation shares the same filler (the hard-slice template)."""
        key = [s, F.col("id")] + ([] if conv_level else [F.col("turn_idx")]) + [F.lit(tag)]
        return F.array_join(
            F.transform(
                F.sequence(F.lit(1), count_col),
                lambda i: F.element_at(vocab_col, (F.pmod(_h(*key, i), F.lit(v)) + 1).cast("int")),
            ),
            " ",
        )

    # plant choice: hard-negative convs cycle every surface through the
    # template; typo convs pin one surface per conversation; plain turns
    # draw per-turn
    plant_pick = (
        F.when(is_hard & (hard_kind == 0), F.pmod(F.col("turn_idx"), F.lit(n_plants)) + 1)
        .when(is_hard & (hard_kind == 1), F.pmod(_h(s, F.col("id"), F.lit("tpick")), F.lit(n_plants)) + 1)
        .otherwise(F.pmod(_h(s, F.col("id"), F.col("turn_idx"), F.lit("plant")), F.lit(n_plants)) + 1)
    )
    has_plant = is_hard | (
        F.pmod(_h(s, F.col("id"), F.col("turn_idx"), F.lit("rate")), F.lit(1000))
        < F.lit(int(plant_rate * 1000))
    )
    is_typo = is_hard & (hard_kind == 1) & (F.pmod(F.col("turn_idx"), F.lit(2)) == 1)
    n_pre = F.when(is_hard, F.lit(4)).otherwise(
        (F.pmod(_h(s, F.col("id"), F.col("turn_idx"), F.lit("npre")), F.lit(6)) + 2).cast("int")
    )
    n_post = F.when(is_hard, F.lit(4)).otherwise(
        (F.pmod(_h(s, F.col("id"), F.col("turn_idx"), F.lit("npost")), F.lit(6)) + 2).cast("int")
    )

    def filler(tag: str, count_col):
        return F.when(is_hard, words(tag, count_col, conv_level=True)).otherwise(
            words(tag, count_col)
        )

    clean_label = F.element_at(labels_col, plant_pick.cast("int"))
    emitted_label = F.when(
        is_typo, F.concat(F.lit("zz"), F.substring(clean_label, 2, 1 << 20))
    ).otherwise(clean_label)

    out = (
        turns.withColumn("role", F.element_at(F.array(*[F.lit(r) for r in ROLES]), (F.pmod(F.col("turn_idx"), F.lit(3)) + 1).cast("int")))
        .withColumn("tool", F.element_at(F.array(*[F.lit(t) for t in TOOLS]), (F.pmod(_h(s, F.col("id"), F.lit("tool")), F.lit(3)) + 1).cast("int")))
        .withColumn("ts", F.timestamp_seconds(F.lit(EPOCH_SECONDS) + F.col("id") * 3600 + F.col("turn_idx") * 7))
        .withColumn("planted_label", F.when(has_plant, emitted_label))
        .withColumn("planted_keyword", F.when(has_plant, F.element_at(keywords_col, plant_pick.cast("int"))))
        .withColumn("planted_entity", F.when(has_plant, F.element_at(entities_col, plant_pick.cast("int"))))
        .withColumn(
            "plant_style",
            F.when(~has_plant, F.lit(None).cast("string"))
            .when(is_typo, F.lit("typo"))
            .when(is_hard & (hard_kind == 1), F.lit("typo_clean"))
            .when(is_hard, F.lit("hard_neg"))
            .otherwise(F.lit("plain")),
        )
        .withColumn(
            "text",
            F.when(
                has_plant,
                F.concat_ws(
                    " ",
                    filler("pre", n_pre),
                    F.when(F.col("planted_keyword") != "", F.col("planted_keyword")),
                    F.col("planted_label"),
                    filler("post", n_post),
                ),
            ).otherwise(filler("only", n_pre + n_post)),
        )
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts", "planted_entity", "planted_label", "plant_style")
    )
    return out


def pipeline_input(transcripts: DataFrame) -> DataFrame:
    """The exact input_hint schema (ground truth stripped)."""
    return transcripts.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
