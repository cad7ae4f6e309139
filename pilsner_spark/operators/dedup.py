"""Deduplication operators for training-data pipelines.

Exact (hash group-by), MinHash+LSH (shingle -> minhash -> band -> bucket
self-join), SimHash, and n-gram Jaccard — all as DataFrame compositions with
engine-portable hashing (md5-derived, see functions.text.md5_long) so every
operator has a DuckDB oracle. At scale the band self-join is the shuffle to
watch: band keys are the blocking keys, and the same salting/AQE treatment
as ER blocking applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pilsner_spark.functions.text import md5_long, tokens


def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups on the raw text: keeper id + group size.
    One shuffle (hash aggregation with map-side partial)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def shingles(text_col, n: int = 3):
    """Word n-gram shingle array (JVM-side, no UDF)."""
    toks = tokens(text_col)
    k = F.size(toks) - (n - 1)
    return F.when(k <= 0, F.array(F.array_join(toks, " "))).otherwise(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def minhash_signature(text_col, num_hashes: int = 12, shingle_n: int = 3, seed: int = 7):
    """MinHash signature over word shingles: minhash_i = min over shingles
    of md5_long(shingle || '#' || i) — deterministic and oracle-portable."""
    sh = F.array_distinct(shingles(text_col, shingle_n))
    return F.array(
        *[
            F.array_min(
                F.transform(sh, lambda s: md5_long(F.concat(s, F.lit(f"#{seed}#{i}"))))
            )
            for i in range(num_hashes)
        ]
    )


def minhash_bands(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    band_size: int = 2,
    shingle_n: int = 3,
    seed: int = 7,
) -> DataFrame:
    """(id, band_key) rows: documents sharing a band key are near-dup
    candidates. band_key folds band index + the band's minhashes."""
    sig = minhash_signature(F.col(text_col), num_hashes, shingle_n, seed)
    n_bands = num_hashes // band_size
    with_sig = df.select(F.col(id_col).alias("doc_id"), sig.alias("sig"))
    bands = [
        F.concat_ws(
            "#",
            F.lit(str(b)),
            *[F.col("sig")[b * band_size + j].cast("string") for j in range(band_size)],
        )
        for b in range(n_bands)
    ]
    return with_sig.select("doc_id", F.explode(F.array(*bands)).alias("band_key"))


def minhash_candidate_pairs(bands: DataFrame) -> DataFrame:
    """Distinct candidate near-dup pairs from shared band keys."""
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, "band_key")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


def simhash(text_col, bits: int = 16, seed: int = 11):
    """SimHash over tokens: bit b set when the sum over tokens of
    (+1 if md5-derived bit b of token else -1) is positive. ``bits`` kept
    small so the oracle stays tractable; the construction scales to 64."""
    toks = F.array_distinct(tokens(text_col))

    def bit_sum(b: int):
        def merge(a, t):
            return a + F.when(
                F.pmod(md5_long(F.concat(t, F.lit(f"@{seed}@{b}"))), 2) == 1, 1
            ).otherwise(-1)

        return F.aggregate(toks, F.lit(0), merge)

    acc = [bit_sum(b) for b in range(bits)]
    out = F.lit(0).cast("bigint")
    for b, s in enumerate(acc):
        out = out + F.when(s > 0, F.lit(2 ** b).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int = 50,
) -> DataFrame:
    """All-pairs n-gram Jaccard above threshold, computed relationally:
    explode shingles -> self-join on shingle (DF-capped) -> intersection
    counts -> Jaccard from set sizes. The exploded join is the scalable
    formulation (no cross join); max_shingle_df caps hot shingles."""
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(shingles(F.col(text_col), shingle_n))).alias("shingle"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    df_counts = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    sh_f = sh.join(F.broadcast(df_counts.filter(F.col("df") <= max_shingle_df)), "shingle", "left_semi")
    a, b = sh_f.alias("a"), sh_f.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_sh", "sh_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_sh", "sh_b"), "id_b")
        .withColumn("jaccard", F.round(F.col("n_inter") / (F.col("sh_a") + F.col("sh_b") - F.col("n_inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (brute force over the full
    cross product — the correctness baseline; the LSH/IVF path in
    operators.ann is the scale path)."""
    from pilsner_spark.functions.similarity import cosine_similarity

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine_similarity(F.col("vec_a"), F.col("vec_b")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
